"""One-number rig probe: spins up the bench session shape, runs the
frozen calibration plan (bench.py `calibration_sec`, CAL_REF 0.92 s),
and prints the implied rig factor.  Used between heavy jobs to decide
whether the box is in a rig-1.0 epoch (anchoring sessions are only
valid there — BASELINE.md anchor provenance) without paying for a
full 50-plan session.

Usage: python scripts/rig_probe.py [n_windows]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import calibration_sec, get_spark, rig_factor_of  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("rig_probe")
    windows = [calibration_sec(spark) for _ in range(n)]
    print(
        {
            "windows": [round(w, 4) for w in windows],
            "rig_factor": rig_factor_of(windows),
        }
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
