"""Driver-gate replica: every registered plan with an oracle is
hash-compared against DuckDB at sf0.001 (the driver does the same at
sf0.01)."""

from __future__ import annotations

import pytest

from olist_ecommerce_data_warehouse_spark.plans import REGISTRY
from tests.conftest import SF_DIR, assert_matches_oracle

ORACLE_PLANS = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)


def test_every_plan_is_oracled():
    """Round-2 invariant: all 50 registry slots carry a driver-checkable
    oracle (the driver records correctness rows for at most the first
    50 queries() entries, so no slot may be wasted on a rows-only
    plan)."""
    assert len(REGISTRY) == 50
    assert len(ORACLE_PLANS) == len(REGISTRY)


@pytest.mark.parametrize("name", ORACLE_PLANS)
def test_plan_matches_oracle(spark, ddb, name):
    spec = REGISTRY[name]
    assert_matches_oracle(spec.fn(spark, SF_DIR), ddb, spec.oracle, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns


def test_scale_oracles_match_primary(ddb):
    """Round 9 (verdict task 5): the checked-in LINEAR replay oracles
    (scripts/scale_oracles.py — bucketized interval replay for
    asof_click_attribution, SQL dense layout + independent Python
    greedy fold for sequence_packing) must reproduce their naive
    primary oracles hash-exactly at the driver's gate SF.  This is
    the equivalence proof that lets the sf1+ sweep substitute them
    (SCALE_ORACLES=1) where the primaries are infeasible, and still
    claim 50/50."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
        ),
    )
    import __spark_entry__ as e
    from scale_oracles import SCALE_ORACLES

    from tests.conftest import canonical_rows

    assert set(SCALE_ORACLES) == {
        "asof_click_attribution",
        "sequence_packing",
        "text_lang_id",  # round 9: one-pass feature table + numpy PEGASOS
    }
    for name, replay_fn in SCALE_ORACLES.items():
        primary = canonical_rows(ddb.execute(e.oracle_sql()[name]).fetchdf())
        replay = canonical_rows(replay_fn(ddb))
        assert primary == replay, name
