"""Scalable REPLAY oracles for the full-registry sweep (round 9,
verdict task 5).

Two registry plans have primary DuckDB oracles that are deliberately
naive ground truth and stop being runnable around sf1:

- ``asof_click_attribution``: the interval part is a BETWEEN theta
  join — O(clicks × windows) inside DuckDB's uninterruptible
  nested-loop join (>25 min at sf1).
- ``sequence_packing``: the greedy first-fit is a recursive CTE whose
  depth is rows-per-language (~22k at sf1) and whose every step
  re-joins the full ordered table — O(n²) row-ops per language.

This module provides LINEAR replays of the same rules so the sweep
can read 50/50 MATCH with the replay rows labeled as such
(``verify_driver.py`` uses them when ``SCALE_ORACLES=1``):

- the asof replay re-expresses the interval part with the SAME 600 s
  binning arithmetic the engine's range_join uses — window rows
  replicate to every bin they overlap, clicks map to one bin, LEFT
  equi-join on the bin + exact BETWEEN filter (a hash join in DuckDB
  too).  Round 6 first ran this ad-hoc; it is now checked in.
- the sequence_packing replay computes the dense layout and the split
  in SQL (both linear) and replays the greedy fold in plain Python —
  an INDEPENDENT implementation of the recursive CTE's transition
  rule (not the engine's ``_first_fit``, to keep the oracle
  non-circular), O(n) per language.

Equivalence of each replay to its naive primary oracle is itself
hash-proven at sf0.01 in
``tests/test_correctness.py::test_scale_oracles_match_primary``.
"""

from __future__ import annotations

import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from olist_ecommerce_data_warehouse_spark.plans.corpus import (  # noqa: E402
    _SPLIT_SQL,
    SEQ_BUDGET,
    TOKS,
)

# --- asof_click_attribution: bucketized-linear interval replay ------

ASOF_BIN_SEC = 600  # the engine's range_join bin width for this slot

ASOF_REPLAY_SQL = f"""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    views AS (
        SELECT user_id, ts AS view_ts, MAX(event_id) AS view_event_id
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, ts
    ),
    asof_part AS (
        SELECT 'asof' AS kind, c.event_id, c.user_id, c.ts,
               v.view_event_id AS matched_id, v.view_ts AS matched_ts
        FROM clicks c ASOF LEFT JOIN views v
          ON c.user_id = v.user_id AND v.view_ts <= c.ts
    ),
    win AS (
        SELECT event_id AS w_id, ts AS w_start,
               ts + INTERVAL 15 MINUTE AS w_end
        FROM events WHERE event_type = 'error'
    ),
    win_bins AS (
        SELECT w_id, w_start, w_end,
               unnest(range(CAST(floor(epoch(w_start) / {ASOF_BIN_SEC}) AS BIGINT),
                            CAST(floor(epoch(w_end) / {ASOF_BIN_SEC}) AS BIGINT) + 1))
                   AS bin
        FROM win
    ),
    click_bins AS (
        SELECT event_id, user_id, ts,
               CAST(floor(epoch(ts) / {ASOF_BIN_SEC}) AS BIGINT) AS bin
        FROM clicks
    ),
    interval_part AS (
        SELECT 'interval' AS kind, c.event_id, c.user_id, c.ts,
               w.w_id AS matched_id, w.w_start AS matched_ts
        FROM click_bins c LEFT JOIN win_bins w
          ON c.bin = w.bin AND c.ts BETWEEN w.w_start AND w.w_end
    )
    SELECT * FROM asof_part UNION ALL SELECT * FROM interval_part
"""


def asof_replay(con) -> pd.DataFrame:
    return con.execute(ASOF_REPLAY_SQL).fetchdf()


# --- sequence_packing: SQL dense layout + linear Python greedy ------

_SEQPACK_BASE_SQL = f"""
    WITH sized AS (
        SELECT doc_id, lang, len({TOKS}) AS n_tokens FROM documents
    )
    SELECT doc_id, lang, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {SEQ_BUDGET} AS BIGINT) AS seq_no,
           CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               % {SEQ_BUDGET} AS BIGINT) AS seq_offset,
           {_SPLIT_SQL} AS split
    FROM sized
    ORDER BY lang, doc_id
"""


def _greedy_fold(n_tokens_in_order: list[int], budget: int) -> tuple[list[int], list[int]]:
    """Independent replay of the primary oracle's recursive-CTE
    transition (NOT the engine's _first_fit — non-circular by
    construction): row 1 gets (0, 0); row i+1 opens a new sequence
    iff the previous doc actually advanced the fill (goff + prev_n >
    0) and the current doc would overflow the budget."""
    seqs: list[int] = []
    offs: list[int] = []
    gseq = goff = 0
    prev_n = None
    for n in n_tokens_in_order:
        if prev_n is not None:
            if goff + prev_n > 0 and goff + prev_n + n > budget:
                gseq, goff = gseq + 1, 0
            else:
                goff = goff + prev_n
        seqs.append(gseq)
        offs.append(goff)
        prev_n = n
    return seqs, offs


def sequence_packing_replay(con) -> pd.DataFrame:
    pdf = con.execute(_SEQPACK_BASE_SQL).fetchdf()
    gseq = pd.Series(0, index=pdf.index, dtype="int64")
    goff = pd.Series(0, index=pdf.index, dtype="int64")
    # dropna=False: a NULL-lang group must fold like any other (Spark
    # windows treat NULL as one partition) — pandas' default silently
    # skips the NaN group, leaving those rows at the 0 defaults and
    # diverging from the engine on corpora with missing lang.
    for _, idx in pdf.groupby("lang", sort=False, dropna=False).groups.items():
        seqs, offs = _greedy_fold(pdf.loc[idx, "n_tokens"].tolist(), SEQ_BUDGET)
        gseq.loc[idx] = seqs
        goff.loc[idx] = offs
    pdf["greedy_seq_no"] = gseq
    pdf["greedy_seq_offset"] = goff
    return pdf


# name -> callable(duckdb_connection) -> pandas DataFrame
SCALE_ORACLES = {
    "asof_click_attribution": asof_replay,
    "sequence_packing": sequence_packing_replay,
}
