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
