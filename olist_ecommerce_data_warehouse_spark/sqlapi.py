"""SQL entry surface: registered views over the raw tables and the
gold star schema, so warehouse users query the engine with plain
``spark.sql(...)`` instead of the DataFrame API.

The reference's users live in SQL (its entire logic is T-SQL stored
procedures over ``bronze``/``silver``/``gold`` schemas —
``01_create_database_and_schemas.sql:80-167``); this module is the
switch-over path: one call registers

- the raw driver tables (``region`` … ``embeddings``) as temp views,
  namespaced ``raw_*`` and un-prefixed;
- the gold star schema (``dim_customer``/``dim_part``/``dim_supplier``
  + ``fact_orders``/``fact_lineitem`` — ``pipeline/star.py`` builders,
  the reference's ``06/07_*.sql`` equivalents) as ``gold_*`` views.

Views are LAZY logical plans: Catalyst inlines them into each query,
so predicate pushdown, column pruning and broadcast planning apply to
the user's SQL exactly as to the DataFrame plans (no materialization
unless the user writes one).  Register once per session per
``sf_dir``; re-registering replaces.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from olist_ecommerce_data_warehouse_spark.catalog import TABLES, register_views, table
from olist_ecommerce_data_warehouse_spark.pipeline.star import (
    build_dim_customer,
    build_dim_part,
    build_dim_supplier,
    build_fact_lineitem,
    build_fact_orders,
)

_GOLD_BUILDERS = {
    "gold_dim_customer": build_dim_customer,
    "gold_dim_part": build_dim_part,
    "gold_dim_supplier": build_dim_supplier,
    "gold_fact_orders": build_fact_orders,
    "gold_fact_lineitem": build_fact_lineitem,
}


def create_warehouse_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register raw + gold views for ``sf_dir``; returns the view
    names created."""
    # bare-name raw views come from the one registration path the
    # oracle-parity plans also use (catalog.register_views owns "what
    # raw views exist", incl. per-table normalizations); this module
    # only adds the raw_ namespace aliases and the gold tier on top
    register_views(spark, sf_dir)
    created = []
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(f"raw_{name}")
        created += [name, f"raw_{name}"]
    for name, build in _GOLD_BUILDERS.items():
        build(spark, sf_dir).createOrReplaceTempView(name)
        created.append(name)
    return created
