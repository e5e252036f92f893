"""Query registry: every SURVEY.md §2 operator as a named
(spark_fn, oracle_sql) pair.

Importing this package registers all plans; ``__spark_entry__.py``
re-exports the registry to the driver.
"""

from olist_ecommerce_data_warehouse_spark.plans.registry import REGISTRY, QuerySpec, query

# Import for side effect: each module registers its plans.
from olist_ecommerce_data_warehouse_spark.plans import (  # noqa: E402,F401
    warehouse,
    cleansing,
    dedup_window,
    gold,
    llm_dedup,
    similarity,
    text,
    corpus,
    events,
    multimodal,
    advanced,
    ingest,
)

__all__ = ["REGISTRY", "QuerySpec", "query"]
