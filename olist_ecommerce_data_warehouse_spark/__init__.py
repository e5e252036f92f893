"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference medallion warehouse
(YamirN/olist-ecommerce-data-warehouse), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession factory tuned for local[N] testing and
                   documented for cluster scale.
- ``catalog``    : table registry over the driver's parquet test tables.
- ``functions/`` : scalar column transforms (cleansing, datetime, text,
                   vectors) — all JVM-side ``pyspark.sql.functions``
                   compositions; no row-at-a-time Python UDFs.
- ``operators/`` : relational/dataflow operators (dedup, surrogate keys,
                   date dimension, joins, QA checks, similarity search).
- ``plans/``     : the query registry — every SURVEY.md §2 operator as a
                   named (spark_fn, oracle_sql) pair consumed by
                   ``__spark_entry__.py``.
- ``sources/``   : CSV/parquet readers and the audit.ingestion_run sink.
- ``pipeline/``  : bronze→silver→gold medallion loads + fail-fast
                   orchestrator (reference EP1–EP3).
- ``streaming/`` : Structured Streaming event analytics (extension tier).
"""

__version__ = "0.1.0"
