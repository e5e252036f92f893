"""Decimal-safe numeric helpers.

The reference keeps money in DECIMAL(10,2) (``04_create_silver_tables.sql:166-169``).
The driver's test tables store measures as DOUBLE; summing doubles is
order-dependent across engines, so every money-ish aggregate in this
engine casts to decimal FIRST (exact, associative arithmetic in both
Spark and any ANSI oracle) and pins the output type explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, precision: int = 12, scale: int = 2) -> Column:
    """Cast to an exact decimal before arithmetic/aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def money(col: Column | str) -> Column:
    """Money input at DECIMAL(12,2) — matches reference DECIMAL(10,2)
    intent with headroom for the driver's synthetic prices."""
    return dec(col, 12, 2)


def as_out(col: Column) -> Column:
    """Pin a computed/aggregated numeric output to DOUBLE.

    Internal math stays in exact decimal (deterministic, associative);
    the FINAL value is cast to double.  Rationale: Spark rounds
    HALF_UP when down-casting decimal scale while DuckDB truncates, so
    any scale-reducing decimal output would hash-mismatch the oracle —
    but exact-decimal → double is correctly rounded and bit-identical
    in both engines (values here are far below 2^53 in units of the
    decimal scale)."""
    return col.cast("double")


def revenue_expr(price_col: str = "l_extendedprice", discount_col: str = "l_discount") -> Column:
    """Discounted line revenue: ``price * (1 - discount)`` in exact
    decimal arithmetic (analog of the reference's
    ``total_item_value = price + freight_value`` computed money column,
    ``04_create_silver_tables.sql:280``)."""
    return money(price_col) * (F.lit(1).cast("decimal(3,2)") - dec(discount_col, 4, 2))
