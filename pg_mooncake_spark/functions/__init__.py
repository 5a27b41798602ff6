"""Column-function helpers shared across the query inventory.

All helpers stay JVM-side (pyspark.sql.functions compositions — no Python
UDFs) so they run inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2, precision: int = 30) -> Column:
    """Exact decimal SUM of a double column, returned as DOUBLE.

    Summing doubles is order-dependent; at 100 TB the partial-aggregation
    order is nondeterministic across runs and engines.  Casting to DECIMAL
    first makes the sum exact (and therefore engine/order independent);
    the final cast back to DOUBLE is deterministic.  Matches the oracle
    pattern ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 30) -> Column:
    """Deterministic AVG: exact decimal sum / count, both sides identical."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")
        / F.count(c)
    )


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float|double> columns (JVM higher-order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
