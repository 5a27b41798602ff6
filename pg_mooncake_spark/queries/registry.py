"""Query inventory registry.

Every operator claimed in SURVEY.md §2 registers here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL string.
The driver runs both sides at sf0.01 and hash-compares — this registry IS
the correctness surface.

Determinism contract (SURVEY.md §5.2 / FIXTURES.md):
- double aggregates go through exact DECIMAL sums then a final cast to
  DOUBLE, so both engines produce bit-identical values regardless of
  partial-aggregation order;
- timestamps in outputs are cast to DATE or formatted strings;
- any LIMIT carries a total ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None):
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


def _load_all() -> None:
    """Import every query-defining module exactly once."""
    import pg_mooncake_spark.queries.tpch  # noqa: F401
    import pg_mooncake_spark.queries.tpch_extra  # noqa: F401
    import pg_mooncake_spark.queries.relational  # noqa: F401
    import pg_mooncake_spark.queries.scalars  # noqa: F401
    import pg_mooncake_spark.queries.llm  # noqa: F401
    import pg_mooncake_spark.queries.lifecycle  # noqa: F401
    import pg_mooncake_spark.queries.extensions  # noqa: F401


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (columnar parquet scan).

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects (PARQUET_TYPE_ILLEGAL).  We read nanos as a
    long (legacy conf, runtime-settable) and rebuild a microsecond
    timestamp JVM-side — no Python round trip.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        return (
            spark.read.parquet(f"{sf_dir}/{name}.parquet")
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views for SQL-form queries."""
    for n in names or TABLES:
        t(spark, sf_dir, n).createOrReplaceTempView(n)
