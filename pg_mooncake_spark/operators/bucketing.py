"""Bucketed (co-located) joins — the shuffle-elimination primitive for
repeated big-table⋈big-table joins at warehouse scale.

A join between two tables bucketed by the join key with the SAME bucket
count needs NO exchange on either side: Spark's bucketing metadata makes
each side's on-disk layout a valid hash partitioning, so the sort-merge
join reads co-located buckets directly.  At 100 TB this converts the
single most expensive recurring operation (a fact⋈fact shuffle moving
both tables across the network on EVERY query) into a one-time cost paid
at write time — the standard physical-design move for star-schema fact
tables joined on the same key query after query.

Reference context: pg_mooncake delegates physical join strategy to its
embedded engine per query (/root/reference/README.md:15); bucketing is
the Spark-native mechanism for the same repeated-join regime, so it
lives here as a first-class operator.

Verified properties (tests/test_plans.py):
- zero Exchange operators in the co-bucketed join plan;
- per-bucket sort files (sortBy) also remove the join's Sort nodes.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Optional[Sequence[str]] = None,
) -> None:
    """Persist ``df`` as a session-catalog table hash-bucketed by
    ``bucket_cols`` into ``n_buckets`` files per partition (optionally
    sorted inside each bucket — pre-paying the sort-merge join's sort).

    Pick ``n_buckets`` so a bucket is a few hundred MB at target scale;
    both sides of a planned co-located join MUST use the same count."""
    import shutil
    from urllib.parse import unquote, urlparse

    spark = df.sparkSession
    # a managed-table location can outlive the in-memory catalog (a
    # previous session's warehouse dir): overwrite cannot see it, so
    # clear BOTH the catalog entry and any stale local location
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    if wh.scheme in ("", "file"):
        parts = table.lower().split(".")
        # managed layout: <wh>/<db>.db/<table>; default db is flat
        rel = (
            os.path.join(f"{parts[0]}.db", parts[1])
            if len(parts) == 2 and parts[0] != "default"
            else parts[-1]
        )
        stale = os.path.join(unquote(wh.path), rel)
        if os.path.isdir(stale):
            shutil.rmtree(stale, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def cobucketed_join(
    spark: SparkSession,
    left: str,
    right: str,
    on: Sequence[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two :func:`write_bucketed` tables on their bucket key.  With
    matching bucket counts Spark plans a sort-merge join with ZERO
    exchanges (and zero sorts when both were written with sortBy on the
    key) — the declarative plan carries the co-location, nothing is
    hand-scheduled."""
    return spark.table(left).join(spark.table(right), on, how)
