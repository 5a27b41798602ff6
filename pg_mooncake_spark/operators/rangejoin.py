"""Scalable time-range (interval) join.

``facts.ts BETWEEN intervals.start AND intervals.end`` expressed as a
pure inequality join forces Spark into BroadcastNestedLoopJoin (or worse,
a cartesian product) — O(|facts| x |intervals|) comparisons, the classic
100 TB killer.  The scalable shape is **bin bucketing** (the same strategy
Databricks' range-join optimization and KDB's window joins use):

1. quantize time into fixed-width buckets;
2. each fact lands in exactly ONE bucket (its timestamp's);
3. each interval EXPLODES into every bucket it overlaps
   (``(end - start) / width + 1`` rows — bounded when the bucket width is
   chosen >= the typical interval length);
4. equi-join on the bucket id (Catalyst picks broadcast or shuffled hash
   join), then apply the exact BETWEEN as a residual filter.

Because a fact has exactly one bucket, every qualifying (fact, interval)
pair is produced exactly once — no post-join dedup.  Shuffle traffic is
one hash-partition of facts by bucket; intervals are usually small enough
to broadcast after explosion.

Reference parity: the reference engine has no range-join operator either
(SURVEY.md §2.B covers joins through theta/inequality); this is part of
the §2.C training-pipeline extension surface (joining events to
maintenance/session/experiment windows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    facts: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_s: int = 3600,
) -> DataFrame:
    """Join each fact row to every interval with
    ``start <= ts <= end`` (inclusive BETWEEN, matching ANSI SQL).

    ``bucket_s`` — bucket width in seconds.  Choose it near the typical
    interval length: too small explodes intervals into many buckets, too
    large piles unrelated facts into each bucket before the residual
    filter.  Correct for any positive value.

    Output: all fact columns + all interval columns (callers project).
    """
    bw = F.lit(int(bucket_s) * 1_000_000)

    def bucket(c: Column) -> Column:
        return F.floor(F.unix_micros(c) / bw)

    fb = facts.withColumn("__rb", bucket(F.col(ts_col)))
    ib = intervals.withColumn(
        "__rb",
        F.explode(
            F.sequence(bucket(F.col(start_col)), bucket(F.col(end_col)))
        ),
    )
    return (
        fb.join(ib, "__rb")
        .filter(F.col(ts_col).between(F.col(start_col), F.col(end_col)))
        .drop("__rb")
    )
