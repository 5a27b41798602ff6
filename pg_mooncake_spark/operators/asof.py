"""As-of (temporal) join — match each left row with the most recent right
row at or before its timestamp, per key.

Not in the reference's surface (SURVEY.md §2.B joins: DuckDB has ASOF but
nothing in-tree exercises it) — declared as an extension because
training-data and market-data pipelines lean on it constantly.

Scale design: the naive formulation is an inequality join
(l.ts >= r.ts), which Spark executes as a broadcast-nested-loop — O(n·m)
and a non-starter at 100 TB.  This implementation uses the union+window
trick instead:

1. tag both sides and UNION them (no join!),
2. one window pass per key ordered by (ts, side-tag): ``last_value``
   with ``ignoreNulls`` over rows-unbounded-preceding carries the most
   recent right-side payload forward onto each left row,
3. filter back to left rows.

Cost: ONE shuffle on the join key (same as any equi-join), a sort within
partitions, zero row multiplication.  Skewed keys can reuse the salting
in operators/skew.py because the window is per-key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    suffix: str = "_r",
    range_partition: bool = False,
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right.ts <= left.ts`` and the same ``on`` key (NULLs when none).

    ``tolerance_seconds`` drops matches older than the window (like
    pandas ``merge_asof(tolerance=...)``).

    ``range_partition=True`` range-partitions the unioned input on the
    key instead of letting the window hash-exchange it (r19):
    RangePartitioning(on) satisfies the window's clustering (equal keys
    share a partition), and range boundaries keep keys ASCENDING across
    partitions — so a caller that wants key-ordered output can
    sortWithinPartitions instead of paying a second (range) exchange
    whose sampler re-executes the window subtree.  Values are identical
    either way; only the shuffle's partitioner changes.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts_col)]
    for c in right_cols:
        if c + suffix in left.columns:
            raise ValueError(
                f"column collision on {c + suffix!r}; pass right_cols/suffix"
            )

    # The entire right payload travels as ONE struct so a single
    # last(ignorenulls) carries it atomically: every matched column comes
    # from the same right row.  (Per-column carries could stitch a
    # composite row — a newer right row with a NULL in one column would
    # resurrect that column from an older row; ADVICE r1.)
    rhs = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(ts_col).alias("__ts"), *[F.col(c) for c in right_cols]
        ).alias("__r"),
    )
    lhs = left.withColumn("__side", F.lit(1))
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    if range_partition:
        unioned = unioned.repartitionByRange(F.col(on))

    # right rows sort before left rows at equal ts (side 0 < 1), so an
    # exactly-simultaneous right row IS visible to the left row.
    w = (
        W.partitionBy(on)
        .orderBy(ts_col, "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = (
        unioned.withColumn("__r", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_seconds is not None:
        stale = (
            F.unix_timestamp(ts_col) - F.unix_timestamp(F.col("__r.__ts"))
        ) > tolerance_seconds
        out = out.withColumn(
            "__r", F.when(stale, F.lit(None)).otherwise(F.col("__r"))
        )
    for c in right_cols:
        out = out.withColumn(c + suffix, F.col(f"__r.{c}"))
    return out.drop("__side", "__r")
