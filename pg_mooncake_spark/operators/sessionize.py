"""Event-time operators over the events stream table.

The reference's streaming is CDC replication only (SURVEY.md §2.B
streaming-only semantics — no event-time windows in-tree); these are the
declared Spark-native extensions: tumbling/sliding windows and
gap-based sessionization, each expressible in batch SQL (oracle-checkable)
and in Structured Streaming (streaming/jobs.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from pg_mooncake_spark.functions import dsum


def tumbling_window_agg(
    events: DataFrame, minutes: int = 60, ts_col: str = "ts"
) -> DataFrame:
    """Tumbling event-time windows via F.window (streaming-identical
    semantics in batch)."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), f"{minutes} minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame, length_min: int = 10, slide_min: int = 5, ts_col: str = "ts"
) -> DataFrame:
    """Sliding windows: each event lands in length/slide windows."""
    return (
        events.groupBy(F.window(F.col(ts_col), f"{length_min} minutes", f"{slide_min} minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization (gaps-and-islands): a new session starts
    when the user's inter-event gap exceeds ``gap_minutes``.

    Classic two-window formulation — lag for the gap flag, running sum for
    the session index.  Both shuffles hash on user_id only (the session
    boundary never crosses users), so this scales by user cardinality.
    The streaming twin is ``session_window``/applyInPandasWithState
    (streaming/jobs.py).
    """
    w = W.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap_s = gap_minutes * 60
    with_flag = events.withColumn(
        "__new_session",
        (
            F.coalesce(
                F.unix_timestamp(F.col(ts_col))
                - F.unix_timestamp(F.lag(ts_col).over(w)),
                F.lit(gap_s + 1),
            )
            > gap_s
        ).cast("int"),
    )
    return with_flag.withColumn(
        "session_idx",
        F.sum("__new_session").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).cast("bigint"),
    ).drop("__new_session")


def session_stats(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Per-session rollup: bounds, event count, value sum."""
    s = sessionize(events, gap_minutes)
    return (
        s.groupBy("user_id", "session_idx")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 2).alias("sum_value"),
        )
    )
