"""Structured Streaming twins of the event-time analytics operators.

The reference's only streaming is CDC replication (SURVEY.md §2.B:
no watermarks/windows in-tree) — these are the declared Spark-native
extensions, wired so the SAME aggregation logic runs in batch (the
oracle-checked queries in queries/llm.py) and as an incremental
streaming job:

- tumbling / sliding window counts with watermark-based late-data
  handling (`F.window` + `withWatermark`);
- gap-based sessionization via `F.session_window` (state-store backed,
  merges sessions as events arrive);
- a custom stateful operator (per-user running profile) via
  `applyInPandasWithState` — the escape hatch for semantics window
  functions can't express incrementally.

Scale notes: streaming state is partitioned by the grouping key, so all
of these scale like their batch twins (shuffle on user_id / window key
only).  Watermark delay bounds state size: state for windows older than
the watermark is evicted.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def with_event_time(stream: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Attach the event-time watermark: rows later than ``delay`` behind
    the max observed event time are dropped from stateful aggregations."""
    return stream.withWatermark(ts_col, delay)


def streaming_tumbling_counts(
    stream: DataFrame,
    minutes: int = 60,
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of queries/llm.events_tumbling_window: same window
    spec, incremental execution with late-data eviction."""
    return (
        with_event_time(stream, ts_col, delay)
        .groupBy(F.window(F.col(ts_col), f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def streaming_sliding_counts(
    stream: DataFrame,
    length_min: int = 10,
    slide_min: int = 5,
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    return (
        with_event_time(stream, ts_col, delay)
        .groupBy(F.window(F.col(ts_col), f"{length_min} minutes", f"{slide_min} minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def streaming_sessionize(
    stream: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    delay: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessions via session_window: the state store merges
    events into sessions incrementally; a session closes once the
    watermark passes its end + gap."""
    return (
        with_event_time(stream, ts_col, delay)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes").alias("w"),
            user_col,
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


# ------------------------------------------------------ custom stateful op

PROFILE_STATE_SCHEMA = "n_events bigint, sum_value double, last_seen timestamp"
PROFILE_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, sum_value double, last_seen timestamp"
)


def _update_user_profile(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState update function: fold each micro-batch of a
    user's events into a running (count, sum, last_seen) profile."""
    (user_id,) = key
    if state.exists:
        n, total, last_seen = state.get
    else:
        n, total, last_seen = 0, 0.0, None
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = pdf["ts"].max()
        last_seen = mx if last_seen is None else max(last_seen, mx)
    state.update((n, total, last_seen))
    yield pd.DataFrame(
        [(user_id, n, total, last_seen)],
        columns=["user_id", "n_events", "sum_value", "last_seen"],
    )


def streaming_user_profiles(
    stream: DataFrame,
    ts_col: str = "ts",
    delay: str = "30 minutes",
) -> DataFrame:
    """Custom stateful operator: continuously-updated per-user profile
    (event count, value sum, last activity) — the
    ``applyInPandasWithState`` pattern for operators with no built-in
    incremental form."""
    return (
        with_event_time(stream, ts_col, delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=PROFILE_OUTPUT_SCHEMA,
            stateStructType=PROFILE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of operators/dedup.exact_dedup's keep-first
    semantics: emit each document whose content hash has not been seen
    before; replays and duplicates are dropped by the state store.

    ``dropDuplicatesWithinWatermark`` keyed on the content hash gives the
    watermark-horizon contract with *bounded* state: per-key state is
    evicted once the key's event time falls behind the watermark, so a
    duplicate arriving later than ``delay`` behind the stream's event
    time may be re-emitted.  (Plain ``dropDuplicates(["__h"])`` would be
    exact-forever dedup — Spark only evicts dedup state when the
    event-time column is part of the key, so hash-only keys grow without
    bound.)  Shuffle is on the 256-bit hash only; document text never
    re-crosses the wire after the hash is computed.
    """
    hashed = stream.withColumn("__h", F.sha2(F.col(text_col), 256))
    return (
        hashed.withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["__h"])
        .drop("__h")
    )


def streaming_near_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "10 minutes",
    bits: int = 64,
) -> DataFrame:
    """Streaming twin of the SimHash near-dup path: emit each document
    whose 64-bit fingerprint has not been seen within the watermark
    horizon; exact copies AND fingerprint-identical near-copies are
    suppressed — i.e. any reordering of the same single-space-separated
    token set (hamming 0).  Other edits (extra whitespace changes the
    token multiset under the space tokenizer, word substitutions) shift
    the fingerprint and pass through.

    The fingerprint is the same pure column expression the batch
    operator uses (operators/dedup.simhash), so it runs stateless
    per-row inside the stream; only ``dropDuplicatesWithinWatermark``
    keeps state, shuffled on the fingerprint alone with watermark-bounded
    eviction.  Banded sub-fingerprint matching (hamming > 0) needs
    cross-row joins that streaming state can't express incrementally —
    that remains the batch operator's job; this is the stream-side
    guard that stops exact/reordered duplicates from entering the
    corpus at ingest time.
    """
    from pg_mooncake_spark.operators.dedup import simhash_fingerprint

    return (
        stream.withColumn("__fp", simhash_fingerprint(text_col, bits))
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def streaming_index_dedup(
    stream: DataFrame,
    index_path: str,
    accept,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
):
    """Streaming ingest gate over the PERSISTED MinHash index (round
    12): each micro-batch is near-dup-checked against the whole
    historical corpus via operators/dedup.probe_minhash_index (one
    broadcast equi-join, dynamic-partition-pruned index scan — the
    corpus is never rescanned), then against ITSELF (in-batch pairs,
    keep-lowest-id), survivors extend the index O(batch) and are handed
    to ``accept(batch_df, batch_id)``.

    This is the composition the watermark twins above cannot express:
    ``dropDuplicatesWithinWatermark`` bounds state by evicting old
    keys, so a duplicate of LAST MONTH's document sails through; the
    index gate has unbounded horizon at O(batch) incremental cost
    because the state lives in the index files, not the state store.
    foreachBatch serializes batches, so build/extend never race.

    Returns the DataStreamWriter (caller picks trigger/checkpoint and
    starts it)."""
    from pg_mooncake_spark.operators.dedup import (
        build_minhash_index,
        extend_minhash_index,
        minhash_dedup_pairs,
        minhash_index_exists,
        probe_minhash_index,
    )

    kw = dict(
        num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.localCheckpoint(eager=True)  # probe + anti-join +
        # extend all consume it; recomputing a stream source is illegal
        # existence via the Hadoop FileSystem API: a driver-local
        # os.path check is always False for s3a://hdfs:// index paths,
        # which would silently rebuild (destroy) the historical index
        # every micro-batch
        has_index = minhash_index_exists(spark, index_path)
        survivors = batch
        if has_index:
            hits = probe_minhash_index(
                spark, index_path, batch, text_col, id_col,
                threshold=threshold, **kw,
            ).select(F.col("new_id").alias(id_col)).distinct()
            survivors = survivors.join(hits, id_col, "left_anti")
        # in-batch near-dups: keep the lowest id of each matched pair
        dup_ids = (
            minhash_dedup_pairs(
                survivors, text_col, id_col,
                threshold=threshold, **kw,
            )
            .select(F.col("id_b").alias(id_col)).distinct()
        )
        survivors = survivors.join(
            dup_ids, id_col, "left_anti"
        ).localCheckpoint(eager=True)  # pin BEFORE the index grows: the
        # extend below appends the survivors' own bands, and a lazy plan
        # re-probing afterwards would see them
        if has_index:
            extend_minhash_index(
                survivors, index_path, text_col, id_col, **kw
            )
        else:
            build_minhash_index(
                survivors, index_path, text_col, id_col, **kw
            )
        accept(survivors, batch_id)

    return stream.writeStream.foreachBatch(process).outputMode("update")
