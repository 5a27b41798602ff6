"""CDC sync loop — Structured Streaming apply of change batches.

The reference runs moonlink as an always-on background worker consuming
the logical-replication stream and applying it to the mirror (reference
src/bgworker.rs:8-37).  Spark-first equivalent: a Structured Streaming
query over a change-event source whose ``foreachBatch`` applies each
micro-batch to the moontable via MERGE, with exactly-once provided by
(checkpoint + idempotent merge keyed on pk).

Change event model: the stream carries the mirrored table's columns plus
``__op`` ∈ {I, U, D} — the insert/update/delete images logical replication
would deliver (reference README.md:14).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from pg_mooncake_spark.engine import MooncakeEngine


def start_sync(
    engine: MooncakeEngine,
    dst: str,
    change_stream: DataFrame,
    checkpoint_dir: Optional[str] = None,
    trigger_available_now: bool = False,
    processing_time: str = "1 second",
    on_schema_drift: str = "fail",
) -> StreamingQuery:
    """Attach a change stream to a mirror; returns the StreamingQuery
    (the engine-session-owned sync loop, reference A13).

    - exactly-once: the checkpoint records the last completed epoch; a
      replayed epoch re-merges the same batch, and MERGE keyed on pk is
      idempotent for U/D (I replays are suppressed by epoch tracking).
    - ordering: foreachBatch serializes batches, so mirror versions move
      monotonically with the stream, like moonlink's commit_lsn.
    - ``on_schema_drift='evolve'`` lets a mid-stream upstream ADD COLUMN
      widen the mirror (and attached exports) instead of failing the
      query; the default keeps the fail-loudly contract.
    """
    if not change_stream.isStreaming:
        raise ValueError("change_stream must be a streaming DataFrame")

    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(engine.warehouse, f"_checkpoints_{dst}")

    # stream epochs restart at 0, but the mirror's commit watermark may
    # already cover the backfill — continue source versions monotonically
    # so wait_for_source_version can distinguish stream progress.  The
    # base is pinned in the catalog on FIRST attach (keyed by checkpoint):
    # batch ids continue across restarts, so a restarted stream must map
    # epoch → source_version exactly as the original did, not re-derive
    # from the watermark it already moved.
    entry = engine.catalog.get(dst)
    fallback = (
        entry.get("commit_version") if entry.get("commit_version") is not None else -1
    ) + 1
    base = engine.catalog.get_or_set_stream_base(
        dst, os.path.abspath(checkpoint_dir), fallback
    )

    applied_epochs: set[int] = set()

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id in applied_epochs:
            return
        applied_epochs.add(epoch_id)
        if batch_df.isEmpty():
            return
        engine.apply_changes(
            dst,
            batch_df,
            source_version=base + epoch_id,
            on_schema_drift=on_schema_drift,
        )

    writer = change_stream.writeStream.foreachBatch(apply_batch).outputMode("update")
    writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def sync_available(
    engine: MooncakeEngine,
    dst: str,
    change_stream: DataFrame,
    checkpoint_dir: Optional[str] = None,
    on_schema_drift: str = "fail",
) -> None:
    """Drain everything currently available in the stream, then stop —
    the synchronous 'catch up now' barrier used by tests and
    create_snapshot-style freshness waits."""
    q = start_sync(
        engine, dst, change_stream, checkpoint_dir,
        trigger_available_now=True, on_schema_drift=on_schema_drift,
    )
    q.awaitTermination()
