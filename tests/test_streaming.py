"""Structured Streaming jobs: windowed aggs, session_window, and the
applyInPandasWithState profile operator, each drained with
trigger(availableNow) from a file source built on the events fixture and
checked against the equivalent batch computation.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from pg_mooncake_spark.queries.registry import t
from pg_mooncake_spark.streaming import jobs
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_stream_dir(tmp_path_factory):
    """Events fixture rewritten as micro-batch-friendly parquet (the
    nanos-timestamp workaround baked in)."""
    path = str(tmp_path_factory.mktemp("events_stream") / "events")
    return path


def _events_batch(spark):
    return t(spark, SF_DIR, "events")


def _as_stream(spark, path, df):
    """Write the batch as a file-source stream, appending one far-future
    sentinel event (user_id = -1): it advances the watermark past every
    real window/session so append-mode sinks emit them all before the
    availableNow drain finishes."""
    if not os.path.isdir(path):
        import datetime

        mx = df.agg(F.max("ts").alias("m")).first()["m"]
        far = mx + datetime.timedelta(days=30)
        sent = (
            df.limit(1)
            .withColumn("event_id", F.lit(-1).cast(dict(df.dtypes)["event_id"]))
            .withColumn("user_id", F.lit(-1).cast(dict(df.dtypes)["user_id"]))
            .withColumn("event_type", F.lit("__flush"))
            .withColumn("ts", F.lit(far).cast("timestamp"))
        )
        df.unionByName(sent).write.parquet(path)
    return spark.readStream.schema(df.schema).parquet(path)


def _drain_to_memory(stream_df, name, output_mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_tumbling_matches_batch(spark, events_stream_dir):
    batch = _events_batch(spark)
    stream = _as_stream(spark, events_stream_dir, batch)
    _drain_to_memory(
        jobs.streaming_tumbling_counts(stream, 60), "tumbling_sink", "append"
    )
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.table("tumbling_sink").collect()
        if r["event_type"] != "__flush"
    }
    expected = {
        (r["w"]["start"], r["event_type"]): r["n"]
        for r in (
            batch.groupBy(F.window("ts", "60 minutes").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    assert got == expected


def test_streaming_sessionize_matches_batch_rollup(spark, events_stream_dir):
    """session_window sessions must agree with the batch gaps-and-islands
    sessionization on (user, n_events) multisets and session count."""
    from pg_mooncake_spark.operators.sessionize import session_stats

    batch = _events_batch(spark)
    stream = _as_stream(spark, events_stream_dir, batch)
    _drain_to_memory(
        jobs.streaming_sessionize(stream, 30), "session_sink", "append"
    )
    got = sorted(
        (r["user_id"], r["n_events"])
        for r in spark.table("session_sink").collect()
        if r["user_id"] != -1
    )
    expected = sorted(
        (r["user_id"], r["n_events"])
        for r in session_stats(batch, 30).collect()
    )
    assert got == expected


def test_streaming_user_profiles_state(spark, events_stream_dir):
    batch = _events_batch(spark)
    stream = _as_stream(spark, events_stream_dir, batch)
    _drain_to_memory(
        jobs.streaming_user_profiles(stream), "profile_sink", "update"
    )
    # keep the LAST emitted row per user (update mode re-emits on change)
    rows = spark.table("profile_sink").collect()
    got: dict = {}
    for r in rows:
        if r["user_id"] != -1:
            got[r["user_id"]] = (r["n_events"], round(r["sum_value"], 2))
    expected = {
        r["user_id"]: (r["n"], round(r["s"], 2))
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == expected


def test_async_sync_with_freshness_barrier(spark, tmp_path):
    """The full reference write-path contract with a LIVE stream: change
    files land while a processing-time sync loop runs; a reader calls the
    freshness barrier and must then see exactly the synced state
    (read-your-writes against an asynchronous mirror)."""
    from pg_mooncake_spark.engine import MooncakeEngine
    from pg_mooncake_spark.streaming.cdc import start_sync

    eng = MooncakeEngine(spark, str(tmp_path / "wh"))
    src = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    eng.create_table("live", source_df=src, primary_key=["k"])

    stream_dir = str(tmp_path / "changes")
    os.makedirs(stream_dir)
    stream = spark.readStream.schema("k int, v string, __op string").parquet(
        stream_dir
    )
    q = start_sync(
        eng,
        "live",
        stream,
        checkpoint_dir=str(tmp_path / "ckpt"),
        processing_time="1 second",
    )
    try:
        spark.createDataFrame(
            [(2, "b2", "U"), (3, "c", "I")], "k int, v string, __op string"
        ).write.mode("append").parquet(stream_dir)
        # barrier: backfill holds commit_version 0; the first stream
        # epoch lands at 1 — wait for it
        eng.wait_for_source_version("live", 1, timeout=60)
        rows = sorted((r["k"], r["v"]) for r in eng.table("live").collect())
        assert rows == [(1, "a"), (2, "b2"), (3, "c")]
    finally:
        q.stop()


def test_sync_restart_resume_exactly_once(spark, tmp_path):
    """Kill the sync loop mid-stream and restart it against the same
    checkpoint: every change batch must be applied exactly once, with the
    same epoch → source_version mapping across the restart (the
    reference's bgworker-restart semantics, src/bgworker.rs:14)."""
    from pg_mooncake_spark.engine import MooncakeEngine
    from pg_mooncake_spark.streaming.cdc import sync_available

    eng = MooncakeEngine(spark, str(tmp_path / "wh"))
    src = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    eng.create_table("rst", source_df=src, primary_key=["k"])

    stream_dir = str(tmp_path / "changes")
    os.makedirs(stream_dir)
    batches = [
        [(2, "b2", "U")],
        [(3, "c", "I")],
        [(1, None, "D"), (4, "d", "I")],
    ]
    for rows in batches:
        spark.createDataFrame(rows, "k int, v string, __op string").coalesce(
            1
        ).write.mode("append").parquet(stream_dir)

    def make_stream():
        return (
            spark.readStream.schema("k int, v string, __op string")
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )

    # crash injection: the real apply runs for epoch 0, then the worker
    # "dies" at the start of the second epoch (before applying it)
    applied_versions = []
    real_apply = eng.apply_changes
    crashed = {"done": False}

    def flaky_apply(dst, changes, source_version=None, **kw):
        if source_version is not None and source_version >= 2 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected worker crash")
        applied_versions.append(source_version)
        return real_apply(dst, changes, source_version=source_version)

    eng.apply_changes = flaky_apply
    ckpt = str(tmp_path / "ckpt")
    with pytest.raises(Exception, match="injected worker crash"):
        sync_available(eng, "rst", make_stream(), checkpoint_dir=ckpt)

    # restart against the same checkpoint (fresh in-memory state)
    sync_available(eng, "rst", make_stream(), checkpoint_dir=ckpt)

    # exactly-once: each epoch applied once, consecutive source versions,
    # no double-count from re-deriving the base off the moved watermark
    assert applied_versions == sorted(set(applied_versions))
    assert applied_versions[0] == 1  # backfill holds 0; stream starts at 1
    assert applied_versions == [1, 2, 3]
    assert eng.catalog.get("rst")["commit_version"] == 3

    rows = sorted((r["k"], r["v"]) for r in eng.table("rst").collect())
    assert rows == [(2, "b2"), (3, "c"), (4, "d")]


def test_streaming_exact_dedup_keeps_first(spark, tmp_path):
    """Exact dedup as a streaming job: duplicate content arriving in later
    micro-batches must be dropped by the state store."""
    import datetime

    stream_dir = str(tmp_path / "docs")
    os.makedirs(stream_dir)
    t0 = datetime.datetime(2025, 1, 1, 12, 0, 0)
    rows1 = [(1, "alpha beta", t0), (2, "gamma", t0)]
    rows2 = [(3, "alpha beta", t0), (4, "delta", t0)]  # 3 duplicates 1
    schema = "doc_id int, text string, ts timestamp"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(stream_dir)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(stream_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    q = (
        jobs.streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r["doc_id"] for r in spark.table("dedup_sink").collect())
    # exactly one of {1, 3} survives (first seen wins), both 2 and 4 do
    assert 2 in got and 4 in got
    assert len([i for i in got if i in (1, 3)]) == 1
    assert len(got) == 3


def test_streaming_near_dedup_suppresses_reordered_copies(spark, tmp_path):
    """Near-dedup on the stream: a token-reordered copy (identical
    SimHash fingerprint) arriving in a later micro-batch is suppressed;
    genuinely different docs pass."""
    import datetime

    stream_dir = str(tmp_path / "nd")
    os.makedirs(stream_dir)
    t0 = datetime.datetime(2025, 1, 1, 12, 0, 0)
    rows1 = [(1, "alpha beta gamma", t0), (2, "totally different words", t0)]
    rows2 = [(3, "gamma alpha beta", t0),  # reorder of 1 -> same fingerprint
             (4, "another unrelated document", t0)]
    schema = "doc_id int, text string, ts timestamp"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(stream_dir)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(stream_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    q = (
        jobs.streaming_near_dedup(stream)
        .writeStream.format("memory")
        .queryName("near_dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r["doc_id"] for r in spark.table("near_dedup_sink").collect())
    assert 2 in got and 4 in got
    assert len([i for i in got if i in (1, 3)]) == 1  # reordered copy dropped
    assert len(got) == 3


def test_streaming_sync_maintains_attached_iceberg_export(spark, tmp_path):
    """The complete reference loop, streaming edition: a live CDC stream
    drives apply_changes, which maintains BOTH the mirror and its
    attached Iceberg export incrementally — after the barrier, a plain
    Iceberg reader sees exactly the synced state (moonlink's sub-second
    warehouse freshness, reference README.md:13-17)."""
    from pg_mooncake_spark.engine import MooncakeEngine
    from pg_mooncake_spark.sources.iceberg import read_iceberg
    from pg_mooncake_spark.streaming.cdc import start_sync

    eng = MooncakeEngine(spark, str(tmp_path / "wh"))
    src = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    eng.create_table("live_exp", source_df=src, primary_key=["k"])
    exp = str(tmp_path / "exp_ice")
    eng.attach_export("live_exp", exp)

    stream_dir = str(tmp_path / "changes")
    os.makedirs(stream_dir)
    stream = spark.readStream.schema("k int, v string, __op string").parquet(
        stream_dir
    )
    q = start_sync(
        eng,
        "live_exp",
        stream,
        checkpoint_dir=str(tmp_path / "ckpt"),
        processing_time="1 second",
    )
    try:
        spark.createDataFrame(
            [(1, None, "D"), (2, "b2", "U"), (3, "c", "I")],
            "k int, v string, __op string",
        ).write.mode("append").parquet(stream_dir)
        eng.wait_for_source_version("live_exp", 1, timeout=60)
        mirror = sorted((r["k"], r["v"]) for r in eng.table("live_exp").collect())
        export = sorted(
            (r["k"], r["v"]) for r in read_iceberg(spark, exp).collect()
        )
        assert mirror == export == [(2, "b2"), (3, "c")]
    finally:
        q.stop()

def test_streaming_sync_mid_stream_schema_evolve(spark, tmp_path):
    """A mid-stream upstream ADD COLUMN: with on_schema_drift='evolve'
    the sync loop widens the mirror instead of failing the query; rows
    before the drift read NULL in the new column."""
    from pg_mooncake_spark.engine import MooncakeEngine
    from pg_mooncake_spark.streaming.cdc import sync_available

    wh = str(tmp_path / "wh")
    eng = MooncakeEngine(spark, wh)
    eng.create_table(
        "sevo",
        source_df=spark.createDataFrame([(1, 10)], "k int, v int"),
        primary_key=["k"],
    )

    src_dir = str(tmp_path / "stream_src")
    os.makedirs(src_dir)
    # first micro-batch file: original shape (note null — the stream
    # schema is fixed at start; the DRIFT is what the mirror evolves on)
    spark.createDataFrame(
        [(2, 20, None, "I")], "k int, v int, note string, __op string"
    ).write.json(os.path.join(src_dir, "b0"))
    stream = (
        spark.readStream.schema("k int, v int, note string, __op string")
        .json(src_dir + "/*")
    )
    sync_available(
        eng, "sevo", stream,
        checkpoint_dir=str(tmp_path / "ckpt"),
        on_schema_drift="evolve",
    )
    out = {r["k"]: (r["v"], r["note"]) for r in eng.table("sevo").collect()}
    assert out == {1: (10, None), 2: (20, None)}

    # second batch carries a real value in the drifted column
    spark.createDataFrame(
        [(3, 30, "text", "I"), (1, 11, "upd", "U")],
        "k int, v int, note string, __op string",
    ).write.json(os.path.join(src_dir, "b1"))
    sync_available(
        eng, "sevo", stream,
        checkpoint_dir=str(tmp_path / "ckpt"),
        on_schema_drift="evolve",
    )
    out = {r["k"]: (r["v"], r["note"]) for r in eng.table("sevo").collect()}
    assert out == {1: (11, "upd"), 2: (20, None), 3: (30, "text")}


def test_streaming_export_commit_batching(spark, tmp_path):
    """VERDICT r7 task 9: export_commit_interval=N coalesces attached-
    export maintenance to one key-compacted row-delta per N micro-
    batches — the export's Iceberg snapshot chain grows strictly slower
    than per-batch syncing, while the final mirror and export states
    are identical (last change per key wins across the buffer)."""
    import time

    from pg_mooncake_spark.engine import MooncakeEngine
    from pg_mooncake_spark.sources.iceberg import _latest_metadata, read_iceberg
    from pg_mooncake_spark.streaming.cdc import sync_available

    batches = [
        [(1, "a1", "U")],
        [(3, "c", "I")],
        [(1, "a2", "U"), (2, None, "D")],
        [(4, "d", "I")],
    ]
    expected = [(1, "a2"), (3, "c"), (4, "d")]

    def run(interval: int, tag: str):
        eng = MooncakeEngine(spark, str(tmp_path / f"wh_{tag}"))
        eng.create_table(
            "b",
            source_df=spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
            primary_key=["k"],
        )
        exp = str(tmp_path / f"exp_{tag}")
        eng.attach_export("b", exp)
        sdir = str(tmp_path / f"src_{tag}")
        os.makedirs(sdir)
        for i, rows in enumerate(batches):
            spark.createDataFrame(
                rows, "k int, v string, __op string"
            ).coalesce(1).write.mode("append").parquet(sdir)
            time.sleep(0.05)  # distinct mtimes: file-source batch order
        stream = (
            spark.readStream.schema("k int, v string, __op string")
            .option("maxFilesPerTrigger", 1)
            .parquet(sdir)
        )
        sync_available(
            eng, "b", stream,
            checkpoint_dir=str(tmp_path / f"ckpt_{tag}"),
            export_commit_interval=interval,
        )
        mirror = sorted((r["k"], r["v"]) for r in eng.table("b").collect())
        export = sorted(
            (r["k"], r["v"]) for r in read_iceberg(spark, exp).collect()
        )
        snaps = len(_latest_metadata(exp).get("snapshots") or [])
        return mirror, export, snaps

    m1, e1, snaps_per_batch = run(1, "per")
    m2, e2, snaps_coalesced = run(2, "coal")
    assert m1 == e1 == expected
    assert m2 == e2 == expected
    assert snaps_coalesced < snaps_per_batch, (
        f"coalesced {snaps_coalesced} !< per-batch {snaps_per_batch}"
    )


class TestDeferredExportCrashSafety:
    """VERDICT r8 task 8 / r9 task 6: with defer_exports, a crash
    between the mirror merge and flush_exports must (a) keep the
    commit<flush freshness barrier honest — the commit watermark never
    claims export coverage it doesn't have — and (b) leave a resume
    path (repair_exports, run by start_sync on re-attach) that
    converges exports to the mirror exactly."""

    @staticmethod
    def _setup(spark, tmp_path, tag, change_feed):
        from pg_mooncake_spark.engine import MooncakeEngine

        eng = MooncakeEngine(spark, str(tmp_path / f"wh_{tag}"))
        eng.create_table(
            "t",
            source_df=spark.createDataFrame(
                [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
            ),
            primary_key=["k"],
            change_feed=change_feed,
        )
        exp = str(tmp_path / f"exp_{tag}")
        eng.attach_export("t", exp)
        return eng, exp

    @staticmethod
    def _export_rows(spark, exp):
        from pg_mooncake_spark.sources.iceberg import read_iceberg

        return sorted(
            (r["k"], r["v"]) for r in read_iceberg(spark, exp).collect()
        )

    def test_crash_between_merge_and_flush(self, spark, tmp_path):
        from pg_mooncake_spark.engine import MooncakeEngine

        eng, exp = self._setup(spark, tmp_path, "crash", change_feed=True)
        # batch 1 fully flushed (src version 1)
        eng.apply_changes(
            "t",
            spark.createDataFrame([(2, "b1", "U")], "k int, v string, __op string"),
            source_version=1,
        )
        # batches 2 and 3 deferred — exports never see them, then CRASH
        # (the buffer holding them dies with the process)
        for sv, rows in (
            (2, [(3, None, "D"), (4, "d", "I")]),
            (3, [(4, "d2", "U"), (5, "e", "I")]),
        ):
            eng.apply_changes(
                "t",
                spark.createDataFrame(rows, "k int, v string, __op string"),
                source_version=sv,
                defer_exports=True,
            )
        mirror_want = [(1, "a"), (2, "b1"), (4, "d2"), (5, "e")]
        assert sorted(
            (r["k"], r["v"]) for r in eng.table("t").collect()
        ) == mirror_want
        # barrier honest: export-lagging source versions are NOT claimed
        eng.wait_for_source_version("t", 1, timeout=5)
        with pytest.raises(TimeoutError):
            eng.wait_for_source_version("t", 2, timeout=0.3)
        assert self._export_rows(spark, exp) == [(1, "a"), (2, "b1"), (3, "c")]

        # resume in a NEW engine (fresh process over the same warehouse)
        eng2 = MooncakeEngine(spark, str(tmp_path / "wh_crash"))
        v = eng2.repair_exports("t")
        assert self._export_rows(spark, exp) == mirror_want
        assert eng2.catalog.get("t")["export_version"] == v
        # and the barrier now passes for the crashed window
        eng2.wait_for_source_version("t", 3, timeout=5)

    def test_repair_without_change_feed_state_diff(self, spark, tmp_path):
        from pg_mooncake_spark.engine import MooncakeEngine

        eng, exp = self._setup(spark, tmp_path, "diff", change_feed=False)
        eng.apply_changes(
            "t",
            spark.createDataFrame(
                [(1, "a9", "U"), (2, None, "D"), (9, "i", "I")],
                "k int, v string, __op string",
            ),
            source_version=1,
            defer_exports=True,
        )
        # no feed for DML commits → repair falls back to the state diff
        eng2 = MooncakeEngine(spark, str(tmp_path / "wh_diff"))
        eng2.repair_exports("t")
        mirror = sorted((r["k"], r["v"]) for r in eng2.table("t").collect())
        assert self._export_rows(spark, exp) == mirror == [
            (1, "a9"), (3, "c"), (9, "i"),
        ]

    def test_restarted_sync_loop_repairs_first(self, spark, tmp_path):
        """Streaming shape: drain with export_commit_interval larger
        than the batch count, 'crash' by never flushing the tail, then
        restart the loop over new data — the re-attach must converge
        the export for the crashed window AND the new batches."""
        import time

        from pg_mooncake_spark.engine import MooncakeEngine
        from pg_mooncake_spark.streaming.cdc import start_sync

        eng, exp = self._setup(spark, tmp_path, "loop", change_feed=True)
        sdir = str(tmp_path / "src_loop")
        os.makedirs(sdir)
        for rows in ([[(2, "b9", "U")]], [[(7, "g", "I")]]):
            spark.createDataFrame(
                rows[0], "k int, v string, __op string"
            ).coalesce(1).write.mode("append").parquet(sdir)
            time.sleep(0.05)
        stream = (
            spark.readStream.schema("k int, v string, __op string")
            .option("maxFilesPerTrigger", 1)
            .parquet(sdir)
        )
        q = start_sync(
            eng, "t", stream,
            checkpoint_dir=str(tmp_path / "ckpt_loop"),
            trigger_available_now=True,
            export_commit_interval=100,  # never flushes during the drain
        )
        q.awaitTermination()
        # crash: flush_pending_exports is never called; export is stale
        assert self._export_rows(spark, exp) == [(1, "a"), (2, "b"), (3, "c")]

        eng2 = MooncakeEngine(spark, str(tmp_path / "wh_loop"))
        spark.createDataFrame(
            [(8, "h", "I")], "k int, v string, __op string"
        ).coalesce(1).write.mode("append").parquet(sdir)
        stream2 = (
            spark.readStream.schema("k int, v string, __op string")
            .option("maxFilesPerTrigger", 1)
            .parquet(sdir)
        )
        q2 = start_sync(
            eng2, "t", stream2,
            checkpoint_dir=str(tmp_path / "ckpt_loop"),
            trigger_available_now=True,
        )
        q2.awaitTermination()
        mirror = sorted((r["k"], r["v"]) for r in eng2.table("t").collect())
        assert self._export_rows(spark, exp) == mirror
        assert (8, "h") in mirror and (2, "b9") in mirror and (7, "g") in mirror


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_op_batch = st.lists(
    st.tuples(st.integers(min_value=1, max_value=6), st.sampled_from("IUD")),
    min_size=1, max_size=3,
).map(lambda ops: list({k: op for k, op in ops}.items()))  # one op per key


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batches=st.lists(_op_batch, min_size=1, max_size=4),
    crash_after=st.integers(min_value=0, max_value=3),
)
def test_deferred_export_crash_repair_property(spark, batches, crash_after):
    """Property (VERDICT r8 task 8): for ANY batch sequence and ANY
    crash point splitting it into flushed/deferred-then-lost halves,
    (1) the commit watermark never exceeds the last flushed source
    version, and (2) repair_exports converges the export to the
    mirror exactly."""
    import tempfile

    from pg_mooncake_spark.engine import MooncakeEngine
    from pg_mooncake_spark.sources.iceberg import read_iceberg

    wh = tempfile.mkdtemp(prefix="crashprop_wh_")
    exp = tempfile.mkdtemp(prefix="crashprop_exp_") + "/e"
    eng = MooncakeEngine(spark, wh)
    eng.create_table(
        "p",
        source_df=spark.createDataFrame(
            [(1, "a"), (2, "b")], "k int, v string"
        ),
        primary_key=["k"],
        change_feed=True,
    )
    eng.attach_export("p", exp)
    crash_after = min(crash_after, len(batches))
    live = {1: "a", 2: "b"}
    for i, ops in enumerate(batches):
        sv = i + 1
        rows = []
        for k, op in ops:
            if op == "D" and k not in live:
                op = "I"  # deleting an absent key: degrade to insert
            val = None if op == "D" else f"v{sv}_{k}"
            rows.append((k, val, op))
            if op == "D":
                live.pop(k, None)
            else:
                live[k] = val
        eng.apply_changes(
            "p",
            spark.createDataFrame(rows, "k int, v string, __op string"),
            source_version=sv,
            defer_exports=(i >= crash_after),
        )
    entry = eng.catalog.get("p")
    assert (entry.get("commit_version") or 0) <= crash_after
    # crash + resume
    eng2 = MooncakeEngine(spark, wh)
    eng2.repair_exports("p")
    mirror = sorted((r["k"], r["v"]) for r in eng2.table("p").collect())
    export = sorted(
        (r["k"], r["v"]) for r in read_iceberg(spark, exp).collect()
    )
    assert mirror == export == sorted(live.items())
    assert eng2.catalog.get("p")["commit_version"] == len(batches) or not batches


def test_stream_chaining_pk_rewrite_via_feed_primary_key(spark, tmp_path):
    """VERDICT r9 task 8: stream-stream mirror chaining with a
    pk-REWRITING upstream update.  feed_as_ops cannot run the
    (version, pk) anti-join on a stream, so start_sync takes the RAW
    feed plus feed_primary_key and converts per micro-batch inside
    foreachBatch, where the frame is batch-mode.  The downstream must
    drop the OLD key (the shape the plain upsert chaining silently
    got wrong)."""
    import time

    from pg_mooncake_spark.engine import MooncakeEngine
    from pg_mooncake_spark.streaming.cdc import start_sync

    eng = MooncakeEngine(spark, str(tmp_path / "wh"))
    eng.create_table(
        "up",
        source_df=spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        primary_key=["k"],
        change_feed="full",
    )
    eng.create_table("down", source_df=eng.table("up"), primary_key=["k"])
    q = start_sync(
        eng, "down", eng.stream_changes("up"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        processing_time="1 second",
        feed_primary_key=["k"],
    )
    try:
        # pk rewrite upstream: k 1 -> 100 (plus a key-preserving update)
        eng.update_where("up", "k = 1", {"k": "100"})
        eng.update_where("up", "k = 2", {"v": "'B'"})
        want = sorted(tuple(r) for r in eng.table("up").collect())
        assert (100, "a") in want and (1, "a") not in want
        deadline = time.monotonic() + 60
        got = None
        while time.monotonic() < deadline:
            got = sorted(tuple(r) for r in eng.table("down").collect())
            if got == want:
                break
            time.sleep(0.5)
        # the old key must be DELETED downstream, not left dangling
        assert got == want
    finally:
        q.stop()


def test_streaming_index_dedup_unbounded_horizon(spark, tmp_path):
    """The persisted-index ingest gate drops duplicates of ANY earlier
    batch (no watermark eviction), dedups within a batch, and admits
    genuinely new documents while extending the index O(batch)."""
    stream_dir = str(tmp_path / "in")
    os.makedirs(stream_dir)
    idx = str(tmp_path / "mh_index")
    schema = "doc_id int, text string"
    b1 = [(1, "the quick brown fox jumps over the lazy dog today"),
          (2, "entirely different words compose this second document here")]
    # batch 2: 3 duplicates 1 (cross-batch), 4+5 duplicate each other
    # (in-batch), 6 is new
    b2 = [(3, "the quick brown fox jumps over the lazy dog today"),
          (4, "novel content for the pair of twin documents in batch two"),
          (5, "novel content for the pair of twin documents in batch two"),
          (6, "a third genuinely unique document closes out the stream")]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append").parquet(stream_dir)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append").parquet(stream_dir)

    accepted = []

    def accept(df, bid):
        accepted.extend(r.doc_id for r in df.select("doc_id").collect())

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    q = (
        jobs.streaming_index_dedup(stream, idx, accept)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    got = sorted(accepted)
    assert 1 in got and 2 in got and 6 in got
    assert 3 not in got            # cross-batch duplicate: index horizon
    assert (4 in got) != (5 in got)  # in-batch pair: exactly one survives
