"""Regression tests for the round-8 ADVICE findings fixed in round 9:

1. (high)   _COMMIT_CACHE stale across drop→recreate — covered by
            tests/test_lifecycle.py::TestDropRecreateSamePath.
2. (medium) vacuum's changes_retention sweep must not delete in-flight
            '.pending-*.parquet' staged change files inside the grace
            window (storage.py retention sweep).
3. (medium) mergeSchema append on a column-mapped Delta table must give
            new fields a FRESH physical name — re-adding a column named
            like a renamed column's old logical name must not collide
            with the surviving physical name (delta.py).
4. (low)    update_where must reject assignments to unknown columns
            instead of committing a silent no-op (storage.py).
5. (low)    feed_as_ops with primary_key must emit a D op for pre-images
            whose pk was rewritten away by the update (cdc.py).
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_mooncake_spark.engine import MooncakeEngine
from pg_mooncake_spark.storage import (
    _CHANGES_DIR,
    _PENDING_PREFIX,
    MoonTable,
    MoonTableError,
)


def test_vacuum_retention_spares_pending_change_files(spark, tmp_path):
    """ADVICE r8 medium: a staged '.pending-*.parquet' from an in-flight
    writer must survive the changes_retention sweep even when it is not
    in the keep-set (only the grace-gated pending sweep may reclaim it)."""
    path = str(tmp_path / "t")
    mt = MoonTable(spark, path)
    mt.create(
        T.StructType([T.StructField("k", T.IntegerType(), False)]),
        primary_key=["k"],
        change_feed=True,
    )
    for i in range(3):
        mt.merge(spark.createDataFrame([(i, "I")], "k int, __op string"))
    ch_dir = os.path.join(path, _CHANGES_DIR)
    staged = os.path.join(ch_dir, "." + _PENDING_PREFIX + "inflight.parquet")
    with open(staged, "wb") as f:
        f.write(b"stub")  # stands in for a writer mid-stage
    mt.vacuum(staging_grace_s=3600, changes_retention_versions=0)
    assert os.path.exists(staged), (
        "retention sweep deleted an in-flight staged change file"
    )
    # ...while the grace-expired pending sweep still reclaims orphans
    old = time.time() - 7200
    os.utime(staged, (old, old))
    mt.vacuum(staging_grace_s=3600)
    assert not os.path.exists(staged)


def test_mapped_merge_schema_fresh_physical_name(spark, tmp_path):
    """ADVICE r8 medium: rename a->b (physical stays 'a'), then
    mergeSchema-append a NEW column named 'a' — the new field needs a
    fresh physical name or the parquet read collides."""
    from pg_mooncake_spark.sources.delta import (
        read_delta,
        rename_column_delta,
        write_delta,
    )

    path = str(tmp_path / "d")
    write_delta(spark.createDataFrame([(1, "x")], "a int, v string"), path)
    rename_column_delta(path, "a", "b")
    # re-add a column with the old logical name
    write_delta(
        spark.createDataFrame([(2, "y", 99)], "b int, v string, a int"),
        path,
        mode="append",
        merge_schema=True,
    )
    got = {r["b"]: (r["v"], r["a"]) for r in read_delta(spark, path).collect()}
    assert got == {1: ("x", None), 2: ("y", 99)}
    # physical names must be unique across the mapped schema
    from pg_mooncake_spark.sources.delta import _col_mapping, _replay

    _live, _schema, _parts, st = _replay(path)
    phys = list(_col_mapping(st).values())
    assert len(phys) == len(set(phys))


def test_update_where_rejects_unknown_column(spark, tmp_path):
    """ADVICE r8 low: UPDATE t SET typo = 1 must error, not no-op."""
    eng = MooncakeEngine(spark, str(tmp_path / "wh"))
    eng.create_table(
        "t",
        source_df=spark.createDataFrame([(1, "a")], "k int, v string"),
        primary_key=["k"],
    )
    with pytest.raises(MoonTableError, match="typo_col"):
        eng.update_where("t", "k = 1", {"typo_col": "1"})
    with pytest.raises(MoonTableError, match="typo_col"):
        eng.sql("UPDATE t SET typo_col = 1 WHERE k = 1")
    # table unchanged, no junk commit for the failed updates
    assert [tuple(r) for r in eng.table("t").collect()] == [(1, "a")]


def test_feed_as_ops_pk_rewrite_emits_delete(spark, tmp_path):
    """ADVICE r8 low: an upstream UPDATE that rewrites the pk must chain
    as D(old key) + U(new key), not just the upsert."""
    from pg_mooncake_spark.engine import changes_df
    from pg_mooncake_spark.storage import OP_COL
    from pg_mooncake_spark.streaming.cdc import feed_as_ops

    eng = MooncakeEngine(spark, str(tmp_path / "wh"))
    eng.create_table(
        "up",
        source_df=spark.createDataFrame(
            [(1, "a"), (2, "b")], "k int, v string"
        ),
        primary_key=["k"],
        table_config={"change_feed": True},
    )
    v0 = eng._moontable("up").latest_version()
    # pk rewrite: k 1 -> 100; plus a key-preserving update on k=2
    eng.update_where("up", "k = 1", {"k": "100"})
    eng.update_where("up", "k = 2", {"v": "'B'"})
    feed = eng.table_changes("up", start_version=v0 + 1)

    ops = feed_as_ops(feed, primary_key=["k"])
    got = {(r["k"], r[OP_COL]) for r in ops.collect()}
    assert (100, "U") in got and (1, "D") in got  # rewrite → delete old key
    assert (2, "U") in got and (2, "D") not in got  # preserved key: no D

    # chained downstream mirror converges (old key gone)
    eng.create_table(
        "down",
        source_df=eng.table("up", version=v0),
        primary_key=["k"],
    )
    eng.apply_changes("down", ops, source_version=1)
    want = sorted(tuple(r) for r in eng.table("up").collect())
    assert sorted(tuple(r) for r in eng.table("down").collect()) == want

    # default (no primary_key) keeps the documented drop-preimage shape
    legacy = {
        (r["k"], r[OP_COL]) for r in feed_as_ops(feed).collect()
    }
    assert (1, "D") not in legacy


def test_feed_as_ops_streaming_with_pk_refuses(spark, tmp_path):
    from pg_mooncake_spark.streaming.cdc import feed_as_ops

    eng = MooncakeEngine(spark, str(tmp_path / "wh"))
    eng.create_table(
        "s",
        source_df=spark.createDataFrame([(1, "a")], "k int, v string"),
        primary_key=["k"],
        table_config={"change_feed": "full"},
    )
    stream = eng.stream_changes("s")
    if not stream.isStreaming:
        pytest.skip("stream_changes returned batch frame")
    with pytest.raises(NotImplementedError, match="watermark"):
        feed_as_ops(stream, primary_key=["k"])
