"""fsio seam: the commit protocols must rely only on primitives object
stores have (conditional PUT, atomic overwrite, prefix LIST, GET) —
never on POSIX rename/hard-link semantics.  FakeObjectStore emulates the
S3 contract in memory; a moontable runs its whole commit log against it
(data files stay local parquet, whose visibility the log governs — same
split as a real S3 deployment, where executors write data via s3a and
only the tiny log entry needs the conditional PUT)."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import types as T

from pg_mooncake_spark.fsio import CommitConflict, FakeObjectStore, LocalFS
from pg_mooncake_spark.storage import MoonTable, MoonTableError

SCHEMA = T.StructType(
    [
        T.StructField("k", T.IntegerType(), False),
        T.StructField("v", T.IntegerType(), True),
    ]
)


def test_fake_object_store_contract():
    s = FakeObjectStore()
    s.put_if_absent("/wh/t/_log/0.json", b"zero")
    assert s.read_bytes("/wh/t/_log/0.json") == b"zero"
    # conditional PUT: second writer to the same key loses
    with pytest.raises(CommitConflict):
        s.put_if_absent("/wh/t/_log/0.json", b"usurper")
    assert s.read_bytes("/wh/t/_log/0.json") == b"zero"
    assert s.conflicts == 1
    # plain PUT overwrites atomically
    s.write_atomic("/wh/t/hint", b"1")
    s.write_atomic("/wh/t/hint", b"2")
    assert s.read_bytes("/wh/t/hint") == b"2"
    # prefix LIST returns immediate children only, like a delimiter LIST
    s.put_if_absent("/wh/t/_log/1.json", b"one")
    assert s.listdir("/wh/t/_log") == ["0.json", "1.json"]
    assert s.listdir("/wh/t") == ["_log", "hint"]
    assert s.listdir("/wh/absent") == []
    assert s.exists("/wh/t/_log") and not s.exists("/wh/nope")


def test_conditional_put_serializes_racing_committers():
    """N threads race put_if_absent on one key: exactly one wins — the
    OCC guarantee every commit path builds on."""
    s = FakeObjectStore()
    wins, losses = [], []

    def attempt(i: int) -> None:
        try:
            s.put_if_absent("/t/_log/5.json", f"writer-{i}".encode())
            wins.append(i)
        except CommitConflict:
            losses.append(i)

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1 and len(losses) == 7
    assert s.read_bytes("/t/_log/5.json") == f"writer-{wins[0]}".encode()


def test_local_fs_put_if_absent_no_toctou(tmp_path):
    """LocalFS put_if_absent serializes on the kernel's EEXIST (hard
    link into place) — no exists-check window — and leaves no temp
    litter on either outcome."""
    import os

    fs = LocalFS()
    target = str(tmp_path / "c.json")
    fs.put_if_absent(target, b"first")
    with pytest.raises(CommitConflict):
        fs.put_if_absent(target, b"second")
    assert fs.read_bytes(target) == b"first"
    assert [f for f in os.listdir(tmp_path) if ".tmp." in f] == []


def test_moontable_commit_log_on_object_store(spark, tmp_path):
    """Full lifecycle — create, append, scattered-key merge, time
    travel, conflict detection — with the commit log hosted on the
    object-store contract.  Proves every log access goes through the
    seam (the fake store would raise on any os.* access) and that the
    OCC path is the conditional PUT."""
    store = FakeObjectStore()
    path = str(tmp_path / "t")
    mt = MoonTable(spark, path, backend=store)
    mt.create(SCHEMA, primary_key=["k"])
    v1 = mt.append(spark.createDataFrame([(1, 10), (2, 20)], SCHEMA))
    changes = spark.createDataFrame(
        [(2, 99, "U"), (3, 30, "I")], "k int, v int, __op string"
    )
    v2 = mt.merge(changes)
    assert {r["k"]: r["v"] for r in mt.read().collect()} == {1: 10, 2: 99, 3: 30}
    # time travel replays from object-store log entries
    assert {r["k"]: r["v"] for r in mt.read(v1).collect()} == {1: 10, 2: 20}
    assert store.conditional_puts >= 3 and store.conflicts == 0

    # a racing writer that committed version v2+1 first: a committer
    # that computed the same next-version must lose on the conditional
    # PUT, not overwrite
    store.put_if_absent(
        f"{path}/_moonlog/{v2 + 1:010d}.json",
        mt._read_commit(v2).to_json().encode(),
    )
    from pg_mooncake_spark.storage import Commit

    with pytest.raises(MoonTableError, match="concurrent commit"):
        mt._write_commit(Commit(version=v2 + 1, op="append"))
    assert store.conflicts == 1
    # a second moontable handle over the same store sees the same state
    again = MoonTable(spark, path, backend=store)
    assert again.latest_version() == v2 + 1
