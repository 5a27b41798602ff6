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


class TestSchemeDispatch:
    """VERDICT r9 task 5: the scheme registry itself, exercised through
    get_backend (not an injected backend)."""

    def test_mem_buckets_are_process_shared(self):
        from pg_mooncake_spark import fsio

        a = fsio.get_backend("mem://bkt1/wh/t")
        b = fsio.get_backend("mem://bkt1/other")
        c = fsio.get_backend("mem://bkt2/wh/t")
        assert a is b and a is not c
        a.write_atomic("mem://bkt1/wh/x", b"1")
        assert b.read_bytes("mem://bkt1/wh/x") == b"1"
        assert not c.exists("mem://bkt1/wh/x")

    def test_local_and_file_paths_use_localfs(self, tmp_path):
        from pg_mooncake_spark import fsio

        assert isinstance(fsio.get_backend(str(tmp_path)), LocalFS)
        assert isinstance(fsio.get_backend(f"file://{tmp_path}"), LocalFS)

    def test_unregistered_scheme_raises(self):
        from pg_mooncake_spark import fsio

        with pytest.raises(ValueError, match="no storage backend"):
            fsio.get_backend("zzz://bucket/x")

    def test_register_scheme_routes(self):
        from pg_mooncake_spark import fsio

        marker = FakeObjectStore()
        fsio.register_scheme("testscheme", lambda p: marker)
        try:
            assert fsio.get_backend("testscheme://a/b") is marker
        finally:
            fsio._SCHEMES.pop("testscheme", None)

    def test_moontable_lifecycle_on_mem_scheme(self, spark, tmp_path):
        """Full lifecycle — create, append, merge, time travel, vacuum,
        recreate-visibility — with the commit log resolved to a
        ``mem://`` bucket via URI dispatch, data parquet on a local
        Spark-readable data_path (the two-plane split a real s3a
        deployment uses)."""
        from pg_mooncake_spark import fsio

        meta = "mem://lifecycle-bkt/wh/t"
        data = str(tmp_path / "data")
        mt = MoonTable(spark, meta, data_path=data)
        mt.create(SCHEMA, primary_key=["k"])
        mt.append(spark.createDataFrame([(1, 10), (2, 20)], SCHEMA))
        v2 = mt.merge(
            spark.createDataFrame(
                [(2, 99, "U"), (3, 30, "I"), (1, 0, "D")],
                "k int, v int, __op string",
            )
        )
        assert {r["k"]: r["v"] for r in mt.read().collect()} == {2: 99, 3: 30}
        assert {r["k"]: r["v"] for r in mt.read(v2 - 1).collect()} == {
            1: 10, 2: 20,
        }
        # the log lives in the shared mem bucket, not on local disk
        store = fsio.get_backend(meta)
        logs = store.listdir(f"{meta}/_moonlog")
        assert len(logs) == v2 + 1 and all(f.endswith(".json") for f in logs)
        import os as _os

        assert not _os.path.exists(_os.path.join(data, "_moonlog"))
        # data parquet is ordinary local files Spark wrote
        assert any(f.endswith(".parquet") for f in _os.listdir(data))
        # a second handle over the same URI sees the same state
        again = MoonTable(spark, meta, data_path=data)
        assert again.latest_version() == v2
        # compaction + vacuum run across the split planes
        again.optimize(target_partitions=1)
        assert again.vacuum(staging_grace_s=0) >= 0
        assert {r["k"]: r["v"] for r in again.read().collect()} == {
            2: 99, 3: 30,
        }


class TestS3ObjectStore:
    """S3ObjectStore against botocore's Stubber — no network, but the
    real request serialization, so the ADVICE r9 #3/#4 parsing and
    exists-semantics fixes are pinned."""

    @staticmethod
    def _store():
        import boto3
        from botocore.stub import Stubber

        from pg_mooncake_spark.fsio import S3ObjectStore

        st = S3ObjectStore.__new__(S3ObjectStore)
        st._s3 = boto3.client(
            "s3",
            region_name="us-east-1",
            aws_access_key_id="test",
            aws_secret_access_key="test",
        )
        return st, Stubber(st._s3)

    def test_split_handles_both_schemes(self):
        from pg_mooncake_spark.fsio import S3ObjectStore

        assert S3ObjectStore._split("s3://b/wh/t/x.json") == ("b", "wh/t/x.json")
        assert S3ObjectStore._split("s3a://b/wh/t/x.json") == ("b", "wh/t/x.json")
        assert S3ObjectStore._split("s3://bucket-only") == ("bucket-only", "")

    def test_exists_exact_key(self):
        st, stub = self._store()
        stub.add_response(
            "head_object", {}, {"Bucket": "b", "Key": "wh/t1"}
        )
        with stub:
            assert st.exists("s3://b/wh/t1") is True

    def test_exists_rejects_sibling_prefix(self):
        # only 'wh/t10/...' exists: head 404s, and the fallback must
        # list the '/'-boundary prefix 'wh/t1/' (which is empty), not
        # the raw 'wh/t1' prefix that would match the sibling
        st, stub = self._store()
        stub.add_client_error(
            "head_object", service_error_code="404",
            expected_params={"Bucket": "b", "Key": "wh/t1"},
        )
        stub.add_response(
            "list_objects_v2",
            {"KeyCount": 0},
            {"Bucket": "b", "Prefix": "wh/t1/", "MaxKeys": 1},
        )
        with stub:
            assert st.exists("s3://b/wh/t1") is False

    def test_exists_directory_prefix(self):
        st, stub = self._store()
        stub.add_client_error(
            "head_object", service_error_code="404",
            expected_params={"Bucket": "b", "Key": "wh/t"},
        )
        stub.add_response(
            "list_objects_v2",
            {"KeyCount": 1},
            {"Bucket": "b", "Prefix": "wh/t/", "MaxKeys": 1},
        )
        with stub:
            assert st.exists("s3a://b/wh/t") is True

    def test_put_if_absent_maps_412_to_commit_conflict(self):
        st, stub = self._store()
        stub.add_client_error(
            "put_object", service_error_code="PreconditionFailed",
            http_status_code=412,
            expected_params={
                "Bucket": "b", "Key": "wh/_moonlog/0000000001.json",
                "Body": b"{}", "IfNoneMatch": "*",
            },
        )
        with stub:
            with pytest.raises(CommitConflict):
                st.put_if_absent("s3://b/wh/_moonlog/0000000001.json", b"{}")

    def test_read_bytes_missing_key(self):
        st, stub = self._store()
        stub.add_client_error(
            "get_object", service_error_code="NoSuchKey",
            expected_params={"Bucket": "b", "Key": "nope"},
        )
        with stub:
            with pytest.raises(FileNotFoundError):
                st.read_bytes("s3://b/nope")
