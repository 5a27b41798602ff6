"""Delta-protocol source/sink and as-of join operator tests."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from pg_mooncake_spark.operators.asof import asof_join
from pg_mooncake_spark.sources.delta import (
    DeltaProtocolError,
    delta_version,
    read_delta,
    write_delta,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_delta_create_append_overwrite_timetravel(spark, tmp_path):
    path = str(tmp_path / "t")
    assert write_delta(_df(spark, [(1, "a")]), path) == 0
    assert write_delta(_df(spark, [(2, "b")]), path, mode="append") == 1
    assert sorted(tuple(r) for r in read_delta(spark, path).collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    assert write_delta(_df(spark, [(9, "z")]), path, mode="overwrite") == 2
    assert [tuple(r) for r in read_delta(spark, path).collect()] == [(9, "z")]
    # time travel to pre-overwrite state
    assert sorted(
        tuple(r) for r in read_delta(spark, path, version_as_of=1).collect()
    ) == [(1, "a"), (2, "b")]
    assert delta_version(path) == 2


def test_delta_log_is_real_protocol(spark, tmp_path):
    """The emitted log must carry protocol/metaData/add actions in the
    shape other Delta implementations parse."""
    path = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), path)
    log = os.path.join(path, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(l) for l in open(log) if l.strip()]
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "protocol" and kinds[1] == "metaData"
    assert "add" in kinds
    md = actions[1]["metaData"]
    assert md["format"]["provider"] == "parquet"
    schema = json.loads(md["schemaString"])
    assert [f["name"] for f in schema["fields"]] == ["k", "v"]
    add = next(a for a in actions if "add" in a)["add"]
    assert os.path.exists(os.path.join(path, add["path"]))
    assert add["size"] > 0


def test_delta_error_modes(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), path)
    with pytest.raises(DeltaProtocolError, match="already exists"):
        write_delta(_df(spark, [(1, "a")]), path, mode="error")
    with pytest.raises(DeltaProtocolError, match="schema mismatch"):
        write_delta(
            spark.createDataFrame([(1,)], "other int"), path, mode="append"
        )
    with pytest.raises(DeltaProtocolError, match="not in log"):
        read_delta(spark, path, version_as_of=7)
    with pytest.raises(DeltaProtocolError, match="not a Delta table"):
        read_delta(spark, str(tmp_path / "missing"))


def test_delta_checkpoint_roundtrip(spark, tmp_path):
    """12 commits → auto-checkpoint at v10; the reader must replay
    checkpoint parquet + JSON tail and agree with the full-JSON history
    (VERDICT r1 #6: real-world tables checkpoint every 10 commits)."""
    path = str(tmp_path / "t")
    write_delta(_df(spark, [(0, "v0")]), path)
    for i in range(1, 13):
        write_delta(_df(spark, [(i, f"v{i}")]), path, mode="append")
    log_dir = os.path.join(path, "_delta_log")
    assert os.path.exists(os.path.join(log_dir, "_last_checkpoint"))
    assert os.path.exists(os.path.join(log_dir, f"{10:020d}.checkpoint.parquet"))
    got = sorted(tuple(r) for r in read_delta(spark, path).collect())
    assert got == [(i, f"v{i}") for i in range(13)]
    # reader must survive a vacuumed early log (checkpoint is authoritative)
    for v in range(0, 10):
        os.remove(os.path.join(log_dir, f"{v:020d}.json"))
    got = sorted(tuple(r) for r in read_delta(spark, path).collect())
    assert got == [(i, f"v{i}") for i in range(13)]
    # time travel below the checkpoint now refuses loudly
    with pytest.raises(DeltaProtocolError, match="predates checkpoint"):
        read_delta(spark, path, version_as_of=3)


def test_delta_partitioned_roundtrip(spark, tmp_path):
    """Partition columns are reconstructed from add.partitionValues, not
    directory names; data files physically lack them."""
    path = str(tmp_path / "p")
    df = spark.createDataFrame(
        [(1, "us", "a"), (2, "us", "b"), (3, "eu", "c"), (4, None, "d")],
        "k int, region string, v string",
    )
    write_delta(df, path, partition_by=["region"])
    got = sorted(
        (r["k"], r["region"], r["v"]) for r in read_delta(spark, path).collect()
    )
    assert got == [(1, "us", "a"), (2, "us", "b"), (3, "eu", "c"), (4, None, "d")]
    # appended rows are re-split into their partitions
    write_delta(
        spark.createDataFrame([(5, "eu", "e")], "k int, region string, v string"),
        path,
        mode="append",
    )
    eu = read_delta(spark, path).filter("region = 'eu'")
    assert sorted(r["k"] for r in eu.collect()) == [3, 5]
    # data files must not contain the partition column
    log = os.path.join(path, "_delta_log", f"{0:020d}.json")
    add = next(
        json.loads(l)["add"] for l in open(log) if l.strip() and "add" in json.loads(l)
    )
    import pyarrow.parquet as pq

    assert "region" not in pq.read_schema(os.path.join(path, add["path"])).names
    assert add["partitionValues"] in ({"region": "us"}, {"region": "eu"}, {"region": None})


def test_delta_append_conforms_types(spark, tmp_path):
    """A type-mismatched append must not commit physical types that
    disagree with the metaData schemaString (ADVICE r1): the input is
    cast-conformed to the table schema."""
    path = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), path)
    write_delta(
        spark.createDataFrame([(2.9, "b")], "k double, v string"),
        path,
        mode="append",
    )
    got = sorted(tuple(r) for r in read_delta(spark, path).collect())
    assert got == [(1, "a"), (2, "b")]  # 2.9 cast to int per table schema
    assert dict(read_delta(spark, path).dtypes)["k"] == "int"


def test_asof_join_basic_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 100, "c1"), (1, 200, "c2"), (2, 150, "c3")],
        "user_id int, t int, tag string",
    ).select("user_id", F.timestamp_seconds("t").alias("ts"), "tag")
    right = spark.createDataFrame(
        [(1, 90, 1.0), (1, 180, 2.0), (2, 400, 9.0)],
        "user_id int, t int, price double",
    ).select("user_id", F.timestamp_seconds("t").alias("ts"), "price")

    out = asof_join(left, right, on="user_id", ts_col="ts")
    got = {r["tag"]: r["price_r"] for r in out.collect()}
    # c1@100 sees 90 → 1.0; c2@200 sees 180 → 2.0; c3@150 has no prior row
    assert got == {"c1": 1.0, "c2": 2.0, "c3": None}

    # with a 15-second tolerance, c1's 10-s-old match survives, c2's
    # 20-s-old match is dropped
    out_tol = asof_join(left, right, on="user_id", ts_col="ts", tolerance_seconds=15)
    got_tol = {r["tag"]: r["price_r"] for r in out_tol.collect()}
    assert got_tol == {"c1": 1.0, "c2": None, "c3": None}


def test_asof_join_null_payload_not_stitched(spark):
    """A newer right row with a NULL payload column must NOT resurrect
    that column from an older right row (the matched row is atomic)."""
    left = spark.createDataFrame([(1, 300, "q")], "k int, t int, tag string").select(
        "k", F.timestamp_seconds("t").alias("ts"), "tag"
    )
    right = spark.createDataFrame(
        [(1, 100, 7.0, "old"), (1, 200, None, "new")],
        "k int, t int, price double, label string",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "price", "label")
    out = asof_join(left, right, on="k", ts_col="ts").first()
    assert out["label_r"] == "new"
    assert out["price_r"] is None, "stale price stitched from an older right row"


def test_asof_join_simultaneous_match(spark):
    """A right row at exactly left.ts must be visible (<= semantics)."""
    left = spark.createDataFrame([(1, 100, "x")], "k int, t int, tag string").select(
        "k", F.timestamp_seconds("t").alias("ts"), "tag"
    )
    right = spark.createDataFrame([(1, 100, 5.0)], "k int, t int, p double").select(
        "k", F.timestamp_seconds("t").alias("ts"), "p"
    )
    out = asof_join(left, right, on="k", ts_col="ts")
    assert out.first()["p_r"] == 5.0


# ------------------------------------------------------------- iceberg


def _stage_iceberg(spark, root, n_files=2, total_data_files=None, extra_meta=None):
    """Minimal on-disk Iceberg layout for the jar-less fallback."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(root)
    os.makedirs(os.path.join(path, "metadata"))
    os.makedirs(os.path.join(path, "data"))
    for i in range(n_files):
        pq.write_table(
            pa.table({"k": [i], "v": [f"r{i}"]}),
            os.path.join(path, "data", f"f{i}.parquet"),
        )
    meta = {
        "format-version": 2,
        "current-snapshot-id": 777,
        "snapshots": [
            {
                "snapshot-id": 777,
                "summary": {
                    "total-data-files": str(
                        n_files if total_data_files is None else total_data_files
                    ),
                    "total-delete-files": "0",
                },
            }
        ],
    }
    meta.update(extra_meta or {})
    with open(os.path.join(path, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    return path


def test_iceberg_fallback_reads_current_snapshot(spark, tmp_path):
    from pg_mooncake_spark.sources.iceberg import read_iceberg

    path = _stage_iceberg(spark, tmp_path / "ice")
    got = sorted(tuple(r) for r in read_iceberg(spark, path).collect())
    assert got == [(0, "r0"), (1, "r1")]


def test_iceberg_fallback_refuses_orphaned_files(spark, tmp_path):
    """A rewritten/compacted table leaves orphans under data/; the raw
    scan must refuse instead of silently re-including them (VERDICT r1 #9)."""
    from pg_mooncake_spark.sources.iceberg import IcebergSupportError, read_iceberg

    path = _stage_iceberg(spark, tmp_path / "ice", n_files=3, total_data_files=2)
    with pytest.raises(IcebergSupportError, match="orphaned"):
        read_iceberg(spark, path)


def test_iceberg_fallback_refuses_time_travel(spark, tmp_path):
    from pg_mooncake_spark.sources.iceberg import IcebergSupportError, read_iceberg

    path = _stage_iceberg(spark, tmp_path / "ice")
    with pytest.raises(IcebergSupportError, match="not in table history"):
        read_iceberg(spark, path, snapshot_id=123)


def test_iceberg_metadata_version_sort_is_numeric(tmp_path):
    """v10 must beat v9 (lexical sort picks v9; ADVICE r1)."""
    from pg_mooncake_spark.sources.iceberg import _latest_metadata

    path = str(tmp_path / "ice")
    os.makedirs(os.path.join(path, "metadata"))
    for v, marker in [(9, "old"), (10, "new")]:
        with open(os.path.join(path, "metadata", f"v{v}.metadata.json"), "w") as fh:
            json.dump({"marker": marker}, fh)
    assert _latest_metadata(path)["marker"] == "new"


def test_avro_container_roundtrip(tmp_path):
    """The pure-Python Avro layer must round-trip nested records, unions,
    maps, arrays, negative/large varints, under both codecs."""
    from pg_mooncake_spark.sources.avro import read_avro, write_avro

    schema = {
        "type": "record", "name": "e", "fields": [
            {"name": "status", "type": "int"},
            {"name": "sid", "type": ["null", "long"]},
            {"name": "kind", "type": {"type": "enum", "name": "K",
                                      "symbols": ["DATA", "DELETES"]}},
            {"name": "sync", "type": {"type": "fixed", "name": "S", "size": 4}},
            {"name": "ok", "type": "boolean"},
            {"name": "score", "type": "double"},
            {"name": "df", "type": {"type": "record", "name": "d", "fields": [
                {"name": "path", "type": "string"},
                {"name": "n", "type": "long"},
                {"name": "pv", "type": {"type": "map", "values": ["null", "string"]}},
                {"name": "tags", "type": {"type": "array", "items": "string"}},
            ]}},
        ],
    }
    recs = [
        {"status": 1, "sid": 777, "kind": "DATA", "sync": b"\x00\x01\x02\x03",
         "ok": True, "score": -2.5,
         "df": {"path": "data/a.parquet", "n": -5, "pv": {"k": "1", "z": None},
                "tags": ["x", "y"]}},
        {"status": 2, "sid": None, "kind": "DELETES", "sync": b"\xff\xfe\xfd\xfc",
         "ok": False, "score": 0.0,
         "df": {"path": "data/b.parquet", "n": 1234567890123, "pv": {}, "tags": []}},
    ]
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"t_{codec}.avro")
        write_avro(p, schema, recs, codec=codec)
        _, back = read_avro(p)
        assert back == recs


_MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": "long"},
    ],
}
_MANIFEST_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "data_file", "type": {"type": "record", "name": "r2", "fields": [
            {"name": "content", "type": "int"},
            {"name": "file_path", "type": "string"},
            {"name": "file_format", "type": "string"},
            {"name": "record_count", "type": "long"},
        ]}},
    ],
}


def _stage_iceberg_manifest_table(tmp_path):
    """Two append snapshots + one rewrite snapshot, full manifest chain,
    plus an orphaned parquet under data/ that manifests never reference."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pg_mooncake_spark.sources.avro import write_avro

    root = str(tmp_path / "ice")
    os.makedirs(os.path.join(root, "metadata"))
    os.makedirs(os.path.join(root, "data"))

    def data_file(name, ks):
        p = os.path.join(root, "data", name)
        pq.write_table(pa.table({"k": ks, "v": [f"r{k}" for k in ks]}), p)
        return p

    fa = data_file("a.parquet", [1, 2])
    fb = data_file("b.parquet", [3])
    fc = data_file("compacted.parquet", [1, 2, 3])
    data_file("orphan.parquet", [99])

    def manifest(name, entries):
        p = os.path.join(root, "metadata", name)
        write_avro(p, _MANIFEST_SCHEMA, entries)
        return p

    def entry(status, path, content=0):
        return {"status": status, "snapshot_id": 1,
                "data_file": {"content": content, "file_path": path,
                              "file_format": "PARQUET", "record_count": 1}}

    m1 = manifest("m1.avro", [entry(1, fa)])
    m2 = manifest("m2.avro", [entry(0, fa), entry(1, fb)])
    m3 = manifest("m3.avro", [entry(2, fa), entry(2, fb), entry(1, fc)])

    def mlist(name, paths, content=0):
        p = os.path.join(root, "metadata", name)
        write_avro(
            p,
            _MANIFEST_LIST_SCHEMA,
            [{"manifest_path": mp, "manifest_length": os.path.getsize(mp),
              "content": content, "added_snapshot_id": 1} for mp in paths],
        )
        return p

    snapshots = [
        {"snapshot-id": 1, "manifest-list": mlist("snap-1.avro", [m1]), "summary": {}},
        {"snapshot-id": 2, "manifest-list": mlist("snap-2.avro", [m2]), "summary": {}},
        {"snapshot-id": 3, "manifest-list": mlist("snap-3.avro", [m3]), "summary": {}},
    ]
    meta = {"format-version": 2, "current-snapshot-id": 3, "snapshots": snapshots}
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    return root


def test_iceberg_manifest_read_and_time_travel(spark, tmp_path):
    """Manifest-chain reads: exact file list per snapshot (orphans under
    data/ ignored), snapshot_id time travel across appends AND rewrites."""
    from pg_mooncake_spark.sources.iceberg import read_iceberg

    root = _stage_iceberg_manifest_table(tmp_path)
    assert sorted(r["k"] for r in read_iceberg(spark, root).collect()) == [1, 2, 3]
    assert sorted(
        r["k"] for r in read_iceberg(spark, root, snapshot_id=1).collect()
    ) == [1, 2]
    assert sorted(
        r["k"] for r in read_iceberg(spark, root, snapshot_id=2).collect()
    ) == [1, 2, 3]
    # rewrite snapshot must not double-count pre-compaction files
    got = sorted(r["k"] for r in read_iceberg(spark, root, snapshot_id=3).collect())
    assert got == [1, 2, 3]


def _add_delete_snapshot(root, delete_parquet_name, rows, content):
    """Append snapshot 4 = the compacted data manifest + a delete manifest
    whose single entry (content=1 positional / 2 equality) references a
    real parquet file holding ``rows``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pg_mooncake_spark.sources.avro import write_avro

    meta_path = os.path.join(root, "metadata", "v1.metadata.json")
    meta = json.load(open(meta_path))
    fc = os.path.join(root, "data", "compacted.parquet")
    del_path = os.path.join(root, "data", delete_parquet_name)
    pq.write_table(pa.Table.from_pylist(rows), del_path)
    dmanifest = os.path.join(root, "metadata", "mdel.avro")
    write_avro(
        dmanifest,
        _MANIFEST_SCHEMA,
        [{"status": 1, "snapshot_id": 4,
          "data_file": {"content": content, "file_path": del_path,
                        "file_format": "PARQUET", "record_count": len(rows)}}],
    )
    dataman = os.path.join(root, "metadata", "m4.avro")
    write_avro(
        dataman,
        _MANIFEST_SCHEMA,
        [{"status": 0, "snapshot_id": 4,
          "data_file": {"content": 0, "file_path": fc,
                        "file_format": "PARQUET", "record_count": 3}}],
    )
    ml = os.path.join(root, "metadata", "snap-4.avro")
    write_avro(
        ml,
        _MANIFEST_LIST_SCHEMA,
        [{"manifest_path": dataman, "manifest_length": os.path.getsize(dataman),
          "content": 0, "added_snapshot_id": 4},
         {"manifest_path": dmanifest, "manifest_length": os.path.getsize(dmanifest),
          "content": 1, "added_snapshot_id": 4}],
    )
    meta["snapshots"].append({"snapshot-id": 4, "manifest-list": ml, "summary": {}})
    meta["current-snapshot-id"] = 4
    with open(os.path.join(root, "metadata", "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    return fc


def test_iceberg_positional_deletes_applied(spark, tmp_path):
    """v2 merge-on-read: content=1 positional deletes drop (file, pos)
    rows at scan time.  compacted.parquet holds k=[1,2,3]; deleting
    positions 0 and 2 must leave k=[2]."""
    from pg_mooncake_spark.sources.iceberg import read_iceberg

    root = _stage_iceberg_manifest_table(tmp_path)
    fc = _add_delete_snapshot(
        root, "pdel.parquet",
        [{"file_path": "", "pos": 0}, {"file_path": "", "pos": 2}],
        content=1,
    )
    # delete rows key on the manifest-recorded path
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pylist(
            [{"file_path": fc, "pos": 0}, {"file_path": fc, "pos": 2}]
        ),
        os.path.join(root, "data", "pdel.parquet"),
    )
    got = [(r["k"], r["v"]) for r in read_iceberg(spark, root).collect()]
    assert got == [(2, "r2")]
    # earlier snapshots (no deletes) still time-travel cleanly
    assert sorted(
        r["k"] for r in read_iceberg(spark, root, snapshot_id=3).collect()
    ) == [1, 2, 3]


def test_iceberg_refuses_unscopable_equality_deletes(spark, tmp_path):
    """Equality deletes without sequence numbers / equality_ids cannot be
    applied safely and must refuse."""
    from pg_mooncake_spark.sources.iceberg import IcebergSupportError, read_iceberg

    root = _stage_iceberg_manifest_table(tmp_path)
    _add_delete_snapshot(root, "edel.parquet", [{"k": 1}], content=2)
    with pytest.raises(IcebergSupportError, match="equality_ids or a sequence"):
        read_iceberg(spark, root)


_MANIFEST_SCHEMA_V2 = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "sequence_number", "type": ["null", "long"]},
        {"name": "data_file", "type": {"type": "record", "name": "r2", "fields": [
            {"name": "content", "type": "int"},
            {"name": "file_path", "type": "string"},
            {"name": "file_format", "type": "string"},
            {"name": "record_count", "type": "long"},
            {"name": "equality_ids", "type": ["null", {"type": "array", "items": "int"}]},
        ]}},
    ],
}


def test_iceberg_equality_deletes_sequence_scoped(spark, tmp_path):
    """content=2 equality deletes drop rows matching on equality_ids
    columns, but ONLY from data files with data_seq < delete_seq — a
    data file added after the delete keeps its matching rows (the CDC
    re-insert pattern Flink writers produce)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pg_mooncake_spark.sources.avro import write_avro
    from pg_mooncake_spark.sources.iceberg import read_iceberg

    root = str(tmp_path / "iceq")
    os.makedirs(os.path.join(root, "metadata"))
    os.makedirs(os.path.join(root, "data"))

    def data_file(name, rows):
        p = os.path.join(root, "data", name)
        pq.write_table(pa.Table.from_pylist(rows), p)
        return p

    # seq 1: k=1,2,3; seq 3 (after the delete): k=1 re-inserted
    f_old = data_file("old.parquet", [{"k": k, "v": f"r{k}"} for k in (1, 2, 3)])
    f_new = data_file("new.parquet", [{"k": 1, "v": "reborn"}])
    f_del = data_file("eqdel.parquet", [{"k": 1}, {"k": 3}])

    def entry(content, fp, seq, eq_ids=None):
        return {"status": 1, "snapshot_id": 1, "sequence_number": seq,
                "data_file": {"content": content, "file_path": fp,
                              "file_format": "PARQUET", "record_count": 1,
                              "equality_ids": eq_ids}}

    md = os.path.join(root, "metadata", "md.avro")
    write_avro(md, _MANIFEST_SCHEMA_V2,
               [entry(0, f_old, 1), entry(0, f_new, 3)])
    mdel = os.path.join(root, "metadata", "mdel.avro")
    write_avro(mdel, _MANIFEST_SCHEMA_V2, [entry(2, f_del, 2, eq_ids=[1])])
    ml = os.path.join(root, "metadata", "snap.avro")
    write_avro(
        ml,
        _MANIFEST_LIST_SCHEMA,
        [{"manifest_path": md, "manifest_length": os.path.getsize(md),
          "content": 0, "added_snapshot_id": 1},
         {"manifest_path": mdel, "manifest_length": os.path.getsize(mdel),
          "content": 1, "added_snapshot_id": 1}],
    )
    meta = {
        "format-version": 2, "current-snapshot-id": 1, "current-schema-id": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "string"}]}],
        "snapshots": [{"snapshot-id": 1, "manifest-list": ml, "summary": {}}],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)

    got = sorted((r["k"], r["v"]) for r in read_iceberg(spark, root).collect())
    # k=1 (seq1) and k=3 (seq1) deleted by the seq-2 delete; the seq-3
    # re-insert of k=1 survives
    assert got == [(1, "reborn"), (2, "r2")]


def test_delta_column_mapping_name_mode(spark, tmp_path):
    """Column mapping 'name' mode: parquet files carry physical col-<uuid>
    names; logical names live in schemaString metadata.  The reader must
    reconstruct logical columns (incl. partition columns, whose
    partitionValues keys are physical)."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "cm")
    os.makedirs(os.path.join(path, "_delta_log"))
    phys_k, phys_v, phys_r = "col-" + _uuid.uuid4().hex, "col-" + _uuid.uuid4().hex, "col-" + _uuid.uuid4().hex

    def field(name, phys, typ, cmid):
        return {"name": name, "type": typ, "nullable": True,
                "metadata": {"delta.columnMapping.id": cmid,
                             "delta.columnMapping.physicalName": phys}}

    schema_string = json.dumps({"type": "struct", "fields": [
        field("k", phys_k, "integer", 1),
        field("v", phys_v, "string", 2),
        field("region", phys_r, "string", 3),
    ]})
    data_name = "part-0.snappy.parquet"
    pq.write_table(
        pa.table({phys_k: pa.array([1, 2], type=pa.int32()), phys_v: ["a", "b"]}),
        os.path.join(path, data_name),
    )
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "m", "format": {"provider": "parquet", "options": {}},
                      "schemaString": schema_string,
                      "partitionColumns": ["region"],
                      "configuration": {"delta.columnMapping.mode": "name",
                                        "delta.columnMapping.maxColumnId": "3"},
                      "createdTime": 0}},
        {"add": {"path": data_name, "partitionValues": {phys_r: "eu"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ]
    with open(os.path.join(path, "_delta_log", f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")

    got = sorted(tuple(r) for r in read_delta(spark, path).collect())
    assert got == [(1, "a", "eu"), (2, "b", "eu")]
    assert [f.name for f in read_delta(spark, path).schema.fields] == ["k", "v", "region"]

    # id mode and writes to mapped tables refuse loudly
    with pytest.raises(DeltaProtocolError, match="not supported"):
        write_delta(_df(spark, [(3, "c")]), path, mode="append")


def test_iceberg_schema_evolution_fills_missing_columns(spark, tmp_path):
    """The declared metadata schema is imposed on the scan: files written
    before a column was added surface NULLs for it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pg_mooncake_spark.sources.avro import write_avro
    from pg_mooncake_spark.sources.iceberg import read_iceberg

    root = str(tmp_path / "ice")
    os.makedirs(os.path.join(root, "metadata"))
    os.makedirs(os.path.join(root, "data"))
    old_file = os.path.join(root, "data", "old.parquet")
    new_file = os.path.join(root, "data", "new.parquet")
    pq.write_table(pa.table({"k": pa.array([1], type=pa.int32())}), old_file)
    pq.write_table(
        pa.table({"k": pa.array([2], type=pa.int32()), "v": ["b"]}), new_file
    )
    m = os.path.join(root, "metadata", "m.avro")
    write_avro(
        m,
        _MANIFEST_SCHEMA,
        [{"status": 1, "snapshot_id": 1,
          "data_file": {"content": 0, "file_path": f, "file_format": "PARQUET",
                        "record_count": 1}} for f in (old_file, new_file)],
    )
    ml = os.path.join(root, "metadata", "snap.avro")
    write_avro(
        ml,
        _MANIFEST_LIST_SCHEMA,
        [{"manifest_path": m, "manifest_length": os.path.getsize(m),
          "content": 0, "added_snapshot_id": 1}],
    )
    meta = {
        "format-version": 2,
        "current-snapshot-id": 1,
        "current-schema-id": 1,
        "schemas": [
            {"schema-id": 0, "type": "struct",
             "fields": [{"id": 1, "name": "k", "required": True, "type": "int"}]},
            {"schema-id": 1, "type": "struct",
             "fields": [{"id": 1, "name": "k", "required": True, "type": "int"},
                        {"id": 2, "name": "v", "required": False, "type": "string"}]},
        ],
        "snapshots": [{"snapshot-id": 1, "manifest-list": ml, "summary": {}}],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    got = sorted((r["k"], r["v"]) for r in read_iceberg(spark, root).collect())
    assert got == [(1, None), (2, "b")]
    assert dict(read_iceberg(spark, root).dtypes) == {"k": "int", "v": "string"}


# ------------------------------------------------------------------ deletion
# vectors (public Delta protocol: roaring-bitmap DVs, Z85 encoding)


def test_z85_roundtrip_known_vector():
    """Z85 spec test vector (ZeroMQ RFC 32): 0x86 0x4F 0xD2 0x6F 0xB5
    0x59 0xF7 0x5B encodes to 'HelloWorld'."""
    from pg_mooncake_spark.sources.delta import _z85_decode, _z85_encode

    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert _z85_encode(raw) == "HelloWorld"
    assert _z85_decode("HelloWorld") == raw


def test_roaring64_roundtrip_and_foreign_containers():
    import struct

    from pg_mooncake_spark.sources.delta import (
        _parse_roaring64,
        _serialize_roaring64,
    )

    pos = [0, 1, 5, 65536, 65537, (3 << 32) | 7, (3 << 32) | 70000]
    assert _parse_roaring64(_serialize_roaring64(pos)) == sorted(pos)

    # foreign writers may emit bitmap containers (card > 4096): build one
    # by hand — values 0..5000 in key-0 container of the high-0 bitmap
    card = 5001
    words = [0] * 1024
    for v in range(card):
        words[v >> 6] |= 1 << (v & 63)
    bm = struct.pack("<ii", 12346, 1)  # no-run cookie, 1 container
    bm += struct.pack("<HH", 0, card - 1)
    bm += struct.pack("<i", 4 + 4 + 4 + 4)  # offset table (1 entry)
    bm += struct.pack("<1024Q", *words)
    data = struct.pack("<iq", 1681511377, 1) + struct.pack("<i", 0) + bm
    assert _parse_roaring64(data) == list(range(card))

    # ... and run containers (cookie 12347 + runflag bitset)
    rbm = struct.pack("<i", 12347 | (0 << 16))  # 1 container, run flag below
    rbm += bytes([1])  # runflag: container 0 is a run container
    rbm += struct.pack("<HH", 0, 9)  # key 0, cardinality 10
    rbm += struct.pack("<H", 2)  # two runs
    rbm += struct.pack("<HH", 10, 4)  # 10..14
    rbm += struct.pack("<HH", 100, 4)  # 100..104
    data = struct.pack("<iq", 1681511377, 1) + struct.pack("<i", 0) + rbm
    assert _parse_roaring64(data) == list(range(10, 15)) + list(range(100, 105))


def _stage_dv_table(spark, path, positions, inline=False):
    """Create a 1-file Delta table of rows (k, v) for k in 0..9, then
    commit a protocol-conformant DV masking ``positions`` in that file."""
    import pyarrow.parquet as pq

    from pg_mooncake_spark.sources import delta as D

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "k int, v string"
    ).coalesce(1)
    write_delta(df, path)
    adds, _, _, st = D._replay(path)
    (a,) = adds
    # physical row order in the file defines DV positions
    file_rows = pq.read_table(os.path.join(path, a["path"])).to_pylist()
    if inline:
        data = D._serialize_roaring64(positions)
        pad = (-len(data)) % 4
        dv = {
            "storageType": "i",
            "pathOrInlineDv": D._z85_encode(data + b"\x00" * pad),
            "sizeInBytes": len(data),
            "cardinality": len(positions),
        }
    else:
        dv = D.write_dv_file(path, positions)
    D._commit(
        path,
        st.last_v + 1,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                    "writerFeatures": ["deletionVectors"],
                }
            },
            {"remove": {"path": a["path"], "deletionTimestamp": 1, "dataChange": False}},
            {"add": {**a, "deletionVector": dv, "dataChange": False}},
        ],
    )
    expect = sorted(
        (r["k"], r["v"]) for i, r in enumerate(file_rows) if i not in set(positions)
    )
    return expect


def test_delta_deletion_vector_file_read(spark, tmp_path):
    path = str(tmp_path / "dv")
    expect = _stage_dv_table(spark, path, [1, 3, 5])
    got = sorted((r["k"], r["v"]) for r in read_delta(spark, path).collect())
    assert got == expect and len(got) == 7


def test_delta_deletion_vector_inline_read(spark, tmp_path):
    path = str(tmp_path / "dvi")
    expect = _stage_dv_table(spark, path, [0, 9], inline=True)
    got = sorted((r["k"], r["v"]) for r in read_delta(spark, path).collect())
    assert got == expect and len(got) == 8


def test_delta_checkpoint_carries_identity_and_tombstones(spark, tmp_path):
    """Checkpoints must carry the REPLAYED protocol/metaData (same table
    id, configuration, feature lists) and retain remove tombstones —
    not re-synthesize fresh ones (r2 ADVICE)."""
    from pg_mooncake_spark.sources import delta as D
    from pg_mooncake_spark.sources.delta import write_checkpoint

    path = str(tmp_path / "cp")
    write_delta(_df(spark, [(1, "a")]), path)
    write_delta(_df(spark, [(2, "b")]), path, mode="append")
    # graft a configuration + name into the log's metaData, as an external
    # writer would have
    log0 = os.path.join(path, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(l) for l in open(log0) if l.strip()]
    for a in actions:
        if "metaData" in a:
            a["metaData"]["configuration"] = {"delta.appendOnly": "false"}
            a["metaData"]["name"] = "trades"
            orig_id = a["metaData"]["id"]
    with open(log0, "w") as fh:
        fh.writelines(json.dumps(a) + "\n" for a in actions)
    write_delta(_df(spark, [(9, "z")]), path, mode="overwrite")  # -> tombstones
    write_checkpoint(path)
    # wipe the JSON history: the checkpoint must be self-sufficient
    for f in os.listdir(os.path.join(path, "_delta_log")):
        if f.endswith(".json"):
            os.remove(os.path.join(path, "_delta_log", f))
    _, _, _, st = D._replay(path)
    assert st.metadata["id"] == orig_id
    assert st.metadata["name"] == "trades"
    assert st.configuration == {"delta.appendOnly": "false"}
    assert st.tombstones  # overwrite's removed files survive the checkpoint
    assert [tuple(r) for r in read_delta(spark, path).collect()] == [(9, "z")]


def test_delta_column_mapping_id_mode(spark, tmp_path):
    """Column mapping 'id' mode: resolution is by parquet field id, not
    name — a file written before a column rename (old physical name, same
    field id) must still read correctly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "cmid")
    os.makedirs(os.path.join(path, "_delta_log"))

    def pa_field(name, typ, fid):
        return pa.field(name, typ, metadata={b"PARQUET:field_id": str(fid).encode()})

    # file 1: written when the columns were named k0/v0
    f1 = "part-old.snappy.parquet"
    pq.write_table(
        pa.table(
            [pa.array([1, 2], type=pa.int32()), pa.array(["a", "b"])],
            schema=pa.schema([pa_field("k0", pa.int32(), 1), pa_field("v0", pa.string(), 2)]),
        ),
        os.path.join(path, f1),
    )
    # file 2: written after the rename to k1/v1 — same field ids
    f2 = "part-new.snappy.parquet"
    pq.write_table(
        pa.table(
            [pa.array([3], type=pa.int32()), pa.array(["c"])],
            schema=pa.schema([pa_field("k1", pa.int32(), 1), pa_field("v1", pa.string(), 2)]),
        ),
        os.path.join(path, f2),
    )

    def field(name, phys, typ, cmid):
        return {"name": name, "type": typ, "nullable": True,
                "metadata": {"delta.columnMapping.id": cmid,
                             "delta.columnMapping.physicalName": phys}}

    schema_string = json.dumps({"type": "struct", "fields": [
        field("k", "k1", "integer", 1), field("v", "v1", "string", 2)]})
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "m", "format": {"provider": "parquet", "options": {}},
                      "schemaString": schema_string, "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "id",
                                        "delta.columnMapping.maxColumnId": "2"},
                      "createdTime": 0}},
        {"add": {"path": f1, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"add": {"path": f2, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    with open(os.path.join(path, "_delta_log", f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")

    got = sorted(tuple(r) for r in read_delta(spark, path).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    assert [f.name for f in read_delta(spark, path).schema.fields] == ["k", "v"]
    # appends on mapped tables stage files under the PHYSICAL names
    # (k1/v1 here), so the mapped reader resolves them like the originals
    write_delta(_df(spark, [(4, "d")]), path, mode="append")
    got = sorted(tuple(r) for r in read_delta(spark, path).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_delta_partitioned_write_is_one_job(spark, tmp_path):
    """50-partition write must stage through a single partitionBy job,
    not O(#partitions) filtered writes (r2 VERDICT 'What's wrong' #2)."""
    path = str(tmp_path / "many")
    df = spark.range(200).selectExpr("id AS k", "CAST(id % 50 AS INT) AS p")
    sc = spark.sparkContext
    sc.setJobGroup("stage-partitioned", "test")
    try:
        write_delta(df, path, partition_by=["p"])
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("stage-partitioned")
    assert len(jobs) <= 2, f"expected O(1) jobs, got {len(jobs)}"
    out = read_delta(spark, path)
    assert out.count() == 200
    assert out.select("p").distinct().count() == 50
    # log contents: every add carries its partitionValues and a real file
    log = os.path.join(path, "_delta_log", f"{0:020d}.json")
    adds = [json.loads(l)["add"] for l in open(log)
            if l.strip() and "add" in json.loads(l)]
    assert len(adds) >= 50
    for a in adds:
        assert set(a["partitionValues"]) == {"p"}
        assert os.path.exists(os.path.join(path, a["path"]))


def test_delta_partition_filter_prunes_add_files(spark, tmp_path):
    """read_delta(partition_filter=...): the add-file list is pruned on
    the log-recorded partitionValues before any scan is planned — since
    Delta partition columns live only in the log, file pruning IS exact
    row selection.  Symmetric with read_iceberg's partition_filter."""
    import pytest as _pytest

    from pg_mooncake_spark.sources.delta import DeltaProtocolError

    path = str(tmp_path / "dpf")
    df = spark.range(120).selectExpr(
        "id AS k",
        "CASE WHEN id % 3 = 0 THEN 'A' WHEN id % 3 = 1 THEN 'B' ELSE 'C' END"
        " AS grp",
        "DATE_ADD(DATE'2024-06-01', CAST(id % 2 AS INT)) AS d",
    )
    write_delta(df, path, partition_by=["grp", "d"])

    one = read_delta(
        spark, path, partition_filter={"grp": "B"}
    )
    rows = one.collect()
    assert len(rows) == 40 and all(r["grp"] == "B" for r in rows)
    # pruning happened at the FILE level, not as a post-scan filter
    full_files = read_delta(spark, path).inputFiles()
    assert len(one.inputFiles()) < len(full_files)

    import datetime as _dt

    both = read_delta(
        spark, path, partition_filter={"grp": "A", "d": _dt.date(2024, 6, 2)}
    )
    rows = both.collect()
    assert rows and all(
        r["grp"] == "A" and str(r["d"]) == "2024-06-02" for r in rows
    )
    assert {r["k"] for r in rows} == {
        k for k in range(120) if k % 3 == 0 and k % 2 == 1
    }

    # fully-pruned filter returns an empty frame with the declared schema
    none = read_delta(spark, path, partition_filter={"grp": "Z"})
    assert none.count() == 0
    assert {f.name for f in none.schema.fields} == {"k", "grp", "d"}

    # non-partition columns refuse
    with _pytest.raises(DeltaProtocolError, match="not partition columns"):
        read_delta(spark, path, partition_filter={"k": 1})


def test_delta_dv_delete_merge_on_read(spark, tmp_path):
    """delete_where_dv marks rows via deletion vectors (no file rewrite):
    data files survive byte-identical, repeat deletes merge positions,
    checkpoints carry the descriptors, and time travel sees pre-delete
    state."""
    from pg_mooncake_spark.sources.delta import delete_where_dv, write_checkpoint

    path = str(tmp_path / "mor")
    df = spark.range(100).selectExpr("id AS k", "CAST(id % 4 AS INT) AS p",
                                     "concat('v', id) AS v")
    write_delta(df, path, partition_by=["p"])
    files_before = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(path) for f in fs
        if f.endswith(".parquet") and "_delta_log" not in r
    )
    v = delete_where_dv(spark, path, "k % 10 = 3")  # 10 rows
    assert v == 1
    files_after = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(path) for f in fs
        if f.endswith(".parquet") and "_delta_log" not in r
    )
    assert files_before == files_after, "DV delete must not rewrite data files"
    out = read_delta(spark, path)
    assert out.count() == 90
    assert out.filter("k % 10 = 3").count() == 0
    # predicate over a partition column; merges with existing DVs
    v = delete_where_dv(spark, path, "p = 2 AND k < 50")
    assert v == 2
    out = read_delta(spark, path)
    assert out.filter("p = 2 AND k < 50").count() == 0
    assert out.count() == 90 - df.filter(
        "p = 2 AND k < 50 AND NOT (k % 10 = 3)").count()
    # no-op delete commits nothing
    assert delete_where_dv(spark, path, "k = 99999") == 2
    # time travel: version 0 still sees all 100 rows
    assert read_delta(spark, path, version_as_of=0).count() == 100
    # checkpoint round-trip with DV descriptors
    write_checkpoint(path)
    for f in os.listdir(os.path.join(path, "_delta_log")):
        if f.endswith(".json"):
            os.remove(os.path.join(path, "_delta_log", f))
    assert read_delta(spark, path).count() == out.count()


def test_delta_compact_folds_dvs_and_vacuum_reclaims(spark, tmp_path):
    """OPTIMIZE folds deletion vectors into rewritten files (dataChange
    false); vacuum then physically reclaims the tombstoned originals and
    orphaned DV bins while the current version keeps reading."""
    from pg_mooncake_spark.sources.delta import (
        compact_delta,
        delete_where_dv,
        vacuum_delta,
    )

    path = str(tmp_path / "opt")
    df = spark.range(100).selectExpr("id AS k", "concat('v', id) AS v")
    write_delta(df.repartition(4), path)
    delete_where_dv(spark, path, "k % 5 = 0")  # 20 rows -> DVs
    assert read_delta(spark, path).count() == 80

    v = compact_delta(spark, path, target_files=1)
    assert v == 2
    out = read_delta(spark, path)
    assert out.count() == 80 and out.filter("k % 5 = 0").count() == 0
    # compacted files carry no DVs; commit is dataChange: false throughout
    log = os.path.join(path, "_delta_log", f"{v:020d}.json")
    acts = [json.loads(l) for l in open(log) if l.strip()]
    for a in acts:
        if "add" in a:
            assert a["add"].get("deletionVector") is None
            assert a["add"]["dataChange"] is False
        if "remove" in a:
            assert a["remove"]["dataChange"] is False

    n_before = sum(
        f.endswith((".parquet", ".bin"))
        for _, _, fs in os.walk(path) for f in fs
    )
    deleted = vacuum_delta(path, retention_ms=0)
    assert deleted, "vacuum should reclaim the pre-compaction files"
    n_after = sum(
        f.endswith((".parquet", ".bin"))
        for _, _, fs in os.walk(path) for f in fs
    )
    assert n_after < n_before
    assert not [d for d in deleted if "_delta_log" in d]
    assert read_delta(spark, path).count() == 80  # current version intact


def test_roaring64_serializer_emits_bitmap_containers():
    """>4096 positions in one 16-bit container MUST serialize as a bitmap
    container — readers decide array-vs-bitmap from cardinality alone, so
    an array there is stream corruption (round-3 review finding)."""
    from pg_mooncake_spark.sources.delta import (
        _parse_roaring64,
        _serialize_roaring64,
    )

    dense = list(range(5000)) + [70000, (2 << 32) | 5]
    assert _parse_roaring64(_serialize_roaring64(dense)) == sorted(dense)


def test_vacuum_respects_tombstone_retention(spark, tmp_path):
    """Files tombstoned five minutes ago keep their retention clock even
    when the physical file's mtime is ancient (round-3 review finding:
    the orphan-mtime branch must not apply to tombstoned files)."""
    from pg_mooncake_spark.sources.delta import compact_delta, vacuum_delta

    path = str(tmp_path / "vr")
    write_delta(_df(spark, [(1, "a"), (2, "b")]), path)
    # age the data files' mtimes far past any retention window
    for r, _, fs in os.walk(path):
        if "_delta_log" in r:
            continue
        for f in fs:
            if f.endswith(".parquet"):
                os.utime(os.path.join(r, f), (1000, 1000))
    compact_delta(spark, path)  # tombstones the aged files NOW
    # 1-hour retention: tombstones are fresh -> nothing may be deleted
    assert vacuum_delta(path, retention_ms=3600 * 1000) == []
    assert read_delta(spark, path, version_as_of=0).count() == 2  # time travel OK


def test_iceberg_write_roundtrip_append_time_travel(spark, tmp_path):
    """write_iceberg produces a v2 manifest chain our manifest-chain
    reader replays exactly: fresh write, append snapshot, snapshot_id
    time travel back to the first commit."""
    from pg_mooncake_spark.sources.iceberg import (
        IcebergSupportError,
        read_iceberg,
        write_iceberg,
    )

    a = spark.createDataFrame([(1, "x"), (2, "y")], "k bigint, v string")
    b = spark.createDataFrame([(3, "z")], "k bigint, v string")
    path = str(tmp_path / "ice")
    write_iceberg(a, path)
    assert sorted(r["k"] for r in read_iceberg(spark, path).collect()) == [1, 2]

    write_iceberg(b, path, mode="append")
    assert sorted(r["k"] for r in read_iceberg(spark, path).collect()) == [1, 2, 3]

    import json as _json
    import os as _os

    meta_dir = path + "/metadata"
    latest = sorted(
        (f for f in _os.listdir(meta_dir) if f.endswith(".metadata.json"))
    )[-1]
    meta = _json.load(open(_os.path.join(meta_dir, latest)))
    first = meta["snapshots"][0]["snapshot-id"]
    assert sorted(
        r["k"] for r in read_iceberg(spark, path, snapshot_id=first).collect()
    ) == [1, 2]

    # refusals: double-create, schema drift on append
    import pytest as _pytest

    with _pytest.raises(IcebergSupportError, match="already exists"):
        write_iceberg(a, path)
    drifted = spark.createDataFrame([(4,)], "k bigint")
    with _pytest.raises(IcebergSupportError, match="schema"):
        write_iceberg(drifted, path, mode="append")


def test_iceberg_write_metadata_conformance(spark, tmp_path):
    """The written metadata carries the v2 spec's required shape:
    field-ids in the table schema, manifest file-metadata keys, and
    sequence-number inheritance (entries carry null seq, inherited from
    the manifest list)."""
    from pg_mooncake_spark.sources.avro import read_avro
    from pg_mooncake_spark.sources.iceberg import write_iceberg

    df = spark.createDataFrame([(1, 2.5)], "a bigint, b double")
    path = str(tmp_path / "ice2")
    write_iceberg(df, path)

    import glob as _glob
    import json as _json

    meta = _json.load(open(_glob.glob(path + "/metadata/v*.metadata.json")[0]))
    assert meta["format-version"] == 2
    ids = [f["id"] for f in meta["schemas"][0]["fields"]]
    assert ids == [1, 2] and meta["last-column-id"] == 2

    mlist = _glob.glob(path + "/metadata/snap-*.avro")[0]
    _, mfs = read_avro(mlist)
    assert mfs[0]["sequence_number"] == 1
    hdr, entries = read_avro(mfs[0]["manifest_path"])
    assert entries[0]["sequence_number"] is None  # inherited, per spec
    assert entries[0]["data_file"]["record_count"] == 1

    # metadata-log: each commit links its predecessor metadata file
    write_iceberg(df, path, mode="append")
    metas = sorted(
        _glob.glob(path + "/metadata/v*.metadata.json"),
        key=lambda f: int(os.path.basename(f)[1:].split(".")[0]),
    )
    m2 = _json.load(open(metas[-1]))
    assert [e["metadata-file"] for e in m2["metadata-log"]] == [metas[0]]
    assert "__pinned-version" not in m2 and "__pinned-file" not in m2


def test_iceberg_positional_delete_write_merge_on_read(spark, tmp_path):
    """delete_where_iceberg writes v2 positional delete files (no data
    rewrite): data files survive byte-identical, repeat deletes
    accumulate across snapshots, no-op deletes commit nothing, and
    snapshot time travel sees pre-delete state."""
    import glob as _glob

    from pg_mooncake_spark.sources.avro import read_avro
    from pg_mooncake_spark.sources.iceberg import (
        delete_where_iceberg,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "ice_del")
    df = spark.range(100).selectExpr("id AS k", "concat('v', id) AS v")
    write_iceberg(df.repartition(4), path)
    data_before = sorted(_glob.glob(path + "/data/s*/part-*.parquet"))

    sid = delete_where_iceberg(spark, path, "k % 5 = 0")  # 20 rows
    assert sid == 2
    assert sorted(_glob.glob(path + "/data/s*/part-*.parquet")) == data_before, (
        "positional delete must not rewrite data files"
    )
    out = read_iceberg(spark, path)
    assert out.count() == 80 and out.filter("k % 5 = 0").count() == 0

    # second delete: only LIVE matching rows (k in 1..9 minus 0,5) land in
    # the new delete file; both delete files apply cumulatively
    sid2 = delete_where_iceberg(spark, path, "k < 10")
    assert sid2 == 3
    out = read_iceberg(spark, path)
    assert out.count() == 72
    assert out.filter("k < 10 OR k % 5 = 0").count() == 0

    # no-op (nothing matches; also re-running an applied predicate)
    assert delete_where_iceberg(spark, path, "k = 12345") is None
    assert delete_where_iceberg(spark, path, "k % 5 = 0") is None

    # time travel: first snapshot sees all rows
    assert read_iceberg(spark, path, snapshot_id=1).count() == 100

    # manifest conformance: current snapshot carries a content=1 delete
    # manifest whose entries are content=1 files, sorted by (path, pos)
    mlists = sorted(_glob.glob(path + "/metadata/snap-*.avro"))
    _, mfs = read_avro(mlists[-1])
    del_mfs = [m for m in mfs if m["content"] == 1]
    assert len(del_mfs) == 2  # one per DELETE snapshot, carried forward
    _, entries = read_avro(del_mfs[0]["manifest_path"])
    assert all(e["data_file"]["content"] == 1 for e in entries)
    dfile = entries[0]["data_file"]["file_path"]
    rows = spark.read.parquet(dfile).collect()
    keys = [(r["file_path"], r["pos"]) for r in rows]
    assert keys == sorted(keys), "delete rows must be sorted (file_path, pos)"


def test_jdbc_source_mirror_and_partitioned_scan(spark, tmp_path):
    """A ``jdbc:`` source_uri mirrors a table on a live SQL engine
    (embedded Derby — the reference's remote-source create_table form):
    backfill snapshots the remote table, CDC applies on top, and the
    URI's partitionColumn options turn the scan into N range-sliced
    executor tasks."""
    from pg_mooncake_spark.engine import MooncakeEngine, changes_df
    from pg_mooncake_spark.sources.jdbc import jdbc_execute, read_jdbc

    db = str(tmp_path / "derbydb")
    jdbc_execute(
        spark,
        f"jdbc:derby:{db};create=true",
        "CREATE TABLE t (k BIGINT NOT NULL, v VARCHAR(32))",
        *[f"INSERT INTO t VALUES ({i}, 'v{i}')" for i in range(1, 21)],
    )

    # Derby folds unquoted identifiers to uppercase; the snapshot carries
    # the remote schema verbatim (K, V) like the reference copying
    # pg_attribute
    eng = MooncakeEngine(spark, str(tmp_path / "wh"))
    mt = eng.create_table("jm", source_uri=f"jdbc:derby:{db}#t",
                          primary_key=["K"])
    got = {(r["K"], r["V"]) for r in mt.read().collect()}
    assert got == {(i, f"v{i}") for i in range(1, 21)}

    # CDC on top of the JDBC backfill (backfill-then-tail)
    upd = spark.createDataFrame([(3, "patched")], "K long, V string")
    eng.apply_changes("jm", changes_df(upd, op="U"), source_version=1)
    assert mt.read().filter("K = 3").collect()[0]["V"] == "patched"

    # parallel scan: the URI options drive Spark's range-partitioned JDBC
    par = read_jdbc(
        spark,
        f"jdbc:derby:{db}#t?partitionColumn=k&lowerBound=1"
        "&upperBound=20&numPartitions=4",
    )
    assert par.rdd.getNumPartitions() == 4
    assert par.count() == 20

    # malformed URI: missing table fragment
    import pytest as _pytest

    with _pytest.raises(ValueError, match="must name the table"):
        read_jdbc(spark, f"jdbc:derby:{db}")


def test_iceberg_compact_folds_deletes_and_expire_reclaims(spark, tmp_path):
    """compact_iceberg rewrites the live state with positional deletes
    folded in (REPLACE snapshot, prior snapshots still readable);
    expire_snapshots then reclaims the files only the expired snapshots
    reference while the current state keeps reading."""
    import glob as _glob

    from pg_mooncake_spark.sources.iceberg import (
        compact_iceberg,
        delete_where_iceberg,
        expire_snapshots,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "ice_opt")
    df = spark.range(100).selectExpr("id AS k", "concat('v', id) AS v")
    write_iceberg(df.repartition(4), path)
    delete_where_iceberg(spark, path, "k % 5 = 0")  # 20 rows via deletes
    assert read_iceberg(spark, path).count() == 80

    sid = compact_iceberg(spark, path, target_files=1)
    assert sid == 3
    out = read_iceberg(spark, path)
    assert out.count() == 80 and out.filter("k % 5 = 0").count() == 0
    # pre-compaction snapshots still time-travel
    assert read_iceberg(spark, path, snapshot_id=1).count() == 100
    assert read_iceberg(spark, path, snapshot_id=2).count() == 80

    n_before = sum(
        f.endswith((".parquet", ".avro"))
        for _, _, fs in os.walk(path)
        for f in fs
    )
    deleted = expire_snapshots(path, retain_last=1)
    assert deleted, "expire should reclaim pre-compaction files"
    n_after = sum(
        f.endswith((".parquet", ".avro"))
        for _, _, fs in os.walk(path)
        for f in fs
    )
    assert n_after < n_before
    # old delete files and original data files are gone; current reads
    assert not _glob.glob(path + "/data/d*/part-*.parquet")
    assert read_iceberg(spark, path).count() == 80
    # expired snapshot no longer reachable
    import pytest as _pytest

    from pg_mooncake_spark.sources.iceberg import IcebergSupportError

    with _pytest.raises(IcebergSupportError, match="not in table history"):
        read_iceberg(spark, path, snapshot_id=1)
    # idempotent when nothing to expire
    assert expire_snapshots(path, retain_last=1) == []


def test_iceberg_compact_fully_emptied_table_stays_readable(spark, tmp_path):
    """Compacting a table whose rows were ALL deleted commits a REPLACE
    snapshot with zero data-file entries; the read path must return an
    empty DataFrame with the declared schema, not raise — otherwise
    optimize_table on a fully-emptied attached export bricks the export
    (ADVICE r6)."""
    from pg_mooncake_spark.sources.iceberg import (
        compact_iceberg,
        delete_where_iceberg,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "ice_empty")
    df = spark.range(10).selectExpr("id AS k", "concat('v', id) AS v")
    write_iceberg(df, path)
    delete_where_iceberg(spark, path, "k >= 0")  # delete everything
    assert read_iceberg(spark, path).count() == 0

    compact_iceberg(spark, path, target_files=1)
    out = read_iceberg(spark, path)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["k", "v"]
    # and appending to the emptied table still works
    write_iceberg(df.limit(3), path, mode="append")
    assert read_iceberg(spark, path).count() == 3


def test_delta_dv_update_merge_on_read(spark, tmp_path):
    """update_where_dv: matched rows get DV-tombstoned on their original
    files and re-appended with assignments applied, one atomic commit;
    repeat updates merge DVs; deleted rows are never resurrected; time
    travel sees pre-update state; compaction folds everything."""
    from pg_mooncake_spark.sources.delta import (
        DeltaProtocolError,
        compact_delta,
        delete_where_dv,
        update_where_dv,
    )

    path = str(tmp_path / "upd")
    df = spark.range(100).selectExpr(
        "id AS k", "CAST(id % 4 AS INT) AS p", "CAST(id AS DOUBLE) AS val"
    )
    write_delta(df, path, partition_by=["p"])
    delete_where_dv(spark, path, "k >= 90")  # 10 rows deleted first

    v = update_where_dv(spark, path, "k % 10 = 3", {"val": "val * 100"})
    assert v == 2
    out = read_delta(spark, path)
    assert out.count() == 90, "UPDATE must not change row count"
    got = {r["k"]: r["val"] for r in out.filter("k % 10 = 3").collect()}
    # k=93 was deleted; it must NOT be resurrected by the update
    assert sorted(got) == [3, 13, 23, 33, 43, 53, 63, 73, 83]
    assert all(got[k] == k * 100.0 for k in got)

    # untouched rows unchanged; repeat update compounds on current state
    assert out.filter("k = 4").collect()[0]["val"] == 4.0
    v = update_where_dv(spark, path, "k = 3", {"val": "val + 1"})
    assert v == 3
    assert read_delta(spark, path).filter("k = 3").collect()[0]["val"] == 301.0

    # no-op: nothing live matches
    assert update_where_dv(spark, path, "k = 93", {"val": "0"}) == 3

    # unknown assignment column refuses
    import pytest as _pytest

    with _pytest.raises(DeltaProtocolError, match="unknown columns"):
        update_where_dv(spark, path, "k = 1", {"nope": "1"})

    # time travel pre-update
    assert (
        read_delta(spark, path, version_as_of=1)
        .filter("k = 3")
        .collect()[0]["val"]
        == 3.0
    )

    # compaction folds DVs + update files into clean state
    compact_delta(spark, path)
    out = read_delta(spark, path)
    assert out.count() == 90
    assert out.filter("k = 3").collect()[0]["val"] == 301.0


def test_iceberg_equality_delete_write_sequence_scoped(spark, tmp_path):
    """delete_keys_iceberg writes v2 equality delete files (CDC-style:
    keys known, positions unknown): matching rows drop from EARLIER data
    files only — rows appended after the delete with the same keys
    survive, per sequence-number scoping — and our own reader applies
    them; compaction folds everything into clean files."""
    from pg_mooncake_spark.sources.avro import read_avro
    from pg_mooncake_spark.sources.iceberg import (
        IcebergSupportError,
        compact_iceberg,
        delete_keys_iceberg,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "ice_eq")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], "k bigint, v string"
    )
    write_iceberg(df, path)

    keys = spark.createDataFrame([(i,) for i in range(0, 50, 5)], "k bigint")
    sid = delete_keys_iceberg(spark, path, keys)  # 10 keys
    assert sid == 2
    out = read_iceberg(spark, path)
    assert out.count() == 40 and out.filter("k % 5 = 0").count() == 0

    # rows appended AFTER the delete with the same keys survive
    reinserted = spark.createDataFrame(
        [(0, "reborn0"), (5, "reborn5")], "k bigint, v string"
    )
    write_iceberg(reinserted, path, mode="append")
    out = read_iceberg(spark, path)
    assert out.count() == 42
    assert {r["v"] for r in out.filter("k IN (0, 5)").collect()} == {
        "reborn0",
        "reborn5",
    }

    # unknown key column refuses; empty keys is a no-op
    import pytest as _pytest

    with _pytest.raises(IcebergSupportError, match="not in table schema"):
        delete_keys_iceberg(spark, path, keys.withColumnRenamed("k", "zz"))
    empty = spark.createDataFrame([], "k bigint")
    assert delete_keys_iceberg(spark, path, empty) is None

    # manifest carries equality_ids pointing at the key field
    import glob as _glob

    mlists = sorted(_glob.glob(path + "/metadata/snap-*.avro"))
    found = []
    for ml in mlists:
        _, mfs = read_avro(ml)
        for m in mfs:
            if m["content"] == 1:
                _, entries = read_avro(m["manifest_path"])
                found.extend(e["data_file"]["equality_ids"] for e in entries)
    assert found and all(ids == [1] for ids in found)  # field id of k

    # compaction folds equality deletes; result unchanged
    compact_iceberg(spark, path)
    out = read_iceberg(spark, path)
    assert out.count() == 42
    assert out.filter("k % 5 = 0 AND k NOT IN (0, 5)").count() == 0


def test_roaring64_round_trip_properties():
    """Property: serialize→parse is identity for arbitrary position sets,
    across container-type boundaries (array ≤4096 < bitmap) and 32-bit
    high-word splits — the exact shapes a 100 TB table's DVs produce."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pg_mooncake_spark.sources.delta import (
        _parse_roaring64,
        _serialize_roaring64,
    )

    @given(
        st.lists(
            st.one_of(
                st.integers(min_value=0, max_value=1 << 40),
                # cluster near container boundaries to stress both
                # serializer branches and multi-container keys
                st.integers(min_value=4090, max_value=4100),
                st.integers(min_value=(1 << 32) - 5, max_value=(1 << 32) + 5),
            ),
            max_size=300,
        )
    )
    @settings(max_examples=200, deadline=None)
    def check(positions):
        assert _parse_roaring64(_serialize_roaring64(positions)) == sorted(
            set(positions)
        )

    check()

    # dense container crossing the 4096 cardinality threshold (bitmap form)
    dense = list(range(5000)) + [1 << 33, (1 << 33) + 70000]
    assert _parse_roaring64(_serialize_roaring64(dense)) == sorted(set(dense))


def test_avro_container_round_trip_properties():
    """Property: the pure-Python Avro writer/reader round-trips records
    with unions, arrays and nested records — the shapes Iceberg
    manifests use."""
    import os
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pg_mooncake_spark.sources.avro import read_avro, write_avro

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"], "default": None},
            {"name": "c", "type": {"type": "array", "items": "int"},
             "default": []},
            {"name": "d", "type": ["null", {
                "type": "record", "name": "sub",
                "fields": [{"name": "x", "type": "double"}]}],
             "default": None},
        ],
    }

    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=-(1 << 60), max_value=1 << 60),
                st.one_of(st.none(), st.text(max_size=40)),
                st.lists(st.integers(min_value=-(1 << 30), max_value=1 << 30),
                         max_size=8),
                st.one_of(
                    st.none(),
                    st.floats(allow_nan=False, allow_infinity=False,
                              width=64),
                ),
            ),
            max_size=25,
        )
    )
    @settings(max_examples=50, deadline=None)
    def check(rows):
        records = [
            {"a": a, "b": b, "c": c, "d": None if d is None else {"x": d}}
            for a, b, c, d in rows
        ]
        fd, fpath = tempfile.mkstemp(suffix=".avro")
        os.close(fd)
        try:
            write_avro(fpath, schema, records)
            _, back = read_avro(fpath)
            assert back == records
        finally:
            os.unlink(fpath)

    check()


def test_delta_append_merge_schema_evolution(spark, tmp_path):
    """mergeSchema appends: new input columns widen the table schema in
    the same commit (old files surface typed NULLs), input gaps land as
    NULLs, and the checkpoint carries the evolved schema.  Without
    merge_schema the same append refuses."""
    from pg_mooncake_spark.sources.delta import (
        DeltaProtocolError,
        delta_version,
        write_checkpoint,
    )

    path = str(tmp_path / "evolve")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), path
    )
    wider = spark.createDataFrame(
        [(3, "c", 3.5)], "k long, v string, score double"
    )
    import pytest as _pytest

    with _pytest.raises(DeltaProtocolError, match="not in table schema"):
        write_delta(wider, path, mode="append")

    write_delta(wider, path, mode="append", merge_schema=True)
    out = read_delta(spark, path)
    assert [f.name for f in out.schema.fields] == ["k", "v", "score"]
    rows = {r["k"]: (r["v"], r["score"]) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 3.5)}

    # the other half: input missing an existing column -> typed NULL
    narrower = spark.createDataFrame([(4, 4.0)], "k long, score double")
    write_delta(narrower, path, mode="append", merge_schema=True)
    out = read_delta(spark, path)
    assert {r["k"]: r["v"] for r in out.collect()}[4] is None
    assert out.count() == 4

    # time travel sees the pre-evolution schema
    v0 = read_delta(spark, path, version_as_of=0)
    assert [f.name for f in v0.schema.fields] == ["k", "v"]

    # checkpoint round-trip keeps the evolved schema
    write_checkpoint(path)
    for f in os.listdir(os.path.join(path, "_delta_log")):
        if f.endswith(".json"):
            os.remove(os.path.join(path, "_delta_log", f))
    out = read_delta(spark, path)
    assert [f.name for f in out.schema.fields] == ["k", "v", "score"]
    assert out.count() == 4 and delta_version(path) == 2


def test_iceberg_append_merge_schema_evolution(spark, tmp_path):
    """merge_schema appends evolve the Iceberg schema: new columns get
    fresh field ids under a NEW schema-id (prior schemas retained),
    pre-evolution files surface NULLs, input gaps land as NULLs, and
    plain mismatched appends still refuse."""
    import glob as _glob
    import json as _json

    from pg_mooncake_spark.sources.iceberg import (
        IcebergSupportError,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "ice_evolve")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string")
    write_iceberg(base, path)
    wider = spark.createDataFrame(
        [(3, "c", 3.5)], "k bigint, v string, score double"
    )
    import pytest as _pytest

    with _pytest.raises(IcebergSupportError, match="merge_schema"):
        write_iceberg(wider, path, mode="append")

    write_iceberg(wider, path, mode="append", merge_schema=True)
    out = read_iceberg(spark, path)
    assert [f.name for f in out.schema.fields] == ["k", "v", "score"]
    rows = {r["k"]: (r["v"], r["score"]) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 3.5)}

    # narrower follow-up append: missing column -> typed NULL
    narrower = spark.createDataFrame([(4, 4.0)], "k bigint, score double")
    write_iceberg(narrower, path, mode="append", merge_schema=True)
    out = read_iceberg(spark, path)
    assert out.count() == 4
    assert {r["k"]: r["v"] for r in out.collect()}[4] is None

    # metadata: schema history retained, ids stable, fresh id for score
    metas = sorted(
        _glob.glob(path + "/metadata/v*.metadata.json"),
        key=lambda p: int(p.rsplit("/v", 1)[1].split(".")[0]),
    )
    meta = _json.load(open(metas[-1]))
    assert meta["current-schema-id"] == 1
    ids = {s["schema-id"] for s in meta["schemas"]}
    assert {0, 1} <= ids
    cur = [s for s in meta["schemas"] if s["schema-id"] == 1][0]
    by_name = {f["name"]: f["id"] for f in cur["fields"]}
    assert by_name == {"k": 1, "v": 2, "score": 3}

    # a plain exact-schema append must carry the evolved schema state
    # forward, not reset the history to schema-id 0
    exact = spark.createDataFrame(
        [(5, "e", 5.0)], "k bigint, v string, score double"
    )
    write_iceberg(exact, path, mode="append")
    meta = _json.load(open(sorted(
        _glob.glob(path + "/metadata/v*.metadata.json"),
        key=lambda p: int(p.rsplit("/v", 1)[1].split(".")[0]),
    )[-1]))
    assert meta["current-schema-id"] == 1
    assert {s["schema-id"] for s in meta["schemas"]} >= {0, 1}
    assert read_iceberg(spark, path).count() == 5


def test_avro_distributed_roundtrip_and_mirror_load(spark, tmp_path):
    """Jar-less Avro source/sink: write one container file per partition
    executor-side, read back with one task per file, nulls/arrays/nested
    records intact; load_files(fmt='avro') pulls Avro into a mirror."""
    from pg_mooncake_spark.engine import MooncakeEngine
    from pg_mooncake_spark.sources.avro_source import (
        read_avro_files,
        write_avro_files,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 1.5, [1, 2], {"x": 10}, (7, "s7")),
            (2, None, 2.5, [], {}, (8, None)),
            (3, "c", None, [3], {"y": 30}, None),
        ],
        "k long, v string, score double, arr array<int>, m map<string,int>, "
        "st struct<a:int, b:string>",
    ).repartition(2)
    adir = str(tmp_path / "avro_data")
    files = write_avro_files(df, adir)
    assert 1 <= len(files) <= 2 and all(f.endswith(".avro") for f in files)

    back = read_avro_files(spark, adir)
    assert back.rdd.getNumPartitions() == len(files)  # task per file
    def norm(rows):
        return sorted(
            (r["k"], r["v"], r["score"], list(r["arr"]), dict(r["m"]),
             None if r["st"] is None else tuple(r["st"]))
            for r in rows
        )

    assert norm(df.collect()) == norm(back.collect())

    # mirror bulk-load through the engine (fmt='avro')
    eng = MooncakeEngine(spark, str(tmp_path / "wh"))
    flat = df.select("k", "v", "score")
    fdir = str(tmp_path / "avro_flat")
    write_avro_files(flat, fdir)
    eng.create_table("av", source_df=flat.limit(0))
    eng.load_files("av", [fdir], fmt="avro")
    assert eng.table("av").count() == 3


def test_concurrent_commit_safety_delta_and_iceberg(spark, tmp_path):
    """Concurrency barriers: a stale Delta committer raises 'concurrent
    commit' (with_occ_retry re-derives and lands); a second Iceberg
    writer racing to the same metadata version fails put-if-absent
    instead of silently clobbering the winner."""
    from pg_mooncake_spark.sources.delta import (
        DeltaProtocolError,
        _commit,
        with_occ_retry,
    )
    from pg_mooncake_spark.sources.iceberg import (
        IcebergSupportError,
        _write_metadata_json,
        read_iceberg,
        write_iceberg,
    )

    # Delta: simulate another writer landing version 1 first
    path = str(tmp_path / "occ")
    write_delta(spark.createDataFrame([(1,)], "k long"), path)
    _commit(path, 1, [{"commitInfo": {"timestamp": 0, "operation": "WRITE",
                                      "operationParameters": {}}}])
    import pytest as _pytest

    with _pytest.raises(DeltaProtocolError, match="concurrent commit"):
        _commit(path, 1, [])

    # with_occ_retry: first attempt loses the race, rerun wins
    calls = {"n": 0}

    def contended_append():
        if calls["n"] == 0:
            calls["n"] += 1
            raise DeltaProtocolError("concurrent commit at version 2")
        return write_delta(
            spark.createDataFrame([(2,)], "k long"), path, mode="append"
        )

    assert with_occ_retry(contended_append) == 2
    assert read_delta(spark, path).count() == 2

    # non-contention errors propagate immediately
    def broken():
        raise DeltaProtocolError("bad DV magic 7")

    with _pytest.raises(DeltaProtocolError, match="bad DV magic"):
        with_occ_retry(broken)

    # persistent contention gives up loudly
    with _pytest.raises(DeltaProtocolError, match="contention persisted"):
        with_occ_retry(
            lambda: (_ for _ in ()).throw(
                DeltaProtocolError("concurrent commit at version 9")
            ),
            attempts=2,
        )

    # Iceberg: metadata version commit is put-if-absent
    ipath = str(tmp_path / "occ_ice")
    write_iceberg(spark.createDataFrame([(1, "a")], "k long, v string"), ipath)
    meta_dir = ipath + "/metadata"
    with _pytest.raises(IcebergSupportError, match="concurrent commit"):
        _write_metadata_json(meta_dir, 1, {"clobber": True})
    # the winner's table still reads
    assert read_iceberg(spark, ipath).count() == 1


def test_delta_v2_checkpoint_with_sidecars_reads(spark, tmp_path):
    """v2Checkpoint reads (VERDICT r6 gap #2): a table whose checkpoint
    is the UUID-named manifest + sidecar form current delta-spark writes
    must load — manifest actions applied, add/remove actions pulled from
    ``_sidecars/`` parquet files, JSON tail replayed on top.  The
    fixture is hand-built to the PROTOCOL.md "V2 Spec Checkpoints"
    layout (no delta jars in this container), with the pre-checkpoint
    JSON log removed so the replay MUST go through the v2 chain."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pg_mooncake_spark.sources.delta import (
        DeltaProtocolError,
        _replay,
        read_delta,
    )

    path = str(tmp_path / "v2cp")
    write_delta(
        spark.range(50).selectExpr("id AS k", "concat('a', id) AS v"), path
    )  # v0
    write_delta(
        spark.range(50, 80).selectExpr("id AS k", "concat('a', id) AS v"),
        path,
        mode="append",
    )  # v1

    log_dir = os.path.join(path, "_delta_log")
    # capture the live state (adds + metaData/protocol) the checkpoint
    # must snapshot, straight from the JSON log before it is removed
    adds, _schema, _pcols, state = _replay(path)
    meta_action = protocol_action = None
    for v in (0, 1):
        with open(os.path.join(log_dir, f"{v:020d}.json")) as fh:
            for ln in fh:
                a = json.loads(ln)
                meta_action = a.get("metaData") or meta_action
                protocol_action = a.get("protocol") or protocol_action

    # sidecar parquet files under _sidecars/ (two, to prove multi-sidecar)
    os.makedirs(os.path.join(log_dir, "_sidecars"))
    sidecar_names = []
    half = len(adds) // 2 or 1
    for chunk in (adds[:half], adds[half:]):
        if not chunk:
            continue
        name = f"{_uuid.uuid4().hex}.parquet"
        rows = [
            {"add": {"path": a["path"], "size": int(a.get("size") or 0),
                     "dataChange": False}}
            for a in chunk
        ]
        pq.write_table(
            pa.Table.from_pylist(rows),
            os.path.join(log_dir, "_sidecars", name),
        )
        sidecar_names.append(name)

    # UUID-named JSON manifest + _last_checkpoint, then drop the
    # pre-checkpoint JSON commits
    manifest = os.path.join(
        log_dir, f"{1:020d}.checkpoint.{_uuid.uuid4().hex}.json"
    )
    with open(manifest, "w") as fh:
        fh.write(json.dumps({"checkpointMetadata": {"version": 1}}) + "\n")
        fh.write(json.dumps({"protocol": protocol_action}) + "\n")
        fh.write(json.dumps({"metaData": meta_action}) + "\n")
        for name in sidecar_names:
            fh.write(
                json.dumps(
                    {"sidecar": {"path": name, "sizeInBytes": 1,
                                 "modificationTime": 0}}
                )
                + "\n"
            )
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        fh.write(json.dumps({"version": 1, "size": len(adds)}))
    os.remove(os.path.join(log_dir, f"{0:020d}.json"))
    os.remove(os.path.join(log_dir, f"{1:020d}.json"))

    out = read_delta(spark, path)
    assert out.count() == 80
    assert {r["k"] for r in out.select("k").collect()} == set(range(80))

    # the JSON tail after the v2 checkpoint still replays on top
    write_delta(
        spark.range(80, 90).selectExpr("id AS k", "concat('a', id) AS v"),
        path,
        mode="append",
    )  # v2
    assert read_delta(spark, path).count() == 90
    assert read_delta(spark, path, version_as_of=1).count() == 80

    # a manifest claiming the wrong version refuses loudly
    import pytest as _pytest

    with open(manifest, "w") as fh:
        fh.write(json.dumps({"checkpointMetadata": {"version": 7}}) + "\n")
    with _pytest.raises(DeltaProtocolError, match="claims version"):
        read_delta(spark, path, version_as_of=1).count()


def test_iceberg_partitioned_write_prunes_and_survives_maintenance(spark, tmp_path):
    """Identity-partitioned Iceberg writes (VERDICT r6 gap #1): the spec
    lands in the metadata, manifest entries carry typed partition
    tuples, partition-filtered reads scan ONLY matching files, appends
    inherit the spec, and delete+compact preserve the partitioning."""
    import pytest as _pytest

    from pg_mooncake_spark.sources.iceberg import (
        IcebergSupportError,
        _latest_metadata,
        compact_iceberg,
        delete_where_iceberg,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "ice_part")
    df = spark.range(200).selectExpr(
        "id AS k",
        "CASE WHEN id % 3 = 0 THEN 'A' WHEN id % 3 = 1 THEN 'B' ELSE 'C' END AS grp",
        "DATE_ADD(DATE'2024-01-01', CAST(id % 2 AS INT)) AS d",
        "CAST(id * 1.5 AS DOUBLE) AS x",
    )
    write_iceberg(df.filter("k < 100"), path, partition_by=["grp", "d"])

    meta = _latest_metadata(path)
    spec = meta["partition-specs"][0]
    assert [f["name"] for f in spec["fields"]] == ["grp", "d"]
    assert all(f["transform"] == "identity" for f in spec["fields"])

    # appends inherit the spec; conflicting explicit spec refuses
    with _pytest.raises(IcebergSupportError, match="conflicts"):
        write_iceberg(df.filter("k >= 100"), path, mode="append",
                      partition_by=["grp"])
    write_iceberg(df.filter("k >= 100"), path, mode="append")

    full = read_iceberg(spark, path)
    assert full.count() == 200
    assert {r["k"] for r in full.collect()} == set(range(200))

    # partition-filtered read prunes the FILE LIST, not just the rows
    part = read_iceberg(spark, path, partition_filter={"grp": "A", "d": "2024-01-02"})
    rows = part.collect()
    assert all(r["grp"] == "A" and str(r["d"]) == "2024-01-02" for r in rows)
    assert {r["k"] for r in rows} == {
        k for k in range(200) if k % 3 == 0 and k % 2 == 1
    }
    scanned = part.inputFiles()
    assert scanned and all(
        "__p_grp=A" in f and "__p_d=2024-01-02" in f for f in scanned
    )
    total = full.inputFiles()
    assert len(scanned) < len(total)

    # filtering on a non-partition column refuses
    with _pytest.raises(IcebergSupportError, match="not a partition column"):
        read_iceberg(spark, path, partition_filter={"x": 1.0})

    # merge-on-read delete + compact keep the partitioning
    delete_where_iceberg(spark, path, "k % 10 = 0")
    assert read_iceberg(spark, path).count() == 180
    # spec conformance: globally-scoped delete manifests bind an
    # UNPARTITIONED spec (registered on first use); data manifests bind
    # the fielded default spec.  Real readers decode each manifest's
    # partition records against its declared spec-id.
    from pg_mooncake_spark.sources.avro import read_avro

    meta = _latest_metadata(path)
    specs = {s["spec-id"]: s for s in meta["partition-specs"]}
    assert any(not s["fields"] for s in specs.values())
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, mfs = read_avro(cur["manifest-list"])
    assert {m["content"] for m in mfs} == {0, 1}
    for m in mfs:
        bound = specs[m["partition_spec_id"]]["fields"]
        if m["content"] == 1:  # delete manifest → empty spec
            assert bound == []
        else:  # data manifest → the fielded default spec
            assert [f["name"] for f in bound] == ["grp", "d"]
    compact_iceberg(spark, path)
    meta = _latest_metadata(path)
    assert [f["name"] for f in meta["partition-specs"][0]["fields"]] == ["grp", "d"]
    part = read_iceberg(spark, path, partition_filter={"grp": "B"})
    assert part.count() == sum(
        1 for k in range(200) if k % 3 == 1 and k % 10 != 0
    )
    assert all("__p_grp=B" in f for f in part.inputFiles())


def test_iceberg_manifest_column_bounds_written(spark, tmp_path):
    """Manifest entries carry per-field value/null counts and
    lower/upper bounds (Iceberg single-value binary serialization) —
    what gives EXTERNAL readers of our exports min/max file skipping.
    Strings are deliberately unbounded (parquet may truncate string
    stats; a truncated upper bound is unsound)."""
    import struct

    from pg_mooncake_spark.sources.avro import read_avro
    from pg_mooncake_spark.sources.iceberg import (
        _latest_metadata,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "ice_bounds")
    df = spark.range(100).selectExpr(
        "id + 5 AS k",
        "CAST(id AS DOUBLE) / 4 AS x",
        "concat('s', id) AS s",
        "IF(id % 10 = 0, CAST(NULL AS DOUBLE), CAST(id AS DOUBLE)) AS maybe",
        "DATE_ADD(DATE'2024-01-01', CAST(id AS INT)) AS d",
    )
    write_iceberg(df.coalesce(1), path)

    meta = _latest_metadata(path)
    ids = {
        f["name"]: f["id"]
        for s in meta["schemas"]
        for f in s["fields"]
    }
    snap = meta["snapshots"][-1]
    _, manifests = read_avro(snap["manifest-list"])
    _, entries = read_avro(manifests[0]["manifest_path"])
    d_file = entries[0]["data_file"]

    def as_map(rows):
        return {r["key"]: r["value"] for r in rows or []}

    vc = as_map(d_file["value_counts"])
    assert vc[ids["k"]] == 100 and vc[ids["maybe"]] == 100
    nc = as_map(d_file["null_value_counts"])
    assert nc[ids["maybe"]] == 10 and nc.get(ids["k"], 0) == 0
    lo = as_map(d_file["lower_bounds"])
    hi = as_map(d_file["upper_bounds"])
    assert struct.unpack("<q", lo[ids["k"]])[0] == 5
    assert struct.unpack("<q", hi[ids["k"]])[0] == 104
    assert struct.unpack("<d", hi[ids["x"]])[0] == 99 / 4
    # date bounds: days since epoch
    assert struct.unpack("<i", lo[ids["d"]])[0] == 19723  # 2024-01-01
    assert struct.unpack("<i", hi[ids["d"]])[0] == 19723 + 99
    # strings: counted but never bounded
    assert ids["s"] in vc and ids["s"] not in lo
    # reader is unaffected by the extra entry fields
    assert read_iceberg(spark, path).count() == 100


def test_iceberg_partition_filter_keeps_pre_evolution_files(spark, tmp_path):
    """Partition evolution safety: files written BEFORE a partition field
    existed carry no value for it in their manifest tuple — pruning must
    KEEP them (a missing key is not a mismatch) and the transform's row
    predicate supplies the exact semantics, so no rows leak and none are
    lost."""
    from pg_mooncake_spark.sources.iceberg import (
        _latest_metadata,
        _metadata_version_of,
        _write_metadata_json,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "ice_evolved")
    df = spark.range(40).selectExpr(
        "id AS k", "CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END AS grp"
    )
    write_iceberg(df, path)  # unpartitioned: manifest tuples are empty

    # simulate partition evolution: the spec gains an identity field on
    # grp, but the existing data files predate it
    meta = _latest_metadata(path)
    grp_id = None
    for s in meta["schemas"]:
        if s.get("schema-id") == meta.get("current-schema-id"):
            grp_id = next(f["id"] for f in s["fields"] if f["name"] == "grp")
    meta["partition-specs"] = [
        {"spec-id": 0, "fields": [
            {"name": "grp", "transform": "identity", "source-id": grp_id,
             "field-id": 1000},
        ]}
    ]
    v = _metadata_version_of(meta, path) + 1
    _write_metadata_json(path + "/metadata", v, meta)

    out = read_iceberg(spark, path, partition_filter={"grp": "A"})
    rows = out.collect()
    assert len(rows) == 20 and all(r["grp"] == "A" for r in rows)
    # pre-evolution files were kept (pruning had nothing to go on)
    assert out.inputFiles()


def test_iceberg_temporal_partition_transforms(spark, tmp_path):
    """days()/months() partition transforms over a timestamp column —
    the spec a real time-series export uses.  The derived partition
    field (ts_day, typed date = days-since-epoch in the manifest tuple)
    prunes by day; source columns stay intact in the data files; the
    full read needs no partition reconstruction."""
    import pytest as _pytest

    from pg_mooncake_spark.sources.iceberg import (
        IcebergSupportError,
        _latest_metadata,
        compact_iceberg,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "ice_days")
    df = spark.range(96).selectExpr(
        "id AS k",
        "TIMESTAMP'2024-03-01 00:00:00' + make_dt_interval(0, CAST(id AS INT))"
        " AS ts",
        "CAST(id AS DOUBLE) AS x",
    )  # 96 hourly rows spanning 4 days
    write_iceberg(df, path, partition_by=["days(ts)"])

    spec = _latest_metadata(path)["partition-specs"][0]
    assert [(f["name"], f["transform"]) for f in spec["fields"]] == [
        ("ts_day", "day")
    ]

    full = read_iceberg(spark, path)
    assert full.count() == 96
    assert {f.name for f in full.schema.fields} == {"k", "ts", "x"}

    one_day = read_iceberg(spark, path, partition_filter={"ts_day": "2024-03-02"})
    rows = one_day.collect()
    assert len(rows) == 24
    assert all(str(r["ts"]).startswith("2024-03-02") for r in rows)
    assert all("__p_ts_day=2024-03-02" in f for f in one_day.inputFiles())

    # appends inherit the temporal spec (and the DSL spelling matches it)
    more = spark.range(96, 120).selectExpr(
        "id AS k",
        "TIMESTAMP'2024-03-01 00:00:00' + make_dt_interval(0, CAST(id AS INT))"
        " AS ts",
        "CAST(id AS DOUBLE) AS x",
    )
    write_iceberg(more, path, mode="append", partition_by=["days(ts)"])
    assert read_iceberg(spark, path).count() == 120
    assert (
        read_iceberg(
            spark, path, partition_filter={"ts_day": "2024-03-05"}
        ).count()
        == 24
    )

    # compact preserves the temporal partitioning; expire reclaims the
    # pre-compaction files from the partition subdirectories
    compact_iceberg(spark, path)
    from pg_mooncake_spark.sources.iceberg import expire_snapshots

    assert expire_snapshots(path, retain_last=1)
    pruned = read_iceberg(spark, path, partition_filter={"ts_day": "2024-03-03"})
    assert pruned.count() == 24
    assert all("__p_ts_day=2024-03-03" in f for f in pruned.inputFiles())
    assert read_iceberg(spark, path).count() == 120

    # hour() over a date column is meaningless and refuses
    with _pytest.raises(IcebergSupportError, match="hour"):
        write_iceberg(
            df.selectExpr("k", "CAST(ts AS DATE) AS d"),
            str(tmp_path / "bad"),
            partition_by=["hours(d)"],
        )


def test_iceberg_stale_committer_cannot_erase_concurrent_snapshot(spark, tmp_path):
    """OCC version pinning (ADVICE r6): the next metadata version derives
    from the version ``meta`` was LOADED at, not the on-disk max at commit
    time — so a commit that lands while a long job runs makes the stale
    committer's put-if-absent link collide instead of linking at a fresh
    version and silently dropping the concurrent snapshot from history."""
    import glob as _glob

    import pytest as _pytest

    from pg_mooncake_spark.sources.iceberg import (
        IcebergSupportError,
        _latest_metadata,
        _metadata_version_of,
        _write_metadata_json,
        write_iceberg,
    )

    path = str(tmp_path / "pin")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    write_iceberg(df, path)
    stale = _latest_metadata(path)  # replayed from v1; pins version 1
    write_iceberg(df, path, mode="append")  # concurrent commit lands v2
    # the stale replay still derives from its load-time version …
    assert _metadata_version_of(stale, path) == 1
    # … so its commit targets v2, collides with the intervening commit,
    # and fails loudly instead of erasing it at v3
    with _pytest.raises(IcebergSupportError, match="concurrent commit"):
        _write_metadata_json(
            path + "/metadata", _metadata_version_of(stale, path) + 1, stale
        )
    meta = _latest_metadata(path)
    assert len(meta["snapshots"]) == 2  # both snapshots survive
    # the private pin never reaches disk
    for f in _glob.glob(path + "/metadata/*.metadata.json"):
        with open(f) as fh:
            assert "__pinned-version" not in json.load(fh)

def test_iceberg_murmur3_spec_vectors():
    """_murmur3_32 matches the Iceberg spec's published bucket-hash test
    vectors (spec 'Appendix B: 32-bit Hash Requirements') — the contract
    that makes our bucket[N] partition values identical to what a Java/
    Python Iceberg reader computes, so EXTERNAL engines prune our
    exports' buckets correctly."""
    import struct

    import numpy as np

    from pg_mooncake_spark.sources.iceberg import _mm3_hash_longs, _murmur3_32

    assert _murmur3_32(struct.pack("<q", 34)) == 2017239379  # int 34
    assert _murmur3_32(struct.pack("<q", 34)) == 2017239379  # long 34
    assert _murmur3_32(b"iceberg") == 1210000089  # string
    assert _murmur3_32(struct.pack("<q", 17486)) == -653330422  # date
    assert (
        _murmur3_32(struct.pack("<q", 1510871468000000)) == -2047944441
    )  # timestamp micros
    # the vectorized numpy path agrees with the scalar path bit-for-bit
    vals = np.array([34, 17486, 1510871468000000, -5, 0, 2**62], dtype=np.int64)
    vec = _mm3_hash_longs(vals)
    for v, h in zip(vals.tolist(), vec.tolist()):
        signed = h - (1 << 32) if h >= (1 << 31) else h
        assert signed == _murmur3_32(struct.pack("<q", v))


def test_iceberg_bucket_truncate_partition_transforms(spark, tmp_path):
    """bucket[N] + truncate[W] partition transforms (Iceberg spec
    'Partition Transforms') — the spec shape a 100 TB export uses to
    spread a high-cardinality key across N buckets while keeping
    bucket-local joins/point-lookups prunable.  Verifies: spec JSON,
    spec-correct murmur3 bucket assignment of every row, file-level
    pruning on both transforms, append inheritance, and truncate's
    floor semantics for negative ints."""
    import struct

    import pytest as _pytest

    from pg_mooncake_spark.sources.iceberg import (
        IcebergSupportError,
        _latest_metadata,
        _murmur3_32,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "ice_bucket")
    df = spark.range(300).selectExpr(
        "id - 50 AS k",  # negatives exercise truncate's floor-mod
        "concat('grp', id % 11) AS name",
        "CAST(id AS DOUBLE) AS x",
    )
    write_iceberg(df.filter("k < 100"), path,
                  partition_by=["bucket(8, k)", "truncate(4, name)"])

    spec = _latest_metadata(path)["partition-specs"][0]
    assert [(f["name"], f["transform"]) for f in spec["fields"]] == [
        ("k_bucket", "bucket[8]"), ("name_trunc", "truncate[4]")
    ]

    # appends inherit (and the DSL spelling round-trips the spec string)
    write_iceberg(df.filter("k >= 100"), path, mode="append",
                  partition_by=["bucket(8, k)", "truncate(4, name)"])
    full = read_iceberg(spark, path)
    assert full.count() == 300

    def spec_bucket(v: int) -> int:
        return (_murmur3_32(struct.pack("<q", v)) & 0x7FFFFFFF) % 8

    # every row landed in its spec-mandated bucket, across both writes
    b3 = read_iceberg(spark, path, partition_filter={"k_bucket": 3})
    got = {r["k"] for r in b3.collect()}
    assert got == {k for k in range(-50, 250) if spec_bucket(k) == 3}
    assert b3.inputFiles() and all(
        "__p_k_bucket=3" in f for f in b3.inputFiles()
    )
    assert len(b3.inputFiles()) < len(full.inputFiles())

    # truncate prunes by prefix value; 'grp1' covers grp1 AND grp10
    t1 = read_iceberg(spark, path, partition_filter={"name_trunc": "grp1"})
    names = {r["name"] for r in t1.collect()}
    assert names == {"grp1", "grp10"}
    assert all("__p_name_trunc=grp1" in f for f in t1.inputFiles())

    # string-source buckets hash UTF-8 bytes (spec string hashing)
    spath = str(tmp_path / "ice_bucket_str")
    write_iceberg(df, spath, partition_by=["bucket(4, name)"])
    sb = read_iceberg(spark, spath, partition_filter={"name_bucket": 2})
    for r in sb.select("name").distinct().collect():
        h = _murmur3_32(r["name"].encode("utf-8"))
        assert (h & 0x7FFFFFFF) % 4 == 2

    # int truncate uses floor semantics: truncate[10] of -1 is -10
    ipath = str(tmp_path / "ice_trunc_int")
    write_iceberg(df, ipath, partition_by=["truncate(10, k)"])
    neg = read_iceberg(spark, ipath, partition_filter={"k_trunc": -10})
    assert {r["k"] for r in neg.collect()} == set(range(-10, 0))

    # unsupported sources refuse loudly
    with _pytest.raises(IcebergSupportError, match="truncate"):
        write_iceberg(df, str(tmp_path / "bad1"),
                      partition_by=["truncate(2, x)"])
    with _pytest.raises(IcebergSupportError, match="bucket"):
        write_iceberg(df, str(tmp_path / "bad2"),
                      partition_by=["bucket(0, k)"])

def test_iceberg_bucket_timestamp_tz_independent(spark, tmp_path):
    """ADVICE r7 (medium): bucket[N] over a timestamp must hash the
    instant's UTC micros regardless of spark.sql.session.timeZone — the
    micros now come from JVM-side unix_micros (instant-based), not from
    pandas values localized to the session zone.  A non-UTC session
    writing bucket partitions must produce the same spec-mandated
    buckets an external Java/Python Iceberg reader would recompute."""
    import struct

    from pg_mooncake_spark.sources.iceberg import (
        _murmur3_32,
        read_iceberg,
        write_iceberg,
    )

    base = 1510871468000000  # spec vector micros
    df = spark.sql(
        f"SELECT id, timestamp_micros({base} + id * 1000000) AS ts "
        "FROM range(40)"
    )
    path = str(tmp_path / "ice_ts_bucket")
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        # Kolkata is UTC+05:30 — a half-hour zone catches pure-hour bugs too
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        write_iceberg(df, path, partition_by=["bucket(4, ts)"])
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)

    def spec_bucket(micros: int) -> int:
        return (_murmur3_32(struct.pack("<q", micros)) & 0x7FFFFFFF) % 4

    seen = 0
    for b in range(4):
        rows = read_iceberg(
            spark, path, partition_filter={"ts_bucket": b}
        ).collect()
        for r in rows:
            assert spec_bucket(base + r["id"] * 1000000) == b
        seen += len(rows)
    assert seen == 40


def test_iceberg_rename_column_by_field_id(spark, tmp_path):
    """rename_column_iceberg (spec 'Schema Evolution'): a rename is a
    metadata-only commit keeping the field id; files written before it
    resolve by era (activation-sequence grouping) so old data appears
    under the new name; appends after the rename write the new name;
    stats-based range skipping still works (bounds are keyed by field
    id); equality-delete-pending tables refuse with a typed error."""
    import pytest as _pytest

    from pg_mooncake_spark.sources.iceberg import (
        IcebergEqualityDeletesPendingError,
        compact_iceberg,
        read_iceberg,
        rename_column_iceberg,
        upsert_keys_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "ice_ren")
    df = spark.range(100).selectExpr("id AS k", "id * 2 AS amount")
    write_iceberg(df, path)
    old_files = set(read_iceberg(spark, path).inputFiles())

    rename_column_iceberg(path, "amount", "total")
    got = read_iceberg(spark, path)
    assert got.columns == ["k", "total"]
    assert {r["k"]: r["total"] for r in got.collect()} == {
        i: i * 2 for i in range(100)}
    # metadata-only: the same data files serve the read
    assert set(got.inputFiles()) == old_files

    # append under the new name; both eras union under current names
    write_iceberg(
        spark.range(100, 150).selectExpr("id AS k", "id * 2 AS total"),
        path, mode="append",
    )
    full = read_iceberg(spark, path)
    assert full.count() == 150
    assert {r["k"]: r["total"] for r in full.collect()} == {
        i: i * 2 for i in range(150)}

    # field-id-keyed column stats still skip files across the rename
    probe = read_iceberg(spark, path, range_filter={"total": (0, 10)})
    assert {r["k"] for r in probe.collect()} == {0, 1, 2, 3, 4, 5}
    assert len(probe.inputFiles()) < len(full.inputFiles())

    # MOR upsert after the rename, then rename again: refused until the
    # equality deletes fold, then the compact-and-rename path works
    upsert_keys_iceberg(
        spark, path,
        spark.createDataFrame([(0,)], "k long"),
        spark.createDataFrame([(0, -1)], "k long, total long"),
    )
    with _pytest.raises(IcebergEqualityDeletesPendingError):
        rename_column_iceberg(path, "total", "grand_total")
    compact_iceberg(spark, path)
    rename_column_iceberg(path, "total", "grand_total")
    final = read_iceberg(spark, path)
    assert final.columns == ["k", "grand_total"]
    vals = {r["k"]: r["grand_total"] for r in final.collect()}
    assert vals[0] == -1 and vals[149] == 298 and len(vals) == 150


def test_iceberg_partition_spec_evolution(spark, tmp_path):
    """evolve_partition_spec: a metadata-only commit switches the
    DEFAULT spec; appends after it stage under the new spec, files
    from the old spec stay readable, retained fields keep their
    partition field-id across specs (spec 'Partition Evolution'),
    and filtered reads prune new-spec files while conservatively
    keeping old-spec files (exact row predicate on top)."""
    from pg_mooncake_spark.sources.avro import read_avro
    from pg_mooncake_spark.sources.iceberg import (
        _latest_metadata,
        evolve_partition_spec,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "ice_evolve")
    df = spark.range(100).selectExpr(
        "id AS k",
        "CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END AS grp",
        "CAST(id AS DOUBLE) AS x",
    )
    write_iceberg(df.filter("k < 50"), path, partition_by=["grp"])

    # evolving to the same spec is a no-op returning the current id
    assert evolve_partition_spec(path, ["grp"]) == 0
    assert len(_latest_metadata(path)["partition-specs"]) == 1

    sid = evolve_partition_spec(path, ["grp", "bucket(4, k)"])
    meta = _latest_metadata(path)
    assert sid == int(meta["default-spec-id"]) and sid != 0
    new_spec = next(
        s for s in meta["partition-specs"] if s["spec-id"] == sid
    )
    old_spec = next(s for s in meta["partition-specs"] if s["spec-id"] == 0)
    # retained field reuses its field-id; the new field allocated past it
    assert (
        new_spec["fields"][0]["field-id"]
        == old_spec["fields"][0]["field-id"]
    )
    assert new_spec["fields"][1]["field-id"] == meta["last-partition-id"]

    # appends now stage under the evolved spec
    write_iceberg(df.filter("k >= 50"), path, mode="append")
    full = read_iceberg(spark, path)
    assert full.count() == 100

    # the new manifest binds the new spec-id; the old one keeps spec 0
    meta = _latest_metadata(path)
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, mfs = read_avro(cur["manifest-list"])
    assert sorted(m["partition_spec_id"] for m in mfs) == [0, sid]

    # filter on the retained field prunes BOTH generations
    a = read_iceberg(spark, path, partition_filter={"grp": "A"})
    assert {r["k"] for r in a.collect()} == set(range(0, 100, 2))
    assert all("__p_grp=A" in f for f in a.inputFiles())

    # filter on the NEW field: new-spec files prune by manifest tuple,
    # old-spec files (no k_bucket value) are kept and row-filtered
    import struct

    from pg_mooncake_spark.sources.iceberg import _murmur3_32

    want_bucket = (_murmur3_32(struct.pack("<q", 60)) & 0x7FFFFFFF) % 4
    b = read_iceberg(
        spark, path, partition_filter={"k_bucket": want_bucket}
    )
    got = {r["k"] for r in b.collect()}
    assert 60 in got
    assert got == {
        k for k in range(100)
        if (_murmur3_32(struct.pack("<q", k)) & 0x7FFFFFFF) % 4 == want_bucket
    }

def test_iceberg_sorted_compaction(spark, tmp_path):
    """compact_iceberg(sort_by=...): the rewrite range-clusters files so
    their manifest lower/upper bounds are DISJOINT on the sort key (what
    external engines use for min/max skipping), registers the sort order
    in metadata (spec 'Sorting'), stamps data files with sort_order_id,
    and later appends carry the registered orders forward."""
    import struct

    from pg_mooncake_spark.sources.avro import read_avro
    from pg_mooncake_spark.sources.iceberg import (
        _latest_metadata,
        compact_iceberg,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "ice_sorted")
    df = spark.range(1000).selectExpr(
        "CAST(pmod(id * 7919, 1000) AS LONG) AS k",  # scrambled order
        "CAST(id AS DOUBLE) AS x",
    )
    write_iceberg(df.repartition(4), path)

    compact_iceberg(spark, path, target_files=4, sort_by=["k"])
    meta = _latest_metadata(path)
    order = next(
        o for o in meta["sort-orders"]
        if o["order-id"] == meta["default-sort-order-id"]
    )
    k_id = next(
        f["id"] for s in meta["schemas"] for f in s["fields"]
        if f["name"] == "k"
    )
    assert order["fields"] == [{
        "transform": "identity", "source-id": k_id,
        "direction": "asc", "null-order": "nulls-first",
    }]

    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, mfs = read_avro(cur["manifest-list"])
    _, entries = read_avro(mfs[0]["manifest_path"])
    ranges = []
    for e in entries:
        d = e["data_file"]
        assert d["sort_order_id"] == order["order-id"]
        lo = {r["key"]: r["value"] for r in d["lower_bounds"]}[k_id]
        hi = {r["key"]: r["value"] for r in d["upper_bounds"]}[k_id]
        ranges.append((struct.unpack("<q", lo)[0],
                       struct.unpack("<q", hi)[0]))
    assert len(ranges) > 1
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo_next  # disjoint sort-key ranges per file

    assert read_iceberg(spark, path).count() == 1000

    # appends don't lose the registered order; compacting again with the
    # same columns REUSES the existing order-id
    write_iceberg(df.limit(10).selectExpr("k + 1000 AS k", "x"),
                  path, mode="append")
    meta = _latest_metadata(path)
    assert any(o["order-id"] == order["order-id"]
               for o in meta["sort-orders"])
    compact_iceberg(spark, path, sort_by=["k"])
    meta = _latest_metadata(path)
    assert [o["order-id"] for o in meta["sort-orders"]].count(
        order["order-id"]
    ) == 1
    assert meta["default-sort-order-id"] == order["order-id"]
    assert read_iceberg(spark, path).count() == 1010

def test_delta_add_stats_and_sorted_compaction(spark, tmp_path):
    """Every add action carries per-file stats JSON (numRecords +
    min/max/nullCount for orderable primitives — what delta-spark uses
    for file skipping); compact_delta(sort_by=...) range-clusters the
    rewrite so those bounds become DISJOINT across files."""
    import json as _json

    from pg_mooncake_spark.sources.delta import (
        _replay,
        compact_delta,
        read_delta,
        write_delta,
    )

    path = str(tmp_path / "dl_sorted")
    df = spark.range(1000).selectExpr(
        "CAST(pmod(id * 7919, 1000) AS LONG) AS k",
        "CAST(id AS DOUBLE) AS x",
        "concat('s', id) AS s",
        "IF(id % 10 = 0, CAST(NULL AS DOUBLE), CAST(id AS DOUBLE)) AS maybe",
    )
    write_delta(df.repartition(4), path)

    adds, _, _, _ = _replay(path)
    assert adds and all(a.get("stats") for a in adds)
    st0 = _json.loads(adds[0]["stats"])
    assert st0["numRecords"] > 0
    assert "k" in st0["minValues"] and "x" in st0["maxValues"]
    assert "s" not in st0.get("minValues", {})  # strings unbounded
    assert st0["nullCount"].get("k") == 0
    total = sum(_json.loads(a["stats"])["numRecords"] for a in adds)
    assert total == 1000
    nulls = sum(
        _json.loads(a["stats"])["nullCount"].get("maybe", 0) for a in adds
    )
    assert nulls == 100

    compact_delta(spark, path, target_files=4, sort_by=["k"])
    adds, _, _, _ = _replay(path)
    ranges = sorted(
        (
            _json.loads(a["stats"])["minValues"]["k"],
            _json.loads(a["stats"])["maxValues"]["k"],
        )
        for a in adds
    )
    assert len(ranges) > 1
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo_next
    assert read_delta(spark, path).count() == 1000

def test_iceberg_range_filter_stats_file_skipping(spark, tmp_path):
    """range_filter prunes the file list by the manifest lower/upper
    bounds (the payoff of sorted compaction's disjoint ranges), applies
    the exact inclusive BETWEEN on the kept files, and never skips on
    missing stats.  Dates convert to the bounds' days-since-epoch
    comparison domain."""
    import pytest as _pytest

    from pg_mooncake_spark.sources.iceberg import (
        IcebergSupportError,
        compact_iceberg,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "ice_range")
    df = spark.range(1000).selectExpr(
        "CAST(pmod(id * 7919, 1000) AS LONG) AS k",
        "DATE_ADD(DATE'2024-01-01', CAST(pmod(id * 7919, 1000) % 100 AS INT)) AS d",
        "concat('s', id) AS s",
    )
    write_iceberg(df.repartition(4), path)
    compact_iceberg(spark, path, target_files=8, sort_by=["k"])

    full = read_iceberg(spark, path)
    narrow = read_iceberg(spark, path, range_filter={"k": (100, 199)})
    rows = narrow.collect()
    assert {r["k"] for r in rows} == set(range(100, 200))
    # the sorted rewrite makes bounds disjoint -> the narrow range hits
    # a strict subset of files
    assert 0 < len(narrow.inputFiles()) < len(full.inputFiles())

    # open-ended ranges
    hi = read_iceberg(spark, path, range_filter={"k": (900, None)})
    assert hi.count() == 100
    assert len(hi.inputFiles()) < len(full.inputFiles())

    # date ranges accept ISO strings and prune via days-since-epoch
    dr = read_iceberg(
        spark, path, range_filter={"d": ("2024-01-10", "2024-01-19")}
    )
    assert dr.count() == 100  # 10 day-values x 10 rows per day-value

    # conjunction of two columns
    both = read_iceberg(
        spark, path,
        range_filter={"k": (0, 499), "d": ("2024-01-01", "2024-01-05")},
    )
    got = {(r["k"], str(r["d"])) for r in both.collect()}
    assert all(k <= 499 and s <= "2024-01-05" for k, s in got)

    # strings are unbounded in manifests -> refused loudly (no silent
    # full scan pretending to prune)
    with _pytest.raises(IcebergSupportError, match="not supported"):
        read_iceberg(spark, path, range_filter={"s": ("a", "b")})
    with _pytest.raises(IcebergSupportError, match="not a top-level"):
        read_iceberg(spark, path, range_filter={"nope": (1, 2)})

def test_delta_range_filter_data_skipping(spark, tmp_path):
    """read_delta(range_filter=...): add actions are pruned by their
    stats JSON min/max before any scan (Delta data skipping), the exact
    BETWEEN re-applies row-wise, files without stats are kept, and
    unsupported types refuse loudly."""
    import pytest as _pytest

    from pg_mooncake_spark.sources.delta import (
        DeltaProtocolError,
        compact_delta,
        read_delta,
        write_delta,
    )

    path = str(tmp_path / "dl_range")
    df = spark.range(1000).selectExpr(
        "CAST(pmod(id * 7919, 1000) AS LONG) AS k",
        "DATE_ADD(DATE'2024-01-01', CAST(pmod(id * 7919, 1000) % 100 AS INT)) AS d",
        "concat('s', id) AS s",
    )
    write_delta(df.repartition(4), path)
    compact_delta(spark, path, target_files=8, sort_by=["k"])

    full = read_delta(spark, path)
    narrow = read_delta(spark, path, range_filter={"k": (100, 199)})
    assert {r["k"] for r in narrow.collect()} == set(range(100, 200))
    assert 0 < len(narrow.inputFiles()) < len(full.inputFiles())

    hi = read_delta(spark, path, range_filter={"k": (900, None)})
    assert hi.count() == 100
    assert len(hi.inputFiles()) < len(full.inputFiles())

    dr = read_delta(
        spark, path, range_filter={"d": ("2024-01-10", "2024-01-19")}
    )
    assert dr.count() == 100

    with _pytest.raises(DeltaProtocolError, match="not supported"):
        read_delta(spark, path, range_filter={"s": ("a", "b")})
    with _pytest.raises(DeltaProtocolError, match="not in table"):
        read_delta(spark, path, range_filter={"nope": (1, 2)})

    # partitioned table: partition columns live only in the log, data
    # columns still skip by stats within each partition group
    ppath = str(tmp_path / "dl_range_part")
    write_delta(
        df.selectExpr("k", "d", "CAST(k % 2 AS LONG) AS par"),
        ppath, partition_by=["par"],
    )
    compact_delta(spark, ppath, target_files=4, sort_by=["k"])
    pn = read_delta(spark, ppath, range_filter={"k": (0, 99)})
    assert {r["k"] for r in pn.collect()} == set(range(100))
    pf = read_delta(
        spark, ppath, partition_filter={"par": 1},
        range_filter={"k": (0, 99)},
    )
    got = {r["k"] for r in pf.collect()}
    assert got == {k for k in range(100) if k % 2 == 1}

def test_timestamp_time_travel_delta_and_iceberg(spark, tmp_path):
    """timestamp_as_of / as_of_timestamp resolve to the latest commit at
    or before the given time (epoch-ms, ISO string, or datetime), refuse
    pre-history timestamps, and are mutually exclusive with explicit
    versions."""
    import os as _os
    import time as _time

    import pytest as _pytest

    from pg_mooncake_spark.sources.delta import (
        DeltaProtocolError,
        read_delta,
        write_delta,
    )
    from pg_mooncake_spark.sources.iceberg import (
        IcebergSupportError,
        read_iceberg,
        write_iceberg,
    )

    one = spark.range(10).selectExpr("id AS k")
    two = spark.range(10, 30).selectExpr("id AS k")

    dpath = str(tmp_path / "dl_ts")
    write_delta(one, dpath)
    write_delta(two, dpath, mode="append")
    # pin distinct commit mtimes (resolution uses file modification time)
    log = _os.path.join(dpath, "_delta_log")
    t0 = _time.time() - 1000
    _os.utime(_os.path.join(log, "00000000000000000000.json"), (t0, t0))
    _os.utime(_os.path.join(log, "00000000000000000001.json"),
              (t0 + 600, t0 + 600))
    mid_ms = int((t0 + 300) * 1000)
    assert read_delta(spark, dpath, timestamp_as_of=mid_ms).count() == 10
    late_ms = int((t0 + 900) * 1000)
    assert read_delta(spark, dpath, timestamp_as_of=late_ms).count() == 30
    with _pytest.raises(DeltaProtocolError, match="earliest"):
        read_delta(spark, dpath, timestamp_as_of=int((t0 - 50) * 1000))
    with _pytest.raises(DeltaProtocolError, match="mutually exclusive"):
        read_delta(spark, dpath, version_as_of=0, timestamp_as_of=mid_ms)

    ipath = str(tmp_path / "ice_ts")
    write_iceberg(one, ipath)
    write_iceberg(two, ipath, mode="append")
    from pg_mooncake_spark.sources.iceberg import _latest_metadata

    snaps = _latest_metadata(ipath)["snapshots"]
    ts0, ts1 = (int(s["timestamp-ms"]) for s in snaps)
    assert read_iceberg(spark, ipath, as_of_timestamp=ts0).count() == 10
    assert read_iceberg(
        spark, ipath, as_of_timestamp=max(ts1, ts0 + 1)
    ).count() == 30
    # datetime / ISO forms accepted
    import datetime as _dt

    dt = _dt.datetime.fromtimestamp(
        max(ts1, ts0 + 1) / 1000, tz=_dt.timezone.utc
    )
    assert read_iceberg(spark, ipath, as_of_timestamp=dt).count() == 30
    assert read_iceberg(
        spark, ipath, as_of_timestamp=dt.isoformat()
    ).count() == 30
    with _pytest.raises(IcebergSupportError, match="earliest"):
        read_iceberg(spark, ipath, as_of_timestamp=ts0 - 10)
    with _pytest.raises(IcebergSupportError, match="mutually exclusive"):
        read_iceberg(spark, ipath, snapshot_id=1, as_of_timestamp=ts0)

def test_zorder_compaction_skips_on_both_columns(spark, tmp_path):
    """zorder_by clusters on the Morton interleave: after the rewrite a
    range_filter on EITHER z-ordered column scans a strict subset of
    files — the property a linear sort only gives its leading column.
    Verified for Iceberg and Delta; Morton key unit-checked for bit
    interleaving."""
    from pyspark.sql import functions as SF

    from pg_mooncake_spark.functions.zorder import zorder_key
    from pg_mooncake_spark.sources.delta import (
        compact_delta,
        read_delta,
        write_delta,
    )
    from pg_mooncake_spark.sources.iceberg import (
        compact_iceberg,
        read_iceberg,
        write_iceberg,
    )

    # unit: interleave of maxed 16-bit cells fills alternating bits
    unit = spark.createDataFrame(
        [(0, 0), (65535, 0), (0, 65535), (65535, 65535)], "a long, b long"
    )
    keys = [
        r["z"] for r in unit.select(
            zorder_key(unit, ["a", "b"]).alias("z")
        ).collect()
    ]
    assert keys[0] == 0
    assert keys[1] == 0x55555555  # a occupies even bits
    assert keys[2] == 0xAAAAAAAA  # b occupies odd bits
    assert keys[3] == 0xFFFFFFFF

    # a 32x32 grid: both dims uniformly spread, uncorrelated
    df = spark.createDataFrame(
        [(i % 32, (i * 7919) % 32, float(i)) for i in range(1024)],
        "a long, b long, x double",
    )

    ipath = str(tmp_path / "ice_z")
    write_iceberg(df.repartition(4), ipath)
    compact_iceberg(spark, ipath, target_files=16, zorder_by=["a", "b"])
    full_n = len(read_iceberg(spark, ipath).inputFiles())
    assert full_n > 4
    fa = read_iceberg(spark, ipath, range_filter={"a": (0, 7)})
    fb = read_iceberg(spark, ipath, range_filter={"b": (0, 7)})
    assert fa.count() == 1024 // 4 and fb.count() == 1024 // 4
    assert len(fa.inputFiles()) < full_n
    assert len(fb.inputFiles()) < full_n

    dpath = str(tmp_path / "dl_z")
    write_delta(df.repartition(4), dpath)
    compact_delta(spark, dpath, target_files=16, zorder_by=["a", "b"])
    full_n = len(read_delta(spark, dpath).inputFiles())
    fa = read_delta(spark, dpath, range_filter={"a": (0, 7)})
    fb = read_delta(spark, dpath, range_filter={"b": (0, 7)})
    assert fa.count() == 1024 // 4 and fb.count() == 1024 // 4
    assert len(fa.inputFiles()) < full_n
    assert len(fb.inputFiles()) < full_n


def test_zorder_many_columns_stays_in_sign_safe_long(spark):
    """ADVICE r7: with a fixed 16 bits/column, 4 columns placed a bit in
    the sign position (inverting sort order for half the curve) and ≥5
    columns wrapped shifts mod 64.  Resolution now scales down
    (bits = min(16, 63 // n)) so the maxed key is always a positive
    long and higher cells always sort after lower ones."""
    from pg_mooncake_spark.functions.zorder import zorder_key

    for ncols in (4, 5, 6):
        bits = min(16, 63 // ncols)
        top = (1 << bits) - 1
        cols = [chr(ord("a") + i) for i in range(ncols)]
        schema = ", ".join(f"{c} long" for c in cols)
        rows = [
            tuple([0] * ncols),
            tuple([top] * ncols),
            tuple([top] + [0] * (ncols - 1)),
            tuple([0] * (ncols - 1) + [top]),
        ]
        df = spark.createDataFrame(rows, schema)
        keys = [
            r["z"]
            for r in df.select(zorder_key(df, cols).alias("z")).collect()
        ]
        assert keys[0] == 0
        assert all(k >= 0 for k in keys), f"sign bit hit at ncols={ncols}"
        # the all-max key is the curve's end: strictly above any partial max
        assert keys[1] > keys[2] and keys[1] > keys[3]
        assert keys[1] < (1 << 63)


def test_zorder_quantile_prunes_better_on_skewed_column(spark, tmp_path):
    """VERDICT r7 task 8: linear min/max scaling collapses a power-law
    column into a few low cells (the curve degenerates to the uniform
    column), so a range filter on the skewed column's bulk region reads
    most files.  Quantile (piecewise-CDF) scaling equalizes cell
    population, so the same filter prunes strictly more files."""
    from pg_mooncake_spark.sources.iceberg import (
        compact_iceberg,
        read_iceberg,
        write_iceberg,
    )

    # a: uniform; s: heavy-tailed (x^5 over 64 distinct levels — the
    # bottom half of the levels occupies <0.1% of the value range)
    df = spark.createDataFrame(
        [((i * 7919) % 4096, (i % 64) ** 5, i) for i in range(4096)],
        "a long, s long, id long",
    )

    def files_read(method: str) -> int:
        path = str(tmp_path / f"ice_zq_{method}")
        write_iceberg(df.repartition(4), path)
        compact_iceberg(
            spark, path, target_files=32, zorder_by=["a", "s"],
            zorder_method=method,
        )
        probe = read_iceberg(spark, path, range_filter={"s": (0, 100)})
        # rows with s in {0,1,32}: i%64 in {0,1,2}
        assert probe.count() == 3 * 64
        return len(probe.inputFiles())

    n_linear = files_read("linear")
    n_quantile = files_read("quantile")
    full = len(
        read_iceberg(spark, str(tmp_path / "ice_zq_linear")).inputFiles()
    )
    assert n_quantile < n_linear <= full, (
        f"quantile={n_quantile} linear={n_linear} full={full}"
    )


def test_delta_v2_checkpoint_write_roundtrip(spark, tmp_path):
    """VERDICT r7 task 6: write_checkpoint(v2=True) emits the V2 spec
    layout the reader already consumes — UUID-named manifest
    (checkpointMetadata + protocol + metaData + sidecar pointers) with
    all file actions in a parquet sidecar; the manifest protocol row
    declares the v2Checkpoint feature at (3, 7).  Round-trip: with the
    pre-checkpoint JSON log removed, replay MUST go through the v2
    chain and reproduce the exact state (incl. DV descriptors), and a
    JSON append after the checkpoint layers on top."""
    import glob as _glob

    from pg_mooncake_spark.sources.delta import (
        _replay,
        delete_where_dv,
        write_checkpoint,
    )

    path = str(tmp_path / "v2w")
    write_delta(spark.range(60).selectExpr("id AS k", "id * 3 AS x"), path)
    write_delta(
        spark.range(60, 90).selectExpr("id AS k", "id * 3 AS x"),
        path, mode="append",
    )
    delete_where_dv(spark, path, "k % 7 = 0")  # DV descriptors in state
    expected = {(r["k"], r["x"]) for r in read_delta(spark, path).collect()}

    cp = write_checkpoint(path, v2=True)
    log_dir = os.path.join(path, "_delta_log")
    assert os.path.basename(cp).count(".") == 3  # <v>.checkpoint.<uuid>.parquet
    assert _glob.glob(os.path.join(log_dir, "_sidecars", "*.parquet"))
    # classic checkpoint file must NOT exist for this version
    assert not os.path.exists(
        os.path.join(log_dir, f"{2:020d}.checkpoint.parquet")
    )

    for f in list(os.listdir(log_dir)):
        if f.endswith(".json") and not f.startswith("_"):
            os.remove(os.path.join(log_dir, f))
    got = {(r["k"], r["x"]) for r in read_delta(spark, path).collect()}
    assert got == expected and len(got) == 90 - 13

    # protocol row carries the feature at (3, 7)
    _adds, _schema, _p, st = _replay(path)
    assert st.protocol["minReaderVersion"] >= 3
    assert st.protocol["minWriterVersion"] >= 7
    assert "v2Checkpoint" in (st.protocol.get("readerFeatures") or [])

    # JSON tail after the checkpoint replays on top of the v2 state
    write_delta(
        spark.range(1000, 1003).selectExpr("id AS k", "id * 3 AS x"),
        path, mode="append",
    )
    assert read_delta(spark, path).count() == 90 - 13 + 3


class TestDeltaChangeDataFeed:
    def _mk(self, spark, tmp_path, cdf=True):
        from pg_mooncake_spark.sources.delta import write_delta

        p = str(tmp_path / "cdf")
        df = spark.range(0, 200).select(
            "id", (F.col("id") * 1.5).alias("x")
        )
        cfg = {"delta.enableChangeDataFeed": "true"} if cdf else None
        write_delta(df, p, configuration=cfg)
        return p

    def test_dml_commits_feed_exact_rows(self, spark, tmp_path):
        from pg_mooncake_spark.sources.delta import (
            delete_where_dv,
            read_delta_cdf,
            update_where_dv,
        )

        p = self._mk(spark, tmp_path)
        delete_where_dv(spark, p, "id < 5")
        update_where_dv(spark, p, "id = 10", {"x": "x + 1000"})
        rows = {
            (r["id"], r["_change_type"], r["_commit_version"]): r["x"]
            for r in read_delta_cdf(spark, p, 1).collect()
        }
        assert {k for k in rows} == {
            *((i, "delete", 1) for i in range(5)),
            (10, "update_preimage", 2),
            (10, "update_postimage", 2),
        }
        assert rows[(10, "update_preimage", 2)] == 15.0
        assert rows[(10, "update_postimage", 2)] == 1015.0

    def test_appends_derive_inserts_without_cdc_files(self, spark, tmp_path):
        from pg_mooncake_spark.sources.delta import read_delta_cdf, write_delta

        p = self._mk(spark, tmp_path, cdf=False)
        write_delta(
            spark.range(500, 503).select("id", (F.col("id") * 1.5).alias("x")),
            p,
            mode="append",
        )
        got = read_delta_cdf(spark, p, 1)
        assert got.count() == 3
        assert {r["_change_type"] for r in got.collect()} == {"insert"}

    def test_compaction_contributes_nothing(self, spark, tmp_path):
        from pg_mooncake_spark.sources.delta import (
            compact_delta,
            delete_where_dv,
            read_delta_cdf,
        )

        p = self._mk(spark, tmp_path)
        delete_where_dv(spark, p, "id < 3")
        before = read_delta_cdf(spark, p, 1).count()
        compact_delta(spark, p, target_files=1)
        assert read_delta_cdf(spark, p, 1).count() == before

    def test_underivable_without_cdf_raises(self, spark, tmp_path):
        from pg_mooncake_spark.sources.delta import (
            DeltaProtocolError,
            delete_where_dv,
            read_delta_cdf,
        )

        p = self._mk(spark, tmp_path, cdf=False)
        delete_where_dv(spark, p, "id = 1")
        with pytest.raises(DeltaProtocolError, match="cdc"):
            read_delta_cdf(spark, p, 1).count()

    def test_cdf_protocol_is_writer_v4(self, spark, tmp_path):
        import json
        import os

        p = self._mk(spark, tmp_path)
        with open(os.path.join(p, "_delta_log", f"{0:020d}.json")) as fh:
            actions = [json.loads(line) for line in fh if line.strip()]
        proto = next(a["protocol"] for a in actions if "protocol" in a)
        assert proto["minWriterVersion"] >= 4
        meta = next(a["metaData"] for a in actions if "metaData" in a)
        assert meta["configuration"]["delta.enableChangeDataFeed"] == "true"


class TestIcebergChangelog:
    def _export(self, spark, tmp_path):
        import tempfile

        from pg_mooncake_spark.engine import MooncakeEngine
        from pg_mooncake_spark.sources.iceberg import _latest_metadata

        eng = MooncakeEngine(spark, str(tmp_path / "wh"))
        src = spark.createDataFrame(
            [(i, float(i)) for i in range(1, 11)], "k int, x double"
        )
        eng.create_table("t", source_df=src, primary_key=["k"])
        exp = str(tmp_path / "ice")
        eng.attach_export("t", exp)
        return eng, exp, _latest_metadata(exp)["current-snapshot-id"]

    def test_upsert_replays_as_delete_plus_insert(self, spark, tmp_path):
        from pg_mooncake_spark.sources.iceberg import iceberg_changelog

        eng, exp, base = self._export(spark, tmp_path)
        ch = spark.createDataFrame(
            [(2, 200.0, "U"), (3, None, "D")], "k int, x double, __op string"
        )
        eng.apply_changes("t", ch, source_version=1)
        rows = {
            (r["k"], r["_change_type"]): r["x"]
            for r in iceberg_changelog(spark, exp, base).collect()
        }
        assert rows == {
            (2, "delete"): 2.0,
            (2, "insert"): 200.0,
            (3, "delete"): 3.0,
        }

    def test_compaction_snapshot_contributes_nothing(self, spark, tmp_path):
        from pg_mooncake_spark.sources.iceberg import (
            compact_iceberg,
            iceberg_changelog,
        )

        eng, exp, base = self._export(spark, tmp_path)
        ch = spark.createDataFrame([(5, -5.0, "U")], "k int, x double, __op string")
        eng.apply_changes("t", ch, source_version=1)
        before = iceberg_changelog(spark, exp, base).count()
        compact_iceberg(spark, exp)
        assert iceberg_changelog(spark, exp, base).count() == before

    def test_non_ancestor_raises(self, spark, tmp_path):
        from pg_mooncake_spark.sources.iceberg import (
            IcebergSupportError,
            _latest_metadata,
            iceberg_changelog,
        )

        eng, exp, base = self._export(spark, tmp_path)
        head = _latest_metadata(exp)["current-snapshot-id"]
        with pytest.raises(IcebergSupportError, match="ancestor|unknown"):
            iceberg_changelog(spark, exp, head + 999)
        # empty range (from == to) is a valid no-op
        assert iceberg_changelog(spark, exp, head).count() == 0

    def test_changelog_across_column_rename(self, spark, tmp_path):
        """Data files added BEFORE a rename must replay under the
        CURRENT column name (per-era field-id resolution), not as
        silent NULLs."""
        from pg_mooncake_spark.sources.iceberg import iceberg_changelog

        eng, exp, base = self._export(spark, tmp_path)
        ch1 = spark.createDataFrame([(50, 50.0, "I")], "k int, x double, __op string")
        eng.apply_changes("t", ch1, source_version=1)
        eng.rename_column("t", "x", "y")
        ch2 = spark.createDataFrame([(51, 51.0, "I")], "k int, y double, __op string")
        eng.apply_changes("t", ch2, source_version=2)
        rows = {
            (r["k"], r["_change_type"]): r["y"]
            for r in iceberg_changelog(spark, exp, base).collect()
        }
        assert rows == {(50, "insert"): 50.0, (51, "insert"): 51.0}
