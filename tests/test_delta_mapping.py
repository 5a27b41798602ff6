"""Delta column-mapping: metadata-only rename (rename_column_delta) and
DML on mapped tables (upsert/append/compact resolve physical names).

The first rename enables columnMapping.mode=name with physical names
equal to the pre-rename parquet names — no data file rewritten — and
every later writer stages files under physical names, exactly as
delta-spark would (Delta protocol column-mapping section)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pg_mooncake_spark.sources.delta import (
    DeltaProtocolError,
    _replay,
    compact_delta,
    read_delta,
    rename_column_delta,
    upsert_keys_delta,
    write_delta,
)


def _mk(spark, path, rows=((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0))):
    df = spark.createDataFrame(list(rows), "k long, v string, x double")
    write_delta(df, str(path))
    return str(path)


def _rows(spark, p):
    return sorted(tuple(r) for r in read_delta(spark, p).collect())


def test_rename_roundtrip_metadata_only(spark, tmp_path):
    p = _mk(spark, tmp_path / "t")
    files_before = {
        a["path"] for a in _replay(p)[0]
    }
    rename_column_delta(p, "v", "txt")
    df = read_delta(spark, p)
    assert df.columns == ["k", "txt", "x"]
    assert _rows(spark, p) == [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]
    # metadata-only: same data files
    assert {a["path"] for a in _replay(p)[0]} == files_before
    # schema carries mapping ids + physical names; config flips to name
    _a, schema, _pc, st = _replay(p)
    assert st.configuration["delta.columnMapping.mode"] == "name"
    sj = json.loads(st.schema_json)
    by_name = {f["name"]: f["metadata"] for f in sj["fields"]}
    assert by_name["txt"]["delta.columnMapping.physicalName"] == "v"
    ids = [f["metadata"]["delta.columnMapping.id"] for f in sj["fields"]]
    assert sorted(ids) == [1, 2, 3]
    proto = st.protocol
    assert proto["minReaderVersion"] >= 2 and proto["minWriterVersion"] >= 5


def test_chained_renames(spark, tmp_path):
    p = _mk(spark, tmp_path / "t")
    rename_column_delta(p, "v", "txt")
    rename_column_delta(p, "txt", "body")
    rename_column_delta(p, "k", "key")
    df = read_delta(spark, p)
    assert df.columns == ["key", "body", "x"]
    assert _rows(spark, p) == [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]
    with pytest.raises(DeltaProtocolError, match="already exists"):
        rename_column_delta(p, "x", "body")
    with pytest.raises(DeltaProtocolError, match="no column"):
        rename_column_delta(p, "gone", "y")


def test_upsert_after_rename(spark, tmp_path):
    p = _mk(spark, tmp_path / "t")
    rename_column_delta(p, "v", "txt")
    keys = spark.createDataFrame([(2,), (4,)], "k long")
    ups = spark.createDataFrame(
        [(2, "B", 20.0), (4, "d", 4.0)], "k long, txt string, x double"
    )
    upsert_keys_delta(spark, p, keys, ups)
    assert _rows(spark, p) == [
        (1, "a", 1.0),
        (2, "B", 20.0),
        (3, "c", 3.0),
        (4, "d", 4.0),
    ]
    # new file carries the PHYSICAL column name for the renamed column
    import pyarrow.parquet as pq

    adds = _replay(p)[0]
    newest = [a for a in adds if not a.get("deletionVector")]
    cols = set()
    for a in newest:
        cols |= set(pq.ParquetFile(os.path.join(p, a["path"])).schema_arrow.names)
    assert "v" in cols and "txt" not in cols


def test_append_merge_schema_after_rename(spark, tmp_path):
    p = _mk(spark, tmp_path / "t")
    rename_column_delta(p, "v", "txt")
    extra = spark.createDataFrame(
        [(9, "z", 9.0, "new")], "k long, txt string, x double, note string"
    )
    write_delta(extra, p, mode="append", merge_schema=True)
    got = sorted(
        tuple(r) for r in read_delta(spark, p).select("k", "txt", "note").collect()
    )
    assert (9, "z", "new") in got
    assert (1, "a", None) in got
    # the evolved column got a fresh mapping id and renames cleanly
    rename_column_delta(p, "note", "comment")
    assert "comment" in read_delta(spark, p).columns
    _a, _s, _pc, st = _replay(p)
    assert int(st.configuration["delta.columnMapping.maxColumnId"]) == 4


def test_compact_folds_dvs_on_mapped_table(spark, tmp_path):
    p = _mk(spark, tmp_path / "t")
    rename_column_delta(p, "v", "txt")
    upsert_keys_delta(
        spark,
        p,
        spark.createDataFrame([(1,)], "k long"),
        spark.createDataFrame([], "k long, txt string, x double"),
    )
    assert _rows(spark, p) == [(2, "b", 2.0), (3, "c", 3.0)]
    compact_delta(spark, p)
    adds = _replay(p)[0]
    assert not any(a.get("deletionVector") for a in adds)
    assert _rows(spark, p) == [(2, "b", 2.0), (3, "c", 3.0)]


def test_dv_delete_and_update_on_mapped_table(spark, tmp_path):
    """Direct predicate DML resolves physical names after a rename: the
    probe reads physical columns, updated copies stage physically."""
    from pg_mooncake_spark.sources.delta import (
        delete_where_dv,
        update_where_dv,
    )

    p = _mk(spark, tmp_path / "t")
    rename_column_delta(p, "v", "txt")
    # predicate over BOTH a renamed and an unrenamed column
    update_where_dv(spark, p, "txt = 'b' AND k > 1", {"x": "x + 100"})
    delete_where_dv(spark, p, "txt = 'a'")
    assert _rows(spark, p) == [(2, "b", 102.0), (3, "c", 3.0)]
    # no-op predicates commit nothing
    v = delete_where_dv(spark, p, "txt = 'zzz'")
    assert v == _replay(p)[3].last_v


def test_rename_refuses_partitioned(spark, tmp_path):
    """CDF-enabled tables rename fine since round 9 (mapped cdc files);
    partitioned tables still refuse (partitionValues keyed by logical
    name)."""
    part = str(tmp_path / "part")
    write_delta(
        spark.createDataFrame([(1, "a", "g1")], "k long, v string, g string"),
        part,
        partition_by=["g"],
    )
    with pytest.raises(DeltaProtocolError, match="partitioned"):
        rename_column_delta(part, "v", "txt")


def test_engine_rename_propagates_to_delta_export(spark, warehouse, tmp_path):
    """End-to-end: mirror + Delta export rename together, and the next
    CDC batch still syncs through the mapped export."""
    from pg_mooncake_spark.engine import MooncakeEngine, changes_df

    eng = MooncakeEngine(spark, warehouse)
    df = spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(5)], "k long, v string, x double"
    )
    eng.create_table("m", source_df=df, primary_key=["k"])
    exp = str(tmp_path / "exp")
    eng.attach_export("m", exp, fmt="delta")
    eng.rename_column("m", "v", "txt")
    assert read_delta(spark, exp).columns == ["k", "txt", "x"]

    batch = spark.createDataFrame(
        [(2, "UPD", 22.0), (9, "new", 9.0)], "k long, txt string, x double"
    ).withColumn("__op", F.expr("CASE k WHEN 2 THEN 'U' ELSE 'I' END"))
    eng.apply_changes("m", batch, source_version=1)
    mirror = {(r["k"], r["txt"], r["x"]) for r in eng.table("m").collect()}
    export = {(r["k"], r["txt"], r["x"]) for r in read_delta(spark, exp).collect()}
    assert mirror == export
    assert (2, "UPD", 22.0) in export and (9, "new", 9.0) in export

    # maintenance folds the mapped export too
    eng.optimize_table("m")
    export2 = {(r["k"], r["txt"], r["x"]) for r in read_delta(spark, exp).collect()}
    assert export2 == mirror


class TestCdfWithColumnMapping:
    """VERDICT r8 task 4: a renamed CDF export keeps its change feed.
    cdc parquet on mapped tables carries PHYSICAL names (same rule as
    data files); read_delta_cdf resolves both pre- and post-rename eras
    through the mapping and returns the latest logical schema."""

    def test_full_feed_across_rename_and_evolution(self, spark, tmp_path):
        from pg_mooncake_spark.sources.delta import (
            delete_where_dv,
            read_delta,
            read_delta_cdf,
            rename_column_delta,
            update_where_dv,
            upsert_keys_delta,
            write_delta,
        )

        d = str(tmp_path / "t")
        write_delta(
            spark.createDataFrame(
                [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
            ),
            d,
            configuration={"delta.enableChangeDataFeed": "true"},
        )
        delete_where_dv(spark, d, "k = 3")           # v1, pre-rename cdc
        rename_column_delta(d, "v", "txt")           # v2, enables mapping
        update_where_dv(spark, d, "k = 2", {"txt": "'B'"})  # v3
        upsert_keys_delta(                           # v4
            spark, d,
            spark.createDataFrame([(4,)], "k long"),
            spark.createDataFrame([(4, "d")], "k long, txt string"),
        )
        write_delta(                                 # v5: mergeSchema add
            spark.createDataFrame(
                [(5, "e", 1.5)], "k long, txt string, score double"
            ),
            d, mode="append", merge_schema=True,
        )
        delete_where_dv(spark, d, "k = 5")           # v6: cdc w/ new col

        got = sorted(
            tuple(r)
            for r in read_delta_cdf(spark, d)
            .select("k", "txt", "score", "_change_type", "_commit_version")
            .collect()
        )
        assert got == [
            (1, "a", None, "insert", 0),
            (2, "B", None, "update_postimage", 3),
            (2, "b", None, "insert", 0),
            (2, "b", None, "update_preimage", 3),
            (3, "c", None, "delete", 1),
            (3, "c", None, "insert", 0),
            (4, "d", None, "insert", 4),
            (5, "e", 1.5, "delete", 6),
            (5, "e", 1.5, "insert", 5),
        ]
        assert sorted(tuple(r) for r in read_delta(spark, d).collect()) == [
            (1, "a", None), (2, "B", None), (4, "d", None),
        ]

    def test_cdc_files_carry_physical_names(self, spark, tmp_path):
        import glob

        import pyarrow.parquet as pq

        from pg_mooncake_spark.sources.delta import (
            rename_column_delta,
            update_where_dv,
            write_delta,
        )

        d = str(tmp_path / "t")
        write_delta(
            spark.createDataFrame([(1, "a")], "k long, v string"),
            d,
            configuration={"delta.enableChangeDataFeed": "true"},
        )
        rename_column_delta(d, "v", "txt")
        update_where_dv(spark, d, "k = 1", {"txt": "'A'"})
        cdc = glob.glob(d + "/_change_data/*.parquet")
        assert cdc
        for f in cdc:
            names = pq.read_schema(f).names
            assert "v" in names and "txt" not in names  # physical, not logical
