"""Regression tests for the round-8 adversarial review findings:

1. apply_changes I-op on an existing key must not duplicate the row in
   attached exports (merge upserts I; exports must mask I keys too) —
   while insert()/update_where() keep blind-append semantics.
2. Time travel below a pk rename with live MOR tombstones must read
   (the tombstone join must use the as-of pk, not the latest).
3. iceberg_changelog must recover delete pre-images from eq-delete
   files written before a column rename (era-resolved key reads).
4. MV refresh must not double-apply deltas when the spec file is stale
   (crash between state commit and spec save) — the watermark rides in
   the state table's own commit.
5. Change files must be invisible to readers unless their commit landed
   (OCC loser discards; crashed-writer commit heals on read).
6. stream_changes must refuse rename-spanning feeds loudly.
7. rename_column must refuse Delta exports loudly, before moving state.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_mooncake_spark.engine import MooncakeEngine, changes_df
from pg_mooncake_spark.storage import (
    _CHANGES_DIR,
    _PENDING_PREFIX,
    Commit,
    MoonTable,
    MoonTableError,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("g", T.StringType(), True),
        T.StructField("x", T.DoubleType(), True),
    ]
)


def _mk(spark, path, rows, change_feed=True, pk=("id",)):
    mt = MoonTable(spark, str(path))
    mt.create(SCHEMA, primary_key=list(pk), change_feed=change_feed)
    mt.append(spark.createDataFrame(rows, SCHEMA))
    return mt


def test_apply_changes_insert_existing_key_dedupes_export(
    spark, warehouse, tmp_path
):
    """merge() treats I as upsert (replayed inserts are idempotent); the
    export sync must mask I keys too, or the export keeps the old copy
    alongside the new one."""
    from pg_mooncake_spark.sources.iceberg import read_iceberg

    eng = MooncakeEngine(spark, warehouse)
    df = spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(5)], "k long, v string, x double"
    )
    eng.create_table("m", source_df=df, primary_key=["k"])
    exp = str(tmp_path / "exp")
    eng.attach_export("m", exp)

    # I op for an EXISTING key: mirror upserts → export must too
    b = spark.createDataFrame([(3, "again", 33.0)], "k long, v string, x double")
    eng.apply_changes("m", changes_df(b, op="I"), source_version=1)
    mirror = {(r["k"], r["v"], r["x"]) for r in eng.table("m").collect()}
    export = {(r["k"], r["v"], r["x"]) for r in read_iceberg(spark, exp).collect()}
    assert mirror == export
    assert read_iceberg(spark, exp).count() == 5  # no duplicate of k=3
    assert (3, "again", 33.0) in export

    # insert() is a BLIND append (mirror keeps duplicates) — the export
    # must keep both copies as well, not dedupe
    eng.insert(
        "m",
        spark.createDataFrame([(3, "dup", 3.5)], "k long, v string, x double"),
    )
    assert eng.table("m").count() == 6
    assert read_iceberg(spark, exp).count() == 6


def test_time_travel_below_pk_rename_with_tombstones(spark, tmp_path):
    """read(version=V) below a pk rename must join tombstones on the
    as-of pk (the latest pk name resolves to zero schema columns)."""
    mt = _mk(spark, tmp_path / "t", [(i, "a", float(i)) for i in range(1, 9)])
    ch = spark.createDataFrame([(2, "a", 0.0), (5, "a", 0.0)], SCHEMA).withColumn(
        "__op", F.lit("D")
    )
    v = mt.merge(ch, strategy="mor")  # live equality-delete tombstones
    assert {r["id"] for r in mt.read(version=v).collect()} == {1, 3, 4, 6, 7, 8}
    mt.rename_column("id", "key")
    # latest read resolves through the rename
    assert {r["key"] for r in mt.read().collect()} == {1, 3, 4, 6, 7, 8}
    # time travel below the rename: old schema, tombstones still applied
    old = mt.read(version=v)
    assert "id" in old.columns and "key" not in old.columns
    assert {r["id"] for r in old.collect()} == {1, 3, 4, 6, 7, 8}


def test_changelog_deletes_across_rename(spark, tmp_path):
    """Equality-delete files written before a rename store the era's
    physical key names; the changelog must resolve them by field id or
    it silently drops every delete event of those snapshots."""
    from pg_mooncake_spark.sources.iceberg import (
        compact_iceberg,
        iceberg_changelog,
        iceberg_metadata_table,
        rename_column_iceberg,
        upsert_keys_iceberg,
        write_iceberg,
    )

    p = str(tmp_path / "ice")
    write_iceberg(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        ),
        p,
    )
    upsert_keys_iceberg(
        spark,
        p,
        spark.createDataFrame([(2,)], "k long"),
        spark.createDataFrame([(2, "B")], "k long, v string"),
    )
    compact_iceberg(spark, p)  # folds the eq deletes out of the head
    # rename the KEY column itself: the historical eq-delete file stores
    # its key under the old physical name "k"
    rename_column_iceberg(p, "k", "kk")
    rename_column_iceberg(p, "v", "txt")

    snaps = iceberg_metadata_table(spark, p, "snapshots").collect()
    first = min(int(r["snapshot_id"]) for r in snaps)
    cl = iceberg_changelog(spark, p, from_snapshot_id=first)
    deletes = [
        (r["kk"], r["txt"])
        for r in cl.filter(F.col("_change_type") == "delete").collect()
    ]
    # the upsert snapshot deleted the OLD image of k=2 ("b")
    assert (2, "b") in deletes, f"delete pre-image lost: {deletes}"
    inserts = {
        (r["kk"], r["txt"])
        for r in cl.filter(F.col("_change_type") == "insert").collect()
    }
    assert (2, "B") in inserts

    # time travel to the pre-compaction upsert snapshot must also apply
    # its era-named eq-delete file (read_iceberg path)
    from pg_mooncake_spark.sources.iceberg import read_iceberg

    upsert_snap = sorted(int(r["snapshot_id"]) for r in snaps)[1]
    old = {
        (r["kk"], r["txt"])
        for r in read_iceberg(spark, p, snapshot_id=upsert_snap).collect()
    }
    assert old == {(1, "a"), (2, "B"), (3, "c")}


def test_mv_refresh_recovers_from_stale_spec(spark, tmp_path):
    """Crash between the state merge and the spec save must not
    double-apply the same delta batch on the next refresh."""
    from pg_mooncake_spark.views import MaterializedView

    mt = _mk(
        spark,
        tmp_path / "base",
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)],
    )
    mv = MaterializedView.create(
        spark,
        str(tmp_path / "mv"),
        mt,
        group_by=["g"],
        aggs={"sx": ("sum", "x"), "n": ("count", "*")},
    )
    mt.append(spark.createDataFrame([(4, "a", 4.0)], SCHEMA))
    mv.refresh()
    good = {(r["g"], r["sx"], r["n"]) for r in mv.read().collect()}
    assert good == {("a", 7.0, 3), ("b", 3.0, 1)}

    # simulate the crash: rewind the spec watermark below the state's
    spec = mv.spec()
    spec["base_version"] = spec["base_version"] - 1
    mv._save_spec(spec)
    mv.refresh()  # must be a no-op, not a re-fold
    again = {(r["g"], r["sx"], r["n"]) for r in mv.read().collect()}
    assert again == good, f"deltas double-applied: {again}"


def test_occ_loser_change_files_discarded(spark, tmp_path):
    """A commit that loses the OCC race must not leave its change rows
    visible in _changes/ (phantom rows for streaming consumers)."""
    mt = _mk(spark, tmp_path / "t", [(1, "a", 1.0)])
    ch_dir = os.path.join(mt.path, _CHANGES_DIR)
    df = spark.createDataFrame([(9, "z", 9.0)], SCHEMA).withColumn(
        "_change_type", F.lit("insert")
    )
    names = mt._stage_change_files(df, commit_version=999)
    # staged files are hidden (dot-prefixed) until the commit lands
    assert all(
        os.path.exists(os.path.join(ch_dir, "." + _PENDING_PREFIX + n))
        for n in names
    )
    losing = Commit(
        version=mt.latest_version(),  # already taken → OCC conflict
        op="merge",
        props={"change_files": names},
    )
    with pytest.raises(MoonTableError, match="concurrent commit"):
        mt._commit_with_changes(losing)
    leftover = [f for f in os.listdir(ch_dir) if not f.startswith("_")]
    assert not any(n in leftover for n in names), leftover
    assert not any(f.startswith("." + _PENDING_PREFIX) for f in leftover)


def test_crash_between_commit_and_finalize_heals(spark, tmp_path):
    """A writer that died after the commit landed but before the
    finalize rename leaves committed-but-hidden change files; the batch
    reader must heal and return them."""
    mt = _mk(spark, tmp_path / "t", [(1, "a", 1.0)])
    df = spark.createDataFrame([(1, "a", 1.0)], SCHEMA).withColumn(
        "_change_type", F.lit("delete")
    )
    v = mt.latest_version() + 1
    names = mt._stage_change_files(df, commit_version=v)
    # commit WITHOUT finalize = the crash window
    mt._write_commit(
        Commit(version=v, op="delete", props={"change_files": names})
    )
    feed = {
        (r["id"], r["_change_type"], r["_commit_version"])
        for r in mt.changes(start_version=v).collect()
    }
    assert (1, "delete", v) in feed
    ch_dir = os.path.join(mt.path, _CHANGES_DIR)
    assert all(os.path.exists(os.path.join(ch_dir, n)) for n in names)


def test_stream_changes_refuses_rename(spark, tmp_path):
    mt = MoonTable(spark, str(tmp_path / "t"))
    mt.create(SCHEMA, primary_key=["id"], change_feed="full")
    mt.append(spark.createDataFrame([(1, "a", 1.0)], SCHEMA))
    mt.rename_column("g", "grp")
    with pytest.raises(MoonTableError, match="rename"):
        mt.stream_changes()


def test_rename_column_on_cdf_delta_export_keeps_feed(
    spark, warehouse, tmp_path
):
    """Round 9 lifted the CDF restriction (VERDICT r8 task 4): a rename
    on a CDF-enabled Delta export now succeeds via columnMapping, the
    export tracks the new logical name, and the change feed stays
    readable across both eras (low-level coverage:
    tests/test_delta_mapping.py::TestCdfWithColumnMapping)."""
    from pg_mooncake_spark.sources.delta import (
        read_delta,
        read_delta_cdf,
        write_delta,
    )

    eng = MooncakeEngine(spark, warehouse)
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    eng.create_table("m", source_df=df, primary_key=["k"])
    exp = str(tmp_path / "exp_cdf")
    write_delta(df, exp, configuration={"delta.enableChangeDataFeed": "true"})
    eng.catalog.add_export("m", exp)
    eng.rename_column("m", "v", "txt")
    assert "txt" in eng.table("m").columns
    assert "txt" in read_delta(spark, exp).columns
    feed = read_delta_cdf(spark, exp)
    assert "txt" in feed.columns and feed.count() >= 1


class TestSecondPassFindings:
    """Round-8 second review pass: protocol feature preservation,
    rename idempotency, pin-aware SQL DML, quote-aware parsing, and
    vacuum-scoped stream_changes rename refusal."""

    def test_dv_upgrade_keeps_changedatafeed_feature(self, spark, tmp_path):
        from pg_mooncake_spark.sources.delta import (
            _replay,
            delete_where_dv,
            write_delta,
        )

        p = str(tmp_path / "cdf")
        write_delta(
            spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
            p,
            configuration={"delta.enableChangeDataFeed": "true"},
        )
        delete_where_dv(spark, p, "k = 1")
        st = _replay(p)[3]
        assert st.protocol["minWriterVersion"] == 7
        assert "changeDataFeed" in st.protocol["writerFeatures"]
        assert "deletionVectors" in st.protocol["writerFeatures"]

    def test_rename_idempotent_delta_and_iceberg(self, spark, tmp_path):
        from pg_mooncake_spark.sources.delta import (
            read_delta,
            rename_column_delta,
            write_delta,
        )
        from pg_mooncake_spark.sources.iceberg import (
            read_iceberg,
            rename_column_iceberg,
            write_iceberg,
        )

        dp = str(tmp_path / "d")
        write_delta(spark.createDataFrame([(1, "a")], "k long, v string"), dp)
        rename_column_delta(dp, "v", "txt")
        rename_column_delta(dp, "v", "txt")  # retry: no-op success
        assert read_delta(spark, dp).columns == ["k", "txt"]

        ip = str(tmp_path / "i")
        write_iceberg(spark.createDataFrame([(1, "a")], "k long, v string"), ip)
        rename_column_iceberg(ip, "v", "txt")
        rename_column_iceberg(ip, "v", "txt")  # retry: no-op success
        assert read_iceberg(spark, ip).columns == ["k", "txt"]

    def test_sql_dml_pin(self, spark, warehouse):
        eng = MooncakeEngine(spark, warehouse)
        df = spark.createDataFrame([(1, "a")], "k long, v string")
        eng.create_table("src", source_df=df, primary_key=["k"])
        v1 = eng.catalog.get("src")["flush_version"]
        eng.insert("src", spark.createDataFrame([(2, "b")], "k long, v string"))
        eng.create_table(
            "dst",
            source_df=spark.createDataFrame([], "k long, v string"),
            primary_key=["k"],
        )
        # INSERT..SELECT honors the pin: only the v1 rows land
        eng.sql("INSERT INTO dst SELECT k, v FROM src", pin={"src": v1})
        assert {r["k"] for r in eng.table("dst").collect()} == {1}
        with pytest.raises(ValueError, match="pin"):
            eng.sql("DELETE FROM dst WHERE k = 1", pin={"dst": 1})

    def test_sql_dml_double_quoted_literal(self, spark, warehouse):
        eng = MooncakeEngine(spark, warehouse)
        df = spark.createDataFrame([(1, "a")], "k long, v string")
        eng.create_table("m", source_df=df, primary_key=["k"])
        eng.sql('UPDATE m SET v = "x,y" WHERE k = 1')
        assert [r["v"] for r in eng.table("m").collect()] == ["x,y"]

    def test_stream_changes_allowed_after_vacuuming_prerename_files(
        self, spark, tmp_path
    ):
        mt = MoonTable(spark, str(tmp_path / "t"))
        mt.create(SCHEMA, primary_key=["id"], change_feed="full")
        mt.append(spark.createDataFrame([(1, "a", 1.0)], SCHEMA))
        mt.rename_column("g", "grp")
        with pytest.raises(MoonTableError, match="rename"):
            mt.stream_changes()
        # post-rename activity, then reclaim the pre-rename change files
        mt.append(
            spark.createDataFrame(
                [(2, "b", 2.0)], "id int, grp string, x double"
            )
        )
        mt.vacuum(changes_retention_versions=1)
        df = mt.stream_changes()  # safe again: survivors are current-era
        assert df.isStreaming
