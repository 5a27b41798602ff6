"""Change feed + incremental materialized views.

The feed contract (storage.MoonTable.changes) and the view-maintenance
invariant — incremental refresh ≡ from-scratch GROUP BY over the final
state — across every DML path (merge CoW + MOR, update_where,
delete_where), plus the non-incremental cases (min/max retraction
recompute, emptied groups, NULL semantics).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_mooncake_spark.engine import MooncakeEngine
from pg_mooncake_spark.storage import MoonTable, MoonTableError
from pg_mooncake_spark.views import MaterializedView

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("g", T.StringType(), True),
        T.StructField("x", T.DoubleType(), True),
    ]
)


def _mk(spark, path, rows, change_feed=True):
    mt = MoonTable(spark, str(path))
    mt.create(SCHEMA, primary_key=["id"], change_feed=change_feed)
    mt.append(spark.createDataFrame(rows, SCHEMA))
    return mt


def _feed(mt, **kw):
    return {
        (r["id"], r["_change_type"], r["_commit_version"])
        for r in mt.changes(**kw).collect()
    }


class TestChangeFeed:
    def test_merge_classification(self, spark, tmp_path):
        mt = _mk(spark, tmp_path / "t", [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)])
        ch = spark.createDataFrame(
            [(2, "a", 20.0, "U"), (3, None, None, "D"), (4, "b", 4.0, "I"),
             (9, None, None, "D")],
            "id int, g string, x double, __op string",
        )
        mt.merge(ch)
        got = _feed(mt, start_version=2)
        assert got == {
            (2, "update_preimage", 2),
            (2, "update_postimage", 2),
            (3, "delete", 2),
            (4, "insert", 2),
            # id 9 absent: delete of a missing key emits nothing
        }
        # pre-image carries OLD values, post-image NEW
        rows = {
            (r["id"], r["_change_type"]): r["x"]
            for r in mt.changes(start_version=2).collect()
        }
        assert rows[(2, "update_preimage")] == 2.0
        assert rows[(2, "update_postimage")] == 20.0

    def test_merge_mor_path_tracks_changes(self, spark, tmp_path):
        mt = _mk(spark, tmp_path / "t", [(i, "a", float(i)) for i in range(1, 9)])
        for i in range(4):  # several files so MOR can trigger
            mt.append(
                spark.createDataFrame([(100 + i, "b", 1.0)], SCHEMA)
            )
        ch = spark.createDataFrame(
            [(i, "a", -1.0, "U") for i in range(1, 9)]
            + [(100, None, None, "D")],
            "id int, g string, x double, __op string",
        )
        v = mt.merge(ch, strategy="mor")
        assert mt._read_commit(v).op == "merge-mor"
        got = {ct for (_i, ct, _v) in _feed(mt, start_version=v)}
        assert got == {"update_preimage", "update_postimage", "delete"}
        assert len(_feed(mt, start_version=v)) == 17

    def test_update_delete_where(self, spark, tmp_path):
        mt = _mk(spark, tmp_path / "t", [(1, "a", 1.0), (2, "b", 2.0)])
        mt.update_where("g = 'a'", {"x": "x * 10"})
        mt.delete_where("id = 2")
        got = _feed(mt, start_version=2)
        assert got == {
            (1, "update_preimage", 2),
            (1, "update_postimage", 2),
            (2, "delete", 3),
        }

    def test_optimize_invisible_overwrite_blocks(self, spark, tmp_path):
        mt = _mk(spark, tmp_path / "t", [(1, "a", 1.0), (2, "b", 2.0)])
        mt.optimize(target_partitions=1)
        assert {ct for (_i, ct, _v) in _feed(mt)} == {"insert"}
        mt.overwrite(spark.createDataFrame([(5, "z", 0.0)], SCHEMA))
        with pytest.raises(MoonTableError, match="overwrite"):
            mt.changes().count()
        # and a range starting past the overwrite works again
        assert mt.changes(start_version=mt.latest_version() + 1).count() == 0

    def test_untracked_dml_raises(self, spark, tmp_path):
        mt = _mk(spark, tmp_path / "t", [(1, "a", 1.0)], change_feed=False)
        mt.delete_where("id = 1")
        with pytest.raises(MoonTableError, match="change tracking"):
            mt.changes().count()

    def test_version_window(self, spark, tmp_path):
        mt = _mk(spark, tmp_path / "t", [(1, "a", 1.0)])
        mt.append(spark.createDataFrame([(2, "b", 2.0)], SCHEMA))
        mt.delete_where("id = 1")
        assert {v for (_i, _ct, v) in _feed(mt, start_version=2, end_version=2)} == {2}
        assert {v for (_i, _ct, v) in _feed(mt, start_version=3)} == {3}


def _truth(eng, base, gb, exprs):
    return (
        eng.table(base)
        .groupBy(gb)
        .agg(*exprs)
        .orderBy(gb)
        .collect()
    )


class TestMaterializedView:
    def _setup(self, spark, warehouse, aggs):
        eng = MooncakeEngine(spark, warehouse)
        rows = [(i, "g%d" % (i % 3), float(i)) for i in range(1, 31)]
        src = spark.createDataFrame(rows, SCHEMA)
        eng.create_table("b", source_df=src, primary_key=["id"], change_feed=True)
        eng.create_materialized_view("v", "b", ["g"], aggs)
        return eng

    def test_incremental_matches_recompute(self, spark, warehouse):
        eng = self._setup(
            spark,
            warehouse,
            {"s": ("sum", "x"), "n": ("count", "*"), "a": ("avg", "x")},
        )
        ch = spark.createDataFrame(
            [(5, "g2", 500.0, "U"), (6, "g0", 600.0, "U"),  # g-migration upsert
             (7, None, None, "D"), (31, "g1", 31.0, "I")],
            "id int, g string, x double, __op string",
        )
        eng.apply_changes("b", ch, source_version=1)
        got = [tuple(r) for r in eng.materialized_view("v").orderBy("g").collect()]
        want = [
            tuple(r)
            for r in _truth(
                eng, "b", "g",
                [F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"),
                 (F.sum("x") / F.count("x")).alias("a")],
            )
        ]
        assert got == want

    def test_minmax_retraction_recompute(self, spark, warehouse):
        eng = self._setup(
            spark, warehouse, {"lo": ("min", "x"), "hi": ("max", "x")}
        )
        # delete the min of g1 (id=1? ids 1..30, g=id%3 → g1 holds 1,4,..28;
        # min x = 1.0) and the max of g2 (id 29)
        eng.delete_where("b", "id = 1 OR id = 29")
        got = [tuple(r) for r in eng.materialized_view("v").orderBy("g").collect()]
        want = [
            tuple(r)
            for r in _truth(
                eng, "b", "g", [F.min("x").alias("lo"), F.max("x").alias("hi")]
            )
        ]
        assert got == want

    def test_group_vanishes_and_appears(self, spark, warehouse):
        eng = self._setup(spark, warehouse, {"n": ("count", "*")})
        eng.delete_where("b", "g = 'g0'")
        ch = spark.createDataFrame(
            [(99, "brand_new", 9.0, "I")], "id int, g string, x double, __op string"
        )
        eng.apply_changes("b", ch, source_version=2)
        got = {r["g"]: r["n"] for r in eng.materialized_view("v").collect()}
        assert "g0" not in got
        assert got["brand_new"] == 1
        assert got["g1"] == 10 and got["g2"] == 10

    def test_null_semantics(self, spark, warehouse):
        eng = MooncakeEngine(spark, warehouse)
        src = spark.createDataFrame(
            [(1, "a", None), (2, "a", None), (3, "b", 5.0)], SCHEMA
        )
        eng.create_table("b", source_df=src, primary_key=["id"], change_feed=True)
        eng.create_materialized_view(
            "v", "b", ["g"], {"s": ("sum", "x"), "a": ("avg", "x"), "nx": ("count", "x")}
        )
        rows = {r["g"]: r for r in eng.materialized_view("v").collect()}
        assert rows["a"]["s"] is None and rows["a"]["a"] is None and rows["a"]["nx"] == 0
        # a NULL-x insert into b keeps SUM null; a real value flips it
        ch = spark.createDataFrame(
            [(4, "a", None, "I"), (5, "b", 7.0, "I")],
            "id int, g string, x double, __op string",
        )
        eng.apply_changes("b", ch, source_version=1)
        rows = {r["g"]: r for r in eng.materialized_view("v").collect()}
        assert rows["a"]["s"] is None and rows["a"]["nx"] == 0
        assert rows["b"]["s"] == 12.0 and rows["b"]["nx"] == 2

    def test_refresh_is_incremental_not_rescan(self, spark, warehouse):
        """The refresh reads the change feed, not the base table: after
        refresh, the view spec pins the base version, and a second
        refresh with no new commits is a no-op."""
        eng = self._setup(spark, warehouse, {"n": ("count", "*")})
        entry = eng.catalog.get("v")
        mv = MaterializedView(spark, entry["path"])
        v0 = mv.spec()["base_version"]
        state_v0 = mv.state.latest_version()
        assert mv.refresh() == v0
        assert mv.state.latest_version() == state_v0  # no state commit
        ch = spark.createDataFrame(
            [(50, "g0", 1.0, "I")], "id int, g string, x double, __op string"
        )
        eng.apply_changes("b", ch, source_version=1)
        assert mv.spec()["base_version"] > v0
