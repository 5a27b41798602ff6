"""Round-18 join-MV dimension churn (VERDICT r17 missing #4): an
advanced enrich dimension is absorbed by a bounded recompute of only
the affected groups, instead of refusing and forcing DROP+recreate."""

from __future__ import annotations

import pytest

from pg_mooncake_spark.engine import MooncakeEngine
from pg_mooncake_spark.views import MaterializedView


@pytest.fixture()
def eng(spark, warehouse):
    return MooncakeEngine(spark, warehouse)


@pytest.fixture()
def setup(eng, spark):
    eng.create_table(
        "dimp",
        source_df=spark.createDataFrame(
            [(1, "gold"), (2, "silver"), (3, "gold")], "p int, tier string"
        ),
        primary_key=["p"], change_feed=True,
    )
    eng.create_table(
        "sales",
        source_df=spark.createDataFrame(
            [(1, 1, 10), (2, 2, 20), (3, 3, 30), (4, 1, 5)],
            "id int, p int, qty int",
        ),
        primary_key=["id"], change_feed=True,
    )
    eng.create_materialized_view(
        "mv_tier", "sales", ["tier"],
        {"total": ("sum", "qty"), "n": ("count", "*")},
        enrich=[{"table": "dimp", "on": [("p", "p")], "cols": ["tier"]}],
    )
    return eng


def state(eng):
    return sorted(
        (r.tier, r.total, r.n)
        for r in eng.materialized_view("mv_tier").collect()
    )


class TestDimChurnFold:
    def test_initial(self, setup):
        assert state(setup) == [("gold", 45, 3), ("silver", 20, 1)]

    def test_update_delete_insert_churn(self, setup):
        setup.sql("UPDATE dimp SET tier = 'gold' WHERE p = 2")
        setup.sql("DELETE FROM dimp WHERE p = 3")
        setup.sql("INSERT INTO dimp VALUES (4, 'bronze')")
        # base commit triggers the refresh; churn folds FIRST at the
        # pre-commit fact version, then the fact delta folds against
        # the new pins — no double count
        setup.sql("INSERT INTO sales VALUES (5, 4, 7)")
        assert state(setup) == [("bronze", 7, 1), ("gold", 35, 3)]

    def test_pure_dim_churn_explicit_refresh(self, setup, spark):
        setup.sql("UPDATE dimp SET tier = 'platinum' WHERE p = 1")
        mv = MaterializedView(
            spark, setup.catalog.get("mv_tier")["path"]
        )
        mv.refresh()
        assert state(setup) == [
            ("gold", 30, 1), ("platinum", 15, 2), ("silver", 20, 1),
        ]

    def test_unaffected_groups_untouched(self, setup, spark):
        # churn on p=3 only: the silver group's state row must not be
        # rewritten (bounded recompute)
        setup.sql("DELETE FROM dimp WHERE p = 3")
        mv = MaterializedView(
            spark, setup.catalog.get("mv_tier")["path"]
        )
        mv.refresh()
        assert state(setup) == [("gold", 15, 2), ("silver", 20, 1)]

    def test_watermark_survives_churn(self, setup, spark):
        mv = MaterializedView(
            spark, setup.catalog.get("mv_tier")["path"]
        )
        before = mv.spec()["base_version"]
        setup.sql("UPDATE dimp SET tier = 'x' WHERE p = 1")
        mv.refresh()
        assert mv.spec()["base_version"] == before
        # a later fact fold still lands exactly once
        setup.sql("INSERT INTO sales VALUES (9, 2, 1)")
        assert ("silver", 21, 2) in state(setup)

    def test_min_max_recompute_through_churn(self, eng, spark):
        eng.create_table(
            "d2",
            source_df=spark.createDataFrame(
                [(1, "a"), (2, "b")], "p int, grp string"
            ),
            primary_key=["p"], change_feed=True,
        )
        eng.create_table(
            "f2",
            source_df=spark.createDataFrame(
                [(1, 1, 10), (2, 1, 99), (3, 2, 50)],
                "id int, p int, v int",
            ),
            primary_key=["id"], change_feed=True,
        )
        eng.create_materialized_view(
            "mv2", "f2", ["grp"], {"mx": ("max", "v")},
            enrich=[{"table": "d2", "on": [("p", "p")], "cols": ["grp"]}],
        )
        # move p=1 (carrying the max 99) from a to b
        eng.sql("UPDATE d2 SET grp = 'b' WHERE p = 1")
        MaterializedView(spark, eng.catalog.get("mv2")["path"]).refresh()
        rows = sorted(
            (r.grp, r.mx)
            for r in eng.materialized_view("mv2").collect()
        )
        assert rows == [("b", 99)]  # group a vanished entirely

    def test_dim_without_feed_refuses_actionably(self, eng, spark):
        eng.create_table(
            "d3",
            source_df=spark.createDataFrame([(1, "a")], "p int, g string"),
            primary_key=["p"],  # no change feed
        )
        eng.create_table(
            "f3",
            source_df=spark.createDataFrame(
                [(1, 1, 5)], "id int, p int, v int"
            ),
            primary_key=["id"], change_feed=True,
        )
        eng.create_materialized_view(
            "mv3", "f3", ["g"], {"s": ("sum", "v")},
            enrich=[{"table": "d3", "on": [("p", "p")], "cols": ["g"]}],
        )
        eng.sql("UPDATE d3 SET g = 'z' WHERE p = 1")
        mv = MaterializedView(spark, eng.catalog.get("mv3")["path"])
        with pytest.raises(Exception, match="change_feed=True"):
            mv.refresh()

    def test_insert_only_dim_without_feed_folds(self, eng, spark):
        # insert-only history replays without change_feed=True
        eng.create_table(
            "d4",
            source_df=spark.createDataFrame([(1, "a")], "p int, g string"),
            primary_key=["p"],
        )
        eng.create_table(
            "f4",
            source_df=spark.createDataFrame(
                [(1, 1, 5), (2, 2, 7)], "id int, p int, v int"
            ),
            primary_key=["id"], change_feed=True,
        )
        eng.create_materialized_view(
            "mv4", "f4", ["g"], {"s": ("sum", "v")},
            enrich=[{"table": "d4", "on": [("p", "p")], "cols": ["g"]}],
        )
        assert sorted(
            (r.g, r.s) for r in eng.materialized_view("mv4").collect()
        ) == [("a", 5)]
        eng.sql("INSERT INTO d4 VALUES (2, 'b')")  # row 2 now joins
        MaterializedView(spark, eng.catalog.get("mv4")["path"]).refresh()
        assert sorted(
            (r.g, r.s) for r in eng.materialized_view("mv4").collect()
        ) == [("a", 5), ("b", 7)]

    def test_fact_side_group_key_slow_path(self, eng, spark):
        # group key is a FACT column: affected groups must come from
        # the fact-pass detection (the dim-delta fast path can't name
        # them), and a WHERE over the dim column moves rows in/out
        eng.create_table(
            "d5",
            source_df=spark.createDataFrame(
                [(1, "gold"), (2, "silver")], "p int, tier string"
            ),
            primary_key=["p"], change_feed=True,
        )
        eng.create_table(
            "f5",
            source_df=spark.createDataFrame(
                [(1, 1, 10), (2, 2, 20), (3, 2, 5)],
                "id int, p int, qty int",
            ),
            primary_key=["id"], change_feed=True,
        )
        eng.create_materialized_view(
            "mv5", "f5", ["p"], {"total": ("sum", "qty")},
            where="tier = 'gold'",
            enrich=[{"table": "d5", "on": [("p", "p")], "cols": ["tier"]}],
        )
        assert sorted(
            (r.p, r.total)
            for r in eng.materialized_view("mv5").collect()
        ) == [(1, 10)]
        # churn: silver -> gold pulls group p=2 INTO the filtered view
        eng.sql("UPDATE d5 SET tier = 'gold' WHERE p = 2")
        MaterializedView(spark, eng.catalog.get("mv5")["path"]).refresh()
        assert sorted(
            (r.p, r.total)
            for r in eng.materialized_view("mv5").collect()
        ) == [(1, 10), (2, 25)]
        # and back out again
        eng.sql("UPDATE d5 SET tier = 'bronze' WHERE p = 2")
        MaterializedView(spark, eng.catalog.get("mv5")["path"]).refresh()
        assert sorted(
            (r.p, r.total)
            for r in eng.materialized_view("mv5").collect()
        ) == [(1, 10)]

    def test_magic_sets_prune_plan_and_values(self, eng, spark):
        # the backward walk must yield a LeftSemi-filtered fact and
        # keep only rows reaching the affected groups
        from pg_mooncake_spark.views import _backward_fact_prune

        eng.create_table(
            "d6a",
            source_df=spark.createDataFrame(
                [(1, 10), (2, 20)], "k int, nk int"
            ),
            primary_key=["k"], change_feed=True,
        )
        eng.create_table(
            "d6b",
            source_df=spark.createDataFrame(
                [(10, "a"), (20, "b")], "nk int, name string"
            ),
        )
        eng.create_table(
            "f6",
            source_df=spark.createDataFrame(
                [(1, 1, 5), (2, 2, 7)], "id int, k int, v int"
            ),
            primary_key=["id"], change_feed=True,
        )
        eng.create_materialized_view(
            "mv6", "f6", ["name"], {"s": ("sum", "v")},
            enrich=[
                {"table": "d6a", "on": [("k", "k")], "cols": ["nk"]},
                {"table": "d6b", "on": [("nk", "nk")], "cols": ["name"]},
            ],
        )
        from pg_mooncake_spark.views import MaterializedView as MV

        spec = MV(spark, eng.catalog.get("mv6")["path"]).spec()
        groups = spark.createDataFrame([("a",)], "name string")
        pruned = _backward_fact_prune(
            spark, eng.table("f6"), spec["enrich"], ["name"], groups
        )
        plan = pruned._jdf.queryExecution().optimizedPlan().toString()
        assert "LeftSemi" in plan
        assert [r.id for r in pruned.collect()] == [1]
        # fact-side group keys: unchanged frame (Catalyst's own pushdown
        # covers that shape)
        same = _backward_fact_prune(
            spark, eng.table("f6"), spec["enrich"], ["id"],
            spark.createDataFrame([(1,)], "id int"),
        )
        assert same is not None and "LeftSemi" not in (
            same._jdf.queryExecution().optimizedPlan().toString()
        )
