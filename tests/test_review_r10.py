"""Round-10 self-review regressions: DDL interception scope, quoted
PK constraint folding, follower prerequisites and backfill pinning,
and the change-feed duplicate-key guard."""

from __future__ import annotations

import pytest

from pg_mooncake_spark.engine import MooncakeEngine


@pytest.fixture()
def eng(spark, warehouse):
    return MooncakeEngine(spark, warehouse)


def test_create_drop_view_pass_through(eng, spark):
    """Only TABLE statements route to _sql_ddl; Spark view DDL through
    engine.sql keeps working (it did before round 10)."""
    eng.sql("CREATE TABLE t (k int PRIMARY KEY, v text)")
    eng.sql("INSERT INTO t VALUES (1, 'a')")
    eng.sql("CREATE TEMPORARY VIEW tv AS SELECT k FROM t")
    assert [r["k"] for r in eng.sql("SELECT * FROM tv").collect()] == [1]
    eng.sql("DROP VIEW tv")
    with pytest.raises(Exception):
        spark.sql("SELECT * FROM tv")


def test_quoted_table_level_pk_keeps_case(eng):
    eng.sql('CREATE TABLE q ("Id" int, v text, PRIMARY KEY ("Id"))')
    mt = eng._moontable("q")
    assert [f.name for f in mt.schema().fields] == ["Id", "v"]
    assert mt.primary_key() == ["Id"]
    # keyed ops resolve the case-sensitive pk (expressions are Spark
    # SQL dialect: backticks quote identifiers, double quotes are
    # string literals)
    eng.sql("INSERT INTO q VALUES (1, 'a')")
    eng.sql("UPDATE q SET v = 'b' WHERE `Id` = 1")
    assert [tuple(r) for r in eng.table("q").collect()] == [(1, "b")]


def test_follower_requires_feed_at_creation(eng, spark):
    """A keyed base without a change feed is refused when the follower
    is CREATED — not at the base's next DML, which would fail after the
    mirror commit and leave the watermarks stale."""
    eng.create_table(
        "nofeed",
        source_df=spark.createDataFrame([(1, "a")], "k int, v string"),
        primary_key=["k"],
        change_feed=False,
    )
    with pytest.raises(ValueError, match="change feed is off"):
        eng.sql("CALL mooncake.create_table('f', 'nofeed')")
    # base is NOT poisoned: DML still works and watermarks move
    eng.sql("UPDATE nofeed SET v = 'b' WHERE k = 1")
    assert [tuple(r) for r in eng.table("nofeed").collect()] == [(1, "b")]


def test_follower_backfill_pinned_to_log_not_watermark(eng, spark):
    """The snapshot copy and the follow window must pin the SAME
    commit-log version: a lagging flush_version watermark (crash
    between commit and watermark write) must not open a silent gap."""
    eng.sql("CREATE TABLE base (k int PRIMARY KEY, v text)")
    eng.sql("INSERT INTO base VALUES (1, 'a')")
    eng.sql("INSERT INTO base VALUES (2, 'b')")
    # simulate the lag: watermark points one commit behind the log
    real = eng._moontable("base").latest_version()
    eng.catalog.update_watermarks("base", flush_version=real - 1)
    eng.sql("CALL mooncake.create_table('f', 'base')")
    # row 2 (in the log, above the stale watermark) must be in the copy
    assert sorted(tuple(r) for r in eng.table("f").collect()) == [
        (1, "a"), (2, "b"),
    ]
    eng.catalog.update_watermarks("base", flush_version=real)
    eng.sql("INSERT INTO base VALUES (3, 'c')")
    assert sorted(tuple(r) for r in eng.table("f").collect()) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]


def test_duplicate_pk_rows_refuse_to_follow(eng, spark):
    """Blind appends may duplicate a primary key in the base; the
    key-reduced feed cannot represent that, so the follower refresh
    raises instead of silently keeping one arbitrary copy."""
    from pg_mooncake_spark.engine import changes_df

    eng.sql("CREATE TABLE dup (k int PRIMARY KEY, v text)")
    eng.sql("CALL mooncake.create_table('fdup', 'dup')")
    with pytest.raises(Exception, match="duplicate primary-key"):
        eng.insert(
            "dup",
            spark.createDataFrame([(1, "a"), (1, "b")], "k int, v string"),
        )
