"""Round-11 regression tests for the ADVICE-r10 findings: export
watermark monotonicity, keyless repair/add_column, and the ON CONFLICT
arbitration-before-WHERE + NULL-key semantics."""

from __future__ import annotations

import pytest

from pg_mooncake_spark.engine import MooncakeEngine


def _export_rows(spark, path):
    from pg_mooncake_spark.sources.iceberg import read_iceberg

    return sorted(
        (r["k"], r["v"]) for r in read_iceberg(spark, path).collect()
    )


class TestExportWatermarkMonotonicity:
    """ADVICE r10 (medium): a DML between a time-travel attach_export
    and the repair must NOT clobber the lagging export_version — doing
    so turns repair_exports into a no-op and the export silently
    diverges forever."""

    def test_dml_before_repair_keeps_lag_and_repair_converges(
        self, spark, warehouse, tmp_path
    ):
        eng = MooncakeEngine(spark, warehouse)
        eng.create_table(
            "t",
            source_df=spark.createDataFrame(
                [(1, "a")], "k int, v string"
            ),
            primary_key=["k"],
            change_feed=True,
        )  # backfill = mirror v1
        eng.apply_changes(
            "t",
            spark.createDataFrame(
                [(2, "b", "I")], "k int, v string, __op string"
            ),
            source_version=1,
        )  # mirror v2
        exp = str(tmp_path / "exp")
        eng.attach_export("t", exp, version=1)  # time travel: k=2 missing
        assert eng.catalog.get("t")["export_version"] == 1
        # the reproduced bug: this INSERT used to stamp export_version
        # to latest, erasing the lag evidence
        eng.insert(
            "t", spark.createDataFrame([(3, "c")], "k int, v string")
        )
        assert eng.catalog.get("t")["export_version"] == 1
        assert _export_rows(spark, exp) == [(1, "a"), (3, "c")]  # gap: k=2
        eng.repair_exports("t")
        assert _export_rows(spark, exp) == [(1, "a"), (2, "b"), (3, "c")]
        assert (
            eng.catalog.get("t")["export_version"]
            == eng._moontable("t").latest_version()
        )

    def test_flush_after_midwindow_attach_keeps_lag(
        self, spark, warehouse, tmp_path
    ):
        """A deferred-export window with an attach_export(version=old)
        landing mid-window: flush_exports applies its buffer but must
        not advance export_version past the attach gap."""
        eng = MooncakeEngine(spark, warehouse)
        eng.create_table(
            "t",
            source_df=spark.createDataFrame(
                [(1, "a")], "k int, v string"
            ),
            primary_key=["k"],
            change_feed=True,
        )
        eng.apply_changes(
            "t",
            spark.createDataFrame(
                [(2, "b", "I")], "k int, v string, __op string"
            ),
            source_version=1,
        )  # mirror v2
        exp1 = str(tmp_path / "e1")
        eng.attach_export("t", exp1)  # current (covers v2)
        batch = spark.createDataFrame(
            [(3, "c", "I")], "k int, v string, __op string"
        )
        eng.apply_changes("t", batch, source_version=2, defer_exports=True)
        assert eng.catalog.get("t").get("export_defer_base") == 2
        # mid-window: second export attached BELOW the defer base — the
        # flush buffer covers (2, 3] but not the (1, 2] attach gap
        exp2 = str(tmp_path / "e2")
        eng.attach_export("t", exp2, version=1)
        assert eng.catalog.get("t")["export_version"] == 1
        eng.flush_exports("t", batch, source_version=2)
        entry = eng.catalog.get("t")
        assert entry["export_version"] == 1  # lag survives the flush
        assert entry.get("export_defer_base") is None
        assert _export_rows(spark, exp2) == [(1, "a"), (3, "c")]  # gap: k=2
        eng.repair_exports("t")
        assert _export_rows(spark, exp1) == [(1, "a"), (2, "b"), (3, "c")]
        assert _export_rows(spark, exp2) == [(1, "a"), (2, "b"), (3, "c")]

    def test_steady_deferral_flush_still_advances(
        self, spark, warehouse, tmp_path
    ):
        eng = MooncakeEngine(spark, warehouse)
        eng.create_table(
            "t",
            source_df=spark.createDataFrame(
                [(1, "a")], "k int, v string"
            ),
            primary_key=["k"],
            change_feed=True,
        )
        exp = str(tmp_path / "e")
        eng.attach_export("t", exp)
        batch = spark.createDataFrame(
            [(2, "b", "I")], "k int, v string, __op string"
        )
        eng.apply_changes("t", batch, source_version=1, defer_exports=True)
        eng.flush_exports("t", batch, source_version=1)
        entry = eng.catalog.get("t")
        assert (
            entry["export_version"] == eng._moontable("t").latest_version()
        )
        assert _export_rows(spark, exp) == [(1, "a"), (2, "b")]


class TestKeylessRepairAndAddColumn:
    def test_repair_exports_keyless_raises(self, spark, warehouse, tmp_path):
        """ADVICE r10: a keyless mirror with a lagging export watermark
        must refuse repair loudly instead of crashing inside either
        strategy (spurious dup-guard / IndexError at pk[0])."""
        eng = MooncakeEngine(spark, warehouse)
        eng.create_table(
            "nk",
            source_df=spark.createDataFrame([(1, "a")], "k int, v string"),
        )
        # attach_export refuses keyless tables, so fabricate the state a
        # legacy/hand-edited catalog could carry: an export entry plus a
        # lagging watermark
        eng.insert(
            "nk", spark.createDataFrame([(2, "b")], "k int, v string")
        )
        eng.catalog.add_export("nk", str(tmp_path / "x"))
        eng.catalog.update_watermarks("nk", export_version=1)
        with pytest.raises(ValueError, match="primary key"):
            eng.repair_exports("nk")

    def test_add_column_on_keyless_table(self, spark, warehouse):
        """ADVICE r10: ALTER TABLE ADD COLUMN on a keyless mirror (e.g.
        a SQL CTAS table) must not route through merge."""
        eng = MooncakeEngine(spark, warehouse)
        eng.sql("CREATE TABLE c AS SELECT 1 AS k, 'a' AS v")
        eng.sql("ALTER TABLE c ADD COLUMN extra int")
        assert [f.name for f in eng._moontable("c").schema().fields] == [
            "k", "v", "extra",
        ]
        rows = eng.sql("SELECT k, v, extra FROM c").collect()
        assert [(r["k"], r["v"], r["extra"]) for r in rows] == [(1, "a", None)]
        # and the widened column accepts writes
        eng.sql("INSERT INTO c VALUES (2, 'b', 7)")
        assert sorted(
            (r["k"], r["extra"]) for r in eng.sql("SELECT * FROM c").collect()
        ) == [(1, None), (2, 7)]


class TestStatementScopedResolution:
    """VERDICT r10 task 2: engine.sql must resolve pinned snapshot views
    only for mirrors the statement references, not the whole catalog."""

    def test_sql_resolves_only_referenced_tables(self, spark, warehouse):
        eng = MooncakeEngine(spark, warehouse)
        probe = spark.createDataFrame([(1, "a")], "k int, v string")
        eng.create_table("hot1", source_df=probe, primary_key=["k"])
        eng.create_table("hot2", source_df=probe, primary_key=["k"])
        for i in range(30):  # filler catalog entries (no backfill commit)
            eng.create_table(
                f"filler{i}", source_df=probe, primary_key=["k"],
                backfill=False,
            )
        resolved: list[str] = []
        orig = eng.table

        def spy(name, *a, **kw):
            resolved.append(name)
            return orig(name, *a, **kw)

        eng.table = spy
        n = eng.sql(
            "SELECT count(*) AS n FROM hot1 JOIN hot2 USING (k)"
        ).collect()[0]["n"]
        assert n == 1
        assert sorted(set(resolved)) == ["hot1", "hot2"]

    def test_dependents_index_maintained(self, spark, warehouse):
        eng = MooncakeEngine(spark, warehouse)
        eng.sql("CREATE TABLE base_ix (k int PRIMARY KEY, n int)")
        eng.sql("INSERT INTO base_ix VALUES (1, 10)")
        eng.create_materialized_view(
            "ix_mv", "base_ix", group_by=["k"], aggs={"s": ("sum", "n")}
        )
        eng.sql("CALL mooncake.create_table('ix_f', 'base_ix')")
        assert sorted(eng.catalog.dependents("base_ix")) == ["ix_f", "ix_mv"]
        eng.drop_table("ix_mv")
        assert eng.catalog.dependents("base_ix") == ["ix_f"]
        eng.drop_table("ix_f")
        assert eng.catalog.dependents("base_ix") == []

    def test_dropped_table_not_answered_by_stale_view(self, spark, warehouse):
        eng = MooncakeEngine(spark, warehouse)
        eng.sql("CREATE TABLE ghost (k int PRIMARY KEY)")
        eng.sql("INSERT INTO ghost VALUES (1)")
        assert eng.sql("SELECT * FROM ghost").count() == 1
        eng.sql("DROP TABLE ghost")
        with pytest.raises(Exception):
            eng.sql("SELECT * FROM ghost").collect()


class TestFollowedAppendGuard:
    """VERDICT r10 wrong #2: duplicate-pk blind appends on a followed
    table must fail at WRITE time, not wedge the follower at follow
    time."""

    def test_dup_append_refused_and_follower_advances(self, spark, warehouse):
        eng = MooncakeEngine(spark, warehouse)
        eng.sql("CREATE TABLE fb (k int PRIMARY KEY, v text)")
        eng.sql("INSERT INTO fb VALUES (1, 'a')")
        eng.sql("CALL mooncake.create_table('fb_f', 'fb')")
        # in-batch duplicate
        with pytest.raises(ValueError, match="duplicate"):
            eng.insert(
                "fb",
                spark.createDataFrame(
                    [(2, "x"), (2, "y")], "k int, v string"
                ),
            )
        # collision with an existing key
        with pytest.raises(ValueError, match="duplicate"):
            eng.sql("INSERT INTO fb VALUES (1, 'again')")
        # valid writes still flow through to the follower
        eng.sql("INSERT INTO fb VALUES (3, 'c')")
        assert sorted(
            (r["k"], r["v"]) for r in eng.table("fb_f").collect()
        ) == [(1, "a"), (3, "c")]

    def test_txn_guard_fires_at_stage_commit_stays_atomic(
        self, spark, warehouse
    ):
        """Inside a transaction the guard runs at STAGE time against the
        overlay (cross-statement dup caught before COMMIT); replay never
        fails halfway, so a guarded block commits atomically."""
        eng = MooncakeEngine(spark, warehouse)
        eng.sql("CREATE TABLE ftx (k int PRIMARY KEY, v text)")
        eng.sql("INSERT INTO ftx VALUES (1, 'a')")
        eng.sql("CALL mooncake.create_table('ftx_f', 'ftx')")
        eng.sql("BEGIN")
        eng.sql("INSERT INTO ftx VALUES (2, 'b')")
        with pytest.raises(ValueError, match="duplicate"):
            eng.sql("INSERT INTO ftx VALUES (2, 'again')")  # vs overlay
        # block is poisoned Postgres-style
        with pytest.raises(Exception):
            eng.sql("INSERT INTO ftx VALUES (9, 'z')")
        eng.sql("ROLLBACK")
        assert eng.table("ftx").count() == 1
        # a clean block commits fully and the follower advances
        eng.sql("BEGIN")
        eng.sql("INSERT INTO ftx VALUES (2, 'b')")
        eng.sql("INSERT INTO ftx VALUES (3, 'c')")
        eng.sql("COMMIT")
        assert sorted(
            (r["k"], r["v"]) for r in eng.table("ftx_f").collect()
        ) == [(1, "a"), (2, "b"), (3, "c")]

    def test_unfollowed_table_keeps_blind_append_semantics(
        self, spark, warehouse
    ):
        eng = MooncakeEngine(spark, warehouse)
        eng.create_table(
            "plain",
            source_df=spark.createDataFrame([(1, "a")], "k int, v string"),
            primary_key=["k"],
        )
        eng.insert(
            "plain", spark.createDataFrame([(1, "b")], "k int, v string")
        )  # duplicates allowed: no follower to protect
        assert eng.table("plain").count() == 2


class TestOnConflictEdges:
    @pytest.fixture()
    def eng(self, spark, warehouse):
        e = MooncakeEngine(spark, warehouse)
        e.create_table(
            "m",
            source_df=spark.createDataFrame(
                [(1, "a", 1.0), (2, "b", 2.0)], "k long, v string, x double"
            ),
            primary_key=["k"],
        )
        return e

    def test_dup_key_raises_even_when_where_excludes_all(self, eng):
        """ADVICE r10: arbitration happens BEFORE the DO UPDATE WHERE in
        Postgres — a key proposed twice errors even if every row fails
        the WHERE (previously: silent no-op)."""
        with pytest.raises(ValueError, match="second time"):
            eng.sql(
                "INSERT INTO m VALUES (1, 'p', 0.0), (1, 'q', 0.0) "
                "ON CONFLICT (k) DO UPDATE SET v = excluded.v WHERE false"
            )

    def test_do_nothing_null_key_conflicts_null_safely(self, spark, eng):
        """ADVICE r10: a NULL-key row must not bypass DO NOTHING's
        conflict detection (null-unsafe equality never matches NULL)."""
        eng.insert(
            "m",
            spark.createDataFrame(
                [(None, "n", 0.0)], "k long, v string, x double"
            ),
        )
        eng.sql(
            "INSERT INTO m VALUES (NULL, 'n2', 9.0) ON CONFLICT DO NOTHING"
        )
        rows = sorted(
            (r["k"], r["v"]) for r in eng.table("m").collect()
            if r["k"] is None
        )
        assert rows == [(None, "n")]  # second NULL-key row skipped
