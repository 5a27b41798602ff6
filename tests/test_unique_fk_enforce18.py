"""Round-18 write-path enforcement of validated UNIQUE indexes and
FOREIGN KEYs (VERDICT r17 missing #1 / task #3): blind appends
(INSERT / COPY / bulk load) raise Postgres's duplicate-key /
fk-violation errors instead of silently diverging from host semantics.
Declaration-time validation is round-17 machinery
(test_sql_fk_unique17.py); this suite covers the per-statement probes."""

from __future__ import annotations

import pytest

from pg_mooncake_spark.engine import MooncakeEngine


@pytest.fixture()
def eng(spark, warehouse):
    return MooncakeEngine(spark, warehouse)


@pytest.fixture()
def utab(eng):
    eng.sql("CREATE TABLE u (id int PRIMARY KEY, email text, grp int)")
    eng.sql("INSERT INTO u VALUES (1, 'a@x', 1), (2, 'b@x', 1)")
    eng.sql("CREATE UNIQUE INDEX u_email ON u (email)")
    return eng


class TestUniqueAppendGuard:
    def test_existing_collision_refuses(self, utab):
        with pytest.raises(ValueError, match='unique constraint "u_email"'):
            utab.sql("INSERT INTO u VALUES (3, 'a@x', 2)")
        assert utab.table("u").count() == 2  # nothing committed

    def test_intra_batch_collision_refuses(self, utab):
        with pytest.raises(ValueError, match='unique constraint "u_email"'):
            utab.sql("INSERT INTO u VALUES (4, 'c@x', 2), (5, 'c@x', 2)")

    def test_nulls_never_conflict(self, utab):
        utab.sql("INSERT INTO u VALUES (6, NULL, 2), (7, NULL, 2)")
        assert utab.table("u").count() == 4

    def test_fresh_value_passes(self, utab):
        utab.sql("INSERT INTO u VALUES (8, 'c@x', 2)")
        assert utab.table("u").count() == 3

    def test_guc_hatch_skips(self, utab):
        utab.sql("SET mooncake.skip_unique_write_checks = on")
        utab.sql("INSERT INTO u VALUES (9, 'a@x', 3)")
        utab.sql("SET mooncake.skip_unique_write_checks = off")
        assert utab.table("u").count() == 3

    def test_unenforced_index_not_checked(self, eng):
        eng.sql("CREATE TABLE ue (id int PRIMARY KEY, v text)")
        eng.sql("INSERT INTO ue VALUES (1, 'x')")
        eng.sql("SET mooncake.allow_unenforced_unique_indexes = on")
        eng.sql("CREATE UNIQUE INDEX ue_v ON ue (v)")
        eng.sql("SET mooncake.allow_unenforced_unique_indexes = off")
        eng.sql("INSERT INTO ue VALUES (2, 'x')")  # unenforced record
        assert eng.table("ue").count() == 2

    def test_partial_index_where_narrows(self, eng):
        eng.sql("CREATE TABLE pu (id int PRIMARY KEY, v text, act boolean)")
        eng.sql("INSERT INTO pu VALUES (1, 'x', true)")
        eng.sql("CREATE UNIQUE INDEX pu_v ON pu (v) WHERE act")
        # same value OUTSIDE the predicate: allowed
        eng.sql("INSERT INTO pu VALUES (2, 'x', false)")
        with pytest.raises(ValueError, match='unique constraint "pu_v"'):
            eng.sql("INSERT INTO pu VALUES (3, 'x', true)")

    def test_expression_index_enforced(self, eng):
        eng.sql("CREATE TABLE ex (id int PRIMARY KEY, v text)")
        eng.sql("INSERT INTO ex VALUES (1, 'Abc')")
        eng.sql("CREATE UNIQUE INDEX ex_lower ON ex (lower(v))")
        with pytest.raises(ValueError, match='unique constraint "ex_lower"'):
            eng.sql("INSERT INTO ex VALUES (2, 'ABC')")
        eng.sql("INSERT INTO ex VALUES (3, 'def')")

    def test_composite_index(self, eng):
        eng.sql("CREATE TABLE co (id int PRIMARY KEY, a int, b int)")
        eng.sql("INSERT INTO co VALUES (1, 1, 1), (2, 1, 2)")
        eng.sql("CREATE UNIQUE INDEX co_ab ON co (a, b)")
        eng.sql("INSERT INTO co VALUES (3, 2, 1)")  # distinct pair ok
        with pytest.raises(ValueError, match='unique constraint "co_ab"'):
            eng.sql("INSERT INTO co VALUES (4, 1, 2)")

    def test_txn_stage_time_abort(self, utab):
        utab.sql("BEGIN")
        utab.sql("INSERT INTO u VALUES (10, 'z@x', 5)")
        # read-your-writes: collides with the staged row, aborts block
        with pytest.raises(ValueError, match='unique constraint "u_email"'):
            utab.sql("INSERT INTO u VALUES (11, 'z@x', 5)")
        # block aborted — nothing lands after ROLLBACK
        utab.sql("ROLLBACK")
        assert utab.table("u").count() == 2

    def test_txn_commit_passes_when_clean(self, utab):
        utab.sql("BEGIN")
        utab.sql("INSERT INTO u VALUES (10, 'z@x', 5)")
        utab.sql("INSERT INTO u VALUES (11, 'y@x', 5)")
        utab.sql("COMMIT")
        assert utab.table("u").count() == 4

    def test_index_created_in_block_enforces_in_block(self, eng):
        eng.sql("BEGIN")
        eng.sql("CREATE TABLE bt (id int PRIMARY KEY, v text)")
        eng.sql("INSERT INTO bt VALUES (1, 'x')")
        eng.sql("CREATE UNIQUE INDEX bt_v ON bt (v)")
        with pytest.raises(ValueError, match='unique constraint "bt_v"'):
            eng.sql("INSERT INTO bt VALUES (2, 'x')")

    def test_copy_stdin_enforced(self, utab):
        with pytest.raises(ValueError, match='unique constraint "u_email"'):
            utab.sql(
                "COPY u (id, email, grp) FROM STDIN",
                copy_data="3\ta@x\t2\n",
            )

    def test_api_insert_partial_batch_refused_by_conform(self, utab, spark):
        # a narrow API batch never reaches the guard's skip branch:
        # _conform refuses missing columns first (the guard's
        # absent-column skip is defensive for any future narrow path)
        import pg_mooncake_spark.storage as st

        df = spark.createDataFrame([(20, 9)], "id int, grp int")
        with pytest.raises(st.MoonTableError, match="missing columns"):
            utab.insert("u", df)

    def test_api_insert_enforced(self, utab, spark):
        df = spark.createDataFrame(
            [(20, "a@x", 9)], "id int, email string, grp int"
        )
        with pytest.raises(ValueError, match='unique constraint "u_email"'):
            utab.insert("u", df)

    def test_update_not_rechecked_documented(self, utab):
        # documented divergence: UPDATE images are not re-checked
        utab.sql("UPDATE u SET email = 'a@x' WHERE id = 2")
        assert utab.table("u").count() == 2


@pytest.fixture()
def fktab(eng):
    eng.sql("CREATE TABLE par (k int PRIMARY KEY, v text)")
    eng.sql("INSERT INTO par VALUES (1, 'a'), (2, 'b')")
    eng.sql("CREATE TABLE chi (id int PRIMARY KEY, k int)")
    eng.sql(
        "ALTER TABLE chi ADD CONSTRAINT chi_fk "
        "FOREIGN KEY (k) REFERENCES par (k)"
    )
    return eng


class TestFkAppendGuard:
    def test_missing_parent_refuses(self, fktab):
        with pytest.raises(ValueError, match='foreign key constraint "chi_fk"'):
            fktab.sql("INSERT INTO chi VALUES (1, 99)")

    def test_present_and_null_pass(self, fktab):
        fktab.sql("INSERT INTO chi VALUES (1, 1), (2, NULL)")
        assert fktab.table("chi").count() == 2

    def test_guc_hatch_skips(self, fktab):
        fktab.sql("SET mooncake.skip_fk_write_checks = on")
        fktab.sql("INSERT INTO chi VALUES (1, 99)")
        fktab.sql("SET mooncake.skip_fk_write_checks = off")
        assert fktab.table("chi").count() == 1

    def test_not_valid_fk_not_checked(self, eng):
        eng.sql("CREATE TABLE p3 (k int PRIMARY KEY)")
        eng.sql("CREATE TABLE c3 (id int PRIMARY KEY, k int)")
        eng.sql(
            "ALTER TABLE c3 ADD CONSTRAINT nv FOREIGN KEY (k) "
            "REFERENCES p3 (k) NOT VALID"
        )
        eng.sql("INSERT INTO c3 VALUES (1, 99)")  # NOT VALID: no probe
        assert eng.table("c3").count() == 1

    def test_match_full_mixed_refuses(self, eng):
        eng.sql("CREATE TABLE pf (a int NOT NULL, b int NOT NULL)")
        eng.sql("ALTER TABLE pf ADD PRIMARY KEY (a, b)")
        eng.sql("INSERT INTO pf VALUES (1, 1)")
        eng.sql("CREATE TABLE cf (id int PRIMARY KEY, a int, b int)")
        eng.sql(
            "ALTER TABLE cf ADD CONSTRAINT ff FOREIGN KEY (a, b) "
            "REFERENCES pf (a, b) MATCH FULL"
        )
        eng.sql("INSERT INTO cf VALUES (1, NULL, NULL)")  # all-null ok
        with pytest.raises(ValueError, match="MATCH FULL"):
            eng.sql("INSERT INTO cf VALUES (2, 1, NULL)")

    def test_self_referential_sees_batch(self, eng):
        eng.sql("CREATE TABLE emp (id int PRIMARY KEY, mgr int)")
        eng.sql("ALTER TABLE emp ADD FOREIGN KEY (mgr) REFERENCES emp (id)")
        # row 2 references row 1 inserted in the SAME statement
        eng.sql("INSERT INTO emp VALUES (1, NULL), (2, 1)")
        assert eng.table("emp").count() == 2
        with pytest.raises(ValueError, match="violates foreign key"):
            eng.sql("INSERT INTO emp VALUES (3, 99)")

    def test_txn_parent_loaded_in_block(self, eng):
        # the --single-transaction restore shape: parent data staged in
        # the same block satisfies the child's probe (overlay reads)
        eng.sql_script("""
            BEGIN;
            CREATE TABLE bp (k int PRIMARY KEY);
            CREATE TABLE bc (id int PRIMARY KEY, k int);
            INSERT INTO bp VALUES (7);
            ALTER TABLE ONLY bc ADD CONSTRAINT bfk
                FOREIGN KEY (k) REFERENCES bp (k);
            INSERT INTO bc VALUES (1, 7);
            COMMIT;
        """)
        assert eng.table("bc").count() == 1

    def test_txn_violating_insert_aborts_block(self, eng):
        eng.sql("CREATE TABLE p4 (k int PRIMARY KEY)")
        eng.sql("INSERT INTO p4 VALUES (1)")
        eng.sql("CREATE TABLE c4 (id int PRIMARY KEY, k int)")
        eng.sql(
            "ALTER TABLE c4 ADD FOREIGN KEY (k) REFERENCES p4 (k)"
        )
        eng.sql("BEGIN")
        eng.sql("INSERT INTO c4 VALUES (1, 1)")
        with pytest.raises(ValueError, match="violates foreign key"):
            eng.sql("INSERT INTO c4 VALUES (2, 42)")
        eng.sql("ROLLBACK")
        assert eng.table("c4").count() == 0  # block aborted

    def test_post_restore_enforcement(self, eng):
        """The dump-capstone extension (VERDICT r17 task #3 'done'
        criterion): after a --single-transaction restore declares the
        constraints, a violating INSERT errors."""
        eng.sql_script("""
            BEGIN;
            CREATE TABLE rp (k int NOT NULL, name text);
            CREATE TABLE rc (id int NOT NULL, k int);
            COPY rp (k, name) FROM STDIN;
1\tone
2\ttwo
\\.
            COPY rc (id, k) FROM STDIN;
10\t1
11\t2
\\.
            ALTER TABLE ONLY rp ADD CONSTRAINT rp_pkey PRIMARY KEY (k);
            CREATE UNIQUE INDEX rp_name_key ON rp (name);
            ALTER TABLE ONLY rc ADD CONSTRAINT rc_k_fkey
                FOREIGN KEY (k) REFERENCES rp (k);
            COMMIT;
        """)
        with pytest.raises(ValueError, match='unique constraint "rp_name_key"'):
            eng.sql("INSERT INTO rp VALUES (3, 'one')")
        with pytest.raises(ValueError, match='foreign key constraint "rc_k_fkey"'):
            eng.sql("INSERT INTO rc VALUES (12, 9)")
        eng.sql("INSERT INTO rp VALUES (3, 'three')")
        eng.sql("INSERT INTO rc VALUES (12, 3)")
        assert eng.table("rp").count() == 3
        assert eng.table("rc").count() == 3


class TestOnConflictUniqueArbitration:
    """Round-18 (VERDICT r17 missing #2): ON CONFLICT resolves its
    target against validated unique indexes, not just the pk."""

    @pytest.fixture()
    def tab(self, eng):
        eng.sql("CREATE TABLE t (id int PRIMARY KEY, email text, n int)")
        eng.sql("INSERT INTO t VALUES (1, 'a@x', 1), (2, 'b@x', 1)")
        eng.sql("CREATE UNIQUE INDEX t_email ON t (email)")
        return eng

    def test_do_nothing_on_unique(self, tab):
        tab.sql(
            "INSERT INTO t VALUES (3, 'a@x', 5) "
            "ON CONFLICT (email) DO NOTHING"
        )
        assert tab.table("t").count() == 2
        tab.sql(
            "INSERT INTO t VALUES (3, 'c@x', 5) "
            "ON CONFLICT (email) DO NOTHING"
        )
        assert tab.table("t").count() == 3

    def test_do_update_on_unique_keeps_pk(self, tab):
        tab.sql(
            "INSERT INTO t VALUES (9, 'a@x', 42) "
            "ON CONFLICT (email) DO UPDATE SET n = excluded.n"
        )
        rows = tab.sql("SELECT id, n FROM t WHERE email = 'a@x'").collect()
        assert [(r.id, r.n) for r in rows] == [(1, 42)]

    def test_null_keys_never_conflict(self, tab):
        tab.sql(
            "INSERT INTO t VALUES (4, NULL, 1), (5, NULL, 1) "
            "ON CONFLICT (email) DO NOTHING"
        )
        assert tab.table("t").count() == 4

    def test_no_matching_index_refuses(self, tab):
        with pytest.raises(ValueError, match="no unique or exclusion"):
            tab.sql(
                "INSERT INTO t VALUES (6, 'd@x', 1) "
                "ON CONFLICT (n) DO NOTHING"
            )

    def test_on_constraint_name(self, tab):
        tab.sql(
            "INSERT INTO t VALUES (6, 'a@x', 7) ON CONFLICT "
            "ON CONSTRAINT t_email DO UPDATE SET n = 7"
        )
        assert tab.sql(
            "SELECT n FROM t WHERE email = 'a@x'"
        ).collect()[0].n == 7

    def test_on_constraint_unknown_refuses(self, tab):
        with pytest.raises(ValueError, match="does not exist"):
            tab.sql(
                "INSERT INTO t VALUES (6, 'd@x', 1) ON CONFLICT "
                "ON CONSTRAINT nope DO NOTHING"
            )

    def test_fresh_pk_collision_probed(self, tab):
        # fresh email, but the surrogate id already exists: Postgres
        # raises the pkey violation — apply_changes must not upsert
        with pytest.raises(ValueError, match='"t_pkey"'):
            tab.sql(
                "INSERT INTO t VALUES (1, 'z@x', 0) "
                "ON CONFLICT (email) DO NOTHING"
            )
        with pytest.raises(ValueError, match='"t_pkey"'):
            tab.sql(
                "INSERT INTO t VALUES (1, 'z@x', 0) "
                "ON CONFLICT (email) DO UPDATE SET n = 0"
            )

    def test_second_time_error(self, tab):
        with pytest.raises(ValueError, match="second time"):
            tab.sql(
                "INSERT INTO t VALUES (7, 'q@x', 1), (8, 'q@x', 2) "
                "ON CONFLICT (email) DO UPDATE SET n = excluded.n"
            )

    def test_do_nothing_intra_batch_first_wins(self, tab):
        tab.sql(
            "INSERT INTO t VALUES (7, 'q@x', 1), (8, 'q@x', 2) "
            "ON CONFLICT (email) DO NOTHING"
        )
        rows = tab.sql("SELECT id, n FROM t WHERE email = 'q@x'").collect()
        assert [(r.id, r.n) for r in rows] == [(7, 1)]

    def test_pk_assignment_refused_under_unique_arbiter(self, tab):
        with pytest.raises(ValueError, match="may not assign primary-key"):
            tab.sql(
                "INSERT INTO t VALUES (9, 'a@x', 1) "
                "ON CONFLICT (email) DO UPDATE SET id = 99"
            )

    def test_pk_target_still_pk_path(self, tab):
        tab.sql(
            "INSERT INTO t VALUES (1, 'k@x', 99) "
            "ON CONFLICT (id) DO UPDATE SET n = excluded.n"
        )
        assert tab.sql(
            "SELECT n FROM t WHERE id = 1"
        ).collect()[0].n == 99

    def test_returning_post_images(self, tab):
        rows = tab.sql(
            "INSERT INTO t VALUES (30, 'new@x', 3), (31, 'a@x', 4) "
            "ON CONFLICT (email) DO UPDATE SET n = excluded.n "
            "RETURNING id, n"
        ).collect()
        assert sorted((r.id, r.n) for r in rows) == [(1, 4), (30, 3)]

    def test_partial_index_inference(self, eng):
        eng.sql("CREATE TABLE p (id int PRIMARY KEY, v text, act boolean)")
        eng.sql("INSERT INTO p VALUES (1, 'x', true), (2, 'x', false)")
        eng.sql("CREATE UNIQUE INDEX p_v ON p (v) WHERE act")
        # without the predicate the partial index is not inferred
        with pytest.raises(ValueError, match="no unique or exclusion"):
            eng.sql(
                "INSERT INTO p VALUES (3, 'x', true) "
                "ON CONFLICT (v) DO NOTHING"
            )
        eng.sql(
            "INSERT INTO p VALUES (3, 'x', true) "
            "ON CONFLICT (v) WHERE act DO NOTHING"
        )
        assert eng.table("p").count() == 2  # conflicted, skipped
        eng.sql(
            "INSERT INTO p VALUES (3, 'x', false) "
            "ON CONFLICT (v) WHERE act DO NOTHING"
        )
        assert eng.table("p").count() == 3  # ineligible row inserts

    def test_do_update_where_clause(self, tab):
        tab.sql(
            "INSERT INTO t VALUES (9, 'a@x', 100) "
            "ON CONFLICT (email) DO UPDATE SET n = excluded.n "
            "WHERE t.n > 500"
        )
        # WHERE failed: row unchanged, proposed row NOT inserted
        assert tab.sql(
            "SELECT n FROM t WHERE email = 'a@x'"
        ).collect()[0].n == 1
        assert tab.table("t").count() == 2

    def test_other_unique_index_still_enforced(self, eng):
        eng.sql(
            "CREATE TABLE m (id int PRIMARY KEY, a text, b text)"
        )
        eng.sql("INSERT INTO m VALUES (1, 'a1', 'b1')")
        eng.sql("CREATE UNIQUE INDEX m_a ON m (a)")
        eng.sql("CREATE UNIQUE INDEX m_b ON m (b)")
        # fresh on the arbiter (a), duplicate on the OTHER index (b)
        with pytest.raises(ValueError, match='"m_b"'):
            eng.sql(
                "INSERT INTO m VALUES (2, 'a2', 'b1') "
                "ON CONFLICT (a) DO UPDATE SET b = excluded.b"
            )

    def test_txn_staged_pk_collision_probed(self, tab):
        # review r18: the fresh-pk probe must see rows STAGED in the
        # open block, not just the committed snapshot
        tab.sql("BEGIN")
        tab.sql("INSERT INTO t VALUES (50, 'aa@x', 1)")
        with pytest.raises(ValueError, match='"t_pkey"'):
            tab.sql(
                "INSERT INTO t VALUES (50, 'bb@x', 2) "
                "ON CONFLICT (email) DO NOTHING"
            )
        tab.sql("ROLLBACK")

    def test_unique_arbitration_inside_txn(self, tab):
        tab.sql("BEGIN")
        tab.sql("INSERT INTO t VALUES (60, 'tx@x', 1)")
        # DO UPDATE arbitrating on the unique col sees the staged row
        tab.sql(
            "INSERT INTO t VALUES (61, 'tx@x', 5) "
            "ON CONFLICT (email) DO UPDATE SET n = excluded.n"
        )
        tab.sql("COMMIT")
        rows = tab.sql(
            "SELECT id, n FROM t WHERE email = 'tx@x'"
        ).collect()
        assert [(r.id, r.n) for r in rows] == [(60, 5)]
