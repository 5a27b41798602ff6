"""Round-18 subquery predicates in plain UPDATE/DELETE (VERDICT r17
missing #3): IN / NOT IN / EXISTS / NOT EXISTS / scalar subqueries in
a DML WHERE compile through the join-DML machinery instead of dying in
DataFrame.where."""

from __future__ import annotations

import pytest

from pg_mooncake_spark.engine import MooncakeEngine


@pytest.fixture()
def eng(spark, warehouse):
    e = MooncakeEngine(spark, warehouse)
    e.sql("CREATE TABLE a (k int PRIMARY KEY, v int)")
    e.sql("CREATE TABLE b (k int PRIMARY KEY, flag int)")
    e.sql("INSERT INTO a VALUES (1,10),(2,20),(3,30),(4,40)")
    e.sql("INSERT INTO b VALUES (2,1),(3,0),(4,1)")
    return e


class TestSubqueryDml:
    def test_delete_in_select(self, eng):
        eng.sql("DELETE FROM a WHERE k IN (SELECT k FROM b WHERE flag = 1)")
        assert sorted(r.k for r in eng.table("a").collect()) == [1, 3]

    def test_update_exists(self, eng):
        eng.sql(
            "UPDATE a SET v = v + 1 "
            "WHERE EXISTS (SELECT 1 FROM b WHERE b.k = a.k)"
        )
        assert sorted((r.k, r.v) for r in eng.table("a").collect()) == [
            (1, 10), (2, 21), (3, 31), (4, 41),
        ]

    def test_update_scalar_subquery(self, eng):
        eng.sql("UPDATE a SET v = v * 2 WHERE v > (SELECT MAX(v) FROM a) / 2")
        assert sorted((r.k, r.v) for r in eng.table("a").collect()) == [
            (1, 10), (2, 20), (3, 60), (4, 80),
        ]

    def test_not_in_null_semantics(self, eng):
        # Postgres: NOT IN over a set containing NULL is never TRUE
        eng.sql("INSERT INTO b VALUES (9, NULL)")
        eng.sql("DELETE FROM a WHERE k NOT IN (SELECT flag FROM b)")
        assert eng.table("a").count() == 4

    def test_self_referencing_sees_pre_state(self, eng):
        eng.sql("DELETE FROM a WHERE v IN (SELECT MAX(v) FROM a)")
        assert sorted(r.k for r in eng.table("a").collect()) == [1, 2, 3]

    def test_delete_not_exists(self, eng):
        eng.sql(
            "DELETE FROM a WHERE NOT EXISTS "
            "(SELECT 1 FROM b WHERE b.k = a.k)"
        )
        assert sorted(r.k for r in eng.table("a").collect()) == [2, 3, 4]

    def test_returning(self, eng):
        rows = eng.sql(
            "DELETE FROM a WHERE k IN (SELECT k FROM b WHERE flag = 1) "
            "RETURNING k, v"
        ).collect()
        assert sorted((r.k, r.v) for r in rows) == [(2, 20), (4, 40)]

    def test_update_returning(self, eng):
        rows = eng.sql(
            "UPDATE a SET v = 0 "
            "WHERE EXISTS (SELECT 1 FROM b WHERE b.k = a.k AND b.flag = 1) "
            "RETURNING k, v"
        ).collect()
        assert sorted((r.k, r.v) for r in rows) == [(2, 0), (4, 0)]

    def test_txn_read_your_writes(self, eng):
        eng.sql("BEGIN")
        eng.sql("INSERT INTO b VALUES (1, 1)")
        eng.sql("DELETE FROM a WHERE k IN (SELECT k FROM b WHERE flag = 1)")
        eng.sql("COMMIT")
        assert sorted(r.k for r in eng.table("a").collect()) == [3]

    def test_txn_rollback(self, eng):
        eng.sql("BEGIN")
        eng.sql("UPDATE a SET v = 0 WHERE k IN (SELECT k FROM a)")
        eng.sql("ROLLBACK")
        assert sorted((r.k, r.v) for r in eng.table("a").collect()) == [
            (1, 10), (2, 20), (3, 30), (4, 40),
        ]

    def test_pk_assignment_refused(self, eng):
        with pytest.raises(ValueError, match="primary-key"):
            eng.sql(
                "UPDATE a SET k = 99 "
                "WHERE k IN (SELECT k FROM b WHERE flag = 1)"
            )

    def test_plain_where_unaffected(self, eng):
        # no subquery: stays on the direct update_where path
        eng.sql("UPDATE a SET v = -1 WHERE k = 1")
        assert eng.sql("SELECT v FROM a WHERE k = 1").collect()[0].v == -1

    def test_string_literal_not_mistaken_for_subquery(self, eng):
        eng.sql("CREATE TABLE s (k int PRIMARY KEY, txt text)")
        eng.sql("INSERT INTO s VALUES (1, 'x')")
        eng.sql("UPDATE s SET txt = '(SELECT 1)' WHERE k = 1")
        assert eng.sql(
            "SELECT txt FROM s WHERE k = 1"
        ).collect()[0].txt == "(SELECT 1)"

    def test_set_scalar_subquery(self, eng):
        eng.sql("UPDATE a SET v = (SELECT MAX(v) FROM a) WHERE k = 1")
        assert eng.sql("SELECT v FROM a WHERE k = 1").collect()[0].v == 40

    def test_set_correlated_subquery(self, eng):
        eng.sql(
            "UPDATE a SET v = (SELECT coalesce(MAX(flag), -1) FROM b "
            "WHERE b.k = a.k)"
        )
        assert sorted((r.k, r.v) for r in eng.table("a").collect()) == [
            (1, -1), (2, 1), (3, 0), (4, 1),
        ]

    def test_row_form_literal(self, eng):
        eng.sql("CREATE TABLE rf (k int PRIMARY KEY, x int, y text)")
        eng.sql("INSERT INTO rf VALUES (1, 0, 'o')")
        eng.sql("UPDATE rf SET (x, y) = (5, 'five') WHERE k = 1")
        r = eng.sql("SELECT x, y FROM rf WHERE k = 1").collect()[0]
        assert (r.x, r.y) == (5, "five")

    def test_row_form_correlated_subquery(self, eng):
        eng.sql("CREATE TABLE rf2 (k int PRIMARY KEY, x int, y text)")
        eng.sql("CREATE TABLE rsrc (k int PRIMARY KEY, nx int, ny text)")
        eng.sql("INSERT INTO rf2 VALUES (1, 0, 'o'), (2, 0, 'o')")
        eng.sql("INSERT INTO rsrc VALUES (1, 7, 'seven')")
        eng.sql(
            "UPDATE rf2 SET (x, y) = "
            "(SELECT nx, ny FROM rsrc WHERE rsrc.k = rf2.k) WHERE k = 1"
        )
        rows = sorted(
            (r.k, r.x, r.y) for r in eng.table("rf2").collect()
        )
        assert rows == [(1, 7, "seven"), (2, 0, "o")]

    def test_row_form_arity_mismatch(self, eng):
        eng.sql("CREATE TABLE rf3 (k int PRIMARY KEY, x int, y text)")
        eng.sql("INSERT INTO rf3 VALUES (1, 0, 'o')")
        with pytest.raises(ValueError, match="number of columns"):
            eng.sql("UPDATE rf3 SET (x, y) = (1, 2, 3) WHERE k = 1")
