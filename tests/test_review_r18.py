"""Round-18 regression tests for the ADVICE.md r17 findings: chained
AT TIME ZONE direction, the OFFSET-n-LIMIT-m reorder corrupting string
literals, lambda-parameter corruption in the pg json-operator rewrite,
lowercase to_char template tokens, and nested CAST inner-type skips."""

from __future__ import annotations

import pytest

from pg_mooncake_spark.engine import MooncakeEngine
from pg_mooncake_spark.sql_router import (
    _pg_datetime_format,
    _rewrite_at_time_zone,
    _rewrite_pg_casts_and_arrays,
    _rewrite_pg_datetime_fns,
    _rewrite_pg_json_ops,
)


@pytest.fixture()
def eng(spark, warehouse):
    return MooncakeEngine(spark, warehouse)


class TestChainedAtTimeZone:
    """ADVICE r17 (medium): ``ts AT TIME ZONE 'UTC' AT TIME ZONE
    'America/New_York'`` — the standard pg tz-conversion idiom — must
    convert the UTC instant TO New-York wall-clock (from_utc), not
    re-interpret it (to_utc), which inverts the offset."""

    def test_rewrite_direction(self):
        out = _rewrite_at_time_zone(
            "SELECT ts AT TIME ZONE 'UTC' AT TIME ZONE "
            "'America/New_York' AS x"
        )
        assert out == (
            "SELECT from_utc_timestamp(to_utc_timestamp(ts, 'UTC'), "
            "'America/New_York') AS x"
        )

    def test_triple_chain_flips_back(self):
        # (local→tz)→local is a plain timestamp again: third hop to_utc
        out = _rewrite_at_time_zone(
            "SELECT ts AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo' "
            "AT TIME ZONE 'UTC' AS x"
        )
        assert out.startswith("SELECT to_utc_timestamp(from_utc_timestamp(")

    def test_engine_value_matches_postgres(self, eng):
        # pg: 2024-01-15 12:00 UTC shown in New York = 07:00 (UTC-5)
        row = eng.sql(
            "SELECT CAST(TIMESTAMP '2024-01-15 12:00:00' "
            "AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York' "
            "AS STRING) AS x"
        ).collect()[0]
        assert row.x == "2024-01-15 07:00:00"

    def test_single_application_unchanged(self, eng):
        row = eng.sql(
            "SELECT CAST(TIMESTAMP '2024-01-15 12:00:00' "
            "AT TIME ZONE 'America/New_York' AS STRING) AS x"
        ).collect()[0]
        # NY wall-clock noon = 17:00 UTC
        assert row.x == "2024-01-15 17:00:00"


class TestOffsetLimitReorderMasked:
    """ADVICE r17 (medium): the OFFSET-then-LIMIT swap ran re.sub on
    the UNMASKED text, rewriting string-literal contents."""

    def test_literal_survives(self):
        out = _rewrite_pg_datetime_fns(
            "SELECT 'OFFSET 1 LIMIT 2' AS s FROM t "
            "OFFSET 3 ROWS FETCH FIRST 4 ROWS ONLY"
        )
        assert "'OFFSET 1 LIMIT 2'" in out
        assert out.endswith("LIMIT 4 OFFSET 3")

    def test_engine_end_to_end(self, eng):
        eng.sql("CREATE TABLE olt (k int)")
        eng.sql("INSERT INTO olt VALUES (1), (2), (3), (4), (5)")
        rows = eng.sql(
            "SELECT 'OFFSET 1 LIMIT 2' AS s, k FROM olt ORDER BY k "
            "OFFSET 1 ROWS FETCH NEXT 2 ROWS ONLY"
        ).collect()
        assert [r.k for r in rows] == [2, 3]
        assert rows[0].s == "OFFSET 1 LIMIT 2"


class TestJsonOpLambdaGuard:
    """ADVICE r17 (medium): _rewrite_pg_json_ops corrupted valid Spark
    lambdas — string bodies after a bare identifier and parenthesized
    parameter lists."""

    @pytest.mark.parametrize("q", [
        "SELECT transform(a, x -> 'y') AS r",
        "SELECT filter(a, (x, i) -> 0) AS r",
        "SELECT aggregate(a, 0, (acc, x) -> acc + x, acc -> acc) AS r",
        "SELECT array_sort(a, (l, r) -> 1) AS r",
        "SELECT transform(a, x -> 1) AS r",
    ])
    def test_lambdas_survive(self, q):
        assert _rewrite_pg_json_ops(q) == q

    @pytest.mark.parametrize("q,expected", [
        ("SELECT j -> 'k' FROM t",
         "SELECT get_json_object(j, '$.k') FROM t"),
        # bare column with a digit index now rewrites outside HOFs
        ("SELECT j -> 0 FROM t",
         "SELECT get_json_object(j, '$[0]') FROM t"),
        ("SELECT coalesce(j -> 'k', '-') FROM t",
         "SELECT coalesce(get_json_object(j, '$.k'), '-') FROM t"),
    ])
    def test_json_columns_still_rewrite(self, q, expected):
        assert _rewrite_pg_json_ops(q) == expected

    def test_lambda_body_json_access_rewrites(self):
        # inside the BODY the arrow operand is json text — rewrite
        out = _rewrite_pg_json_ops("SELECT transform(a, x -> x ->> 'k')")
        assert out == (
            "SELECT transform(a, x -> get_json_object(x, '$.k'))"
        )

    def test_engine_lambda_string_body(self, eng):
        row = eng.sql(
            "SELECT transform(array(1, 2), x -> 'y') AS r"
        ).collect()[0]
        assert list(row.r) == ["y", "y"]

    def test_engine_tuple_lambda(self, eng):
        row = eng.sql(
            "SELECT filter(array(10, 20, 30), (x, i) -> i < 2) AS r"
        ).collect()[0]
        assert list(row.r) == [10, 20]


class TestLowercaseToCharTokens:
    """ADVICE r17 (low): Postgres template patterns are
    case-insensitive for date tokens; 'yyyy-mm-dd' must translate."""

    @pytest.mark.parametrize("fmt,expected", [
        ("yyyy-mm-dd", "yyyy-MM-dd"),
        ("YYYY-MM-DD", "yyyy-MM-dd"),
        ("hh24:mi:ss", "HH:mm:ss"),
        ("fmDay, dd mon yyyy", "EEEE, dd MMM yyyy"),
    ])
    def test_translate(self, fmt, expected):
        assert _pg_datetime_format(fmt) == expected

    @pytest.mark.parametrize("fmt", ["iw", "rm", "yyyy-Jmm"])
    def test_refusals_stay_loud_lowercase(self, fmt):
        with pytest.raises(ValueError):
            _pg_datetime_format(fmt)

    def test_engine_lowercase_to_char(self, eng):
        row = eng.sql(
            "SELECT to_char(DATE '2024-03-07', 'yyyy-mm-dd') AS s"
        ).collect()[0]
        assert row.s == "2024-03-07"


class TestNestedCastTypes:
    """ADVICE r17 (low): CAST(CAST(x AS int4) AS text) only rewrote
    the outer type, leaving int4 for a Spark parse error."""

    def test_rewrite_both(self):
        out = _rewrite_pg_casts_and_arrays(
            "SELECT CAST(CAST(x AS int4) AS text)"
        )
        assert out == "SELECT CAST(CAST(x AS int) AS string)"

    def test_triple_nesting(self):
        out = _rewrite_pg_casts_and_arrays(
            "SELECT CAST(CAST(CAST(x AS int8) AS float4) AS varchar)"
        )
        assert out == (
            "SELECT CAST(CAST(CAST(x AS bigint) AS float) AS string)"
        )

    def test_engine_nested_cast(self, eng):
        row = eng.sql(
            "SELECT CAST(CAST('42' AS int4) AS text) AS s"
        ).collect()[0]
        assert row.s == "42"


class TestPgDialectInDmlFragments:
    """Round-18 late addition: pg dialect spellings (regex ops, json
    ops, jsonb predicates, ::casts, to_char) previously died on
    Spark's parser when used in DML WHERE / SET / VALUES / RETURNING
    fragments — the rewrites only ran in the SELECT pipeline."""

    @pytest.fixture()
    def tab(self, eng):
        eng.sql("CREATE TABLE t (k int PRIMARY KEY, v text, j text)")
        eng.sql(
            "INSERT INTO t VALUES "
            "(1, 'abc', '{\"s\": \"x\"}'), (2, 'xyz', '{\"s\": \"y\"}')"
        )
        return eng

    def test_regex_op_in_delete_where(self, tab):
        tab.sql("DELETE FROM t WHERE v ~ '^a'")
        assert sorted(r.k for r in tab.table("t").collect()) == [2]

    def test_json_op_in_update_where(self, tab):
        tab.sql("UPDATE t SET v = 'm' WHERE j ->> 's' = 'y'")
        assert tab.sql(
            "SELECT v FROM t WHERE k = 2"
        ).collect()[0].v == "m"

    def test_jsonb_predicate_in_delete(self, tab):
        tab.sql("DELETE FROM t WHERE j @> '{\"s\": \"x\"}'")
        assert sorted(r.k for r in tab.table("t").collect()) == [2]

    def test_pg_cast_in_where_and_values(self, tab):
        tab.sql("UPDATE t SET v = v || '!' WHERE k::int8 = 1")
        assert tab.sql(
            "SELECT v FROM t WHERE k = 1"
        ).collect()[0].v == "abc!"
        tab.sql(
            "INSERT INTO t VALUES "
            "('3'::int4, to_char(DATE '2024-01-01', 'yyyy'), '{}')"
        )
        assert tab.sql(
            "SELECT v FROM t WHERE k = 3"
        ).collect()[0].v == "2024"

    def test_pg_cast_in_returning(self, tab):
        rows = tab.sql(
            "DELETE FROM t WHERE k = 1 RETURNING k::int8 AS kk"
        ).collect()
        assert [r.kk for r in rows] == [1]

    def test_lambda_in_set_survives(self, eng):
        eng.sql("CREATE TABLE la (k int PRIMARY KEY, a array<int>)")
        eng.sql("INSERT INTO la VALUES (1, array(1, 2))")
        eng.sql("UPDATE la SET a = transform(a, x -> x + 1) WHERE k = 1")
        assert list(
            eng.sql("SELECT a FROM la WHERE k = 1").collect()[0].a
        ) == [2, 3]
