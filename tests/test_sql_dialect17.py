"""Round-17 SELECT-dialect surface: Postgres regex-match operators
(~ / ~* / !~ / !~*), SELECT DISTINCT ON, and the three-argument
generate_series reversed-range guard (VERDICT r16 missing #2/#4/#5).

Reference host behavior: Postgres's pg_operator regex matches are
partial (search, not full-match); DISTINCT ON keeps the first row of
each group under the query's ORDER BY and enforces the ON-prefix rule;
generate_series(a, b, step) returns the empty set when the range is
reversed relative to the step's sign (any type) and errors on step 0.
"""

from __future__ import annotations

import pytest

from pg_mooncake_spark.engine import MooncakeEngine
from pg_mooncake_spark.sql_router import (
    _rewrite_distinct_on,
    _rewrite_pg_regex_ops,
)


@pytest.fixture()
def eng(spark, warehouse):
    return MooncakeEngine(spark, warehouse)


class TestPgRegexOps:
    def test_all_four_operators(self, eng):
        r = eng.sql(
            "SELECT 'abc' ~ 'b' AS a, 'abc' ~ '^b' AS b, "
            "'ABC' ~* 'abc' AS c, 'abc' !~ 'z' AS d, "
            "'ABC' !~* 'abc' AS e"
        ).collect()[0]
        assert (r.a, r.b, r.c, r.d, r.e) == (True, False, True, True, False)

    def test_partial_match_semantics(self, eng):
        # Postgres ~ searches, it does not full-match
        assert eng.sql("SELECT 'src10' ~ '1[0-9]$' AS m").collect()[0].m

    def test_where_clause_and_null(self, eng):
        eng.sql("CREATE TABLE rx (s text)")
        eng.sql("INSERT INTO rx VALUES ('foo'), ('BAR'), (NULL)")
        assert [r.s for r in eng.sql(
            "SELECT s FROM rx WHERE s !~* 'bar' ORDER BY s"
        ).collect()] == ["foo"]
        assert eng.sql(
            "SELECT count(*) AS n FROM rx WHERE s ~ 'o'"
        ).collect()[0].n == 1

    def test_prefix_bitwise_not_untouched(self, eng):
        r = eng.sql("SELECT ~5 AS a, 2 & ~1 AS b").collect()[0]
        assert (r.a, r.b) == (-6, 2)

    def test_case_insensitive_non_literal_pattern(self, eng):
        assert eng.sql(
            "SELECT 'Abc' ~* ('ab' || 'c') AS m"
        ).collect()[0].m is True
        assert eng.sql(
            "SELECT 'Abc' ~* upper('ab') AS m"
        ).collect()[0].m is True

    def test_string_literal_contents_untouched(self, eng):
        # a ~ inside a string literal must not rewrite
        assert eng.sql("SELECT 'a~b' AS s").collect()[0].s == "a~b"
        assert eng.sql("SELECT 'it''s' ~ 'it''s' AS m").collect()[0].m

    def test_rewrite_is_textual_and_spanned(self):
        import re as _re

        out = _re.sub(
            r"\s+", " ",
            _rewrite_pg_regex_ops("SELECT a ~ 'x', b !~ 'y' FROM t"),
        )
        assert "RLIKE 'x'" in out and "NOT RLIKE 'y'" in out
        # LIKE's internal spellings are left alone
        s = "SELECT a ~~ 'x%' FROM t"
        assert _rewrite_pg_regex_ops(s) == s


class TestDistinctOn:
    @pytest.fixture()
    def deng(self, eng):
        eng.sql("CREATE TABLE d (k int, v int, ts int)")
        eng.sql(
            "INSERT INTO d VALUES (1, 10, 1), (1, 20, 2), (2, 30, 5), "
            "(2, 40, 4), (3, NULL, 9)"
        )
        return eng

    def test_latest_row_per_key(self, deng):
        rows = deng.sql(
            "SELECT DISTINCT ON (k) k, v, ts FROM d ORDER BY k, ts DESC"
        ).collect()
        assert [(r.k, r.v, r.ts) for r in rows] == [
            (1, 20, 2), (2, 30, 5), (3, None, 9)
        ]

    def test_qualified_references_and_limit(self, deng):
        rows = deng.sql(
            "SELECT DISTINCT ON (k) t.k, t.v FROM d t "
            "ORDER BY k, ts DESC LIMIT 2"
        ).collect()
        assert [(r.k, r.v) for r in rows] == [(1, 20), (2, 30)]

    def test_without_order_by(self, deng):
        rows = deng.sql("SELECT DISTINCT ON (k) k FROM d").collect()
        assert sorted(r.k for r in rows) == [1, 2, 3]

    def test_nulls_sort_like_postgres(self, deng):
        # ASC default is NULLS LAST in Postgres (Spark's is FIRST):
        # the non-null v must win the k=3 group... k=3 has one row;
        # use v ordering across k groups instead
        deng.sql("INSERT INTO d VALUES (3, 7, 1)")
        rows = deng.sql(
            "SELECT DISTINCT ON (k) k, v FROM d ORDER BY k, v"
        ).collect()
        assert (3, 7) in {(r.k, r.v) for r in rows}

    def test_desc_nulls_first_like_postgres(self, deng):
        deng.sql("INSERT INTO d VALUES (3, 7, 1)")
        rows = deng.sql(
            "SELECT DISTINCT ON (k) k, v FROM d ORDER BY k, v DESC"
        ).collect()
        # DESC default is NULLS FIRST in Postgres: NULL wins k=3
        assert (3, None) in {(r.k, r.v) for r in rows}

    def test_prefix_rule_enforced(self, deng):
        with pytest.raises(ValueError, match="must match initial ORDER BY"):
            deng.sql(
                "SELECT DISTINCT ON (k) k, v FROM d ORDER BY v, ts"
            )

    def test_group_by_body_composes(self, deng):
        rows = deng.sql(
            "SELECT DISTINCT ON (k) k, sum(v) AS sv FROM d "
            "GROUP BY k, ts ORDER BY k, sum(v) DESC"
        ).collect()
        assert [(r.k, r.sv) for r in rows] == [(1, 20), (2, 40), (3, None)]

    def test_subquery_position_refused(self, deng):
        with pytest.raises(ValueError, match="top-level"):
            deng.sql(
                "SELECT * FROM (SELECT DISTINCT ON (k) k FROM d) s"
            )

    def test_ordinal_and_alias_order_by(self, deng):
        rows = deng.sql(
            "SELECT DISTINCT ON (k) k AS kk, ts FROM d ORDER BY kk, 2 DESC"
        ).collect()
        assert [(r.kk, r.ts) for r in rows] == [(1, 2), (2, 5), (3, 9)]

    def test_rewrite_shape(self):
        out = _rewrite_distinct_on(
            "SELECT DISTINCT ON (k) k, v FROM t ORDER BY k, ts DESC"
        )
        assert "row_number() OVER (PARTITION BY (k)" in out
        assert "NULLS FIRST" in out and "__mnck_don_rn = 1" in out


class TestGenerateSeriesThreeArg:
    @pytest.mark.parametrize(
        "args,expect",
        [
            ("5, 1, 1", []),
            ("1, 5, -1", []),
            ("5, 1, -2", [5, 3, 1]),
            ("5, 5, -1", [5]),
            ("5, 5, 3", [5]),
        ],
    )
    def test_numeric_reversed_ranges(self, eng, args, expect):
        rows = eng.sql(
            f"SELECT * FROM generate_series({args}) AS g(x)"
        ).collect()
        assert [r.x for r in rows] == expect

    def test_timestamp_reversed_range_is_empty(self, eng):
        rows = eng.sql(
            "SELECT * FROM generate_series(TIMESTAMP '2024-01-03', "
            "TIMESTAMP '2024-01-01', INTERVAL 1 DAY) AS g(t)"
        ).collect()
        assert rows == []

    def test_timestamp_forward_still_works(self, eng):
        rows = eng.sql(
            "SELECT * FROM generate_series(TIMESTAMP '2024-01-01', "
            "TIMESTAMP '2024-01-03', INTERVAL 1 DAY) AS g(t)"
        ).collect()
        assert len(rows) == 3

    def test_zero_step_errors_loudly(self, eng):
        with pytest.raises(Exception):
            eng.sql(
                "SELECT * FROM generate_series(1, 5, 0) AS g(x)"
            ).collect()


class TestPsqlSpellingNormalization:
    def test_collate_and_operator_in_literals_untouched(self, eng):
        assert eng.sql(
            "SELECT 'a COLLATE default b' AS s"
        ).collect()[0].s == "a COLLATE default b"
        assert eng.sql(
            "SELECT 'OPERATOR(pg_catalog.~)' AS s"
        ).collect()[0].s == "OPERATOR(pg_catalog.~)"

    def test_inert_collations_strip(self, eng):
        assert eng.sql(
            "SELECT 'x' = 'x' COLLATE pg_catalog.default AS m"
        ).collect()[0].m is True
        assert eng.sql(
            "SELECT 1 AS x ORDER BY 'a' COLLATE \"default\""
        ).collect()[0].x == 1

    def test_named_collation_errors_loudly(self, eng):
        with pytest.raises(Exception):
            eng.sql("SELECT 'a' COLLATE \"en_US\" AS s")


class TestPgCastsArraysAndTimeZone:
    def test_pg_type_names_in_casts(self, eng):
        r = eng.sql(
            "SELECT 1::int2 AS a, 1::int8 AS b, 5::text AS c, "
            "'5'::varchar AS d, 2.5::float8 AS e, "
            "CAST(5 AS text) AS f, CAST('1' AS int8) AS g"
        ).collect()[0]
        assert (r.a, r.b, r.c, r.d, r.e, r.f, r.g) == \
            (1, 1, "5", "5", 2.5, "5", 1)

    def test_array_constructor_and_literal(self, eng):
        r = eng.sql(
            "SELECT ARRAY[1 + 1, coalesce(2, 3)] AS a, "
            "'{1,2,3}'::int4[] AS b, '{a,b}'::text[] AS c, "
            "'{}'::int8[] AS d, '{1,NULL}'::int[] AS e"
        ).collect()[0]
        assert r.a == [2, 2] and r.b == [1, 2, 3]
        assert r.c == ["a", "b"] and r.d == [] and r.e == [1, None]

    def test_string_to_array_escapes_delimiter(self, eng):
        r = eng.sql(
            "SELECT string_to_array('a.b.c', '.') AS a, "
            "string_to_array('x,y', ',') AS b"
        ).collect()[0]
        assert r.a == ["a", "b", "c"] and r.b == ["x", "y"]

    def test_at_time_zone(self, eng):
        r = eng.sql(
            "SELECT TIMESTAMP '2024-06-01 12:00:00' "
            "AT TIME ZONE 'America/New_York' AS x, "
            "date_format(TIMESTAMP '2024-06-01 12:00:00' "
            "AT TIME ZONE 'UTC', 'HH:mm') AS y"
        ).collect()[0]
        assert r.x.hour == 16 and r.y == "12:00"  # EDT is UTC-4

    def test_tablesample_bernoulli(self, eng):
        eng.sql("CREATE TABLE tsamp (k int PRIMARY KEY)")
        eng.sql("INSERT INTO tsamp VALUES (1), (2), (3)")
        n = eng.sql(
            "SELECT count(*) AS n FROM tsamp TABLESAMPLE BERNOULLI (100)"
        ).collect()[0].n
        assert n == 3

    def test_literals_stay_data(self, eng):
        r = eng.sql(
            "SELECT 'ARRAY[1] ::int8 CAST( AT TIME ZONE' AS s"
        ).collect()[0]
        assert r.s == "ARRAY[1] ::int8 CAST( AT TIME ZONE"


class TestPgDatetimeFnsAndFetch:
    def test_to_char_common_formats(self, eng):
        r = eng.sql(
            "SELECT to_char(TIMESTAMP '2024-06-01 12:34:56', "
            "'YYYY-MM-DD HH24:MI:SS') AS a, "
            "to_char(TIMESTAMP '2024-06-01 12:34:56', 'Mon DD, YYYY') "
            "AS b, "
            "to_char(TIMESTAMP '2024-06-01 23:59:00', 'HH12:MI AM') AS c"
        ).collect()[0]
        assert r.a == "2024-06-01 12:34:56"
        assert r.b == "Jun 01, 2024"
        assert r.c == "11:59 PM"

    def test_to_date_and_to_timestamp(self, eng):
        r = eng.sql(
            "SELECT to_date('2024-06-01', 'YYYY-MM-DD') AS a, "
            "to_timestamp('2024-06-01 10:00:00', "
            "'YYYY-MM-DD HH24:MI:SS') AS b"
        ).collect()[0]
        assert str(r.a) == "2024-06-01"
        assert r.b.hour == 10

    def test_unsupported_format_refuses(self, eng):
        with pytest.raises(ValueError, match="format token"):
            eng.sql("SELECT to_char(now(), 'IW-J') AS a")

    def test_extract_epoch(self, eng):
        r = eng.sql(
            "SELECT EXTRACT(EPOCH FROM TIMESTAMP '1970-01-01 00:01:00')"
            " AS a, EXTRACT(YEAR FROM TIMESTAMP '2024-06-01 00:00:00')"
            " AS y"
        ).collect()[0]
        assert float(r.a) == 60.0 and r.y == 2024

    def test_fetch_first_and_offset_rows(self, eng):
        eng.sql("CREATE TABLE ff (k int PRIMARY KEY)")
        eng.sql("INSERT INTO ff VALUES (1), (2), (3)")
        assert [r.k for r in eng.sql(
            "SELECT k FROM ff ORDER BY k FETCH FIRST 2 ROWS ONLY"
        ).collect()] == [1, 2]
        assert [r.k for r in eng.sql(
            "SELECT k FROM ff ORDER BY k OFFSET 1 ROWS "
            "FETCH NEXT 1 ROWS ONLY"
        ).collect()] == [2]

    def test_gen_random_uuid(self, eng):
        assert eng.sql(
            "SELECT length(gen_random_uuid()::text) AS n"
        ).collect()[0].n == 36


class TestPgJsonOperators:
    @pytest.fixture()
    def jeng(self, eng):
        eng.sql("CREATE TABLE js (k int PRIMARY KEY, j text)")
        eng.sql(
            'INSERT INTO js VALUES (1, \'{"a": {"b": 2}, '
            '"tags": ["x", "y"], "n": 5}\')'
        )
        return eng

    def test_operators_and_chains(self, jeng):
        r = jeng.sql(
            "SELECT j -> 'a' AS a, j ->> 'n' AS n, "
            "j -> 'a' ->> 'b' AS b, j -> 'tags' ->> 0 AS t0, "
            "j #>> '{a,b}' AS pb FROM js"
        ).collect()[0]
        assert r.a == '{"b":2}' and r.n == "5" and r.b == "2"
        assert r.t0 == "x" and r.pb == "2"

    def test_where_clause(self, jeng):
        assert jeng.sql(
            "SELECT k FROM js WHERE j ->> 'n' = '5'"
        ).collect()[0].k == 1

    def test_lambdas_survive(self, jeng):
        r = jeng.sql(
            "SELECT transform(array(1,2), x -> 1) AS a, "
            "transform(array(1,2), x -> x + 1) AS b, "
            "filter(array('a','b'), s -> s = 'a') AS c"
        ).collect()[0]
        assert r.a == [1, 1] and r.b == [2, 3] and r.c == ["a"]

    def test_literal_stays_data(self, jeng):
        assert jeng.sql(
            "SELECT 'a -> b #>> c' AS s"
        ).collect()[0].s == "a -> b #>> c"
