"""Round-18 late dialect surface: quantified comparisons (= ANY /
<> ALL / op ANY|ALL over arrays and subqueries), ARRAY predicate
operators (@> / <@ / &&), JSON construction and aggregation
(json[b]_build_object / _build_array / row_to_json / json[b]_agg /
json[b]_object_agg), and the JSON set-returning functions
(json[b]_array_elements[_text], json[b]_array_length,
jsonb_object_keys).

Reference host behavior: Postgres's quantified comparisons follow
three-valued logic (a NULL element yields NULL on no-match); array
containment treats the empty array as contained in everything;
json_build_object emits {"a": null} for NULL values (Spark's to_json
would silently drop the field without ignoreNullFields=false); and
json_agg without ORDER BY is scan-order-nondeterministic in Postgres
exactly as collect_list is partition-order-nondeterministic here.
"""

from __future__ import annotations

import pytest

from pg_mooncake_spark.engine import MooncakeEngine
from pg_mooncake_spark.sql_router import (
    _rewrite_pg_any_all,
    _rewrite_pg_array_predicates,
    _rewrite_pg_json_build,
)


@pytest.fixture()
def eng(spark, warehouse):
    return MooncakeEngine(spark, warehouse)


class TestQuantifiedComparisons:
    def test_eq_any_and_ne_all(self, eng):
        r = eng.sql(
            "SELECT 2 = ANY(ARRAY[1,2,3]) AS a, 5 = ANY(ARRAY[1,2]) AS b, "
            "2 <> ALL(ARRAY[1,3]) AS c, 2 <> ALL(ARRAY[1,2]) AS d"
        ).collect()[0]
        assert (r.a, r.b, r.c, r.d) == (True, False, True, False)

    def test_inequality_quantifiers(self, eng):
        r = eng.sql(
            "SELECT 4 > ANY(ARRAY[1,9]) AS a, 4 > ALL(ARRAY[1,3]) AS b, "
            "4 >= ALL(ARRAY[1,9]) AS c, 1 < SOME(ARRAY[0,2]) AS d"
        ).collect()[0]
        assert (r.a, r.b, r.c, r.d) == (True, True, False, True)

    def test_null_element_three_valued_logic(self, eng):
        # Postgres: no-match against a NULL element is NULL, a hit wins
        r = eng.sql(
            "SELECT 2 = ANY(ARRAY[1, NULL]) AS miss, "
            "9 = ANY(ARRAY[9, NULL]) AS hit"
        ).collect()[0]
        assert r.miss is None and r.hit is True

    def test_lhs_tight_binding_chain(self, eng):
        assert eng.sql(
            "SELECT 1 + 1 = ANY('{2,5}'::int4[]) AS a"
        ).collect()[0].a is True

    def test_subquery_forms(self, eng):
        eng.sql("CREATE TABLE qa (k int)")
        eng.sql("INSERT INTO qa VALUES (1), (2), (3)")
        r = eng.sql(
            "SELECT count(*) AS n FROM qa "
            "WHERE k = ANY(SELECT k FROM qa WHERE k > 1)"
        ).collect()[0]
        assert r.n == 2
        r = eng.sql(
            "SELECT count(*) AS n FROM qa "
            "WHERE k <> ALL(SELECT k FROM qa WHERE k > 1)"
        ).collect()[0]
        assert r.n == 1

    def test_unsupported_subquery_quantifier_refuses(self, eng):
        with pytest.raises(Exception, match="quantified comparison"):
            eng.sql("SELECT 1 > ANY(SELECT 1)").collect()

    def test_where_position_dml(self, eng):
        eng.sql("CREATE TABLE qd (k int, v text)")
        eng.sql("INSERT INTO qd VALUES (1,'a'), (2,'b'), (3,'c')")
        eng.sql("DELETE FROM qd WHERE k = ANY(ARRAY[1, 3])")
        assert [r.v for r in eng.sql(
            "SELECT v FROM qd ORDER BY k").collect()] == ["b"]


class TestArrayPredicates:
    def test_containment_and_overlap(self, eng):
        r = eng.sql(
            "SELECT ARRAY[1,2,3] @> ARRAY[2,1] AS a, "
            "ARRAY[1,2] @> ARRAY[3] AS b, "
            "ARRAY[1] <@ ARRAY[1,2] AS c, "
            "ARRAY[1,9] && ARRAY[9,5] AS d, "
            "ARRAY[1] && ARRAY[2] AS e"
        ).collect()[0]
        assert (r.a, r.b, r.c, r.d, r.e) == (True, False, True, True, False)

    def test_empty_needle_contained_in_everything(self, eng):
        r = eng.sql(
            "SELECT ARRAY[1] @> '{}'::int4[] AS a"
        ).collect()[0]
        assert r.a is True

    def test_column_operand(self, eng):
        eng.sql("CREATE TABLE ap (k int, tags array<int>)")
        eng.sql(
            "INSERT INTO ap VALUES (1, ARRAY[1,2]), (2, ARRAY[3]), "
            "(3, ARRAY[2,4])"
        )
        assert [r.k for r in eng.sql(
            "SELECT k FROM ap WHERE tags @> ARRAY[2] ORDER BY k"
        ).collect()] == [1, 3]
        assert [r.k for r in eng.sql(
            "SELECT k FROM ap WHERE tags && ARRAY[3, 4] ORDER BY k"
        ).collect()] == [2, 3]
        # lhs-array, rhs-column spelling
        assert [r.k for r in eng.sql(
            "SELECT k FROM ap WHERE ARRAY[1, 2] <@ tags ORDER BY k"
        ).collect()] == [1]

    def test_jsonb_containment_untouched(self, eng):
        # string-literal needles still route to the jsonb pass
        assert eng.sql(
            "SELECT '{\"a\": 1}' @> '{\"a\": 1}' AS m"
        ).collect()[0].m is True

    def test_non_array_and_spelling_refuses_loudly(self, eng):
        # && without an array operand is invalid in Postgres too
        # (booleans use AND) — passes through to Spark's parse error,
        # never silently rewritten
        with pytest.raises(Exception):
            eng.sql("SELECT (1 < 2) && (2 < 3) AS m").collect()


class TestJsonBuild:
    def test_build_object_and_nesting(self, eng):
        r = eng.sql(
            "SELECT json_build_object('a', 1, 'b', 'x') AS j1, "
            "jsonb_build_object('a', json_build_object('b', 2), "
            "'c', json_build_array(1, 2)) AS j2"
        ).collect()[0]
        assert r.j1 == '{"a":1,"b":"x"}'
        assert r.j2 == '{"a":{"b":2},"c":[1,2]}'

    def test_null_member_serializes(self, eng):
        # Postgres emits {"a": null}; Spark's default would drop the field
        assert eng.sql(
            "SELECT json_build_object('a', NULL) AS j"
        ).collect()[0].j == '{"a":null}'

    def test_non_literal_key_refuses(self, eng):
        with pytest.raises(Exception, match="string literal"):
            eng.sql(
                "SELECT json_build_object(upper('a'), 1) AS j"
            ).collect()

    def test_odd_arity_refuses(self, eng):
        with pytest.raises(Exception, match="even number"):
            eng.sql("SELECT json_build_object('a', 1, 'b') AS j").collect()

    def test_row_to_json(self, eng):
        eng.sql("CREATE TABLE rtj (k int, v text)")
        eng.sql("INSERT INTO rtj VALUES (1, 'x')")
        assert eng.sql(
            "SELECT row_to_json(t) AS j FROM rtj t"
        ).collect()[0].j == '{"k":1,"v":"x"}'

    def test_json_agg_ordered(self, eng):
        eng.sql("CREATE TABLE ja (g int, s text)")
        eng.sql("INSERT INTO ja VALUES (1,'b'), (1,'a'), (2,'c')")
        rows = eng.sql(
            "SELECT g, json_agg(s ORDER BY s) AS js FROM ja "
            "GROUP BY g ORDER BY g"
        ).collect()
        assert [(r.g, r.js) for r in rows] == [
            (1, '["a","b"]'), (2, '["c"]')
        ]
        rows = eng.sql(
            "SELECT g, json_agg(s ORDER BY s DESC) AS js FROM ja "
            "GROUP BY g ORDER BY g"
        ).collect()
        assert rows[0].js == '["b","a"]'

    def test_json_agg_null_placement(self, eng):
        eng.sql("CREATE TABLE jn (o int, v int)")
        eng.sql("INSERT INTO jn VALUES (2, 20), (NULL, 99), (1, 10)")
        # ASC: nulls last (Postgres default)
        assert eng.sql(
            "SELECT json_agg(v ORDER BY o) AS j FROM jn"
        ).collect()[0].j == "[10,20,99]"
        # DESC: nulls first
        assert eng.sql(
            "SELECT json_agg(v ORDER BY o DESC) AS j FROM jn"
        ).collect()[0].j == "[99,20,10]"

    def test_json_agg_of_build_object_nests(self, eng):
        eng.sql("CREATE TABLE jb (k int)")
        eng.sql("INSERT INTO jb VALUES (1), (2)")
        assert eng.sql(
            "SELECT json_agg(json_build_object('k', k) ORDER BY k) AS j "
            "FROM jb"
        ).collect()[0].j == '[{"k":1},{"k":2}]'

    def test_json_object_agg(self, eng, spark):
        # single-partition input so collect_list order is the insert order
        eng.sql("CREATE TABLE jo (k text, v int)")
        eng.sql("INSERT INTO jo VALUES ('a', 1)")
        eng.sql("INSERT INTO jo VALUES ('b', 2)")
        j = eng.sql(
            "SELECT json_object_agg(k, v) AS j FROM jo"
        ).collect()[0].j
        import json

        assert json.loads(j) == {"a": 1, "b": 2}

    def test_json_agg_distinct_refuses(self, eng):
        with pytest.raises(Exception, match="DISTINCT"):
            eng.sql("SELECT json_agg(DISTINCT 1) AS j").collect()

    def test_multi_key_order_refuses(self, eng):
        with pytest.raises(Exception, match="one sort key"):
            eng.sql(
                "SELECT json_agg(1 ORDER BY 1, 2) AS j"
            ).collect()


class TestJsonSrf:
    def test_array_elements_text_lateral(self, eng):
        eng.sql("CREATE TABLE je (k int, j text)")
        eng.sql(
            "INSERT INTO je VALUES (1, '[\"a\",\"b\"]'), (2, '[\"c\"]')"
        )
        rows = eng.sql(
            "SELECT k, e FROM je, LATERAL "
            "jsonb_array_elements_text(j) AS t(e) ORDER BY k, e"
        ).collect()
        assert [(r.k, r.e) for r in rows] == [
            (1, "a"), (1, "b"), (2, "c")
        ]

    def test_array_elements_objects_stay_addressable(self, eng):
        rows = eng.sql(
            "SELECT e ->> 'a' AS v FROM "
            "jsonb_array_elements('[{\"a\":1},{\"a\":2}]') AS t(e) "
            "ORDER BY v"
        ).collect()
        assert [r.v for r in rows] == ["1", "2"]

    def test_array_length(self, eng):
        r = eng.sql(
            "SELECT json_array_length('[1,2,3]') AS a, "
            "jsonb_array_length('[]') AS b"
        ).collect()[0]
        assert (r.a, r.b) == (3, 0)

    def test_object_keys(self, eng):
        rows = eng.sql(
            "SELECT k FROM jsonb_object_keys('{\"x\":1,\"y\":2}') "
            "AS t(k) ORDER BY k"
        ).collect()
        assert [r.k for r in rows] == ["x", "y"]


class TestRewriterUnits:
    """String-level checks on spans the engine queries can't reach."""

    def test_any_all_string_literals_untouched(self):
        q = "SELECT '= ANY(x)' AS s, 1 = ANY(array(1)) AS m"
        out = _rewrite_pg_any_all(q)
        assert "'= ANY(x)'" in out
        assert "array_contains" in out

    def test_array_pred_string_literals_untouched(self):
        q = "SELECT 'a @> b' AS s, array(1) @> array(1) AS m"
        out = _rewrite_pg_array_predicates(q)
        assert "'a @> b'" in out
        assert "forall" in out

    def test_json_build_object_agg_arity_refuses(self):
        with pytest.raises(ValueError, match="two arguments"):
            _rewrite_pg_json_build("SELECT json_object_agg(1) AS j")

    def test_nulls_clause_refuses(self):
        with pytest.raises(ValueError, match="NULLS"):
            _rewrite_pg_json_build(
                "SELECT json_agg(v ORDER BY o NULLS FIRST) AS j"
            )
