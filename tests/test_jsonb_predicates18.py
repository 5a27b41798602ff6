"""Round-18 jsonb predicate operators (VERDICT r17 missing #5):
``@>`` containment, ``?`` existence, ``?|`` / ``?&`` any/all-keys —
rewritten onto get_json_object / json_object_keys / from_json."""

from __future__ import annotations

import pytest

from pg_mooncake_spark.engine import MooncakeEngine
from pg_mooncake_spark.sql_router import _rewrite_pg_jsonb_predicates


@pytest.fixture()
def eng(spark, warehouse):
    e = MooncakeEngine(spark, warehouse)
    e.sql("CREATE TABLE d (id int PRIMARY KEY, j text)")
    e.sql("""INSERT INTO d VALUES
     (1, '{"k": "v", "n": 1, "tags": ["a", "b"], "sub": {"x": true}}'),
     (2, '{"k": "w", "tags": ["b"]}'),
     (3, '["a", "b", "c"]'),
     (4, '{"k": null}')""")
    return e


def ids(eng, sql):
    return sorted(r.id for r in eng.sql(sql).collect())


class TestContainment:
    def test_scalar_member(self, eng):
        assert ids(eng, "SELECT id FROM d WHERE j @> '{\"k\": \"v\"}'") == [1]

    def test_nested_object(self, eng):
        assert ids(
            eng, "SELECT id FROM d WHERE j @> '{\"sub\": {\"x\": true}}'"
        ) == [1]

    def test_array_member(self, eng):
        assert ids(
            eng, "SELECT id FROM d WHERE j @> '{\"tags\": [\"b\"]}'"
        ) == [1, 2]

    def test_integer_member(self, eng):
        assert ids(eng, "SELECT id FROM d WHERE j @> '{\"n\": 1}'") == [1]

    def test_scalar_needle_matches_array_element(self, eng):
        assert ids(eng, "SELECT id FROM d WHERE j @> '\"a\"'") == [3]

    def test_empty_object_contained_in_objects(self, eng):
        assert ids(eng, "SELECT id FROM d WHERE j @> '{}'") == [1, 2, 4]

    def test_chain_left_operand(self, eng):
        assert ids(
            eng, "SELECT id FROM d WHERE j -> 'sub' @> '{\"x\": true}'"
        ) == [1]

    def test_contained_by_refuses(self, eng):
        with pytest.raises(ValueError, match="<@"):
            eng.sql("SELECT id FROM d WHERE j <@ '{}'")

    def test_float_needle_refuses(self, eng):
        with pytest.raises(ValueError, match="integer"):
            eng.sql("SELECT id FROM d WHERE j @> '{\"k\": 1.5}'")

    def test_null_member_refuses(self, eng):
        with pytest.raises(ValueError, match="null members"):
            eng.sql("SELECT id FROM d WHERE j @> '{\"k\": null}'")

    def test_invalid_json_refuses(self, eng):
        with pytest.raises(ValueError, match="not valid json"):
            eng.sql("SELECT id FROM d WHERE j @> '{broken'")


class TestExistence:
    def test_object_key_including_null_value(self, eng):
        assert ids(eng, "SELECT id FROM d WHERE j ? 'k'") == [1, 2, 4]

    def test_array_string_element(self, eng):
        assert ids(eng, "SELECT id FROM d WHERE j ? 'a'") == [3]

    def test_any_keys(self, eng):
        assert ids(
            eng, "SELECT id FROM d WHERE j ?| array('n', 'missing')"
        ) == [1]

    def test_any_keys_array_constructor(self, eng):
        # pg spelling: ARRAY[...] (rewritten to array(...) upstream)
        assert ids(
            eng, "SELECT id FROM d WHERE j ?| ARRAY['n', 'missing']"
        ) == [1]

    def test_all_keys(self, eng):
        assert ids(
            eng, "SELECT id FROM d WHERE j ?& array('k', 'tags')"
        ) == [1, 2]

    def test_brace_literal_keys(self, eng):
        assert ids(eng, "SELECT id FROM d WHERE j ?| '{n,missing}'") == [1]


class TestRewriteUnit:
    def test_string_literals_untouched(self):
        q = "SELECT '? not an op @> here' AS s FROM t"
        assert _rewrite_pg_jsonb_predicates(q) == q

    def test_no_false_positive_without_literal_rhs(self):
        # ? followed by a non-literal stays for Spark's loud error
        q = "SELECT a ? b FROM t"
        assert _rewrite_pg_jsonb_predicates(q) == q
