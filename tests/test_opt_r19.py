"""Round-19 optimization regression pins.

1. The round-18 sort-first rewrite (queries/llm.py: trailing ``orderBy``
   moved to the *input* of map-only pipelines so the RangePartitioner
   sampling job samples the cheap scan instead of re-executing the whole
   expression subtree) is only order-correct while the pipeline above
   the Sort stays shuffle-free and 1:1 — these tests pin BOTH halves of
   that invariant (VERDICT r18 item 1):
   - order-sensitive FULL-result comparison (collected order must equal
     the explicitly sorted order — set equality is not enough), and
   - a plan pin that no Exchange sits above the Sort (a future shuffle
     inserted above it would silently break the output order).
"""

from __future__ import annotations

import re

import pytest

from pg_mooncake_spark.plans import inspect as I
from pg_mooncake_spark.queries.registry import all_queries
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def queries():
    return all_queries()


# key -> (sort column, secondary columns that must follow the sort
# column for rows sharing it — none: all keys are unique)
SORT_FIRST = {
    "text_profile_analysis": "doc_id",
    "text_quality_scoring": "doc_id",
    "text_pii_redaction": "doc_id",
    "text_repetition_score": "doc_id",
    "text_winnowing_fingerprints": "doc_id",
    "embedding_normalize_quantize": "vec_id",
}


@pytest.mark.parametrize("name,key", sorted(SORT_FIRST.items()))
def test_sort_first_output_order(spark, queries, name, key):
    """Order-sensitive full-result pin: the rows must arrive in the same
    order the pre-r18 trailing orderBy produced (ascending unique key),
    compared row-for-row over the whole result, not as a set."""
    df = queries[name](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    keys = [r[key] for r in rows]
    assert keys == sorted(keys), (
        f"{name}: collected order diverges from ORDER BY {key}"
    )
    # unique sort key => total order is fully pinned by the key sequence
    assert len(set(keys)) == len(keys)


@pytest.mark.parametrize("name,key", sorted(SORT_FIRST.items()))
def test_sort_first_plan_shuffle_free_above_sort(spark, queries, name, key):
    """Plan pin: the input sort is the LAST order-affecting operator —
    no Exchange may appear above the Sort (simple-mode plans print
    top-down, so 'above' = an earlier line)."""
    df = queries[name](spark, SF_DIR)
    plan = I.plan_text(df, "simple")
    lines = plan.splitlines()
    sort_idx = [i for i, ln in enumerate(lines) if re.search(r"\bSort\b", ln)]
    assert sort_idx, f"{name}: no Sort in plan — sort-first shape lost"
    first_sort = sort_idx[0]
    above = "\n".join(lines[:first_sort])
    assert not re.search(r"\bExchange\b", above), (
        f"{name}: Exchange above the Sort — output order no longer "
        f"guaranteed by the input sort:\n{plan}"
    )
    # and the sort must actually be on the contract key
    assert key in lines[first_sort]
