"""Round-18 optimization regressions: scale-adaptive join-strategy gates.

The r18 optimization round replaced planner-estimate-driven join
strategies on the fact joins with footer-metadata-driven ones
(registry.maybe_broadcast / hash_join_hint): at sf10 the planner's size
estimates chose BROADCASTS of multi-million-entry relations (q9: the
15M-row orders projection; join_semi: 7.3M filtered orders; q13: the
1.1M-entry count relation) while SHUFFLING the genuinely small sides
(q3/q5/q7's filtered orders⋈customer projections).  These tests pin the
gate logic and both plan regimes so a future change can't silently
reintroduce either pathology.
"""

from __future__ import annotations

import pytest

from pg_mooncake_spark.queries import registry
from pg_mooncake_spark.queries.registry import (
    all_queries,
    hash_join_hint,
    maybe_broadcast,
    table_rows,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_table_rows_matches_actual_counts(spark):
    for name in ("orders", "customer", "nation"):
        assert table_rows(SF, name) == spark.read.parquet(
            f"{SF}/{name}.parquet"
        ).count()


def test_table_rows_unreadable_returns_zero():
    assert table_rows("/nonexistent_dir_xyz", "orders") == 0


def test_small_side_gets_broadcast_hint(spark):
    nat = spark.read.parquet(f"{SF}/nation.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    plan = _plan(
        cust.join(maybe_broadcast(nat, 100), cust.c_nationkey == nat.n_nationkey)
    )
    assert "BroadcastHashJoin" in plan


def test_large_side_gets_shuffled_hash_hint(spark, monkeypatch):
    monkeypatch.setattr(registry, "BROADCAST_SIDE_ROWS", 10)
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    nat = spark.read.parquet(f"{SF}/nation.parquet")
    plan = _plan(
        cust.join(
            maybe_broadcast(nat, 1000), cust.c_nationkey == nat.n_nationkey
        )
    )
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hash_join_hint_inert_below_gate(spark):
    # sf0.001 orders (~1.5k rows) is far below HASHJOIN_MIN_ROWS: the
    # planner's broadcast choice must be untouched on every hinted query
    for key in (
        "join_semi_customers_with_orders",
        "q13_customer_distribution",
        "q9_product_type_profit",
        "q21_suppliers_kept_waiting",
    ):
        plan = _plan(all_queries()[key](spark, SF))
        assert "ShuffledHashJoin" not in plan, key
        assert "BroadcastHashJoin" in plan, key


def test_hash_join_hint_engages_above_gate(spark, monkeypatch):
    # force the gate down: every hinted fact join must pin shuffled-hash
    monkeypatch.setattr(registry, "HASHJOIN_MIN_ROWS", 1)
    for key in (
        "join_semi_customers_with_orders",
        "q13_customer_distribution",
        "q9_product_type_profit",
        "q21_suppliers_kept_waiting",
    ):
        plan = _plan(all_queries()[key](spark, SF))
        assert "ShuffledHashJoin" in plan, key


def test_gated_queries_value_identical_across_regimes(spark, monkeypatch):
    """The hint changes physical strategy only: rows must be identical
    with the gate forced on vs off."""
    keys = (
        "join_semi_customers_with_orders",
        "q13_customer_distribution",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q8_market_share",
    )
    baseline = {
        k: [tuple(r) for r in all_queries()[k](spark, SF).collect()] for k in keys
    }
    monkeypatch.setattr(registry, "HASHJOIN_MIN_ROWS", 1)
    monkeypatch.setattr(registry, "BROADCAST_SIDE_ROWS", 1)
    for k in keys:
        forced = [tuple(r) for r in all_queries()[k](spark, SF).collect()]
        assert forced == baseline[k], k


def test_q8_fact_join_both_regimes(spark, monkeypatch):
    """q8's orders-side gate: broadcast when the est fits (small SFs —
    the planner's own choice was sort-merge at every scale), shuffled
    hash past the gate (sf10 measured: the 3.0M-entry broadcast build
    LOST 1.5x vs shuffled-hash, which beat sort-merge).  Sort-merge
    must never come back on the fact join."""
    plan = _plan(all_queries()["q8_market_share"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    monkeypatch.setattr(registry, "BROADCAST_SIDE_ROWS", 1)
    plan = _plan(all_queries()["q8_market_share"](spark, SF))
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q18_fact_join_both_regimes(spark, monkeypatch):
    """q18's surviving-orders⋈orders gate (hash_join_hint): inert below
    the gate — the plan carries no hint, so small-SF executions are
    bit-identical to round 17 (a static broadcast hint measured 9%
    WORSE at sf0.1) — and shuffled hash past it (sf10 measured
    14.1 → 9.8 s vs the planner's sort-merge)."""
    plan = _plan(all_queries()["q18_large_volume_customers"](spark, SF))
    assert "ShuffledHashJoin" not in plan  # gate inert at sf0.001
    monkeypatch.setattr(registry, "HASHJOIN_MIN_ROWS", 1)
    plan = _plan(all_queries()["q18_large_volume_customers"](spark, SF))
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q2_window_reuses_supply_exchange(spark):
    """q2's window-min must not add a second shuffle: exactly one
    non-broadcast Exchange above the scans (the l_partkey repartition),
    and the Window sits exchange-free above it."""
    plan = _plan(all_queries()["q2_min_cost_supplier"](spark, SF))
    import re

    n_shuffles = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_shuffles == 1, plan


def test_bpe_count_equals_alternation_form(spark):
    """token_count_bpe_ish's two-class-counts+translate decomposition
    must equal the original three-way alternation on adversarial
    inputs (class boundaries, unicode, empties, runs)."""
    from pyspark.sql import functions as F

    from pg_mooncake_spark.operators.text import token_count_bpe_ish

    rows = [
        ("",),
        (" ",),
        ("abc",),
        ("abc123",),
        ("a1b2c3",),
        ("!!!",),
        ("a!b?c.",),
        ("Hello, World! 42 times...",),
        ("çafé überños",),
        ("tab\there\nnewline",),
        ("  double  spaces  ",),
        ("123 456 789",),
        ("a" * 500 + "!" + "9" * 30,),
    ]
    df = spark.createDataFrame(rows, "text string")
    old = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0)
        )
    ).cast("bigint")
    got = df.select(
        token_count_bpe_ish(F.col("text")).alias("new"), old.alias("old")
    ).collect()
    for r in got:
        assert r["new"] == r["old"], (r["new"], r["old"])


def test_token_char_sum_equals_fold(spark):
    """The translate-based char sum in text_profile/quality_features
    must equal the per-token length fold it replaced."""
    from pyspark.sql import functions as F

    from pg_mooncake_spark.operators.text import tokens

    rows = [("",), (" ",), ("a b  c",), ("  x  ",), ("word, another.",)]
    df = spark.createDataFrame(rows, "text string")
    fold = F.aggregate(
        tokens(F.col("text")),
        F.lit(0).cast("bigint"),
        lambda a, t: a + F.length(t),
    )
    lin = F.length(F.translate(F.lower(F.col("text")), " ", "")).cast("bigint")
    for r in df.select(fold.alias("a"), lin.alias("b")).collect():
        assert r["a"] == r["b"], (r["a"], r["b"])


def test_dense_rebalance_two_tiers(spark, monkeypatch):
    """The CPU-dense-scan rebalance has two row floors: the 20k AUTO
    tier for every load and a lower DENSE tier callers opt into when
    their per-row work is heavy (text profile, MinHash signatures).
    Pin: with the dense floor lowered to cover the fixture, a
    dense=True load gains the round-robin exchange while the plain
    load of the same table stays scan-only — and the profile's values
    are identical under both regimes."""
    from pg_mooncake_spark.queries.registry import t as load

    monkeypatch.setattr(registry, "REBALANCE_DENSE_MIN_ROWS", 1)
    # keep the AUTO tier out of the way so the tiers are distinguishable
    monkeypatch.setattr(registry, "REBALANCE_MIN_ROWS", 10**9)
    plain = _plan(load(spark, SF, "documents"))
    dense = _plan(load(spark, SF, "documents", dense=True))
    assert "Exchange RoundRobinPartitioning" not in plain, plain
    assert "Exchange RoundRobinPartitioning" in dense, dense

    key = "text_profile_analysis"
    with_rebalance = [tuple(r) for r in all_queries()[key](spark, SF).collect()]
    monkeypatch.setattr(registry, "REBALANCE_DENSE_MIN_ROWS", 10**9)
    without = [tuple(r) for r in all_queries()[key](spark, SF).collect()]
    assert with_rebalance == without


def test_q9_pre_agg_reuses_repartition_exchange(spark, monkeypatch):
    """q9's eager (l_orderkey, s_nationkey) aggregate must share ONE
    exchange with the orders join (repartition by l_orderkey alone
    satisfies both), never pay back-to-back exchanges.  In the forced
    shuffled-hash regime (the sf10 shape) the whole plan carries
    exactly 4 hash exchanges: the l_orderkey repartition, the orders
    side, and the two tiny exact-merge aggregates ((nationkey, year,
    pid) then (nationkey, year) — each carries <= groups x partitions
    rows, the q1 unscale_sum shape)."""
    import re

    monkeypatch.setattr(registry, "HASHJOIN_MIN_ROWS", 1)
    plan = _plan(all_queries()["q9_product_type_profit"](spark, SF))
    assert "ShuffledHashJoin" in plan
    n = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n == 4, plan


def test_q18_scaled_long_sum_equals_decimal(spark):
    """q18's per-order quantity sum as scaled BIGINT must reproduce the
    DECIMAL(30,2) HAVING pass exactly: same surviving orders, same
    sum_qty doubles (IEEE division of an exactly-representable integer
    by 100.0 is correctly rounded = Decimal.toDouble)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    dec = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,2)")).alias("q"))
        .filter(F.col("q") > 120)
        .selectExpr("l_orderkey", "CAST(q AS DOUBLE) AS sum_qty")
    )
    lng = (
        li.selectExpr(
            "l_orderkey", "CAST(l_quantity * 100.0D + 0.5D AS BIGINT) AS qc"
        )
        .groupBy("l_orderkey")
        .agg(F.expr("sum(qc) AS qc"))
        .filter(F.col("qc") > 12000)
        .selectExpr("l_orderkey", "qc / 100.0D AS sum_qty")
    )
    a = sorted(map(tuple, dec.collect()))
    b = sorted(map(tuple, lng.collect()))
    assert a == b and len(a) > 0


def test_q9_long_encode_equals_decimal_cast(spark):
    """q9's sign-aware micro-unit encode must equal the per-row
    DECIMAL(30,6) cast (x1e6) on adversarial 2-decimal inputs,
    including negative amounts (HALF_UP rounds away from zero) and
    values near rounding boundaries."""
    rows = [
        (101.13, 0.05, 19.99, 7.0),   # typical positive
        (1.01, 0.0, 1000.0, 50.0),    # strongly negative amount
        (0.0, 0.0, 0.0, 0.0),         # zero
        (0.01, 0.99, 99999.99, 50.0), # near-max magnitudes
        (50.05, 0.07, 33.33, 3.0),    # odd decimals
    ]
    df = spark.createDataFrame(
        rows, "l_extendedprice double, l_discount double, "
        "p_retailprice double, l_quantity double"
    )
    amount_d = (
        "(l_extendedprice * (1 - l_discount)"
        " - 0.1D * p_retailprice * l_quantity)"
    )
    out = df.selectExpr(
        f"CAST({amount_d} * 1000000.0D + "
        f"IF({amount_d} >= 0D, 0.5D, -0.5D) AS BIGINT) AS enc",
        f"CAST(CAST({amount_d} AS DECIMAL(30,6)) * 1000000 AS BIGINT)"
        " AS dec_ref",
    ).collect()
    for r in out:
        assert r.enc == r.dec_ref, r


def test_scan_memo_hits_and_holds_no_data(spark):
    """t()'s scan memo returns the same lazy DataFrame object on a
    repeat load (the driver-cost win) and never persists rows — the
    plan must stay a plain parquet scan, not an InMemoryRelation."""
    from pg_mooncake_spark.queries.registry import t as load

    a = load(spark, SF, "nation")
    b = load(spark, SF, "nation")
    assert a is b
    assert "InMemoryRelation" not in _plan(a)


def test_scan_memo_invalidates_on_file_change(spark, tmp_path):
    """Rewriting the fixture file (mtime/size change) must invalidate
    the memo entry: the next t() re-resolves and sees the new data."""
    import shutil
    import time as _time

    from pg_mooncake_spark.queries.registry import t as load

    p = str(tmp_path)
    shutil.copy(f"{SF}/nation.parquet", f"{p}/nation.parquet")
    assert load(spark, p, "nation").count() == 25
    two = load(spark, SF, "nation").limit(2)
    _time.sleep(0.05)  # ensure a distinct mtime on coarse filesystems
    two.write.mode("overwrite").parquet(f"{p}/nation.parquet")
    assert load(spark, p, "nation").count() == 2


def test_q1_exprstr_literal_types(spark):
    """q1's SQL-string encode must parse to the same literal types the
    Column form produced: DOUBLE 100.0/0.5 (a bare 0.5 would parse as
    DECIMAL(1,1) and silently change the arithmetic), BIGINT cast, and
    the exact-decimal merge."""
    plan = _plan(all_queries()["q1_pricing_summary"](spark, SF))
    assert "cast(((l_quantity" in plan and "* 100.0) + 0.5) as bigint)" in plan
    assert "as decimal(38,0)" in plan.lower()
    assert "0.5BD" not in plan  # decimal literal would be a regression


def test_minhash_sig_exprstr_matches_column_form(spark):
    """minhash_signature's one-string expression must equal the former
    per-Column construction on adversarial docs (empty text, single
    word, unicode, repeated shingles)."""
    from pyspark.sql import functions as F

    from pg_mooncake_spark.operators.dedup import (
        minhash_signature,
        word_shingles,
    )

    rows = [
        (1, ""),
        (2, "one"),
        (3, "a b c d e f g"),
        (4, "same same same same"),
        (5, "çafé über ños tokens here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["signature"]
        for r in minhash_signature(df, "text", "doc_id", 8, 3).collect()
    }
    hashed = F.transform(word_shingles(F.col("text"), 3), lambda s: F.xxhash64(s))
    base = df.select("doc_id", hashed.alias("_hs0"))
    barrier = base.select(
        "*", F.explode(F.array("_hs0")).alias("_hs")
    ).drop("_hs0")
    def old_member(s: int):
        # NOTE: a single-parameter lambda — `lambda h, s=s: ...` would
        # be read by pyspark as the (element, index) transform form
        return F.array_min(
            F.transform("_hs", lambda h: F.xxhash64(h, F.lit(s)))
        )

    old = barrier.select(
        "doc_id",
        F.array(*[old_member(s) for s in range(8)]).alias("signature"),
    )
    want = {r["doc_id"]: r["signature"] for r in old.collect()}
    assert got == want
