"""Plan-shape regression tests: pin the physical-plan properties the
100 TB design depends on — predicate pushdown to parquet, column
pruning, broadcast dimension joins, bounded shuffle counts.  A change
that keeps results correct but loses one of these properties fails here.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pg_mooncake_spark.plans import inspect as I
from pg_mooncake_spark.queries.registry import all_queries
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def test_q6_filters_pushed_to_scan(spark, queries):
    """Q6 is the pushdown showcase: every predicate must reach the
    parquet reader as a PushedFilter."""
    df = queries["q6_forecast_revenue"](spark, SF_DIR)
    pushed = " ".join(I.pushed_filters(df))
    assert "l_shipdate" in pushed
    assert "l_discount" in pushed
    assert "l_quantity" in pushed


def test_q6_column_pruning(spark, queries):
    """Q6 touches 4 columns; the scan must not read the other 7."""
    df = queries["q6_forecast_revenue"](spark, SF_DIR)
    schemas = I.read_schemas(df)
    assert schemas, "no file scan found"
    for s in schemas:
        assert "l_orderkey" not in s  # unused columns pruned
        assert "l_returnflag" not in s


def test_q5_dimension_joins_broadcast(spark, queries):
    """Q5's 6-way join: all dimension sides broadcast; the lineitem fact
    table must shuffle at most for the orders join + final agg."""
    df = queries["q5_local_supplier_volume"](spark, SF_DIR)
    assert I.broadcast_join_count(df) >= 4
    # fact-fact join (lineitem ⋈ orders) + agg + sort
    assert I.exchange_count(df) <= 5


def test_q1_single_shuffle(spark, queries):
    """Q1 (two-level exact-sum shape): the per-row work collapses map-side
    into one (group, partition_id) partial per partition, so every
    exchange moves only #groups×#partitions rows — the r12 fast path adds
    one tiny merge exchange (partial → final agg) plus the 6-row sort."""
    df = queries["q1_pricing_summary"](spark, SF_DIR)
    assert I.exchange_count(df) <= 3
    # The per-row stage must stay long-typed: no 128-bit decimal cast in
    # the hot projection (the whole point of the fast path).
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "decimal(30," not in plan


def test_q3_broadcasts_customer(spark, queries):
    df = queries["q3_shipping_priority"](spark, SF_DIR)
    assert I.broadcast_join_count(df) >= 1


def test_topk_uses_take_ordered(spark, queries):
    """Top-k queries must compile to TakeOrderedAndProject (per-partition
    heaps), never a global sort of all rows."""
    df = queries["q3_shipping_priority"](spark, SF_DIR)
    assert I.count_op(df, "TakeOrderedAndProject") == 1


def test_sim_topk_no_global_sort(spark, queries):
    df = queries["sim_cosine_topk_bruteforce"](spark, SF_DIR)
    assert I.count_op(df, "TakeOrderedAndProject") == 1


def test_top_ngrams_single_shuffle_take_ordered(spark, queries):
    """Corpus top-ngrams: one shuffle for the ngram count (map-side
    partial agg), top-k via per-partition heaps — never a global sort
    of the n-gram universe."""
    df = queries["text_top_ngrams"](spark, SF_DIR)
    assert I.count_op(df, "TakeOrderedAndProject") == 1
    # one HASH shuffle for the count; the loader's deliberate
    # round-robin input rebalance (r14: byte-sized splits starve
    # CPU-dense text scans) is not an aggregation shuffle
    txt = I.plan_text(df)
    assert txt.count("Exchange hashpartitioning") <= 1, txt
    assert "Exchange rangepartitioning" not in txt, txt


def test_sessionization_shuffles_only_on_user(spark, queries):
    """Sessionization = 2 window passes + rollup, all partitioned by
    user_id: one shuffle to co-locate users, then everything is local
    (+1 for the output sort in the query form)."""
    df = queries["events_sessionization"](spark, SF_DIR)
    assert I.exchange_count(df) <= 2


def test_q1_codegen_fused(spark, queries):
    """The scan→filter→partial-agg pipeline must fuse into whole-stage
    codegen (no interpreted gaps in the hot path)."""
    df = queries["q1_pricing_summary"](spark, SF_DIR)
    assert I.codegen_span_count(df) >= 1


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing is the 100 TB co-location strategy: pay ONE shuffle at
    write time (bucketBy orderkey), then every future orderkey join runs
    with zero Exchange on either side.  Assert the joined plan has no
    shuffle before the join itself."""
    from pg_mooncake_spark.queries.registry import t as load
    from tests.conftest import SF_DIR

    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    for name, df, key in [
        ("b_lineitem", li, "l_orderkey"),
        ("b_orders", orders, "o_orderkey"),
    ]:
        (
            df.write.mode("overwrite")
            .option("path", str(tmp_path / name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # at fixture scale Spark would broadcast this join (hiding the
        # bucketing); force the shuffle-join path the 100 TB plan takes
        joined = (
            spark.table("b_lineitem")
            .join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderdate")
            .agg(F.sum("l_quantity").alias("q"))
        )
        # one exchange for the groupBy is allowed; the join itself must
        # consume bucketed scans directly (no hashpartitioning exchange
        # feeding the join)
        assert I.exchange_count(joined) <= 1
        assert I.sortmerge_join_count(joined) == 1
        # results must match the unbucketed plan
        plain = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderdate")
            .agg(F.sum("l_quantity").alias("q"))
        )
        assert sorted((str(r["o_orderdate"]), round(r["q"], 2)) for r in joined.collect()) == \
               sorted((str(r["o_orderdate"]), round(r["q"], 2)) for r in plain.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_q21_single_fact_shuffle(spark, queries):
    """q21's hand-decorrelation contract: lineitem is shuffled once (the
    orders join), not three times as in the naive EXISTS/NOT-EXISTS
    self-join plan.  Both aggregate levels reuse the join's l_orderkey
    partitioning (group keys are supersets), and the (order, supplier)
    pre-aggregation means no countDistinct Expand pass; dims broadcast."""
    df = queries["q21_suppliers_kept_waiting"](spark, SF_DIR)
    # orders join (≤2 sides) + per-order agg + supplier-name agg + top-k
    assert I.exchange_count(df) <= 5
    assert I.count_op(df, "TakeOrderedAndProject") == 1
    assert I.count_op(df, "Expand") == 0


def test_q13_eager_aggregation_below_join(spark, queries):
    """q13's eager-agg contract (round 15): orders are counted per
    o_custkey BEFORE the customer join, so every exchange moves a
    narrow relation — pre-agg counts, 1-column customer keys, or the
    tiny c_count histogram — never the customer⋈orders product.
    Catalyst does not do this rewrite; losing it regresses q13 from
    ~8x to 41x vs the sf10 baseline (BASELINE.md)."""
    df = queries["q13_customer_distribution"](spark, SF_DIR)
    txt = I.plan_text(df)
    # the orders-side aggregate keyed on o_custkey must exist...
    assert "Keys [1]: [o_custkey" in txt
    # ...and no aggregate may be keyed on c_custkey (the naive plan
    # groups the full join product by customer key)
    assert "Keys [1]: [c_custkey" not in txt
    # orders pre-agg + counts join + c_count agg + final sort
    assert I.exchange_count(df) <= 5


def test_q10_single_narrow_exchange(spark, queries):
    """q10's eager-agg contract (round 15): the 3-month orders slice
    broadcasts into the lineitem scan and revenue aggregates per
    o_custkey before customer/nation attach — exactly ONE exchange
    (the per-custkey decimal partials), lineitem itself never
    shuffles, and the top-20 is a TakeOrderedAndProject, not a global
    sort.  Measured sf10: 3.8 s -> 1.9 s (BASELINE.md)."""
    df = queries["q10_returned_items"](spark, SF_DIR)
    txt = I.plan_text(df)
    assert "Keys [1]: [o_custkey" in txt
    assert I.exchange_count(df) == 1
    assert I.broadcast_join_count(df) == 3
    assert I.count_op(df, "TakeOrderedAndProject") == 1


def test_q2_broadcasts_all_dims(spark, queries):
    """q2: supplier/nation/region/part all broadcast; the only fact
    shuffles are the supply aggregate and the per-part window min."""
    df = queries["q2_min_cost_supplier"](spark, SF_DIR)
    assert I.broadcast_join_count(df) >= 4


def test_q9_broadcasts_all_dims(spark, queries):
    """q9: part/supplier/nation broadcast — lineitem⋈orders is the only
    fact-fact join."""
    df = queries["q9_product_type_profit"](spark, SF_DIR)
    assert I.broadcast_join_count(df) >= 3


def test_q7_dual_role_dimension_broadcast(spark, queries):
    """q7 joins nation twice under different roles; both must broadcast."""
    df = queries["q7_volume_shipping"](spark, SF_DIR)
    assert I.broadcast_join_count(df) >= 4


def test_iceberg_partition_filter_scans_only_matching_files(spark, tmp_path):
    """Partitioned Iceberg export: a partition-filtered read must plan a
    scan over ONLY the matching partition's data files — the manifest
    tuples prune the file list before Spark ever sees it.  At 100 TB
    this is the difference between reading one date and the whole
    table."""
    from pg_mooncake_spark.sources.iceberg import read_iceberg, write_iceberg

    df = spark.range(300).selectExpr(
        "id AS k",
        "CASE WHEN id % 4 = 0 THEN 'hot' ELSE 'cold' END AS tier",
        "CAST(id AS DOUBLE) AS x",
    )
    path = str(tmp_path / "ice_prune")
    write_iceberg(df.repartition(4), path, partition_by=["tier"])

    pruned = read_iceberg(spark, path, partition_filter={"tier": "hot"})
    full = read_iceberg(spark, path)
    assert pruned.count() == 75
    scanned, total = pruned.inputFiles(), full.inputFiles()
    assert scanned and all("__p_tier=hot" in f for f in scanned)
    assert len(scanned) < len(total), "pruning must cut the file list"


def test_ann_index_probe_partition_pruned(spark, tmp_path):
    """The persisted LSH index must make a probe a partition-pruned scan:
    the file scan reads ONLY the query's bucket directory (and the
    results match the unindexed bucket scan exactly)."""
    from pg_mooncake_spark.operators import similarity as S
    from pg_mooncake_spark.queries.registry import t

    e = t(spark, SF_DIR, "embeddings")
    qvec = [float(x) for x in e.filter("vec_id = 0").first()["embedding"]]
    path = str(tmp_path / "annidx")
    S.build_lsh_index(e, path, planes=6)

    probe = S.ann_lsh_probe_indexed(spark, path, qvec, k=10, planes=6)
    txt = I.plan_text(probe)
    # partition pruning is visible as a PartitionFilters entry on bucket
    m = __import__("re").search(r"PartitionFilters: \[([^\]]*)\]", txt)
    assert m and "bucket" in m.group(1), txt
    # and the scan must select a single partition of the 2^6 possible
    import re as _re

    sel = _re.search(r"partitions read: (\d+)", txt)
    if sel:  # Spark prints this in formatted scan details
        assert int(sel.group(1)) == 1, txt

    got = [(r["vec_id"], r["cos"]) for r in probe.collect()]
    want = [
        (r["vec_id"], r["cos"])
        for r in S.ann_lsh_topk(e, qvec, k=10, planes=6).collect()
    ]
    assert got == want


def test_ivf_index_probe_partition_pruned(spark, tmp_path):
    from pg_mooncake_spark.operators import similarity as S
    from pg_mooncake_spark.queries.registry import t

    e = t(spark, SF_DIR, "embeddings")
    cents = S.seed_centroids(e, nlist=8)
    qvec = [float(x) for x in e.filter("vec_id = 0").first()["embedding"]]
    path = str(tmp_path / "ivfidx")
    S.build_ivf_index(e, path, cents)
    probe = S.ann_ivf_probe_indexed(spark, path, qvec, cents, k=10, nprobe=2)
    txt = I.plan_text(probe)
    m = __import__("re").search(r"PartitionFilters: \[([^\]]*)\]", txt)
    assert m and "ivf_list" in m.group(1), txt
    got = [(r["vec_id"], r["cos"]) for r in probe.collect()]
    want = [
        (r["vec_id"], r["cos"])
        for r in S.ann_ivf_topk(e, qvec, cents, k=10, nprobe=2).collect()
    ]
    assert got == want


def test_text_profile_is_map_only(spark):
    """The full text profile must compile to a shuffle-free plan (struct
    fold + generator barrier) — embarrassingly parallel at any scale."""
    from pg_mooncake_spark.operators.text import text_profile

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert I.exchange_count(text_profile(d, "text", "doc_id")) == 0


def test_delta_dv_scan_uses_broadcast_anti_join(spark, tmp_path):
    """DV-applying reads must drop deleted positions via a broadcast
    anti-join (bitmap side is tiny) — a sort-merge join here would
    shuffle the full table by (file, position) at 100 TB."""
    from pg_mooncake_spark.sources.delta import (
        delete_where_dv,
        read_delta,
        write_delta,
    )

    path = str(tmp_path / "dvplan")
    write_delta(
        spark.range(1000).selectExpr("id AS k", "concat('v', id) AS v"), path
    )
    delete_where_dv(spark, path, "k % 100 = 0")
    df = read_delta(spark, path)
    assert I.broadcast_join_count(df) >= 1
    assert I.sortmerge_join_count(df) == 0
    assert df.count() == 990


def test_iceberg_positional_delete_scan_stays_broadcast(spark, tmp_path):
    """The Iceberg merge-on-read scan's delete application must also be
    broadcast-side only."""
    import os

    from tests.test_sources import (
        _add_delete_snapshot,
        _stage_iceberg_manifest_table,
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pg_mooncake_spark.sources.iceberg import read_iceberg

    root = _stage_iceberg_manifest_table(tmp_path)
    fc = _add_delete_snapshot(
        root, "pdel.parquet", [{"file_path": "", "pos": 0}], content=1
    )
    pq.write_table(
        pa.Table.from_pylist([{"file_path": fc, "pos": 0}]),
        os.path.join(root, "data", "pdel.parquet"),
    )
    df = read_iceberg(spark, root)
    assert I.broadcast_join_count(df) >= 1
    assert I.sortmerge_join_count(df) == 0


def test_range_join_never_nested_loop(spark, queries):
    """The bin-bucketed range join must compile to an equi-join (hash or
    broadcast-hash on the bucket id) with the BETWEEN as residual — a
    BroadcastNestedLoopJoin or CartesianProduct means the bucketing
    collapsed and every fact would compare against every interval."""
    df = queries["events_range_join"](spark, SF_DIR)
    plan = I.plan_text(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert (I.broadcast_join_count(df) + I.sortmerge_join_count(df)) >= 1 or (
        "ShuffledHashJoin" in plan
    )


def test_dv_delete_probe_pushes_predicate_to_scan(spark, tmp_path):
    """The DELETE/UPDATE probe's predicate must reach the parquet scan
    as a pushed filter — at 100 TB a probe that reads every row and
    filters post-scan turns a 0.1% DELETE into a full-table decode."""
    import os

    from pg_mooncake_spark.sources.delta import _replay, write_delta

    path = str(tmp_path / "probeplan")
    write_delta(
        spark.range(1000).selectExpr("id AS k", "concat('v', id) AS v"), path
    )
    adds, schema, partition_cols, _ = _replay(path)
    # the probe's scan shape (delta._probe_dv_blobs builds exactly this)
    probe = (
        spark.read.schema(schema)
        .parquet(*[os.path.join(path, a["path"]) for a in adds])
        .select(
            "*",
            F.col("_metadata.file_path").alias("__dv_fp"),
            F.col("_metadata.row_index").alias("__dv_pos"),
        )
        .where("k % 100 = 0")
    )
    assert any("k" in f for f in I.pushed_filters(probe)), (
        f"predicate not pushed: {I.pushed_filters(probe)}"
    )


def test_iceberg_delete_probe_and_eq_write_stay_broadcast(spark, tmp_path):
    """delete_where_iceberg's probe anti-join (existing deletes) and the
    read path after an equality-delete write must both apply deletes via
    broadcast joins — never a shuffle of the data by join key."""
    from pg_mooncake_spark.sources.iceberg import (
        delete_keys_iceberg,
        delete_where_iceberg,
        read_iceberg,
        write_iceberg,
    )

    path = str(tmp_path / "iceplan")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(1000)], "k bigint, v string"
    )
    write_iceberg(df, path)
    delete_where_iceberg(spark, path, "k % 100 = 0")
    keys = spark.createDataFrame([(7,), (13,)], "k bigint")
    delete_keys_iceberg(spark, path, keys)

    out = read_iceberg(spark, path)
    assert I.broadcast_join_count(out) >= 2  # positional + equality
    assert I.sortmerge_join_count(out) == 0
    assert out.count() == 988

def test_range_filter_predicate_pushes_to_parquet_scan(spark, tmp_path):
    """range_filter does BOTH levels of skipping: the file list shrinks
    via manifest/add stats (asserted in test_sources), and the exact
    BETWEEN predicate lands in the parquet scan's PushedFilters so kept
    files also skip non-matching row groups."""
    from pg_mooncake_spark.plans.inspect import pushed_filters
    from pg_mooncake_spark.sources.delta import (
        compact_delta,
        read_delta,
        write_delta,
    )
    from pg_mooncake_spark.sources.iceberg import (
        compact_iceberg,
        read_iceberg,
        write_iceberg,
    )

    df = spark.range(500).selectExpr(
        "CAST(pmod(id * 7919, 500) AS LONG) AS k", "CAST(id AS DOUBLE) AS x"
    )

    ipath = str(tmp_path / "ice_push")
    write_iceberg(df.repartition(4), ipath)
    compact_iceberg(spark, ipath, target_files=4, sort_by=["k"])
    ice = read_iceberg(spark, ipath, range_filter={"k": (100, 199)})
    pf = " ".join(pushed_filters(ice))
    assert "GreaterThanOrEqual(k" in pf and "LessThanOrEqual(k" in pf

    dpath = str(tmp_path / "dl_push")
    write_delta(df.repartition(4), dpath)
    compact_delta(spark, dpath, target_files=4, sort_by=["k"])
    dl = read_delta(spark, dpath, range_filter={"k": (100, 199)})
    pf = " ".join(pushed_filters(dl))
    assert "GreaterThanOrEqual(k" in pf and "LessThanOrEqual(k" in pf


def test_change_feed_read_is_shuffle_free(spark, tmp_path):
    """changes() is scans + a broadcast of the tiny file→version map:
    no shuffle exchange anywhere — at 100 TB the feed read costs the
    same as scanning the change files themselves."""
    from pg_mooncake_spark.plans.inspect import (
        broadcast_join_count,
        exchange_count,
    )
    from pg_mooncake_spark.storage import MoonTable

    from pyspark.sql import types as T

    mt = MoonTable(spark, str(tmp_path / "t"))
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    mt.create(schema, primary_key=["id"], change_feed=True)
    mt.append(spark.createDataFrame([(1, "a"), (2, "b")], schema))
    mt.update_where("id = 1", {"v": "'A'"})
    feed = mt.changes()
    assert feed.count() == 4
    assert exchange_count(feed) == 0
    assert broadcast_join_count(feed) >= 1


def test_mv_delta_aggregation_single_shuffle(spark, tmp_path):
    """The refresh's delta aggregation shuffles ONCE (on the group
    keys) over the O(batch) change feed — partial aggregation happens
    map-side before the exchange."""
    from pg_mooncake_spark.plans.inspect import exchange_count
    from pg_mooncake_spark.storage import CHANGE_TYPE_COL, MoonTable

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    mt = MoonTable(spark, str(tmp_path / "t"))
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("g", T.StringType(), True),
            T.StructField("x", T.DoubleType(), True),
        ]
    )
    mt.create(schema, primary_key=["id"], change_feed=True)
    mt.append(
        spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], schema)
    )
    mt.delete_where("id = 1")
    ch = mt.changes()
    sign = F.when(
        F.col(CHANGE_TYPE_COL).isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    deltas = ch.groupBy("g").agg(
        F.sum(sign).alias("d_rows"),
        F.sum(F.when(F.col("x").isNotNull(), sign * F.col("x"))).alias("d_x"),
    )
    assert exchange_count(deltas) == 1


def test_feed_as_ops_is_narrow(spark, tmp_path):
    """The feed→CDC-batch conversion adds no exchange: chaining mirrors
    costs exactly the downstream merge, nothing in between."""
    from pg_mooncake_spark.plans.inspect import exchange_count
    from pg_mooncake_spark.storage import MoonTable
    from pg_mooncake_spark.streaming.cdc import feed_as_ops

    from pyspark.sql import types as T

    mt = MoonTable(spark, str(tmp_path / "t"))
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    mt.create(schema, primary_key=["id"], change_feed="full")
    mt.append(spark.createDataFrame([(1, "a")], schema))
    import os

    stream_schema = T.StructType(
        list(schema.fields)
        + [
            T.StructField("_change_type", T.StringType(), True),
            T.StructField("_commit_version", T.LongType(), True),
        ]
    )
    batch_feed = spark.read.schema(stream_schema).parquet(
        os.path.join(mt.path, "_changes")
    )
    ops = feed_as_ops(batch_feed)
    assert exchange_count(ops) == 0
    assert ops.count() == 1


def test_char_class_entropy_is_map_only(spark):
    """Class entropy is five regexp passes + arithmetic inside codegen —
    zero exchanges (round 12)."""
    from pg_mooncake_spark.operators.text import char_class_entropy
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = d.select("doc_id", char_class_entropy(F.col("text")).alias("h"))
    assert I.exchange_count(df) == 0


def test_ngram_surprisal_model_is_equi_join(spark):
    """The surprisal model lookup must be an equi-join on the gram —
    never a nested-loop/cartesian (the one-row total broadcast is the
    only cross join)."""
    from pg_mooncake_spark.operators.text import ngram_surprisal

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    txt = I.plan_text(ngram_surprisal(d, "text", "doc_id"))
    assert "CartesianProduct" not in txt
    rows = ngram_surprisal(d.limit(50), "text", "doc_id").collect()
    assert rows and all(r.avg_surprisal >= 0 for r in rows)


def test_quality_buckets_no_global_sort_window(spark):
    """Bucketing is threshold-based (one 1-row stats broadcast), NOT a
    global NTILE — no single-partition window sort anywhere in the plan
    (round 12)."""
    from pg_mooncake_spark.queries.llm import text_quality_buckets

    df = text_quality_buckets(spark, SF_DIR)
    txt = I.plan_text(df)
    assert "Window" not in txt
    assert "CartesianProduct" not in txt  # stats ride a broadcast


def test_cluster_sample_single_cap_shuffle(spark):
    """The per-cluster cap is the only wide stage after assignment:
    centroid assignment is a broadcast-literal projection (no join),
    and the window hashes on the cluster id."""
    from pg_mooncake_spark.operators.corpus import cap_per_group
    from pg_mooncake_spark.operators.similarity import (
        ivf_assign, kmeans_centroids,
    )

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = kmeans_centroids(e, nlist=4, iters=1)
    assigned = ivf_assign(e, cents).select("vec_id", "ivf_list")
    assert I.exchange_count(assigned) == 0  # pure projection
    kept = cap_per_group(assigned, "ivf_list", "vec_id", cap=5, seed=0)
    assert I.exchange_count(kept) == 1
    assert "hashpartitioning(ivf_list" in I.plan_text(kept)


def test_minhash_index_probe_prunes_partitions(spark, tmp_path):
    """The persisted-index probe must be a broadcast equi-join whose
    index scan carries a dynamic-partition-pruning filter on the shard
    directory column — the corpus is read partially, never reshuffled
    (round 12)."""
    from pg_mooncake_spark.operators.dedup import (
        build_minhash_index, probe_minhash_index,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = d.filter("doc_id % 10 != 0")
    batch = d.filter("doc_id % 10 = 0").limit(20)
    path = str(tmp_path / "mh_index")
    build_minhash_index(corpus, path, "text", "doc_id")
    res = probe_minhash_index(spark, path, batch, "text", "doc_id")
    txt = I.plan_text(res)
    assert "dynamicpruning" in txt.lower()
    assert "BroadcastHashJoin" in txt
    assert "SortMergeJoin" not in txt
    res.collect()  # executes end-to-end


def test_minhash_index_extend_is_append(spark, tmp_path):
    """extend_minhash_index appends O(batch) band rows; a probe then
    sees both generations."""
    from pg_mooncake_spark.operators.dedup import (
        build_minhash_index, extend_minhash_index, probe_minhash_index,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    build_minhash_index(
        d.filter("doc_id < 100"), str(tmp_path / "ix"), "text", "doc_id"
    )
    extend_minhash_index(
        d.filter("doc_id >= 100 AND doc_id < 200"),
        str(tmp_path / "ix"), "text", "doc_id",
    )
    # probe an indexed doc's own text under a fresh id: must match its
    # original from EACH generation's id range it duplicates
    probe = d.filter("doc_id = 150").select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    )
    hits = probe_minhash_index(
        spark, str(tmp_path / "ix"), probe, "text", "doc_id", threshold=0.99
    ).collect()
    assert any(r.corpus_id == 150 for r in hits)


def test_cobucketed_join_has_zero_exchanges(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts must
    sort-merge join with NO exchange on either side (and no sort when
    written sortBy the key) — the repeated fact-join shuffle eliminated
    at write time (round 12)."""
    from pg_mooncake_spark.operators.bucketing import (
        cobucketed_join, write_bucketed,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    write_bucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "b_orders", ["o_custkey"], 8, sort_cols=["o_custkey"],
    )
    write_bucketed(
        cust.select(F.col("c_custkey").alias("o_custkey"), "c_acctbal"),
        "b_cust", ["o_custkey"], 8, sort_cols=["o_custkey"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cobucketed_join(spark, "b_orders", "b_cust", "o_custkey")
        txt = I.plan_text(j)
        assert I.exchange_count(j) == 0, txt
        assert "SortMergeJoin" in txt
        n = j.count()
        # identical result to the plain (shuffled) join
        plain = orders.join(
            cust.select(F.col("c_custkey").alias("o_custkey")), "o_custkey"
        ).count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")


def test_sorted_mirror_prunes_file_list(spark, tmp_path):
    """optimize_table('sort:<col>') must turn a range predicate on the
    clustered column into PLANNER-side file-list pruning via the
    commit-log min/max stats (reference contract: file statistics &
    skipping, reference CHANGELOG.md:26).  At 100 TB a one-year q6-style
    predicate over a 7-year table must plan ~1/7 of the files, not all
    of them."""
    from pg_mooncake_spark.engine import MooncakeEngine

    eng = MooncakeEngine(spark, str(tmp_path / "wh"))
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    eng.create_table(
        "li_sorted", source_df=li, primary_key=["l_orderkey", "l_linenumber"]
    )
    mt = eng._moontable("li_sorted")
    v = mt.optimize(target_partitions=16, sort_by=["l_shipdate"])
    eng.catalog.update_watermarks("li_sorted", flush_version=v)
    mt = eng._moontable("li_sorted")
    total = len(mt.read().inputFiles())
    assert total >= 8  # enough granularity for the claim to mean anything
    w = (
        "l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND "
        "l_shipdate < TIMESTAMP '1997-01-01 00:00:00' AND "
        "l_quantity < 24"  # un-statted conjunct: skipped, not a bail-out
    )
    pruned = eng.table("li_sorted", where=w)
    frac = len(pruned.inputFiles()) / total
    assert frac <= 0.5, (
        f"sorted mirror read {frac:.0%} of files for a ~1/7 range"
    )
    # pruning is sound: identical rows to the plain filtered scan
    assert pruned.count() == mt.read().filter(w).count()
    # the un-sorted table gives no file pruning on this predicate
    eng.create_table(
        "li_plain", source_df=li, primary_key=["l_orderkey", "l_linenumber"]
    )
    mt2 = eng._moontable("li_plain")
    v2 = mt2.optimize(target_partitions=16)
    eng.catalog.update_watermarks("li_plain", flush_version=v2)
    mt2 = eng._moontable("li_plain")
    plain = eng.table("li_plain", where=w)
    assert len(plain.inputFiles()) == len(mt2.read().inputFiles())


def test_zorder_mirror_prunes_on_second_column(spark, tmp_path):
    """zorder clustering bounds EVERY listed column's per-file range, so
    a predicate on the non-leading column still prunes files — the
    property plain sort cannot give."""
    from pg_mooncake_spark.engine import MooncakeEngine

    eng = MooncakeEngine(spark, str(tmp_path / "whz"))
    df = spark.range(40_000).selectExpr(
        "id AS k", "CAST(id % 200 AS INT) AS a",
        "CAST(pmod(hash(id), 200) AS INT) AS b",
    )
    eng.create_table("zt", source_df=df, primary_key=["k"])
    mt = eng._moontable("zt")
    vz = mt.optimize(target_partitions=16, zorder_by=["a", "b"])
    eng.catalog.update_watermarks("zt", flush_version=vz)
    mt = eng._moontable("zt")
    total = len(mt.read().inputFiles())
    assert total >= 8
    for col in ("a", "b"):
        w = f"{col} >= 10 AND {col} < 20"  # 5% range
        pruned = eng.table("zt", where=w)
        frac = len(pruned.inputFiles()) / total
        assert frac <= 0.75, f"zorder should prune on {col}: {frac:.0%}"
        assert pruned.count() == mt.read().filter(w).count()


def test_sorted_mirror_dml_rewrites_touched_files_only(spark, tmp_path):
    """Clustering stats serve WRITES too: a range-predicate DELETE on a
    sort-clustered mirror must rewrite only the stat-admitted files —
    at 100 TB a one-month retention delete rewrites that month, never
    the table (the copy-on-write analog of the read-side pruning)."""
    from pg_mooncake_spark.engine import MooncakeEngine

    eng = MooncakeEngine(spark, str(tmp_path / "whd"))
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    eng.create_table(
        "li_dml", source_df=li, primary_key=["l_orderkey", "l_linenumber"]
    )
    mt = eng._moontable("li_dml")
    v = mt.optimize(target_partitions=16, sort_by=["l_shipdate"])
    eng.catalog.update_watermarks("li_dml", flush_version=v)
    mt = eng._moontable("li_dml")
    before = {f.split("/")[-1] for f in mt.read().inputFiles()}
    n_before = mt.read().count()
    w = (
        "l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND "
        "l_shipdate < TIMESTAMP '1997-01-01 00:00:00'"
    )
    n_del = mt.read().filter(w).count()
    eng.delete_where("li_dml", w)
    mt = eng._moontable("li_dml")
    after = {f.split("/")[-1] for f in mt.read().inputFiles()}
    survivors = before & after
    # most files were untouched by name: only the stat-admitted range
    # was rewritten (16 range-disjoint files, a ~1/7 predicate)
    assert len(survivors) >= len(before) // 2, (len(before), len(after))
    assert mt.read().count() == n_before - n_del
    assert mt.read().filter(w).count() == 0


def test_copy_stdout_csv_header_no_shuffle(spark, tmp_path):
    """COPY ... TO STDOUT WITH (FORMAT csv, HEADER) must not shuffle:
    the header is a 1-row leading union partition, not an orderBy over
    the whole payload (VERDICT r14 wrong #3).  At 100 TB the old sort
    exchanged the entire stream to place one line."""
    from pg_mooncake_spark.engine import MooncakeEngine

    eng = MooncakeEngine(spark, str(tmp_path / "whc"))
    eng.sql("CREATE TABLE cs (k int PRIMARY KEY, v text)")
    eng.sql("INSERT INTO cs VALUES (1, 'a'), (2, 'b')")
    out = eng.sql("COPY cs TO STDOUT WITH (FORMAT csv, HEADER true)")
    assert I.exchange_count(out) == 0
    lines = [r["copy_line"] for r in out.collect()]
    assert lines[0] == "k,v"
    assert sorted(lines[1:]) == ["1,a", "2,b"]


def test_codegen_count_immune_to_prior_explain(spark, queries):
    """codegen_span_count must not be poisoned by an earlier formatted
    explain: a Dataset memoizes its AQE QueryExecution, so without a
    fresh execution the count reads 0 and a plan pin silently asserts
    the wrong thing (round-15 audit regression)."""
    df = queries["q1_pricing_summary"](spark, SF_DIR)
    fresh = I.codegen_span_count(df)
    assert fresh >= 1
    I.plan_text(df)  # memoizes the adaptive execution
    assert I.codegen_span_count(df) == fresh
