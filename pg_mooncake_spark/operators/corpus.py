"""Corpus-construction operators for training-data pipelines: reproducible
sampling, sequence packing, and token-window chunking (SURVEY.md §2.C
extension surface — the steps between "deduped documents" and "training
batches").

Design rules shared with the dedup/similarity operators:
- deterministic: every operator is a pure function of (row, parameters) —
  re-running a 100 TB job reproduces the same sample/packing bit-for-bit,
  and a DuckDB oracle can verify it (no Spark-specific RNG);
- JVM-side only: md5/conv/window/slice built-ins, no Python in the path;
- one shuffle max: sampling is a pure filter (no shuffle), stratified
  sampling and packing shuffle once on their partition key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# ------------------------------------------------------------- sampling


def hash_fraction(col: Column, seed: int = 0) -> Column:
    """Deterministic uniform fraction in [0, 1) from a key column.

    First 8 hex chars of md5(key || '#seed') scaled by 16^8 — engine-
    independent (DuckDB reproduces it exactly), uniform enough for
    sampling, and stable across runs/cluster sizes, which Spark's
    ``rand(seed)`` is NOT (row order dependence).
    """
    h = F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(f"#{seed}"))), 1, 8),
        16,
        10,
    ).cast("double")
    return h / F.lit(float(16**8))


def sample_deterministic(
    df: DataFrame, id_col: str, rate: float, seed: int = 0
) -> DataFrame:
    """Reproducible Bernoulli(rate) sample keyed on ``id_col``.

    A pure filter: no shuffle, fully pushdown-friendly, and the same ids
    are kept no matter how the data is partitioned — the property that
    makes train/validation splits stable across pipeline re-runs.
    """
    return df.filter(hash_fraction(F.col(id_col), seed) < rate)


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    n_per_stratum: int,
    seed: int = 0,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen by deterministic hash order — balanced subsets (e.g.
    per-language quotas) that survive re-runs.

    One shuffle on the stratum key; row_number over (hash, id) picks the
    same winners regardless of physical row order.
    """
    w = W.partitionBy(strata_col).orderBy(
        hash_fraction(F.col(id_col), seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def mix_corpora(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: dict[str, float],
    seed: int = 0,
) -> DataFrame:
    """Deterministic data mixture: keep each source's rows at its weight
    (Bernoulli on the id hash), tagged with a reproducible ``mix_order``
    for downstream interleaving.  Sources absent from ``weights`` are
    dropped (weight 0).

    The standard pretraining-mixture step ("2 parts web, 1 part code,
    0.1 part forums").  Weights ≤ 1 downsample (pure filter, no
    shuffle); weights > 1 upsample: every row gets ``floor(w)`` copies
    plus one more with probability ``frac(w)`` — an explicit explode
    with a ``copy_idx`` column, so duplication is visible downstream,
    never silent.  Stable under re-runs and re-partitioning either way.
    """
    if not weights:
        raise ValueError("weights must name at least one source")
    frac = hash_fraction(F.col(id_col), seed)
    n_copies = None
    for src, w in weights.items():
        w = float(w)
        whole, part = int(w), w - int(w)
        expr = F.lit(whole) + F.when(frac < part, 1).otherwise(0)
        n_copies = (
            F.when(F.col(source_col) == F.lit(src), expr)
            if n_copies is None
            else n_copies.when(F.col(source_col) == F.lit(src), expr)
        )
    n_copies = n_copies.otherwise(F.lit(0))
    out = (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__n")
    )
    # per-(id, copy) order so upsampled copies interleave, not cluster
    return out.withColumn(
        "mix_order",
        hash_fraction(
            F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col("copy_idx")),
            seed + 1,
        ),
    )


# -------------------------------------------------------------- packing


def pack_sequences(
    df: DataFrame,
    id_col: str,
    length_col: str,
    capacity: int,
    shards: int = 64,
) -> DataFrame:
    """Assign documents to ~``capacity``-token training bins.

    Capacity-quantized packing: within a deterministic hash shard,
    documents are laid end-to-end in id order and the bin index is the
    capacity quantile of each document's *starting* offset —
    ``bin = floor(exclusive_cumsum(length) / capacity)``.  A document
    straddling a boundary belongs to the bin where it starts (bins can
    overrun by < one document; the tokenizer-side truncation handles the
    tail — the standard fluid-packing approximation, chosen because exact
    next-fit is a sequential fold that cannot scale out).

    Scale: one shuffle on the shard key, one window pass per shard —
    shards bound both skew and window state at 100 TB.

    Output: id, shard, bin index, starting offset inside the bin.
    """
    # md5-derived shard (not xxhash64) so a DuckDB oracle reproduces it
    shard = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit("#shard"))), 1, 8),
            16,
            10,
        ).cast("bigint"),
        F.lit(shards),
    ).alias("shard")
    w = (
        W.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    start = (F.sum(length_col).over(w) - F.col(length_col)).alias("__start")
    return (
        df.select(F.col(id_col), F.col(length_col), shard)
        .select(
            id_col,
            length_col,
            "shard",
            F.floor(start / capacity).cast("bigint").alias("bin_idx"),
            F.pmod(start, F.lit(capacity)).cast("bigint").alias("bin_offset"),
        )
    )


# ------------------------------------------------------------- chunking


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into token windows of ``chunk_tokens`` with
    ``overlap`` tokens carried between consecutive chunks.

    chunk i covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the last chunk is short rather than
    padded.  Pure per-row explode (tokenize once, slice per chunk) — no
    shuffle, linear output size, the standard pre-embedding step.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # ceil((n - overlap) / stride) chunks, minimum 1 for non-empty docs
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / stride).cast("int"), F.lit(1)
    )
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.concat_ws(
                " ", F.slice("__toks", F.col("chunk_idx") * stride + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens),
                F.size("__toks") - F.col("chunk_idx") * stride,
            ).cast("bigint").alias("n_tokens"),
        )
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_k: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: drop training documents that share at
    least ``min_hits`` distinct word ``ngram_k``-grams with ANY benchmark
    document — the standard pretraining hygiene step that stops eval-set
    text from leaking into the training corpus.

    Scale shape: the benchmark n-gram set is small (eval suites are
    thousands of documents) and broadcasts; the training side is a
    map-only shingle explode + broadcast semi-join + per-doc count —
    training text itself never shuffles, so this runs at corpus scale
    as one pass.  8-grams are the community convention (long enough that
    natural collisions are rare, short enough to catch partial copies).
    """
    from pg_mooncake_spark.operators.dedup import word_shingles

    bench_grams = (
        benchmark.select(
            F.explode(word_shingles(F.col(text_col), ngram_k)).alias("g")
        ).distinct()
    )
    train_grams = train.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), ngram_k)).alias("g")
    )
    contaminated = (
        train_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count_distinct("g").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
        .select(id_col)
    )
    return train.join(contaminated, id_col, "left_anti")


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    seed: int = 0,
) -> DataFrame:
    """Cap each group's contribution at ``cap`` rows — domain/source
    capping, the standard guard against one crawl domain dominating a
    pretraining mix.

    Selection is deterministic hash order (md5-fraction of the id, tie
    broken by id), not arbitrary ``LIMIT``: the same rows survive at any
    parallelism, and the kept subset is an unbiased per-group sample
    rather than whatever physical order the scan produced.

    Scale: one shuffle (window partitioned by ``group_col``); state per
    group during the rank is O(1) — rows stream through the window sort.
    A pathologically hot group bounds a single task at that group's row
    count; for that regime pre-filter with ``sample_deterministic`` at a
    rate that brings the hot group near ``cap`` before ranking.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_fraction(F.col(id_col), seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def shard_assignment(
    df: DataFrame, id_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Deterministic output sharding for a training corpus:
    ``shard = floor(hash_fraction(id) * n_shards)`` — the write-layout
    step after filtering/dedup/mixing, so a 100 TB corpus lands in N
    stable, statistically balanced output shards.

    A pure projection (no shuffle here; the WRITE repartitions on the
    shard column), and the same id maps to the same shard at any
    parallelism or row order — re-runs produce identical shard
    membership, which downstream training-data bookkeeping relies on."""
    return df.withColumn(
        "shard",
        F.floor(hash_fraction(F.col(id_col), seed) * n_shards).cast("int"),
    )
