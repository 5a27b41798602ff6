"""Similarity search over embedding columns (array<float>).

SURVEY.md §2.C extension surface: brute-force cosine top-k as the exact
baseline, plus two sub-linear scale paths — random-hyperplane LSH buckets
and an IVF-style partitioned index.

Scale design (10⁹+ vectors):
- the query vector is a literal (broadcast into codegen) — scoring is a
  single scan, no shuffle, no Python;
- LSH: bucket id is computed per-row at write time (or on the fly); a
  top-k probe touches only matching-bucket partitions — if the table is
  physically partitioned by bucket this is partition pruning;
- IVF: assign each vector to its nearest centroid (nlist lists); a probe
  scores only nprobe lists.  Centroids come from `seed_centroids` (k
  deterministic seeds) — swap in real k-means at production scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pg_mooncake_spark.functions import cosine, dot, l2_norm


def _vec_lit(vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity.

    One pass over the table; the ORDER BY ... LIMIT k compiles to Spark's
    TakeOrderedAndProject — per-partition heaps, only k rows reach the
    driver-side merge (no global sort shuffle).
    """
    q = _vec_lit(query_vec)
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
    )


def hyperplane_weight(plane: Column | int, dim: Column | int) -> Column:
    """Deterministic pseudo-random hyperplane weight in [-1, 1).

    w(p, i) = ((p*73856093 + i*19349663) mod 2000003) / 1000001.5 - 1
    Pure integer arithmetic → bit-identical in any engine (oracle-safe).
    """
    p = F.lit(plane) if isinstance(plane, int) else plane
    i = F.lit(dim) if isinstance(dim, int) else dim
    m = (p * F.lit(73856093) + i * F.lit(19349663)) % F.lit(2000003)
    return m.cast("double") / F.lit(1000001.5) - F.lit(1.0)


def lsh_bucket(vec: Column, planes: int = 8) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane.

    projection_p = Σ_i w(p,i)·x_i via zip_with-with-index + aggregate —
    all JVM higher-order functions.
    """
    dims = F.sequence(F.lit(1), F.size(vec))
    def proj(p: int) -> Column:
        prods = F.zip_with(
            vec,
            dims,
            lambda x, i: x.cast("double") * hyperplane_weight(p, i),
        )
        return F.aggregate(prods, F.lit(0.0), lambda a, b: a + b)

    return F.concat_ws(
        "", *[F.when(proj(p) >= 0, "1").otherwise("0") for p in range(planes)]
    )


def ann_lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.

    Recall/latency trades on ``planes`` (more planes → smaller buckets).
    Scale path: persist ``bucket`` as a physical partition column so the
    probe is a partition-pruned scan.
    """
    import math

    qb = _query_bucket(query_vec, planes)
    q = _vec_lit(query_vec)
    return (
        df.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
        .filter(F.col("bucket") == qb)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
    )


def build_lsh_index(
    df: DataFrame,
    path: str,
    planes: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """ANN build step: persist vectors with their LSH bucket as a
    *physical partition column* (one directory per bucket).

    This is what makes the probe sub-linear on disk, not just on CPU: a
    probe filtering on ``bucket`` compiles to a partition-pruned scan that
    never opens non-matching buckets' files (asserted by
    tests/test_plans.py).  2^planes partitions; at 10⁹+ vectors pick
    planes so each bucket is a few hundred MB."""
    # 'b' prefix keeps partition-value type inference from reading the
    # bit string "010110" back as the integer 10110
    (
        df.select(
            F.col(id_col),
            F.col(vec_col),
            F.concat(F.lit("b"), lsh_bucket(F.col(vec_col), planes)).alias("bucket"),
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def ann_lsh_probe_indexed(
    spark,
    path: str,
    query_vec: Sequence[float],
    k: int = 10,
    planes: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe a :func:`build_lsh_index` table: partition-pruned scan of the
    query's bucket directory only, then exact cosine top-k inside it."""
    qb = "b" + _query_bucket(query_vec, planes)
    q = _vec_lit(query_vec)
    return (
        spark.read.parquet(path)
        .filter(F.col("bucket") == qb)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
    )


def build_ivf_index(
    df: DataFrame,
    path: str,
    centroids: list[Sequence[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """IVF build step: persist vectors partitioned by inverted list."""
    (
        ivf_assign(df, centroids, vec_col)
        .select(F.col(id_col), F.col(vec_col), F.col("ivf_list"))
        .write.mode("overwrite")
        .partitionBy("ivf_list")
        .parquet(path)
    )


def ann_ivf_probe_indexed(
    spark,
    path: str,
    query_vec: Sequence[float],
    centroids: list[Sequence[float]],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe a :func:`build_ivf_index` table: scan only the ``nprobe``
    nearest lists' partitions."""
    import numpy as np

    qv = np.asarray(query_vec, dtype="float64")

    def cos_np(c):
        c = np.asarray(c, dtype="float64")
        return float(qv @ c / (np.linalg.norm(qv) * np.linalg.norm(c)))

    order = sorted(range(len(centroids)), key=lambda i: -cos_np(centroids[i]))
    probe = order[:nprobe]
    q = _vec_lit(query_vec)
    return (
        spark.read.parquet(path)
        .filter(F.col("ivf_list").isin(probe))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
    )


def _query_bucket(query_vec: Sequence[float], planes: int) -> str:
    """Driver-side bucket of the query vector (same arithmetic as
    hyperplane_weight — kept in exact int/float steps)."""
    bits = []
    for p in range(planes):
        s = 0.0
        for i, x in enumerate(query_vec, start=1):
            m = (p * 73856093 + i * 19349663) % 2000003
            s += float(x) * (m / 1000001.5 - 1.0)
        bits.append("1" if s >= 0 else "0")
    return "".join(bits)


def ivf_assign(
    df: DataFrame,
    centroids: list[Sequence[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine) — the IVF
    build step.  Centroid list is tiny → a literal array-of-arrays in the
    plan (broadcast by construction)."""
    cents = F.array(*[_vec_lit(c) for c in centroids])
    v = F.col(vec_col).cast("array<double>")
    sims = F.transform(cents, lambda c: dot(v, c) / (l2_norm(v) * l2_norm(c)))
    best = F.array_position(sims, F.array_max(sims)).cast("int") - 1
    return df.withColumn("ivf_list", best)


def _cos_seq(a: Sequence[float], b: Sequence[float]) -> float:
    """Sequential-fold cosine — the same left-to-right double arithmetic
    as functions.dot/l2_norm (and the DuckDB list_reduce replay), so
    driver-side centroid ranking is bit-identical to the oracle's.
    (numpy's pairwise/BLAS summation could rank near-tied centroids
    differently.)"""
    import math

    d = na = nb = 0.0
    for x, y in zip(a, b):
        d += float(x) * float(y)
    for x in a:
        na += float(x) * float(x)
    for y in b:
        nb += float(y) * float(y)
    return d / (math.sqrt(na) * math.sqrt(nb))


def ann_ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    centroids: list[Sequence[float]],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF probe: rank centroids by cosine to the query, scan only the
    ``nprobe`` nearest inverted lists, exact-rank within them."""
    order = sorted(
        range(len(centroids)), key=lambda i: -_cos_seq(query_vec, centroids[i])
    )
    probe = order[:nprobe]
    q = _vec_lit(query_vec)
    return (
        ivf_assign(df, centroids, vec_col)
        .filter(F.col("ivf_list").isin(probe))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
    )


def seed_centroids(
    df: DataFrame, nlist: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> list[list[float]]:
    """Deterministic centroid seeds: the nlist lowest-id vectors."""
    rows = df.orderBy(id_col).limit(nlist).select(vec_col).collect()
    return [[float(x) for x in r[0]] for r in rows]


def kmeans_centroids(
    df: DataFrame,
    nlist: int,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Distributed Lloyd k-means with DETERMINISTIC fixed-point means.

    Each iteration is one Spark job: assign every vector to its nearest
    centroid (broadcast literal centroids, JVM-side cosine), then update
    each centroid dimension as

        c[j] = (Σ floor(x_j · 2²⁰)) / 2²⁰ / n

    The quantized integer sum is exact and associative, so the result is
    bit-identical regardless of partition order or engine — float sums
    are not, and a last-ulp difference can flip a boundary assignment in
    the next iteration, cascading into different clusters.  That
    determinism is what lets the DuckDB oracle replay the whole
    clustering (sim_ann_ivf).  The 2⁻²⁰ quantization error (~1e-6) is
    far below any clustering-quality signal.

    Driver traffic is bounded: nlist × dim aggregate rows per iteration.
    Empty lists keep their previous centroid (no respawn heuristics —
    determinism first).
    """
    cents = seed_centroids(df, nlist, vec_col, id_col)
    q = 1 << 20
    for _ in range(iters):
        rows = (
            ivf_assign(df, cents, vec_col)
            .select(
                "ivf_list",
                F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x"),
            )
            .groupBy("ivf_list", "pos")
            .agg(
                F.sum(F.floor(F.col("x") * q).cast("bigint")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        by_list: dict[int, dict[int, tuple[int, int]]] = {}
        for r in rows:
            by_list.setdefault(r["ivf_list"], {})[r["pos"]] = (r["s"], r["n"])
        new = [list(c) for c in cents]
        for li, dims in by_list.items():
            new[li] = [
                (dims[p][0] / q) / dims[p][1] for p in range(len(dims))
            ]
        cents = new
    return cents


def normalize_quantize_stats(
    df: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """Embedding-store maintenance for a training pipeline: L2-normalize
    each vector, symmetric int8 quantization (scale = 127 / max|x| of
    the unit vector), and the quantization's reconstruction MSE — the
    compressed-index prep step before ANN serving, at 4x storage
    reduction.

    Single pass of higher-order functions per row — no shuffle at all
    (embarrassingly parallel over any table size), no UDFs.  Arithmetic
    is sequenced so a SQL oracle reproduces it bit-for-bit: the fold
    starts at exact 0.0 and adds terms left-to-right, rounding uses the
    explicit floor(x + 0.5) form (engine round() half-way conventions
    differ), and outputs round computed doubles at fixed precision.
    Emits (id, norm, max_abs_unit, q_checksum, mse_1e6).

    Round-19 restructure (same arithmetic, staged through generator
    barriers): higher-order functions are evaluated interpreted and
    nothing hoists a non-lambda subexpression out of the per-element
    loop, so the original single-Project spelling re-evaluated ``norm``
    inside every element of ``unit``, ``unit`` inside every element of
    ``q`` (through ``scale`` → ``max_abs``), and ``q`` inside ``err`` —
    O(d³) work per row (~100 s for 2k rows of d=64 at sf0.1; sf10 never
    finished).  Each intermediate is now materialized once per row via
    the ``explode(array(...))`` 1:1 generator barrier (operators/text.py
    idiom), making the whole pipeline O(d) per row.  Every fold runs the
    same operations in the same order on the same values, so doubles
    stay bit-identical (the divisor ``127.0 / max_abs`` is evaluated
    per element now, but IEEE division of the same operands is
    deterministic — verified value-identical against the old spelling
    and the oracle)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    # barrier 1: the double vector and its norm, each computed once
    b1 = df.select(
        F.col(id_col),
        F.explode(F.array(F.struct(v.alias("v"), norm.alias("n")))).alias(
            "_s1"
        ),
    )
    unit = F.transform(F.col("_s1.v"), lambda x: x / F.col("_s1.n"))
    max_abs = F.array_max(F.transform(unit, F.abs))
    # barrier 2: the unit vector and its max-|x|, computed once
    b2 = b1.select(
        F.col(id_col),
        F.col("_s1.n").alias("_norm"),
        F.size(F.col("_s1.v")).alias("_d"),
        F.explode(
            F.array(F.struct(unit.alias("u"), max_abs.alias("m")))
        ).alias("_s2"),
    )
    scale = F.lit(127.0) / F.col("_s2.m")
    q = F.transform(
        F.col("_s2.u"),
        lambda x: F.floor(x * scale + F.lit(0.5)).cast("bigint"),
    )
    # barrier 3: the quantized vector, computed once
    b3 = b2.select("*", F.explode(F.array(q)).alias("_q"))
    err = F.zip_with(
        F.col("_s2.u"),
        F.col("_q"),
        lambda x, qi: (x - qi.cast("double") / scale),
    )
    mse = (
        F.aggregate(err, F.lit(0.0), lambda a, d: a + d * d)
        / F.col("_d").cast("double")
    )
    return b3.select(
        F.col(id_col),
        F.round(F.col("_norm"), 6).alias("norm"),
        F.round(F.col("_s2.m"), 6).alias("max_abs_unit"),
        F.aggregate(
            F.col("_q"), F.lit(0).cast("bigint"), lambda a, b: a + b
        ).alias("q_checksum"),
        F.round(mse * F.lit(1_000_000.0), 6).alias("mse_1e6"),
    )
