"""Near-dup search recall tests: the banded searches must find the
synthesized duplicate pairs WITHOUT being told which ids are dups.

The synthesized fixture (queries/llm._docs2) unions originals with exact
copies (doc_id < 25 → +1_000_000) and near-copies (one appended token,
25 <= doc_id < 50 → +1_000_000), so ground truth is the 50 pairs
(i, i + 1_000_000).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_mooncake_spark.operators import dedup as D
from pg_mooncake_spark.queries.llm import _docs2
from tests.conftest import SF_DIR


def _truth_pairs(docs):
    ids = {r[0] for r in docs.select("doc_id").collect()}
    return {(i, i + 1_000_000) for i in range(50) if i in ids}


def test_simhash_banded_search_finds_synthesized_dups(spark):
    docs = _docs2(spark, SF_DIR)
    sh = D.simhash(docs, "text", "doc_id").persist()
    pairs = D.simhash_banded_pairs(sh, "doc_id", bits=64, bands=8, max_hamming=6)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # Recall is exact w.r.t. the operator's definition: every true pair
    # whose actual hamming distance is within the threshold MUST be found
    # (pigeonhole guarantee) — no id-offset shortcut anywhere.
    a, b = sh.alias("a"), sh.alias("b")
    truth_h = {
        r["id"]: r["h"]
        for r in a.join(b, F.col("a.doc_id") + 1_000_000 == F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id"),
            D.hamming(F.col("a.simhash_bits"), F.col("b.simhash_bits")).alias("h"),
        )
        .collect()
    }
    sh.unpersist()
    expected = {(i, i + 1_000_000) for i, h in truth_h.items() if h <= 6}
    exact_copies = {(i, i + 1_000_000) for i in truth_h if i < 25}
    assert exact_copies <= expected  # hamming 0 by construction
    missing = expected - found
    assert not missing, f"banded search missed in-threshold pairs: {sorted(missing)}"
    # And it must not hallucinate out-of-threshold synthesized pairs.
    over = {(i, i + 1_000_000) for i, h in truth_h.items() if h > 6}
    assert not (over & found)


def test_simhash_banded_pairs_hamming_zero_for_exact_copies(spark):
    docs = _docs2(spark, SF_DIR)
    sh = D.simhash(docs, "text", "doc_id")
    pairs = D.simhash_banded_pairs(sh, "doc_id", bits=64, bands=8, max_hamming=6)
    exact = (
        pairs.filter((F.col("id_a") < 25) & (F.col("id_b") == F.col("id_a") + 1_000_000))
        .select("hamming")
        .collect()
    )
    assert exact and all(r["hamming"] == 0 for r in exact)


def test_ngram_jaccard_hub_shingle_cap(spark):
    """A boilerplate shingle shared by every doc must not generate
    quadratic candidate pairs once it exceeds max_doc_freq."""
    rows = [
        (i, f"common header boilerplate unique{i} junk{i} tail{i} word{i}")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    # every doc shares exactly one shingle: 'common header boilerplate'
    uncapped = D.ngram_jaccard_pairs(
        docs, "text", "doc_id", 3, threshold=0.01, max_doc_freq=None
    )
    assert uncapped.count() == 30 * 29 // 2  # quadratic hub blowup
    capped = D.ngram_jaccard_pairs(
        docs, "text", "doc_id", 3, threshold=0.01, max_doc_freq=5
    )
    assert capped.count() == 0  # hub dropped -> no candidates at all


def test_ngram_jaccard_cap_keeps_real_dups(spark):
    """Docs that are near-dups beyond the hub shingle still pair, with
    Jaccard computed over the filtered universe."""
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(0, base), (1, base + " extra"), *[(i, f"common x{i} y{i} z{i} w{i}") for i in range(2, 40)]]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    capped = D.ngram_jaccard_pairs(
        docs, "text", "doc_id", 3, threshold=0.4, max_doc_freq=5
    )
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (0, 1) in pairs


def test_kmeans_ivf_recall_and_determinism(spark):
    """Distributed fixed-point k-means: (a) bit-identical across runs and
    partitionings (the property the oracle replay depends on); (b) the
    nprobe=2 probe keeps usable recall vs exact brute force at fixture
    scale."""
    from pg_mooncake_spark.operators import similarity as S

    e = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    c1 = S.kmeans_centroids(e, nlist=8, iters=2)
    c2 = S.kmeans_centroids(e.repartition(7), nlist=8, iters=2)
    assert c1 == c2, "fixed-point means must not depend on partitioning"

    qvec = [float(x) for x in e.filter("vec_id = 0").first()["embedding"]]
    exact = [r["vec_id"] for r in S.cosine_topk(e, qvec, k=10).collect()]
    approx = [
        r["vec_id"] for r in S.ann_ivf_topk(e, qvec, c1, k=10, nprobe=2).collect()
    ]
    assert 0 in approx  # the query vector itself is always found
    overlap = len(set(exact) & set(approx)) / 10
    assert overlap >= 0.5, f"IVF nprobe=2 recall {overlap} too low"


def test_connected_components_transitive_chain(spark):
    """A~B, B~C, C~D (no direct A~C/A~D pair) must collapse into ONE
    component labeled with the min id — the transitivity pairwise dedup
    output misses; disjoint pairs stay separate; convergence needs
    multiple propagation rounds (chain diameter 3)."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "id_a bigint, id_b bigint",
    )
    out = {r["node"]: r["comp"] for r in D.connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_deep_chain_star_fallback(spark):
    """A component deeper than max_iter (here: a 61-node path graph with
    max_iter=3, diameter 60) must NOT raise — label propagation hands
    off to the large-star/small-star alternation (Kiveris et al.,
    SoCC'14), which converges in O(log n) alternations regardless of
    diameter and yields the identical min-id labeling."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a bigint, id_b bigint"
    )
    out = {
        r["node"]: r["comp"]
        for r in D.connected_components(chain, max_iter=3).collect()
    }
    assert out == {i: 0 for i in range(61)}

    # multiple components + disjoint pairs, still via the fallback path
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)] + [(100, 101), (101, 102), (200, 201)],
        "id_a bigint, id_b bigint",
    )
    out = {
        r["node"]: r["comp"]
        for r in D.connected_components(pairs, max_iter=2).collect()
    }
    want = {i: 0 for i in range(31)}
    want.update({100: 100, 101: 100, 102: 100, 200: 200, 201: 200})
    assert out == want


def test_winnowing_guarantee_and_edges(spark):
    """Winnowing's defining property: documents sharing a token run of
    length >= w + k - 1 (= 6 at k=3, w=4) share at least one
    fingerprint; disjoint documents share none.  Short-doc edges: < k
    tokens -> empty set, < w grams -> exactly one fingerprint."""
    from pyspark.sql import functions as F

    from pg_mooncake_spark.operators.text import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6-token shared run
    rows = [
        (1, f"intro words here {shared} trailing one"),
        (2, f"{shared} completely different ending tokens now"),
        (3, "nothing in common with the others at all"),
        (4, "two tokens"),          # < k -> empty
        (5, "just three tokens"),   # exactly one gram -> one fingerprint
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: set(r["fp"])
        for r in df.select(
            "doc_id", winnowing_fingerprints(F.col("text")).alias("fp")
        ).collect()
    }
    assert got[1] & got[2], "docs sharing a >=6-token run must overlap"
    assert not (got[1] & got[3]) and not (got[2] & got[3])
    assert got[4] == set()
    assert len(got[5]) == 1

def test_shared_substring_runs_detects_alignments(spark):
    """Runs are counted per alignment diagonal: a verbatim k+run-1-token
    shared substring yields exactly run consecutive positional k-grams;
    disjoint repeats don't merge; pairs below min_run are dropped."""
    from pg_mooncake_spark.operators.dedup import shared_substring_runs

    rows = [
        # docs 1/2 share "a b c d e f g" (7 tokens -> run 3 at k=5)
        (1, "x1 x2 a b c d e f g y1 y2"),
        (2, "z1 a b c d e f g z2 z3 z4"),
        # doc 3 shares only 5 tokens with doc 1 (run 1 -> filtered)
        (3, "a b c d e q1 q2 q3 q4"),
        # doc 4 is an exact copy of doc 2 (full-length run)
        (4, "z1 a b c d e f g z2 z3 z4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = shared_substring_runs(
        df, "text", "doc_id", shingle_k=5, min_run=3, max_doc_freq=64
    )
    got = {(r["id_a"], r["id_b"]): (r["max_run"], r["max_shared_tokens"])
           for r in out.collect()}
    assert got[(1, 2)] == (3, 7)
    assert got[(2, 4)] == (7, 11)  # 11 tokens -> 7 consecutive 5-grams
    assert (1, 3) not in got and (2, 3) not in got
    assert got[(1, 4)] == (3, 7)


def test_shared_substring_runs_hub_cap(spark):
    """k-grams present in more than max_doc_freq documents are excluded
    from BOTH sides of the join — a boilerplate phrase shared by every
    document produces no pairs once capped."""
    from pg_mooncake_spark.operators.dedup import shared_substring_runs

    rows = [(i, f"u{i} common a b c d e f tail{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = shared_substring_runs(
        df, "text", "doc_id", shingle_k=5, min_run=3, max_doc_freq=5
    )
    assert capped.count() == 0
    uncapped = shared_substring_runs(
        df, "text", "doc_id", shingle_k=5, min_run=3, max_doc_freq=100
    )
    assert uncapped.count() == 45  # all pairs share the 7-token middle


def test_boilerplate_fraction_exact(spark):
    """boilerplate_frac = boiler-occurrences / total occurrences with
    df counted over DISTINCT docs (a doc repeating its own n-gram does
    not make it boilerplate)."""
    from pg_mooncake_spark.operators.text import boilerplate_fraction

    rows = [
        (1, "a b c d e"),       # trigrams: "a b c","b c d","c d e"
        (2, "a b c x y"),       # shares "a b c"
        (3, "a b c p q"),       # shares "a b c"  -> df("a b c") = 3 > 2
        (4, "m n o m n o m n"), # self-repeats only: df = 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["n_kgrams"], r["boilerplate_frac"])
           for r in boilerplate_fraction(
               df, "text", "doc_id", n=3, max_doc_freq=2).collect()}
    assert out[1] == (3, round(1 / 3, 6))
    assert out[2] == (3, round(1 / 3, 6))
    assert out[3] == (3, round(1 / 3, 6))
    assert out[4] == (6, 0.0)
