"""Property tests for corpus-construction operators: reproducibility of
sampling under physical re-layout, packing invariants, chunk-window
reconstruction, and the no-shuffle plan contracts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pg_mooncake_spark.operators.corpus import (
    chunk_documents,
    pack_sequences,
    sample_deterministic,
    sample_stratified,
)
from pg_mooncake_spark.plans import inspect as I
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_sample_deterministic_is_layout_independent(spark):
    """The same ids must survive regardless of partitioning/row order —
    the property rand(seed) does NOT have."""
    d = _docs(spark)
    a = {r["doc_id"] for r in sample_deterministic(d, "doc_id", 0.3, 7).collect()}
    shuffled = d.repartition(13, "lang").sortWithinPartitions(F.desc("doc_id"))
    b = {
        r["doc_id"]
        for r in sample_deterministic(shuffled, "doc_id", 0.3, 7).collect()
    }
    assert a == b and a
    # different seed → different (but reproducible) subset
    c = {r["doc_id"] for r in sample_deterministic(d, "doc_id", 0.3, 8).collect()}
    assert c != a


def test_sample_deterministic_rate_is_roughly_honored(spark):
    d = _docs(spark)
    n = d.count()
    k = sample_deterministic(d, "doc_id", 0.25, 0).count()
    assert 0.15 * n < k < 0.35 * n


def test_sample_stratified_quota_and_determinism(spark):
    d = _docs(spark)
    out = sample_stratified(d, "lang", "doc_id", 5, seed=3)
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(5, sizes[lang])
    again = sample_stratified(d.repartition(7), "lang", "doc_id", 5, seed=3)
    assert {tuple(r) for r in out.select("doc_id").collect()} == {
        tuple(r) for r in again.select("doc_id").collect()
    }


def test_pack_sequences_invariants(spark):
    d = _docs(spark).select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    out = pack_sequences(d, "doc_id", "n_tokens", 512, shards=8).collect()
    assert out
    by_shard: dict = {}
    for r in out:
        assert 0 <= r["shard"] < 8
        assert 0 <= r["bin_offset"] < 512
        assert r["bin_idx"] >= 0
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["doc_id"])
        start = 0
        for r in rows:
            # docs are laid end-to-end in id order within the shard
            assert r["bin_idx"] == start // 512
            assert r["bin_offset"] == start % 512
            start += r["n_tokens"]


def test_chunk_documents_reconstruction(spark):
    """overlap=0: chunks concatenate back to the original token stream;
    with overlap, consecutive chunks share exactly `overlap` tokens."""
    rows = [(1, " ".join(f"t{i}" for i in range(25))), (2, "one two"), (3, "x")]
    d = spark.createDataFrame(rows, "doc_id int, text string")

    flat = chunk_documents(d, "text", "doc_id", chunk_tokens=10, overlap=0)
    got = {}
    for r in flat.orderBy("doc_id", "chunk_idx").collect():
        got.setdefault(r["doc_id"], []).append(r["chunk_text"])
    assert " ".join(got[1]) == rows[0][1]
    assert got[2] == ["one two"]
    assert got[3] == ["x"]

    ov = chunk_documents(d, "text", "doc_id", chunk_tokens=10, overlap=3).collect()
    chunks1 = [r for r in sorted(ov, key=lambda r: (r["doc_id"], r["chunk_idx"])) if r["doc_id"] == 1]
    for a, b in zip(chunks1, chunks1[1:]):
        assert a["chunk_text"].split()[-3:] == b["chunk_text"].split()[:3]
    # window arithmetic: 25 tokens, stride 7 -> ceil((25-3)/7) = 4 chunks
    assert len(chunks1) == 4
    assert chunks1[-1]["n_tokens"] == 25 - 3 * 7


def test_corpus_plan_shapes(spark):
    """Sampling is a pure filter and chunking a pure explode — zero
    exchanges; stratified sampling pays exactly one shuffle."""
    d = _docs(spark)
    assert I.exchange_count(sample_deterministic(d, "doc_id", 0.5, 0)) == 0
    assert I.exchange_count(chunk_documents(d, "text", "doc_id", 12, 4)) == 0
    assert I.exchange_count(sample_stratified(d, "lang", "doc_id", 5)) == 1


def test_mix_corpora_weights_and_determinism(spark):
    from pg_mooncake_spark.operators.corpus import mix_corpora

    d = _docs(spark)
    out = mix_corpora(d, "lang", "doc_id", {"en": 1.0, "de": 0.5}, seed=11)
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(per) <= {"en", "de"}  # unweighted sources dropped
    assert per["en"] == sizes["en"]  # weight 1.0 keeps everything
    assert 0.3 * sizes["de"] < per.get("de", 0) < 0.7 * sizes["de"]
    again = mix_corpora(d.repartition(9), "lang", "doc_id", {"en": 1.0, "de": 0.5}, seed=11)
    assert {r["doc_id"] for r in out.collect()} == {r["doc_id"] for r in again.collect()}
    assert I.exchange_count(out) == 0  # pure filter


def test_mix_corpora_upsampling(spark):
    from pg_mooncake_spark.operators.corpus import mix_corpora

    d = _docs(spark)
    out = mix_corpora(d, "lang", "doc_id", {"en": 2.5}, seed=4)
    n_en = d.filter("lang = 'en'").count()
    got = out.count()
    # every en doc appears 2 or 3 times; expectation 2.5x
    assert 2 * n_en <= got <= 3 * n_en
    assert abs(got - 2.5 * n_en) < 0.25 * n_en
    per_doc = {r["doc_id"]: r["n"] for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert set(per_doc.values()) <= {2, 3}
    # copies carry distinct copy_idx and distinct interleave order
    sample_doc = next(iter(per_doc))
    copies = out.filter(F.col("doc_id") == sample_doc).collect()
    assert len({r["copy_idx"] for r in copies}) == len(copies)
    assert len({r["mix_order"] for r in copies}) == len(copies)


def test_decontaminate_drops_benchmark_overlap(spark):
    """Training docs sharing >= min_hits 8-grams with the benchmark are
    dropped; clean docs survive; short docs (< 8 tokens) never match."""
    from pg_mooncake_spark.operators.corpus import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id int, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "prefix the quick brown fox jumps over the lazy dog tonight suffix"),
            (2, "a completely different document about distributed query engines"),
            (3, "short doc"),
        ],
        "doc_id int, text string",
    )
    kept = sorted(
        r["doc_id"]
        for r in decontaminate(train, bench, ngram_k=8, min_hits=1).collect()
    )
    assert kept == [2, 3]
