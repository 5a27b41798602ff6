"""Text-analysis operators for training-data pipelines (SURVEY.md §2.C):
language-ID, quality scoring, token counting, document fingerprinting.

All pure `pyspark.sql.functions` compositions — codegen'd, no UDFs — and
deterministic (integer/string arithmetic only), so every operator is
oracle-reproducible.

Two layers:

- Expression-level helpers (``tokens``, ``language_id`` …): composable
  Columns, but every use re-tokenizes the text — and nested when-chains
  (argmax) duplicate sub-expressions combinatorially.  Fine for a single
  feature, pathological for a profile.
- DataFrame-level ``token_stats`` / ``text_profile``: tokenize ONCE via
  explode + groupBy(id) with partial aggregation, then derive every
  token-based feature from the aggregated columns.  Measured ~20× faster
  than the all-expression profile on real documents, and the shuffle is
  only #docs × a few longs — the shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword LID heuristic.
# (A real pipeline ships trained n-gram tables; the operator shape — score
# per language, argmax — is identical.)
LID_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "with", "that"],
    "de": ["der", "die", "und", "das", "ist", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "des"],
    "es": ["el", "la", "los", "que", "es", "una", "con"],
}


def tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), " "), lambda x: x != "")


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text)).cast("bigint")


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token estimate: alpha runs, digit runs, and individual
    punctuation each count as one token (a cheap stand-in for a real
    tokenizer with the same plumbing cost)."""
    return F.size(
        F.regexp_extract_all(
            F.lower(text), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0)
        )
    ).cast("bigint")


def language_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit counts (vectorized array intersection)."""
    toks = tokens(text)

    # single-arg lambda only: a 2nd param would select PySpark's
    # (element, index) filter variant and bind the word list to the index.
    def marker_filter(words: list[str]):
        return lambda t: t.isin(*words)

    return {
        lang: F.size(F.filter(toks, marker_filter(words))).cast("bigint")
        for lang, words in LID_MARKERS.items()
    }


def _argmax_lang(scores: dict[str, Column]) -> Column:
    """Argmax of per-language scores; ties break by language-code order;
    'und' (undetermined) when all scores are zero.

    Only call this on *materialized columns* (post-aggregation): the
    when-chain nests each input ~2^len(scores) times, so handing it raw
    token-scan expressions re-tokenizes the row dozens of times.
    """
    best = None
    best_score = None
    for lang in sorted(scores):
        s = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def language_id(text: Column) -> Column:
    """Heuristic LID as a single expression (see layer note above — for
    bulk profiling use ``text_profile``, which computes the same argmax
    over aggregated columns)."""
    return _argmax_lang(language_scores(text))


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-signal features used by pretraining filters."""
    toks = tokens(text)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(text).cast("double")
    mean_tok_len = F.when(
        n_tok > 0,
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
        ).cast("double")
        / n_tok,
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.filter(toks, lambda x: x.isin(*LID_MARKERS["en"]))
    ).cast("double")
    punct = F.length(F.regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tok.cast("bigint"),
        "mean_token_len": F.round(mean_tok_len, 6),
        "stopword_ratio": F.round(
            F.when(n_tok > 0, stop_hits / n_tok).otherwise(0.0), 6
        ),
        "punct_ratio": F.round(
            F.when(n_chars > 0, punct / n_chars).otherwise(0.0), 6
        ),
    }


def _quality_from(n_tokens: Column, mean_token_len: Column, stopword_ratio: Column) -> Column:
    """Composite quality score in [0,1]: rewards mid-length docs, real
    word lengths, and some stopword mass (deterministic formula).
    Inputs are the *rounded* profile features."""
    len_score = F.least(n_tokens.cast("double") / 64.0, F.lit(1.0))
    wl_score = F.when(
        (mean_token_len >= 3.0) & (mean_token_len <= 8.0), 1.0
    ).otherwise(0.5)
    stop_score = F.least(stopword_ratio * 5.0, F.lit(1.0))
    return F.round((len_score + wl_score + stop_score) / 3.0, 6)


def quality_score(text: Column) -> Column:
    """Quality score as a single expression (see layer note above)."""
    f = quality_features(text)
    return _quality_from(f["n_tokens"], f["mean_token_len"], f["stopword_ratio"])


def fingerprint(text: Column, mod: int = 1_000_000_007, base: int = 31) -> Column:
    """Rolling polynomial hash over characters:
    acc = (acc*base + codepoint) mod m — exact BIGINT arithmetic, so any
    engine reproduces it (used for cheap doc identity / bucketing)."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * base + F.ascii(c)) % mod,
    )


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Tokenize once, aggregate every token-derived statistic.

    explode_outer keeps zero-token docs (their counts aggregate to 0).
    Output: id, n_tokens_ws, _tok_chars, _s_<lang> marker hits.  The
    shuffle after partial aggregation is #docs × ~7 longs regardless of
    document length — this is the whole point vs per-column expressions.
    """
    ex = df.select(
        F.col(id_col),
        F.explode_outer(tokens(F.col(text_col))).alias("_tk"),
    )
    aggs = [
        F.count("_tk").alias("n_tokens_ws"),
        F.coalesce(F.sum(F.length("_tk")), F.lit(0)).alias("_tok_chars"),
    ] + [
        F.count(F.when(F.col("_tk").isin(*words), True)).alias(f"_s_{lang}")
        for lang, words in sorted(LID_MARKERS.items())
    ]
    return ex.groupBy(id_col).agg(*aggs)


def text_profile(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Full text analysis: counts, quality features + score, LID,
    fingerprint — one tokenization pass + one per-row expression pass,
    joined on id (co-partitioned shuffle join)."""
    c = F.col(text_col)
    per_doc = df.select(
        F.col(id_col),
        token_count_bpe_ish(c).alias("n_tokens_bpe"),
        F.length(c).cast("double").alias("_n_chars"),
        F.length(F.regexp_replace(c, "[^.,;:!?]", "")).cast("double").alias("_punct"),
        fingerprint(c).alias("fingerprint"),
    )
    st = token_stats(df, text_col, id_col)
    n_tok = F.col("n_tokens_ws").cast("double")
    mean_token_len = F.round(
        F.when(n_tok > 0, F.col("_tok_chars").cast("double") / n_tok).otherwise(0.0),
        6,
    )
    stopword_ratio = F.round(
        F.when(n_tok > 0, F.col("_s_en").cast("double") / n_tok).otherwise(0.0), 6
    )
    punct_ratio = F.round(
        F.when(F.col("_n_chars") > 0, F.col("_punct") / F.col("_n_chars")).otherwise(
            0.0
        ),
        6,
    )
    lang_pred = _argmax_lang(
        {lang: F.col(f"_s_{lang}") for lang in LID_MARKERS}
    )
    return (
        per_doc.join(st, id_col)
        .withColumn("mean_token_len", mean_token_len)
        .withColumn("stopword_ratio", stopword_ratio)
        .withColumn("punct_ratio", punct_ratio)
        .select(
            id_col,
            "n_tokens_ws",
            "n_tokens_bpe",
            "mean_token_len",
            "stopword_ratio",
            "punct_ratio",
            _quality_from(
                F.col("n_tokens_ws"),
                F.col("mean_token_len"),
                F.col("stopword_ratio"),
            ).alias("quality"),
            lang_pred.alias("lang_pred"),
            "fingerprint",
        )
    )
