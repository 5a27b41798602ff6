"""Text-analysis operators for training-data pipelines (SURVEY.md §2.C):
language-ID, quality scoring, token counting, document fingerprinting.

All pure `pyspark.sql.functions` compositions — codegen'd, no UDFs — and
deterministic (integer/string arithmetic only), so every operator is
oracle-reproducible.
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


def language_id(text: Column) -> Column:
    """Heuristic LID: argmax of marker scores, 'und' (undetermined) when
    all scores are zero.  Ties break by language-code order (stable)."""
    scores = language_scores(text)
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


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: rewards mid-length docs, real
    word lengths, and some stopword mass (deterministic formula)."""
    f = quality_features(text)
    len_score = F.least(f["n_tokens"].cast("double") / 64.0, F.lit(1.0))
    wl = f["mean_token_len"]
    wl_score = F.when((wl >= 3.0) & (wl <= 8.0), 1.0).otherwise(0.5)
    stop_score = F.least(f["stopword_ratio"] * 5.0, F.lit(1.0))
    return F.round((len_score + wl_score + stop_score) / 3.0, 6)


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


def text_profile(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One-pass text analysis: counts, quality features + score, LID,
    fingerprint."""
    c = F.col(text_col)
    feats = quality_features(c)
    return df.select(
        F.col(id_col),
        token_count_ws(c).alias("n_tokens_ws"),
        token_count_bpe_ish(c).alias("n_tokens_bpe"),
        feats["mean_token_len"].alias("mean_token_len"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["punct_ratio"].alias("punct_ratio"),
        quality_score(c).alias("quality"),
        language_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )
