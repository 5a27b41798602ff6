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
- DataFrame-level ``text_profile``: one struct-accumulator fold over the
  token array computes every token statistic in a single pass, and an
  ``explode(array(...))`` generator barrier stops CollapseProject from
  inlining that fold into each downstream field reference (Catalyst's
  common-subexpression elimination does not cover higher-order lambdas).
  The whole profile is then MAP-ONLY: zero shuffles, embarrassingly
  parallel at any scale.  (``token_stats`` keeps the explode+groupBy
  alternative — same results, one shuffle — for callers that want the
  exploded token relation anyway.)
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


_ALNUM_SPACE = "abcdefghijklmnopqrstuvwxyz0123456789 "


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token estimate: alpha runs, digit runs, and individual
    punctuation each count as one token (a cheap stand-in for a real
    tokenizer with the same plumbing cost).

    Equals ``size(regexp_extract_all(lower(text),
    '[a-z]+|[0-9]+|[^a-z0-9 ]'))`` — every char classifies uniquely, so
    the alternation's matches are exactly the alpha runs + digit runs +
    each remaining non-space char — but computed as two single-class
    regex counts plus a linear ``translate``: the three-way alternation
    was the HOTTEST expression in the whole text-profile pass (java
    regex re-tries each branch per position).  Measured at sf10 (500 k
    docs): 5.1 s → 1.8 s for this column alone, full profile 6.7 →
    3.6 s (r18 optimization; values bit-identical, oracle unchanged).
    """
    s = F.lower(text)
    return (
        F.regexp_count(s, F.lit("[a-z]+"))
        + F.regexp_count(s, F.lit("[0-9]+"))
        + F.length(F.translate(s, _ALNUM_SPACE, ""))
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
    # sum of token lengths == non-space chars of the lowered text: a
    # linear translate instead of the per-token fold (r18, same
    # arithmetic identity as text_profile's _chars column)
    mean_tok_len = F.when(
        n_tok > 0,
        F.length(F.translate(F.lower(text), " ", "")).cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.filter(toks, lambda x: x.isin(*LID_MARKERS["en"]))
    ).cast("double")
    # count the punctuation chars directly (regexp_count of the positive
    # class) instead of materializing the all-but-punct-deleted string —
    # same value as length(regexp_replace(text, '[^.,;:!?]', '')) (r18)
    punct = F.regexp_count(text, F.lit("[.,;:!?]")).cast("double")
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


def winnowing_fingerprints(
    text: Column,
    k: int = 3,
    w: int = 4,
    mod: int = 1_000_000_007,
    base: int = 31,
) -> Column:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    SIGMOD'03, the MOSS algorithm): hash every k-token gram, slide a
    w-window over the hash sequence, keep each window's MINIMUM, distinct
    the result.  Guarantee: two documents sharing any token run of at
    least w + k - 1 tokens share at least one fingerprint, at ~2/(w+1)
    the storage of the full gram set — the classic local fingerprinting
    scheme for plagiarism/overlap detection over big corpora.

    All higher-order functions on the token array — single pass, zero
    UDFs, exact BIGINT arithmetic (same polynomial hash as
    ``fingerprint``), so a SQL oracle replays it bit-for-bit.  Short
    docs: fewer than k tokens → empty; fewer than w grams → one
    fingerprint (the global min)."""
    tk = F.filter(F.split(F.lower(text), " "), lambda x: x != "")
    n = F.size(tk)
    grams = F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: F.concat_ws(" ", F.slice(tk, i, k)),
    )
    hashes = F.transform(
        grams,
        lambda g: F.aggregate(
            F.split(g, ""),
            F.lit(0).cast("bigint"),
            lambda a, c: (a * base + F.ascii(c)) % mod,
        ),
    )
    nh = F.size(hashes)
    wins = F.transform(
        F.sequence(F.lit(1), nh - w + 1),
        lambda i: F.array_min(F.slice(hashes, i, w)),
    )
    return (
        F.when(n < k, F.array().cast("array<bigint>"))
        .when(nh < w, F.array(F.array_min(hashes)))
        .otherwise(F.array_sort(F.array_distinct(wins)))
    )


def winnowing_fingerprints_col(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    w: int = 4,
    mod: int = 1_000_000_007,
    base: int = 31,
    out_col: str = "fp",
) -> DataFrame:
    """``winnowing_fingerprints`` staged through generator barriers:
    (id, materialized fingerprint array) per row.

    The Column spelling above re-evaluates ``tk`` inside every gram
    slice and ``hashes`` inside every window (higher-order lambdas are
    interpreted and nothing hoists a non-lambda subexpression out of
    the per-element loop) — O(tokens²·k) per row, and each *reference*
    to the returned column repeats all of it.  Here every intermediate
    is materialized once per row via the ``explode(array(...))`` 1:1
    barrier, so gram building and window minima index into an
    already-built array: O(tokens·(k+w)) per row.  Same expressions,
    same branch order, same null propagation (the ``when(n >= k, ...)``
    guard with no otherwise yields NULL exactly where the lazy
    when-chain above never evaluated ``hashes``), so results are
    bit-identical — pinned by tests against the Column spelling."""
    tk = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    # barrier 0: the token array, built once
    b0 = df.select(F.col(id_col), F.explode(F.array(tk)).alias("_wtk"))
    # barrier 1: per-token polynomial hash and base^len mod m, one char
    # pass per token.  Gram hashes then compose in O(1) per gram via the
    # exact modular identity H(xy) = (H(x)·base^|y| + H(y)) mod m — the
    # same value the per-char fold over the concatenated gram string
    # produces, without building or re-splitting any gram string (every
    # intermediate stays below m·base + 127 < m², so BIGINT never
    # overflows and the identity is exact).  base^len comes from a
    # constant-folded 256-entry lookup (length() counts the same units
    # split(tok, "") produces — pinned by the unicode/supplementary
    # adversarial test), with an exact fold fallback for longer tokens.
    pows: list[int] = [1]
    for _ in range(256):
        pows.append((pows[-1] * base) % mod)
    pow_lit = F.array(*[F.lit(v).cast("bigint") for v in pows])
    tok_hash = lambda tok: F.aggregate(  # noqa: E731
        F.split(tok, ""),
        F.lit(0).cast("bigint"),
        lambda a, c: (a * base + F.ascii(c)) % mod,
    )
    tok_pow = lambda tok: F.when(  # noqa: E731
        F.length(tok) <= 256, F.element_at(pow_lit, F.length(tok) + 1)
    ).otherwise(
        F.aggregate(
            F.sequence(F.lit(1), F.length(tok)),
            F.lit(1).cast("bigint"),
            lambda a, i: (a * base) % mod,
        )
    )
    b1 = b0.select(
        F.col(id_col),
        F.explode(
            F.array(
                F.struct(
                    F.transform(F.col("_wtk"), tok_hash).alias("h"),
                    F.transform(F.col("_wtk"), tok_pow).alias("p"),
                )
            )
        ).alias("_wt"),
    )
    n = F.size(F.col("_wt.h"))
    sep = 32  # ascii(' '), the concat_ws separator of the gram string

    def gram_hash(i):
        # chain built in Python (k is a plain int): element_at into the
        # materialized hash/power arrays, ~4 arithmetic ops per token
        acc = F.element_at(F.col("_wt.h"), i)
        for j in range(1, k):
            acc = (
                (acc * base + sep) % mod * F.element_at(F.col("_wt.p"), i + j)
                + F.element_at(F.col("_wt.h"), i + j)
            ) % mod
        return acc

    hashes = F.transform(F.sequence(F.lit(1), n - k + 1), gram_hash)
    # barrier 2: the gram-hash array, built once (guarded: the lazy
    # when-chain in the Column form never evaluates `hashes` when
    # n < k, where the descending sequence would be garbage)
    b2 = b1.select(
        F.col(id_col),
        n.alias("_wn"),
        F.explode(F.array(F.when(n >= k, hashes))).alias("_wh"),
    )
    nh = F.size(F.col("_wh"))
    wins = F.transform(
        F.sequence(F.lit(1), nh - w + 1),
        lambda i: F.array_min(F.slice(F.col("_wh"), i, w)),
    )
    fp = (
        F.when(F.col("_wn") < k, F.array().cast("array<bigint>"))
        .when(nh < w, F.array(F.array_min(F.col("_wh"))))
        .otherwise(F.array_sort(F.array_distinct(wins)))
    )
    # barrier 3: the fingerprint set, built once for every consumer
    return b2.select(F.col(id_col), F.explode(F.array(fp)).alias(out_col))


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


def token_struct_stats(text: Column) -> Column:
    """Every token-derived statistic in ONE fold over the token array:
    struct(n, chars, s_de, s_en, s_es, s_fr).  Must be read through a
    generator barrier (see :func:`text_profile`) or CollapseProject will
    re-run the fold once per field consumer."""
    toks = tokens(text)
    fields = ("n", "chars", "s_de", "s_en", "s_es", "s_fr")
    zero = F.struct(*[F.lit(0).cast("bigint").alias(k) for k in fields])

    def step(acc: Column, t: Column) -> Column:
        return F.struct(
            (acc["n"] + 1).alias("n"),
            (acc["chars"] + F.length(t)).alias("chars"),
            *[
                (
                    acc[f"s_{lang}"]
                    + F.when(t.isin(*LID_MARKERS[lang]), 1).otherwise(0).cast("bigint")
                ).alias(f"s_{lang}")
                for lang in ("de", "en", "es", "fr")
            ],
        )

    return F.aggregate(toks, zero, step)


def text_profile(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Full text analysis: counts, quality features + score, LID,
    fingerprint — a single map-only pass.

    The struct fold computes all token statistics at once; the
    ``explode(array(...))`` wraps it in a Generate node, which is a
    CollapseProject barrier, so the fold runs exactly once per row no
    matter how many output columns read it.  Zero shuffles — at 100 TB
    the profile is embarrassingly parallel (the previous shape paid a
    two-sided shuffle join of #docs rows)."""
    c = F.col(text_col)
    base = df.select(
        F.col(id_col),
        token_count_bpe_ish(c).alias("n_tokens_bpe"),
        F.length(c).cast("double").alias("_n_chars"),
        F.regexp_count(c, F.lit("[.,;:!?]")).cast("double").alias("_punct"),
        fingerprint(c).alias("fingerprint"),
        # sum of token lengths == non-space chars of the lowered text: a
        # linear translate instead of a per-token fold (r18; split on
        # ' ' drops only spaces, and empty tokens contribute 0 either
        # way, so the arithmetic is exact)
        F.length(F.translate(F.lower(c), " ", ""))
        .cast("bigint")
        .alias("_chars"),
        tokens(c).alias("_tk0"),
    )
    # barrier 1: materialize the token ARRAY once...
    bt = base.select("*", F.explode(F.array("_tk0")).alias("_tk")).drop("_tk0")

    def marker_hits(words: list[str]) -> Column:
        return F.size(
            F.filter("_tk", (lambda ws: lambda t: t.isin(*ws))(words))
        ).cast("bigint")

    # ...then compute every per-token statistic from it in one Project.
    # This replaced the struct-accumulator fold (r18): four vectorized
    # size(filter(...)) counts over a materialized array beat one
    # interpreted per-element fold ~3x at sf10 (9.5 s → 2.7 s for the
    # stats subtree alone; full profile 6.7 → 3.3 s with the bpe-count
    # rewrite above).  The barrier-2 explode keeps CollapseProject from
    # inlining these counts into the argmax when-chain below (which
    # nests each score ~2^langs times).
    stats = F.struct(
        F.size("_tk").cast("bigint").alias("n"),
        F.col("_chars").alias("chars"),
        *[
            marker_hits(LID_MARKERS[lang]).alias(f"s_{lang}")
            for lang in ("de", "en", "es", "fr")
        ],
    )
    b = (
        bt.select("*", stats.alias("_st0"))
        .select("*", F.explode(F.array("_st0")).alias("_st"))
        .drop("_st0", "_tk", "_chars")
    )
    n_tok = F.col("_st.n").cast("double")
    mean_token_len = F.round(
        F.when(n_tok > 0, F.col("_st.chars").cast("double") / n_tok).otherwise(0.0),
        6,
    )
    stopword_ratio = F.round(
        F.when(n_tok > 0, F.col("_st.s_en").cast("double") / n_tok).otherwise(0.0), 6
    )
    punct_ratio = F.round(
        F.when(F.col("_n_chars") > 0, F.col("_punct") / F.col("_n_chars")).otherwise(
            0.0
        ),
        6,
    )
    lang_pred = _argmax_lang({lang: F.col(f"_st.s_{lang}") for lang in LID_MARKERS})
    return b.select(
        id_col,
        F.col("_st.n").alias("n_tokens_ws"),
        "n_tokens_bpe",
        mean_token_len.alias("mean_token_len"),
        stopword_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        _quality_from(F.col("_st.n"), mean_token_len, stopword_ratio).alias(
            "quality"
        ),
        lang_pred.alias("lang_pred"),
        "fingerprint",
    )


# ------------------------------------------------------------ PII redaction

# Patterns restricted to syntax shared by Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repeats, \b word boundaries — no
# lookarounds, no backreferences — so oracle SQL replays them verbatim.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{4}\b"


def pii_redact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Redact emails / IPv4 addresses / phone-shaped numbers from a text
    column — the standard pre-training hygiene pass.

    Per doc: occurrence counts per category (on the original text) and
    the redacted text with ``[EMAIL]`` / ``[IP]`` / ``[PHONE]``
    placeholders.  Emails are replaced first so an address's domain dots
    can't be re-matched as an IP.

    Map-only (regexp_count/regexp_replace are codegen'd JVM expressions —
    no shuffle, no Python), so it scales linearly with the corpus.
    """
    c = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, PII_EMAIL, "[EMAIL]"), PII_IPV4, "[IP]"
        ),
        PII_PHONE,
        "[PHONE]",
    )
    return df.select(
        F.col(id_col),
        F.regexp_count(c, F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count(c, F.lit(PII_IPV4)).alias("n_ips"),
        F.regexp_count(c, F.lit(PII_PHONE)).alias("n_phones"),
        redacted.alias("redacted"),
    )


# -------------------------------------------------------- repetition score


def repetition_score(
    df: DataFrame, text_col: str, id_col: str, k: int = 2
) -> DataFrame:
    """Boilerplate/repetition signal: the fraction of word k-grams that
    are repeats of an earlier k-gram in the same document
    (``1 - distinct/total``).  Templated or looping text scores high;
    natural prose scores near 0.  Map-only: the k-gram array is built
    with the same zip-of-shifted-slices shape as MinHash shingling and
    never leaves the row.
    """
    from pg_mooncake_spark.operators.dedup import word_kgrams

    # barrier-materialize the k-gram array once (r19): `total` and
    # `distinct` each re-evaluated the zip-of-shifted-slices chain —
    # 2× the per-row gram build for no reason.  Same expressions over
    # the materialized column, bit-identical results.
    b = df.select(
        F.col(id_col),
        F.explode(F.array(word_kgrams(F.col(text_col), k))).alias("_kg"),
    )
    total = F.size(F.col("_kg"))
    distinct = F.size(F.array_distinct(F.col("_kg")))
    return b.select(
        F.col(id_col),
        total.cast("bigint").alias("n_grams"),
        F.when(total > 0, F.round(1.0 - distinct / total, 6))
        .otherwise(F.lit(0.0))
        .alias("repetition"),
    )


# -------------------------------------------------------- corpus n-grams


def top_ngrams(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, k: int = 50
) -> DataFrame:
    """Corpus-level top-k word n-grams by DOCUMENT frequency — the
    boilerplate/template sweep a pretraining pipeline runs before
    filtering (an n-gram present in thousands of documents is a nav bar,
    license header, or scraped template, not prose), and the fast first
    pass of benchmark-contamination checks.

    Scale shape: per-document distinct n-grams (map-only zip-of-slices,
    duplicates collapsed BEFORE the shuffle so a looping document can't
    inflate its own counts) explode into ONE groupBy(ngram) with
    map-side partial counts; the top-k is a TakeOrdered over the
    aggregated counts — no global sort of the n-gram universe.  Driver
    receives exactly k rows.
    """
    from pg_mooncake_spark.operators.dedup import word_kgrams

    grams = F.array_distinct(word_kgrams(F.col(text_col), n))
    return (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), "ngram")
        .limit(k)
    )


def boilerplate_fraction(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    max_doc_freq: int = 2,
) -> DataFrame:
    """Per-document boilerplate occupancy: the fraction of a document's
    word n-gram OCCURRENCES whose n-gram appears in more than
    ``max_doc_freq`` distinct documents — the C4-style corpus-frequency
    filter ("drop text that repeats across many pages": nav bars,
    license headers, templates) expressed as a per-document score a
    pipeline thresholds on.

    Returns (id, n_kgrams, boiler_kgrams, boilerplate_frac).  The two
    counts are exact integers — the cross-engine-deterministic columns a
    differential oracle should compare.  ``boilerplate_frac`` is the
    convenience ratio rounded to 6 places; Spark's ROUND is HALF_UP on
    the BigDecimal of the double, which can disagree with another
    engine's ROUND on exact ties (ADVICE r7) — threshold on it, don't
    hash it.

    Scale shape: occurrences explode once; document frequency is one
    groupBy(ngram) with map-side combine; flags come back via a shuffle
    join keyed on the n-gram (the frequency table is corpus-sized — NOT
    broadcast); the per-document rollup is one more groupBy(id).  No
    per-row Python, no driver traffic.
    """
    from pg_mooncake_spark.operators.dedup import word_kgrams

    occ = df.select(
        F.col(id_col),
        F.explode(word_kgrams(F.col(text_col), n)).alias("s"),
    )
    dfreq = occ.groupBy("s").agg(
        F.countDistinct(id_col).alias("df")
    )
    return (
        occ.join(dfreq, "s")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_kgrams"),
            F.sum(
                F.when(F.col("df") > max_doc_freq, 1).otherwise(0)
            ).alias("boiler"),
        )
        .select(
            F.col(id_col),
            "n_kgrams",
            F.col("boiler").alias("boiler_kgrams"),
            F.round(F.col("boiler") / F.col("n_kgrams"), 6).alias(
                "boilerplate_frac"
            ),
        )
    )


# ------------------------------------------------- entropy / surprisal
#
# Quality signals for pre-training corpora (round 12): character-class
# entropy (a zero-shuffle proxy for gibberish/boilerplate detection),
# per-document token entropy (vocabulary diversity), and corpus n-gram
# surprisal (a CCNet-style LM-perplexity proxy where the "LM" is the
# corpus's own n-gram frequency table — fully distributed, no model
# download).  Regex syntax restricted to the Java/RE2 shared subset so
# the DuckDB oracle replays the same patterns.

_ENTROPY_CLASSES = (
    ("lower", "[a-z]"),
    ("upper", "[A-Z]"),
    ("digit", "[0-9]"),
    ("space", "[ \\t\\n]"),
    ("punct", "[.,;:!?]"),
)


def char_class_entropy(text: Column) -> Column:
    """Shannon entropy (bits) over six character classes — lower /
    upper / digit / space / punct / other.  Pure column expression:
    five regexp passes + arithmetic, all inside whole-stage codegen —
    ZERO shuffles, embarrassingly parallel at any scale.  Natural text
    lands near ~1.8-2.2 bits; key-mash and repeated-char junk collapse
    toward 0; base64/hex blobs push above 2.4."""
    n = F.length(text).cast("double")
    counts = [
        (
            n - F.length(F.regexp_replace(text, pat, "")).cast("double")
        ).alias(name)
        for name, pat in _ENTROPY_CLASSES
    ]
    other = n
    for c in counts:
        other = other - c
    terms = []
    for c in [*counts, other]:
        p = c / n
        terms.append(F.when(c > 0, -p * F.log2(p)).otherwise(F.lit(0.0)))
    total = terms[0]
    for t_ in terms[1:]:
        total = total + t_
    return F.when(n > 0, F.round(total, 4)).otherwise(F.lit(0.0))


def _words(text: Column) -> Column:
    """Lower-cased alphanumeric word array (empty strings dropped) —
    the shared tokenizer for entropy/surprisal, chosen because DuckDB's
    regexp_split_to_array + list_filter reproduces it exactly."""
    return F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"), lambda w: w != ""
    )


def token_entropy(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document token-frequency entropy (bits): explode words,
    count per (doc, word), fold -p*log2(p) per doc.  Two shuffles,
    both hash-partitioned on doc id (word counting co-partitions by
    the composite key) — no global state, scales linearly with corpus
    size.  Low entropy at normal length = repetitive template text."""
    words = df.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("w")
    )
    cnt = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    return (
        cnt.groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            # exact decimal partials: summing raw doubles is partition-
            # order-dependent and would drift vs the oracle (the dsum
            # contract, SURVEY §5.2); the per-value cast rounds each
            # c·log2(c) once, deterministically, then sums exactly
            F.sum(
                (F.col("c") * F.log2(F.col("c"))).cast("decimal(28,12)")
            ).alias("_clogc"),
        )
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            # -sum(c/n log2 c/n) == log2(n) - sum(c log2 c)/n : one
            # pass, no per-word division
            F.round(
                F.log2(F.col("n_tokens"))
                - F.col("_clogc").cast("double") / F.col("n_tokens"),
                4,
            ).alias("token_entropy"),
        )
    )


def ngram_surprisal(
    df: DataFrame, text_col: str, id_col: str, n: int = 2
) -> DataFrame:
    """Corpus n-gram surprisal — the distributed perplexity-proxy
    quality filter: build the corpus's own word-n-gram frequency table
    (one groupBy over exploded n-grams), then score each document by
    the mean negative log-probability of its n-grams under that table.

    100 TB design: n-gram generation is map-side; the model is an
    equi-join keyed on the n-gram (never all-pairs, skew-tolerant via
    AQE); the single scalar N rides a 1-row broadcast cross join.  A
    document full of n-grams nobody else uses scores HIGH (surprising
    = likely junk/garble); templated boilerplate scores LOW."""
    # materialize the word array through an explode(array(...)) generator
    # barrier (the minhash_signature pattern): Catalyst's CollapseProject
    # would otherwise inline the full-text regex split into EVERY
    # element_at inside the higher-order lambda — O(words) re-splits of
    # the document per row instead of one
    wdf = df.select(
        F.col(id_col), F.explode(F.array(_words(F.col(text_col)))).alias("w")
    )
    grams = F.when(
        F.size(F.col("w")) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(F.col("w")) - n),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(F.col("w"), i + k + 1) for k in range(n)],
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = wdf.select(F.col(id_col), F.explode(grams).alias("g"))
    model = occ.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    total = model.agg(F.sum("c").cast("double").alias("n_total"))
    return (
        occ.join(model, "g")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            # exact-decimal mean (same rationale as token_entropy): cast
            # each -ln p once, sum exactly, divide the final double
            F.round(
                F.sum(
                    (-F.log(F.col("c") / F.col("n_total")))
                    .cast("decimal(28,12)")
                ).cast("double") / F.count(F.lit(1)),
                4,
            ).alias("avg_surprisal"),
        )
    )
