"""Text-analysis operators for a large-scale training-data pipeline:
language-ID heuristic, quality scoring, token counting, fingerprinting.

All pure Column expressions (JVM-side, codegen) — no UDFs. Each has an
ANSI-SQL-equivalent form used by the DuckDB oracle in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# Deterministic and tiny by design (no external models in this sandbox).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
}

# BPE-ish tokenizer regex: words / numbers / single punctuation marks.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _hits(text_col, words) -> F.Column:
    toks = F.split(F.lower(text_col), r"\s+")
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.array_intersect(toks, arr)) + F.lit(0)


def with_token_counts(df: DataFrame, text: str = "text") -> DataFrame:
    """Whitespace token count + regex (BPE-ish) token count."""
    return df.withColumn(
        "ws_tokens", F.size(F.split(F.trim(F.col(text)), r"\s+"))
    ).withColumn("re_tokens", F.regexp_count(F.col(text), F.lit(TOKEN_RE)))


def with_quality_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Quality heuristics: length, punctuation ratio, stopword ratio, and a
    blended 0-1 score (long-enough, low punctuation, some stopwords)."""
    t = F.col(text)
    n_chars = F.length(t)
    n_punct = F.regexp_count(t, F.lit(r"[^A-Za-z0-9\s]"))
    n_tokens = F.size(F.split(F.trim(t), r"\s+"))
    sw = _hits(t, [w for ws in STOPWORDS.values() for w in ws])
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4)
    stop_ratio = F.round(sw / F.greatest(n_tokens, F.lit(1)), 4)
    score = F.round(
        F.least(n_chars / F.lit(200.0), F.lit(1.0)) * 0.5
        + (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 10.0, F.lit(1.0)) * 0.2,
        4,
    )
    return (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stop_ratio", stop_ratio)
        .withColumn("quality", score)
    )


def with_lang_guess(df: DataFrame, text: str = "text") -> DataFrame:
    """Stopword-hit language ID over the tiny lists; ties and no-hits -> 'und'."""
    en, es, de = (
        _hits(F.col(text), STOPWORDS["en"]),
        _hits(F.col(text), STOPWORDS["es"]),
        _hits(F.col(text), STOPWORDS["de"]),
    )
    best = F.greatest(en, es, de)
    guess = (
        F.when(best == 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(es == best, F.lit("es"))
        .otherwise(F.lit("de"))
    )
    return df.withColumn("lang_guess", guess)


def with_repetition_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Repetition-based quality signals (the Gopher-rule family, public:
    Rae et al. 2021 'Scaling Language Models' appendix A1.1 — fraction of
    duplicate n-grams / characters in most-common n-gram): here the
    word-level pair —

    - ``dup_word_frac``: 1 - distinct_words / words
    - ``top_bigram_frac``: occurrences of the most frequent word bigram /
      total bigrams (NULL when fewer than 2 words)

    Pure Column expressions: the per-row bigram mode comes from
    array_sort + a single aggregate() scan tracking the longest equal-run
    (JVM codegen, no explode, no UDF) — so the filter runs scan-side at any
    corpus size with zero shuffles."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text))), r"\s+", " ")
    toks = F.split(norm, " ")
    n = F.size(toks)
    dup_word_frac = F.round(
        1.0 - F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1)), 6
    )
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    srt = F.array_sort(bigrams)
    # longest run of equal adjacent elements in the sorted array = max
    # bigram frequency; one aggregate() pass with a (prev, run, best) state
    state0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    top_n = F.aggregate(
        srt,
        state0,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    n_bigrams = F.size(bigrams)
    top_bigram_frac = F.when(
        n_bigrams > 0, F.round(top_n / n_bigrams, 6)
    )
    return (
        df.withColumn("dup_word_frac", dup_word_frac)
        .withColumn("n_bigrams", n_bigrams)
        .withColumn("top_bigram_frac", top_bigram_frac)
    )


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    by: str = "lang_guess",
    tokens: str = "ws_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quota sampling for training mixes: within each ``by`` group (e.g.
    language), keep documents in deterministic priority order (most tokens
    first, id as tiebreak) until the group's cumulative token count would
    exceed ``budget_tokens``. The kept set is reproducible run to run
    (integer sort keys, no float-rank ties).

    Scale shape: a naive cumsum window over (group) is a single-partition
    sort PER GROUP — with ~10 languages over 10^12 docs that's 10 global
    sorts. Instead: (1) aggregate a per-(group, token-count) histogram
    (tiny — bounded by distinct lengths); (2) a cumsum over the histogram
    (descending length) finds, per group, the lengths that are FULLY kept
    and the single boundary length where the budget crosses; (3) fully-kept
    lengths semi-join back (no sort at all); the id-ordered window runs
    only over the boundary length's docs. Result is identical to the naive
    prefix; the only large sort left is over one length-class per group
    (degenerate only if the whole corpus shares one exact length)."""
    from pyspark.sql import Window as W

    hist = df.groupBy(by, tokens).agg(F.sum(tokens).alias("__bucket_sum"))
    wh = (
        W.partitionBy(by)
        .orderBy(F.col(tokens).desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    hist = hist.withColumn("__cum_after", F.sum("__bucket_sum").over(wh))
    hist = hist.withColumn(
        "__cum_before", F.col("__cum_after") - F.col("__bucket_sum")
    )
    full_buckets = hist.where(F.col("__cum_after") <= budget_tokens).select(
        by, tokens
    )
    boundary = hist.where(
        (F.col("__cum_before") <= budget_tokens)
        & (F.col("__cum_after") > budget_tokens)
    ).select(by, tokens, "__cum_before")
    kept_full = df.join(full_buckets, [by, tokens], "left_semi")
    wb = (
        W.partitionBy(by)  # only boundary-length docs reach this window
        .orderBy(F.col(id_col).asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    kept_boundary = (
        df.join(boundary, [by, tokens])
        .withColumn("__cum", F.col("__cum_before") + F.sum(tokens).over(wb))
        .where(F.col("__cum") <= budget_tokens)
        .drop("__cum", "__cum_before")
    )
    return kept_full.unionByName(kept_boundary)


def with_fingerprint(df: DataFrame, text: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text —
    the exact-near-dup key (a rolling-hash analog that both engines share)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text))), r"\s+", " ")
    return df.withColumn("fingerprint", F.md5(norm))
