"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's own operators (task brief): language-ID, quality
scoring, token counting, document fingerprinting — each as a pure Spark
SQL expression tree (JVM-side, no UDFs), designed so an exact DuckDB
oracle SQL exists for the driver harness.

Determinism note: every score is built from integer counts and a single
final division/rounding, so Spark and DuckDB produce bit-identical
doubles (no accumulation-order sensitivity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# stopword marker sets for the n-gram language heuristic; counted via the
# replace-trick so the same expression exists in any SQL dialect
EN_MARKERS = [" the ", " a ", " of ", " and "]
FR_MARKERS = [" le ", " la ", " et ", " des "]


def count_occurrences(col: Column, needle: str) -> Column:
    """Occurrences of a literal substring: (len(x)-len(replace(x,n)))/len(n)."""
    return (
        F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))
    ) / len(needle)


def tokens(col: Column) -> Column:
    """Whitespace tokens with empties removed (split on single space —
    corpus text is single-spaced; use \\s+ split for raw text)."""
    return F.filter(F.split(col, " "), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
# the usual pre-split baseline for subword tokenizers
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(col: Column) -> Column:
    """Token count under the BPE-ish regex (JVM regexp_count — no UDF)."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_RE)).cast("long")


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: stopword-marker counts per language family,
    highest count wins (en-biased tie-break, deterministic)."""
    c = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    en = sum((count_occurrences(c, m) for m in EN_MARKERS), F.lit(0.0))
    fr = sum((count_occurrences(c, m) for m in FR_MARKERS), F.lit(0.0))
    guess = (
        F.when((en == 0) & (fr == 0), "unknown")
        .when(en >= fr, "en")
        .otherwise("fr")
    )
    return df.withColumn("en_hits", en).withColumn("fr_hits", fr).withColumn(
        "lang_guess", guess
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring from length / punctuation / stopword ratios
    (the boilerplate-vs-content signals of jusText-style filters).

    score = 0.4*stop_ratio + 0.3*alpha_ratio + 0.3*len_norm, rounded to 6
    decimals — all ratios are single divisions of integer counts, so the
    double is identical across engines.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    spaces = n_chars - F.length(F.replace(t, F.lit(" "), F.lit("")))
    punct = n_chars - F.length(F.regexp_replace(t, r"[^a-zA-Z0-9 ]", ""))
    c = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    stop_hits = sum(
        (count_occurrences(c, m) for m in EN_MARKERS + FR_MARKERS),
        F.lit(0.0),
    )
    stop_ratio = stop_hits / n_tokens
    alpha_ratio = (n_chars - punct - spaces) / n_chars
    len_norm = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    score = F.round(
        0.4 * stop_ratio + 0.3 * alpha_ratio + 0.3 * len_norm, 6
    )
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("quality", score)
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set —
    order-insensitive content hash (bag-of-words identity), the cheap
    canonical-form dedup key."""
    fp = F.md5(
        F.array_join(
            F.array_sort(F.array_distinct(tokens(F.col(text_col)))), " "
        )
    )
    return df.withColumn("fp", fp)
