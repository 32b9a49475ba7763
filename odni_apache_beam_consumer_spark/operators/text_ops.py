"""Text-analysis building blocks: tokenization, shingling, quality stats.

All pure JVM-side column expressions (split / higher-order array functions)
— no Python UDFs, so everything stays inside whole-stage codegen and
scales linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Demo stopword/marker lists over the synthetic corpus vocabulary; real
# deployments swap in real per-language lists (the plumbing is identical).
STOPWORDS = ["the", "a", "of", "to", "in", "and"]

LANG_MARKERS: dict[str, list[str]] = {
    "de": ["data", "der", "die"],
    "en": ["the", "a", "and"],
    "es": ["row", "los", "las"],
    "fr": ["key", "le", "la"],
    "zh": ["hash", "shi", "de2"],
}


def tokens(text_col: str | Column = "text") -> Column:
    """Whitespace tokenization of trimmed text -> array<string>."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(c), " ")


def with_tokens(df: DataFrame, text_col: str = "text", out: str = "tk") -> DataFrame:
    return df.withColumn(out, tokens(text_col))


def word_shingles(tk_col: str, n: int) -> Column:
    """Distinct n-word shingles of a token array (1-indexed slice, matching
    DuckDB list slicing so oracles line up)."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, size({tk_col}) - {n - 1}), i -> "
            f"concat_ws(' ', slice({tk_col}, i, {n})))"
        )
    )


def stopword_count(tk_col: str, stopwords: list[str] | None = None) -> Column:
    words = stopwords if stopwords is not None else STOPWORDS
    arr = ", ".join(f"'{w}'" for w in words)
    return F.size(F.expr(f"filter({tk_col}, t -> array_contains(array({arr}), t))"))


def marker_count(tk_col: str, markers: list[str]) -> Column:
    arr = ", ".join(f"'{w}'" for w in markers)
    return F.size(F.expr(f"filter({tk_col}, t -> array_contains(array({arr}), t))"))
