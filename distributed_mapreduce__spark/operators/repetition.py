"""Within-document repetition signals (Gopher-rule family).

Boilerplate and crawler artifacts show up as *internal* repetition —
duplicated lines, a single n-gram dominating the text, few distinct
words. These per-document signals (Rae et al. 2021's repetition-filter
family) complement cross-document dedup (operators/dedup.py): dedup
removes copies of a document, these flag documents that are copies of
themselves.

Shapes:
- ``dup_word_frac`` / ``dup_line_frac`` are pure per-row array algebra
  (zero shuffle, scan-speed at 100 TB).
- ``top_bigram_frac`` needs a per-document mode (most frequent bigram),
  computed the scalable way: explode → two partial-aggregated
  ``groupBy`` passes keyed on doc_id — shuffle keys are (doc_id,
  bigram) hashes, never document text. The O(tokens²)-per-doc
  array-only form would avoid the shuffle but blows up on long
  documents; the exploded form is linear and skew-safe (a single huge
  document salts naturally across its many bigrams).

All counts are exact integers; fractions are one int/int division, so
the doubles are engine-identical (tests/test_repetition.py pins DuckDB
parity on both the fixture corpus and constructed pathological docs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text_analysis import ws_tokens


def dup_word_frac(col: str = "text") -> Column:
    """1 - distinct/total whitespace tokens (0 for empty docs)."""
    toks = ws_tokens(col)
    n = F.size(toks)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(toks)) / n
    )


def dup_line_frac(col: str = "text") -> Column:
    """Fraction of newline-separated lines that repeat an earlier line."""
    lines = F.split(F.col(col), "\n")
    n = F.size(lines)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(lines)) / n
    )


def repetition_signals(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, dup_word_frac, dup_line_frac,
    top_bigram_frac): the per-doc repetition profile.

    ``top_bigram_frac`` = occurrences of the most frequent bigram /
    total bigrams; 0.0 for docs with < 2 tokens."""
    from ..plans.partitioning import spread

    docs = spread(docs)
    base = docs.select(
        "doc_id",
        ws_tokens().alias("toks"),
        dup_word_frac().alias("dup_word_frac"),
        dup_line_frac().alias("dup_line_frac"),
    ).select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        "dup_word_frac",
        "dup_line_frac",
        F.expr(
            "CASE WHEN size(toks) < 2 THEN array() "
            "ELSE transform(sequence(0, size(toks) - 2), "
            "i -> concat_ws(' ', toks[i], toks[i+1])) END"
        ).alias("bigrams"),
    )
    per_bigram = (
        base.select("doc_id", F.explode_outer("bigrams").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("bg").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.max("cnt").alias("top_cnt"),
            F.sum("cnt").alias("total_bg"),
        )
    )
    return (
        base.drop("bigrams")
        .join(per_bigram, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "dup_word_frac",
            "dup_line_frac",
            F.when(
                F.coalesce(F.col("total_bg"), F.lit(0)) <= 0, F.lit(0.0)
            )
            .otherwise(F.col("top_cnt") / F.col("total_bg"))
            .alias("top_bigram_frac"),
        )
    )
