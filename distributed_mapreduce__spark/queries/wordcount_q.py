"""Registered queries for the reference's word-count surface (§2.1 Q1).

Run over ``documents.text`` (fixture B) — the reference's own two-file
corpus is exercised order-sensitively in tests/test_wordcount_golden.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.wordcount import top_k_words, word_counts
from ..registry import register
from ..sources.tables import load_table

# DuckDB equivalents of tokenize (O2: split on whitespace runs) and
# normalize (O3: trim the exact cutset ".,!?:;\"'" from both ends, then
# lower). The 'g' flag makes one regexp_replace handle both anchored ends.
_WORDS_SQL = """
    SELECT lower(regexp_replace(tok, '^[.,!?:;"'']+|[.,!?:;"'']+$', '', 'g')) AS word
    FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS tok FROM documents)
    WHERE lower(regexp_replace(tok, '^[.,!?:;"'']+|[.,!?:;"'']+$', '', 'g')) <> ''
"""


@register(
    "wordcount_full",
    oracle=f"""
    SELECT word, count(*) AS cnt
    FROM ({_WORDS_SQL})
    GROUP BY word
    """,
)
def wordcount_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global per-word counts over the documents corpus (O1-O9)."""
    docs = load_table(spark, sf_dir, "documents")
    return word_counts(docs, text_col="text")


@register(
    "wordcount_topk",
    oracle=f"""
    SELECT word, count(*) AS cnt
    FROM ({_WORDS_SQL})
    GROUP BY word
    ORDER BY cnt DESC, word ASC
    LIMIT 5
    """,
)
def wordcount_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship: top-5 words, count desc / word asc
    tie-break (O12-O13; k=5 per main.go:21). Deterministic total order →
    LIMIT agrees across engines."""
    docs = load_table(spark, sf_dir, "documents")
    return top_k_words(docs, text_col="text", k=5)
