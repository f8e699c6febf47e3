"""Repetition signals: DuckDB-oracle parity on the fixture corpus plus
constructed pathological documents where the expected fractions are
hand-computable."""

from __future__ import annotations

from distributed_mapreduce__spark.operators.repetition import (
    repetition_signals,
)
from distributed_mapreduce__spark.sources.tables import load_table
from tests.oracle_utils import compare_query

SF = "/root/testdata/sf0.01"

ORACLE = """
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS t,
         string_split(text, chr(10)) AS l
  FROM documents
), base AS (
  SELECT doc_id,
         len(t) AS n_tokens,
         CASE WHEN len(t) <= 0 THEN 0.0
              ELSE CAST(1 AS DOUBLE) - len(list_distinct(t)) / len(t)
         END AS dup_word_frac,
         CASE WHEN len(l) <= 0 THEN 0.0
              ELSE CAST(1 AS DOUBLE) - len(list_distinct(l)) / len(l)
         END AS dup_line_frac,
         CASE WHEN len(t) < 2 THEN []
              ELSE list_transform(generate_series(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i + 1])
         END AS bigrams
  FROM toks
), bg AS (
  SELECT doc_id, unnest(bigrams) AS bg FROM base
), cnts AS (
  SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY doc_id, bg
), top AS (
  SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS total_bg
  FROM cnts GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(b.n_tokens AS INTEGER) AS n_tokens,
       b.dup_word_frac,
       b.dup_line_frac,
       CASE WHEN coalesce(t.total_bg, 0) <= 0 THEN 0.0
            ELSE t.top_cnt / t.total_bg
       END AS top_bigram_frac
FROM base b LEFT JOIN top t USING (doc_id)
"""


def test_repetition_matches_oracle_on_corpus(spark):
    docs = load_table(spark, SF, "documents")
    got = repetition_signals(docs)
    compare_query(spark, SF, got, ORACLE)


def test_repetition_on_pathological_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a a b"),
            (2, "all words here are unique"),
            (3, "x\ny\nx\nz"),
            (4, "solo"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_signals(docs).collect()}

    assert abs(rows[1].dup_word_frac - 0.6) < 1e-12  # 1 - 2/5
    assert abs(rows[1].top_bigram_frac - 0.75) < 1e-12  # "a a" 3 of 4
    assert rows[2].dup_word_frac == 0.0
    assert rows[2].top_bigram_frac == 0.25  # all bigrams unique, 1/4
    assert abs(rows[3].dup_line_frac - 0.25) < 1e-12  # 1 - 3/4
    assert rows[4].n_tokens == 1
    assert rows[4].top_bigram_frac == 0.0  # < 2 tokens, no bigrams
    assert rows[5].dup_word_frac == 0.0 and rows[5].top_bigram_frac == 0.0
