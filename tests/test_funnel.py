"""Filter funnel: hand-checkable accounting on planted docs, DuckDB
parity for the sequential funnel on the fixture corpus, and the
kept-set/report consistency invariant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.funnel import (
    apply_filters,
    funnel_report,
    kept,
)
from distributed_mapreduce__spark.operators.repetition import dup_word_frac
from distributed_mapreduce__spark.sources.tables import load_table
from tests.oracle_utils import compare_query

SF = "/root/testdata/sf0.01"


def _rules():
    return [
        ("min_chars", F.length("text") >= 30),
        ("min_tokens", F.size(F.split(F.regexp_replace(F.trim("text"), r"\s+", " "), " ")) >= 8),
        ("dup_words", dup_word_frac() <= 0.4),
    ]


ORACLE = """
WITH scored AS (
  SELECT doc_id,
         length(text) >= 30 AS b1,
         len(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) >= 8 AS b2,
         (CASE WHEN len(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')) <= 0
               THEN 0.0
               ELSE CAST(1 AS DOUBLE)
                    - len(list_distinct(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')))
                      / len(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '))
          END) <= 0.4 AS b3
  FROM documents
), tagged AS (
  SELECT CASE WHEN NOT b1 THEN 'min_chars'
              WHEN NOT b2 THEN 'min_tokens'
              WHEN NOT b3 THEN 'dup_words' END AS reason
  FROM scored
), drops AS (
  SELECT
    count(*) AS n_total,
    count(*) FILTER (reason = 'min_chars') AS d1,
    count(*) FILTER (reason = 'min_tokens') AS d2,
    count(*) FILTER (reason = 'dup_words') AS d3
  FROM tagged
)
SELECT 1 AS rule_idx, 'min_chars' AS rule, n_total AS n_in,
       d1 AS n_dropped, n_total - d1 AS n_out FROM drops
UNION ALL
SELECT 2, 'min_tokens', n_total - d1, d2, n_total - d1 - d2 FROM drops
UNION ALL
SELECT 3, 'dup_words', n_total - d1 - d2, d3, n_total - d1 - d2 - d3
FROM drops
"""


def test_funnel_matches_oracle(spark):
    docs = load_table(spark, SF, "documents")
    got = funnel_report(docs, _rules())
    compare_query(spark, SF, got, ORACLE)


def test_funnel_accounting_on_planted_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "long enough text with many distinct words in this row ok"),
            (2, "short"),  # fails min_chars
            (3, "this one has at least thirty characters but few"),  # passes all
            (4, "a a a a a a a a a a a a a a a a a a a a a a a a a a a a"),  # dup
            (5, "also definitely above thirty characters with nine whole tokens"),
        ],
        "doc_id long, text string",
    )
    rules = _rules()
    report = {r.rule: r for r in funnel_report(docs, rules).collect()}

    assert report["min_chars"].n_in == 5
    assert report["min_chars"].n_dropped == 1  # doc 2
    assert report["min_tokens"].n_in == 4
    assert report["min_tokens"].n_dropped == 0
    assert report["dup_words"].n_dropped == 1  # doc 4
    assert report["dup_words"].n_out == 3

    reasons = {
        r.doc_id: r.drop_reason for r in apply_filters(docs, rules).collect()
    }
    assert reasons[2] == "min_chars" and reasons[4] == "dup_words"
    assert reasons[1] is None and reasons[3] is None

    assert {r.doc_id for r in kept(docs, rules).collect()} == {1, 3, 5}


def test_kept_count_equals_final_n_out(spark):
    docs = load_table(spark, SF, "documents")
    rules = _rules()
    rows = funnel_report(docs, rules).collect()
    assert rows[-1].n_out == kept(docs, rules).count()
    # conservation: each rule's output feeds the next rule's input
    for a, b in zip(rows, rows[1:]):
        assert a.n_out == b.n_in


def test_funnel_rejects_bad_rules(spark):
    docs = spark.range(1).selectExpr("id AS doc_id", "'x' AS text")
    with pytest.raises(ValueError):
        funnel_report(docs, [])
    with pytest.raises(ValueError):
        apply_filters(
            docs, [("r", F.lit(True)), ("r", F.lit(False))]
        )


def test_null_predicate_drops_like_sequential_filters(spark):
    """A rule evaluating to NULL (comparison over a NULL column) must
    drop the row AND be the attributed reason — matching what a
    sequential df.filter(p) chain does — not silently pass it through
    to be kept or blamed on a later rule (ADVICE r3)."""
    docs = spark.createDataFrame(
        [
            (1, "long enough text with many distinct words here ok", 0.9),
            (2, "equally long text with plenty of distinct words too", None),
            (3, "x", None),  # fails min_chars BEFORE the NULL quality rule
        ],
        "doc_id long, text string, score double",
    )
    rules = [
        ("min_chars", F.length("text") >= 30),
        ("min_score", F.col("score") > 0.5),  # NULL score → NULL predicate
    ]

    reasons = {r.doc_id: r.drop_reason for r in apply_filters(docs, rules).collect()}
    assert reasons[1] is None
    assert reasons[2] == "min_score"  # NULL attributed to the NULL-failing rule
    assert reasons[3] == "min_chars"  # earlier hard fail wins over later NULL

    # kept() == sequential filter-chain semantics
    seq = docs
    for _, p in rules:
        seq = seq.filter(p)
    assert {r.doc_id for r in kept(docs, rules).collect()} == {
        r.doc_id for r in seq.collect()
    } == {1}

    report = {r.rule: r for r in funnel_report(docs, rules).collect()}
    assert report["min_chars"].n_dropped == 1
    assert report["min_score"].n_dropped == 1
    assert report["min_score"].n_out == 1
