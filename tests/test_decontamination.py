"""Decontamination scan: n-gram overlap between a (small) eval set and
the training corpus, DuckDB-oracle-checked on the fixtures with the
fixture docs themselves playing the eval set."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.dedup import ngram_contamination
from distributed_mapreduce__spark.sources.tables import load_table
from tests.oracle_utils import compare_query

SF = "/root/testdata/sf0.01"

_TOKS = "string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')"
_SH = f"""
  tarr AS (SELECT doc_id, {_TOKS} AS t FROM documents),
  tpos AS (SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos FROM tarr),
  sh AS (
    SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
    FROM tpos a
    JOIN tpos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    JOIN tpos c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  )
"""


def test_contamination_matches_oracle(spark):
    docs = load_table(spark, SF, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 100 == 0)
    got = ngram_contamination(docs, eval_docs, n=3)
    compare_query(
        spark,
        SF,
        got,
        f"""
        WITH {_SH}
        SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc,
               count(*) AS n_shared
        FROM sh t
        JOIN (SELECT * FROM sh WHERE doc_id % 100 = 0) e
          ON t.shingle = e.shingle
        GROUP BY 1, 2
        """,
    )


def test_every_eval_doc_flags_itself(spark):
    """An eval doc present verbatim in training data is the canonical
    leak — the scan must flag the identity pair with the full shingle
    count."""
    docs = load_table(spark, SF, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 100 == 0)
    hits = ngram_contamination(docs, eval_docs, n=3)
    self_hits = {
        r.train_doc for r in hits.filter(F.col("train_doc") == F.col("eval_doc")).collect()
    }
    with_shingles = {
        r.doc_id
        for r in eval_docs.filter(
            F.size(F.split(F.regexp_replace(F.trim("text"), r"\s+", " "), " ")) >= 3
        ).collect()
    }
    assert self_hits == with_shingles


def test_decontaminate_bloom_leaves_no_cached_blocks(spark):
    """decontaminate_bloom persists the eval shingles for its eager
    consumers (sizing count + bitset build) but must release them
    before returning — a bench loop or build_training_set calling it
    repeatedly would otherwise accumulate cached blocks for the life
    of the session."""
    from distributed_mapreduce__spark.operators.bloom import decontaminate_bloom

    docs = load_table(spark, SF, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    for _ in range(2):
        decontaminate_bloom(docs, eval_docs, n=3).count()
    assert jsc.getPersistentRDDs().size() == before
