"""TF-IDF / BM25: DuckDB-oracle value parity (float-tolerant compare —
ln() may differ in the last bit across engines) plus ranking sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.text_ranking import (
    bm25,
    term_frequencies,
    tfidf,
)
from distributed_mapreduce__spark.sources.tables import load_table
from tests.oracle_utils import compare_query

SF = "/root/testdata/sf0.01"

_TOKS = (
    "string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')"
)
_TF_CTE = f"""
  toks AS (
    SELECT doc_id, unnest({_TOKS}) AS term FROM documents
  ),
  t AS (
    SELECT doc_id, term, count(*) AS tf
    FROM toks WHERE term <> '' GROUP BY 1, 2
  ),
  dl AS (SELECT doc_id, sum(tf) AS dl FROM t GROUP BY 1),
  d AS (SELECT term, count(*) AS df FROM t GROUP BY 1),
  n AS (SELECT count(*) AS n_docs FROM documents)
"""


def test_term_frequencies_match_oracle(spark):
    docs = load_table(spark, SF, "documents")
    got = term_frequencies(docs).select("doc_id", "term", "tf", "dl")
    compare_query(
        spark,
        SF,
        got,
        f"WITH {_TF_CTE} SELECT t.doc_id, term, tf, dl.dl FROM t JOIN dl ON t.doc_id = dl.doc_id",
    )


def test_tfidf_matches_oracle(spark):
    docs = load_table(spark, SF, "documents")
    got = tfidf(docs)
    compare_query(
        spark,
        SF,
        got,
        f"""
        WITH {_TF_CTE}
        SELECT t.doc_id, t.term,
               tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS tfidf
        FROM t JOIN d ON t.term = d.term CROSS JOIN n
        """,
    )


def test_bm25_matches_oracle(spark):
    docs = load_table(spark, SF, "documents")
    query = "hash join"
    got = bm25(docs, query)
    compare_query(
        spark,
        SF,
        got,
        f"""
        WITH {_TF_CTE},
        avgdl AS (SELECT avg(dl) AS avgdl FROM dl)
        SELECT t.doc_id,
               sum(
                 ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * (tf * 2.2)
                 / (tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl))
               ) AS score
        FROM t
        JOIN d ON t.term = d.term
        JOIN dl ON t.doc_id = dl.doc_id
        CROSS JOIN n CROSS JOIN avgdl
        WHERE t.term IN ('hash', 'join')
        GROUP BY 1
        """,
    )


def test_inverted_index_matches_oracle(spark):
    from distributed_mapreduce__spark.operators.text_ranking import (
        inverted_index,
    )

    docs = load_table(spark, SF, "documents")
    got = inverted_index(docs)
    compare_query(
        spark,
        SF,
        got,
        f"""
        WITH {_TF_CTE}
        SELECT term, count(*) AS df,
               list_sort(list((doc_id, tf))) AS postings
        FROM t GROUP BY term
        """,
    )


def test_bigram_lm_matches_oracle(spark):
    from distributed_mapreduce__spark.operators.text_ranking import (
        bigram_lm_scores,
    )

    docs = load_table(spark, SF, "documents")
    got = bigram_lm_scores(docs, alpha=0.5)
    compare_query(
        spark,
        SF,
        got,
        f"""
        WITH tarr AS (
          SELECT doc_id,
                 list_filter({_TOKS}, t -> t <> '') AS ts
          FROM documents
        ),
        bg AS (
          SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
          FROM tarr, unnest(generate_series(1, len(ts) - 1)) AS u(i)
          WHERE len(ts) >= 2
        ),
        c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
        v AS (SELECT count(*) AS v FROM c1)
        SELECT bg.doc_id,
               count(*) AS n_bigrams,
               avg(ln((c12 + 0.5) / (c1 + 0.5 * v))) AS avg_logprob
        FROM bg
        JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
        JOIN c1 ON bg.w1 = c1.w1
        CROSS JOIN v
        GROUP BY 1
        """,
    )


def test_bigram_lm_penalizes_garbled_text(spark):
    """On a corpus with consistent word order, a garbled document (same
    words, order the corpus never produces) must score below every
    natural document. (The parquet fixture is near-random word soup, so
    this property needs a constructed corpus where order carries
    signal.)"""
    from distributed_mapreduce__spark.operators.text_ranking import (
        bigram_lm_scores,
    )

    sent = "the quick brown fox jumps over the lazy dog"
    garbled = "dog the over fox lazy brown jumps quick the"
    rows = [(i, sent) for i in range(50)] + [(99, garbled)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    scores = {r.doc_id: r.avg_logprob for r in bigram_lm_scores(docs).collect()}
    assert all(scores[i] > scores[99] for i in range(50))


def test_bm25_ranks_matching_docs_first(spark):
    """Every scored doc must actually contain a query term, and a doc
    containing both terms should outscore one with a single rarer-free
    term mix only via the idf/tf formula — sanity: scores positive."""
    docs = load_table(spark, SF, "documents")
    scored = bm25(docs, "hash join")
    rows = scored.collect()
    assert rows and all(r.score > 0 for r in rows)
    hit_ids = {r.doc_id for r in rows}
    containing = {
        r.doc_id
        for r in docs.filter(
            F.lower("text").rlike(r"\b(hash|join)\b")
        ).collect()
    }
    assert hit_ids == containing
