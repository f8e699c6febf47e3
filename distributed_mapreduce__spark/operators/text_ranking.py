"""TF-IDF / BM25 text ranking (LLM-pipeline surface).

Quality filtering and retrieval over a web-scale corpus need lexical
relevance scores. Everything is built from DataFrame ops over the
parity tokenization (whitespace-collapse + literal-space split, same
arrays in Spark and DuckDB):

- ``term_frequencies`` — (doc_id, term, tf) + per-doc length.
- ``doc_frequencies``  — (term, df): distinct-doc counts.
- ``tfidf``            — tf · ln((N+1)/(df+1)) + smoothing.
- ``bm25``             — Okapi BM25 (k1=1.2, b=0.75) of every document
                         against a query string.

Scale: one explode + two hash aggregations; the per-term statistics
(vocabulary-sized, not corpus-sized) join back via broadcast. The
corpus-wide scalars (N, avgdl) ride along as literal aggregates in a
1-row broadcast join — no driver round-trip, no ``collect``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def _tokens(col: str = "text") -> Column:
    """Whitespace-collapsed literal-space split (engine-identical
    arrays; see the dedup shingler for the same contract)."""
    return F.split(
        F.regexp_replace(F.trim(F.lower(F.col(col))), r"\s+", " "), " "
    )


def term_frequencies(docs: DataFrame, col: str = "text") -> DataFrame:
    """(doc_id, term, tf, dl): term counts + document length in tokens.

    Partial aggregation collapses each scan partition's repeats before
    the one shuffle on (doc_id, term)."""
    from ..plans.partitioning import spread

    toks = (
        spread(docs)
        .select("doc_id", F.explode(_tokens(col)).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    return tf.join(dl, "doc_id")


def doc_frequencies(tf: DataFrame) -> DataFrame:
    """(term, df): number of documents containing the term. Input is
    already one row per (doc, term), so this is a plain count."""
    return tf.groupBy("term").agg(F.count("*").alias("df"))


def tfidf(docs: DataFrame, col: str = "text") -> DataFrame:
    """(doc_id, term, tfidf) with the smoothed idf
    ln((N+1)/(df+1)) + 1 — strictly positive, defined for df=N.

    N arrives as a 1-row aggregate cross-joined in (broadcast of one
    row); df is vocabulary-sized and broadcasts too at any corpus size
    with a bounded vocabulary."""
    tf = term_frequencies(docs, col)
    dfreq = doc_frequencies(tf)
    n = docs.agg(F.count("*").alias("n_docs"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                )
            ).alias("tfidf"),
        )
    )


def inverted_index(docs: DataFrame, col: str = "text") -> DataFrame:
    """(term, df, postings): per-term document frequency + the sorted
    posting list of (doc_id, tf) structs.

    Postings are ``array_sort``-ed so the result is deterministic and
    partition-independent. One explode + one shuffle on term. At
    100 TB a single term's postings can exceed a task's memory
    (stop-word-like terms) — production layout keeps the EXPLODED
    (term, doc_id, tf) relation bucketed by term instead and treats
    this collected form as an export format for bounded vocabularies
    (our fixtures: ~31 terms). Term lookups against the exploded form
    are one pruned scan, no list materialization."""
    tf = term_frequencies(docs, col)
    return tf.groupBy("term").agg(
        F.count("*").alias("df"),
        F.array_sort(
            F.collect_list(F.struct("doc_id", "tf"))
        ).alias("postings"),
    )


def bm25(
    docs: DataFrame,
    query: str,
    col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(doc_id, score): Okapi BM25 of each document against ``query``.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5));
    score  = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl)).

    Only rows whose term is in the (tiny, literal) query term set
    survive the first join, so the scored relation is |matching
    postings|, not the corpus."""
    q_terms = sorted(
        {t for t in query.strip().lower().split() if t}
    )
    if not q_terms:
        raise ValueError("empty query")
    tf_all = term_frequencies(docs, col)
    tf = tf_all.filter(F.col("term").isin(q_terms))
    dfreq = doc_frequencies(tf)  # df only needed for query terms
    stats = docs.agg(F.count("*").alias("n_docs"))
    avgdl = (
        tf_all.select("doc_id", "dl")
        .distinct()
        .agg(F.avg("dl").alias("avgdl"))
    )
    idf = (
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
    ).alias("idf")
    per_term = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .join(F.broadcast(avgdl))
        .select(
            "doc_id",
            (
                idf
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("contrib"),
        )
    )
    return per_term.groupBy("doc_id").agg(F.sum("contrib").alias("score"))
