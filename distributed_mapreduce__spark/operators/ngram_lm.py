"""Trained n-gram language model with stupid backoff — the CCNet-style
perplexity quality filter (LLM-pipeline surface; no counterpart in the
reference, whose only dataflow is word count — mapreduce/mapreduce.go:30-56).

Public recipe lineage:

- Brants et al., "Large Language Models in Machine Translation"
  (EMNLP 2007): *stupid backoff* — score S(w|context) is the relative
  frequency at the longest matching order, backing off with a constant
  factor α (0.4 in the paper) per level instead of normalized
  discounting. Chosen there precisely BECAUSE it trains as a
  distributed MapReduce job over web-scale corpora — count n-grams,
  divide by context counts — which is this repo's whole theme.
- Wenzek et al., "CCNet" (arXiv:1911.00359): score crawl documents
  with an LM trained on clean text and keep/bucket by perplexity; this
  module is that filter with the LM itself trained as a dataflow (the
  production alternative is KenLM, a native artifact this container
  can't host).

Scale design (100 TB):

- **Training** is two hash aggregations over the exploded token stream:
  count (context, word) per order 1..n, then divide by the context
  totals (computed from the SAME counts by re-aggregating the
  vocabulary-sized relation — the corpus is touched once). The model
  relation is vocabulary-bounded (≤ distinct-n-gram rows, pruned by
  ``min_count``), never corpus-bounded.
- **Scoring** joins each token position against the per-order model
  slices with plain UNHINTED equi-joins on (context, word) — AQE
  broadcasts a small model and shuffle-hash-joins a big one (the
  round-6 ANN discipline: never force a broadcast from the query
  side). One explode + n left joins + one per-doc aggregation.
- Everything is JVM-side column algebra (whole-stage codegen); no
  Python in the hot path.

Tokenization is the engine-parity contract every text operator here
uses (lowercase, whitespace-collapse, literal-space split) so DuckDB
replays the whole pipeline bit-for-bit up to float associativity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Brants et al.'s backoff factor.
STUPID_BACKOFF_ALPHA = 0.4

#: Score floor for out-of-vocabulary words (stupid backoff leaves OOV
#: to the application; a hard floor keeps ln() finite and makes OOV-
#: heavy documents score as the garbage they usually are).
OOV_SCORE = 1e-9


def _tokens(col: str = "text") -> Column:
    from .text_ranking import _tokens as t

    return t(col)


def train_ngram_lm(
    docs: DataFrame,
    n: int = 3,
    col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Train: (order, context, word, rel_freq) for orders 1..``n``.

    ``context`` is the space-joined ``order-1`` preceding tokens (empty
    string for unigrams); ``rel_freq`` = c(context, word) /
    c(context·) — the stupid-backoff relative frequency at that order.
    ``min_count`` prunes rare HIGHER-order numerators (unigrams always
    survive, so scoring can always back off to something); the
    denominators are computed BEFORE pruning, keeping surviving scores
    exact rather than renormalized over survivors.

    One pass over the corpus: the position explode emits every order's
    (context, word) pair at once; a single groupBy counts them all;
    context totals re-aggregate that vocabulary-sized count relation.
    """
    if n < 1:
        raise ValueError(f"need n >= 1, got {n}")
    toks = docs.select(
        F.filter(_tokens(col), lambda t: t != "").alias("ts")
    ).filter(F.size("ts") >= 1)
    # per position i and order k (1..n, k <= i+1): context = tokens
    # [i-k+1, i), word = tokens[i]  — one explode emits all orders
    grams = F.expr(
        f"""
        flatten(transform(sequence(0, size(ts) - 1), i ->
          transform(sequence(1, least({n}, i + 1)), k ->
            struct(k AS order,
                   array_join(slice(ts, i - k + 2, k - 1), ' ') AS context,
                   ts[i] AS word))))
        """
    )
    pairs = toks.select(F.explode(grams).alias("g")).select(
        "g.order", "g.context", "g.word"
    )
    counts = pairs.groupBy("order", "context", "word").agg(
        F.count("*").alias("cnt")
    )
    totals = counts.groupBy("order", "context").agg(
        F.sum("cnt").alias("ctx_total")
    )
    return (
        counts.filter((F.col("order") == 1) | (F.col("cnt") >= min_count))
        .join(totals, ["order", "context"])
        .select(
            "order",
            "context",
            "word",
            (F.col("cnt") / F.col("ctx_total")).alias("rel_freq"),
        )
    )


def ngram_lm_scores(
    docs: DataFrame,
    model: DataFrame,
    n: int = 3,
    col: str = "text",
    alpha: float = STUPID_BACKOFF_ALPHA,
    oov_score: float = OOV_SCORE,
) -> DataFrame:
    """Score documents under a trained model: (doc_id, n_tokens,
    avg_logscore, ppl) — ``ppl = exp(-avg_logscore)``, the perplexity
    proxy CCNet buckets on (S is not a normalized probability, so this
    is a ranking score, exactly as in the paper).

    Per token position the score is the relative frequency at the
    LONGEST order the position's history allows and the model contains,
    with an ``alpha`` multiplier per backed-off level; a word absent
    even from the unigram slice scores ``oov_score``. Train on clean
    text, score the crawl — rising ppl = falling fluency.
    """
    if n < 1:
        raise ValueError(f"need n >= 1, got {n}")
    toks = docs.select(
        "doc_id", F.filter(_tokens(col), lambda t: t != "").alias("ts")
    ).filter(F.size("ts") >= 1)
    pos = F.expr(
        f"""
        transform(sequence(0, size(ts) - 1), i ->
          struct(least({n}, i + 1) AS max_order,
                 transform(sequence(1, {n}), k ->
                   CASE WHEN k <= i + 1
                        THEN array_join(slice(ts, i - k + 2, k - 1), ' ')
                   END) AS ctxs,
                 ts[i] AS word))
        """
    )
    scored = toks.select(
        "doc_id", F.explode(pos).alias("p")
    ).select("doc_id", "p.max_order", "p.ctxs", "p.word")
    # one left join per order against that order's model slice —
    # unhinted: AQE broadcasts a small model, shuffles a big one
    for k in range(1, n + 1):
        mk = (
            model.filter(F.col("order") == k)
            .select(
                F.col("context").alias(f"_ctx{k}"),
                F.col("word").alias(f"_w{k}"),
                F.col("rel_freq").alias(f"_s{k}"),
            )
        )
        scored = scored.join(
            mk,
            (F.element_at(F.col("ctxs"), k) == F.col(f"_ctx{k}"))
            & (F.col("word") == F.col(f"_w{k}")),
            "left",
        ).drop(f"_ctx{k}", f"_w{k}")
    # longest available order wins; each level short of the position's
    # own maximum order costs one alpha factor
    score = F.lit(None).cast("double")
    for k in range(1, n + 1):
        backoff = (
            F.pow(F.lit(alpha), F.col("max_order") - F.lit(k))
            * F.col(f"_s{k}")
        )
        score = F.when(
            F.col(f"_s{k}").isNotNull() & (F.col("max_order") >= k), backoff
        ).otherwise(score)
    score = F.coalesce(
        score,
        F.pow(F.lit(alpha), F.col("max_order") - 1) * F.lit(oov_score),
    )
    return (
        scored.select("doc_id", score.alias("s"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg(F.log("s")).alias("avg_logscore"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "avg_logscore",
            F.exp(-F.col("avg_logscore")).alias("ppl"),
        )
    )


def perplexity_filter(
    docs: DataFrame,
    model: DataFrame,
    max_ppl: float,
    n: int = 3,
    col: str = "text",
) -> DataFrame:
    """Keep documents whose perplexity under ``model`` is ≤
    ``max_ppl`` — the CCNet head/middle cut as one composable stage
    (score join is doc-keyed; the text columns ride through
    untouched)."""
    scores = ngram_lm_scores(docs, model, n=n, col=col).select(
        "doc_id", "ppl"
    )
    return docs.join(scores, "doc_id").filter(
        F.col("ppl") <= F.lit(max_ppl)
    )
