"""End-to-end training-corpus preparation (the LLM-pipeline composite).

``prepare_corpus`` chains the pipeline a pre-training data run actually
executes, each stage an operator already proven on its own:

1. exact dedup      — keep one canonical copy per normalized text
                      (min doc_id wins — deterministic survivor).
2. quality gate     — keep documents above a quality-score threshold
                      (operators/text_analysis.quality_expr).
3. language filter  — optional allow-list on the language column.
4. split assignment — content-addressed train/val/test tags
                      (operators/sampling.hash_split: stable under
                      corpus growth and task retries).

Every stage is deterministic column algebra, so the WHOLE composition
is DuckDB-oracle-checkable end-to-end (tests/test_corpus_pipeline.py)
— the integration-level guarantee that the stages compose without
order-dependence.

Scale: dedup is the only shuffle (a window over md5 of normalized
text — 32-byte keys); quality, language, and split are projections.
The output is ready for
``sources.sinks.overwrite_partitions(df, path, "split")`` — re-runs
rewrite only the partitions they produce.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalized_text
from .sampling import hash_split
from .text_analysis import quality_expr

DEFAULT_SPLITS: Mapping[str, float] = {"train": 0.9, "val": 0.05, "test": 0.05}


def prepare_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    languages: Sequence[str] | None = None,
    splits: Mapping[str, float] = DEFAULT_SPLITS,
    seed: int = 0,
) -> DataFrame:
    """documents → (doc_id, text, lang, quality, split): deduped,
    quality-gated, language-filtered, split-tagged (module docstring)."""
    w = Window.partitionBy("_h").orderBy(F.asc("doc_id"))
    canonical = (
        docs.withColumn("_h", F.md5(normalized_text("text")))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_h")
    )
    scored = canonical.withColumn("quality", quality_expr("text")).filter(
        F.col("quality") >= F.lit(min_quality)
    )
    if languages is not None:
        scored = scored.filter(F.col("lang").isin(list(languages)))
    return hash_split(
        scored, F.col("doc_id").cast("string"), splits, seed=seed
    ).select("doc_id", "text", "lang", "quality", "split")


def curation_signals(
    docs: DataFrame, k: int = 8, text_col: str = "text"
) -> DataFrame:
    """ONE call → the full per-document curation signal table:

    (doc_id, n_tokens, dup_word_frac, dup_line_frac, top_bigram_frac,
    quality_score, bpe_ish_tokens, compressed_len, compression_ratio,
    n_grams, n_novel, novelty)

    — repetition profile (operators/repetition.py), heuristic quality
    + pre-token budget (text_analysis), deflate redundancy
    (text_analysis.compression_ratio), and corpus-unique-gram novelty
    (substring_dedup.novelty_scores). The filter-rule front door: each
    component is independently oracle-tested; this assembles them with
    doc_id equi-joins (one shuffle each, AQE-sized) so a funnel
    (operators/funnel.py) or classifier (operators/classifier.py) can
    consume every signal from one DataFrame without re-plumbing four
    operators.

    ``novelty`` is the only corpus-RELATIVE signal here (one gram
    shuffle across the corpus); everything else is per-row compute."""
    from .repetition import repetition_signals
    from .substring_dedup import novelty_scores
    from .text_analysis import bpe_ish_token_count, compression_ratio

    rep = repetition_signals(docs.select("doc_id", text_col))
    perdoc = compression_ratio(
        docs.select(
            "doc_id",
            F.col(text_col).alias("text"),
        )
    ).select(
        "doc_id",
        quality_expr("text").alias("quality_score"),
        bpe_ish_token_count("text").alias("bpe_ish_tokens"),
        "compressed_len",
        "compression_ratio",
    )
    nov = novelty_scores(docs, k=k, text_col=text_col)
    return rep.join(perdoc, "doc_id").join(nov, "doc_id")
