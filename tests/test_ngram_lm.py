"""Stupid-backoff n-gram LM (operators/ngram_lm.py): hand-computed
scores on a pinned corpus, backoff semantics on planted gram gaps, OOV
floor, pre-prune denominators, train-on-A-score-B, and the full DuckDB
replay via the registered local-tier query."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.ngram_lm import (
    OOV_SCORE,
    STUPID_BACKOFF_ALPHA,
    ngram_lm_scores,
    perplexity_filter,
    train_ngram_lm,
)

A = STUPID_BACKOFF_ALPHA


@pytest.fixture(scope="module")
def tiny(spark):
    # corpus: "a b c", "a b d" → N=6 unigrams, c(a)=2, c(b)=2, c(c)=1,
    # c(d)=1; bigram ctx totals: c(a·)=2, c(b·)=2; trigram: c('a b'·)=2
    return spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "doc_id long, text string"
    )


def _scores(spark, model, text, n=3):
    df = spark.createDataFrame([(99, text)], "doc_id long, text string")
    return ngram_lm_scores(df, model, n=n).collect()[0]


def test_hand_computed_trigram_scores(spark, tiny):
    model = train_ngram_lm(tiny, n=3)
    r = _scores(spark, model, "a b c")
    # pos1 'a': unigram 2/6; pos2 'b'|a: 2/2; pos3 'c'|'a b': 1/2
    want = (math.log(2 / 6) + math.log(1.0) + math.log(0.5)) / 3
    assert r.n_tokens == 3
    assert r.avg_logscore == pytest.approx(want, rel=1e-12)
    assert r.ppl == pytest.approx(math.exp(-want), rel=1e-12)


def test_backoff_applies_alpha_per_skipped_level(spark, tiny):
    model = train_ngram_lm(tiny, n=3)
    # "c a": pos2 'a' has mo=2 but bigram (c, a) was never seen →
    # back off one level: alpha * unigram(a) = 0.4 * 2/6
    r = _scores(spark, model, "c a")
    want = (math.log(1 / 6) + math.log(A * 2 / 6)) / 2
    assert r.avg_logscore == pytest.approx(want, rel=1e-12)
    # "a b c d": pos4 'd' has mo=3; trigram ('b c', d) unseen, bigram
    # (c, d) unseen → alpha^2 * unigram(d) = 0.16 * 1/6
    r2 = _scores(spark, model, "a b c d")
    want4 = (
        math.log(2 / 6)
        + math.log(1.0)
        + math.log(0.5)
        + math.log(A * A * 1 / 6)
    ) / 4
    assert r2.avg_logscore == pytest.approx(want4, rel=1e-12)


def test_oov_floor(spark, tiny):
    model = train_ngram_lm(tiny, n=3)
    r = _scores(spark, model, "z z")
    # pos1: floor; pos2: mo=2, all orders miss → alpha * floor
    want = (math.log(OOV_SCORE) + math.log(A * OOV_SCORE)) / 2
    assert r.avg_logscore == pytest.approx(want, rel=1e-12)


def test_min_count_prunes_numerators_not_denominators(spark, tiny):
    model = train_ngram_lm(tiny, n=3, min_count=2)
    rows = {
        (r.order, r.context, r.word): r.rel_freq for r in model.collect()
    }
    # trigram ('a b', c) had count 1 → pruned; bigram (a, b) count 2
    # survives with its PRE-prune denominator (2/2, not renormalized)
    assert (3, "a b", "c") not in rows
    assert rows[(2, "a", "b")] == pytest.approx(1.0)
    # unigrams always survive (backoff floor must exist)
    assert rows[(1, "", "c")] == pytest.approx(1 / 6)
    # scoring under the pruned model backs off where the trigram died
    r = _scores(spark, model, "a b c")
    want = (
        math.log(2 / 6) + math.log(1.0) + math.log(A * A * 1 / 6)
    ) / 3  # trigram AND bigram (b, c) pruned → down to unigram
    assert r.avg_logscore == pytest.approx(want, rel=1e-12)


def test_train_on_clean_score_crawl(spark, tiny):
    """The CCNet usage: model from one corpus, scores for another —
    fluent text under the model outscores shuffled garbage."""
    clean = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(8)],
        "doc_id long, text string",
    )
    model = train_ngram_lm(clean, n=3)
    crawl = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "dog fox the brown quick")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.ppl for r in ngram_lm_scores(crawl, model).collect()}
    assert got[1] < got[2]
    kept = perplexity_filter(crawl, model, max_ppl=got[1] * 1.01).collect()
    assert [r.doc_id for r in kept] == [1]


def test_registered_query_matches_duckdb_replay(spark, sf_dir):
    from distributed_mapreduce__spark import registry

    from .oracle_utils import compare_query

    registry.load_all()
    df = registry.resolve("lm_perplexity_docs")(spark, sf_dir)
    compare_query(
        spark, sf_dir, df, registry.ORACLES["lm_perplexity_docs"]
    )


def test_no_python_in_the_path_and_no_cartesian(spark, tiny):
    model = train_ngram_lm(tiny, n=3)
    plan = (
        ngram_lm_scores(tiny, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan  # pure column algebra (codegen-able)
    assert "Cartesian" not in plan
    assert "BroadcastNestedLoop" not in plan  # expression equi-joins hash


def test_model_parquet_round_trip(spark, tiny, tmp_path):
    """The model is a plain DataFrame — persist it as parquet (train
    once, score many, the KenLM-artifact pattern) and scoring under
    the reloaded model is identical."""
    model = train_ngram_lm(tiny, n=3)
    p = str(tmp_path / "lm")
    model.write.parquet(p)
    reloaded = spark.read.parquet(p)
    a = {(r.doc_id): (r.n_tokens, r.avg_logscore)
         for r in ngram_lm_scores(tiny, model).collect()}
    b = {(r.doc_id): (r.n_tokens, r.avg_logscore)
         for r in ngram_lm_scores(tiny, reloaded).collect()}
    assert a == b
