"""Capstone pipeline (corpus.build_training_set): planted exact dup,
near dup, and contaminated doc must each be removed by their stage, the
funnel report must be conservative and monotone, shards+manifests must
land per split, and the whole run must be deterministic."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.corpus import build_training_set
from distributed_mapreduce__spark.sources.tables import load_table

#: slow tier (round 16): excluded from the driver-window default
#: run; the full suite (pytest -m "") runs and is logged every round.
pytestmark = __import__("pytest").mark.slow

SF = "/root/testdata/sf0.001"

#: gentle line-cleaning for the synthetic fixture corpus (tiny
#: vocabulary, no terminal punctuation)
CLEAN_OPTS = {
    "min_words": 1,
    "require_terminal_punct": False,
    "min_lines": 1,
    "dedup": False,
}


@pytest.fixture(scope="module")
def corpus(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "lang", "text")
    base = docs.filter(F.col("doc_id") < 900000)
    rows = base.orderBy("doc_id").limit(3).collect()
    src = rows[0]  # will get an exact and a near duplicate
    evals = rows[1:3]
    planted = spark.createDataFrame(
        [
            (900001, src.lang, src.text),  # exact dup of src
            (900002, src.lang, src.text + " extra tail word"),  # near dup
            (900003, evals[0].lang, evals[0].text),  # contaminated
        ],
        "doc_id long, lang string, text string",
    )
    eval_docs = spark.createDataFrame(
        [(r.doc_id, r.text) for r in evals], "doc_id long, text string"
    )
    return base.unionByName(planted), eval_docs, src


def _run(spark, corpus, out):
    docs, eval_docs, _ = corpus
    report = build_training_set(
        docs,
        out,
        eval_docs=eval_docs,
        clean=True,
        clean_opts=CLEAN_OPTS,
        min_quality=0.0,
        near_dup_threshold=0.5,
        rows_per_shard=50,
        seed=0,
    )
    return report


def test_pipeline_stages_and_report(spark, corpus, tmp_path):
    docs, eval_docs, src = corpus
    out = str(tmp_path / "ts")
    report = _run(spark, corpus, out)

    # funnel is monotone non-increasing and starts at the true input
    n = [
        report["n_input"],
        report["n_after_clean"],
        report["n_after_exact_dedup"],
        report["n_after_near_dedup"],
        report["n_after_decontamination"],
        report["n_after_quality"],
    ]
    assert n[0] == docs.count()
    assert all(a >= b for a, b in zip(n, n[1:])), n
    # at LEAST the planted exact dup and near dup fell (the synthetic
    # corpus carries duplicates of its own, so exact counts vary)
    assert report["n_after_exact_dedup"] <= report["n_after_clean"] - 1
    assert report["n_after_near_dedup"] <= report["n_after_exact_dedup"] - 1

    kept = spark.read.parquet(f"{out}/train", f"{out}/val", f"{out}/test")
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 900001 not in ids  # exact dup: min-id survivor wins
    assert src.doc_id in ids
    assert 900002 not in ids  # near dup removed
    assert 900003 not in ids  # contaminated doc removed
    # the eval docs themselves were ALSO in train input → identity
    # contamination drops them too
    eval_ids = {r.doc_id for r in eval_docs.collect()}
    assert not (ids & eval_ids)

    # split totals in the report match what landed on disk
    total = sum(s["n_rows"] for s in report["splits"].values())
    assert total == kept.count() == report["n_after_quality"]
    # manifest is a real JSON-lines file per split
    for name, stats in report["splits"].items():
        mpath = f"{out}/{name}/_manifest.json"
        assert os.path.exists(mpath)
        lines = [json.loads(l) for l in open(mpath)]
        assert sum(r["n_rows"] for r in lines) == stats["n_rows"]


def test_deterministic_across_runs(spark, corpus, tmp_path):
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    ra = _run(spark, corpus, out_a)
    rb = _run(spark, corpus, out_b)
    assert ra == rb
    for split in ("train", "val", "test"):
        a = [r.doc_id for r in spark.read.parquet(f"{out_a}/{split}").collect()]
        b = [r.doc_id for r in spark.read.parquet(f"{out_b}/{split}").collect()]
        assert sorted(a) == sorted(b)


def test_language_filter_and_skip_flags(spark, corpus, tmp_path):
    docs, _, _ = corpus
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    keep = [langs[0]]
    report = build_training_set(
        docs,
        str(tmp_path / "lf"),
        clean=False,
        min_quality=0.0,
        near_dup_threshold=None,
        languages=keep,
        rows_per_shard=50,
    )
    assert "n_after_near_dedup" not in report
    assert "n_after_decontamination" not in report
    out = spark.read.parquet(str(tmp_path / "lf" / "train"))
    assert {r.lang for r in out.select("lang").distinct().collect()} <= set(keep)


def test_language_filter_predicts_lang_when_absent(spark, corpus, tmp_path):
    """Raw-crawl input (no lang column): the capstone predicts lang
    via the heuristic lang-ID before filtering — the WARC path."""
    docs, _, _ = corpus
    bare = docs.select("doc_id", "text")  # no lang column
    # the synthetic corpus text draws on the engine vocabulary ("the",
    # "a", ...) whatever its metadata lang says, so the heuristic
    # predicts mostly en/und — filter on the predictable one
    keep = ["en"]
    report = build_training_set(
        bare,
        str(tmp_path / "nolang"),
        clean=False,
        min_quality=0.0,
        near_dup_threshold=None,
        languages=keep,
        rows_per_shard=50,
    )
    total = sum(s["n_rows"] for s in report["splits"].values())
    assert 0 < total < report["n_after_exact_dedup"]
    out = spark.read.parquet(str(tmp_path / "nolang" / "train"))
    assert set(out.columns) >= {"doc_id", "text", "lang"}
    assert {r.lang for r in out.select("lang").distinct().collect()} <= set(keep)


def test_url_dedup_stage_runs_first(spark, tmp_path):
    """A url column triggers canonical-URL dedup as stage 0: two docs
    behind the same canonical URL (tracking params, fragments)
    collapse to the min doc_id BEFORE text stages run."""
    docs = spark.createDataFrame(
        [
            (1, "http://a.example/page?utm_source=x", "first body text here"),
            (2, "http://a.example/page#section", "second body text here"),
            (3, "http://b.example/other", "third body text here"),
        ],
        "doc_id long, url string, text string",
    )
    report = build_training_set(
        docs,
        str(tmp_path / "ud"),
        clean=False,
        min_quality=0.0,
        near_dup_threshold=None,
        rows_per_shard=10,
    )
    assert report["n_after_url_dedup"] == 2
    out = spark.read.parquet(
        str(tmp_path / "ud" / "train"),
        str(tmp_path / "ud" / "val"),
        str(tmp_path / "ud" / "test"),
    )
    ids = {r.doc_id for r in out.collect()}
    assert ids <= {1, 3} and 2 not in ids


def test_report_false_fast_path_same_output_fewer_jobs(spark, corpus, tmp_path):
    """report=False must produce the identical training set while
    skipping every per-stage persist+count — the production mode at
    100 TB, where the funnel report's six full-corpus materializations
    dominate the run."""
    docs, eval_docs, _ = corpus
    out_slow = str(tmp_path / "slow")
    out_fast = str(tmp_path / "fast")
    kwargs = dict(
        eval_docs=eval_docs,
        clean=True,
        clean_opts=CLEAN_OPTS,
        min_quality=0.0,
        near_dup_threshold=0.5,
        rows_per_shard=50,
        seed=0,
    )

    def max_job():
        # max job id, not len(): ids are monotone while the UI store
        # EVICTS old entries past spark.ui.retainedJobs — len() deltas
        # go wrong in a long shared session (full-suite flake)
        ids = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
        return max(ids) if ids else 0

    j0 = max_job()
    full = build_training_set(docs, out_slow, **kwargs)
    j1 = max_job()
    j_slow = j1 - j0
    fast = build_training_set(docs, out_fast, report=False, **kwargs)
    j_fast = max_job() - j1

    # same split totals, same doc ids in training order
    assert fast["splits"] == full["splits"]
    for split in full["splits"]:
        a = [
            r.doc_id
            for r in spark.read.parquet(f"{out_slow}/{split}").collect()
        ]
        b = [
            r.doc_id
            for r in spark.read.parquet(f"{out_fast}/{split}").collect()
        ]
        assert sorted(a) == sorted(b)
    # no stage counts in the fast report — and visibly fewer jobs ran
    assert set(fast) == {"splits"}
    assert j_fast < j_slow


def test_lm_perplexity_stage_drops_garbled_doc(spark, corpus, tmp_path):
    """The CCNet stage: an LM trained on clean reference text gates the
    pipeline — a planted garbled doc (same vocabulary, shuffled word
    order) must fall to the perplexity cut while fluent docs survive,
    and the ppl signal rides into the shards."""
    from distributed_mapreduce__spark.operators.ngram_lm import (
        ngram_lm_scores,
        train_ngram_lm,
    )

    clean_text = "the quick brown fox jumps over the lazy dog"
    reference = spark.createDataFrame(
        [(i, clean_text) for i in range(6)], "doc_id long, text string"
    )
    model = train_ngram_lm(reference, n=3)
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "quick the fox brown over jumps dog lazy the"),  # garbled
        ],
        "doc_id long, text string",
    )
    ppls = {r.doc_id: r.ppl for r in ngram_lm_scores(docs, model).collect()}
    cut = (ppls[1] + ppls[2]) / 2
    report = build_training_set(
        docs,
        str(tmp_path / "out"),
        clean=False,
        min_quality=0.0,
        near_dup_threshold=None,
        lm_model=model,
        lm_max_ppl=cut,
        rows_per_shard=10,
    )
    assert report["n_after_lm_filter"] == 1
    kept = spark.read.parquet(str(tmp_path / "out" / "train")).unionByName(
        spark.read.parquet(str(tmp_path / "out" / "val")), allowMissingColumns=True
    ).unionByName(
        spark.read.parquet(str(tmp_path / "out" / "test")), allowMissingColumns=True
    )
    rows = kept.collect()
    assert [r.doc_id for r in rows] == [1]
    assert rows[0].ppl == pytest.approx(ppls[1])
    # the guard: a cut without a model is a loud error
    with pytest.raises(ValueError, match="lm_model"):
        build_training_set(
            docs, str(tmp_path / "out2"), clean=False, lm_max_ppl=5.0
        )


def test_workdir_makes_pipeline_resumable(spark, corpus, tmp_path):
    """The resumable capstone: with a workdir, every stage commits to a
    transactional table keyed by a config-chain fingerprint. A full
    re-run resumes every stage (no recompute), a LATE-stage config
    change recomputes only from the divergence, and the shards are
    identical to the non-checkpointed run's."""
    docs, eval_docs, _ = corpus
    wd = str(tmp_path / "wd")
    kwargs = dict(
        eval_docs=eval_docs,
        clean=True,
        clean_opts=CLEAN_OPTS,
        min_quality=0.0,
        near_dup_threshold=0.5,
        rows_per_shard=50,
        seed=0,
    )
    plain = build_training_set(docs, str(tmp_path / "plain"), **kwargs)
    r1 = build_training_set(
        docs, str(tmp_path / "o1"), workdir=wd, input_token="ds-v1", **kwargs
    )
    assert r1["resumed_stages"] == []
    assert r1["splits"] == plain["splits"]
    for k in plain:
        if k.startswith("n_after"):
            assert r1[k] == plain[k], k

    # identical re-run: every checkpointed stage resumes
    r2 = build_training_set(
        docs, str(tmp_path / "o2"), workdir=wd, input_token="ds-v1", **kwargs
    )
    assert set(r2["resumed_stages"]) == {
        "clean", "exact_dedup", "near_dedup", "decontam", "split"
    }
    assert r2["splits"] == r1["splits"]
    a = sorted(
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "o1" / "train")).collect()
    )
    b = sorted(
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "o2" / "train")).collect()
    )
    assert a == b

    # late-stage config change: upstream resumes, split recomputes
    r3 = build_training_set(
        docs, str(tmp_path / "o3"), workdir=wd, input_token="ds-v1",
        **{**kwargs, "seed": 1},
    )
    assert set(r3["resumed_stages"]) == {
        "clean", "exact_dedup", "near_dedup", "decontam"
    }

    # rolling BACK to the old seed must NOT reuse the stale snapshot
    # (the split table now holds seed=1 output; the seed=0 fingerprint
    # no longer owns the latest snapshot)
    r4 = build_training_set(
        docs, str(tmp_path / "o4"), workdir=wd, input_token="ds-v1", **kwargs
    )
    assert "split" not in r4["resumed_stages"]
    assert r4["splits"] == r1["splits"]

    # new dataset token: whole chain recomputes
    r5 = build_training_set(
        docs, str(tmp_path / "o5"), workdir=wd, input_token="ds-v2", **kwargs
    )
    assert r5["resumed_stages"] == []
