"""Quality classifier: the LR model must recover the heuristic's
decision surface from raw statistics (train/test split by hash so the
check is on UNSEEN documents), and scoring must be a distributed map."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.classifier import (
    quality_training_frame,
    score_documents,
    train_quality_classifier,
)
from distributed_mapreduce__spark.operators.sampling import hash_split
from distributed_mapreduce__spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_classifier_generalizes_to_heldout(spark):
    docs = load_table(spark, SF, "documents")
    split = hash_split(docs, "doc_id", {"train": 0.7, "test": 0.3})
    train_docs = split.filter(F.col("split") == "train").drop("split")
    test_docs = split.filter(F.col("split") == "test").drop("split")

    model = train_quality_classifier(quality_training_frame(train_docs))

    truth = quality_training_frame(test_docs).select("doc_id", "label")
    scored = score_documents(model, test_docs)
    joined = scored.join(truth, "doc_id")
    n = joined.count()
    agree = joined.filter(F.col("pred") == F.col("label")).count()
    assert n > 50  # the split actually produced a held-out set
    assert agree / n >= 0.9, f"held-out accuracy {agree / n:.3f}"


def test_scoring_is_distributed_single_pass(spark):
    docs = load_table(spark, SF, "documents")
    model = train_quality_classifier(quality_training_frame(docs))
    scored = score_documents(model, docs)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    # No key shuffle: the only allowed Exchange is spread()'s round-robin
    # fan-out of the single small scan partition (a local-bench artifact).
    assert "hashpartitioning" not in plan, plan
    rows = scored.collect()
    assert len(rows) == 500
    assert all(0.0 <= r.quality_prob <= 1.0 for r in rows)


def test_probabilities_track_label_separation(spark):
    docs = load_table(spark, SF, "documents")
    model = train_quality_classifier(quality_training_frame(docs))
    stats = score_documents(model, docs).join(
        quality_training_frame(docs).select("doc_id", "label"), "doc_id"
    )
    means = {
        r.label: r.p
        for r in stats.groupBy("label")
        .agg(F.avg("quality_prob").alias("p"))
        .collect()
    }
    if 0.0 in means and 1.0 in means:
        assert means[1.0] > means[0.0] + 0.2


def test_degenerate_docs_score_without_error(spark):
    """Empty / whitespace-only docs produce NULL ratio features; the
    training frame must coalesce them to zeros so VectorAssembler
    (handleInvalid='error') never throws and EVERY document gets a
    score (ADVICE r3)."""
    docs = load_table(spark, SF, "documents").limit(50).union(
        spark.createDataFrame(
            [(100001, "", "en", "synth", 0), (100002, "   ", "en", "synth", 3)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    )
    frame = quality_training_frame(docs)
    degenerate = {r.doc_id: r for r in frame.filter(F.col("doc_id") > 100000).collect()}
    assert degenerate[100001].alpha_ratio == 0.0
    assert degenerate[100001].label == 0.0

    model = train_quality_classifier(frame)
    scored = score_documents(model, docs)
    assert scored.count() == 52  # every document, including degenerates
