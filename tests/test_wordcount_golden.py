"""Golden test for the reference's own end-to-end check (SURVEY.md §5.1).

The reference's de-facto test: run word count over input1/input2 and
compare with the expected block in its README (README.md:103-111):
hello:3, test:3, world:3, a:1, goodbye:1 — count desc, word asc.
Exercises O1-O6, O9, O12-O14 including the deterministic tie-break.
"""

from __future__ import annotations

import pytest

from distributed_mapreduce__spark.operators.wordcount import (
    top_k_words,
    word_counts,
    write_final_text,
)
from distributed_mapreduce__spark.sources.text import read_text_corpus

# Mirrors /root/reference/input1.txt + input2.txt (FIXTURES.md §A).
INPUT1 = "hello world hello this is a test"
INPUT2 = "world goodbye hello test test world"

GOLDEN = [
    ("hello", 3),
    ("test", 3),
    ("world", 3),
    ("a", 1),
    ("goodbye", 1),
]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    (d / "input1.txt").write_text(INPUT1 + "\n")
    (d / "input2.txt").write_text(INPUT2 + "\n")
    return str(d)


def test_topk_golden_order_sensitive(spark, corpus_dir):
    df = read_text_corpus(spark, corpus_dir)
    rows = [(r["word"], r["cnt"]) for r in top_k_words(df, k=5).collect()]
    assert rows == GOLDEN


def test_full_counts(spark, corpus_dir):
    df = read_text_corpus(spark, corpus_dir)
    counts = {r["word"]: r["cnt"] for r in word_counts(df).collect()}
    assert counts == {
        "hello": 3,
        "world": 3,
        "test": 3,
        "this": 1,
        "is": 1,
        "a": 1,
        "goodbye": 1,
    }


def test_topk_stable_under_repartition(spark, corpus_dir):
    """Count invariance + tie-break determinism under physical layout
    changes (reference R4 idempotency analog)."""
    df = read_text_corpus(spark, corpus_dir).repartition(7)
    rows = [(r["word"], r["cnt"]) for r in top_k_words(df, k=5).collect()]
    assert rows == GOLDEN


def test_final_text_sink(spark, corpus_dir, tmp_path):
    """O14 format parity: '%s: %d' lines (master/master.go:309)."""
    out = str(tmp_path / "final")
    df = read_text_corpus(spark, corpus_dir)
    write_final_text(top_k_words(df, k=5), out)
    lines = [r["value"] for r in spark.read.text(out).collect()]
    assert lines == [f"{w}: {c}" for w, c in GOLDEN]
