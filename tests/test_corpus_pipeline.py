"""The end-to-end corpus pipeline (dedup → quality gate → split) is
checked as ONE DuckDB oracle — the integration guarantee that the
stages compose deterministically — and its partitioned output supports
idempotent per-partition backfills."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.corpus import prepare_corpus
from distributed_mapreduce__spark.sources.sinks import overwrite_partitions
from distributed_mapreduce__spark.sources.tables import load_table
from tests.oracle_utils import compare_query

SF = "/root/testdata/sf0.01"

# DuckDB mirrors of the stage expressions (same formulas as the
# oracle-green per-stage queries).
_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_QUALITY = """
  (CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) / len(text))
  * least(1.0, CAST(len(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '))
               AS DOUBLE) / 20.0)
"""
_U = """
  CAST((list_reduce(list_transform(generate_series(1, 15),
        i -> CAST(strpos('0123456789abcdef',
                  substring(md5('0:' || CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
      (a, b) -> a * 16 + b)) % 1048576 AS DOUBLE) / 1048576.0
"""

ORACLE = f"""
WITH canon AS (
  SELECT doc_id, text, lang,
         row_number() OVER (PARTITION BY md5({_NORM}) ORDER BY doc_id) AS rk
  FROM documents
),
gated AS (
  SELECT doc_id, text, lang, {_QUALITY} AS quality
  FROM canon WHERE rk = 1
)
SELECT doc_id, text, lang, quality,
       CASE WHEN {_U} < 0.9 THEN 'train'
            WHEN {_U} < 0.95 THEN 'val'
            ELSE 'test' END AS split
FROM gated
WHERE quality >= 0.5
"""


def test_prepare_corpus_matches_end_to_end_oracle(spark):
    docs = load_table(spark, SF, "documents")
    got = prepare_corpus(docs, min_quality=0.5)
    compare_query(spark, SF, got, ORACLE)


def test_pipeline_plan_has_single_shuffle(spark):
    """SCALE.md's claim for the composite: dedup's window is the ONLY
    exchange; quality, language, and split are projections."""
    from distributed_mapreduce__spark.plans.inspect import physical_summary

    docs = load_table(spark, SF, "documents")
    df = prepare_corpus(docs)
    df.collect()  # finalize AQE
    s = physical_summary(df)
    assert s["shuffle_exchange"] == 1, s
    assert s["sort_merge_join"] == 0 and s["broadcast_hash_join"] == 0


def test_language_filter_applies(spark):
    docs = load_table(spark, SF, "documents")
    got = prepare_corpus(docs, min_quality=0.0, languages=["en", "fr"])
    langs = {r.lang for r in got.select("lang").distinct().collect()}
    assert langs <= {"en", "fr"} and langs


def test_partitioned_output_backfills_idempotently(spark, tmp_path):
    """Rewriting ONE split's partition must leave the other partitions'
    files untouched (dynamic partition overwrite, the backfill path)."""
    docs = load_table(spark, SF, "documents")
    corpus = prepare_corpus(docs)
    out = str(tmp_path / "corpus")
    overwrite_partitions(corpus, out, "split")
    before = {
        p: sorted(os.listdir(os.path.join(out, p)))
        for p in os.listdir(out)
        if p.startswith("split=")
    }
    assert set(before) == {"split=train", "split=val", "split=test"}

    # Re-run just the val slice — only split=val's files may change.
    overwrite_partitions(corpus.filter(F.col("split") == "val"), out, "split")
    after = {
        p: sorted(os.listdir(os.path.join(out, p)))
        for p in os.listdir(out)
        if p.startswith("split=")
    }
    assert after["split=train"] == before["split=train"]
    assert after["split=test"] == before["split=test"]
    back = spark.read.parquet(out)
    assert back.count() == corpus.count()

def test_curation_signals_assembles_components(spark):
    from distributed_mapreduce__spark.operators.corpus import curation_signals
    from distributed_mapreduce__spark.operators.repetition import (
        repetition_signals,
    )
    from distributed_mapreduce__spark.operators.substring_dedup import (
        novelty_scores,
    )
    from distributed_mapreduce__spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    out = curation_signals(docs)
    assert set(out.columns) == {
        "doc_id", "n_tokens", "dup_word_frac", "dup_line_frac",
        "top_bigram_frac", "quality_score", "bpe_ish_tokens",
        "compressed_len", "compression_ratio", "n_grams", "n_novel",
        "novelty",
    }
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == docs.count()  # inner joins lose no docs
    # spot-parity with the standalone components
    rep = {r.doc_id: r for r in repetition_signals(docs).collect()}
    nov = {r.doc_id: r for r in novelty_scores(docs).collect()}
    for did in list(rows)[:20]:
        assert rows[did].dup_word_frac == rep[did].dup_word_frac
        assert rows[did].n_novel == nov[did].n_novel
        assert rows[did].novelty == nov[did].novelty
        assert 0 < rows[did].compression_ratio
