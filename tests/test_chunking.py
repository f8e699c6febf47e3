"""Chunking: DuckDB-oracle parity at multi-chunk granularity on the
fixture corpus, plus hand-checkable overlap/tail/empty-doc contracts."""

from __future__ import annotations

import pytest

from distributed_mapreduce__spark.operators.chunking import chunk_documents
from distributed_mapreduce__spark.sources.tables import load_table
from tests.oracle_utils import compare_query

SF = "/root/testdata/sf0.01"


def _oracle(chunk_tokens: int, stride: int) -> str:
    return f"""
    WITH toked AS (
      SELECT doc_id,
             string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS toks
      FROM documents
    ), starts AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, len(toks) - 1, {stride})) AS s
      FROM toked
    )
    SELECT doc_id,
           CAST(s // {stride} AS INTEGER) AS chunk_idx,
           CAST(len(list_slice(toks, s + 1, s + {chunk_tokens})) AS INTEGER)
             AS n_tokens,
           array_to_string(list_slice(toks, s + 1, s + {chunk_tokens}), ' ')
             AS chunk_text
    FROM starts
    """


def test_chunking_matches_oracle(spark):
    docs = load_table(spark, SF, "documents")
    got = chunk_documents(docs, chunk_tokens=8, stride=5)
    compare_query(spark, SF, got, _oracle(8, 5))


def test_chunk_overlap_and_tail(spark):
    docs = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2, "")],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, chunk_tokens=4, stride=3).collect()
    by_key = {(r.doc_id, r.chunk_idx): r for r in rows}

    # doc 1: starts 0,3,6,9 → windows of 4 tokens, short tail at 9.
    assert by_key[(1, 0)].chunk_text == "t0 t1 t2 t3"
    assert by_key[(1, 1)].chunk_text == "t3 t4 t5 t6"  # 1-token overlap
    assert by_key[(1, 2)].chunk_text == "t6 t7 t8 t9"
    assert by_key[(1, 3)].chunk_text == "t9" and by_key[(1, 3)].n_tokens == 1
    assert len([k for k in by_key if k[0] == 1]) == 4

    # empty doc: exactly one (empty) chunk — nothing silently dropped.
    assert len([k for k in by_key if k[0] == 2]) == 1
    assert by_key[(2, 0)].chunk_text == ""


def test_chunking_rejects_bad_params(spark):
    docs = spark.range(1).selectExpr("id AS doc_id", "'x' AS text")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, stride=0)
