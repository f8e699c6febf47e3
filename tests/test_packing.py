"""Token packing: the distributed prefix sum must equal the oracle's
single window cumsum exactly, stay partition-independent, and the
chunk assignment must respect the budget invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.packing import (
    pack_into_chunks,
    token_count_expr,
    with_global_offset,
)
from distributed_mapreduce__spark.sources.tables import load_table
from tests.oracle_utils import compare_query

SF = "/root/testdata/sf0.01"

_NTOK = """
  len(list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),
                  t -> t <> ''))
"""


def test_global_offset_matches_oracle_cumsum(spark):
    docs = load_table(spark, SF, "documents")
    weighted = docs.withColumn("n_tokens", token_count_expr()).filter(
        F.col("n_tokens") > 0
    )
    got = with_global_offset(weighted, "doc_id", "n_tokens").select(
        "doc_id", "n_tokens", "offset"
    )
    compare_query(
        spark,
        SF,
        got,
        f"""
        WITH w AS (SELECT doc_id, CAST({_NTOK} AS BIGINT) AS n_tokens FROM documents)
        SELECT doc_id, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER
                   (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS BIGINT) AS offset
        FROM w WHERE n_tokens > 0
        """,
    )


def test_offset_is_partition_independent(spark):
    docs = load_table(spark, SF, "documents")
    weighted = docs.withColumn("n_tokens", token_count_expr()).filter(
        F.col("n_tokens") > 0
    )
    a = {
        r.doc_id: r.offset
        for r in with_global_offset(weighted, "doc_id", "n_tokens", num_partitions=3)
        .select("doc_id", "offset")
        .collect()
    }
    b = {
        r.doc_id: r.offset
        for r in with_global_offset(
            weighted.repartition(13), "doc_id", "n_tokens", num_partitions=29
        )
        .select("doc_id", "offset")
        .collect()
    }
    assert a == b


def test_pack_into_chunks_matches_oracle(spark):
    docs = load_table(spark, SF, "documents")
    budget = 256
    got = pack_into_chunks(docs, budget)
    compare_query(
        spark,
        SF,
        got,
        f"""
        WITH w AS (SELECT doc_id, CAST({_NTOK} AS BIGINT) AS n_tokens FROM documents),
        offs AS (
          SELECT doc_id, n_tokens,
                 CAST(coalesce(sum(n_tokens) OVER
                     (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS "offset"
          FROM w WHERE n_tokens > 0
        )
        SELECT unnest(generate_series("offset" // {budget},
                                      ("offset" + n_tokens - 1) // {budget})) AS chunk_id,
               doc_id, n_tokens, "offset"
        FROM offs
        """,
    )


def test_chunk_budget_invariants(spark):
    docs = load_table(spark, SF, "documents")
    budget = 256
    packed = pack_into_chunks(docs, budget)
    # Tokens attributable to each chunk never exceed the budget, and
    # every chunk except the last is exactly full.
    per_chunk = (
        packed.withColumn(
            "tok_in_chunk",
            F.least(F.col("offset") + F.col("n_tokens"), (F.col("chunk_id") + 1) * budget)
            - F.greatest(F.col("offset"), F.col("chunk_id") * budget),
        )
        .groupBy("chunk_id")
        .agg(F.sum("tok_in_chunk").alias("n"))
        .collect()
    )
    by_id = {r.chunk_id: r.n for r in per_chunk}
    last = max(by_id)
    assert all(n == budget for cid, n in by_id.items() if cid != last)
    assert 0 < by_id[last] <= budget
    assert set(by_id) == set(range(last + 1))  # contiguous chunk ids
