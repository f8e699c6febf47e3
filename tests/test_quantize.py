"""Embedding quantization: bit-exact DuckDB parity for scale/codes/
error report, the int8 range invariant, and the error bound
max_abs_err ≤ scale/2."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.quantize import (
    dequantize_expr,
    quantize_vectors,
    reconstruction_report,
)
from distributed_mapreduce__spark.sources.tables import load_table
from tests.oracle_utils import compare_query

SF = "/root/testdata/sf0.01"

_D = "CAST(embedding[i] AS DOUBLE)"
_SCALE = f"""
  CASE WHEN list_max(list_transform(generate_series(1, 64), i -> abs({_D}))) = 0
       THEN 1.0
       ELSE list_max(list_transform(generate_series(1, 64), i -> abs({_D}))) / 127.0
  END
"""


def test_quantize_matches_oracle(spark):
    emb = load_table(spark, SF, "embeddings")
    got = quantize_vectors(emb).select("vec_id", "scale", "codes")
    compare_query(
        spark,
        SF,
        got,
        f"""
        WITH s AS (
          SELECT vec_id, embedding, CAST({_SCALE} AS DOUBLE) AS scale
          FROM embeddings
        )
        SELECT vec_id, scale,
               list_transform(generate_series(1, 64),
                 i -> CAST(round({_D} / scale) AS INTEGER)) AS codes
        FROM s
        """,
    )


def test_reconstruction_error_matches_oracle_and_bound(spark):
    emb = load_table(spark, SF, "embeddings")
    rep = reconstruction_report(emb)

    rows = rep.collect()
    assert len(rows) == emb.count()
    # symmetric rounding error bound: |x - q·scale| ≤ scale/2
    assert all(r.max_abs_err <= r.scale / 2 + 1e-15 for r in rows)
    # int8 quantization keeps self-similarity within ~1%
    assert all(r.dot_err < 0.01 for r in rows)

    compare_query(
        spark,
        SF,
        rep.select("vec_id", "max_abs_err"),
        f"""
        WITH s AS (
          SELECT vec_id, embedding, CAST({_SCALE} AS DOUBLE) AS scale
          FROM embeddings
        )
        SELECT vec_id,
               list_max(list_transform(generate_series(1, 64),
                 i -> abs({_D} - round({_D} / scale) * scale))) AS max_abs_err
        FROM s
        """,
    )


def test_codes_in_int8_range_and_roundtrip(spark):
    emb = load_table(spark, SF, "embeddings")
    q = quantize_vectors(emb)
    stats = q.select(
        F.array_min("codes").alias("lo"), F.array_max("codes").alias("hi")
    ).agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).collect()[0]
    assert -127 <= stats.lo and stats.hi <= 127

    # the max-|component| code hits exactly ±127 for non-zero vectors
    exact = q.select(
        F.array_max(F.transform("codes", lambda c: F.abs(c))).alias("m")
    )
    assert exact.filter(F.col("m") != 127).count() == 0

    deq = q.withColumn("deq", dequantize_expr())
    row = deq.select("embedding", "deq").first()
    assert len(row.deq) == len(row.embedding) == 64


def test_zero_vector_is_well_defined(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 64), (2, [1.0] + [0.0] * 63)],
        "vec_id long, embedding array<double>",
    )
    rows = {r.vec_id: r for r in quantize_vectors(df).collect()}
    assert rows[1].scale == 1.0 and set(rows[1].codes) == {0}
    assert rows[2].codes[0] == 127
