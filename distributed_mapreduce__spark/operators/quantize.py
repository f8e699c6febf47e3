"""Embedding quantization (vector-storage compression).

Embedding tables dominate storage in a multimodal/retrieval corpus:
100 TB of float32 embeddings quantize 4× to int8 with ~0.1% cosine
error — the standard trade every vector store makes. This module is
symmetric per-vector scalar quantization:

    scale = max(|x_i|) / 127          (per vector)
    q_i   = round(x_i / scale)        (int8 range [-127, 127])
    x̂_i   = q_i · scale               (dequantized view)

Everything is per-row column algebra (``transform`` / ``aggregate``
higher-order functions on the array column): zero shuffle, zero Python,
scan-speed at any scale, and — because every step is a fixed IEEE op
chain — bit-reproducible in the DuckDB oracle (tests/test_quantize.py
replays scale, codes, and reconstruction error exactly).

Zero vectors get scale 1.0 (codes all zero) so the dequantized view is
well-defined without NULL propagation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def scale_expr(vec_col: str = "embedding") -> Column:
    """Per-vector symmetric scale: max(|x|)/127, or 1.0 for the zero
    vector."""
    amax = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
    return F.when(amax == 0.0, F.lit(1.0)).otherwise(amax / F.lit(127.0))


def quantize_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Add (scale, codes): int8-range codes + the per-vector scale.

    ``codes`` is ``array<int>`` holding values in [-127, 127] — parquet
    dictionary/byte encodings store them compactly; a fixed-width
    binary packing would drop to 1 byte/dim exactly."""
    sc = scale_expr(vec_col)
    return df.withColumn("scale", sc).withColumn(
        "codes",
        F.transform(
            _as_double(F.col(vec_col)),
            lambda x: F.round(x / F.col("scale"), 0).cast("int"),
        ),
    )


def dequantize_expr(codes_col: str = "codes", scale_col: str = "scale") -> Column:
    """Reconstructed vector: codes · scale (array<double>)."""
    return F.transform(
        F.col(codes_col), lambda q: q.cast("double") * F.col(scale_col)
    )


def reconstruction_report(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(vec_id, scale, max_abs_err, dot_err): per-vector quantization
    error — max absolute component error (bounded by scale/2) and the
    self-dot-product relative shift, the quantity retrieval quality
    actually depends on. One projection, no shuffle."""
    q = quantize_vectors(df, vec_col)
    deq = dequantize_expr()
    orig = _as_double(F.col(vec_col))
    err = F.array_max(
        F.zip_with(orig, deq, lambda a, b: F.abs(a - b))
    )
    dot = lambda u, v: F.aggregate(  # noqa: E731 — left-to-right fold
        F.zip_with(u, v, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    return q.select(
        "vec_id",
        "scale",
        err.alias("max_abs_err"),
        (F.abs(dot(deq, deq) - dot(orig, orig)) / dot(orig, orig)).alias("dot_err"),
    )
