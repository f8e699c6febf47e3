"""Random-projection dimensionality reduction (Johnson–Lindenstrauss).

Embedding pipelines shrink vectors before the expensive stages:
clustering, LSH bucketing, and candidate scoring all cost O(dim) per
comparison, and a 4-16× dimension cut with a data-independent random
projection preserves pairwise distances within (1±ε) for ε ≈
sqrt(8·ln(n)/out_dim) (Johnson & Lindenstrauss 1984). Achlioptas 2003
showed ±1 entries work as well as Gaussians — and a ±1 matrix keeps
every arithmetic step a fixed IEEE chain, so the projection is
bit-replayable in the DuckDB oracle, like the rest of the vector
family (operators/quantize.py).

    y_j = ( Σ_i R[j][i] · x_i ) / sqrt(out_dim),   R[j][i] ∈ {-1, +1}

R is generated deterministically from (seed, j, i) via md5 — no RNG
state, no stored model: any task, any engine, any round regenerates
the identical matrix (same posture as the sampling family's
content-addressed uniforms).

Two execution methods with identical results:

- ``method='sql'`` (default): out_dim zip_with/aggregate column
  expressions with R inlined as literals — zero Python, zero shuffle,
  whole-stage codegen. Expression size is out_dim·in_dim terms;
  guarded at :data:`SQL_MAX_TERMS` (beyond it codegen degrades).
- ``method='arrow'``: one Arrow-batched ``mapInPandas`` numpy matmul
  with R in the task closure — for big dim products. Sum order
  matches the fold (left-to-right) so both methods agree bit-exactly.

Scale: per-row map either way — scan-speed at 100 TB; the projected
table feeds kmeans/LSH/PQ with out_dim-sized shuffles instead of
in_dim-sized ones, which is the point.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: method='sql' guard: beyond this many R literals the generated plan
#: stops being a codegen win — route big products through 'arrow'.
SQL_MAX_TERMS = 16_384


def jl_matrix(out_dim: int, in_dim: int, seed: int = 0) -> list[list[int]]:
    """Deterministic ±1 projection matrix: sign of md5's low bit per
    (seed, row, col). Pure function of its arguments — regenerated
    identically anywhere, never stored."""
    return [
        [
            1
            if hashlib.md5(f"{seed}:{j}:{i}".encode()).digest()[-1] & 1
            else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def project_vectors(
    df: DataFrame,
    in_dim: int,
    out_dim: int,
    seed: int = 0,
    vec_col: str = "embedding",
    out_col: str = "projected",
    method: str = "sql",
) -> DataFrame:
    """Add ``out_col``: the JL projection of ``vec_col`` to
    ``out_dim`` dims (array<double>). NULL vectors project to NULL; a
    non-NULL vector whose length differs from ``in_dim`` raises at
    execution with the offending length — on BOTH methods, so the
    sql/arrow bit-parity contract covers the error path too."""
    R = jl_matrix(out_dim, in_dim, seed)
    inv_sqrt = 1.0 / math.sqrt(out_dim)
    if method == "arrow":
        return _project_arrow(df, R, inv_sqrt, vec_col, out_col)
    if method != "sql":
        raise ValueError(f"unknown method {method!r}; expected sql/arrow")
    if out_dim * in_dim > SQL_MAX_TERMS:
        raise ValueError(
            f"method='sql' with {out_dim}x{in_dim}={out_dim * in_dim} terms "
            f"exceeds SQL_MAX_TERMS={SQL_MAX_TERMS}; use method='arrow'"
        )
    # One aggregate per output dim: fold(zip_with(x, R_j, a*b), +) —
    # left-to-right sum order, matched exactly by numpy's pairwise==no?
    # (numpy pairwise-sums; the arrow path sums explicitly in order to
    # stay bit-identical — see _project_arrow.)
    dims = []
    for j in range(out_dim):
        rj = F.array(*[F.lit(v) for v in R[j]])
        dims.append(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col), rj, lambda x, r: x.cast("double") * r
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            * F.lit(inv_sqrt)
        )
    # NULL vector → NULL (not an array of NULLs), matching the arrow
    # path; wrong-length vectors raise rather than silently producing
    # NULL elements (zip_with would pad/truncate with NULLs otherwise).
    bad_len = F.size(F.col(vec_col)) != F.lit(in_dim)
    return df.withColumn(
        out_col,
        F.when(F.col(vec_col).isNull(), F.lit(None).cast("array<double>"))
        .when(
            bad_len,
            F.raise_error(
                F.concat(
                    F.lit(f"project_vectors: expected length {in_dim}, got "),
                    F.size(F.col(vec_col)).cast("string"),
                )
            ).cast("array<double>"),
        )
        .otherwise(F.array(*dims)),
    )


def _project_arrow(
    df: DataFrame, R: list[list[int]], inv_sqrt: float, vec_col: str, out_col: str
) -> DataFrame:
    """Arrow path: per-batch matmul with an in-order accumulation loop
    (NOT numpy.dot, whose pairwise summation reorders additions) so
    results are bit-identical to the fold in method='sql'."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    out_fields = [
        f for f in df.schema.fields if f.name != out_col
    ] + [StructField(out_col, ArrayType(DoubleType()))]
    out_schema = StructType(out_fields)
    Rarr = np.array(R, dtype=np.float64)
    in_dim = Rarr.shape[1]

    def gen(batches):
        for pdf in batches:
            vecs = pdf[vec_col]
            out = []
            for v in vecs:
                if v is None:
                    out.append(None)
                    continue
                if len(v) != in_dim:
                    raise ValueError(
                        f"project_vectors: expected length {in_dim}, "
                        f"got {len(v)}"
                    )
                x = np.asarray(v, dtype=np.float64)
                # in-order fold per output dim: acc += x[i] * R[j][i]
                ys = []
                for j in range(Rarr.shape[0]):
                    acc = 0.0
                    prod = x * Rarr[j]
                    for p in prod:
                        acc += p
                    ys.append(acc * inv_sqrt)
                out.append(ys)
            pdf = pdf.drop(columns=[out_col], errors="ignore")
            pdf[out_col] = out
            yield pdf

    return df.mapInPandas(gen, out_schema)
