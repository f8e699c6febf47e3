"""JL random projection (operators/projection.py): sql/arrow method
bit-parity, DuckDB replay of the fold arithmetic, planted-geometry
preservation, and the guard contracts."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.projection import (
    SQL_MAX_TERMS,
    jl_matrix,
    project_vectors,
)
from distributed_mapreduce__spark.sources.tables import load_table

from .oracle_utils import compare_query

IN_DIM, OUT_DIM = 64, 16


def test_methods_bit_identical_and_null_contract(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings").limit(50)
    a = {
        r["vec_id"]: r["projected"]
        for r in project_vectors(vecs, IN_DIM, OUT_DIM, method="sql").collect()
    }
    b = {
        r["vec_id"]: r["projected"]
        for r in project_vectors(vecs, IN_DIM, OUT_DIM, method="arrow").collect()
    }
    assert a == b  # bit-exact: same fold order on both paths
    assert all(len(v) == OUT_DIM for v in a.values())

    null_df = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<float>"
    )
    got = project_vectors(null_df, IN_DIM, OUT_DIM).collect()[0]["projected"]
    assert got is None


def test_sql_path_matches_duckdb_replay(spark, sf_dir):
    """The fold (Σ x_i·R_ji)/√d replayed in DuckDB from the same
    deterministic matrix."""
    R = jl_matrix(OUT_DIM, IN_DIM, seed=0)
    inv = 1.0 / math.sqrt(OUT_DIM)
    cols = []
    for j in range(OUT_DIM):
        lit = "[" + ",".join(str(v) for v in R[j]) + "]"
        cols.append(
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(generate_series(1, {IN_DIM}), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({lit})[i])), "
            f"(a, b) -> a + b) * {inv!r} AS p{j}"
        )
    sql = f"SELECT vec_id, {', '.join(cols)} FROM embeddings"

    vecs = load_table(spark, sf_dir, "embeddings")
    proj = project_vectors(vecs, IN_DIM, OUT_DIM).select(
        "vec_id",
        *[F.col("projected")[j].alias(f"p{j}") for j in range(OUT_DIM)],
    )
    compare_query(spark, sf_dir, proj, sql)


def test_projection_preserves_planted_geometry(spark):
    """A tight near-pair must stay far closer than a far-pair after
    projection, and distances must land within the JL band for this
    (seeded, deterministic) draw."""
    rng = random.Random(3)
    base = [rng.gauss(0, 1) for _ in range(IN_DIM)]
    near = [x + rng.gauss(0, 0.01) for x in base]
    far = [rng.gauss(0, 1) for _ in range(IN_DIM)]
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: r["projected"]
        for r in project_vectors(df, IN_DIM, 32).collect()
    }

    def dist(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    d_near_in = dist(base, near)
    d_far_in = dist(base, far)
    d_near_out = dist(out[0], out[1])
    d_far_out = dist(out[0], out[2])
    # ordering preserved with a wide margin
    assert d_near_out * 10 < d_far_out
    # distances within a generous (1±0.7) JL band at out_dim=32
    assert 0.3 * d_near_in <= d_near_out <= 1.7 * d_near_in
    assert 0.3 * d_far_in <= d_far_out <= 1.7 * d_far_in


def test_guards(spark):
    df = spark.createDataFrame([(1, [0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="SQL_MAX_TERMS"):
        project_vectors(df, 512, (SQL_MAX_TERMS // 512) + 1)
    with pytest.raises(ValueError, match="unknown method"):
        project_vectors(df, 4, 2, method="numpy")


def test_wrong_length_raises_on_both_methods(spark):
    """The sql/arrow parity contract covers the error path: a vector
    whose length != in_dim raises (with the length) on BOTH methods
    instead of silently NULL-padding (sql) or truncating (arrow)."""
    df = spark.createDataFrame(
        [(1, [1.0] * (IN_DIM - 1))], "vec_id long, embedding array<double>"
    )
    for method in ("sql", "arrow"):
        with pytest.raises(Exception) as ei:
            project_vectors(df, IN_DIM, OUT_DIM, method=method).collect()
        assert f"expected length {IN_DIM}, got {IN_DIM - 1}" in str(ei.value)
