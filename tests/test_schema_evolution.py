"""Schema-evolution reads: generations with added columns union into
one frame (NULL backfill), filters still push into each scan, and
incompatible type changes fail loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.sources.tables import read_parquet_evolving


@pytest.fixture()
def generations(spark, tmp_path):
    g1 = str(tmp_path / "g1")
    g2 = str(tmp_path / "g2")
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    ).write.parquet(g1)
    spark.createDataFrame(
        [(3, "gamma", 0.9), (4, "delta", 0.2)],
        "doc_id long, text string, quality double",
    ).write.parquet(g2)
    return g1, g2


def test_merged_read_unions_schemas_with_null_backfill(spark, generations):
    g1, g2 = generations
    df = read_parquet_evolving(spark, g1, g2)
    assert set(df.columns) == {"doc_id", "text", "quality"}
    rows = {r.doc_id: r for r in df.collect()}
    assert len(rows) == 4
    assert rows[1].quality is None and rows[3].quality == 0.9


def test_filters_still_push_into_merged_scan(spark, generations):
    g1, g2 = generations
    df = read_parquet_evolving(spark, g1, g2).filter(F.col("doc_id") > 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,2)" in plan
    assert {r.doc_id for r in df.collect()} == {3, 4}


def test_incompatible_type_change_fails_loudly(spark, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    spark.createDataFrame([(1, 5)], "doc_id long, v int").write.parquet(a)
    spark.createDataFrame([(2, "five")], "doc_id long, v string").write.parquet(b)
    with pytest.raises(Exception, match="(?i)merge|incompatible|failed"):
        read_parquet_evolving(spark, a, b).collect()
