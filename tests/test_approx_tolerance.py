"""Approximate sketches must track their exact counterparts within the
documented error bounds (HLL++ rsd default 5%; percentile_approx with
10k accuracy ≈ exact on 60k rows)."""

from __future__ import annotations

from distributed_mapreduce__spark import registry

registry.load_all()


def test_sketches_within_tolerance(spark, sf_dir):
    """The registered query emits within-tolerance booleans (so the
    oracle can check them cross-engine); locally also pin the tighter
    raw bounds on the underlying sketches."""
    rows = registry.QUERIES["approx_stats"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.approx_parts_ok, r
        assert r.approx_median_ok, r
        assert r.exact_parts > 0 and r.exact_median_price > 0, r

    from pyspark.sql import functions as F

    from distributed_mapreduce__spark.sources.tables import load_table

    raw = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.percentile_approx("l_extendedprice", 0.5, 10_000).alias(
                "approx_median_price"
            ),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("exact_median_price"),
        )
        .collect()
    )
    for r in raw:
        assert abs(r.approx_parts - r.exact_parts) <= max(5, 0.1 * r.exact_parts), r
        rel = abs(r.approx_median_price - r.exact_median_price) / r.exact_median_price
        assert rel <= 0.02, r
