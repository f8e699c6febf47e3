"""Approximate sketches must track their exact counterparts within the
documented error bounds (HLL++ rsd default 5%; percentile_approx with
10k accuracy ≈ exact on 60k rows)."""

from __future__ import annotations

import pytest

from distributed_mapreduce__spark import registry

registry.load_all()


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_sketches_within_tolerance(spark, sf_dir):
    """The registered query emits within-tolerance booleans (so the
    oracle can check them cross-engine); locally also pin the tighter
    raw bounds on the underlying sketches."""
    rows = registry.resolve("approx_stats")(spark, sf_dir).collect()
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


def test_quantiles_front_door(spark):
    """The quantile front door: exact branch matches DuckDB
    quantile_cont bit-for-bit; approx branch respects the GK rank-error
    bound; auto routes small groups to exact and huge declared inputs
    to approx."""
    import duckdb

    from distributed_mapreduce__spark.operators.relational import quantiles
    from distributed_mapreduce__spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    li = load_table(spark, sf, "lineitem")
    probs = [0.25, 0.5, 0.75]

    exact = quantiles(li, "l_quantity", probs, ["l_returnflag"],
                      strategy="exact")
    got = sorted(map(tuple, exact.collect()))
    con = duckdb.connect()
    want = sorted(
        con.execute(
            f"""SELECT l_returnflag,
                 quantile_cont(l_quantity, 0.25),
                 quantile_cont(l_quantity, 0.5),
                 quantile_cont(l_quantity, 0.75)
                FROM '{sf}/lineitem.parquet' GROUP BY l_returnflag"""
        ).fetchall()
    )
    assert got == want

    # auto on the small fixture picks exact — identical rows
    auto = sorted(
        map(tuple, quantiles(li, "l_quantity", probs, ["l_returnflag"]).collect())
    )
    assert auto == got

    # auto with a declared huge input routes to the sketch; with
    # accuracy=10k on ~60k rows the rank error ≤ N/accuracy ≈ 6 ranks —
    # values must sit within a tight quantile neighborhood of exact
    approx = {
        r[0]: r[1:]
        for r in quantiles(
            li, "l_quantity", probs, ["l_returnflag"], n_rows=10**12
        ).collect()
    }
    for flag, *vals in got:
        for e, a in zip(vals, approx[flag]):
            assert abs(e - a) <= 2.0, (flag, e, a)  # quantity grid is 1..50

    import pytest

    with pytest.raises(ValueError, match="unknown strategy"):
        quantiles(li, "l_quantity", probs, strategy="tdigest")


def test_quantiles_ungrouped_global(spark):
    """No group_cols → one global row; exact matches DuckDB, auto on
    the fixture picks exact."""
    import duckdb

    from distributed_mapreduce__spark.operators.relational import quantiles
    from distributed_mapreduce__spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    li = load_table(spark, sf, "lineitem")
    got = quantiles(li, "l_extendedprice", [0.5, 0.9]).collect()
    assert len(got) == 1
    want = duckdb.connect().execute(
        f"""SELECT quantile_cont(l_extendedprice, 0.5),
                   quantile_cont(l_extendedprice, 0.9)
            FROM '{sf}/lineitem.parquet'"""
    ).fetchone()
    assert (got[0].q_0_5, got[0].q_0_9) == want
