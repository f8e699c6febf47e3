"""Bucketed-table layout (sources/layout.write_bucketed): the
pay-the-shuffle-once claim, pinned on physical plans — a join of two
co-bucketed tables and a groupBy on the bucket key must both run with
ZERO Exchange, and results must equal the plain-parquet equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.sources.layout import write_bucketed
from distributed_mapreduce__spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("buckets")
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        orders, "b_orders", str(d / "orders"), ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        lineitem, "b_lineitem", str(d / "lineitem"), ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    yield orders, lineitem
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cobucketed_join_has_zero_exchange(spark, bucketed):
    """Broadcast is disabled here: on the tiny fixture the planner
    would broadcast either side (fine, but that hides the claim under
    test). With both join strategies forced to the shuffle family, the
    co-bucketed join must still carry ZERO Exchange — the layout IS
    the partitioning — while the plain-parquet twin shuffles."""
    orders, lineitem = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey).groupBy(
            "o_orderkey"
        ).agg(F.count("*").alias("n"))
        joined.collect()
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        # same result as the plain-parquet formulation (which shuffles)
        plain = (
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .groupBy("o_orderkey")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
        assert "Exchange" in _plan(plain)  # the shuffle bucketing removes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_groupby_on_bucket_key_has_zero_exchange(spark, bucketed):
    agg = (
        spark.table("b_lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    agg.collect()
    assert "Exchange" not in _plan(agg)


def test_mismatched_bucket_counts_still_correct(spark, bucketed, tmp_path):
    """A 4-bucket table joined to an 8-bucket table re-shuffles ONE
    side (Spark coalesces/shuffles the mismatch) but stays correct —
    the documented both-sides-same-count contract is about performance,
    not a correctness cliff."""
    orders, lineitem = bucketed
    write_bucketed(
        orders, "b_orders4", str(tmp_path / "o4"), ["o_orderkey"], 4
    )
    try:
        j = spark.table("b_orders4").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        want = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert j.count() == want
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders4")


def test_requires_bucket_cols(spark):
    with pytest.raises(ValueError, match="bucket_cols"):
        write_bucketed(
            spark.range(3), "b_bad", "/tmp/x", [], 4
        )
