"""Join front door (relational.join_auto): route dispatch pinned on
physical plans, every route computing the identical join, hot-key
detection from the seeded sample, and hint-driven plan-only routing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.relational import join_auto

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def skewed(spark):
    """Fact side where one key owns ~60% of rows, plus an even dim."""
    hot = spark.range(0, 6000).select(
        F.lit(7).alias("k"), F.col("id").alias("row_id")
    )
    cold = spark.range(6000, 10000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("row_id")
    )
    fact = hot.unionByName(cold)
    dim = spark.range(0, 97).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    return fact, dim


def _rows(df):
    return sorted(map(tuple, df.select("k", "row_id", "label").collect()))


def test_broadcast_route_small_dim(spark, skewed):
    fact, dim = skewed
    out = {}
    j = join_auto(fact, dim, "k", route_out=out)
    assert out["route"] == "broadcast"
    j.collect()
    assert "BroadcastHashJoin" in _plan(j)


def test_salted_route_on_hot_key(spark, skewed):
    fact, dim = skewed
    out = {}
    # force the dim over the broadcast bar so skew probing engages
    j = join_auto(
        fact,
        dim,
        "k",
        salt_by="row_id",
        broadcast_max_rows=10,
        route_out=out,
    )
    assert out["route"] == "salted"
    assert "holds" in out["why"]
    # all three routes agree on the result
    want = _rows(join_auto(fact, dim, "k", strategy="plain"))
    assert _rows(j) == want
    assert _rows(join_auto(fact, dim, "k", strategy="broadcast")) == want


def test_even_keys_stay_plain(spark, skewed):
    _, dim = skewed
    even = spark.range(0, 5000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("row_id")
    )
    out = {}
    join_auto(even, dim, "k", salt_by="row_id",
              broadcast_max_rows=10, route_out=out)
    assert out["route"] == "plain"
    assert "even" in out["why"]


def test_skew_without_salt_by_falls_back_to_plain(spark, skewed):
    fact, dim = skewed
    out = {}
    join_auto(fact, dim, "k", broadcast_max_rows=10, route_out=out)
    assert out["route"] == "plain"
    assert "AQE" in out["why"]


def test_hints_make_routing_plan_only(spark, skewed):
    """With both row counts supplied (the profile-sidecar posture) the
    broadcast decision runs zero estimation jobs — pinned by counting
    Spark jobs around the call."""
    fact, dim = skewed
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    out = {}
    join_auto(fact, dim, "k", left_rows=10_000, right_rows=97, route_out=out)
    assert out["route"] == "broadcast"
    assert len(tracker.getJobIdsForGroup(None)) == before  # no jobs ran


def test_outer_join_routes(spark, skewed):
    fact, dim = skewed
    out = {}
    j = join_auto(fact, dim, "k", how="left", route_out=out)
    assert out["route"] == "broadcast"
    assert j.count() == fact.count()
    # salted outer is refused loudly (replication breaks null semantics)
    with pytest.raises(ValueError, match="inner"):
        join_auto(fact, dim, "k", how="left", strategy="salted",
                  salt_by="row_id")
