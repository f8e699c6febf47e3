"""Window-function queries (SURVEY.md §2.2 E5): top-k per group and
analytic windows — the distributed generalization of the reference's
single global sort+limit (master/master.go:286-311).

Scale: a window over ``partitionBy(g)`` shuffles once on g and sorts
within partitions — no global sort ever. Skewed groups are the risk at
100 TB; AQE skew handling plus a salted two-phase top-k would apply if a
single group outgrew an executor (group sizes here are bounded:
orders-per-customer, parts-per-brand).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import dec, disc_price, top_k_per_group
from ..registry import register, register_local
from ..sources.tables import load_table


@register(
    "topk_parts_per_brand",
    oracle="""
    SELECT p_brand, l_partkey, revenue, rn FROM (
      SELECT p_brand, l_partkey,
             CAST(row_number() OVER (PARTITION BY p_brand
                                     ORDER BY revenue DESC, l_partkey ASC) AS INTEGER) AS rn,
             revenue
      FROM (
        SELECT p_brand, l_partkey,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY p_brand, l_partkey
      )
    ) WHERE rn <= 3
    """,
)
def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: top-3 revenue parts within each brand. Aggregate first (shrinks
    to one row per part), then window over the small aggregate.

    The fact side is projected to the 3 consumed columns and hash-spread
    on l_partkey before the broadcast join: the single-row-group fixture
    scan is ONE task, so the per-row decimal disc_price (the dominant
    cost) would otherwise run serially in the partial-aggregate stage.
    No-op at real scale; bit-identical result (order-independent decimal
    sum) — measured 1.39 s → 0.69 s (guide §2.4/§2.5)."""
    from ..plans.partitioning import spread

    li = spread(
        load_table(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_extendedprice", "l_discount"
        ),
        by=["l_partkey"],
    )
    part = load_table(spark, sf_dir, "part")
    per_part = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "l_partkey")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )
    return top_k_per_group(
        per_part,
        ["p_brand"],
        [F.desc("revenue"), F.asc("l_partkey")],
        k=3,
    ).select("p_brand", "l_partkey", "revenue", "rn")


@register_local(
    "customer_order_timeline",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS INTEGER) AS order_seq,
           lag(o_totalprice) OVER w AS prev_price,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
             AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def customer_order_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: sequence number, lag, running (prefix) sum per
    customer ordered by time. (o_orderdate, o_orderkey) is a total order
    → deterministic across engines and partitionings."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("order_seq"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.sum(dec("o_totalprice")).over(running).cast("double").alias("running_spend"),
    )


@register_local(
    "ship_latency_rank",
    oracle="""
    SELECT o_orderkey, l_linenumber, lat_days,
           CAST(rank() OVER (PARTITION BY o_orderkey ORDER BY lat_days DESC) AS INTEGER)
             AS lat_rank
    FROM (
      SELECT o_orderkey, l_linenumber,
             CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS lat_days
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    )
    """,
)
def ship_latency_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() (gapped, tie-aware — deterministic even with duplicate
    latencies) over a fact-fact join + date arithmetic."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(orders, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "o_orderkey",
        "l_linenumber",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        .cast("long")
        .alias("lat_days"),
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("lat_days"))
    return joined.withColumn("lat_rank", F.rank().over(w).cast("int"))
