"""As-of join query: each event annotated with the user's most recent
order as of the event time (the point-in-time-correct feature lookup).

The oracle replays the same union-timeline window form (not DuckDB's
native ASOF JOIN, whose equal-timestamp tie-breaking is unspecified —
ours is total: ts, then side, then orderkey)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..registry import register
from ..sources.tables import load_table


@register(
    "events_asof_orders",
    oracle="""
    WITH timeline AS (
      SELECT user_id AS k, ts, 1 AS side, NULL::BIGINT AS tie,
             NULL::BIGINT AS val, event_id
      FROM events
      UNION ALL
      SELECT o_custkey AS k, o_orderdate AS ts, 0 AS side, o_orderkey AS tie,
             o_orderkey AS val, NULL::BIGINT AS event_id
      FROM orders
    ),
    carried AS (
      SELECT event_id, k, ts, side,
             last_value(val IGNORE NULLS) OVER (
               PARTITION BY k ORDER BY ts ASC, side ASC, tie ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_o_orderkey
      FROM timeline
    )
    SELECT event_id, k AS user_id, ts, asof_o_orderkey
    FROM carried WHERE side = 1
    """,
)
def events_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via union-timeline + carry-forward window (one shuffle
    on the key; the 100 TB-safe form of a point-in-time join)."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"
    )
    return asof_join(
        events,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        value_col="o_orderkey",
        tie_col="o_orderkey",
    ).select("event_id", "user_id", "ts", "asof_o_orderkey")
