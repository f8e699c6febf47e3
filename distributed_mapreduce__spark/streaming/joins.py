"""Stream-stream joins (Structured Streaming's hardest operator class).

Joining two unbounded streams requires BOTH sides to buffer state:
a row must wait for future matches from the other stream. Unbounded
buffering is the default failure mode — the scalable form constrains
the match window with (a) watermarks on both sides and (b) an
event-time interval predicate, so the state store evicts rows the
interval can no longer match.

``interval_join`` is the canonical shape: left rows match right rows
with the same key whose event time falls in
[left.ts + lower, left.ts + upper]. State per key is bounded by
(watermark + interval width) × arrival rate — the same bounded-state
argument as windowed aggregation, applied twice.

At production scale both sides are Kafka topics; the operator
definition is source-agnostic (tests drive it with file-replay JSON).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "lts",
    right_ts: str = "rts",
    lower: str = "0 seconds",
    upper: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner stream-stream join: same ``on`` key, right event time in
    [left_ts + lower, left_ts + upper]. Both sides watermarked so the
    state store can evict; column names must be disjoint apart from
    ``on`` (rename before calling)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(left_ts) + F.expr(f"INTERVAL {lower}") <= F.col(right_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, on=[on], how="inner").where(cond)
