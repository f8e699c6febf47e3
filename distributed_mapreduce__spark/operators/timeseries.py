"""Event-time window operators (SURVEY.md §2.2 E7) — batch forms.

The reference has no time semantics at all (§2.2 gap list); these are
north-star extensions built on Spark's native event-time windowing so the
same operator definitions serve batch (here) and Structured Streaming
(``streaming/windows.py`` adds watermarks to these exact shapes).

Scale: windowed groupBy shuffles on (window, keys) — the window column is
derived, so partial aggregation still collapses each input partition to
one row per (window, key) before the exchange. Session windows shuffle on
the user key and merge per-key sorted runs; skewed users are the 100 TB
risk (bound session length or salt by day for pathological keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _agg_exprs() -> list[Column]:
    """Shared aggregate set for the window queries: count + exact sum +
    engine-identical double average (see operators/relational.py)."""
    value_dec = F.col("value").cast("decimal(18,4)")
    return [
        F.count("*").alias("n_events"),
        F.sum(value_dec).cast("double").alias("sum_value"),
        (F.sum(value_dec).cast("double") / F.count("*")).alias("avg_value"),
    ]


def tumbling(df: DataFrame, duration: str, *keys: str) -> DataFrame:
    """Fixed, non-overlapping event-time buckets (epoch-aligned)."""
    return (
        df.groupBy(F.window("ts", duration).alias("win"), *keys)
        .agg(*_agg_exprs())
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sliding(df: DataFrame, duration: str, slide: str, *keys: str) -> DataFrame:
    """Overlapping buckets: each event lands in duration/slide windows."""
    return (
        df.groupBy(F.window("ts", duration, slide).alias("win"), *keys)
        .agg(*_agg_exprs())
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sessionized(df: DataFrame, gap: str, *keys: str) -> DataFrame:
    """Session windows: runs of events per key separated by < gap;
    window end = last event + gap (Spark ``session_window`` semantics)."""
    return (
        df.groupBy(F.session_window("ts", gap).alias("win"), *keys)
        .agg(*_agg_exprs())
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            *keys,
            "n_events",
            "sum_value",
            "avg_value",
        )
    )
