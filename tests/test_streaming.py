"""Batch/stream parity for the E7 window operators (SURVEY.md §5, §7.4).

The streaming variants must compute the same windows as batch when the
whole fixture is replayed: complete mode equals batch exactly; append
mode emits exactly the windows closed by the final watermark.
"""

from __future__ import annotations

import pytest

from distributed_mapreduce__spark.operators.timeseries import sessionized, tumbling
from distributed_mapreduce__spark.sources.tables import load_table
from distributed_mapreduce__spark.streaming.windows import (
    read_events_stream,
    run_to_memory_sink,
    stream_sessionized,
    stream_tumbling,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_complete_equals_batch(spark):
    batch = tumbling(load_table(spark, SF, "events"), "10 minutes", "event_type")
    stream = stream_tumbling(read_events_stream(spark, SF))
    run_to_memory_sink(stream, "tumbling_out", output_mode="complete")
    assert _rows(spark.table("tumbling_out")) == _rows(batch)


def test_sessions_append_is_closed_prefix(spark):
    events = load_table(spark, SF, "events")
    batch = sessionized(events, "30 minutes", "user_id")
    stream = stream_sessionized(read_events_stream(spark, SF))
    run_to_memory_sink(stream, "sessions_out", output_mode="append")
    got = _rows(spark.table("sessions_out"))

    # Final watermark = max event time - 30 min delay; append emits the
    # sessions whose end ≤ watermark.
    from pyspark.sql import functions as F

    max_ts = events.agg(F.max("ts")).collect()[0][0]
    import datetime as dt

    watermark = max_ts - dt.timedelta(minutes=30)
    expected = _rows(batch.filter(F.col("session_end") <= F.lit(watermark)))
    assert got == expected
    assert len(got) > 0
