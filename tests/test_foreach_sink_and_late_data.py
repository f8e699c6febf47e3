"""foreachBatch exactly-once semantics + watermark late-data handling."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.timeseries import tumbling
from distributed_mapreduce__spark.sources.tables import load_table
from distributed_mapreduce__spark.streaming.foreach_sink import (
    read_sink,
    write_stream_exactly_once,
)

SF = "/root/testdata/sf0.001"


def test_foreach_sink_exactly_once_across_restart(spark, tmp_path):
    """Restarting from the same checkpoint must not duplicate rows: the
    second run resumes past the committed batches (and any replayed
    batch overwrites its own directory)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    ev.repartition(3).write.mode("overwrite").parquet(src)

    def start():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        return write_stream_exactly_once(stream, out, ckpt)

    q = start()
    q.processAllAvailable()
    q.stop()
    n_first = read_sink(spark, out).count()

    # restart from the same checkpoint — nothing new to process
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    n_second = read_sink(spark, out).count()

    assert n_first == ev.count()
    assert n_second == n_first  # no duplicates after restart


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_watermark_drops_late_data(spark, tmp_path):
    """An event older than the watermark must not resurrect an
    already-EMITTED window in append mode.

    Watermark semantics (observed, Spark 4): a late row arriving while
    its window is still in state merges into it — the watermark bounds
    state EVICTION, not input admission, until the window has been
    emitted and dropped. So the drop guarantee needs three batches:
    (1) events incl. one far ahead → watermark advances; (2) another
    on-time batch → the closed noon window emits; (3) the late row →
    its window is gone from state and the row is discarded."""
    import time

    src = str(tmp_path / "late_src")
    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    batches = [
        [
            (1, base, 10.0),
            (2, base + dt.timedelta(minutes=5), 10.0),
            (3, base + dt.timedelta(hours=2), 10.0),  # advances watermark
        ],
        [(5, base + dt.timedelta(hours=2, minutes=5), 10.0)],  # flush trigger
        [(4, base + dt.timedelta(minutes=1), 99.0)],  # late: window emitted
    ]
    schema = "event_id long, ts timestamp, value double"
    # appends → flat files in one dir (nested dirs are invisible to the
    # streaming file source); mtime gaps order the micro-batches
    for b in batches:
        spark.createDataFrame(b, ["event_id", "ts", "value"]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("win"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .select(F.col("win.start").alias("ws"), "n", "v")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["ws"]: (r["n"], r["v"]) for r in spark.table("late_out").collect()}
    # the noon window closed with the 2 on-time events; the late event
    # (ts=12:01, value 99) was dropped, not merged and not re-emitted
    noon = base
    assert rows.get(noon) == (2, 20.0), rows
    assert not any(v == 99.0 or v == 119.0 for (_, v) in rows.values())
