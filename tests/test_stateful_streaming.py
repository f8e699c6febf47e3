"""Custom stateful streaming operator: state must accumulate correctly
ACROSS micro-batches (the whole point of applyInPandasWithState) and the
final running totals must equal the batch aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.sources.tables import load_table
from distributed_mapreduce__spark.streaming.stateful import user_running_stats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def multi_batch_dir(spark, tmp_path_factory):
    """Events split over 4 files so maxFilesPerTrigger=1 forces 4
    micro-batches — state genuinely crosses batch boundaries."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, SF, "events")
    ev.repartition(4).write.mode("overwrite").parquet(out)
    return out


def test_state_accumulates_across_batches(spark, multi_batch_dir):
    stream = (
        spark.readStream.schema(load_table(spark, SF, "events").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(multi_batch_dir)
    )
    out = user_running_stats(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("user_stats")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    assert n_batches >= 4, f"expected ≥4 micro-batches, got {n_batches}"

    # final running totals = row with max n_events per user
    emitted = spark.table("user_stats")
    final = (
        emitted.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value_cents").alias("total_value_cents"),
            F.max("last_event_us").alias("last_event_us"),
        )
    )
    ev = load_table(spark, SF, "events")
    expected = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_value_cents"),
        F.max(F.unix_micros("ts")).alias("last_event_us"),
    )
    got = sorted(tuple(r) for r in final.collect())
    want = sorted(tuple(r) for r in expected.collect())
    assert got == want
