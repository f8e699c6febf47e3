"""Streaming heavy hitters: cross-batch Misra–Gries state must honor
the MG contract after the final batch — exact counts when width covers
the key space, bounded undercount + guaranteed presence of every
above-bound key under eviction pressure — and match the batch operator
on the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.functions.hashing import stable_bucket
from distributed_mapreduce__spark.sources.tables import load_table
from distributed_mapreduce__spark.streaming.sketches import (
    streaming_heavy_hitters,
)

SF = "/root/testdata/sf0.001"
N_SHARDS = 4


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("hh_stream"))
    ev = load_table(spark, SF, "events")
    ev.repartition(4).write.mode("overwrite").parquet(out)
    return out


def _run(spark, stream_dir, name: str, width: int):
    stream = (
        spark.readStream.schema(load_table(spark, SF, "events").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    out = streaming_heavy_hitters(stream, "event_type", width=width, n_shards=N_SHARDS)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    assert n_batches >= 4, f"expected ≥4 micro-batches, got {n_batches}"
    # a key evicted later simply stops being re-emitted, so aggregate
    # across emissions with max. max is VALID not because est_count is
    # monotone (Misra-Gries decrement rounds can shrink a resident
    # counter between emissions) but because of the MG bounds: every
    # emission's est_count <= the key's true count, and the final
    # emission of a still-resident key >= true_count - bound — so the
    # max over emissions stays within [final_est, true_count], and the
    # max_undercount taken alongside still bounds the error
    emitted = spark.table(name)
    return {
        r.key: (r.est_count, r.max_undercount)
        for r in emitted.groupBy("key")
        .agg(
            F.max("est_count").alias("est_count"),
            F.max("max_undercount").alias("max_undercount"),
        )
        .collect()
    }


def test_wide_summary_is_exact_and_matches_batch(spark, stream_dir):
    """width ≫ distinct keys → no eviction ever → streaming estimates
    are EXACT lifetime counts."""
    got = _run(spark, stream_dir, "hh_wide", width=256)
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {k: v[0] for k, v in got.items()} == exact


def test_narrow_summary_honors_mg_bound(spark, stream_dir):
    """width=2 per shard forces eviction: every estimate must
    undercount by ≤ the shard's total/width, and every key whose true
    count exceeds that bound must be present."""
    width = 2
    got = _run(spark, stream_dir, "hh_narrow", width=width)
    ev = load_table(spark, SF, "events")
    truth = {
        (r.shard, r.event_type): r.n
        for r in ev.groupBy(
            stable_bucket(F.col("event_type"), N_SHARDS).alias("shard"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    shard_totals: dict[int, int] = {}
    for (shard, _), n in truth.items():
        shard_totals[shard] = shard_totals.get(shard, 0) + n
    for (shard, key), n in truth.items():
        bound = shard_totals[shard] // width
        if n > bound:
            assert key in got, f"above-bound key {key!r} missing"
        if key in got:
            est, _ = got[key]
            assert n - bound <= est <= n, (key, est, n, bound)
