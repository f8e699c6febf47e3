"""Streaming dedup: first arrival wins, duplicates dropped as data
arrives; watermarked variant bounds state. Driven synchronously through
the memory sink like the other streaming parity tests."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_mapreduce__spark.streaming.dedup import (
    stream_dedup_within_watermark,
    stream_exact_dedup,
)
from distributed_mapreduce__spark.streaming.windows import run_to_memory_sink

_DOCS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)
_EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def test_stream_exact_dedup_keeps_one_per_text(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    # Two micro-files; 'alpha' and 'beta' each appear in both.
    (src / "a.json").write_text(
        "\n".join(
            json.dumps(d)
            for d in [
                {"doc_id": 1, "text": "alpha"},
                {"doc_id": 2, "text": "beta"},
                {"doc_id": 3, "text": "alpha"},
            ]
        )
    )
    (src / "b.json").write_text(
        "\n".join(
            json.dumps(d)
            for d in [
                {"doc_id": 4, "text": "beta"},
                {"doc_id": 5, "text": "gamma"},
            ]
        )
    )
    stream = spark.readStream.schema(_DOCS).json(str(src))
    run_to_memory_sink(stream_exact_dedup(stream), "sdedup", output_mode="append")
    out = spark.table("sdedup")
    texts = [r.text for r in out.collect()]
    assert sorted(texts) == ["alpha", "beta", "gamma"]  # one survivor each
    assert out.select("text_hash").distinct().count() == 3


def test_stream_dedup_within_watermark_drops_replays(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        {"event_id": 1, "ts": "2026-01-01T10:00:00"},
        {"event_id": 2, "ts": "2026-01-01T10:05:00"},
        {"event_id": 1, "ts": "2026-01-01T10:10:00"},  # replay within horizon
        {"event_id": 3, "ts": "2026-01-01T10:15:00"},
        {"event_id": 2, "ts": "2026-01-01T10:20:00"},  # replay within horizon
    ]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema(_EVENTS).json(str(src))
    deduped = stream_dedup_within_watermark(stream, ["event_id"], horizon="1 hour")
    run_to_memory_sink(deduped, "swdedup", output_mode="append")
    out = spark.table("swdedup")
    ids = sorted(r.event_id for r in out.collect())
    assert ids == [1, 2, 3]
    # First arrival wins: the surviving ts for id 1 is the 10:00 row.
    first = {r.event_id: r.ts for r in out.collect()}
    assert first[1].minute == 0 and first[2].minute == 5
