"""Stream-stream interval join: streaming result equals the identical
batch join (the parity contract used for every streaming operator)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_mapreduce__spark.streaming.joins import interval_join
from distributed_mapreduce__spark.streaming.windows import run_to_memory_sink

_CLICKS = T.StructType(
    [
        T.StructField("user", T.LongType()),
        T.StructField("lts", T.TimestampType()),
        T.StructField("page", T.StringType()),
    ]
)
_BUYS = T.StructType(
    [
        T.StructField("user", T.LongType()),
        T.StructField("rts", T.TimestampType()),
        T.StructField("amount", T.DoubleType()),
    ]
)

CLICKS = [
    {"user": 1, "lts": "2026-01-01T10:00:00", "page": "a"},
    {"user": 1, "lts": "2026-01-01T11:30:00", "page": "b"},
    {"user": 2, "lts": "2026-01-01T10:05:00", "page": "a"},
    {"user": 3, "lts": "2026-01-01T10:10:00", "page": "c"},
]
BUYS = [
    {"user": 1, "rts": "2026-01-01T10:20:00", "amount": 9.5},   # joins click@10:00
    {"user": 2, "rts": "2026-01-01T11:00:00", "amount": 3.0},   # outside 30 min
    {"user": 3, "rts": "2026-01-01T10:10:00", "amount": 7.0},   # boundary: lower=0
]


def _write(dirpath, rows):
    dirpath.mkdir()
    (dirpath / "data.json").write_text("\n".join(json.dumps(r) for r in rows))
    return str(dirpath)


def test_stream_interval_join_equals_batch(spark, tmp_path):
    cdir = _write(tmp_path / "clicks", CLICKS)
    bdir = _write(tmp_path / "buys", BUYS)

    cs = spark.readStream.schema(_CLICKS).json(cdir)
    bs = spark.readStream.schema(_BUYS).json(bdir)
    joined = interval_join(cs, bs, on="user", upper="30 minutes")
    run_to_memory_sink(joined, "ssj", output_mode="append")
    got = sorted(
        (r.user, r.page, r.amount) for r in spark.table("ssj").collect()
    )

    cb = spark.createDataFrame(
        [(r["user"], r["lts"], r["page"]) for r in CLICKS],
        "user long, lts string, page string",
    ).withColumn("lts", F.to_timestamp("lts"))
    bb = spark.createDataFrame(
        [(r["user"], r["rts"], r["amount"]) for r in BUYS],
        "user long, rts string, amount double",
    ).withColumn("rts", F.to_timestamp("rts"))
    batch = cb.join(bb, "user").where(
        (F.col("lts") <= F.col("rts"))
        & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 30 minutes"))
    )
    want = sorted((r.user, r.page, r.amount) for r in batch.collect())

    assert got == want
    assert (1, "a", 9.5) in got and (3, "c", 7.0) in got
    assert all(u != 2 for u, _, _ in got)  # outside the interval
