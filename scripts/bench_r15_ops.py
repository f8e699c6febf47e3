#!/usr/bin/env python3
"""Measure the round-15 storage operators end-to-end — folded into
bench.py's ``new_ops`` section alongside the round-6..14 sets.

Covered:

- txsink_transform_drain: table→table readStream→writeStream onto a
  ``months(o_orderdate)``-HIDDEN-partitioned target — the SINK
  computes transform placement natively in the Arrow write path and
  records derived [v,v] + source [min,max] stats — followed by a
  transform-PRUNED one-year read from the log alone (compare
  txsink_stream_drain, r14: same transport, unpartitioned target)
- txsink_check_drain: the same transport onto a target carrying a
  CHECK constraint — prices the per-batch duckdb constraint
  evaluation the sink now runs before staging
- multi_merge_conditional: an atomic TWO-table conditional MERGE via
  tx_multi(modes='merge', merge_clauses=...) — both participants run
  the full clause engine (conditional UPDATE / DELETE / guarded
  INSERT) and become visible together through one coordinator record
- txsource_bounded_drain: a 6-commit backlog drained through
  ``maxVersionsPerTrigger=2`` (3 micro-batches instead of one
  whole-backlog batch) — prices the bounded incremental planning
  that keeps cold-start memory flat on a deep backlog

Usage: python scripts/bench_r15_ops.py [sf_dir ...] — or import
``measure`` (bench.py does).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def measure(spark, sf_dir: str, tmp: str) -> dict[str, float]:
    import datetime as dt

    from distributed_mapreduce__spark.sources.multitx import tx_multi
    from distributed_mapreduce__spark.sources.tables import load_table
    from distributed_mapreduce__spark.sources.txlog import (
        tx_add_constraint,
        tx_read,
        tx_write,
    )
    from distributed_mapreduce__spark.streaming.tx_source import (
        register_tx_source,
    )

    register_tx_source(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority",
        "o_totalprice",
    )
    orders.count()  # warm
    out: dict[str, float] = {}

    # stream drain onto a months()-partitioned target + pruned read.
    # Cluster the source by month so each staged batch covers few
    # placement groups (the production ingest pattern — one file per
    # group per task).
    t_src, t_dst = f"{tmp}/tr_src", f"{tmp}/tr_dst"
    clustered = orders.repartition(F.trunc("o_orderdate", "month"))
    tx_write(clustered.filter(F.col("o_orderkey") % 2 == 0), t_src)
    tx_write(clustered.filter(F.col("o_orderkey") % 2 == 1), t_src)
    tx_write(orders.limit(0), t_dst,
             partition_by=["months(o_orderdate)"])
    t0 = time.perf_counter()
    q = (
        spark.readStream.format("txtable").option("path", t_src).load()
        .writeStream.format("txtable")
        .option("path", t_dst)
        .option("appId", "bench-tr-sink")
        .option("checkpointLocation", f"{tmp}/tr_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _noop(
        tx_read(
            spark, t_dst,
            where=("o_orderdate", dt.datetime(1996, 1, 1),
                   dt.datetime(1996, 12, 31, 23, 59, 59)),
        )
    )
    out["txsink_transform_drain"] = round(time.perf_counter() - t0, 3)

    # stream drain onto a CHECK-constrained target (per-batch duckdb
    # evaluation in the sink's write path)
    c_src, c_dst = f"{tmp}/ck_src", f"{tmp}/ck_dst"
    tx_write(orders, c_src)
    tx_write(orders.limit(0), c_dst)
    tx_add_constraint(spark, c_dst, "nonneg_price",
                      "o_totalprice >= 0")
    t0 = time.perf_counter()
    q = (
        spark.readStream.format("txtable").option("path", c_src).load()
        .writeStream.format("txtable")
        .option("path", c_dst)
        .option("appId", "bench-ck-sink")
        .option("checkpointLocation", f"{tmp}/ck_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out["txsink_check_drain"] = round(time.perf_counter() - t0, 3)

    # atomic two-table conditional MERGE
    m1, m2 = f"{tmp}/mm_a", f"{tmp}/mm_b"
    tx_write(
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .repartitionByRange(8, "o_orderkey"),
        m1, stats_cols=["o_orderkey"],
    )
    tx_write(
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .repartitionByRange(8, "o_orderkey"),
        m2, stats_cols=["o_orderkey"],
    )
    delta = (
        orders.filter(F.col("o_orderkey") % 5 == 0)
        .groupBy("o_orderkey")
        .agg(
            F.min("o_custkey").alias("o_custkey"),
            F.min("o_orderdate").alias("o_orderdate"),
            F.min("o_orderpriority").alias("o_orderpriority"),
            F.max("o_totalprice").alias("o_totalprice"),
        )
    )
    clauses = {
        "when_matched": [
            {"condition": "s.o_totalprice > t.o_totalprice",
             "set": {"o_totalprice": "s.o_totalprice"}},
            {"action": "delete", "condition": "t.o_orderkey % 7 = 0"},
        ],
        "when_not_matched": [{"condition": "s.o_orderkey % 5 = 0"}],
    }
    t0 = time.perf_counter()
    tx_multi(
        {m1: delta, m2: delta},
        coordinator=f"{tmp}/mm_coord",
        modes={m1: "merge", m2: "merge"},
        merge_keys={m1: "o_orderkey", m2: "o_orderkey"},
        merge_clauses={m1: clauses, m2: clauses},
    )
    _noop(tx_read(spark, m1))
    _noop(tx_read(spark, m2))
    out["multi_merge_conditional"] = round(time.perf_counter() - t0, 3)

    # bounded backlog drain: 6 commits, 2 versions per trigger
    b_src = f"{tmp}/bd_src"
    for i in range(6):
        tx_write(orders.filter(F.col("o_orderkey") % 6 == i), b_src)
    counts: list[int] = []
    t0 = time.perf_counter()
    q = (
        spark.readStream.format("txtable").option("path", b_src)
        .option("maxVersionsPerTrigger", "2").load()
        .writeStream.foreachBatch(
            lambda df, bid: counts.append(df.count())
        )
        .option("checkpointLocation", f"{tmp}/bd_ckpt")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out["txsource_bounded_drain"] = round(time.perf_counter() - t0, 3)

    return out


if __name__ == "__main__":
    import tempfile

    from distributed_mapreduce__spark.session import get_spark

    spark = get_spark()
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.01"]:
        res = measure(spark, sf_dir, tempfile.mkdtemp(prefix="bench_r15_"))
        print(json.dumps({"sf_dir": sf_dir, **res}))
