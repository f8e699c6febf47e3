#!/usr/bin/env python3
"""Measure the round-14 storage operators end-to-end — folded into
bench.py's ``new_ops`` section alongside the round-6..13 sets.

Covered:

- merge_into_conditional: the conditional-clause MERGE engine
  (WHEN MATCHED AND cond UPDATE / WHEN MATCHED DELETE / conditional
  WHEN NOT MATCHED INSERT on a composite key) + the post-merge read —
  one left-outer join with per-column CASE chains, stats-pruned
- sql_merge_clauses: the same clause shape driven as ONE SQL string
  through tx_sql (parse + dispatch overhead on top of the engine)
- txsink_stream_drain: table→table readStream→writeStream through the
  txtable SOURCE and the new txtable SINK (availableNow), exactly-once
  on both ends — compare tx_source_stream_drain (r13, foreach-free
  read half only)
- spec_evolve_mixed_read: partition-spec evolution (metadata commit)
  + an append under the NEW spec + a full read unioning both layouts
  (prices the spec-registry fold and mixed-signature scan)
- batch_withrowids_read: spark.read.format('txtable') with
  option('withRowIds') draining a tracked table (pure-python planning
  + arrow read + id attach)

Usage: python scripts/bench_r14_ops.py [sf_dir ...] — or import
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
    from distributed_mapreduce__spark.sources.tables import load_table
    from distributed_mapreduce__spark.sources.tx_sql import (
        tx_register_table,
        tx_sql,
    )
    from distributed_mapreduce__spark.sources.txlog import (
        tx_enable_row_tracking,
        tx_merge,
        tx_read,
        tx_set_partitioning,
        tx_write,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    orders.count()  # warm
    out: dict[str, float] = {}

    # conditional multi-key MERGE (engine direct)
    tm = f"{tmp}/merge_into_t"
    tx_write(
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .repartitionByRange(8, "o_orderkey"),
        tm, stats_cols=["o_orderkey"],
    )
    src = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            F.min("o_orderpriority").alias("o_orderpriority"),
            F.min("o_totalprice").alias("o_totalprice"),
        )
    )
    t0 = time.perf_counter()
    tx_merge(
        src, tm, ["o_orderkey", "o_custkey"],
        when_matched=[
            {"condition": "s.o_totalprice > t.o_totalprice",
             "set": {"o_totalprice": "s.o_totalprice"}},
            {"action": "delete", "condition": "t.o_orderkey % 7 = 0"},
        ],
        when_not_matched=[
            {"condition": "s.o_orderkey % 5 != 0"},
        ],
        cdf=False,
    )
    _noop(tx_read(spark, tm))
    out["merge_into_conditional"] = round(time.perf_counter() - t0, 3)

    # the same clause shape as ONE SQL string
    ts = f"{tmp}/merge_sql_t"
    tx_write(
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .repartitionByRange(8, "o_orderkey"),
        ts, stats_cols=["o_orderkey"],
    )
    tx_register_table(spark, "bench_merge_t", ts)
    src.createOrReplaceTempView("bench_merge_src")
    t0 = time.perf_counter()
    tx_sql(
        spark,
        "MERGE INTO bench_merge_t USING bench_merge_src AS s "
        "ON bench_merge_t.o_orderkey = s.o_orderkey "
        "AND o_custkey = o_custkey "
        "WHEN MATCHED AND s.o_totalprice > t.o_totalprice THEN "
        "UPDATE SET o_totalprice = s.o_totalprice "
        "WHEN MATCHED AND t.o_orderkey % 7 = 0 THEN DELETE "
        "WHEN NOT MATCHED AND s.o_orderkey % 5 != 0 THEN INSERT *",
    )
    _noop(tx_read(spark, ts))
    out["sql_merge_clauses"] = round(time.perf_counter() - t0, 3)

    # table -> table stream through the txtable SOURCE + SINK
    from distributed_mapreduce__spark.streaming.tx_source import (
        register_tx_source,
    )

    register_tx_source(spark)
    s_src, s_dst = f"{tmp}/sink_src", f"{tmp}/sink_dst"
    for i in range(4):
        tx_write(
            orders.filter(F.col("o_orderkey") % 4 == i), s_src
        )
    tx_write(orders.limit(0), s_dst)
    t0 = time.perf_counter()
    q = (
        spark.readStream.format("txtable").option("path", s_src).load()
        .writeStream.format("txtable")
        .option("path", s_dst)
        .option("appId", "bench-sink")
        .option("checkpointLocation", f"{tmp}/sink_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out["txsink_stream_drain"] = round(time.perf_counter() - t0, 3)

    # partition-spec evolution + mixed-layout read
    tp = f"{tmp}/spec_t"
    tx_write(
        orders.repartition(4), tp, stats_cols=["o_orderkey"],
    )
    t0 = time.perf_counter()
    tx_set_partitioning(spark, tp, ["o_orderpriority"])
    tx_write(
        orders.filter(F.col("o_orderkey") % 10 == 0).repartition(2), tp
    )
    _noop(tx_read(spark, tp))
    out["spec_evolve_mixed_read"] = round(time.perf_counter() - t0, 3)

    # batch withRowIds through the DataSource
    tb = f"{tmp}/rowid_batch_t"
    tx_write(
        orders.select("o_orderkey", "o_totalprice").repartition(4), tb
    )
    tx_enable_row_tracking(spark, tb)
    t0 = time.perf_counter()
    _noop(
        spark.read.format("txtable")
        .option("path", tb)
        .option("withRowIds", "true")
        .load()
    )
    out["batch_withrowids_read"] = round(time.perf_counter() - t0, 3)

    return out


if __name__ == "__main__":
    import tempfile

    from distributed_mapreduce__spark.session import get_spark

    spark = get_spark()
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.01"]:
        res = measure(spark, sf_dir, tempfile.mkdtemp(prefix="bench_r14_"))
        print(json.dumps({"sf_dir": sf_dir, **res}))
