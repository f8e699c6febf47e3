#!/usr/bin/env python3
"""Measure the round-12 storage operators end-to-end — folded into
bench.py's ``new_ops`` section alongside the round-6/7/9/11 sets.

Covered:

- hidden_partition_write_read: tx_write of orders under a
  months(o_orderdate) TRANSFORM spec (rows clustered by month first,
  the production ingest pattern) + a source-column-pruned read — the
  placement value never exists outside the directory names
- hidden_partition_merge: a key-pruned MERGE into the transform
  layout (placement recomputed for the rewritten files)
- column_rename_read: tx_rename_column (one metadata commit on the
  whole table) + full read under the new name + a stats-pruned read
  whose predicate translates to the frozen physical name
- column_drop_append_read: tx_drop_column + a schema-evolving re-add
  (fresh physical identity) + full read
- run_pipes_3x2tick: the multi-pipe scheduler draining three copy
  pipes x two source commits each, concurrent ticks, zero sleeps
- dv_delete_read: DELETE WHERE as a positional deletion vector (KB
  sidecars, zero data files rewritten) + the one-broadcast-anti-join
  read over lineitem
- dv_position_dedup: tx_scan_with_pos + keep-first window +
  tx_delete_positions erasing re-ingested duplicate document rows,
  then the full read

Usage: python scripts/bench_r12_ops.py [sf_dir ...] — or import
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

    from distributed_mapreduce__spark.sources.tables import load_table
    from distributed_mapreduce__spark.sources.txlog import (
        tx_drop_column,
        tx_merge,
        tx_read,
        tx_rename_column,
        tx_set_properties,
        tx_write,
    )
    from distributed_mapreduce__spark.streaming.table_stream import (
        pipe_available_now,
        run_pipes,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    orders.count()  # warm
    out: dict[str, float] = {}

    # hidden partitioning: months(o_orderdate) write + pruned read
    th = f"{tmp}/hidden_t"
    clustered = orders.repartition(F.trunc("o_orderdate", "month"))
    t0 = time.perf_counter()
    tx_write(
        clustered, th,
        partition_by=["months(o_orderdate)"], stats_cols=["o_orderkey"],
    )
    tx_set_properties(spark, th, {"cdf.enabled": False})
    _noop(
        tx_read(
            spark, th,
            where=("o_orderdate", dt.date(1996, 1, 1), dt.date(1996, 12, 31)),
        )
    )
    out["hidden_partition_write_read"] = round(time.perf_counter() - t0, 3)

    # key-pruned merge into the transform layout
    upd = orders.filter(F.col("o_orderkey") % 1000 == 0).withColumn(
        "o_totalprice", -F.col("o_totalprice")
    )
    t0 = time.perf_counter()
    tx_merge(upd, th, "o_orderkey")
    _noop(
        tx_read(
            spark, th,
            where=("o_orderdate", dt.date(1995, 6, 1), dt.date(1995, 6, 30)),
        )
    )
    out["hidden_partition_merge"] = round(time.perf_counter() - t0, 3)

    # column mapping: metadata rename + reads under the new name
    tr = f"{tmp}/rename_t"
    tx_write(
        orders.repartitionByRange(8, "o_orderkey"), tr,
        stats_cols=["o_orderkey"],
    )
    t0 = time.perf_counter()
    tx_rename_column(spark, tr, "o_totalprice", "amount")
    _noop(tx_read(spark, tr))
    lo = orders.agg(F.min("o_orderkey")).collect()[0][0]
    _noop(tx_read(spark, tr, where=("o_orderkey", lo, lo + 100)))
    out["column_rename_read"] = round(time.perf_counter() - t0, 3)

    # drop + schema-evolving fresh re-add + full read
    t0 = time.perf_counter()
    tx_drop_column(spark, tr, "amount")
    tx_write(
        orders.limit(5000).withColumnRenamed("o_totalprice", "amount"),
        tr, schema_mode="merge",
    )
    _noop(tx_read(spark, tr))
    out["column_drop_append_read"] = round(time.perf_counter() - t0, 3)

    # multi-pipe scheduler: 3 copy pipes x 2 commits, concurrent ticks
    srcs, dsts, ckpts = [], [], []
    half = orders.filter(F.col("o_orderkey") % 2 == 0)
    for i in range(3):
        s, d, c = f"{tmp}/mp_s{i}", f"{tmp}/mp_d{i}", f"{tmp}/mp_c{i}"
        tx_write(half, s)
        tx_write(orders.subtract(half), s)
        tx_set_properties(spark, s, {"cdf.enabled": False})
        srcs.append(s), dsts.append(d), ckpts.append(c)
    pipes = {
        f"copy{i}": (
            lambda i=i: pipe_available_now(
                spark, srcs[i], dsts[i], checkpoint=ckpts[i]
            )
        )
        for i in range(3)
    }
    t0 = time.perf_counter()
    run_pipes(pipes, interval=0.1, max_rounds=1, sleep=lambda _s: None)
    for d in dsts:
        _noop(tx_read(spark, d))
    out["run_pipes_3x2tick"] = round(time.perf_counter() - t0, 3)

    # deletion vectors: sparse DELETE WHERE as KB sidecars (zero data
    # files rewritten) + the one-broadcast-anti-join read
    from distributed_mapreduce__spark.sources.txlog import (
        tx_delete_positions,
        tx_delete_where,
        tx_scan_with_pos,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity", "l_discount"
    )
    tdv = f"{tmp}/dv_t"
    tx_write(li, tdv, stats_cols=["l_orderkey"])
    tx_set_properties(spark, tdv, {"cdf.enabled": False})
    t0 = time.perf_counter()
    tx_delete_where(
        spark, tdv, "l_quantity <= 2 AND l_discount >= 0.09"
    )
    _noop(tx_read(spark, tdv))
    out["dv_delete_read"] = round(time.perf_counter() - t0, 3)

    # positional dedup: re-ingest a third of the corpus, erase exactly
    # the duplicate copies by (file, row-ordinal), read back
    docs = load_table(spark, sf_dir, "documents")
    tdd = f"{tmp}/dv_dedup_t"
    tx_write(docs, tdd)
    tx_write(docs.filter(F.col("doc_id") % 3 == 0), tdd)
    tx_set_properties(spark, tdd, {"cdf.enabled": False})
    from pyspark.sql.window import Window

    t0 = time.perf_counter()
    pos = tx_scan_with_pos(spark, tdd)
    losers = (
        pos.withColumn(
            "_rank",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("_file", "_pos")
            ),
        )
        .filter(F.col("_rank") > 1)
        .select("_file", "_pos")
    )
    tx_delete_positions(losers, tdd)
    _noop(tx_read(spark, tdd))
    out["dv_position_dedup"] = round(time.perf_counter() - t0, 3)

    # bloom point lookups: per-file blooms on the unclustered key,
    # five needle reads (every file's [min,max] overlaps — only the
    # bloom can skip)
    tb = f"{tmp}/bloom_t"
    tx_write(
        li.repartition(16), tb,
        stats_cols=["l_quantity"], bloom_cols=["l_orderkey"],
    )
    tx_set_properties(spark, tb, {"cdf.enabled": False})
    keys = [
        r[0]
        for r in li.select("l_orderkey").distinct().limit(5).collect()
    ]
    t0 = time.perf_counter()
    for kv in keys:
        _noop(tx_read(spark, tb, where=("l_orderkey", kv, kv)))
    out["bloom_point_lookup_5x"] = round(time.perf_counter() - t0, 3)

    # DV UPDATE: one atomic commit = position sidecars + files sized
    # by the MATCHED rows (not the touched files) + the read
    from distributed_mapreduce__spark.sources.txlog import tx_update

    t0 = time.perf_counter()
    tx_update(
        spark, tdv, "l_quantity <= 4 AND l_discount >= 0.09",
        {"l_quantity": "l_quantity + 50"},
    )
    _noop(tx_read(spark, tdv))
    out["dv_update_read"] = round(time.perf_counter() - t0, 3)

    # the txtable streaming source: drain a 2-commit orders table
    # through Spark's OWN streaming runtime (offsets = versions)
    from distributed_mapreduce__spark.streaming.tx_source import (
        register_tx_source,
    )

    register_tx_source(spark)
    ts = f"{tmp}/txsrc_t"
    tx_write(orders.filter(F.col("o_orderkey") % 2 == 0), ts)
    tx_write(orders.filter(F.col("o_orderkey") % 2 == 1), ts)
    tx_set_properties(spark, ts, {"cdf.enabled": False})
    t0 = time.perf_counter()
    q = (
        spark.readStream.format("txtable").option("path", ts).load()
        .writeStream.format("noop").option(
            "checkpointLocation", f"{tmp}/txsrc_ck"
        ).start()
    )
    q.processAllAvailable()
    q.stop()
    out["tx_source_stream_drain"] = round(time.perf_counter() - t0, 3)
    return out


if __name__ == "__main__":
    import tempfile

    from distributed_mapreduce__spark.session import build_session

    spark = build_session(app_name="bench_r12_ops")
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.1"]:
        tmp = tempfile.mkdtemp(prefix="bench_r12_")
        res = measure(spark, sf_dir, tmp)
        print(json.dumps({"sf_dir": sf_dir, **res}))
