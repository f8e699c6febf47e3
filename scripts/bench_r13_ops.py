#!/usr/bin/env python3
"""Measure the round-13 storage operators end-to-end — folded into
bench.py's ``new_ops`` section alongside the round-6/7/9/11/12 sets.

Covered:

- row_tracking_enable_scan: tx_enable_row_tracking's backfill (one
  per-file row-count pass + metadata commit) on a multi-commit orders
  table + a full tx_scan_with_row_ids drain (base + row_index ids)
- row_tracking_compact_scan: the PRESERVING compact (ids read and
  materialized into the compacted bytes) + the re-scan now served by
  the materialized column
- mapped_partition_rename_read: rename of a partition SOURCE column
  on a hive-partitioned table (metadata commit; spec/dirs key on the
  frozen physical name) + a partition-pruned read under the NEW name
- sql_dml_update_delete: the SQL front door driving a DV UPDATE and a
  DV DELETE (string → parse → the same commit paths) + the read
- cdc_by_id_drain: tx_changes_cdf(with_row_ids=True) draining a
  mixed history (append, cdf=False DV delete reconstructed from
  coordinates, DV update with id-complete pre+post images)
- bloom_cached_lookup_5x: five repeated bloom point lookups on one
  snapshot — the (path, sidecar)-keyed session cache means lookups
  2-5 cost zero sidecar I/O (ADVICE r12 / VERDICT #8's "measured
  cheaper" criterion; compare bloom_point_lookup_5x in the r12 set,
  which prices the same shape cold each round)

Usage: python scripts/bench_r13_ops.py [sf_dir ...] — or import
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
        tx_compact,
        tx_enable_row_tracking,
        tx_read,
        tx_rename_column,
        tx_scan_with_row_ids,
        tx_write,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice"
    )
    orders.count()  # warm
    out: dict[str, float] = {}

    # row tracking: enable (backfill) + full id scan
    trt = f"{tmp}/rowtrack_t"
    tx_write(
        orders.filter(F.col("o_orderkey") % 2 == 0).repartition(4),
        trt, stats_cols=["o_orderkey"],
    )
    tx_write(
        orders.filter(F.col("o_orderkey") % 2 == 1).repartition(4), trt
    )
    t0 = time.perf_counter()
    tx_enable_row_tracking(spark, trt)
    _noop(tx_scan_with_row_ids(spark, trt))
    out["row_tracking_enable_scan"] = round(time.perf_counter() - t0, 3)

    # the preserving compact + the materialized-column scan
    t0 = time.perf_counter()
    tx_compact(spark, trt, target_files=2, max_input_files=64)
    _noop(tx_scan_with_row_ids(spark, trt))
    out["row_tracking_compact_scan"] = round(time.perf_counter() - t0, 3)

    # column mapping x partitioned layout: rename the partition
    # source, read pruned under the new name
    tmp2 = f"{tmp}/mapped_part_t"
    tx_write(
        orders.repartition(F.trunc("o_orderdate", "month")),
        tmp2, partition_by=["o_orderpriority"],
        stats_cols=["o_orderkey"],
    )
    t0 = time.perf_counter()
    tx_rename_column(spark, tmp2, "o_orderpriority", "priority")
    _noop(
        tx_read(spark, tmp2, where=("priority", "1-URGENT", "1-URGENT"))
    )
    out["mapped_partition_rename_read"] = round(
        time.perf_counter() - t0, 3
    )

    # SQL front door: DV UPDATE + DV DELETE + read, all via strings
    tsql = f"{tmp}/sql_t"
    tx_write(
        orders.repartitionByRange(8, "o_orderkey"), tsql,
        stats_cols=["o_orderkey"],
    )
    tx_register_table(spark, "bench_sql_t", tsql)
    t0 = time.perf_counter()
    tx_sql(
        spark,
        "UPDATE bench_sql_t SET o_totalprice = -o_totalprice "
        "WHERE o_orderkey % 500 = 0",
    )
    tx_sql(spark, "DELETE FROM bench_sql_t WHERE o_orderkey % 501 = 0")
    _noop(tx_read(spark, tsql))
    out["sql_dml_update_delete"] = round(time.perf_counter() - t0, 3)

    # CDC keyed on stable row ids: drain a mixed history
    tcdc = f"{tmp}/cdc_ids_t"
    li = orders.select("o_orderkey", "o_totalprice")
    tx_write(li.repartitionByRange(4, "o_orderkey"), tcdc,
             stats_cols=["o_orderkey"])
    from distributed_mapreduce__spark.sources.txlog import (
        tx_changes_cdf,
        tx_delete_where,
        tx_enable_row_tracking,
        tx_update,
    )
    tx_enable_row_tracking(spark, tcdc)
    v0 = 1
    tx_write(li.limit(20000), tcdc)
    tx_delete_where(spark, tcdc, "o_orderkey % 100 = 0", cdf=False)
    tx_update(spark, tcdc, "o_orderkey % 101 = 0",
              {"o_totalprice": "-o_totalprice"})
    t0 = time.perf_counter()
    n = 0
    for _v, _kind, df in tx_changes_cdf(
        spark, tcdc, since_version=v0, with_row_ids=True
    ):
        if df is not None:
            n += df.count()
    assert n > 0
    out["cdc_by_id_drain"] = round(time.perf_counter() - t0, 3)

    # bloom sidecar cache: five point lookups on ONE snapshot
    tbl = f"{tmp}/bloom_cache_t"
    tx_write(
        orders.select("o_orderkey", "o_totalprice").repartition(8),
        tbl, bloom_cols=["o_orderkey"],
    )
    keys = [r[0] for r in orders.limit(5).collect()]
    t0 = time.perf_counter()
    for k in keys:
        _noop(tx_read(spark, tbl, where=("o_orderkey", k, k)))
    out["bloom_cached_lookup_5x"] = round(time.perf_counter() - t0, 3)

    return out


if __name__ == "__main__":
    import tempfile

    from distributed_mapreduce__spark.session import get_spark

    spark = get_spark()
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.01"]:
        res = measure(spark, sf_dir, tempfile.mkdtemp(prefix="bench_r13_"))
        print(json.dumps({"sf_dir": sf_dir, **res}))
