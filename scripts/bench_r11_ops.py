#!/usr/bin/env python3
"""Measure the round-11 storage operators end-to-end — folded into
bench.py's ``new_ops`` section alongside the round-6/7/9 sets.

Covered:

- partitioned_write_merge_read: hive-partitioned tx_write of lineitem
  (by l_returnflag) + a key-pruned MERGE + a partition-pruned read
- partition_evolution_read: metadata-only spec change + new-layout
  append + the mixed-layout (signature-grouped) full read
- partitioned_clone_read: shallow clone of the partitioned table +
  clone-local append + partition-pruned read across the root mix
- multi_merge_2table_read: one atomic cross-table MERGE (orders +
  per-order counts) through the coordinator record + joined read
- ts_travel_read: tx_read(as_of_ts=) resolving wall-clock → version
- constraint_append: ADD CONSTRAINT (existing-row validation) + a
  conforming append paying the one extra O(batch) validation job

Usage: python scripts/bench_r11_ops.py [sf_dir ...] — or import
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
    from distributed_mapreduce__spark.sources.multitx import tx_multi
    from distributed_mapreduce__spark.sources.tables import load_table
    from distributed_mapreduce__spark.sources.txlog import (
        tx_add_constraint,
        tx_clone,
        tx_history,
        tx_merge,
        tx_read,
        tx_set_partitioning,
        tx_set_properties,
        tx_write,
    )

    line = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    line.count(), orders.count()  # warm
    out: dict[str, float] = {}

    # partitioned write + key-pruned merge + partition-pruned read
    tp = f"{tmp}/part_t"
    t0 = time.perf_counter()
    tx_write(
        line, tp, partition_by=["l_returnflag"], stats_cols=["l_orderkey"]
    )
    tx_set_properties(spark, tp, {"cdf.enabled": False})
    upd = (
        line.filter(F.col("l_orderkey") % 1000 == 0)
        .groupBy("l_orderkey")
        .agg(
            F.sum("l_quantity").alias("l_quantity"),
            F.first("l_returnflag").alias("l_returnflag"),
        )
        .select("l_orderkey", "l_quantity", "l_returnflag")
    )
    tx_merge(upd, tp, "l_orderkey")
    _noop(tx_read(spark, tp, where=("l_returnflag", "R", "R")))
    out["partitioned_write_merge_read"] = round(time.perf_counter() - t0, 3)

    # partition evolution: metadata-only spec change + mixed-layout read
    t0 = time.perf_counter()
    tx_set_partitioning(spark, tp, [])
    tx_write(line.limit(5000), tp)
    _noop(tx_read(spark, tp))
    out["partition_evolution_read"] = round(time.perf_counter() - t0, 3)

    # partitioned shallow clone + clone append + pruned read
    tq, tc = f"{tmp}/part_src", f"{tmp}/part_clone"
    tx_write(
        line, tq, partition_by=["l_returnflag"], stats_cols=["l_orderkey"]
    )
    t0 = time.perf_counter()
    tx_clone(spark, tq, tc)
    tx_write(line.limit(5000), tc)
    _noop(tx_read(spark, tc, where=("l_returnflag", "A", "A")))
    out["partitioned_clone_read"] = round(time.perf_counter() - t0, 3)

    # one atomic cross-table MERGE + joined read
    to, tl, coord = f"{tmp}/mm_orders", f"{tmp}/mm_counts", f"{tmp}/mm_cat"
    counts = orders.groupBy("o_orderkey").agg(
        F.sum("o_totalprice").alias("total")
    )
    tx_write(orders, to, stats_cols=["o_orderkey"])
    tx_write(counts, tl, stats_cols=["o_orderkey"])
    for t in (to, tl):
        tx_set_properties(spark, t, {"cdf.enabled": False})
    upd_o = orders.filter(F.col("o_orderkey") % 500 == 0).select(
        "o_orderkey", (F.col("o_totalprice") * 2).alias("o_totalprice")
    )
    upd_c = counts.filter(F.col("o_orderkey") % 500 == 0).select(
        "o_orderkey", (F.col("total") * 2).alias("total")
    )
    t0 = time.perf_counter()
    tx_multi(
        {to: upd_o, tl: upd_c},
        coordinator=coord,
        txn="bench-mm",
        modes={to: "merge", tl: "merge"},
        merge_keys={to: "o_orderkey", tl: "o_orderkey"},
    )
    a, b = tx_read(spark, to), tx_read(spark, tl)
    _noop(a.join(b, "o_orderkey"))
    out["multi_merge_2table_read"] = round(time.perf_counter() - t0, 3)

    # timestamp time travel on the merged table
    ts0 = tx_history(spark, to)[0]["ts"]
    t0 = time.perf_counter()
    _noop(tx_read(spark, to, as_of_ts=ts0))
    out["ts_travel_read"] = round(time.perf_counter() - t0, 3)

    # CHECK constraint: existing-row validation + enforced append
    t0 = time.perf_counter()
    tx_add_constraint(spark, to, "key_nonneg", "o_orderkey >= 0")
    tx_write(orders.limit(5000), to)
    out["constraint_append"] = round(time.perf_counter() - t0, 3)
    return out


def main() -> int:
    from distributed_mapreduce__spark.session import build_session

    import tempfile

    spark = build_session(app_name="bench-r11-ops")
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.1"]:
        tmp = tempfile.mkdtemp(prefix="bench_r11_")
        res = measure(spark, sf_dir, tmp)
        print(json.dumps({"sf_dir": sf_dir, **res}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
