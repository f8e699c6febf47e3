#!/usr/bin/env python3
"""Measure the round-9 storage operators end-to-end — folded into
bench.py's ``new_ops`` section alongside the round-6/7 sets.

Covered:

- multi_tx: two atomic cross-table transactions (orders + lineitem
  halves) through the coordinator-record protocol, then a joined read
- tx_restore: append → overwrite → RESTORE (metadata-only) → read
- tx_clone: shallow clone of the lineitem table + clone-local append
  + read (zero data copied at clone time)
- mor_delete: merge-on-read DELETE of ~1% of lineitem keys (KB-sized
  tombstone commit, no file rewrite) + full read through the
  broadcast anti-join, then tx_apply_deletes settlement
- table_pipe: three appends drained through the exactly-once
  table→table pipe (one idempotent sink commit per source version)
  + sink read
- rollup_view_cdc (round 10, VERDICT r9 #6): a mixed
  insert/insert/delete backlog drained through
  rollup_view_available_now (the retraction path — the one
  data-proportional piece of the storage family) + store read
- cdc_merge_pipe (round 10): a MERGE (update CDF sidecar) replicated
  through the cdc pipe to a sink table + sink read
- dedup_pipe (round 10): two document commits drained through the
  exactly-once incremental dedup pipe (intra-batch + signature-index
  history check, survivors + index as ACID appends) + survivor read

Usage: python scripts/bench_r9_ops.py [sf_dir ...] — or import
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
        tx_clone,
        tx_read,
        tx_restore,
        tx_write,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    line = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders.count(), line.count()  # warm
    out: dict[str, float] = {}

    # two atomic cross-table transactions, then a joined read
    to, tl, coord = f"{tmp}/mt_orders", f"{tmp}/mt_line", f"{tmp}/mt_cat"
    t0 = time.perf_counter()
    for batch, rem in (("m0", 0), ("m1", 1)):
        tx_multi(
            {
                to: orders.filter(F.col("o_orderkey") % 2 == rem),
                tl: line.filter(F.col("l_orderkey") % 2 == rem),
            },
            coordinator=coord,
            txn=batch,
        )
    o, li = tx_read(spark, to), tx_read(spark, tl)
    _noop(o.join(li, o.o_orderkey == li.l_orderkey))
    out["multi_tx_2batch_join_read"] = round(time.perf_counter() - t0, 3)

    # RESTORE: append → overwrite → metadata-only restore → read
    tr = f"{tmp}/restore_t"
    t0 = time.perf_counter()
    tx_write(line, tr)
    tx_write(line.limit(1000), tr, mode="overwrite")
    tx_restore(spark, tr, 0)
    _noop(tx_read(spark, tr))
    out["txlog_restore_read"] = round(time.perf_counter() - t0, 3)

    # shallow CLONE + clone-local append + read
    tc = f"{tmp}/clone_t"
    t0 = time.perf_counter()
    tx_clone(spark, tr, tc)
    tx_write(line.limit(5000), tc)
    _noop(tx_read(spark, tc))
    out["txlog_clone_append_read"] = round(time.perf_counter() - t0, 3)

    # merge-on-read DELETE of ~1% of keys + anti-join read + settle
    from distributed_mapreduce__spark.sources.txlog import (
        tx_apply_deletes,
        tx_delete,
    )

    tm = f"{tmp}/mor_t"
    tx_write(line, tm)
    keys = (
        line.select("l_orderkey")
        .filter(F.col("l_orderkey") % 100 == 0)
        .distinct()
    )
    t0 = time.perf_counter()
    tx_delete(keys, tm, "l_orderkey", mode="merge_on_read")
    _noop(tx_read(spark, tm))
    out["mor_delete_read"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    tx_apply_deletes(spark, tm)
    _noop(tx_read(spark, tm))
    out["mor_apply_deletes_read"] = round(time.perf_counter() - t0, 3)

    # exactly-once table→table pipe: 3 source commits drained
    from distributed_mapreduce__spark.streaming.table_stream import (
        pipe_available_now,
    )

    ps, pd, pc = f"{tmp}/pipe_src", f"{tmp}/pipe_dst", f"{tmp}/pipe_ckpt"
    for rem in range(3):
        tx_write(line.filter(F.col("l_orderkey") % 3 == rem), ps)
    t0 = time.perf_counter()
    pipe_available_now(
        spark,
        ps,
        pd,
        lambda df: df.filter(F.col("l_quantity") > 10),
        checkpoint=pc,
    )
    _noop(tx_read(spark, pd))
    out["table_pipe_3batch_read"] = round(time.perf_counter() - t0, 3)

    # incremental rollup view under deletes: two event appends + one
    # merge-on-read delete folded by the CDC maintainer, then a store
    # read. The delete fold is the data-proportional path (one bounded
    # pre-delete-snapshot semi-join + a negated window aggregation).
    from distributed_mapreduce__spark.operators.timeseries import read_rollup
    from distributed_mapreduce__spark.streaming.table_stream import (
        rollup_view_available_now,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "value", "event_type"
    )
    vs, vw, vc = f"{tmp}/view_src", f"{tmp}/view_store", f"{tmp}/view_ckpt"
    tx_write(events.filter(F.col("event_id") % 2 == 0), vs)
    tx_write(events.filter(F.col("event_id") % 2 == 1), vs)
    tx_delete(
        spark.createDataFrame([("click",)], "event_type string"),
        vs,
        "event_type",
        mode="merge_on_read",
    )
    t0 = time.perf_counter()
    rollup_view_available_now(
        spark, vs, vw, "1 hour", ("event_type",), checkpoint=vc
    )
    _noop(read_rollup(spark, vw, ("event_type",)))
    out["rollup_view_cdc_3batch_read"] = round(time.perf_counter() - t0, 3)

    # update CDF end-to-end: MERGE ~10% of orders (sidecar capture) +
    # cdc-pipe replication (delete-then-append upsert) + sink read
    from distributed_mapreduce__spark.sources.txlog import tx_merge

    ms, md, mc = f"{tmp}/merge_src", f"{tmp}/merge_dst", f"{tmp}/merge_ckpt"
    full_orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    tx_write(full_orders, ms)
    pipe_available_now(spark, ms, md, checkpoint=mc, cdc_key="o_orderkey")
    upd = full_orders.filter(F.col("o_orderkey") % 10 == 3).withColumn(
        "o_totalprice", -F.col("o_totalprice")
    )
    t0 = time.perf_counter()
    tx_merge(upd, ms, "o_orderkey")
    pipe_available_now(spark, ms, md, checkpoint=mc, cdc_key="o_orderkey")
    _noop(tx_read(spark, md))
    out["cdc_merge_pipe_read"] = round(time.perf_counter() - t0, 3)

    # incremental corpus dedup over the change feed: two id-ordered
    # document commits drained through intra-batch + index dedup
    from distributed_mapreduce__spark.streaming.dedup import (
        dedup_pipe_available_now,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ds, dd, di, dc = (
        f"{tmp}/dedup_src", f"{tmp}/dedup_dst",
        f"{tmp}/dedup_idx", f"{tmp}/dedup_ckpt",
    )
    tx_write(docs.filter(F.col("doc_id") % 2 == 0), ds)
    tx_write(docs.filter(F.col("doc_id") % 2 == 1), ds)
    t0 = time.perf_counter()
    dedup_pipe_available_now(spark, ds, dd, checkpoint=dc, index=di)
    _noop(tx_read(spark, dd))
    out["dedup_pipe_2batch_read"] = round(time.perf_counter() - t0, 3)

    # the same two ticks with verify='exact' (round 12, VERDICT r11
    # #4): exact Jaccard over hashed shingles on the banded candidates
    # — prices the estimator-noise-free intra-batch drop against the
    # 16-seed estimate above
    dd2, di2, dc2 = (
        f"{tmp}/dedup_dst_x", f"{tmp}/dedup_idx_x", f"{tmp}/dedup_ckpt_x",
    )
    t0 = time.perf_counter()
    dedup_pipe_available_now(
        spark, ds, dd2, checkpoint=dc2, index=di2, verify="exact"
    )
    _noop(tx_read(spark, dd2))
    out["dedup_pipe_2batch_exact"] = round(time.perf_counter() - t0, 3)
    return out


if __name__ == "__main__":
    import tempfile

    from distributed_mapreduce__spark.session import build_session

    spark = build_session(app_name="bench_r9_ops")
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.1"]:
        res = measure(spark, sf_dir, tempfile.mkdtemp(prefix="bench_r9_"))
        print(json.dumps({"sf_dir": sf_dir, **res}))
