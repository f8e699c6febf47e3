#!/usr/bin/env python3
"""Measure the round-7 operators end-to-end — folded into bench.py's
``new_ops`` section alongside the round-6 set so regressions in the
newest families surface in the committed artifact.

Covered (each forced with a noop sink or the op's own commit/read):

- trained trigram LM: train on documents + score documents
- feature-hashed doc vectors (dim=64) over documents
- transactional table: 3 stats-recorded appends of lineitem thirds,
  a 1k-key MERGE, a stats-pruned filtered read, OPTIMIZE, snapshot read
- join front door: salted route on a synthetic 60%-hot-key fact
  against an over-broadcast-bar dim

Usage: python scripts/bench_r7_ops.py [sf_dir ...] — or import
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
    from distributed_mapreduce__spark.operators.ngram_lm import (
        ngram_lm_scores,
        train_ngram_lm,
    )
    from distributed_mapreduce__spark.operators.relational import join_auto
    from distributed_mapreduce__spark.operators.text_ranking import (
        hashed_doc_vectors,
    )
    from distributed_mapreduce__spark.sources.tables import load_table
    from distributed_mapreduce__spark.sources.txlog import (
        tx_compact,
        tx_merge,
        tx_read,
        tx_write,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.count()  # warm
    out: dict[str, float] = {}

    t0 = time.perf_counter()
    model = train_ngram_lm(docs, n=3)
    model = model.persist()
    model.count()  # materialize the model once, as a pipeline would
    out["lm_train"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    _noop(ngram_lm_scores(docs, model, n=3))
    out["lm_score"] = round(time.perf_counter() - t0, 3)
    model.unpersist()

    t0 = time.perf_counter()
    _noop(hashed_doc_vectors(docs, dim=64))
    out["hash_vectors"] = round(time.perf_counter() - t0, 3)

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    table = os.path.join(tmp, "tx_" + os.path.basename(sf_dir))
    t0 = time.perf_counter()
    for i in range(3):
        tx_write(
            li.filter(F.col("l_orderkey") % 3 == i),
            table,
            txn=f"b{i}",
            stats_cols=["l_orderkey"],
        )
    out["tx_3appends_stats"] = round(time.perf_counter() - t0, 3)
    upd = (
        li.filter(F.col("l_orderkey") % 997 == 0)
        .groupBy("l_orderkey")
        .agg(F.lit(0.0).alias("l_extendedprice"))
    )
    # since round 10 tx_merge records its update-CDF sidecar by
    # default — measure both paths so the capture cost (one extra scan
    # of the stats-pruned touched files + the change-row write) stays
    # visible as a priced feature, not an unexplained regression
    t0 = time.perf_counter()
    tx_merge(upd, table, "l_orderkey")
    out["tx_merge"] = round(time.perf_counter() - t0, 3)
    upd2 = (
        li.filter(F.col("l_orderkey") % 991 == 0)
        .groupBy("l_orderkey")
        .agg(F.lit(1.0).alias("l_extendedprice"))
    )
    t0 = time.perf_counter()
    tx_merge(upd2, table, "l_orderkey", cdf=False)
    out["tx_merge_nocdf"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    lo = li.agg(F.max("l_orderkey")).collect()[0][0] // 2
    _noop(tx_read(spark, table, where=("l_orderkey", lo, lo + 1000)))
    out["tx_pruned_read"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    tx_compact(spark, table, target_files=4)
    _noop(tx_read(spark, table))
    out["tx_compact_read"] = round(time.perf_counter() - t0, 3)

    n = max(li.count(), 1)
    hot = spark.range(0, n * 6 // 10).select(
        F.lit(7).alias("k"), F.col("id").alias("row_id")
    )
    cold = spark.range(0, n * 4 // 10).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("row_id")
    )
    dim = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("label")
    )
    t0 = time.perf_counter()
    _noop(
        join_auto(
            hot.unionByName(cold),
            dim,
            "k",
            salt_by="row_id",
            broadcast_max_rows=10,
            left_rows=n,
            right_rows=1000,
        )
    )
    out["join_auto_salted_hotkey"] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    import tempfile

    from distributed_mapreduce__spark.session import build_session

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = build_session(app_name="bench-r7-ops")
    tmp = tempfile.mkdtemp(prefix="bench_r7_")
    for sf_dir in sf_dirs:
        ops = measure(spark, sf_dir, tmp)
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "ops": ops,
                    "total": round(sum(ops.values()), 3),
                    "load_start": round(os.getloadavg()[0], 2),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
