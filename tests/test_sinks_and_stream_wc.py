"""Sink round-trips + streaming word-count parity (SURVEY.md §2.1
O7/O10/O14 and Q1-as-a-stream)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.wordcount import word_counts
from distributed_mapreduce__spark.plans.inspect import physical_summary
from distributed_mapreduce__spark.sources.sinks import (
    compact_parquet,
    write_bucketed_table,
    write_json_lines,
    write_partitioned_parquet,
)
from distributed_mapreduce__spark.sources.tables import load_table
from distributed_mapreduce__spark.streaming.windows import run_to_memory_sink
from distributed_mapreduce__spark.streaming.wordcount import stream_word_counts

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_json_lines_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    out = str(tmp_path / "docs_json")
    write_json_lines(docs.select("doc_id", "text", "lang"), out)
    back = spark.read.json(out)
    assert back.count() == docs.count()
    assert _rows(back.select("doc_id", "lang")) == _rows(docs.select("doc_id", "lang"))


def test_partitioned_parquet_prunes(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    out = str(tmp_path / "docs_part")
    write_partitioned_parquet(docs, out, "lang")
    back = spark.read.parquet(out)
    one = back.filter(F.col("lang") == "en")
    assert _rows(one.select("doc_id")) == _rows(
        docs.filter(F.col("lang") == "en").select("doc_id")
    )
    # partition pruning: the physical scan must carry a PartitionFilters
    # entry on lang (not a post-scan filter over all partitions)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "lang" in plan.split("PartitionFilters:")[1][:200]


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    """A fragmented dataset (64 files for ~1 MB of data) compacts to the
    byte-budgeted file count with identical content."""
    docs = load_table(spark, SF, "documents")
    frag = str(tmp_path / "frag")
    docs.repartition(64).write.parquet(frag)
    import os

    n_frag = sum(f.endswith(".parquet") for f in os.listdir(frag))
    assert n_frag == 64

    out = str(tmp_path / "compact")
    n = compact_parquet(spark, frag, out, target_file_mb=256)
    assert n == 1  # ~1 MB of data → one 256 MB-budget file
    n_out = sum(f.endswith(".parquet") for f in os.listdir(out))
    assert n_out == 1
    assert _rows(spark.read.parquet(out)) == _rows(docs)


def test_bucketed_join_skips_exchange(spark, tmp_path):
    """THE at-scale shuffle removal: orders ⋈ lineitem on o_orderkey with
    both sides bucketed on the key must plan with ZERO shuffle exchanges
    — the join reads co-located buckets directly. This is the claim
    relational_q.py makes for the fact-fact join at 100 TB; here it is
    pinned on the physical plan. (Broadcast is disabled for the test so
    the small fixtures can't sidestep the bucketed sort-merge path.)"""
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    lineitem = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")

    spark.sql("CREATE DATABASE IF NOT EXISTS bucket_demo")
    spark.catalog.setCurrentDatabase("bucket_demo")
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for df, name in (
            (orders, "orders_b"),
            (lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b"),
        ):
            write_bucketed_table(
                df, name, 4, "o_orderkey", path=str(tmp_path / name)
            )

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("orders_b")
            .join(spark.table("lineitem_b"), "o_orderkey")
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        joined.collect()
        s = physical_summary(joined)
        assert s["shuffle_exchange"] == 0, s  # join AND agg reuse bucketing
        assert s["sort_merge_join"] == 1, s

        # Same query on the unbucketed frames shuffles both sides.
        plain = (
            orders.join(
                lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
            )
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plain.collect()
        assert physical_summary(plain)["shuffle_exchange"] >= 2
        assert _rows(joined) == _rows(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP DATABASE IF EXISTS bucket_demo CASCADE")
        spark.catalog.setCurrentDatabase("default")


def test_stream_wordcount_equals_batch(spark):
    batch = word_counts(load_table(spark, SF, "documents"), text_col="text")
    stream = stream_word_counts(spark, SF)
    run_to_memory_sink(stream, "wc_out", output_mode="complete")
    assert _rows(spark.table("wc_out")) == _rows(batch)


def test_wordcount_plan_shape(spark):
    """The word-count plan must be the two-phase aggregate + single
    exchange Spark-native form (SURVEY.md §2.1 O5-O9)."""
    df = word_counts(load_table(spark, SF, "documents"), text_col="text")
    df.collect()  # finalize the AQE plan so codegen spans are visible
    s = physical_summary(df)
    assert s["shuffle_exchange"] >= 1
    assert s["wholestage_codegen"] >= 1
    assert s["sort_merge_join"] == 0 and s["broadcast_hash_join"] == 0
