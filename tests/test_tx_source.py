"""The ``txtable`` Structured Streaming source
(streaming/tx_source.py): the transactional commit log as a
first-class ``spark.readStream`` input via PySpark 4's Python
DataSource API. Spark's own offset checkpointing gives exactly-once
(offsets are commit versions); micro-batches cover exactly the
commits (start, end]; maintenance commits are no-ops; row-changing
commits fail the stream honestly (insert-only contract, tx_changes
parity); reads normalize like the batch path (typed partition values
from directory names, column mapping, evolved null-fill)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.sources.txlog import (
    tx_compact,
    tx_delete_where,
    tx_rename_column,
    tx_write,
)
from distributed_mapreduce__spark.streaming.tx_source import (
    register_tx_source,
)


def _mem_stream(spark, path, name):
    register_tx_source(spark)
    return (
        spark.readStream.format("txtable").option("path", path).load()
        .writeStream.format("memory").queryName(name).start()
    )


def test_incremental_appends_exactly_once(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(spark.range(10).select("id"), t)
    q = _mem_stream(spark, t, "txsrc_a")
    try:
        q.processAllAvailable()
        assert spark.sql("select count(*) from txsrc_a").first()[0] == 10
        tx_write(spark.range(10, 30).select("id"), t)
        tx_compact(spark, t)  # maintenance: a stream no-op
        tx_write(spark.range(30, 35).select("id"), t)
        q.processAllAvailable()
        got = spark.sql(
            "select count(*) as n, sum(id) as s from txsrc_a"
        ).first()
        assert (got.n, got.s) == (35, sum(range(35)))
        # idle trigger: nothing re-delivered
        q.processAllAvailable()
        assert spark.sql("select count(*) from txsrc_a").first()[0] == 35
    finally:
        q.stop()


def test_partition_values_typed_from_dirs(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(
        spark.range(30).select("id", (F.col("id") % 3).alias("k")),
        t,
        partition_by=["k"],
    )
    q = _mem_stream(spark, t, "txsrc_b")
    try:
        q.processAllAvailable()
        assert dict(spark.table("txsrc_b").dtypes)["k"] == "bigint"
        rows = spark.sql(
            "select k, count(*) as n from txsrc_b group by k order by k"
        ).collect()
        assert [(r.k, r.n) for r in rows] == [(0, 10), (1, 10), (2, 10)]
    finally:
        q.stop()


def test_row_changing_commit_fails_stream(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(spark.range(20).select("id", (F.col("id") % 5).alias("v")), t)
    tx_delete_where(spark, t, "v = 1")
    q = _mem_stream(spark, t, "txsrc_c")
    try:
        with pytest.raises(Exception):
            q.processAllAvailable()
        assert "insert-only" in str(q.exception())
    finally:
        q.stop()


def test_checkpointed_restart_resumes(spark, tmp_path):
    t = str(tmp_path / "t")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    register_tx_source(spark)
    tx_write(spark.range(10).select("id"), t)

    def run_once():
        q = (
            spark.readStream.format("txtable").option("path", t).load()
            .writeStream.format("parquet")
            .option("checkpointLocation", ck)
            .start(out)
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    tx_write(spark.range(10, 25).select("id"), t)
    run_once()  # restart from Spark's checkpoint: only the delta lands
    got = spark.read.parquet(out)
    assert got.count() == 25
    assert got.select(F.sum("id")).first()[0] == sum(range(25))


def test_column_mapped_table_streams_logical_names(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(spark.range(10).select("id", (F.col("id") % 2).alias("v")), t)
    tx_rename_column(spark, t, "v", "flag")
    q = _mem_stream(spark, t, "txsrc_d")
    try:
        q.processAllAvailable()
        df = spark.table("txsrc_d")
        assert "flag" in df.columns and "v" not in df.columns
        # pre-rename files read bit-exactly under the new logical name
        assert df.filter("flag = 1").count() == 5
    finally:
        q.stop()


def test_evolved_schema_null_fills_old_files(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(spark.range(5).select("id"), t)
    tx_write(
        spark.range(5, 8).select("id", F.lit("x").alias("tag")),
        t,
        schema_mode="merge",
    )
    q = _mem_stream(spark, t, "txsrc_e")
    try:
        q.processAllAvailable()
        df = spark.table("txsrc_e")
        assert set(df.columns) == {"id", "tag"}
        assert df.filter(F.col("tag").isNull()).count() == 5
        assert df.filter("tag = 'x'").count() == 3
    finally:
        q.stop()


def test_batch_reader_snapshot_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    register_tx_source(spark)
    tx_write(
        spark.range(30).select("id", (F.col("id") % 3).alias("k")),
        t,
        partition_by=["k"],
    )
    v0_rows = 30
    tx_write(spark.range(30, 50).select("id", (F.col("id") % 3).alias("k")), t)
    df = spark.read.format("txtable").option("path", t).load()
    assert df.count() == 50
    assert dict(df.dtypes)["k"] == "bigint"
    old = (
        spark.read.format("txtable")
        .option("path", t).option("version", 0).load()
    )
    assert old.count() == v0_rows


def test_batch_reader_applies_deletion_vectors(spark, tmp_path):
    from distributed_mapreduce__spark.sources.txlog import tx_update

    t = str(tmp_path / "t")
    register_tx_source(spark)
    tx_write(
        spark.range(100).select("id", (F.col("id") % 10).alias("v")), t
    )
    tx_delete_where(spark, t, "v = 3")
    tx_update(spark, t, "v = 4", {"v": "v + 100"})
    df = spark.read.format("txtable").option("path", t).load()
    assert df.count() == 90
    assert df.filter("v = 3").count() == 0  # DV-deleted rows never resurrect
    assert df.filter("v = 104").count() == 10  # update post-images deliver
    assert df.filter("v = 4").count() == 0


def test_batch_reader_refuses_equality_tombstones(spark, tmp_path):
    from distributed_mapreduce__spark.sources.txlog import tx_delete

    t = str(tmp_path / "t")
    register_tx_source(spark)
    tx_write(spark.range(20).select("id"), t)
    tx_delete(
        spark.range(3).select("id"), t, "id", mode="merge_on_read"
    )
    with pytest.raises(Exception, match="equality tombstones"):
        spark.read.format("txtable").option("path", t).load().count()
