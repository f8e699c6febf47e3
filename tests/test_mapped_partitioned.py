"""Column mapping x partitioned layouts (round 13, VERDICT r12 #1):
RENAME/DROP COLUMN as metadata commits on hive-partitioned AND
hidden/transform-partitioned tables. The log records partition specs
in PHYSICAL column terms — the same stable identity data bytes,
stats, and blooms key on — so a rename never touches a spec entry, a
placement directory, or a data byte; only the user-facing surface
(spec arguments, predicate columns, tx_detail) translates
logical <-> physical. Reference for semantics: Delta's columnMapping
+ Iceberg's field-id-based partition specs (both public)."""

from __future__ import annotations

import datetime as dt
import glob

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.sources.txlog import (
    _replay,
    tx_compact,
    tx_delete_where,
    tx_detail,
    tx_drop_column,
    tx_merge,
    tx_read,
    tx_rename_column,
    tx_set_partitioning,
    tx_update,
    tx_write,
)


def _hive(spark, lo=0, hi=60):
    return spark.createDataFrame(
        [(i, i % 3, f"r{i}") for i in range(lo, hi)],
        "id long, k int, body string",
    )


def _tdf(spark, n=40):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 3, 1 + i % 5, 10 + i % 6), f"d{i}")
            for i in range(n)
        ],
        "id long, ts timestamp, body string",
    )


@pytest.fixture()
def hive_table(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_hive(spark), t, partition_by=["k"], stats_cols=["id"])
    return t


def test_rename_partition_source_is_metadata_only(spark, hive_table):
    before = set(_replay(spark, hive_table).eps)
    tx_rename_column(spark, hive_table, "k", "bucket_key")
    snap = _replay(spark, hive_table)
    # zero data movement: same live files, spec untouched (physical)
    assert set(snap.eps) == before
    assert snap.partition_by == ["k"]
    out = tx_read(spark, hive_table)
    # identity partition columns surface LAST (directory-derived,
    # the standing partitioned-scan contract)
    assert out.columns == ["id", "body", "bucket_key"]
    assert out.count() == 60
    assert out.filter("bucket_key = 1").count() == 20
    # time travel below the rename shows the OLD name
    old = tx_read(spark, hive_table, version=0)
    assert old.columns == ["id", "body", "k"]


def test_prune_on_renamed_partition_column(spark, hive_table):
    tx_rename_column(spark, hive_table, "k", "bucket_key")
    hit = tx_read(spark, hive_table, where=("bucket_key", 2, 2))
    assert hit.count() == 20
    # partition pruning still log-only: only k=2 files scanned
    assert all("k=2" in f for f in hit.inputFiles())
    assert len(hit.inputFiles()) < len(_replay(spark, hive_table).eps)


def test_append_after_rename_keeps_layout(spark, hive_table):
    tx_rename_column(spark, hive_table, "k", "bucket_key")
    extra = spark.createDataFrame(
        [(100 + i, i % 3, f"x{i}") for i in range(6)],
        "id long, bucket_key int, body string",
    )
    # inherit the layout (no spec passed)
    tx_write(extra, hive_table)
    # or name it explicitly by the NEW logical name
    tx_write(
        extra.withColumn("id", F.col("id") + 10),
        hive_table, partition_by=["bucket_key"],
    )
    snap = _replay(spark, hive_table)
    assert snap.partition_by == ["k"]  # physical, stable
    # new files landed under the SAME physical directories
    assert all(
        f.split("/")[1].startswith("k=")
        for f in snap.eps
    )
    out = tx_read(spark, hive_table, where=("bucket_key", 0, 0))
    assert out.count() == 20 + 2 + 2
    assert all("k=0" in f for f in out.inputFiles())


def test_append_with_stale_name_refused(spark, hive_table):
    tx_rename_column(spark, hive_table, "k", "bucket_key")
    stale = _hive(spark, 100, 106)  # still has a column named "k"
    with pytest.raises(Exception, match="does not match|not in"):
        tx_write(stale, hive_table, partition_by=["k"])


def test_drop_nonsource_ok_source_refused(spark, hive_table):
    tx_rename_column(spark, hive_table, "body", "text")
    tx_drop_column(spark, hive_table, "text")
    assert tx_read(spark, hive_table).columns == ["id", "k"]
    with pytest.raises(ValueError, match="partition spec"):
        tx_drop_column(spark, hive_table, "k")


def test_rename_on_hidden_partitioned_table(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(
        _tdf(spark), t, partition_by=["days(ts)"], stats_cols=["id"]
    )
    tx_rename_column(spark, t, "ts", "event_ts")
    snap = _replay(spark, t)
    assert snap.partition_by == ["days(ts)"]  # physical source
    out = tx_read(spark, t)
    assert out.columns == ["id", "event_ts", "body"]
    assert out.count() == 40
    # hidden-partition pruning works through the RENAMED source column
    d = dt.datetime(2024, 3, 2)
    hit = tx_read(
        spark, t,
        where=("event_ts", d, d + dt.timedelta(hours=23)),
    )
    assert hit.count() == 8
    assert all("_p_days_ts=2024-03-02" in f for f in hit.inputFiles())
    # the derived placement column never surfaces
    assert "_p_days_ts" not in out.columns


def test_partition_mapped_table_via_evolution(spark, tmp_path):
    """The other direction: a table that ALREADY uses column mapping
    gains a partitioned layout afterwards (tx_set_partitioning names
    the LOGICAL column; the spec records its physical identity)."""
    t = str(tmp_path / "t")
    tx_write(_hive(spark), t, stats_cols=["id"])
    tx_rename_column(spark, t, "k", "bucket_key")
    tx_set_partitioning(spark, t, ["bucket_key"])
    snap = _replay(spark, t)
    assert snap.partition_by == ["k"]  # recorded physical
    tx_write(
        spark.createDataFrame(
            [(200, 7, "new")], "id long, bucket_key int, body string"
        ),
        t,
    )
    # the new file placed under the physical directory name
    new_files = [
        f for f, v in _replay(spark, t).eps.items()
        if v == _replay(spark, t).version
    ]
    assert new_files and all("k=7" in f for f in new_files)
    out = tx_read(spark, t, where=("bucket_key", 7, 7))
    assert out.filter("id = 200").count() == 1


def test_rewrites_preserve_mapped_layout(spark, hive_table):
    tx_rename_column(spark, hive_table, "k", "bucket_key")
    # merge rewrites touched files under the same physical dirs
    upd = spark.createDataFrame(
        [(5, 2, "UPDATED")], "id long, bucket_key int, body string"
    )
    tx_merge(upd, hive_table, "id")
    out = tx_read(spark, hive_table)
    assert out.filter("body = 'UPDATED'").count() == 1
    assert out.count() == 60
    # DV update + delete work and re-place under the layout
    tx_update(
        spark, hive_table, "id = 7", {"body": "'patched'"}
    )
    tx_delete_where(spark, hive_table, "id = 8")
    out = tx_read(spark, hive_table)
    assert out.filter("body = 'patched'").count() == 1
    assert out.count() == 59
    snap = _replay(spark, hive_table)
    assert all("=" in f.split("/")[1] for f in snap.eps)
    # values correct per partition after all maintenance
    assert out.filter("bucket_key = 2").count() == 19


def test_compact_after_rename(spark, hive_table):
    for i in range(3):
        tx_write(_hive(spark, 100 + 10 * i, 106 + 10 * i), hive_table)
    tx_rename_column(spark, hive_table, "k", "bucket_key")
    before = tx_read(spark, hive_table)
    rows_before = sorted(tuple(r) for r in before.collect())
    assert tx_compact(spark, hive_table, max_input_files=64) is not None
    after = tx_read(spark, hive_table)
    assert after.columns == before.columns
    assert sorted(tuple(r) for r in after.collect()) == rows_before


def test_detail_displays_logical_spec(spark, hive_table):
    tx_rename_column(spark, hive_table, "k", "bucket_key")
    det = tx_detail(spark, hive_table)
    assert det["partition_by"] == ["bucket_key"]
    assert det["column_mapped"] is True
    t2 = str(hive_table) + "_hidden"
    tx_write(_tdf(spark), t2, partition_by=["days(ts)"])
    tx_rename_column(spark, t2, "ts", "event_ts")
    assert tx_detail(spark, t2)["partition_by"] == ["days(event_ts)"]


def test_stats_prune_across_rename_on_partitioned(spark, tmp_path):
    """[min, max] stats on a DATA column keep pruning after the rename
    on a partitioned table (stats key on physical names; the predicate
    translates)."""
    t = str(tmp_path / "t")
    for lo in (0, 1000, 2000):
        tx_write(
            spark.createDataFrame(
                [(lo + i, i % 2, "x") for i in range(50)],
                "id long, k int, body string",
            ).coalesce(1),
            t,
            partition_by=["k"],
            stats_cols=["id"],
        )
    tx_rename_column(spark, t, "id", "row_id")
    hit = tx_read(spark, t, where=("row_id", 1005, 1010))
    assert hit.count() == 6
    # only the middle commit's files scan (2 partitions), not all 6
    assert len(hit.inputFiles()) <= 2
