"""Vacuum retention window (tx_vacuum(retain_last=N)): the last N
versions below the latest stay time-travelable after vacuum, files
referenced only by older snapshots are swept, and merge-on-read
tombstone key files in the window survive."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.sources.txlog import (
    tx_delete,
    tx_read,
    tx_vacuum,
    tx_write,
)


def _df(spark, lo, hi, tag="x"):
    return spark.range(lo, hi).select(F.col("id"), F.lit(tag).alias("tag"))


def _ids(spark, path, version=None):
    return sorted(r.id for r in tx_read(spark, path, version).collect())


def test_retention_window_keeps_recent_versions(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 3, "v0"), t)                 # v0
    tx_write(_df(spark, 10, 12, "v1"), t, mode="overwrite")  # v1
    tx_write(_df(spark, 12, 14, "v2"), t)               # v2

    deleted = tx_vacuum(spark, t, retain_last=1)
    # v0's files are referenced by no retained snapshot → swept
    assert any("data/" in f for f in deleted)
    # the window: v1 and v2 still read
    assert _ids(spark, t, version=1) == [10, 11]
    assert _ids(spark, t, version=2) == [10, 11, 12, 13]
    # below the window: truncated
    with pytest.raises(ValueError, match="does not exist"):
        tx_read(spark, t, version=0)


def test_default_remains_aggressive(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 3), t)
    tx_write(_df(spark, 3, 5), t)
    tx_vacuum(spark, t)
    assert _ids(spark, t) == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError, match="does not exist"):
        tx_read(spark, t, version=0)


def test_window_preserves_live_tombstones_per_version(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 5), t)                                  # v0
    tx_delete(
        spark.createDataFrame([(1,)], "id long"), t, "id",
        mode="merge_on_read",
    )                                                              # v1
    tx_write(_df(spark, 5, 7), t)                                  # v2

    tx_vacuum(spark, t, retain_last=1)
    # tombstone key file survives (v1 and v2 snapshots need it)
    assert list((tmp_path / "t" / "_deletes").glob("*.parquet"))
    assert _ids(spark, t, version=1) == [0, 2, 3, 4]
    assert _ids(spark, t, version=2) == [0, 2, 3, 4, 5, 6]
    # pre-delete version aged out of the window
    with pytest.raises(ValueError, match="does not exist"):
        tx_read(spark, t, version=0)


def test_window_larger_than_history_keeps_everything(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 2), t)
    tx_write(_df(spark, 2, 4), t)
    deleted = tx_vacuum(spark, t, retain_last=100)
    assert deleted == []
    assert _ids(spark, t, version=0) == [0, 1]
    assert _ids(spark, t, version=1) == [0, 1, 2, 3]
