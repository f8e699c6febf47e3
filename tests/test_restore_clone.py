"""RESTORE + shallow CLONE on the transactional table (round 9):
metadata-only time-travel writes — no data copied or rewritten — with
the Delta semantics for post-vacuum refusal and clone independence."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.sources import txlog
from distributed_mapreduce__spark.sources.txlog import (
    tx_clone,
    tx_merge,
    tx_read,
    tx_restore,
    tx_vacuum,
    tx_write,
)


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(F.col("id"), F.lit(tag).alias("tag"))


def _ids(spark, path, version=None):
    return sorted(r.id for r in tx_read(spark, path, version).collect())


def test_restore_is_a_metadata_only_new_version(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 3, "a"), t)                      # v0
    tx_write(_df(spark, 10, 12, "b"), t)                    # v1
    tx_write(_df(spark, 100, 101, "c"), t, mode="overwrite")  # v2
    n_files_before = len(txlog._all_data_files(spark, t))
    v = tx_restore(spark, t, 1)
    assert v == 3
    assert _ids(spark, t) == [0, 1, 2, 10, 11]              # v1 content
    # no data was copied: the file population is unchanged
    assert len(txlog._all_data_files(spark, t)) == n_files_before
    # the pre-restore state itself stays time-travelable
    assert _ids(spark, t, version=2) == [100]
    assert _ids(spark, t, version=v) == [0, 1, 2, 10, 11]


def test_restore_then_vacuum_keeps_restored_files(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 3, "a"), t)
    tx_write(_df(spark, 100, 101, "c"), t, mode="overwrite")
    tx_restore(spark, t, 0)
    deleted = tx_vacuum(spark, t)
    # vacuum removed the overwrite's (now dead) files, never v0's
    assert _ids(spark, t) == [0, 1, 2]
    assert len(deleted) >= 1


def test_restore_refuses_truncated_or_deleted_targets(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 3, "a"), t)                      # v0
    tx_write(_df(spark, 100, 101, "c"), t, mode="overwrite")  # v1
    # physically delete one of v0's files (still in the log)
    live1, _ = txlog._snapshot_files(spark, t, 1)
    f0 = sorted(set(txlog._snapshot_files(spark, t, 0)[0]) - set(live1))[0]
    os.remove(os.path.join(t, f0))
    with pytest.raises(FileNotFoundError, match="physically deleted"):
        tx_restore(spark, t, 0)
    # vacuum-truncated versions refuse with the version error
    tx_vacuum(spark, t)
    with pytest.raises(ValueError, match="does not exist"):
        tx_restore(spark, t, 0)


def test_shallow_clone_zero_copy_and_independent(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    tx_write(_df(spark, 0, 5, "a"), src, stats_cols=["id"])   # v0
    tx_write(_df(spark, 10, 15, "b"), src, stats_cols=["id"])  # v1
    tx_clone(spark, src, dst)
    assert _ids(spark, dst) == _ids(spark, src)
    # zero copy: the clone owns no data files of its own yet
    assert txlog._all_data_files(spark, dst) == []

    # writes on either side never touch the other
    tx_write(_df(spark, 100, 102, "clone-only"), dst)
    tx_write(_df(spark, 200, 201, "src-only"), src)
    assert _ids(spark, dst) == [0, 1, 2, 3, 4, 10, 11, 12, 13, 14, 100, 101]
    assert _ids(spark, src) == [0, 1, 2, 3, 4, 10, 11, 12, 13, 14, 200]

    # copy-on-write on the clone rewrites INTO the clone, not the src
    src_files = set(txlog._all_data_files(spark, src))
    tx_merge(
        _df(spark, 3, 5, "upd").withColumn("tag", F.lit("upd")), dst, "id"
    )
    assert set(txlog._all_data_files(spark, src)) == src_files
    tags = {
        r.id: r.tag
        for r in tx_read(spark, dst).filter(F.col("id").isin(3, 4)).collect()
    }
    assert tags == {3: "upd", 4: "upd"}
    assert _ids(spark, src) == [0, 1, 2, 3, 4, 10, 11, 12, 13, 14, 200]

    # vacuum on the clone never deletes source files
    tx_vacuum(spark, dst)
    assert set(txlog._all_data_files(spark, src)) == src_files
    assert _ids(spark, src) == [0, 1, 2, 3, 4, 10, 11, 12, 13, 14, 200]


def test_clone_pins_version_and_carries_stats(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    tx_write(_df(spark, 0, 5, "a"), src, stats_cols=["id"])
    tx_write(_df(spark, 10, 15, "b"), src, stats_cols=["id"])
    tx_clone(spark, src, dst, version=0)
    assert _ids(spark, dst) == [0, 1, 2, 3, 4]
    # inherited stats drive data skipping on the clone: a disjoint
    # range reads zero rows even though refs are absolute
    assert tx_read(spark, dst, where=("id", 50, 60)).count() == 0
    assert _ids(spark, dst) == [0, 1, 2, 3, 4]
    # clone-of-clone works too (refs stay absolute through _abs)
    d2 = str(tmp_path / "dst2")
    tx_clone(spark, dst, d2)
    assert _ids(spark, d2) == [0, 1, 2, 3, 4]


def test_clone_refuses_existing_destination(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    tx_write(_df(spark, 0, 2, "a"), src)
    tx_clone(spark, src, dst)
    with pytest.raises(FileExistsError):
        tx_clone(spark, src, dst)


def test_clone_carries_schema_and_properties(spark, tmp_path):
    """A shallow clone's seed commit copies the source's write schema
    and table properties: enforcement and cdf.enabled behave on the
    clone exactly as on the source from its first append."""
    from distributed_mapreduce__spark.sources.txlog import (
        tx_properties,
        tx_set_properties,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    tx_write(_df(spark, 0, 4, "a"), src)
    tx_set_properties(spark, src, {"owner": "etl", "cdf.enabled": "false"})
    tx_clone(spark, src, dst)
    assert tx_properties(spark, dst) == {
        "owner": "etl",
        "cdf.enabled": "false",
    }
    # schema enforcement active from the clone's first append
    with pytest.raises(ValueError, match="missing columns"):
        tx_write(_df(spark, 4, 5, "b").drop("tag"), dst)
    tx_write(_df(spark, 4, 5, "b"), dst)


def test_restore_resets_schema_to_the_restored_version(spark, tmp_path):
    """RESTORE commits as an overwrite, so the write schema resets to
    the restored version's own: post-restore appends are enforced
    against the historical shape, not the abandoned evolution."""
    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 3, "a"), t)                               # v0
    tx_write(
        _df(spark, 3, 5, "b").withColumn("x", F.lit(1)),
        t,
        schema_mode="merge",
    )                                                                # v1
    tx_restore(spark, t, 0)                                          # v2
    # the evolved column is gone from the enforced shape
    with pytest.raises(ValueError, match="new columns"):
        tx_write(_df(spark, 5, 6, "c").withColumn("x", F.lit(2)), t)
    tx_write(_df(spark, 5, 6, "c"), t)
    assert set(tx_read(spark, t).columns) == {"id", "tag"}
