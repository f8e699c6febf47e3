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


def _clock(monkeypatch, hours):
    """Drive txlog's commit-stamp clock: a mutable fake 'now' in hours."""
    from distributed_mapreduce__spark.sources import txlog

    state = {"h": hours}
    monkeypatch.setattr(txlog, "_now", lambda: state["h"] * 3600.0)
    return state


def test_retain_hours_keeps_window_plus_edge_snapshot(
    spark, tmp_path, monkeypatch
):
    """The wall-clock window (r9 #7): every snapshot current at any
    instant in the last H hours survives — versions committed inside
    the window AND the newest one at/before its left edge."""
    clock = _clock(monkeypatch, 0)
    t = str(tmp_path / "t")
    clock["h"] = 0
    tx_write(_df(spark, 0, 2, "v0"), t)                       # v0 @ 0h
    clock["h"] = 1
    tx_write(_df(spark, 10, 12, "v1"), t, mode="overwrite")   # v1 @ 1h
    clock["h"] = 2
    tx_write(_df(spark, 12, 14, "v2"), t)                     # v2 @ 2h
    clock["h"] = 3
    tx_write(_df(spark, 14, 16, "v3"), t)                     # v3 @ 3h

    clock["h"] = 3.6  # window [2.1h, 3.6h]
    deleted = tx_vacuum(spark, t, retain_hours=1.5)
    assert deleted  # v0's overwritten files aged out with it
    # v3 (in window), v2 (the snapshot live AT the window's edge)
    # read; v1 and v0 aged out
    assert _ids(spark, t, version=3) == [10, 11, 12, 13, 14, 15]
    assert _ids(spark, t, version=2) == [10, 11, 12, 13]
    for gone in (0, 1):
        with pytest.raises(ValueError, match="does not exist"):
            tx_read(spark, t, version=gone)

    # the whole history inside the window → nothing to sweep
    t2 = str(tmp_path / "t2")
    clock["h"] = 10
    tx_write(_df(spark, 0, 2), t2)
    clock["h"] = 10.2
    tx_write(_df(spark, 2, 4), t2)
    assert tx_vacuum(spark, t2, retain_hours=1.0) == []
    assert _ids(spark, t2, version=0) == [0, 1]


def test_retain_hours_unions_with_retain_last(spark, tmp_path, monkeypatch):
    clock = _clock(monkeypatch, 0)
    t = str(tmp_path / "t")
    for h in range(4):
        clock["h"] = h
        tx_write(_df(spark, h * 2, h * 2 + 2, f"v{h}"), t)
    clock["h"] = 3.0
    # time window alone would keep v2+ only; retain_last=2 keeps v1+
    tx_vacuum(spark, t, retain_last=2, retain_hours=0.5)
    assert _ids(spark, t, version=1) == [0, 1, 2, 3]
    with pytest.raises(ValueError, match="does not exist"):
        tx_read(spark, t, version=0)


def test_retain_hours_refuses_clock_skew(spark, tmp_path, monkeypatch):
    """Non-monotonic commit stamps make the time→version pivot
    ambiguous: refuse loudly, never guess."""
    clock = _clock(monkeypatch, 5)
    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 2), t)
    clock["h"] = 3  # a writer with a slow clock commits v1
    tx_write(_df(spark, 2, 4), t)
    with pytest.raises(ValueError, match="non-monotonic"):
        tx_vacuum(spark, t, retain_hours=1.0)
    # version-based retention still works on the same table
    tx_vacuum(spark, t, retain_last=1)
    assert _ids(spark, t) == [0, 1, 2, 3]


def test_retain_hours_treats_prestamp_commits_as_ancient(
    spark, tmp_path, monkeypatch
):
    """Commits written before the ts stamp existed (or by an older
    build) must never be mistaken for in-window: they pin the edge
    snapshot, so retention only ever widens."""
    import json as _json

    from distributed_mapreduce__spark.sources.txlog import _PAD

    clock = _clock(monkeypatch, 0)
    t = str(tmp_path / "t")
    clock["h"] = 0
    tx_write(_df(spark, 0, 2, "old"), t)
    # strip v0's stamp, simulating an older build's commit
    p = f"{t}/_txlog/{0:0{_PAD}d}.json"
    with open(p) as fh:
        c = _json.load(fh)
    del c["ts"]
    import os

    os.unlink(p)
    with open(p, "w") as fh:
        _json.dump(c, fh)
    clock["h"] = 10
    tx_write(_df(spark, 2, 4, "new"), t)
    clock["h"] = 10.1
    tx_vacuum(spark, t, retain_hours=1.0)
    # v1 in window; v0 is the (ts-less) edge snapshot → both readable
    assert _ids(spark, t, version=0) == [0, 1]
    assert _ids(spark, t, version=1) == [0, 1, 2, 3]
