"""Checkpointed table→table incremental pipeline
(streaming/table_stream.py): exactly-once across crashes in every
window, per-source-version batch boundaries, and change-feed honesty
about multi-table commits (committed deliver, aborted skip, pending
park the cursor)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.sources import multitx
from distributed_mapreduce__spark.sources.txlog import (
    tx_apply_deletes,
    tx_changes,
    tx_changes_by_version,
    tx_changes_cdf,
    tx_compact,
    tx_delete,
    tx_history,
    tx_read,
    tx_write,
)
from distributed_mapreduce__spark.streaming.table_stream import (
    load_cursor,
    pipe_available_now,
    save_cursor,
)


def _df(spark, lo, hi, tag="x"):
    return spark.range(lo, hi).select(F.col("id"), F.lit(tag).alias("tag"))


def _ids(spark, path):
    return sorted(r.id for r in tx_read(spark, path).collect())


def _double(df):
    return df.select((F.col("id") * 2).alias("id"), "tag")


def _keys(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def test_pipe_processes_backlog_then_is_quiet(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    tx_write(_df(spark, 0, 5), src)
    tx_write(_df(spark, 5, 8), src)

    r = pipe_available_now(spark, src, dst, _double, checkpoint=ckpt)
    assert r["versions"] == 2 and r["writes"] == 2
    assert _ids(spark, dst) == [i * 2 for i in range(8)]
    # one sink commit per source version — bounded batches by design
    assert len([h for h in tx_history(spark, dst)]) == 2

    # quiet tick: nothing new, nothing written, cursor unchanged
    r2 = pipe_available_now(spark, src, dst, _double, checkpoint=ckpt)
    assert r2 == {"cursor": r["cursor"], "versions": 0, "writes": 0}
    assert _ids(spark, dst) == [i * 2 for i in range(8)]


def test_pipe_is_incremental(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    tx_write(_df(spark, 0, 4), src)
    pipe_available_now(spark, src, dst, checkpoint=ckpt)

    tx_write(_df(spark, 4, 6), src)
    r = pipe_available_now(spark, src, dst, checkpoint=ckpt)
    assert r["versions"] == 1 and r["writes"] == 1
    assert _ids(spark, dst) == list(range(6))


def test_crash_before_cursor_persist_does_not_duplicate(spark, tmp_path):
    """The worst window: sink txn committed, cursor lost. The replay
    re-pulls the version; the sink's txn dedup absorbs it."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    tx_write(_df(spark, 0, 5), src)
    r1 = pipe_available_now(spark, src, dst, checkpoint=ckpt)

    # simulate the crash: the write happened, the cursor write didn't
    fs_cursor = tmp_path / "ckpt" / "cursor.json"
    fs_cursor.unlink()
    assert load_cursor(spark, ckpt) is None

    r2 = pipe_available_now(spark, src, dst, checkpoint=ckpt)
    assert r2["versions"] == 1 and r2["writes"] == 1  # re-pulled...
    assert _ids(spark, dst) == list(range(5))  # ...but not duplicated
    assert len(tx_history(spark, dst)) == 1  # txn dedup: no new commit
    assert load_cursor(spark, ckpt) == r1["cursor"]


def test_compaction_advances_cursor_without_writing(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    tx_write(_df(spark, 0, 3), src)
    tx_write(_df(spark, 3, 6), src)
    pipe_available_now(spark, src, dst, checkpoint=ckpt)

    assert tx_compact(spark, src) is not None
    r = pipe_available_now(spark, src, dst, checkpoint=ckpt)
    assert r["versions"] == 1 and r["writes"] == 0
    assert _ids(spark, dst) == list(range(6))


def test_source_rewrite_raises(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    tx_write(_df(spark, 0, 3), src)
    pipe_available_now(spark, src, dst, checkpoint=ckpt)

    tx_write(_df(spark, 0, 2), src, mode="overwrite")
    with pytest.raises(ValueError, match="rewrites history"):
        pipe_available_now(spark, src, dst, checkpoint=ckpt)
    # recovery path: reprocess snapshot, re-seed the cursor, resume
    snap_version = tx_history(spark, src)[-1]["version"]
    save_cursor(spark, ckpt, snap_version)
    tx_write(_df(spark, 10, 12), src)
    r = pipe_available_now(spark, src, dst, checkpoint=ckpt)
    assert r["versions"] == 1 and r["writes"] == 1


def test_same_table_refused(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 2), t)
    with pytest.raises(ValueError, match="feedback loop"):
        pipe_available_now(spark, t, t + "/", checkpoint=str(tmp_path / "c"))


def test_two_named_pipes_one_sink(spark, tmp_path):
    """txn namespacing: independent sources fan IN to one sink table
    without their version-numbered txn ids colliding."""
    a, b, dst = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "dst")
    tx_write(_df(spark, 0, 3, "a"), a)
    tx_write(_df(spark, 100, 103, "b"), b)
    pipe_available_now(spark, a, dst, checkpoint=str(tmp_path / "ca"), name="from-a")
    pipe_available_now(spark, b, dst, checkpoint=str(tmp_path / "cb"), name="from-b")
    assert _ids(spark, dst) == [0, 1, 2, 100, 101, 102]


def test_changefeed_stops_before_pending_multi_and_resumes(
    spark, tmp_path, monkeypatch
):
    """A provisional multi-table commit is neither deliverable nor
    skippable while pending: the feed parks the cursor below it, and
    delivers it only once the coordinator record lands."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    other = str(tmp_path / "other")
    coord = str(tmp_path / "catalog")
    ckpt = str(tmp_path / "ckpt")
    tx_write(_df(spark, 0, 3), src)
    tx_write(_df(spark, 0, 1), other)

    # crash tx_multi before the coordinator publish → pending commit
    real = multitx._write_atomic

    def dying(spark_, fs, path, payload):
        if "_multitx/" in path:
            raise RuntimeError("simulated crash")
        return real(spark_, fs, path, payload)

    monkeypatch.setattr(multitx, "_write_atomic", dying)
    with pytest.raises(RuntimeError, match="simulated crash"):
        multitx.tx_multi(
            {src: _df(spark, 3, 5), other: _df(spark, 1, 2)},
            coord,
            txn="t1",
        )
    monkeypatch.setattr(multitx, "_write_atomic", real)

    r = pipe_available_now(spark, src, dst, checkpoint=ckpt)
    assert r["writes"] == 1  # the plain append, nothing provisional
    assert _ids(spark, dst) == [0, 1, 2]
    parked = r["cursor"]

    # quiet while still pending — the cursor must NOT advance past it
    r2 = pipe_available_now(spark, src, dst, checkpoint=ckpt)
    assert r2 == {"cursor": parked, "versions": 0, "writes": 0}

    # the transaction resolves (retry completes it) → next tick delivers
    multitx.tx_multi(
        {src: _df(spark, 3, 5), other: _df(spark, 1, 2)}, coord, txn="t1"
    )
    r3 = pipe_available_now(spark, src, dst, checkpoint=ckpt)
    assert r3["writes"] == 1
    assert _ids(spark, dst) == [0, 1, 2, 3, 4]


def test_changefeed_skips_aborted_multi(spark, tmp_path, monkeypatch):
    src = str(tmp_path / "src")
    other = str(tmp_path / "other")
    coord = str(tmp_path / "catalog")
    tx_write(_df(spark, 0, 3), src)
    tx_write(_df(spark, 0, 1), other)

    real = multitx._write_atomic

    def dying(spark_, fs, path, payload):
        if "_multitx/" in path:
            raise RuntimeError("simulated crash")
        return real(spark_, fs, path, payload)

    monkeypatch.setattr(multitx, "_write_atomic", dying)
    with pytest.raises(RuntimeError):
        multitx.tx_multi(
            {src: _df(spark, 3, 5), other: _df(spark, 1, 2)}, coord, txn="t2"
        )
    monkeypatch.setattr(multitx, "_write_atomic", real)
    assert multitx.tx_multi_abort(spark, coord, "t2")

    # aborted rows never became visible → the feed must not deliver
    # them, but the cursor must advance past the dead version
    df, cursor = tx_changes(spark, src, None)
    assert sorted(r.id for r in df.collect()) == [0, 1, 2]
    df2, cursor2 = tx_changes(spark, src, cursor)
    assert df2 is None and cursor2 == cursor

    tx_write(_df(spark, 10, 11), src)
    df3, _ = tx_changes(spark, src, cursor)
    assert sorted(r.id for r in df3.collect()) == [10]


def test_cdf_yields_inserts_and_delete_keys(spark, tmp_path):
    src = str(tmp_path / "src")
    tx_write(_df(spark, 0, 5, "a"), src)                       # v0
    tx_delete(_keys(spark, [1, 3]), src, "id", mode="merge_on_read")  # v1
    tx_write(_df(spark, 3, 4, "back"), src)                         # v2

    got = []
    for v, kind, df in tx_changes_cdf(spark, src, None):
        got.append((v, kind, sorted(r.id for r in df.collect()) if df is not None else None))
    assert got == [
        (0, "insert", [0, 1, 2, 3, 4]),
        (1, "delete", [1, 3]),
        (2, "insert", [3]),
    ]
    # preimage variant: full deleted rows, tags intact
    frames = list(tx_changes_cdf(spark, src, 0, preimage=True))
    v, kind, df = frames[0]
    assert (v, kind) == (1, "delete")
    assert {(r.id, r.tag) for r in df.collect()} == {(1, "a"), (3, "a")}


def test_cdf_raises_on_copy_on_write_delete(spark, tmp_path):
    src = str(tmp_path / "src")
    tx_write(_df(spark, 0, 5), src)
    tx_delete(_keys(spark, [1]), src, "id")  # CoW: rewrites in place
    with pytest.raises(ValueError, match="rewrites rows"):
        list(tx_changes_cdf(spark, src, None))


def test_cdc_pipe_replicates_inserts_and_deletes(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    tx_write(_df(spark, 0, 7), src)
    pipe_available_now(spark, src, dst, checkpoint=ckpt, cdc_key="id")

    tx_delete(_keys(spark, [2, 4]), src, "id", mode="merge_on_read")
    tx_write(_df(spark, 4, 5, "back"), src)  # re-insert after delete
    r = pipe_available_now(spark, src, dst, checkpoint=ckpt, cdc_key="id")
    assert r["versions"] == 2 and r["writes"] == 2
    assert _ids(spark, dst) == _ids(spark, src) == [0, 1, 3, 4, 5, 6]

    # crash-replay: lose the cursor, re-drain — txn dedup on BOTH the
    # insert and the delete arms, sink history unchanged
    (tmp_path / "ckpt" / "cursor.json").unlink()
    n_before = len(tx_history(spark, dst))
    pipe_available_now(spark, src, dst, checkpoint=ckpt, cdc_key="id")
    assert len(tx_history(spark, dst)) == n_before
    assert _ids(spark, dst) == [0, 1, 3, 4, 5, 6]

    # settlement on the source is a logical no-op for the feed
    tx_apply_deletes(spark, src)
    r2 = pipe_available_now(spark, src, dst, checkpoint=ckpt, cdc_key="id")
    assert r2["writes"] == 0 and r2["versions"] == 1
    assert _ids(spark, dst) == [0, 1, 3, 4, 5, 6]


def test_cdc_pipe_transform_applies_to_inserts_only(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    tx_write(_df(spark, 0, 10), src)
    tx_delete(_keys(spark, [1, 8]), src, "id", mode="merge_on_read")
    pipe_available_now(
        spark,
        src,
        dst,
        lambda df: df.filter(F.col("id") < 5),
        checkpoint=ckpt,
        cdc_key="id",
    )
    # 8 was filtered out by the transform; deleting it is harmless
    assert _ids(spark, dst) == [0, 2, 3, 4]


def test_by_version_boundaries_match_commits(spark, tmp_path):
    src = str(tmp_path / "src")
    tx_write(_df(spark, 0, 2), src)
    tx_write(_df(spark, 2, 3), src)
    tx_write(_df(spark, 3, 7), src)
    got = [
        (v, sorted(r.id for r in df.collect()) if df is not None else None)
        for v, df in tx_changes_by_version(spark, src, None)
    ]
    assert got == [(0, [0, 1]), (1, [2]), (2, [3, 4, 5, 6])]
    # resume mid-stream: boundaries are stable, not cumulative
    got2 = [
        (v, sorted(r.id for r in df.collect()))
        for v, df in tx_changes_by_version(spark, src, 0)
    ]
    assert got2 == [(1, [2]), (2, [3, 4, 5, 6])]
