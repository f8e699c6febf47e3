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


def test_cdf_yields_cow_delete_rows(spark, tmp_path):
    """Round 10: a copy-on-write delete now carries its deleted rows
    in a _cdf sidecar, and the feed delivers them as a 'delete' frame
    with FULL rows (already materialized — free) regardless of the
    preimage flag."""
    src = str(tmp_path / "src")
    tx_write(_df(spark, 0, 5, "a"), src)
    tx_delete(_keys(spark, [1, 3]), src, "id")  # CoW rewrite, cdf on
    frames = list(tx_changes_cdf(spark, src, 0))
    assert [(v, k) for v, k, _ in frames] == [(1, "delete")]
    assert {(r.id, r.tag) for r in frames[0][2].collect()} == {
        (1, "a"),
        (3, "a"),
    }
    # rows-removed honesty: the insert-only feed still refuses
    with pytest.raises(ValueError, match="delete"):
        list(tx_changes_by_version(spark, src, 0))


def test_cdf_raises_on_rewrite_without_sidecar(spark, tmp_path):
    """cdf=False is the documented opt-out for write-hot tables nothing
    streams from — the feed then keeps the honest
    reprocess-from-snapshot contract."""
    from distributed_mapreduce__spark.sources.txlog import tx_merge

    src = str(tmp_path / "src")
    tx_write(_df(spark, 0, 5), src)
    tx_delete(_keys(spark, [1]), src, "id", cdf=False)
    with pytest.raises(ValueError, match="no cdf sidecar"):
        list(tx_changes_cdf(spark, src, None))

    src2 = str(tmp_path / "src2")
    tx_write(_df(spark, 0, 5), src2)
    tx_merge(_df(spark, 2, 4, "upd"), src2, "id", cdf=False)
    with pytest.raises(ValueError, match="no cdf sidecar"):
        list(tx_changes_cdf(spark, src2, None))


def test_cdf_yields_merge_pre_and_post_images(spark, tmp_path):
    """A merge commit delivers one 'cdf' frame tagged by _change_type:
    pre-image for every matched key's OLD row, post-image for its new
    row, insert for unmatched keys — read straight from the sidecar,
    no diffing."""
    from distributed_mapreduce__spark.sources.txlog import tx_merge

    src = str(tmp_path / "src")
    tx_write(_df(spark, 0, 5, "a"), src)  # v0: ids 0..4 tag=a
    # updates: ids 3,4 exist (update), ids 7,8 are new (insert)
    upd = _df(spark, 3, 5, "new").unionByName(_df(spark, 7, 9, "new"))
    tx_merge(upd, src, "id")  # v1
    frames = list(tx_changes_cdf(spark, src, 0))
    assert [(v, k) for v, k, _ in frames] == [(1, "cdf")]
    got = {
        (r.id, r.tag, r._change_type) for r in frames[0][2].collect()
    }
    assert got == {
        (3, "a", "update_preimage"),
        (4, "a", "update_preimage"),
        (3, "new", "update_postimage"),
        (4, "new", "update_postimage"),
        (7, "new", "insert"),
        (8, "new", "insert"),
    }
    # a merge that touches no live file is pure inserts
    tx_merge(_df(spark, 100, 102, "far"), src, "id")  # v2
    frames2 = list(tx_changes_cdf(spark, src, 1))
    got2 = {
        (r.id, r._change_type) for r in frames2[0][2].collect()
    }
    assert got2 == {(100, "insert"), (101, "insert")}


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_cdc_pipe_replicates_merge_exactly_once(spark, tmp_path):
    """The r9 #1 gap closed: a routine MERGE on the source replicates
    to the sink (delete-then-append under per-version txn ids) instead
    of poisoning the pipe — including through crash-replay and a
    replay racing new source commits."""
    from distributed_mapreduce__spark.sources.txlog import tx_merge

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    tx_write(_df(spark, 0, 6, "a"), src)
    pipe_available_now(spark, src, dst, checkpoint=ckpt, cdc_key="id")

    upd = _df(spark, 2, 4, "upd").unionByName(_df(spark, 10, 12, "upd"))
    tx_merge(upd, src, "id")
    tx_delete(_keys(spark, [5]), src, "id")  # CoW delete replicates too
    r = pipe_available_now(spark, src, dst, checkpoint=ckpt, cdc_key="id")
    assert r["versions"] == 2 and r["writes"] == 3  # merge=2 + delete=1

    def table(path):
        return {(x.id, x.tag) for x in tx_read(spark, path).collect()}

    expect = {(0, "a"), (1, "a"), (2, "upd"), (3, "upd"), (4, "a"),
              (10, "upd"), (11, "upd")}
    assert table(src) == expect and table(dst) == expect

    # crash-replay: lose the cursor AND race a concurrent source
    # append — the replayed merge/delete batches dedup by txn id, the
    # new append delivers once
    (tmp_path / "ckpt" / "cursor.json").unlink()
    tx_write(_df(spark, 20, 21, "late"), src)
    pipe_available_now(spark, src, dst, checkpoint=ckpt, cdc_key="id")
    assert table(dst) == expect | {(20, "late")}
    # idempotence held across every arm: re-drain changes nothing
    n = len(tx_history(spark, dst))
    (tmp_path / "ckpt" / "cursor.json").unlink()
    pipe_available_now(spark, src, dst, checkpoint=ckpt, cdc_key="id")
    assert len(tx_history(spark, dst)) == n


def test_cdc_pipe_merge_transform_dropped_updates_delete(spark, tmp_path):
    """An update whose post-image the transform filters out must not
    leave the STALE pre-image row on the sink: the .rm tombstone
    already named every changed key, so the dropped row disappears."""
    from distributed_mapreduce__spark.sources.txlog import tx_merge

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    tx_write(_df(spark, 0, 6, "a"), src)
    keep_small = lambda df: df.filter(F.col("id") < 4)  # noqa: E731
    pipe_available_now(
        spark, src, dst, keep_small, checkpoint=ckpt, cdc_key="id"
    )
    # update ids 2 (kept by transform) and 5 (dropped by transform)
    tx_merge(
        _df(spark, 2, 3, "upd").unionByName(_df(spark, 5, 6, "upd")),
        src,
        "id",
    )
    pipe_available_now(
        spark, src, dst, keep_small, checkpoint=ckpt, cdc_key="id"
    )
    got = {(x.id, x.tag) for x in tx_read(spark, dst).collect()}
    assert got == {(0, "a"), (1, "a"), (2, "upd"), (3, "a")}


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


def test_cdc_pipe_replicates_overwrite_and_restore(spark, tmp_path):
    """A source overwrite — and RESTORE, which commits as one — is a
    snapshot reset the cdc pipe carries through as the sink's own
    overwrite: replicated tombstones clear with it, and the usual
    txn-id idempotence absorbs crash replays."""
    from distributed_mapreduce__spark.sources.txlog import tx_restore

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    tx_write(_df(spark, 0, 5, "a"), src)                         # v0
    tx_delete(_keys(spark, [1]), src, "id", mode="merge_on_read")  # v1
    pipe_available_now(spark, src, dst, checkpoint=ckpt, cdc_key="id")
    assert _ids(spark, dst) == [0, 2, 3, 4]

    tx_write(_df(spark, 100, 103, "b"), src, mode="overwrite")   # v2
    r = pipe_available_now(spark, src, dst, checkpoint=ckpt, cdc_key="id")
    assert r["writes"] == 1
    assert _ids(spark, dst) == [100, 101, 102]

    # RESTORE back to the overwrite (v2's state is the only
    # tombstone-free one) — wait: restore to v0 has live tombstones
    # at v1, so restore targets v2... instead restore the OVERWRITE
    # after appending: append v3, restore to v2, pipe both
    tx_write(_df(spark, 200, 202, "c"), src)                     # v3
    tx_restore(spark, src, 2)                                    # v4
    pipe_available_now(spark, src, dst, checkpoint=ckpt, cdc_key="id")
    assert _ids(spark, dst) == [100, 101, 102]

    # crash replay across the reset boundary: no duplication
    (tmp_path / "ckpt" / "cursor.json").unlink()
    n = len(tx_history(spark, dst))
    pipe_available_now(spark, src, dst, checkpoint=ckpt, cdc_key="id")
    assert len(tx_history(spark, dst)) == n
    assert _ids(spark, dst) == [100, 101, 102]


def test_rollup_view_resets_on_overwrite(spark, tmp_path):
    """A source overwrite becomes an ATOMIC store reset (one marker
    commit retires the old batches and reveals the new snapshot's
    partials); maintenance resumes incrementally on top, and even a
    lost-cursor FULL replay across the reset converges (pre-reset
    folds land on retired ids and are skipped as already-accounted)."""
    from distributed_mapreduce__spark.operators.timeseries import (
        read_rollup,
        tumbling,
    )
    from distributed_mapreduce__spark.streaming.table_stream import (
        rollup_view_available_now,
    )

    src = str(tmp_path / "src")
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")

    def ts_df(lo, hi, etype="a"):
        return spark.sql(
            f"SELECT id AS event_id, "
            f"timestamp'2024-01-01 00:10:00' + make_interval(0,0,0,0,0,CAST(id AS INT),0) AS ts, "
            f"CAST(id AS double) AS value, '{etype}' AS event_type "
            f"FROM range({lo}, {hi})"
        )

    def view():
        return {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in read_rollup(spark, store, ("event_type",)).collect()
        }

    def recompute():
        return {
            (r.window_start, r.event_type): (r.n_events, r.sum_value)
            for r in tumbling(
                tx_read(spark, src), "1 hour", "event_type"
            ).collect()
        }

    tx_write(ts_df(0, 120, "a"), src)                       # v0
    tx_delete(_keys(spark, [5]).selectExpr("id AS event_id"),
              src, "event_id", mode="merge_on_read")        # v1
    rollup_view_available_now(
        spark, src, store, "1 hour", ("event_type",), checkpoint=ckpt
    )
    assert view() == recompute()

    tx_write(ts_df(0, 40, "b"), src, mode="overwrite")      # v2: RESET
    tx_write(ts_df(200, 260, "c"), src)                     # v3: resume
    r = rollup_view_available_now(
        spark, src, store, "1 hour", ("event_type",), checkpoint=ckpt
    )
    assert r["folds"] == 2
    got = view()
    assert got == recompute()
    assert not any(k[1] == "a" for k in got)  # pre-reset state gone

    # lost-cursor FULL replay across the reset: pre-reset versions are
    # retired-id no-ops, the reset replays idempotently, post-reset
    # folds replace themselves — view unchanged
    (tmp_path / "ckpt" / "cursor.json").unlink()
    rollup_view_available_now(
        spark, src, store, "1 hour", ("event_type",), checkpoint=ckpt
    )
    assert view() == recompute()


def test_cdc_pipe_cross_key_delete_needs_preimage(spark, tmp_path):
    """A source MoR delete keyed on a different column than the pipe's
    cdc_key: the keys-only feed raises with the preimage instruction,
    and preimage=True replicates it correctly by projecting the
    replication key out of the full deleted rows."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    tx_write(_df(spark, 0, 6, "a").withColumn("grp", F.col("id") % 2), src)
    pipe_available_now(spark, src, dst, checkpoint=ckpt, cdc_key="id")
    # delete by GROUP, replicate by id
    tx_delete(
        spark.createDataFrame([(1,)], "grp long"), src, "grp",
        mode="merge_on_read",
    )
    with pytest.raises(ValueError, match="preimage=True"):
        pipe_available_now(spark, src, dst, checkpoint=ckpt, cdc_key="id")
    r = pipe_available_now(
        spark, src, dst, checkpoint=ckpt, cdc_key="id", preimage=True
    )
    assert r["writes"] == 1
    assert _ids(spark, dst) == _ids(spark, src) == [0, 2, 4]


# --- round 11: processing-time trigger wrapper ------------------------


def test_run_pipe_multi_tick_with_concurrent_writer(spark, tmp_path):
    """VERDICT r10 #6: the processing-time trigger drains commits a
    concurrent writer lands BETWEEN ticks (injected via the sleep
    seam), backs off on quiet ticks, and snaps back on productive
    ones — with the drain's exactly-once intact across all of it."""
    from pyspark.sql import functions as F

    from distributed_mapreduce__spark.sources.txlog import tx_read, tx_write
    from distributed_mapreduce__spark.streaming.table_stream import (
        pipe_available_now,
        run_pipe,
    )

    def df(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id"), F.lit("x").alias("tag")
        )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    tx_write(df(0, 5), src)

    sleeps: list[float] = []
    pending = iter([(5, 10), None, None, (10, 15)])

    def sleep_with_writer(seconds: float) -> None:
        sleeps.append(seconds)
        nxt = next(pending, None)
        if nxt is not None:
            tx_write(df(*nxt), src)  # the concurrent writer

    totals = run_pipe(
        lambda: pipe_available_now(spark, src, dst, checkpoint=ckpt),
        interval=1.0,
        max_ticks=5,
        backoff=2.0,
        sleep=sleep_with_writer,
    )
    assert totals["ticks"] == 5
    assert totals["versions"] == 3 and totals["writes"] == 3
    got = sorted(r.id for r in tx_read(spark, dst).collect())
    assert got == list(range(15))
    # sleep trace: productive tick → 1.0; two quiet ticks stretch
    # 2.0 → 4.0; the writer before tick 5 makes it productive again
    # (no sleep after the final tick)
    assert sleeps == [1.0, 1.0, 2.0, 4.0]


def test_run_pipe_backoff_cap_and_defaults(spark, tmp_path):
    """Quiet-tick backoff caps at max_interval (default 8×interval)."""
    from pyspark.sql import functions as F

    from distributed_mapreduce__spark.sources.txlog import tx_write
    from distributed_mapreduce__spark.streaming.table_stream import (
        pipe_available_now,
        run_pipe,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    tx_write(
        spark.range(0, 3).select(F.col("id"), F.lit("x").alias("tag")), src
    )
    sleeps: list[float] = []
    run_pipe(
        lambda: pipe_available_now(
            spark, src, dst, checkpoint=str(tmp_path / "ck")
        ),
        interval=1.0,
        max_ticks=7,
        backoff=3.0,
        sleep=sleeps.append,
    )
    # tick1 productive (1.0), then quiet: 3, 8 (capped), 8, 8, 8
    assert sleeps == [1.0, 3.0, 8.0, 8.0, 8.0, 8.0]


def test_run_pipes_isolation_backoff_and_restart(spark, tmp_path):
    """Round-12 multi-pipe scheduler (VERDICT r11 #8): N pipes with
    per-pipe checkpoints driven by run_pipes — one pipe poisoned (its
    source table does not exist) must be quarantined after
    max_failures CONSECUTIVE failures while the healthy pipes drain;
    a restart after fixing the cause resumes the poisoned pipe from
    its checkpoint; exactly-once holds per pipe across scheduler
    restarts; the dashboard snapshot carries the pipes row."""
    from distributed_mapreduce__spark.runtime.progress import (
        progress_snapshot,
    )
    from distributed_mapreduce__spark.streaming.table_stream import (
        PIPES_STATUS,
        run_pipes,
    )

    d = tmp_path
    s1, s2, s3 = str(d / "s1"), str(d / "s2"), str(d / "s3")
    d1, d2, d3 = str(d / "d1"), str(d / "d2"), str(d / "d3")
    c1, c2, c3 = str(d / "c1"), str(d / "c2"), str(d / "c3")
    tx_write(_df(spark, 0, 10, "a"), s1)
    tx_write(_df(spark, 10, 15, "b"), s1)
    tx_write(_df(spark, 0, 5, "z"), s2)
    # s3 deliberately missing: the poisoned pipe

    pipes = {
        "copy1": lambda: pipe_available_now(spark, s1, d1, checkpoint=c1),
        "copy2": lambda: pipe_available_now(spark, s2, d2, checkpoint=c2),
        "broken": lambda: pipe_available_now(spark, s3, d3, checkpoint=c3),
    }
    slept = []
    state = run_pipes(
        pipes, interval=1.0, max_rounds=8, max_failures=2,
        sleep=slept.append,
    )
    # healthy pipes drained everything, in this run
    assert _ids(spark, d1) == list(range(15))
    assert _ids(spark, d2) == list(range(5))
    assert state["copy1"]["versions"] == 2
    assert state["copy2"]["versions"] == 1
    # the poisoned pipe was quarantined after exactly max_failures
    # consecutive failures, and never stalled the others
    assert state["broken"]["status"] == "poisoned"
    assert state["broken"]["failures"] == 2
    assert "FileNotFoundError" in state["broken"]["last_error"]
    assert state["copy1"]["failures"] == 0
    # quiet ticks backed off: the scheduler slept longer than the base
    # interval once every pipe was idle/quarantined
    assert slept and max(slept) > 1.0
    # the dashboard row
    snap = progress_snapshot(spark)
    assert set(snap["pipes"]) == {"copy1", "copy2", "broken"}
    assert snap["pipes"]["broken"]["status"] == "poisoned"

    # operator fixes the cause and restarts the scheduler: the
    # poisoned pipe drains from ITS checkpoint; the healthy pipes'
    # second run consumes nothing (exactly-once across restarts)
    tx_write(_df(spark, 100, 103, "fix"), s3)
    state2 = run_pipes(
        pipes, interval=1.0, max_rounds=2, max_failures=2,
        sleep=lambda _s: None,
    )
    assert _ids(spark, d3) == [100, 101, 102]
    assert state2["broken"]["status"] in ("idle", "draining")
    assert state2["broken"]["versions"] == 1
    assert state2["copy1"]["versions"] == 0  # nothing new: no rewrite
    assert _ids(spark, d1) == list(range(15))
    # new source data keeps flowing on the next rounds
    tx_write(_df(spark, 15, 18, "c"), s1)
    state3 = run_pipes(
        pipes, interval=1.0, max_rounds=1, sleep=lambda _s: None,
    )
    assert state3["copy1"]["versions"] == 1
    assert _ids(spark, d1) == list(range(18))
    assert PIPES_STATUS["copy1"]["versions"] == 1


def test_cdc_pipe_replicates_conditional_merge(spark, tmp_path):
    """Round 14: a CONDITIONAL merge's cdf frame carries 'delete'
    change rows (WHEN MATCHED DELETE) alongside update pre/post and
    inserts — the pipe's delete-then-append replication removes them
    on the sink naturally (their keys are deleted, nothing
    re-appends). sink == source after the clause matrix."""
    from distributed_mapreduce__spark.sources.txlog import tx_merge

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    tx_write(_df(spark, 0, 8, "a"), src)
    pipe_available_now(spark, src, dst, checkpoint=ckpt, cdc_key="id")

    m = _df(spark, 2, 6, "s").unionByName(_df(spark, 20, 22, "s"))
    tx_merge(
        m, src, "id",
        when_matched=[
            {"condition": "t.id % 2 = 0", "set": {"tag": "'even'"}},
            {"action": "delete"},  # odd matched rows die
        ],
        when_not_matched=[{"values": {"id": "s.id", "tag": "'new'"}}],
    )
    pipe_available_now(spark, src, dst, checkpoint=ckpt, cdc_key="id")

    def table(path):
        return {(x.id, x.tag) for x in tx_read(spark, path).collect()}

    expect = {(0, "a"), (1, "a"), (2, "even"), (4, "even"),
              (6, "a"), (7, "a"), (20, "new"), (21, "new")}
    assert table(src) == expect and table(dst) == expect
