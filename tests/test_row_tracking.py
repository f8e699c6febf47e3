"""ROW TRACKING (sources/txlog.py, round 13, VERDICT r12 #5): stable
63-bit row ids that survive rewrites. Fresh rows take
``(commit version << 36) + offset`` recorded as per-file BASES in the
commit (id = base + row_index, zero write-time cost beyond a row
count, no cross-writer watermark); preserving rewrites
(compact/zorder/apply_deletes) MATERIALIZE ``_row_id`` into their
outputs (base -1, reader level 5) so the id survives arbitrary
re-binning; content-changing fronts (merge, UPDATE post-images)
assign fresh ids — those are new row versions. Model: Delta's row
tracking (public docs)."""

from __future__ import annotations

import glob
import json

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.sources.txlog import (
    _replay,
    tx_apply_deletes,
    tx_compact,
    tx_delete_where,
    tx_enable_row_tracking,
    tx_merge,
    tx_optimize_zorder,
    tx_read,
    tx_scan_with_row_ids,
    tx_update,
    tx_write,
)


def _df(spark, lo=0, hi=100, tag="x"):
    return spark.range(lo, hi).select(
        "id", F.lit(tag).alias("tag")
    )


def _id_map(spark, path, version=None):
    """{_row_id: (id, tag)} — the tracking invariant under test."""
    return {
        r._row_id: (r.id, r.tag)
        for r in tx_scan_with_row_ids(spark, path, version=version).collect()
    }


@pytest.fixture()
def tracked(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_df(spark).repartition(4), t, stats_cols=["id"])
    tx_enable_row_tracking(spark, t)
    return t


def test_enable_backfills_unique_ids(spark, tracked):
    m = _id_map(spark, tracked)
    assert len(m) == 100  # every row has an id, all distinct
    assert all(v is not None for v in m)
    # idempotent
    v = tx_enable_row_tracking(spark, tracked)
    assert v == _replay(spark, tracked).version
    assert _id_map(spark, tracked) == m


def test_appends_get_fresh_distinct_ids(spark, tracked):
    before = _id_map(spark, tracked)
    tx_write(_df(spark, 1000, 1050, "new").repartition(2), tracked)
    after = _id_map(spark, tracked)
    assert len(after) == 150
    # old rows keep their exact ids
    assert {k: v for k, v in after.items() if k in before} == before
    # new ids come from the append commit's reserved range
    new_ids = set(after) - set(before)
    ver = _replay(spark, tracked).version
    assert all(i >> 36 == ver for i in new_ids)


def test_ids_survive_compaction(spark, tracked):
    for i in range(3):
        tx_write(_df(spark, 1000 + i * 10, 1005 + i * 10, f"a{i}"), tracked)
    before = _id_map(spark, tracked)
    assert tx_compact(spark, tracked, max_input_files=64) is not None
    after = _id_map(spark, tracked)
    assert after == before  # the whole mapping is stable
    # and the commit guards materialized bytes behind reader level 5
    snap = _replay(spark, tracked)
    assert all(
        b == -1
        for f, b in snap.row_bases.items()
        if f in snap.eps
    )


def test_ids_survive_zorder(spark, tracked):
    tx_write(_df(spark, 500, 600, "z").repartition(3), tracked)
    before = _id_map(spark, tracked)
    assert tx_optimize_zorder(spark, tracked, ["id"], n_files=4) is not None
    assert _id_map(spark, tracked) == before


def test_ids_survive_settling_deletes(spark, tracked):
    before = _id_map(spark, tracked)
    victims = {k for k, (i, _) in before.items() if i % 10 == 3}
    tx_delete_where(spark, tracked, "id % 10 = 3")
    # DV phase: victims' ids gone, survivors untouched (no rewrite)
    mid = _id_map(spark, tracked)
    assert set(mid) == set(before) - victims
    # settle: the rewrite must not re-identify the survivors
    tx_apply_deletes(spark, tracked)
    after = _id_map(spark, tracked)
    assert after == {k: v for k, v in before.items() if k not in victims}


def test_cdc_consumer_tracks_one_row_across_rewrites(spark, tracked):
    """The verdict's pin: follow ONE physical row through maintenance
    by id alone."""
    before = _id_map(spark, tracked)
    rid = next(k for k, (i, _) in before.items() if i == 42)
    tx_compact(spark, tracked, max_input_files=64)
    tx_optimize_zorder(spark, tracked, ["id"], n_files=3)
    after = _id_map(spark, tracked)
    assert after[rid] == (42, "x")


def test_update_post_images_get_fresh_ids(spark, tracked):
    before = _id_map(spark, tracked)
    old_ids = {k for k, (i, _) in before.items() if i % 10 == 7}
    tx_update(spark, tracked, "id % 10 = 7", {"tag": "'upd'"})
    after = _id_map(spark, tracked)
    # pre-image ids retired with the DV; post-images are NEW rows
    assert not (old_ids & set(after))
    upd = {k: v for k, v in after.items() if v[1] == "upd"}
    assert len(upd) == 10
    # untouched rows keep their ids exactly
    keep = {k: v for k, v in before.items() if k not in old_ids}
    assert {k: v for k, v in after.items() if v[1] != "upd"} == keep


def test_merge_rewrites_reassign_only_touched(spark, tmp_path):
    t = str(tmp_path / "t")
    # range-clustered files so the key-targeted merge touches ONE file
    tx_write(
        _df(spark).repartitionByRange(4, "id"), t, stats_cols=["id"]
    )
    tx_enable_row_tracking(spark, t)
    before = _id_map(spark, t)
    upd = spark.createDataFrame([(5, "merged")], "id long, tag string")
    tx_merge(upd, t, "id")
    after = _id_map(spark, t)
    # the merged-in row exists under a fresh id
    assert "merged" in {v[1] for v in after.values()}
    # rows in untouched FILES keep their ids (at least half the table)
    stable = {k for k in before if k in after and before[k] == after[k]}
    assert len(stable) >= 50


def test_time_travel_reads_ids_below_rewrites(spark, tracked):
    before = _id_map(spark, tracked)
    v0 = _replay(spark, tracked).version
    tx_compact(spark, tracked, max_input_files=64)
    assert _id_map(spark, tracked, version=v0) == before


def test_untracked_and_reserved_refusals(spark, tmp_path):
    t = str(tmp_path / "plain")
    tx_write(_df(spark), t)
    with pytest.raises(ValueError, match="not enabled"):
        tx_scan_with_row_ids(spark, t)
    with pytest.raises(ValueError, match="reserved"):
        tx_write(
            spark.range(3).select(
                "id", F.lit(1).alias("_row_id")
            ),
            t,
        )


def test_plain_reads_never_surface_row_id(spark, tracked):
    tx_compact(spark, tracked, max_input_files=64)  # materializes
    out = tx_read(spark, tracked)
    assert "_row_id" not in out.columns
    assert out.count() == 100
    # raw bytes DO carry the column (that's what level 5 guards)
    raw = (
        spark.read.option("mergeSchema", "true")
        .parquet(*glob.glob(f"{tracked}/data/*.parquet"))
    )
    assert "_row_id" in raw.columns


def test_tracking_on_mapped_partitioned_table(spark, tmp_path):
    """Cross-feature: row ids on a column-mapped, hive-partitioned
    table — bases ride the same fold, ids survive compaction, and the
    rename changes nothing."""
    from distributed_mapreduce__spark.sources.txlog import (
        tx_rename_column,
    )

    t = str(tmp_path / "t")
    df = spark.range(90).select(
        "id", (F.col("id") % 3).alias("k"), F.lit("x").alias("tag")
    )
    tx_write(df, t, partition_by=["k"], stats_cols=["id"])
    tx_rename_column(spark, t, "tag", "label")
    tx_enable_row_tracking(spark, t)
    before = _id_map_cols(spark, t)
    assert len(before) == 90
    tx_compact(spark, t, max_input_files=64)
    assert _id_map_cols(spark, t) == before


def _id_map_cols(spark, path):
    return {
        r["_row_id"]: tuple(
            r[c] for c in ("id", "label", "k")
        )
        for r in tx_scan_with_row_ids(spark, path).collect()
    }


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_checkpoint_and_vacuum_keep_bases(spark, tracked, tmp_path):
    from distributed_mapreduce__spark.sources.txlog import (
        _write_checkpoint,
        tx_vacuum,
    )

    before = _id_map(spark, tracked)
    for i in range(12):
        tx_write(_df(spark, 2000 + i, 2001 + i, "c").coalesce(1), tracked)
    mid = _id_map(spark, tracked)
    _write_checkpoint(spark, tracked, _replay(spark, tracked).version)
    tx_vacuum(spark, tracked, retain_last=0)
    after = _id_map(spark, tracked)
    assert after == mid
    assert {k: v for k, v in after.items() if k in before} == before


def test_enable_conflicts_with_concurrent_append(
    spark, tmp_path, monkeypatch
):
    """A write in flight while row tracking is being enabled must not
    slip through id-less: the write's commit-time revalidation catches
    the feature appearing after its planning."""
    from distributed_mapreduce__spark.sources import txlog

    t = str(tmp_path / "t")
    tx_write(_df(spark), t)
    real_stage = txlog._stage_and_place
    fired = {}

    def stage_with_concurrent_enable(df, path, partition_by=None):
        out = real_stage(df, path, partition_by)
        if "done" not in fired:
            fired["done"] = True
            tx_enable_row_tracking(spark, path)
        return out

    monkeypatch.setattr(
        txlog, "_stage_and_place", stage_with_concurrent_enable
    )
    with pytest.raises(RuntimeError, match="row tracking was enabled"):
        tx_write(_df(spark, 200, 210), t)


def test_restore_keeps_or_mints_ids(spark, tracked):
    from distributed_mapreduce__spark.sources.txlog import tx_restore

    before = _id_map(spark, tracked)
    v_tracked = _replay(spark, tracked).version
    tx_write(_df(spark, 3000, 3010, "later"), tracked)
    tx_compact(spark, tracked, max_input_files=64)
    # restore to the post-enable snapshot: the exact id map returns
    tx_restore(spark, tracked, version=v_tracked)
    assert _id_map(spark, tracked) == before
    # restore to the PRE-enable snapshot: those files predate the
    # backfill, so the contract (non-null, unique) holds via fresh
    # bases minted in the restore commit
    tx_restore(spark, tracked, version=0)
    m = _id_map(spark, tracked)
    assert len(m) == 100
    assert sorted(i for i, _ in m.values()) == list(range(100))


def test_clone_preserves_row_identity(spark, tracked, tmp_path):
    from distributed_mapreduce__spark.sources.txlog import tx_clone

    tx_compact(spark, tracked, max_input_files=64)  # materialized ids
    tx_write(_df(spark, 500, 520, "post"), tracked)  # base-tracked ids
    src_map = _id_map(spark, tracked)
    dst = str(tmp_path / "clone")
    tx_clone(spark, tracked, dst)
    # the clone sees the SAME stable ids for the same rows
    assert _id_map(spark, dst) == src_map
    # and is independently tracked from its first own write
    tx_write(_df(spark, 9000, 9005, "clone-own"), dst)
    m = _id_map(spark, dst)
    assert len(m) == len(src_map) + 5
    assert {k: v for k, v in m.items() if k in src_map} == src_map


def test_id_scan_prunes_like_tx_read(spark, tmp_path):
    """where= on the id scan: log-stats pruning + residual filters,
    identical file-skipping behavior to tx_read."""
    t = str(tmp_path / "t")
    for lo in (0, 1000, 2000):
        tx_write(
            spark.range(lo, lo + 50).select(
                "id", F.lit(f"b{lo}").alias("tag")
            ).coalesce(1),
            t, stats_cols=["id"],
        )
    tx_enable_row_tracking(spark, t)
    hit = tx_scan_with_row_ids(spark, t, where=("id", 1005, 1010))
    rows = hit.collect()
    assert sorted(r.id for r in rows) == list(range(1005, 1011))
    assert all(r._row_id is not None for r in rows)
    assert len(hit.inputFiles()) == 1  # only the middle commit's file


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_cdc_feed_keyed_on_row_ids(spark, tmp_path):
    """tx_changes_cdf(with_row_ids=True): the change feed keyed on
    STABLE ids. A consumer maintaining {id: row} from the frames alone
    — inserts add, delete frames retire ids, update frames retire
    pre-ids and add post-ids — must converge to exactly the id scan
    of the final table, across appends, a cdf=False DV delete (ids
    reconstructed purely from coordinates), a DV update, and a
    compaction (a no-op frame that must not disturb identity)."""
    from distributed_mapreduce__spark.sources.txlog import (
        tx_changes_cdf,
    )

    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 60).repartition(3), t, stats_cols=["id"])
    tx_enable_row_tracking(spark, t)
    v_enable = _replay(spark, t).version
    tx_write(_df(spark, 100, 120, "batch2"), t)
    tx_delete_where(spark, t, "id % 5 = 0", cdf=False)
    tx_update(spark, t, "id % 7 = 1", {"tag": "'patched'"})
    tx_apply_deletes(spark, t)  # settle, then compact: no-op frames
    tx_compact(spark, t, max_input_files=64)

    state = dict(_id_map(spark, t, version=v_enable))
    for v, kind, df in tx_changes_cdf(
        spark, t, since_version=v_enable, with_row_ids=True
    ):
        if df is None:
            continue
        rows = df.collect()
        assert all(r._row_id is not None for r in rows), (v, kind)
        if kind == "insert":
            for r in rows:
                assert r._row_id not in state
                state[r._row_id] = (r.id, r.tag)
        elif kind == "delete":
            for r in rows:
                del state[r._row_id]  # KeyError = wrong identity
        elif kind == "cdf":
            for r in rows:
                if r._change_type == "update_preimage":
                    del state[r._row_id]
            for r in rows:
                if r._change_type == "update_postimage":
                    assert r._row_id not in state
                    state[r._row_id] = (r.id, r.tag)
    assert state == _id_map(spark, t)


def test_cdc_feed_merge_frames_id_complete(spark, tmp_path):
    """Round 14 upgraded the merge-frame contract: sidecars
    materialize pre-image ids at commit time and the feed
    reconstructs post ids from the commit's own bases — merge frames
    are ID-COMPLETE on tracked tables (they were honestly NULL-id
    through round 13). Untracked tables still refuse the flag, and
    PRE-round-14 sidecars (no _row_id column) still yield NULL ids."""
    from distributed_mapreduce__spark.sources.txlog import (
        tx_changes_cdf,
        tx_scan_with_row_ids,
    )

    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 30), t, stats_cols=["id"])
    tx_enable_row_tracking(spark, t)
    pre = {r.id: r._row_id for r in tx_scan_with_row_ids(spark, t).collect()}
    v0 = _replay(spark, t).version
    tx_merge(
        spark.createDataFrame([(5, "merged")], "id long, tag string"),
        t, "id",
    )
    post = {r.id: r._row_id for r in tx_scan_with_row_ids(spark, t).collect()}
    frames = [
        (v, kind, df)
        for v, kind, df in tx_changes_cdf(
            spark, t, since_version=v0, with_row_ids=True
        )
        if df is not None
    ]
    assert [k for _, k, _ in frames] == ["cdf"]
    got = {
        r._change_type: r._row_id for r in frames[0][2].collect()
    }
    assert got == {
        "update_preimage": pre[5],
        "update_postimage": post[5],
    }
    # legacy sidecar (simulate pre-r14: sidecars carried no _row_id
    # column) -> the feed falls back to NULL ids, loudly-typed.
    # Simulated under FRESH file names + a rewritten commit ref (an
    # in-place byte rewrite trips Spark's cached file metadata)
    import glob as _glob
    import json as _json
    import os as _os

    import pyarrow.parquet as _pq

    merge_cj = None
    for cj in sorted(_glob.glob(f"{t}/_txlog/*.json")):
        c = _json.load(open(cj))
        if c.get("action") == "merge":
            merge_cj = cj
            break
    assert merge_cj is not None
    c = _json.load(open(merge_cj))
    legacy = []
    for rel in c["cdf"]["files"]:
        tbl = _pq.read_table(_os.path.join(t, rel))
        new_rel = rel.replace(".parquet", "legacy.parquet")
        _pq.write_table(
            # drop the embedded spark row.metadata too — it would
            # otherwise resurrect the dropped column as nulls
            tbl.drop_columns(["_row_id"]).replace_schema_metadata(None),
            _os.path.join(t, new_rel),
        )
        legacy.append(new_rel)
    c["cdf"]["files"] = legacy
    c["cdf"].pop("keys_phys", None)
    with open(merge_cj, "w") as fh:
        _json.dump(c, fh)
    frames2 = [
        df
        for _v, kind, df in tx_changes_cdf(
            spark, t, since_version=v0, with_row_ids=True
        )
        if df is not None and kind == "cdf"
    ]
    assert all(
        r._row_id is None for fdf in frames2 for r in fdf.collect()
    )
    # untracked tables refuse the flag
    t2 = str(tmp_path / "plain")
    tx_write(_df(spark, 0, 5), t2)
    with pytest.raises(ValueError, match="row tracking"):
        list(tx_changes_cdf(spark, t2, with_row_ids=True))
