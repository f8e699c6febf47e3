"""UPDATE ... SET ... WHERE (sources/txlog.py tx_update, round 12):
the deletion-vector UPDATE — one atomic commit marks matched rows'
positions as a KB-scale DV and appends files carrying only the
rewritten rows, so the write is sized by the MATCHED rows, not the
touched files (Delta's DV-update economics; copy-on-write mode keeps
the classic rewrite). SQL NULL semantics, type-preserving assignments
enforced, CHECK constraints on post-images, partition re-placement
when an assignment moves a row's partition, CDF pre/post images."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.sources.txlog import (
    _replay,
    tx_add_constraint,
    tx_apply_deletes,
    tx_changes_cdf,
    tx_delete,
    tx_delete_where,
    tx_read,
    tx_rename_column,
    tx_update,
    tx_write,
)


def _df(spark):
    return spark.range(1000).select(
        "id", (F.col("id") % 10).alias("v"), F.lit("x").alias("tag")
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_df(spark).repartition(4), t, stats_cols=["id"])
    return t


def test_update_mor_basics(spark, table):
    before = set(_replay(spark, table).eps)
    ver = tx_update(
        spark, table, "v = 3", {"tag": "'updated'", "v": "v + 100"}
    )
    out = tx_read(spark, table)
    assert out.count() == 1000
    assert out.filter("v = 103 and tag = 'updated'").count() == 100
    assert out.filter("v = 3").count() == 0
    assert out.filter("tag = 'x'").count() == 900
    snap = _replay(spark, table)
    # no file REMOVED: originals stay live under a DV, updates appended
    assert before <= set(snap.eps)
    assert [d["version"] for d in snap.dv] == [ver]
    assert tx_read(spark, table, version=ver - 1).filter(
        "v = 3"
    ).count() == 100


def test_update_null_condition_rows_untouched(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(10).select(
        "id", F.when(F.col("id") < 5, F.col("id")).alias("v")
    )
    tx_write(df.coalesce(1), t)
    tx_update(spark, t, "v < 3", {"id": "id + 1000"})
    out = tx_read(spark, t)
    assert out.filter("id >= 1000").count() == 3  # v in {0,1,2}
    assert out.filter(F.col("v").isNull()).count() == 5  # NULLs survive


def test_update_settles_like_a_delete(spark, table):
    tx_update(spark, table, "v = 3", {"v": "v + 100"})
    sv = tx_apply_deletes(spark, table)
    assert sv is not None
    out = tx_read(spark, table)
    assert out.count() == 1000
    assert out.filter("v = 103").count() == 100
    assert _replay(spark, table).dv == []


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_update_cow_parity_and_dv_refusal(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for t in (a, b):
        tx_write(_df(spark).repartition(4), t)
    tx_update(spark, a, "v = 3", {"tag": "'u'"})
    tx_update(spark, b, "v = 3", {"tag": "'u'"}, mode="copy_on_write")
    ra = {tuple(r) for r in tx_read(spark, a).collect()}
    rb = {tuple(r) for r in tx_read(spark, b).collect()}
    assert ra == rb
    # CoW refuses while a DV is live; MOR mode stacks
    with pytest.raises(ValueError, match="deletion vectors"):
        tx_update(spark, a, "v = 4", {"tag": "'w'"}, mode="copy_on_write")
    tx_update(spark, a, "v = 4", {"tag": "'w'"})
    assert tx_read(spark, a).filter("tag = 'w'").count() == 100


def test_update_moves_rows_across_partitions(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(300).select(
        "id", (F.col("id") % 3).alias("k")
    )
    tx_write(df, t, partition_by=["k"])
    tx_update(spark, t, "k = 2", {"k": "CAST(0 AS BIGINT)"})
    out = tx_read(spark, t)
    assert out.filter("k = 2").count() == 0
    assert out.filter("k = 0").count() == 200
    # partition pruning on the NEW placement finds the moved rows
    pruned = tx_read(spark, t, where=("k", 0, 0))
    assert pruned.count() == 200
    assert all("k=2" not in f or "k=0" in f for f in pruned.inputFiles())


def test_update_refusals(spark, table):
    with pytest.raises(ValueError, match="not in the table"):
        tx_update(spark, table, "v = 1", {"nope": "1"})
    with pytest.raises(ValueError, match="change column types"):
        tx_update(spark, table, "v = 1", {"tag": "CAST(1 AS INT)"})
    with pytest.raises(ValueError, match="at least one SET"):
        tx_update(spark, table, "v = 1", {})
    tx_delete(
        spark.range(3).select("id"), table, "id", mode="merge_on_read"
    )
    with pytest.raises(ValueError, match="equality tombstones"):
        tx_update(spark, table, "v = 1", {"tag": "'u'"})


def test_update_respects_check_constraints(spark, table):
    tx_add_constraint(spark, table, "v_bound", "v < 50")
    with pytest.raises(ValueError, match="v_bound"):
        tx_update(spark, table, "v = 3", {"v": "v + 100"})
    tx_update(spark, table, "v = 3", {"v": "v + 10"})  # 13 < 50: fine
    assert tx_read(spark, table).filter("v = 13").count() == 100


def test_update_txn_idempotence_and_noop(spark, table):
    v1 = tx_update(spark, table, "v = 3", {"tag": "'u'"}, txn="job-u")
    v2 = tx_update(spark, table, "v = 3", {"tag": "'u'"}, txn="job-u")
    assert v1 == v2
    assert tx_read(spark, table).filter("tag = 'u'").count() == 100
    nv = tx_update(spark, table, "v = 99", {"tag": "'z'"})
    assert all(
        df is None
        for _, _, df in tx_changes_cdf(spark, table, since_version=nv - 1)
    )


def test_update_cdf_pre_and_post_images(spark, table):
    ver = tx_update(spark, table, "v = 3", {"v": "v + 100"})
    frames = {
        v: (k, df)
        for v, k, df in tx_changes_cdf(spark, table, since_version=ver - 1)
    }
    kind, df = frames[ver]
    assert kind == "cdf"
    counts = {r["_change_type"]: r["count"] for r in
              df.groupBy("_change_type").count().collect()}
    assert counts == {"update_preimage": 100, "update_postimage": 100}
    pre = df.filter("_change_type = 'update_preimage'")
    post = df.filter("_change_type = 'update_postimage'")
    assert pre.filter("v = 3").count() == 100
    assert post.filter("v = 103").count() == 100
    # cdf=False: the honest reprocess contract
    v2 = tx_update(spark, table, "v = 5", {"v": "v + 100"}, cdf=False)
    with pytest.raises(ValueError, match="reprocess"):
        list(tx_changes_cdf(spark, table, since_version=v2 - 1))


def test_update_on_column_mapped_table(spark, table):
    tx_rename_column(spark, table, "v", "bucket_v")
    tx_update(spark, table, "bucket_v = 3", {"bucket_v": "bucket_v + 100"})
    out = tx_read(spark, table)
    assert out.filter("bucket_v = 103").count() == 100
    assert out.filter("bucket_v = 3").count() == 0


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_update_stacks_on_live_delete_dv(spark, table):
    tx_delete_where(spark, table, "v = 9")
    tx_update(spark, table, "v = 3", {"v": "v + 100"})
    out = tx_read(spark, table)
    assert out.count() == 900
    assert out.filter("v = 9").count() == 0
    assert out.filter("v = 103").count() == 100
    # a second update never resurrects or re-marks deleted coordinates
    tx_update(spark, table, "v = 103", {"v": "v + 1"})
    assert tx_read(spark, table).filter("v = 104").count() == 100


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_update_replicates_through_cdc_pipe(spark, tmp_path):
    """An UPDATE's cdf frame (pre+post images) drives the pipe's
    delete-then-append upsert: the replica converges to the source —
    including when the update CHANGES the cdc key itself (the delete
    covers pre AND post keys, the append lands the post rows)."""
    from distributed_mapreduce__spark.streaming.table_stream import (
        pipe_available_now,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ck = str(tmp_path / "ck")
    tx_write(_df(spark).coalesce(2), src)
    pipe_available_now(spark, src, dst, checkpoint=ck, cdc_key="id")
    tx_update(spark, src, "v = 3", {"tag": "'u'"})
    tx_update(spark, src, "v = 4", {"id": "id + 10000"})  # key change
    pipe_available_now(spark, src, dst, checkpoint=ck, cdc_key="id")
    a = {tuple(r) for r in tx_read(spark, src).collect()}
    b = {tuple(r) for r in tx_read(spark, dst).collect()}
    assert a == b and len(a) == 1000


def test_update_conflicts_with_concurrent_overlapping_dv(
    spark, table, monkeypatch
):
    """ADVICE r12: two merge-on-read writers planning DVs from the same
    snapshot against the SAME files are a write-write conflict — both
    chose positions against the same pre-image rows (a racing DELETE's
    victims would be resurrected as our UPDATE's post-images). The
    second committer must abort, mirroring _commit_rewrite's
    planned-DV rule. Simulated by injecting a real tx_delete_where
    between the update's planning and its commit."""
    from distributed_mapreduce__spark.sources import txlog

    real_stage = txlog._stage_dv
    fired = {}

    def stage_with_concurrent_delete(pos, path):
        if "done" not in fired:
            fired["done"] = True
            # the racing DELETE lands a DV on the same files v=3 lives in
            tx_delete_where(spark, path, "v = 4")
        return real_stage(pos, path)

    monkeypatch.setattr(txlog, "_stage_dv", stage_with_concurrent_delete)
    with pytest.raises(RuntimeError, match="concurrent delete/update"):
        tx_update(spark, table, "v = 3", {"tag": "'updated'"})


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_update_commutes_with_disjoint_concurrent_dv(
    spark, tmp_path, monkeypatch
):
    """The flip side: DVs on DISJOINT files commute (position marks on
    different files), so a concurrent delete over other partitions'
    files must NOT abort the update — both commits land."""
    from distributed_mapreduce__spark.sources import txlog

    t = str(tmp_path / "t")
    # partition by v so each v value lives in its own files
    tx_write(_df(spark), t, partition_by=["v"], stats_cols=["id"])

    real_stage = txlog._stage_dv
    fired = {}

    def stage_with_disjoint_delete(pos, path):
        if "done" not in fired:
            fired["done"] = True
            tx_delete_where(spark, path, "v = 7")
        return real_stage(pos, path)

    monkeypatch.setattr(txlog, "_stage_dv", stage_with_disjoint_delete)
    tx_update(spark, t, "v = 3", {"tag": "'updated'"})
    out = tx_read(spark, t)
    assert out.filter("v = 7").count() == 0
    assert out.filter("tag = 'updated'").count() == 100
    assert out.count() == 900
