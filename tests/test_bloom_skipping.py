"""Per-file bloom-filter data skipping (sources/txlog.py, round 12):
``tx_write(bloom_cols=[...])`` records an m-bit bloom per (file,
column) as KB-scale ``_bloom/`` sidecars named by the commit;
equality reads — ``tx_read(where=(col, v, v))`` — skip every file
whose bloom proves the value absent. The point-lookup complement to
[min, max] stats (useless on high-cardinality UNclustered columns: at
100 TB every file's id range overlaps every lookup). Blooms are pure
optimization — no reader stamp, no writer feature: a build that
ignores them only loses skipping, never correctness, because the
residual filter owns the decision; rewrites recompute coverage
(_rewrite_blooms) so maintenance never degrades it. Hashing is the bucket() canonical-string md5 scheme, so the
driver reproduces the JVM positions exactly."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.sources.txlog import (
    _bloom_positions,
    _replay,
    tx_compact,
    tx_read,
    tx_rename_column,
    tx_vacuum,
    tx_write,
)


@pytest.fixture()
def btable(spark, tmp_path):
    """8 files, ids scattered round-robin so every file's [min, max]
    spans the whole domain — range stats can never skip, only the
    bloom can."""
    t = str(tmp_path / "t")
    df = spark.range(10000).select(
        "id", F.concat(F.lit("user-"), F.col("id")).alias("name")
    )
    tx_write(
        df.repartition(8), t, stats_cols=["id"], bloom_cols=["id", "name"]
    )
    return t


def test_bloom_point_lookup_skips_files(spark, btable):
    hit = tx_read(spark, btable, where=("id", 42, 42))
    assert [r.id for r in hit.collect()] == [42]
    # ids are scattered: min/max can't skip anything, the bloom must
    # (allow 1-2 false-positive files, never the full 8)
    assert 1 <= len(hit.inputFiles()) <= 3
    miss = tx_read(spark, btable, where=("id", 10**12, 10**12))
    assert miss.count() == 0


def test_bloom_string_column(spark, btable):
    hit = tx_read(spark, btable, where=("name", "user-777", "user-777"))
    assert [r.id for r in hit.collect()] == [777]
    assert len(hit.inputFiles()) <= 3
    assert tx_read(
        spark, btable, where=("name", "user-nope", "user-nope")
    ).count() == 0


def test_bloom_never_false_negative(spark, btable):
    # every single value must be found — a bloom can only over-keep
    for v in range(0, 10000, 997):
        got = tx_read(spark, btable, where=("id", v, v)).collect()
        assert [r.id for r in got] == [v], v


def test_bloom_range_conjuncts_ignore_bloom(spark, btable):
    # non-equality conjuncts never consult the bloom
    out = tx_read(spark, btable, where=("id", 100, 110))
    assert out.count() == 11


def test_bloom_composes_with_stats_and_appends(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(1000).select("id")
    tx_write(df, t, stats_cols=["id"], bloom_cols=["id"])
    # an append WITHOUT blooms: its files are always kept
    tx_write(
        spark.range(50000, 51000).select("id"), t, stats_cols=["id"]
    )
    hit = tx_read(spark, t, where=("id", 50042, 50042))
    assert [r.id for r in hit.collect()] == [50042]
    # value only in the bloom-less append: stats pruned the bloomed
    # files (range misses), bloom kept out of the way
    assert tx_read(spark, t, where=("id", 123, 123)).count() == 1


def test_bloom_rewrites_recompute_coverage(spark, btable):
    # compaction recomputes blooms on its outputs (_rewrite_blooms,
    # the bloom analog of _rewrite_stats): the table stays
    # point-lookup-skippable through maintenance
    tx_compact(spark, btable, target_files=4)
    assert [
        r.id for r in tx_read(spark, btable, where=("id", 42, 42)).collect()
    ] == [42]
    miss = tx_read(spark, btable, where=("id", 10**12, 10**12))
    assert miss.count() == 0
    assert len(miss.inputFiles()) == 0  # bloom coverage survived


def test_bloom_merge_preserves_coverage(spark, btable):
    from distributed_mapreduce__spark.sources.txlog import tx_merge

    upd = spark.createDataFrame(
        [(42, "UPDATED")], "id long, name string"
    )
    tx_merge(upd, btable, "id")
    # the rewritten file's bloom was recomputed: a miss still scans
    # zero files, and the updated key is still found
    assert tx_read(
        spark, btable, where=("id", 10**12, 10**12)
    ).count() == 0
    hit = tx_read(spark, btable, where=("id", 42, 42))
    assert [(r.id, r.name) for r in hit.collect()] == [(42, "UPDATED")]
    assert len(hit.inputFiles()) <= 3


def test_bloom_sidecars_survive_vacuum_and_truncation(spark, btable):
    for i in range(12):  # push a checkpoint above the bloom commit
        tx_write(
            spark.range(20000 + i, 20001 + i).select(
                "id", F.lit("x").alias("name")
            ).coalesce(1),
            btable,
            stats_cols=["id"],  # range-prunable, isolating the bloom
        )
    tx_vacuum(spark, btable, retain_last=0)
    assert glob.glob(f"{btable}/_bloom/*.parquet")
    hit = tx_read(spark, btable, where=("id", 42, 42))
    assert [r.id for r in hit.collect()] == [42]
    assert len(hit.inputFiles()) <= 4  # bloom still skipping post-truncation


def test_bloom_orphaned_by_overwrite_swept(spark, btable):
    tx_write(
        spark.range(5).select("id", F.lit("y").alias("name")),
        btable,
        mode="overwrite",
    )
    assert _replay(spark, btable).blooms == []
    deleted = tx_vacuum(spark, btable)
    assert any("_bloom/" in f for f in deleted)
    assert not glob.glob(f"{btable}/_bloom/*.parquet")
    assert tx_read(spark, btable).count() == 5


def test_bloom_on_column_mapped_table(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(
        spark.range(1000).select(
            "id", (F.col("id") % 7).alias("v")
        ).repartition(4),
        t,
        bloom_cols=["id"],
    )
    tx_rename_column(spark, t, "id", "row_id")
    # lookup by the NEW logical name translates to the frozen physical
    # name the bloom is keyed on
    hit = tx_read(spark, t, where=("row_id", 77, 77))
    assert [r.row_id for r in hit.collect()] == [77]
    assert len(hit.inputFiles()) <= 2


def test_bloom_on_partitioned_table(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(3000).select(
        "id", (F.col("id") % 3).alias("k")
    )
    tx_write(df, t, partition_by=["k"], bloom_cols=["id"])
    hit = tx_read(spark, t, where=("id", 1234, 1234))
    assert [r.id for r in hit.collect()] == [1234]
    assert len(hit.inputFiles()) <= 2


def test_bloom_refuses_bad_columns(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(10).select(
        "id",
        F.current_date().alias("d"),
        (F.col("id") % 2).alias("k"),
    )
    with pytest.raises(ValueError, match="integral or string"):
        tx_write(df, t, bloom_cols=["d"])
    with pytest.raises(ValueError, match="identity partition"):
        tx_write(df, t, partition_by=["k"], bloom_cols=["k"])


def test_bloom_nulls_skipped(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(100).select(
        F.when(F.col("id") % 2 == 0, F.col("id")).alias("id")
    )
    tx_write(df.repartition(4), t, bloom_cols=["id"])
    assert tx_read(spark, t, where=("id", 42, 42)).count() == 1
    assert tx_read(spark, t).filter(F.col("id").isNull()).count() == 50


def test_bloom_driver_jvm_hash_parity(spark, tmp_path):
    """The driver twin must reproduce the JVM positions bit-exactly,
    or skipping would turn into false negatives."""
    t = str(tmp_path / "t")
    vals = [0, 1, 42, 2**40, "abc", "user-é中"]
    df = spark.createDataFrame(
        [(str(v),) for v in vals], "s string"
    )
    tx_write(df.coalesce(1), t, bloom_cols=["s"])
    for v in vals:
        got = tx_read(spark, t, where=("s", str(v), str(v)))
        assert got.count() == 1, v


def test_bloom_refines_sparse_merge(spark, btable):
    from distributed_mapreduce__spark.sources.txlog import (
        tx_history,
        tx_merge,
    )

    # 3 existing keys + 1 new: every file's id range overlaps, only
    # blooms can bound the rewrite to the true hit files
    upd = spark.createDataFrame(
        [(42, "UPDATED"), (4242, "UPDATED"), (9999, "UPDATED"),
         (777777, "NEW")],
        "id long, name string",
    )
    tx_merge(upd, btable, "id")
    out = tx_read(spark, btable)
    assert out.count() == 10001
    got = {r.id: r.name for r in out.filter(
        F.col("id").isin([42, 4242, 9999, 777777])).collect()}
    assert got == {42: "UPDATED", 4242: "UPDATED", 9999: "UPDATED",
                   777777: "NEW"}
    merge_commit = [
        h for h in tx_history(spark, btable) if h["action"] == "merge"
    ][-1]
    # without the bloom all 8 overlapping files rewrite; with it only
    # the files actually holding one of the 3 keys (+ rare fp) do
    assert 1 <= merge_commit["n_removed"] <= 4


def test_bloom_refines_sparse_delete(spark, btable):
    from distributed_mapreduce__spark.sources.txlog import (
        tx_delete,
        tx_history,
    )

    keys = spark.createDataFrame([(42,), (4242,)], "id long")
    tx_delete(keys, btable, "id")
    out = tx_read(spark, btable)
    assert out.count() == 9998
    assert out.filter(F.col("id").isin([42, 4242])).count() == 0
    del_commit = [
        h for h in tx_history(spark, btable) if h["action"] == "delete"
    ][-1]
    assert 1 <= del_commit["n_removed"] <= 3


def test_bloom_sidecar_cache_serves_repeat_lookups(spark, btable):
    """ADVICE r12 / VERDICT #8: sidecars are immutable once placed, so
    a session-scoped cache keyed by (path, relpath) makes repeat
    equality reads cost ZERO sidecar I/O. Proven behaviorally: after
    one lookup warms the cache, the physical sidecar files are
    deleted — a second lookup on the same snapshot must still skip."""
    import os

    hit = tx_read(spark, btable, where=("id", 42, 42))
    assert [r.id for r in hit.collect()] == [42]
    for f in glob.glob(f"{btable}/_bloom/*.parquet"):
        os.remove(f)
    hit2 = tx_read(spark, btable, where=("id", 999, 999))
    assert [r.id for r in hit2.collect()] == [999]
    assert len(hit2.inputFiles()) <= 3  # bloom still skipping, from cache


def test_checkpoint_prunes_dead_bloom_refs(spark, btable):
    """ADVICE r12: bloom refs retire at checkpoint time once their
    sidecars describe only DEAD files — otherwise a long-lived table
    reads every historical sidecar on each equality lookup forever.
    Compaction rewrites every live file (recomputing coverage), so the
    original write's sidecar covers nothing live; the next checkpoint
    must drop its ref and keep the compaction's, with skipping and
    correctness intact."""
    from distributed_mapreduce__spark.sources.txlog import (
        _write_checkpoint,
    )

    v = tx_compact(spark, btable, max_input_files=64)
    assert v is not None
    before = _replay(spark, btable)
    assert len(before.blooms) == 2  # original write + compaction recompute
    assert _write_checkpoint(spark, btable, before.version)
    after = _replay(spark, btable)
    assert [b["version"] for b in after.blooms] == [v]
    hit = tx_read(spark, btable, where=("id", 4242, 4242))
    assert [r.id for r in hit.collect()] == [4242]
    assert tx_read(
        spark, btable, where=("id", 10**12, 10**12)
    ).count() == 0
