"""Partitioned transactional tables (sources/txlog.py, round 11):
hive-style layout under data/, per-file partition values recorded in
the commit log as [v, v] stat ranges, log-only partition pruning
(files outside the predicate's partitions never open — pinned via
inputFiles), partition-consistency enforcement, typed partition
columns (no path-string inference corruption), and partition-wise
maintenance. The standard 100 TB layout contract (Delta/Iceberg
partitioned tables), VERDICT r10 prescription #1."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.sources.txlog import (
    tx_compact,
    tx_delete,
    tx_maintain,
    tx_merge,
    tx_read,
    tx_restore,
    tx_vacuum,
    tx_write,
    _snapshot_files,
)


def _pdf(spark, lo, hi, tag="a"):
    """ids lo..hi with k = id // 100 — partitions are id-ranges, so a
    key predicate maps cleanly onto partitions."""
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") / 100).cast("long").alias("k"),
        F.lit(tag).alias("tag"),
    )


@pytest.fixture()
def ptable(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_pdf(spark, 0, 300), t, partition_by=["k"], stats_cols=["id"])
    return t


def test_roundtrip_and_hive_layout(spark, ptable):
    df = tx_read(spark, ptable)
    assert set(df.columns) == {"id", "k", "tag"}
    rows = {r.id: r.k for r in df.collect()}
    assert len(rows) == 300
    assert rows[0] == 0 and rows[150] == 1 and rows[299] == 2
    # files physically live under hive partition dirs
    files, _ = _snapshot_files(spark, ptable)
    assert files and all("/k=" in f or f.startswith("data/k=") for f in files)
    assert os.path.isdir(f"{ptable}/data/k=0")


def test_partition_column_stays_typed(spark, ptable):
    assert dict(tx_read(spark, ptable).dtypes)["k"] == "bigint"


def test_string_partition_value_no_inference_corruption(spark, tmp_path):
    """Path-string inference would read partition dir k=00 as int 0;
    the recorded table schema must keep it the string '00'."""
    t = str(tmp_path / "s")
    df = spark.createDataFrame(
        [(1, "00"), (2, "07"), (3, "10")], "id long, k string"
    )
    tx_write(df, t, partition_by=["k"])
    got = {r.id: r.k for r in tx_read(spark, t).collect()}
    assert got == {1: "00", 2: "07", 3: "10"}
    assert dict(tx_read(spark, t).dtypes)["k"] == "string"


def test_partition_pruning_files_never_open(spark, ptable):
    """The IO pin: a read filtered to one partition's value range must
    hand Spark ONLY that partition's files — pruning happens from the
    log before the scan exists (zero file I/O for pruned partitions)."""
    pruned = tx_read(spark, ptable, where=("k", 1, 1))
    opened = pruned.inputFiles()
    assert opened and all("/k=1/" in f for f in opened)
    # and composes with a second conjunct on a data column
    both = tx_read(spark, ptable, where=[("k", 1, 1), ("id", 150, 159)])
    assert {r.id for r in both.collect()} == set(range(150, 160))
    assert all("/k=1/" in f for f in both.inputFiles())


def test_append_inherits_layout_and_mismatch_refused(spark, ptable):
    tx_write(_pdf(spark, 300, 350, "b"), ptable)  # inherits k-layout
    files, _ = _snapshot_files(spark, ptable)
    assert any("k=3" in f for f in files)
    assert tx_read(spark, ptable).count() == 350
    # partition pruning covers the inherited append too
    assert all(
        "/k=3/" in f
        for f in tx_read(spark, ptable, where=("k", 3, 3)).inputFiles()
    )
    with pytest.raises(ValueError, match="does not match the table's"):
        tx_write(_pdf(spark, 400, 410), ptable, partition_by=["tag"])


def test_merge_touches_only_overlapping_partitions(spark, ptable):
    """A keyed merge on a partition-aligned table rewrites only the
    partitions whose recorded ranges overlap the update keys; every
    other partition's files are untouched metadata."""
    before = set(_snapshot_files(spark, ptable)[0])
    updates = _pdf(spark, 150, 160, "upd")
    tx_merge(updates, ptable, "id")
    after = set(_snapshot_files(spark, ptable)[0])
    untouched_before = {f for f in before if "k=0" in f or "k=2" in f}
    assert untouched_before <= after  # k=0 / k=2 files survive verbatim
    # something in k=1 was rewritten, and ONLY k=1 files were removed
    # (id stats prune even finer than the partition boundary)
    removed = before - after
    assert removed and all("k=1" in f for f in removed)
    rows = {r.id: r.tag for r in tx_read(spark, ptable).collect()}
    assert len(rows) == 300
    assert all(rows[i] == "upd" for i in range(150, 160))
    assert rows[149] == "a" and rows[160] == "a"
    # rewritten files landed back inside hive partition dirs
    assert all("k=" in f for f in after)


def test_delete_prunes_partitions_and_keeps_layout(spark, ptable):
    before = set(_snapshot_files(spark, ptable)[0])
    keys = spark.range(250, 260).select(F.col("id"))
    tx_delete(keys, ptable, "id")
    after = set(_snapshot_files(spark, ptable)[0])
    assert {f for f in before if "k=0" in f or "k=1" in f} <= after
    ids = sorted(r.id for r in tx_read(spark, ptable).collect())
    assert ids == [i for i in range(300) if not (250 <= i < 260)]
    # pruning still works post-rewrite (partition stats re-recorded)
    assert all(
        "/k=2/" in f
        for f in tx_read(spark, ptable, where=("k", 2, 2)).inputFiles()
    )


def test_compact_preserves_partition_dirs_and_rows(spark, ptable):
    tx_write(_pdf(spark, 0, 300, "later"), ptable)  # fragment it
    before = tx_read(spark, ptable).groupBy("k", "tag").count().collect()
    assert tx_compact(spark, ptable, target_files=1) is not None
    after = tx_read(spark, ptable).groupBy("k", "tag").count().collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
    files, _ = _snapshot_files(spark, ptable)
    assert all("k=" in f for f in files)
    # pruning still intact after compaction
    assert all(
        "/k=0/" in f
        for f in tx_read(spark, ptable, where=("k", 0, 0)).inputFiles()
    )


def test_overwrite_resets_partitioning(spark, ptable):
    tx_write(
        _pdf(spark, 0, 10, "flat"), ptable, mode="overwrite"
    )  # no partition_by: layout resets
    files, _ = _snapshot_files(spark, ptable)
    assert all("k=" not in f for f in files)
    assert tx_read(spark, ptable).count() == 10
    # and appends now inherit the UNpartitioned layout
    tx_write(_pdf(spark, 10, 20, "flat"), ptable)
    assert tx_read(spark, ptable).count() == 20


def test_restore_restores_partitioning(spark, ptable):
    v0 = 0
    tx_write(_pdf(spark, 0, 10, "flat"), ptable, mode="overwrite")
    tx_restore(spark, ptable, v0)
    df = tx_read(spark, ptable)
    assert df.count() == 300
    assert all(
        "/k=1/" in f
        for f in tx_read(spark, ptable, where=("k", 1, 1)).inputFiles()
    )


def test_vacuum_sweeps_nested_orphans(spark, ptable):
    import shutil

    src = glob.glob(f"{ptable}/data/k=0/*.parquet")[0]
    shutil.copy(src, f"{ptable}/data/k=0/orphan.parquet")
    deleted = tx_vacuum(spark, ptable)
    assert any(d.endswith("k=0/orphan.parquet") for d in deleted)
    assert tx_read(spark, ptable).count() == 300


def test_maintain_on_partitioned_table(spark, ptable):
    tx_write(_pdf(spark, 0, 300, "x"), ptable)
    tx_write(_pdf(spark, 0, 300, "y"), ptable)
    report = tx_maintain(spark, ptable, max_live_files=6, compact_target=3)
    assert report["files_after"] <= report["files_before"]
    assert tx_read(spark, ptable).count() == 900
    files, _ = _snapshot_files(spark, ptable)
    assert all("k=" in f for f in files)


def test_clone_of_partitioned_source(spark, ptable, tmp_path):
    """Shallow clone of a PARTITIONED table (round-11 standing-gap
    lift): zero data copied, partition columns reconstruct across the
    mixed live set (absolute source refs + clone-local appends, each
    scanned under its own basePath), pruning still skips partitions on
    BOTH sides of the mix, and a rewrite localizes the source refs."""
    from distributed_mapreduce__spark.sources.txlog import (
        tx_clone,
        _snapshot_files,
    )

    c = str(tmp_path / "c")
    tx_clone(spark, ptable, c)
    # parity read: clone sees the source's rows, with partition column
    assert {r.id: r.k for r in tx_read(spark, c).collect()} == {
        r.id: r.k for r in tx_read(spark, ptable).collect()
    }
    # zero data under the clone's own data/ yet
    assert not glob.glob(f"{c}/data/**/*.parquet", recursive=True)
    # clone-local append inherits the hive layout (partition_by
    # carried by the seed commit)
    tx_write(_pdf(spark, 300, 400, "clone"), c)
    assert os.path.isdir(f"{c}/data/k=3")
    got = tx_read(spark, c)
    assert got.count() == 400
    assert {r.k for r in got.select("k").distinct().collect()} == {0, 1, 2, 3}
    # partition pruning spans the root mix: k=3 opens only clone-local
    # files, k=0 only source files
    opened = tx_read(spark, c, where=("k", 3, 3)).inputFiles()
    assert opened and all("/k=3/" in f and f"{tmp_path}/c/" in f.replace("file:", "") for f in opened)
    opened = tx_read(spark, c, where=("k", 0, 0)).inputFiles()
    assert opened and all("/k=0/" in f and f"{tmp_path}/t/" in f.replace("file:", "") for f in opened)
    # source unaffected by the clone's append
    assert tx_read(spark, ptable).count() == 300
    # a rewrite on the clone replaces source refs with clone-local
    # partitioned files and never touches the source's data
    src_files_before = set(_snapshot_files(spark, ptable)[0])
    tx_compact(spark, c, target_files=2)
    files, _ = _snapshot_files(spark, c)
    assert files and all(f.startswith("data/k=") for f in files)
    assert tx_read(spark, c).count() == 400
    assert set(_snapshot_files(spark, ptable)[0]) == src_files_before
    assert tx_read(spark, ptable).count() == 300


def test_change_feed_reconstructs_partition_columns(spark, ptable):
    """tx_changes on a partitioned table must deliver the partition
    column (the file bytes don't carry it)."""
    from distributed_mapreduce__spark.sources.txlog import tx_changes

    v = tx_write(_pdf(spark, 300, 310, "new"), ptable)
    df, cursor = tx_changes(spark, ptable, v - 1)
    assert cursor == v
    rows = {r.id: r.k for r in df.collect()}
    assert rows == {i: 3 for i in range(300, 310)}


def test_cdf_sidecar_carries_partition_column(spark, ptable):
    from distributed_mapreduce__spark.sources.txlog import tx_changes_cdf

    v = tx_merge(_pdf(spark, 150, 152, "upd"), ptable, "id")
    frames = [
        (kind, df) for _, kind, df in tx_changes_cdf(spark, ptable, v - 1)
    ]
    assert frames[0][0] == "cdf"
    cdf = frames[0][1]
    assert "k" in cdf.columns
    assert {
        r.k
        for r in cdf.filter(
            F.col("_change_type") == "update_preimage"
        ).collect()
    } == {1}


def test_partition_evolution_metadata_only(spark, ptable):
    """Iceberg-style partition evolution (round 11 late): changing the
    spec rewrites nothing; appends adopt the new layout; reads
    reconstruct BOTH layouts typed (old partition columns from paths,
    new ones from bytes, and vice versa); pruning on the old partition
    column keeps skipping old files; rewrites migrate survivors to the
    current spec; evolving to [] un-partitions future writes."""
    from distributed_mapreduce__spark.sources.txlog import (
        tx_set_partitioning,
        _snapshot_files,
    )

    files0, v0 = _snapshot_files(spark, ptable)
    v = tx_set_partitioning(spark, ptable, ["tag"])
    assert v == v0 + 1
    assert _snapshot_files(spark, ptable)[0] == files0  # zero rewrite
    # appends land under the NEW spec
    tx_write(_pdf(spark, 300, 400, "b"), ptable)
    assert os.path.isdir(f"{ptable}/data/tag=b")
    got = tx_read(spark, ptable)
    assert got.count() == 400
    rows = {r.id: (r.k, r.tag) for r in got.collect()}
    assert rows[0] == (0, "a") and rows[350] == (3, "b")
    # pruning on the OLD partition column: old files outside k=0 never
    # open; new-spec files lack k stats, so they are kept (and the
    # residual filter handles them) — correctness never depends on it
    pruned = tx_read(spark, ptable, where=("k", 0, 0))
    assert pruned.count() == 100
    assert not any(
        "/k=1/" in f or "/k=2/" in f for f in pruned.inputFiles()
    )
    # pruning on the NEW partition column skips nothing old (no tag
    # stats there) but stays correct
    assert tx_read(spark, ptable, where=("tag", "b", "b")).count() == 100
    # rewrites adopt the current spec: compaction migrates the layout
    tx_compact(spark, ptable, target_files=2)
    files2, _ = _snapshot_files(spark, ptable)
    assert files2 and all("tag=" in f for f in files2)
    assert tx_read(spark, ptable).count() == 400
    assert {
        r.id: (r.k, r.tag) for r in tx_read(spark, ptable).collect()
    }[0] == (0, "a")
    # evolve to flat: future writes un-partition, old layouts still read
    tx_set_partitioning(spark, ptable, [])
    tx_write(_pdf(spark, 400, 410, "c"), ptable)
    got = tx_read(spark, ptable)
    assert got.count() == 410
    assert {r.id: (r.k, r.tag) for r in got.collect()}[405] == (4, "c")
    files3, _ = _snapshot_files(spark, ptable)
    assert any("=" not in f for f in files3)
    # refusals + no-op
    with pytest.raises(ValueError, match="not in the table schema"):
        tx_set_partitioning(spark, ptable, ["nope"])
    v_now = _snapshot_files(spark, ptable)[1]
    assert tx_set_partitioning(spark, ptable, []) == v_now


def test_escaped_partition_values_keep_stats_and_prune(spark, tmp_path):
    """ADVICE r11 (low): input_file_name() returns URI-escaped paths
    (space -> %20; hive's on-disk %3A for ':' -> %253A) while the
    commit's add list carries raw FileSystem names — a partition value
    with such characters must still land its [v, v] stats under the
    SAME key the add list uses, or pruning silently degrades to
    full keeps."""
    from distributed_mapreduce__spark.sources.txlog import _replay

    t = str(tmp_path / "esc")
    df = spark.createDataFrame(
        [(1, "a b"), (2, "c:d"), (3, "p%q"), (4, "plain")],
        "id long, k string",
    )
    tx_write(df.repartition("k"), t, partition_by=["k"])
    snap = _replay(spark, t)
    files = sorted(snap.eps)
    assert len(files) == 4
    for f in files:
        st = snap.stats.get(f) or {}
        assert "k" in st, f"partition stats missing for {f}"
        assert st["k"][0] == st["k"][1]  # [v, v] — one value per file
    # values round-trip through the hive layout
    got = {r.id: r.k for r in tx_read(spark, t).collect()}
    assert got == {1: "a b", 2: "c:d", 3: "p%q", 4: "plain"}
    # and pruning is log-only on the escaped values too
    for val, want_id in (("a b", 1), ("c:d", 2), ("p%q", 3)):
        pruned = tx_read(spark, t, where=("k", val, val))
        opened = pruned.inputFiles()
        assert len(opened) == 1, (val, opened)
        assert {r.id for r in pruned.collect()} == {want_id}
