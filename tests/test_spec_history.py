"""Partition-spec HISTORY registry (round 14, VERDICT r13 #7 —
Iceberg's spec-id lineage): every spec the table ever wrote under is
a numbered registry entry derived in the replay fold and persisted in
checkpoints, so partitioning METADATA time-travels and survives log
truncation; ``tx_detail`` exposes current id + lineage."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce__spark.sources.txlog import (
    _replay,
    _write_checkpoint,
    tx_detail,
    tx_read,
    tx_restore,
    tx_set_partitioning,
    tx_vacuum,
    tx_write,
)


def _df(spark, lo=0, hi=40):
    return spark.range(lo, hi).select(
        "id",
        (F.col("id") % 4).cast("string").alias("k"),
        F.to_timestamp(
            F.lit("2026-01-01 00:00:00")
        ).alias("ts"),
    )


def test_lineage_records_every_spec_change(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_df(spark), t, partition_by=["k"])            # spec 0
    v1 = tx_set_partitioning(spark, t, ["days(ts)"])       # spec 1
    v2 = tx_set_partitioning(spark, t, [])                 # spec 2: none
    hist = tx_detail(spark, t)["partition_spec_history"]
    assert [h["spec_id"] for h in hist] == [0, 1, 2]
    assert hist[0]["partition_by"] == ["k"] and hist[0]["version"] == 0
    assert hist[1] == {
        "spec_id": 1, "partition_by": ["days(ts)"], "version": v1,
    }
    assert hist[2]["partition_by"] == [] and hist[2]["version"] == v2
    assert tx_detail(spark, t)["partition_spec_id"] == 2


def test_partitioning_metadata_time_travels(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 20), t, partition_by=["k"])
    tx_set_partitioning(spark, t, [])
    tx_write(_df(spark, 20, 30), t)
    # the old version replays under its OWN spec: metadata and data
    old = _replay(spark, t, 0)
    assert old.partition_by == ["k"]
    assert [h["spec_id"] for h in old.spec_history] == [0]
    got = tx_read(spark, t, version=0)
    assert got.count() == 20 and "k" in got.columns
    # current snapshot knows the whole lineage
    assert [
        h["spec_id"]
        for h in tx_detail(spark, t)["partition_spec_history"]
    ] == [0, 1]


def test_lineage_survives_checkpoint_truncation(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_df(spark), t, partition_by=["k"])
    tx_set_partitioning(spark, t, ["bucket(4, id)"])
    for i in range(3):
        tx_write(_df(spark, 100 + i * 10, 110 + i * 10), t)
    snap = _replay(spark, t)
    assert _write_checkpoint(spark, t, snap.version)
    tx_vacuum(spark, t, retain_last=0)
    hist = tx_detail(spark, t)["partition_spec_history"]
    assert [h["spec_id"] for h in hist] == [0, 1]
    assert hist[1]["partition_by"] == ["bucket(4,id)"]  # canonical form


def test_restore_reset_appends_a_spec_entry(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_df(spark), t, partition_by=["k"])            # spec 0
    tx_set_partitioning(spark, t, [])                      # spec 1
    v = tx_restore(spark, t, 0)                            # back to ["k"]
    hist = tx_detail(spark, t)["partition_spec_history"]
    assert [h["spec_id"] for h in hist] == [0, 1, 2]
    assert hist[2]["partition_by"] == ["k"] and hist[2]["version"] == v


def test_tx_files_exposes_per_file_spec_id(spark, tmp_path):
    """The manifest's per-file spec_id (Iceberg's manifest spec-id):
    each live file reports the spec LIVE at its add version."""
    from distributed_mapreduce__spark.sources.txlog import tx_files

    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 10), t, partition_by=["k"])      # spec 0
    tx_set_partitioning(spark, t, [])                       # spec 1
    tx_write(_df(spark, 10, 20), t)
    by_spec = {
        r.spec_id: r.add_version
        for r in tx_files(spark, t).collect()
    }
    assert set(by_spec) == {0, 1}
    assert by_spec[0] == 0 and by_spec[1] > 0


def test_legacy_checkpoint_seed_covers_pre_checkpoint_adds(
    spark, tmp_path
):
    """ADVICE r14: a legacy (pre-registry) checkpoint seeds its folded
    spec at version 0, so files added BEFORE the checkpoint resolve to
    spec 0 in tx_files instead of NULL — the folded spec applied to
    them too."""
    import glob
    import json
    import os

    from distributed_mapreduce__spark.sources.txlog import tx_files

    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 10), t, partition_by=["k"])
    tx_write(_df(spark, 10, 20), t)
    snap = _replay(spark, t)
    assert _write_checkpoint(spark, t, snap.version)
    # simulate a pre-round-14 checkpoint: drop the persisted lineage
    (ck,) = glob.glob(os.path.join(t, "_txlog", "*.checkpoint.json"))
    d = json.load(open(ck))
    d.pop("spec_history", None)
    json.dump(d, open(ck, "w"))
    tx_vacuum(spark, t, retain_last=0)
    rows = tx_files(spark, t).collect()
    assert rows and all(r.spec_id == 0 for r in rows)
    hist = tx_detail(spark, t)["partition_spec_history"]
    assert hist == [
        {"spec_id": 0, "partition_by": ["k"], "version": 0}
    ]


def test_legacy_seed_mismatched_layout_reports_null(spark, tmp_path):
    """Round 15 review: the version-0 legacy seed claims the FOLDED
    (latest) spec for every pre-checkpoint add — actively wrong when
    the spec evolved before the checkpoint. tx_files cross-checks each
    file's own path signature against the resolved spec's field names
    and reports NULL (honest unknown) on mismatch instead of a wrong
    id; files whose layout matches keep resolving to the seed."""
    import glob
    import json
    import os

    from distributed_mapreduce__spark.sources.txlog import tx_files

    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 10), t, partition_by=["k"])   # spec A
    tx_set_partitioning(spark, t, ["days(ts)"])          # evolve -> B
    tx_write(_df(spark, 10, 20), t)                      # B-layout adds
    snap = _replay(spark, t)
    assert _write_checkpoint(spark, t, snap.version)
    (ck,) = glob.glob(os.path.join(t, "_txlog", "*.checkpoint.json"))
    d = json.load(open(ck))
    d.pop("spec_history", None)  # simulate a pre-round-14 checkpoint
    json.dump(d, open(ck, "w"))
    tx_vacuum(spark, t, retain_last=0)
    rows = tx_files(spark, t).collect()
    a_files = [r for r in rows if "/k=" in f"/{r.file}"]
    b_files = [r for r in rows if "_p_days_ts=" in r.file]
    assert a_files and b_files
    # pre-evolution layout contradicts the seeded (folded) spec
    assert all(r.spec_id is None for r in a_files)
    # post-evolution files match the seed and resolve to it
    assert all(r.spec_id == 0 for r in b_files)


def test_spec_at_unescapes_partition_field_names(spark, tmp_path):
    """Round 15 review: an identity partition column whose NAME
    contains a char in Spark's escape set writes dirs like
    'a%23b=v' — the path cross-check must compare the UNESCAPED field
    name against the spec, or every file on a correctly-tracked table
    reads back NULL spec_id."""
    from distributed_mapreduce__spark.sources.txlog import tx_files

    t = str(tmp_path / "t")
    df = spark.range(0, 8).select(
        "id", (F.col("id") % 2).cast("string").alias("a#b")
    )
    tx_write(df, t, partition_by=["a#b"])
    rows = tx_files(spark, t).collect()
    assert rows and all(r.spec_id == 0 for r in rows)
    assert all("a%23b=" in r.file for r in rows)
