"""merge_keyed: the MERGE/upsert sink — updates replace, inserts
append, untouched rows AND untouched partition files survive, re-runs
are idempotent, and the merged result matches a DuckDB-computed MERGE
over the same inputs."""

from __future__ import annotations

import glob
import os

import duckdb
from pyspark.sql import functions as F

from distributed_mapreduce__spark.sources.sinks import merge_keyed


def _initial(spark):
    # 40 docs across 4 day-partitions, v=1
    return spark.range(40).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("int").alias("day"),
        F.lit(1).alias("v"),
        F.md5(F.col("id").cast("string")).alias("text"),
    )


def _batch(spark):
    # updates for ten ids ≡ 0,1 (mod 4) — touching days 0 and 1 only —
    # plus two brand-new docs
    ids = [i for i in range(40) if i % 4 in (0, 1)][:10] + [100, 101]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    return df.select(
        "doc_id",
        (F.col("doc_id") % 4).cast("int").alias("day"),
        F.lit(2).alias("v"),
        F.md5(F.concat(F.lit("new:"), F.col("doc_id").cast("string"))).alias("text"),
    )


def _expected_sql(init_pq: str, batch_pq: str) -> str:
    # Spark writes parquet "files" as directories — glob the parts
    return f"""
      SELECT * FROM '{batch_pq}/*.parquet'
      UNION ALL
      SELECT * FROM '{init_pq}/*.parquet'
      WHERE doc_id NOT IN (SELECT doc_id FROM '{batch_pq}/*.parquet')
    """


def test_merge_partitioned_upsert_matches_duckdb(spark, tmp_path):
    path = str(tmp_path / "ds")
    init, batch = _initial(spark), _batch(spark)
    init_pq, batch_pq = str(tmp_path / "init.pq"), str(tmp_path / "batch.pq")
    init.write.parquet(init_pq)
    batch.write.parquet(batch_pq)

    merge_keyed(init, path, ["doc_id"], partition_cols=["day"])
    merge_keyed(batch, path, ["doc_id"], partition_cols=["day"])

    cols = ["doc_id", "day", "v", "text"]
    got = sorted(
        map(tuple, spark.read.parquet(path).select(*cols).collect())
    )
    con = duckdb.connect()
    want = sorted(
        con.execute(
            f"SELECT doc_id, day, v, text FROM ({_expected_sql(init_pq, batch_pq)})"
        ).fetchall()
    )
    assert got == want
    # batch rows won (v=2 for updated keys), untouched keys kept v=1
    byid = {r[0]: r[2] for r in got}
    assert byid[0] == 2 and byid[100] == 2 and byid[2] == 1


def test_merge_rewrites_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "ds")
    merge_keyed(_initial(spark), path, ["doc_id"], partition_cols=["day"])
    # batch touches days 0 and 1 only
    untouched_before = {
        f: os.path.getmtime(f)
        for d in (2, 3)
        for f in glob.glob(os.path.join(path, f"day={d}", "*.parquet"))
    }
    assert untouched_before
    merge_keyed(_batch(spark), path, ["doc_id"], partition_cols=["day"])
    untouched_after = {
        f: os.path.getmtime(f)
        for d in (2, 3)
        for f in glob.glob(os.path.join(path, f"day={d}", "*.parquet"))
    }
    assert untouched_after == untouched_before  # same files, same mtimes
    # while days 0/1 were rewritten and carry the updates
    upd = spark.read.parquet(path).filter(F.col("doc_id") == 0).first()
    assert upd.v == 2


def test_merge_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "ds")
    merge_keyed(_initial(spark), path, ["doc_id"], partition_cols=["day"])
    merge_keyed(_batch(spark), path, ["doc_id"], partition_cols=["day"])
    once = sorted(map(tuple, spark.read.parquet(path).collect()))
    merge_keyed(_batch(spark), path, ["doc_id"], partition_cols=["day"])
    twice = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert once == twice
    # row count: 40 initial + 2 inserts, no dup keys
    assert len(twice) == 42


def test_merge_unpartitioned_full_rewrite(spark, tmp_path):
    path = str(tmp_path / "flat")
    merge_keyed(_initial(spark), path, ["doc_id"])
    merge_keyed(_batch(spark), path, ["doc_id"])
    df = spark.read.parquet(path)
    assert df.count() == 42
    assert df.filter(F.col("doc_id") == 1).first().v == 2
    assert df.filter(F.col("doc_id") == 3).first().v == 1


def test_merge_handles_key_moving_partitions(spark, tmp_path):
    """A key whose PARTITION VALUE changes in the batch must be deleted
    from its old partition, not left behind as a stale duplicate — the
    old home is in the touched set via the key-pruned scan."""
    path = str(tmp_path / "ds")
    merge_keyed(_initial(spark), path, ["doc_id"], partition_cols=["day"])
    moved = spark.createDataFrame([(1, 3, 2, "moved")],
                                  "doc_id long, day int, v int, text string")
    merge_keyed(moved, path, ["doc_id"], partition_cols=["day"])
    rows = spark.read.parquet(path).filter(F.col("doc_id") == 1).collect()
    assert len(rows) == 1  # exactly one version survives
    assert rows[0].day == 3 and rows[0].v == 2
    assert spark.read.parquet(path).count() == 40  # no net growth


def test_merge_maintains_dedup_index_across_recrawls(spark, tmp_path):
    """Composition story: a re-crawled document (same doc_id, NEW text)
    upserts its signature row in the persisted dedup index via
    merge_keyed — the append-only index would keep the stale signature
    and misjudge future near-dup checks against the old content."""
    from distributed_mapreduce__spark.operators.dedup import dedup_index

    schema = "doc_id long, text string"
    v1 = spark.createDataFrame(
        [(1, "alpha bravo charlie delta echo foxtrot golf hotel"),
         (2, "india juliet kilo lima mike november oscar papa")], schema
    )
    path = str(tmp_path / "index")
    merge_keyed(dedup_index(v1), path, ["doc_id"])
    before = {
        r.doc_id: r.text_md5 for r in spark.read.parquet(path).collect()
    }

    v2 = spark.createDataFrame(
        [(1, "totally different recrawled content words here now")], schema
    )
    merge_keyed(dedup_index(v2), path, ["doc_id"])
    idx = spark.read.parquet(path)
    assert idx.count() == 2  # upsert, not append
    after = {r.doc_id: r.text_md5 for r in idx.collect()}
    assert after[1] != before[1]  # recrawled signature replaced
    assert after[2] == before[2]  # untouched doc's signature survives


def test_merge_stable_partitions_skips_migration_scan(spark, tmp_path):
    """stable_partitions=True: same result for partition-stable keys
    (day derived from doc_id) — AND the migration scan really is
    skipped, pinned by the documented divergence: a key that MOVES
    partitions leaves its stale old row behind under the flag (the
    contract violation), where the unflagged path deletes it."""
    path = str(tmp_path / "ds")
    merge_keyed(_initial(spark), path, ["doc_id"], partition_cols=["day"])
    merge_keyed(
        _batch(spark), path, ["doc_id"], partition_cols=["day"],
        stable_partitions=True,
    )
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    # replay WITHOUT the flag on a fresh copy — identical result
    path2 = str(tmp_path / "ds2")
    merge_keyed(_initial(spark), path2, ["doc_id"], partition_cols=["day"])
    merge_keyed(_batch(spark), path2, ["doc_id"], partition_cols=["day"])
    want = sorted(map(tuple, spark.read.parquet(path2).collect()))
    assert got == want

    # divergence proof the flag is live: move doc 1 from day 1 to day 3
    moved = spark.createDataFrame([(1, 3, 9, "moved")],
                                  "doc_id long, day int, v int, text string")
    merge_keyed(moved, path, ["doc_id"], partition_cols=["day"],
                stable_partitions=True)
    rows = spark.read.parquet(path).filter(F.col("doc_id") == 1).collect()
    # stale day=1 row survives alongside the new day=3 row — exactly
    # the documented contract violation the scan would have prevented
    assert sorted((r.day, r.v) for r in rows) == [(1, 2), (3, 9)]


def test_merge_deletes_vacated_partition(spark, tmp_path):
    """A moved key that was its old partition's ONLY row: dynamic
    overwrite never rewrites the now-empty partition (it is absent
    from the output), so merge_keyed must delete the vacated directory
    explicitly — without that the stale row survives as a duplicate."""
    path = str(tmp_path / "ds")
    init = spark.createDataFrame(
        [(1, 0, 1, "a"), (2, 1, 1, "b"), (3, 1, 1, "c")],
        "doc_id long, day int, v int, text string",
    )
    merge_keyed(init, path, ["doc_id"], partition_cols=["day"])
    # doc 1 moves day 0 → day 2; day=0 held ONLY doc 1
    moved = spark.createDataFrame(
        [(1, 2, 2, "moved")], "doc_id long, day int, v int, text string"
    )
    merge_keyed(moved, path, ["doc_id"], partition_cols=["day"])
    rows = sorted(
        (r.doc_id, r.day, r.v) for r in spark.read.parquet(path).collect()
    )
    assert rows == [(1, 2, 2), (2, 1, 1), (3, 1, 1)]
    assert not os.path.exists(os.path.join(path, "day=0"))
    # idempotent: re-running the same merge changes nothing
    merge_keyed(moved, path, ["doc_id"], partition_cols=["day"])
    assert sorted(
        (r.doc_id, r.day, r.v) for r in spark.read.parquet(path).collect()
    ) == rows


def test_merge_unpartitioned_crash_recovery(spark, tmp_path):
    """The unpartitioned swap keeps both datasets on disk at every
    instant; recover_unpartitioned_merge rolls the completed tmp
    forward (or the old dataset back) from any crash window."""
    import shutil

    from distributed_mapreduce__spark.sources.sinks import (
        recover_unpartitioned_merge,
    )

    path = str(tmp_path / "flat")
    merge_keyed(_initial(spark), path, ["doc_id"])
    merge_keyed(_batch(spark), path, ["doc_id"])
    want = sorted(map(tuple, spark.read.parquet(path).collect()))
    # no staging residue after a successful merge
    assert not os.path.exists(path + "._merge_tmp")
    assert not os.path.exists(path + "._merge_old")
    assert recover_unpartitioned_merge(spark, path) == "intact"

    # crash window 1: live dataset renamed aside, tmp complete, path
    # absent → roll FORWARD to the completed merge
    shutil.copytree(path, path + "._merge_tmp")
    os.rename(path, path + "._merge_old")
    assert recover_unpartitioned_merge(spark, path) == "rolled_forward"
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == want
    assert not os.path.exists(path + "._merge_old")

    # crash window 2: tmp already swapped in (or lost) — only the old
    # dataset remains → roll BACK
    os.rename(path, path + "._merge_old")
    assert recover_unpartitioned_merge(spark, path) == "rolled_back"
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == want

    # nothing anywhere → explicit error
    import pytest

    shutil.rmtree(path)
    with pytest.raises(FileNotFoundError, match="nothing to recover"):
        recover_unpartitioned_merge(spark, str(tmp_path / "flat"))


def test_fresh_branch_refuses_crash_leftovers(spark, tmp_path):
    """A missing live dataset + staging dirs = interrupted merge; the
    fresh-dataset branch must refuse (writing batch-only data would
    silently drop every pre-crash row and the next merge would delete
    the only complete copy) and point at the recovery helper."""
    import pytest

    from distributed_mapreduce__spark.sources.sinks import (
        merge_keyed,
        recover_unpartitioned_merge,
    )

    path = str(tmp_path / "ds")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    # simulate the crash window: full dataset parked at ._merge_old,
    # nothing live at path
    df.write.parquet(path + "._merge_old")
    with pytest.raises(RuntimeError, match="recover_unpartitioned_merge"):
        merge_keyed(
            spark.createDataFrame([(3, "c")], "k long, v string"),
            path,
            key_cols=["k"],
        )
    # the designed path: recover, then merge cleanly
    assert recover_unpartitioned_merge(spark, path) == "rolled_back"
    merge_keyed(
        spark.createDataFrame([(3, "c")], "k long, v string"),
        path,
        key_cols=["k"],
    )
    assert sorted(
        (r.k, r.v) for r in spark.read.parquet(path).collect()
    ) == [(1, "a"), (2, "b"), (3, "c")]
