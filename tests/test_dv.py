"""Positional deletion vectors (sources/txlog.py, round 12): DELETE
WHERE / delete-by-coordinate as KB-scale (file, row-ordinal) sidecars
— Delta's deletion-vector design re-expressed over Spark's
``_metadata.row_index`` hidden column. A DV delete rewrites ZERO data
files; readers apply one broadcast anti-join on exactly the targeted
files; ``tx_scan_with_pos`` + ``tx_delete_positions`` give the
row-identity primitive that deletes ONE of two bit-identical
duplicates (the dedup-pipeline physical-erasure shape no key-based
delete can express). Debt discipline mirrors equality tombstones:
file-set ops refuse while DVs are live, ``tx_apply_deletes`` settles
them into a bounded rewrite, vacuum keeps live sidecars and sweeps
settled ones, checkpoints fold live DVs so log truncation never
resurrects a deleted row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from distributed_mapreduce__spark.sources.txlog import (
    tx_apply_deletes,
    tx_changes,
    tx_changes_cdf,
    tx_compact,
    tx_delete,
    tx_delete_positions,
    tx_delete_where,
    tx_history,
    tx_merge,
    tx_properties,
    tx_read,
    tx_rename_column,
    tx_scan_with_pos,
    tx_vacuum,
    tx_write,
    _replay,
    _snapshot_files,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id", (F.col("id") % 10).alias("v")
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 100), t, mode="overwrite", stats_cols=["id"])
    tx_write(_df(spark, 100, 200), t, mode="append", stats_cols=["id"])
    return t


def test_dv_delete_where_basics(spark, table):
    before, _ = _snapshot_files(spark, table)
    v = tx_delete_where(spark, table, "v = 3")
    out = tx_read(spark, table)
    assert out.count() == 180
    assert out.filter("v = 3").count() == 0
    # ZERO data files rewritten — the whole point of a deletion vector
    after, _ = _snapshot_files(spark, table)
    assert sorted(before) == sorted(after)
    # time travel to the pre-delete snapshot still sees every row
    assert tx_read(spark, table, version=v - 1).count() == 200
    snap = _replay(spark, table)
    assert [d["version"] for d in snap.dv] == [v]
    assert "dv" in (tx_properties(spark, table).get("writer.features") or [])


def test_dv_null_condition_rows_survive(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(10).select(
        "id",
        F.when(F.col("id") < 5, F.col("id")).alias("v"),  # 5..9 -> NULL
    )
    tx_write(df, t, mode="overwrite")
    tx_delete_where(spark, t, "v < 3")  # NULL < 3 is NULL, not true
    out = tx_read(spark, t)
    assert out.count() == 7
    assert out.filter(F.col("v").isNull()).count() == 5


def test_dv_stacking_and_idempotent_positions(spark, table):
    tx_delete_where(spark, table, "v = 3")
    tx_delete_where(spark, table, "id < 5")  # second DV stacks
    assert tx_read(spark, table).count() == 176
    # a position scan never surfaces deleted coordinates, so feeding
    # its rows back into a delete is a no-op, not a double-mark
    pos = tx_scan_with_pos(spark, table)
    assert pos.count() == 176
    assert pos.filter("v = 3 or id < 5").count() == 0


def test_delete_one_of_two_identical_duplicates(spark, tmp_path):
    t = str(tmp_path / "t")
    base = spark.range(50).select("id", F.lit("same").alias("payload"))
    tx_write(base, t, mode="overwrite")
    tx_write(base, t, mode="append")  # bit-identical duplicate of every row
    pos = tx_scan_with_pos(spark, t)
    losers = (
        pos.withColumn(
            "_rank",
            F.row_number().over(
                # partitioned window (by row content), never global
                Window.partitionBy("id", "payload").orderBy("_file", "_pos")
            ),
        )
        .filter("_rank > 1")
        .select("_file", "_pos")
    )
    tx_delete_positions(losers, t)
    out = tx_read(spark, t)
    assert out.count() == 50  # exactly one copy of each survived
    assert out.distinct().count() == 50


def test_dv_appends_after_delete_unaffected(spark, table):
    tx_delete_where(spark, table, "v = 3")
    tx_write(_df(spark, 200, 220), table, mode="append")
    out = tx_read(spark, table)
    # the new file's v=3 rows survive: a DV pins to the files it
    # scanned, by construction
    assert out.filter("v = 3").count() == 2
    assert out.count() == 200


def test_dv_refusals_while_live(spark, table, tmp_path):
    tx_delete_where(spark, table, "v = 3")
    with pytest.raises(ValueError, match="deletion vectors"):
        tx_compact(spark, table)
    with pytest.raises(ValueError, match="deletion vectors"):
        tx_delete(
            spark.range(5).select(F.col("id")), table, "id"
        )
    with pytest.raises(ValueError, match="deletion vectors"):
        tx_delete_where(spark, table, "v = 4", mode="copy_on_write")
    with pytest.raises(ValueError, match="deletion vectors"):
        tx_merge(
            _df(spark, 0, 5), table, "id"
        )


def test_dv_refused_while_equality_tombstones_live(spark, table):
    tx_delete(
        spark.range(3).select("id"), table, "id", mode="merge_on_read"
    )
    with pytest.raises(ValueError, match="equality tombstones"):
        tx_delete_where(spark, table, "v = 3")
    with pytest.raises(ValueError, match="equality tombstones"):
        tx_scan_with_pos(spark, table)
    with pytest.raises(ValueError, match="equality tombstones"):
        tx_delete_positions(
            spark.createDataFrame(
                [("data/x.parquet", 0)], "_file string, _pos long"
            ),
            table,
        )


def test_dv_settle_then_vacuum(spark, table):
    tx_delete_where(spark, table, "v = 3")
    tx_delete_where(spark, table, "id >= 190")
    sv = tx_apply_deletes(spark, table)
    assert sv is not None
    out = tx_read(spark, table)
    assert out.count() == 171
    assert out.filter("v = 3 or id >= 190").count() == 0
    snap = _replay(spark, table)
    assert snap.dv == []
    # settled: file-set ops work again
    assert tx_compact(spark, table) is not None
    # vacuum sweeps the settled sidecars (they are debris now)
    deleted = tx_vacuum(spark, table)
    assert any("_dv/" in f for f in deleted)
    assert tx_read(spark, table).count() == 171


def test_dv_vacuum_keeps_live_sidecars(spark, table):
    tx_delete_where(spark, table, "v = 3")
    deleted = tx_vacuum(spark, table, retain_last=0)
    assert not any("_dv/" in f for f in deleted)
    assert tx_read(spark, table).count() == 180


def test_dv_survives_checkpoint_and_log_truncation(spark, table):
    tx_delete_where(spark, table, "v = 3")
    # push a checkpoint above the dv commit, then truncate below it
    for i in range(12):
        tx_write(
            spark.range(1000 + i, 1001 + i).select(
                "id", (F.col("id") % 10).alias("v")
            ),
            table,
            mode="append",
        )
    tx_vacuum(spark, table, retain_last=0)
    out = tx_read(spark, table)
    assert out.filter("v = 3 and id < 200").count() == 0
    assert out.filter("id < 200").count() == 180


def test_dv_cdf_delivers_deleted_rows(spark, table):
    v = tx_delete_where(spark, table, "v = 3")
    frames = {
        ver: (kind, df)
        for ver, kind, df in tx_changes_cdf(spark, table, since_version=v - 1)
    }
    kind, df = frames[v]
    assert kind == "delete"
    rows = df.collect()
    assert len(rows) == 20
    assert all(r.v == 3 for r in rows)
    # insert-only feed must refuse (rows were removed)
    with pytest.raises(ValueError, match="rewrites history"):
        tx_changes(spark, table, since_version=v - 1)


def test_dv_cdf_false_raises_reprocess(spark, table):
    v = tx_delete_where(spark, table, "v = 3", cdf=False)
    with pytest.raises(ValueError, match="reprocess"):
        list(tx_changes_cdf(spark, table, since_version=v - 1))


def test_delete_where_copy_on_write_parity(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for t in (a, b):
        tx_write(_df(spark, 0, 200), t, mode="overwrite")
    tx_delete_where(spark, a, "v = 3 and id < 100")
    tx_delete_where(spark, b, "v = 3 and id < 100", mode="copy_on_write")
    ra = {tuple(r) for r in tx_read(spark, a).collect()}
    rb = {tuple(r) for r in tx_read(spark, b).collect()}
    assert ra == rb and len(ra) == 190
    # CoW physically rewrote; DV did not
    assert _replay(spark, a).dv and not _replay(spark, b).dv


def test_dv_on_partitioned_table(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.range(300).select(
        "id", (F.col("id") / 100).cast("long").alias("k")
    )
    tx_write(df, t, partition_by=["k"], stats_cols=["id"])
    tx_delete_where(spark, t, "id % 7 = 0", prune=("id", 0, 150))
    out = tx_read(spark, t)
    # prune bounded the SCAN, the predicate owns the decision: only
    # id<=150 multiples of 7 are gone (the prune range covered them)
    assert out.filter("id % 7 = 0 and id <= 150").count() == 0
    assert out.filter("id % 7 = 0 and id > 150").count() > 0
    # partition column still typed and present in the positional scan
    pos = tx_scan_with_pos(spark, t)
    assert dict(pos.dtypes)["k"] == "bigint"
    sv = tx_apply_deletes(spark, t)
    assert sv is not None
    # settlement preserved the hive layout
    files, _ = _snapshot_files(spark, t)
    assert all("k=" in f for f in files)


def test_dv_on_column_mapped_table(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 100), t, mode="overwrite")
    tx_rename_column(spark, t, "v", "bucket_v")
    tx_delete_where(spark, t, "bucket_v = 3")  # new logical name
    out = tx_read(spark, t)
    assert out.count() == 90
    assert "bucket_v" in out.columns
    assert out.filter("bucket_v = 3").count() == 0
    # positions scan maps physical->logical too
    assert "bucket_v" in tx_scan_with_pos(spark, t).columns


def test_dv_txn_idempotence(spark, table):
    v1 = tx_delete_where(spark, table, "v = 3", txn="job-1")
    v2 = tx_delete_where(spark, table, "v = 3", txn="job-1")
    assert v1 == v2
    assert tx_read(spark, table).count() == 180


def test_dv_empty_match_commits_noop(spark, table):
    v = tx_delete_where(spark, table, "v = 99", txn="noop-1")
    assert v is not None
    assert tx_read(spark, table).count() == 200
    # feeds checkpoint past it as a no-op
    assert all(
        df is None
        for _, _, df in tx_changes_cdf(spark, table, since_version=v - 1)
    )
    h = [e for e in tx_history(spark, table) if e["version"] == v]
    assert h and h[0]["action"] == "delete"


def test_dv_positions_stale_file_refused(spark, table):
    bogus = spark.createDataFrame(
        [("data/not-a-live-file.parquet", 0)], "_file string, _pos long"
    )
    with pytest.raises(ValueError, match="not live"):
        tx_delete_positions(bogus, table)


def test_tx_dedup_rows_full_identity(spark, tmp_path):
    from distributed_mapreduce__spark.sources.txlog import tx_dedup_rows

    t = str(tmp_path / "t")
    base = spark.range(100).select("id", (F.col("id") % 5).alias("v"))
    tx_write(base, t)
    tx_write(base.filter("id % 2 = 0"), t)  # re-ingest half
    before, _ = _snapshot_files(spark, t)
    v = tx_dedup_rows(spark, t)
    assert v is not None
    out = tx_read(spark, t)
    assert out.count() == 100 and out.distinct().count() == 100
    # zero rewrites: the file set is untouched, only a DV landed
    after, _ = _snapshot_files(spark, t)
    assert sorted(before) == sorted(after)
    # idempotent: a clean table commits nothing
    assert tx_dedup_rows(spark, t) is None


def test_tx_dedup_rows_subset_identity(spark, tmp_path):
    from distributed_mapreduce__spark.sources.txlog import tx_dedup_rows

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "same text", "crawl-a"), (2, "same text", "crawl-b"),
         (3, "other", "crawl-a")],
        "doc_id long, text string, source string",
    )
    tx_write(df.coalesce(1), t)
    tx_dedup_rows(spark, t, cols=["text"])  # collapse re-crawls
    out = tx_read(spark, t).collect()
    assert sorted(r.doc_id for r in out) == [1, 3]  # keep-first wins
    with pytest.raises(ValueError, match="not in the table"):
        tx_dedup_rows(spark, t, cols=["nope"])


def test_tx_dedup_rows_nulls_group_like_distinct(spark, tmp_path):
    from distributed_mapreduce__spark.sources.txlog import tx_dedup_rows

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(None,), (None,), (7,)], "v long"
    )
    tx_write(df.coalesce(1), t)
    tx_dedup_rows(spark, t)
    rows = tx_read(spark, t).collect()
    assert sorted((r.v is None, r.v) for r in rows) == [
        (False, 7), (True, None)
    ]


def test_tx_files_and_detail_introspection(spark, tmp_path):
    from distributed_mapreduce__spark.sources.txlog import (
        tx_delete_where,
        tx_detail,
        tx_files,
    )

    t = str(tmp_path / "t")
    df = spark.range(300).select(
        "id", (F.col("id") % 3).alias("k")
    )
    tx_write(df, t, partition_by=["k"], stats_cols=["id"])
    tx_delete_where(spark, t, "id = 7")
    files = tx_files(spark, t)
    rows = files.collect()
    assert len(rows) == len(_replay(spark, t).eps)
    assert all(r.size_bytes > 0 and r.add_version == 0 for r in rows)
    import json as _json

    parts = {_json.loads(r.partition_values)["k"] for r in rows}
    assert parts == {"0", "1", "2"}
    # exactly the id=7 file is DV-targeted, and stats rode along
    assert sum(1 for r in rows if r.dv_targeted) >= 1
    assert all("id" in _json.loads(r.stats) for r in rows if r.stats)
    # SQL over the manifest
    files.createOrReplaceTempView("tfiles")
    assert spark.sql(
        "SELECT count(*) FROM tfiles WHERE dv_targeted"
    ).first()[0] >= 1
    d = tx_detail(spark, t)
    assert d["num_files"] == len(rows)
    assert d["size_bytes"] == sum(r.size_bytes for r in rows)
    assert d["partition_by"] == ["k"]
    assert d["live_deletion_vectors"] == 1
    assert "dv" in d["writer_features"]
    assert "partitioning" in d["writer_features"]


def test_dv_noop_delete_with_live_dv_is_clean(spark, table):
    # a no-match delete/update on a table already carrying DVs must be
    # a clean no-op commit, not a planned-DV conflict
    tx_delete_where(spark, table, "v = 3")
    v = tx_delete_where(spark, table, "v = 99", txn="noop-2")
    assert v is not None
    assert tx_read(spark, table).count() == 180
