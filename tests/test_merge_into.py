"""Delta-complete MERGE (round 14, VERDICT r13 #1): multi-column
keys and conditional WHEN MATCHED / NOT MATCHED / NOT MATCHED BY
SOURCE clauses on ``tx_merge`` — first-match-wins clause order,
Delta's multiple-match error, NULL-keys-never-match, full-scope
semantics (and append conflicts) under by-source clauses, CDF change
rows for every clause kind, and pre-image ``_row_id`` in the sidecar
on tracked tables. Reference model: Delta Lake MERGE INTO (public
docs/spec); the reference repo has no DML — extension E7+."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.sources.txlog import (
    _commit_rewrite,
    _prepare_merge_into,
    _replay,
    tx_changes_cdf,
    tx_enable_row_tracking,
    tx_merge,
    tx_read,
    tx_scan_with_row_ids,
    tx_write,
)


def _tbl(spark, t, n=20):
    tx_write(
        spark.range(0, n)
        .select(
            "id",
            (F.col("id") * 10).alias("qty"),
            F.lit("base").alias("tag"),
        )
        .repartition(2),
        t,
        stats_cols=["id"],
    )


def _src(spark, rows):
    return spark.createDataFrame(rows, "id long, qty long, tag string")


def _state(spark, t):
    return {
        r.id: (r.qty, r.tag) for r in tx_read(spark, t).collect()
    }


def test_conditional_update_delete_insert_matrix(spark, tmp_path):
    t = str(tmp_path / "t")
    _tbl(spark, t)  # ids 0..19, qty id*10, tag base
    src = _src(
        spark,
        [(15, 1000, "s"), (16, 1, "s"), (17, 1000, "s"),
         (21, 7, "s"), (23, 9, "s")],
    )
    tx_merge(
        src, t, "id",
        when_matched=[
            # first: big source qty -> update with exprs over t/s
            {"condition": "s.qty > t.qty", "set": {
                "qty": "s.qty", "tag": "concat(t.tag, '+', s.tag)"}},
            # second: anything else matched and odd -> delete
            {"action": "delete", "condition": "t.id % 2 = 1"},
        ],
        when_not_matched=[
            {"condition": "s.id < 23",
             "values": {"id": "s.id", "qty": "s.qty * 2", "tag": "'new'"}},
        ],
    )
    got = _state(spark, t)
    want = {i: (i * 10, "base") for i in range(20)}
    want[15] = (1000, "base+s")   # clause 1 (qty 1000 > 150)
    want[16] = (160, "base")      # matched, qty 1 < 160, even: no clause
    want[17] = (1000, "base+s")   # clause 1
    want[21] = (14, "new")        # insert clause (21 < 23), qty*2
    # id 23: unmatched but fails the insert condition -> dropped
    assert got == want


def test_first_match_wins_clause_order(spark, tmp_path):
    t = str(tmp_path / "t")
    _tbl(spark, t, n=4)
    src = _src(spark, [(1, 5, "s"), (2, 5, "s")])
    tx_merge(
        src, t, "id",
        when_matched=[
            {"condition": "t.id = 1", "set": {"tag": "'first'"}},
            {"set": {"tag": "'second'"}},  # unconditional update
        ],
    )
    got = _state(spark, t)
    assert got[1] == (10, "first")   # clause 1 wins for id 1
    assert got[2] == (20, "second")  # falls through to clause 2
    assert got[0] == (0, "base") and got[3] == (30, "base")


def test_set_star_and_insert_star(spark, tmp_path):
    t = str(tmp_path / "t")
    _tbl(spark, t, n=3)
    src = _src(spark, [(2, 999, "up"), (7, 700, "ins")])
    tx_merge(
        src, t, "id",
        when_matched=[{}],          # UPDATE SET *
        when_not_matched=[{}],      # INSERT *
    )
    got = _state(spark, t)
    assert got[2] == (999, "up") and got[7] == (700, "ins")
    assert got[0] == (0, "base")


def test_by_source_clauses_full_scope(spark, tmp_path):
    t = str(tmp_path / "t")
    _tbl(spark, t, n=6)  # ids 0..5
    src = _src(spark, [(4, 1, "s"), (5, 1, "s")])
    tx_merge(
        src, t, "id",
        when_matched=[{"set": {"tag": "'seen'"}}],
        when_not_matched_by_source=[
            {"action": "delete", "condition": "t.id < 2"},
            {"action": "update", "set": {"tag": "'stale'"}},
        ],
    )
    got = _state(spark, t)
    assert 0 not in got and 1 not in got          # by-source delete
    assert got[2] == (20, "stale") and got[3] == (30, "stale")
    assert got[4] == (40, "seen") and got[5] == (50, "seen")


def test_null_keys_flow_to_not_matched(spark, tmp_path):
    t = str(tmp_path / "t")
    _tbl(spark, t, n=3)
    src = _src(spark, [(None, 77, "n"), (1, 111, "s")])
    tx_merge(
        src, t, "id",
        when_matched=[{}],
        when_not_matched=[{}],
    )
    got = _state(spark, t)
    assert got[1] == (111, "s")
    assert got[None] == (77, "n")  # NULL key never matches -> insert


def test_duplicate_unmatched_keys_all_insert(spark, tmp_path):
    t = str(tmp_path / "t")
    _tbl(spark, t, n=2)
    src = _src(spark, [(50, 1, "a"), (50, 2, "b")])
    tx_merge(src, t, "id", when_not_matched=[{}])
    rows = tx_read(spark, t).filter("id = 50").collect()
    assert len(rows) == 2  # Delta inserts both


def test_multiple_matching_source_rows_raise(spark, tmp_path):
    t = str(tmp_path / "t")
    _tbl(spark, t, n=10)
    src = _src(spark, [(5, 1, "a"), (5, 2, "b")])
    with pytest.raises(ValueError, match="multiple source rows"):
        tx_merge(src, t, "id", when_matched=[{}])


def test_insert_only_merge_rewrites_nothing(spark, tmp_path):
    t = str(tmp_path / "t")
    _tbl(spark, t, n=10)
    src = _src(spark, [(5, 1, "dup"), (100, 1, "new")])
    v = tx_merge(src, t, "id", when_not_matched=[{}])
    import json, os
    c = json.load(open(os.path.join(t, "_txlog", f"{v:020d}.json")))
    assert c["remove"] == []          # read scope, not rewrite scope
    got = _state(spark, t)
    assert got[5] == (50, "base")     # matched row untouched
    assert got[100] == (1, "new")


def test_multi_column_key_upsert(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(
        spark.createDataFrame(
            [(1, "a", 10), (1, "b", 20), (2, "a", 30)],
            "k1 long, k2 string, v long",
        ),
        t,
        stats_cols=["k1"],
    )
    ups = spark.createDataFrame(
        [(1, "b", 99), (3, "c", 7)], "k1 long, k2 string, v long"
    )
    tx_merge(ups, t, ["k1", "k2"])  # unconditional upsert, composite key
    got = {(r.k1, r.k2): r.v for r in tx_read(spark, t).collect()}
    assert got == {(1, "a"): 10, (1, "b"): 99, (2, "a"): 30, (3, "c"): 7}


def test_multi_column_key_conditional(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(
        spark.createDataFrame(
            [(1, "a", 10), (1, "b", 20), (2, "a", 30)],
            "k1 long, k2 string, v long",
        ),
        t,
    )
    src = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 1)], "k1 long, k2 string, v long"
    )
    tx_merge(
        src, t, ["k1", "k2"],
        when_matched=[
            {"condition": "s.v > t.v", "set": {"v": "s.v"}},
            {"action": "delete"},
        ],
    )
    got = {(r.k1, r.k2): r.v for r in tx_read(spark, t).collect()}
    assert got == {(1, "a"): 100, (1, "b"): 20}  # (2,a) deleted


def test_clause_validation_refusals(spark, tmp_path):
    t = str(tmp_path / "t")
    _tbl(spark, t, n=2)
    src = _src(spark, [(0, 1, "s")])
    with pytest.raises(ValueError, match="DELETE carries a SET"):
        tx_merge(src, t, "id", when_matched=[
            {"action": "delete", "set": {"tag": "'x'"}}])
    with pytest.raises(ValueError, match="non-table column"):
        tx_merge(src, t, "id", when_matched=[
            {"set": {"nope": "1"}}])
    with pytest.raises(ValueError, match="bad when_matched"):
        tx_merge(src, t, "id", when_matched=[{"sett": {"tag": "'x'"}}])
    with pytest.raises(ValueError, match="UPDATE needs a SET"):
        tx_merge(src, t, "id", when_not_matched_by_source=[
            {"action": "update"}])
    with pytest.raises(ValueError, match="INSERT \\* needs"):
        tx_merge(
            src.drop("tag"), t, "id", when_not_matched=[{}]
        )


def test_by_source_conflicts_with_any_concurrent_append(spark, tmp_path):
    t = str(tmp_path / "t")
    _tbl(spark, t, n=6)
    src = _src(spark, [(1, 1, "s")])
    snap = _replay(spark, t)
    prep = _prepare_merge_into(
        spark, t, src, ["id"], [{"set": {"tag": "'seen'"}}], [],
        [{"action": "update", "set": {"tag": "'stale'"}}], None, snap,
    )
    # a concurrent append lands rows the by-source clause should have
    # seen: any append conflicts, range-disjoint or not
    tx_write(_src(spark, [(1000, 1, "late")]), t)
    with pytest.raises(RuntimeError, match="appended files overlapping"):
        _commit_rewrite(
            spark, t, prep["added"], prep["touched"],
            prep["snap_version"], None, "merge", stats=prep["stats"],
            blooms=prep["blooms"], conflict_keys=prep["conflict_keys"],
            extra=prep["extra"], revalidate=prep["revalidate"],
        )


def test_merge_cdf_change_types(spark, tmp_path):
    t = str(tmp_path / "t")
    _tbl(spark, t, n=6)
    src = _src(spark, [(1, 1000, "s"), (2, 1, "s"), (9, 5, "s")])
    v = tx_merge(
        src, t, "id",
        when_matched=[
            {"condition": "s.qty > t.qty", "set": {"qty": "s.qty"}},
            {"action": "delete"},
        ],
        when_not_matched=[{}],
        cdf=True,
    )
    frames = {
        ver: (kind, df)
        for ver, kind, df in tx_changes_cdf(spark, t, since_version=v - 1)
        if ver == v
    }
    kind, df = frames[v]
    assert kind == "cdf"
    by_type = {
        (r.id, r._change_type) for r in df.collect()
    }
    assert by_type == {
        (1, "update_preimage"), (1, "update_postimage"),
        (2, "delete"), (9, "insert"),
    }
    # the plain feed never surfaces _row_id
    assert "_row_id" not in df.columns


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_merge_cdf_id_complete_on_tracked_tables(spark, tmp_path):
    t = str(tmp_path / "t")
    _tbl(spark, t, n=6)
    tx_enable_row_tracking(spark, t)
    pre_ids = {r.id: r._row_id for r in
               tx_scan_with_row_ids(spark, t).collect()}
    src = _src(spark, [(1, 1000, "s"), (2, 1, "s"), (9, 5, "s")])
    v = tx_merge(
        src, t, "id",
        when_matched=[
            {"condition": "s.qty > t.qty", "set": {"qty": "s.qty"}},
            {"action": "delete"},
        ],
        when_not_matched=[{}],
        cdf=True,
    )
    post_ids = {r.id: r._row_id for r in
                tx_scan_with_row_ids(spark, t).collect()}
    out = {}
    for ver, kind, df in tx_changes_cdf(
        spark, t, since_version=v - 1, with_row_ids=True
    ):
        if ver == v:
            assert kind == "cdf"
            for r in df.collect():
                out[(r.id, r._change_type)] = r._row_id
    # pre-images carry the OLD stable id; post/insert the commit's new
    assert out[(1, "update_preimage")] == pre_ids[1]
    assert out[(2, "delete")] == pre_ids[2]
    assert out[(1, "update_postimage")] == post_ids[1]
    assert out[(9, "insert")] == post_ids[9]
    assert all(i is not None for i in out.values())


def test_legacy_upsert_cdf_preimage_ids(spark, tmp_path):
    t = str(tmp_path / "t")
    _tbl(spark, t, n=6)
    tx_enable_row_tracking(spark, t)
    pre_ids = {r.id: r._row_id for r in
               tx_scan_with_row_ids(spark, t).collect()}
    v = tx_merge(_src(spark, [(3, 7, "u"), (77, 1, "i")]), t, "id")
    got = {}
    for ver, kind, df in tx_changes_cdf(
        spark, t, since_version=v - 1, with_row_ids=True
    ):
        if ver == v:
            for r in df.collect():
                got[(r.id, r._change_type)] = r._row_id
    post_ids = {r.id: r._row_id for r in
                tx_scan_with_row_ids(spark, t).collect()}
    assert got[(3, "update_preimage")] == pre_ids[3]
    assert got[(3, "update_postimage")] == post_ids[3]
    assert got[(77, "insert")] == post_ids[77]


def test_conditional_merge_on_mapped_partitioned_table(spark, tmp_path):
    """Cross-feature: the clause engine over a COLUMN-MAPPED,
    hive-PARTITIONED table — the join/key pruning run on logical
    names, staging re-places survivors under physical names and the
    live partition layout."""
    from distributed_mapreduce__spark.sources.txlog import (
        tx_rename_column,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", i * 10) for i in range(12)],
        "id long, grp string, v long",
    )
    tx_write(df, t, partition_by=["grp"], stats_cols=["id"])
    tx_rename_column(spark, t, "v", "val")
    src = spark.createDataFrame(
        [(2, "g2", 999), (50, "gX", 5)], "id long, grp string, val long"
    )
    tx_merge(
        src, t, "id",
        when_matched=[
            {"condition": "s.val > t.val", "set": {"val": "s.val"}},
            {"action": "delete"},
        ],
        when_not_matched=[{}],
    )
    got = sorted((r.id, r.grp, r.val) for r in tx_read(spark, t).collect())
    want = sorted(
        [(i, f"g{i % 3}", i * 10) for i in range(12) if i != 2]
        + [(2, "g2", 999), (50, "gX", 5)]
    )
    assert got == want


def test_merge_update_can_move_partition(spark, tmp_path):
    """An UPDATE SET * that changes the PARTITION column re-places the
    row under its new hive directory, and partition-pruned reads find
    it there."""
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", i * 10) for i in range(12)],
        "id long, grp string, v long",
    )
    tx_write(df, t, partition_by=["grp"])
    src = spark.createDataFrame(
        [(1, "gMOVED", 111)], "id long, grp string, v long"
    )
    tx_merge(src, t, "id", when_matched=[{}])
    moved = tx_read(spark, t, where=("grp", "gMOVED", "gMOVED")).collect()
    assert [(r.id, r.grp, r.v) for r in moved] == [(1, "gMOVED", 111)]
    assert tx_read(spark, t).count() == 12


def test_merge_source_evaluated_once(spark, tmp_path):
    """Round 15 (VERDICT r14 #3): the merge prepares materialize the
    source/updates frame ONCE (localCheckpoint) and compute all key
    bounds in one agg — an accumulator-bumping source plan proves the
    plan body executes exactly once per partition, not K+2 times."""
    t = str(tmp_path / "t")
    _tbl(spark, t)

    def bumping_source(acc, parts=4):
        base = spark.range(0, 8, 1, parts).select(
            "id", (F.col("id") + 100).alias("qty"),
            F.lit("src").alias("tag"),
        )

        def bump(it):
            acc.add(1)
            return it

        return spark.createDataFrame(
            base.rdd.mapPartitions(bump), base.schema
        ), parts

    # conditional body: bounds (per key), multiple-match probe, the
    # matched join, and the insert anti-join all read the source
    acc = spark.sparkContext.accumulator(0)
    src, parts = bumping_source(acc)
    tx_merge(
        src, t, ["id", "qty"],
        when_matched=[{"action": "update", "set": {"tag": "'u'"}}],
        when_not_matched=[{}],
        cdf=True,
    )
    assert acc.value == parts, f"source ran {acc.value / parts}x"

    # unconditional body: null/dup probes + bounds + anti-join + CDF
    acc2 = spark.sparkContext.accumulator(0)
    src2, parts2 = bumping_source(acc2)
    tx_merge(src2, t, "id", cdf=True)
    assert acc2.value == parts2, f"updates ran {acc2.value / parts2}x"
