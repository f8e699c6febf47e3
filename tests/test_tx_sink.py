"""``writeStream.format("txtable")`` — the ACID table as a streaming
SINK (round 14, VERDICT r13 #4): per-epoch append commits with
``txsink:<appId>:<batchId>`` txn ids for exactly-once across crash
replays, schema/layout/feature refusals (construction AND per-commit),
row-tracking base maintenance, and end-to-end table->table parity with
the foreachBatch pipe semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.sources.txlog import (
    tx_add_constraint,
    tx_enable_row_tracking,
    tx_read,
    tx_rename_column,
    tx_scan_with_row_ids,
    tx_write,
)
from distributed_mapreduce__spark.streaming.tx_source import (
    TxTableStreamWriter,
    _LogView,
    register_tx_source,
)


def _df(spark, lo, hi, tag="x"):
    return spark.range(lo, hi).select("id", F.lit(tag).alias("tag"))


def _seed(spark, path, schema_src):
    """An empty target table carrying the source's recorded schema."""
    tx_write(
        spark.createDataFrame([], schema_src.schema), path
    )


def _rows(spark, path):
    return sorted((r.id, r.tag) for r in tx_read(spark, path).collect())


def _arrow_batches(spark, df):
    import pyarrow as pa

    pdf = df.toPandas()
    return iter(pa.Table.from_pandas(pdf).to_batches())


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_readstream_to_writestream_end_to_end(spark, tmp_path):
    register_tx_source(spark)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    tx_write(_df(spark, 0, 50, "a"), src)
    _seed(spark, dst, _df(spark, 0, 1))

    def drain():
        q = (
            spark.readStream.format("txtable").option("path", src).load()
            .writeStream.format("txtable")
            .option("path", dst)
            .option("appId", "e2e-test")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert _rows(spark, dst) == _rows(spark, src)
    # incremental: only the new commit flows, nothing re-appends
    tx_write(_df(spark, 50, 70, "b"), src)
    drain()
    assert _rows(spark, dst) == _rows(spark, src)
    # exactly-once across the whole run: counts, not just sets
    assert tx_read(spark, dst).count() == 70


def test_crash_replay_dedupes_by_txn(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t, _df(spark, 0, 1))
    view = _LogView(t)
    w = TxTableStreamWriter(
        {"path": t, "appid": "app1"}, view.schema_json()
    )
    batch = _df(spark, 0, 10, "z")
    m1 = w.write(_arrow_batches(spark, batch))
    w.commit([m1], 0)
    assert tx_read(spark, t).count() == 10
    # crash between table commit and Spark's checkpoint commit:
    # the engine re-runs batch 0 — same txn id, first attempt wins,
    # the replay's staged duplicate is dropped
    m2 = w.write(_arrow_batches(spark, batch))
    w.commit([m2], 0)
    assert tx_read(spark, t).count() == 10
    import os

    assert not os.path.exists(os.path.join(t, m2.files[0]["rel"]))
    # the NEXT batch commits normally
    m3 = w.write(_arrow_batches(spark, _df(spark, 10, 15, "z")))
    w.commit([m3], 1)
    assert tx_read(spark, t).count() == 15


def test_sink_maintains_row_tracking_bases(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 5, "seed"), t)
    tx_enable_row_tracking(spark, t)
    view = _LogView(t)
    w = TxTableStreamWriter({"path": t, "appid": "rt"}, view.schema_json())
    m = w.write(_arrow_batches(spark, _df(spark, 100, 110, "s")))
    w.commit([m], 0)
    ids = [r._row_id for r in tx_scan_with_row_ids(spark, t).collect()]
    assert len(ids) == 15 and len(set(ids)) == 15
    assert all(i is not None for i in ids)


def test_sink_refusals(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t, _df(spark, 0, 1))
    view = _LogView(t)
    schema = view.schema_json()
    # no stable identity
    with pytest.raises(ValueError, match="stable identity"):
        TxTableStreamWriter({"path": t}, schema)
    # schema mismatch
    bad = (
        _df(spark, 0, 1).withColumn("extra", F.lit(1)).schema.json()
    )
    with pytest.raises(ValueError, match="does not match the table"):
        TxTableStreamWriter({"path": t, "appid": "a"}, bad)
    # a CHECK constraint the batch validator cannot parse refuses at
    # construction (round 15: parseable constraints are ENFORCED per
    # batch instead — see test_sink_enforces_check_constraints)
    tx_add_constraint(
        spark, t, "sparkism", "xxhash64(tag) != 42"
    )
    with pytest.raises(ValueError, match="not evaluable"):
        TxTableStreamWriter({"path": t, "appid": "a"}, schema)


def test_mid_stream_schema_change_fails_commit(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t, _df(spark, 0, 1))
    w = TxTableStreamWriter(
        {"path": t, "appid": "a"}, _LogView(t).schema_json()
    )
    m = w.write(_arrow_batches(spark, _df(spark, 0, 3)))
    tx_rename_column(spark, t, "tag", "label")
    with pytest.raises(RuntimeError, match="schema.*changed"):
        w.commit([m], 0)
    # the refused batch's staged file was dropped — nothing leaks
    assert tx_read(spark, t).count() == 0


def test_sink_on_column_mapped_table(spark, tmp_path):
    """Cross-feature: the sink stages PHYSICAL column names on mapped
    tables (the frozen pre-rename names), and reads come back under
    the current logical names."""
    import glob

    import pyarrow.parquet as pq

    from distributed_mapreduce__spark.sources.txlog import (
        tx_rename_column,
    )

    t = str(tmp_path / "t")
    tx_write(_df(spark, 0, 5), t)
    tx_rename_column(spark, t, "tag", "label")
    w = TxTableStreamWriter({"path": t, "appid": "m"}, _LogView(t).schema_json())
    batch = spark.range(100, 105).select(
        "id", F.lit("s").alias("label")
    )
    w.commit([w.write(_arrow_batches(spark, batch))], 0)
    got = sorted((r.id, r.label) for r in tx_read(spark, t).collect())
    assert len(got) == 10 and (100, "s") in got
    names = {
        c
        for f in glob.glob(f"{t}/data/*.parquet")
        for c in pq.ParquetFile(f).schema_arrow.names
    }
    assert names == {"id", "tag"}  # physical bytes never rename


def test_sink_identity_partitioned_table(spark, tmp_path):
    """Round-14 late: the sink handles identity hive partitioning —
    one staged file per partition group per task, values in the
    directory name only, per-file [v,v] partition stats recorded, and
    the end-to-end stream lands rows readable AND prunable."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    register_tx_source(spark)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    tx_write(
        spark.range(0, 40).select(
            "id", (F.col("id") % 3).cast("string").alias("tag")
        ),
        src,
    )
    tx_write(
        spark.createDataFrame([], "id long, tag string"),
        dst, partition_by=["tag"],
    )
    q = (
        spark.readStream.format("txtable").option("path", src).load()
        .writeStream.format("txtable")
        .option("path", dst)
        .option("appId", "part-e2e")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted((r.id, r.tag) for r in tx_read(spark, dst).collect())
    want = sorted((i, str(i % 3)) for i in range(40))
    assert got == want
    # partition values live in the path, never the bytes
    data_files = glob.glob(f"{dst}/data/tag=*/*.parquet")
    assert data_files
    assert all(
        "tag" not in pq.ParquetFile(f).schema_arrow.names
        for f in data_files
    )
    # pruned read matches
    assert tx_read(spark, dst, where=("tag", "1", "1")).count() == 13
    # the commit recorded per-file partition stats
    cj = sorted(glob.glob(os.path.join(dst, "_txlog", "*.json")))[-1]
    c = json.load(open(cj))
    assert c.get("stats") and all(
        st["tag"][0] == st["tag"][1] for st in c["stats"].values()
    )


def test_sink_refuses_null_partition_values(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(
        spark.createDataFrame([], "id long, tag string"),
        t, partition_by=["tag"],
    )
    w = TxTableStreamWriter(
        {"path": t, "appid": "n"}, _LogView(t).schema_json()
    )
    batch = spark.createDataFrame(
        [(1, "a"), (2, None)], "id long, tag string"
    )
    with pytest.raises(Exception, match="NULL value in"):
        w.write(_arrow_batches(spark, batch))


def test_sink_transform_partitioned_table(spark, tmp_path):
    """Round 15 (VERDICT r14 #1): the sink computes TRANSFORM
    placement natively — days(ts) directories byte-identical to the
    engine's, source column kept in the bytes (hidden partitioning),
    per-file derived [v,v] + source [min,max] stats recorded so
    transform-pruned reads skip sink files from the log alone."""
    import datetime as dt
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    register_tx_source(spark)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    rows = [
        (i, dt.datetime(2024, 3, 1 + i % 3, 6 + i % 12), f"b{i}")
        for i in range(30)
    ]
    tx_write(
        spark.createDataFrame(rows, "id long, ts timestamp, body string"),
        src,
    )
    tx_write(
        spark.createDataFrame([], "id long, ts timestamp, body string"),
        dst, partition_by=["days(ts)"],
    )
    q = (
        spark.readStream.format("txtable").option("path", src).load()
        .writeStream.format("txtable")
        .option("path", dst)
        .option("appId", "days-e2e")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted((r.id, r.ts, r.body) for r in tx_read(spark, dst).collect())
    assert got == sorted(rows)
    # placement dirs match the engine's derived-name convention; the
    # SOURCE column stays in the file bytes (hidden partitioning)
    files = glob.glob(f"{dst}/data/_p_days_ts=*/*.parquet")
    assert files
    assert {f.rsplit("/", 2)[1] for f in files} == {
        "_p_days_ts=2024-03-01", "_p_days_ts=2024-03-02",
        "_p_days_ts=2024-03-03",
    }
    assert all(
        "ts" in pq.ParquetFile(f).schema_arrow.names for f in files
    )
    # transform-pruned read: a source-column predicate opens only the
    # matching day's files — from the log, no footer I/O
    lo, hi = dt.datetime(2024, 3, 2), dt.datetime(2024, 3, 2, 23, 59)
    pruned = tx_read(spark, dst, where=("ts", lo, hi))
    assert pruned.inputFiles()
    assert all("_p_days_ts=2024-03-02" in f for f in pruned.inputFiles())
    assert {r.id for r in pruned.collect()} == {
        i for i in range(30) if 1 + i % 3 == 2
    }
    # the commit carries derived [v,v] AND source [min,max] stats
    cj = sorted(glob.glob(os.path.join(dst, "_txlog", "*.json")))[-1]
    st = json.load(open(cj))["stats"]
    assert st
    for ent in st.values():
        assert ent["_p_days_ts"][0] == ent["_p_days_ts"][1]
        assert ent["ts"][0] <= ent["ts"][1]
        assert ent["ts"][0][:10] == ent["_p_days_ts"][0]


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_sink_placement_parity_with_engine(spark, tmp_path):
    """_sink_place_val is the byte-exact twin of txlog._transform_expr:
    the same rows written by tx_write and by the sink land in the SAME
    directory names for every transform family."""
    import datetime as dt
    import glob

    rows = [
        (7, dt.datetime(2024, 11, 30, 23, 59, 59), "a b/c:d"),
        (-13, dt.datetime(2025, 1, 1, 0, 0, 1), "naïve%50"),
        (1024, dt.datetime(2024, 2, 29, 12), "x"),
    ]
    schema = "k long, ts timestamp, s string"
    for spec in ["days(ts)", "months(ts)", "years(ts)", "hours(ts)",
                 "bucket(16, k)", "truncate(3, s)", "truncate(100, k)",
                 "s"]:
        eng = str(tmp_path / f"eng-{spec.replace('/', '_')}")
        snk = str(tmp_path / f"snk-{spec.replace('/', '_')}")
        tx_write(
            spark.createDataFrame(rows, schema), eng,
            partition_by=[spec],
        )
        tx_write(
            spark.createDataFrame([], schema), snk, partition_by=[spec],
        )
        w = TxTableStreamWriter(
            {"path": snk, "appid": "p"}, _LogView(snk).schema_json()
        )
        w.commit(
            [w.write(_arrow_batches(
                spark, spark.createDataFrame(rows, schema)
            ))],
            0,
        )
        dirs = lambda p: {  # noqa: E731
            f.rsplit("/", 2)[1] for f in glob.glob(f"{p}/data/*/*.parquet")
        }
        assert dirs(eng) == dirs(snk), spec
        got = sorted(
            (r.k, r.ts, r.s) for r in tx_read(spark, snk).collect()
        )
        assert got == sorted(rows), spec


def test_sink_refuses_null_transform_source(spark, tmp_path):
    t = str(tmp_path / "t")
    tx_write(
        spark.createDataFrame([], "id long, ts timestamp"),
        t, partition_by=["days(ts)"],
    )
    w = TxTableStreamWriter(
        {"path": t, "appid": "n"}, _LogView(t).schema_json()
    )
    import datetime as dt

    batch = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1)), (2, None)], "id long, ts timestamp"
    )
    with pytest.raises(Exception, match="NULL value in"):
        w.write(_arrow_batches(spark, batch))


def test_sink_enforces_check_constraints(spark, tmp_path):
    """Round 15 (VERDICT r14 #7): parseable CHECK constraints are
    evaluated per batch by duckdb under the engine's semantics — a
    violating batch fails NAMING the constraint, NULL passes (SQL
    CHECK), and a clean stream commits."""
    t = str(tmp_path / "t")
    _seed(spark, t, _df(spark, 0, 1))
    tx_add_constraint(spark, t, "nonneg", "id >= 0")
    w = TxTableStreamWriter(
        {"path": t, "appid": "c"}, _LogView(t).schema_json()
    )
    # clean batch commits
    w.commit([w.write(_arrow_batches(spark, _df(spark, 0, 5)))], 0)
    assert tx_read(spark, t).count() == 5
    # violating batch refuses, naming the constraint; nothing lands
    with pytest.raises(ValueError, match="nonneg"):
        w.write(_arrow_batches(spark, _df(spark, -3, 3)))
    assert tx_read(spark, t).count() == 5
    # NULL evaluations PASS (SQL CHECK semantics, the engine's rule)
    batch = spark.createDataFrame(
        [(None, "z")], "id long, tag string"
    )
    w.commit([w.write(_arrow_batches(spark, batch))], 1)
    assert tx_read(spark, t).count() == 6


def test_constraint_added_mid_stream_fails_commit(spark, tmp_path):
    t = str(tmp_path / "t")
    _seed(spark, t, _df(spark, 0, 1))
    w = TxTableStreamWriter(
        {"path": t, "appid": "c"}, _LogView(t).schema_json()
    )
    m = w.write(_arrow_batches(spark, _df(spark, 0, 3)))
    tx_add_constraint(spark, t, "late", "id < 100")
    with pytest.raises(RuntimeError, match="constraints.*changed"):
        w.commit([m], 0)
    # staged duplicate was dropped
    assert tx_read(spark, t).count() == 0


def test_sink_identity_timestamp_partition_dir_parity(spark, tmp_path):
    """Round 15 review: Spark's Arrow conversion hands the sink
    TZ-AWARE datetimes for TimestampType — the partition directory
    value must render the session-local NAIVE wall time (the engine's
    layout, _stat_val's rule); ``str()`` of the aware value appended
    ``+00:00``, splitting one partition value across two directories
    depending on which writer landed it."""
    import glob
    import os

    import pyarrow as pa

    eng, snk = str(tmp_path / "eng"), str(tmp_path / "snk")
    df = spark.sql(
        "SELECT 1L AS id, timestamp'2024-11-30 23:59:59' AS ts"
    )
    tx_write(df, eng, partition_by=["ts"])
    tx_write(
        spark.createDataFrame([], "id long, ts timestamp"),
        snk, partition_by=["ts"],
    )
    w = TxTableStreamWriter(
        {"path": snk, "appid": "tz"}, _LogView(snk).schema_json()
    )
    # what Spark streams to the sink: tz-stamped from the session tz
    import datetime as dt

    batch = pa.table({
        "id": pa.array([1], type=pa.int64()),
        "ts": pa.array(
            [dt.datetime(2024, 11, 30, 23, 59, 59)],
            type=pa.timestamp("us", tz="UTC"),
        ),
    })
    w.commit([w.write(iter(batch.to_batches()))], 0)

    def dirs(root):
        return sorted(
            os.path.basename(os.path.dirname(p))
            for p in glob.glob(f"{root}/data/ts=*/*.parquet")
        )

    assert dirs(snk) == dirs(eng)  # byte-identical directory names
    got = tx_read(spark, snk).collect()
    assert [(r.id, str(r.ts)) for r in got] == [(1, "2024-11-30 23:59:59")]


def test_sink_check_eval_error_refuses_named(spark, tmp_path):
    """Round 15 review: a CHECK whose EVALUATION errors
    value-dependently on a batch (e.g. a cast no row satisfies —
    something the construction dry-run on an empty table cannot see)
    refuses LOUDLY naming the constraint, fail-closed — not an opaque
    duckdb traceback killing the stream, and never a silent accept."""
    t = str(tmp_path / "t")
    _seed(spark, t, _df(spark, 0, 1))
    tx_add_constraint(spark, t, "tagnum", "CAST(tag AS INT) > 0")
    w = TxTableStreamWriter(
        {"path": t, "appid": "e"}, _LogView(t).schema_json()
    )
    with pytest.raises(ValueError, match="tagnum"):
        w.write(_arrow_batches(spark, _df(spark, 0, 3, "x")))
    assert tx_read(spark, t).count() == 0


def test_check_batch_offset_timezone_mapping_and_refusal(spark, tmp_path):
    """Round 15 review: duckdb accepts only ICU zone names, but Spark
    stamps Arrow batches with the raw session tz — '+08:00' style.
    Whole-hour offsets map to the sign-inverted Etc/GMT zones; a tz
    with no ICU equivalent refuses LOUDLY (fail-closed) only when a
    constraint can actually see a timestamp column — the rest of the
    constraints still evaluate."""
    import datetime as dt

    import pyarrow as pa

    from distributed_mapreduce__spark.streaming.tx_source import (
        _check_staged_batch,
    )

    def batch(tz, hh, mm):
        # what Spark hands the sink: UTC INSTANTS stamped with the
        # raw session tz string; here 23:00 session-local wall time =
        # (23:00 - offset) UTC. Built instant-first (naive = UTC
        # fields, then cast to the tz label) because pyarrow keeps an
        # aware datetime's WALL fields when the target type carries a
        # tz.
        utc = dt.datetime(2024, 1, 1, 23, 0, 0) - dt.timedelta(
            hours=hh, minutes=mm
        )
        return pa.table({
            "id": pa.array([5], type=pa.int64()),
            "ts": pa.array([utc], type=pa.timestamp("us")).cast(
                pa.timestamp("us", tz=tz)
            ),
        })

    # '+08:00' maps to Etc/GMT-8: the local wall-time hour is 23, so
    # an hour-bound CHECK evaluates in session-local time, not host tz
    _check_staged_batch(
        batch("+08:00", 8, 0), {"late": "hour(ts) = 23"}, "t"
    )
    with pytest.raises(ValueError, match="late"):
        _check_staged_batch(
            batch("+08:00", 8, 0), {"late": "hour(ts) = 11"}, "t"
        )
    # half-hour offset: no ICU equivalent -> ts-referencing constraint
    # refuses naming the tz; a non-ts constraint still evaluates
    with pytest.raises(ValueError, match=r"\+05:30"):
        _check_staged_batch(
            batch("+05:30", 5, 30), {"late": "hour(ts) = 23"}, "t"
        )
    _check_staged_batch(
        batch("+05:30", 5, 30), {"pos": "id > 0"}, "t"
    )
    with pytest.raises(ValueError, match="pos"):
        _check_staged_batch(
            batch("+05:30", 5, 30), {"pos": "id < 0"}, "t"
        )
