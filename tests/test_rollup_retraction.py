"""Incremental view maintenance under deletes: retract_rollup folds
negated window partials (operators/timeseries.py), and
rollup_view_available_now (streaming/table_stream.py) keeps a rollup
store equal to a from-scratch recompute of a txlog table through
appends, merge-on-read deletes, and crash-replay."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.timeseries import (
    read_rollup,
    retract_rollup,
    tumbling,
    upsert_rollup,
)
from distributed_mapreduce__spark.sources.tables import load_table
from distributed_mapreduce__spark.sources.txlog import tx_delete, tx_read, tx_write
from distributed_mapreduce__spark.streaming.table_stream import (
    rollup_view_available_now,
)

SF = "/root/testdata/sf0.001"


def _view(spark, store):
    return {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 4))
        for r in read_rollup(spark, store, ("event_type",)).collect()
    }


def _full(spark, table):
    return {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 4))
        for r in tumbling(
            tx_read(spark, table), "1 hour", "event_type"
        ).collect()
    }


def test_retract_nets_out_and_zero_windows_vanish(spark, tmp_path):
    store = str(tmp_path / "store")
    ev = load_table(spark, SF, "events").select("ts", "value", "event_type")
    first = ev.filter(F.col("ts") < "2024-01-03")
    upsert_rollup(first, store, "1 hour", ("event_type",), batch_id="b0")
    before = read_rollup(spark, store, ("event_type",)).count()
    assert before > 0

    # retract exactly one event_type's rows → its windows shrink or
    # vanish; others are untouched
    gone = first.filter(F.col("event_type") == "click")
    retract_rollup(gone, store, "1 hour", ("event_type",), batch_id="b1")
    merged = read_rollup(spark, store, ("event_type",))
    assert merged.filter(F.col("event_type") == "click").count() == 0
    # equals recomputing without the retracted rows
    expect = {
        (r.window_start, r.event_type): r.n_events
        for r in tumbling(
            first.filter(F.col("event_type") != "click"),
            "1 hour",
            "event_type",
        ).collect()
    }
    got = {
        (r.window_start, r.event_type): r.n_events for r in merged.collect()
    }
    assert got == expect

    # retried retraction under the same batch id: idempotent
    retract_rollup(gone, store, "1 hour", ("event_type",), batch_id="b1")
    assert {
        (r.window_start, r.event_type): r.n_events
        for r in read_rollup(spark, store, ("event_type",)).collect()
    } == expect


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_view_maintains_through_appends_and_deletes(spark, tmp_path):
    table = str(tmp_path / "ingest")
    store = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, SF, "events").select("ts", "value", "event_type")

    tx_write(ev.filter(F.col("ts") < "2024-01-05"), table)
    tx_write(
        ev.filter((F.col("ts") >= "2024-01-05") & (F.col("ts") < "2024-01-10")),
        table,
    )
    r = rollup_view_available_now(
        spark, table, store, "1 hour", ("event_type",), checkpoint=ckpt
    )
    assert r["folds"] == 2
    assert _view(spark, store) == _full(spark, table)

    # merge-on-read delete of one event_type → the view retracts it
    keys = spark.createDataFrame([("purchase",)], "event_type string")
    tx_delete(keys, table, "event_type", mode="merge_on_read")
    r2 = rollup_view_available_now(
        spark, table, store, "1 hour", ("event_type",), checkpoint=ckpt
    )
    assert r2["folds"] == 1
    assert _view(spark, store) == _full(spark, table)
    assert all(k[1] != "purchase" for k in _view(spark, store))

    # appends after the delete (including the deleted type) re-enter
    tx_write(ev.filter(F.col("ts") >= "2024-01-10"), table)
    rollup_view_available_now(
        spark, table, store, "1 hour", ("event_type",), checkpoint=ckpt
    )
    assert _view(spark, store) == _full(spark, table)
    assert any(k[1] == "purchase" for k in _view(spark, store))


def test_view_crash_replay_is_idempotent(spark, tmp_path):
    table = str(tmp_path / "ingest")
    store = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, SF, "events").select("ts", "value", "event_type")
    tx_write(ev.filter(F.col("ts") < "2024-01-05"), table)
    keys = spark.createDataFrame([("click",)], "event_type string")
    tx_delete(keys, table, "event_type", mode="merge_on_read")

    rollup_view_available_now(
        spark, table, store, "1 hour", ("event_type",), checkpoint=ckpt
    )
    before = _view(spark, store)
    assert before == _full(spark, table)

    # crash: cursor lost AFTER both folds committed → re-drain
    # re-folds both versions under the same batch ids (overwrite)
    (tmp_path / "ckpt" / "cursor.json").unlink()
    r = rollup_view_available_now(
        spark, table, store, "1 hour", ("event_type",), checkpoint=ckpt
    )
    assert r["folds"] == 2
    assert _view(spark, store) == before


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_view_maintains_through_merges_and_cow_deletes(spark, tmp_path):
    """Round 10: the view survives the ROUTINE upsert path. A tx_merge
    folds update pre-images negated and post-images + inserts positive
    in ONE signed batch (fold_rollup_cdf), a copy-on-write delete
    retracts its sidecar rows — view == full recompute after every
    tick, including a crash replay."""
    from distributed_mapreduce__spark.sources.txlog import tx_merge

    table = str(tmp_path / "ingest")
    store = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "value", "event_type"
    )
    tx_write(ev.filter(F.col("event_id") % 2 == 0), table)
    rollup_view_available_now(
        spark, table, store, "1 hour", ("event_type",), checkpoint=ckpt
    )
    assert _view(spark, store) == _full(spark, table)

    # MERGE: move one residue class to a different event_type (update)
    # and add brand-new synthetic rows (insert), one commit
    upd = ev.filter(F.col("event_id") % 10 == 4).withColumn(
        "event_type", F.lit("merged")
    )
    ins = (
        ev.filter(F.col("event_id") % 2 == 1)
        .limit(50)
        .withColumn("event_id", -F.col("event_id"))
    )
    tx_merge(upd.unionByName(ins), table, "event_id")
    rollup_view_available_now(
        spark, table, store, "1 hour", ("event_type",), checkpoint=ckpt
    )
    assert _view(spark, store) == _full(spark, table)

    # copy-on-write delete retracts through the sidecar
    gone = (
        tx_read(spark, table)
        .filter(F.col("event_type") == "merged")
        .select("event_id")
    )
    tx_delete(gone, table, "event_id")  # CoW, cdf on
    rollup_view_available_now(
        spark, table, store, "1 hour", ("event_type",), checkpoint=ckpt
    )
    view = _view(spark, store)
    assert view == _full(spark, table)
    assert not any(k[1] == "merged" for k in view)

    # crash replay: wipe the cursor, re-drain — dynamic-partition
    # overwrite replaces each signed batch in place, view unchanged
    (tmp_path / "ckpt" / "cursor.json").unlink()
    rollup_view_available_now(
        spark, table, store, "1 hour", ("event_type",), checkpoint=ckpt
    )
    assert _view(spark, store) == _full(spark, table)


def test_view_maintains_through_conditional_merge_deletes(spark, tmp_path):
    """Round 14: a conditional merge's WHEN MATCHED DELETE emits
    'delete' rows INSIDE the cdf frame — the view must RETRACT them
    (they are neither pre-images nor post-images), or it keeps
    counting removed rows. view == full recompute through a clause
    merge that updates, deletes, and inserts in one commit."""
    from distributed_mapreduce__spark.sources.txlog import tx_merge

    table = str(tmp_path / "ingest")
    store = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "value", "event_type"
    )
    tx_write(ev.filter(F.col("event_id") % 2 == 0), table)
    rollup_view_available_now(
        spark, table, store, "1 hour", ("event_type",), checkpoint=ckpt
    )
    src = ev.filter(F.col("event_id") % 6 == 0).unionByName(
        ev.filter(F.col("event_id") % 2 == 1)
        .limit(40)
        .withColumn("event_id", -F.col("event_id"))
    )
    tx_merge(
        src, table, "event_id",
        when_matched=[
            # touched rows in class %12==0 re-typed (update)...
            {"condition": "t.event_id % 12 = 0",
             "set": {"event_type": "'retyped'"}},
            # ...every other matched row DELETED (the new frame shape)
            {"action": "delete"},
        ],
        when_not_matched=[{}],
    )
    rollup_view_available_now(
        spark, table, store, "1 hour", ("event_type",), checkpoint=ckpt
    )
    assert _view(spark, store) == _full(spark, table)
