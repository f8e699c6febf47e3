"""End-to-end incremental materialized view: transactional ingest
table (sources/txlog.py) → change feed (tx_changes) → rollup store
(operators/timeseries.py). The pattern a production pipeline runs
forever: appends land ACID, the maintainer consumes only NEW files,
the continuous aggregate never re-scans history — and at every step
the view equals the full recompute bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.timeseries import (
    read_rollup,
    tumbling,
    upsert_rollup,
)
from distributed_mapreduce__spark.sources.tables import load_table
from distributed_mapreduce__spark.sources.txlog import (
    tx_changes,
    tx_read,
    tx_write,
)

SF = "/root/testdata/sf0.001"


def _view(spark, store):
    return {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in read_rollup(spark, store, ("event_type",)).collect()
    }


def _full(spark, table):
    return {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in tumbling(
            tx_read(spark, table), "1 hour", "event_type"
        ).collect()
    }


def test_txlog_changefeed_maintains_rollup(spark, tmp_path):
    table = str(tmp_path / "ingest")
    store = str(tmp_path / "view")
    ev = load_table(spark, SF, "events").select("ts", "value", "event_type")
    batches = [ev.filter(F.col("ts") < "2024-01-05"),
               ev.filter((F.col("ts") >= "2024-01-05") & (F.col("ts") < "2024-01-10")),
               ev.filter(F.col("ts") >= "2024-01-10")]

    last = None
    for i, b in enumerate(batches):
        # 1. ACID ingest (idempotent txn id — a retried job is a no-op)
        tx_write(b, table, txn=f"ingest-{i}")
        # 2. maintenance tick: consume ONLY the new files
        delta, last = tx_changes(spark, table, last)
        assert delta is not None
        # 3. fold into the continuous aggregate (batch id = version,
        #    so a retried tick overwrites its own partial)
        upsert_rollup(delta, store, "1 hour", ("event_type",), batch_id=f"v{last}")
        # invariant: view == full recompute over the table, every tick
        assert _view(spark, store) == _full(spark, table)

    # a quiet tick is a no-op (no new files, no write, view unchanged)
    delta, last2 = tx_changes(spark, table, last)
    assert delta is None and last2 == last
    before = _view(spark, store)
    assert before == _full(spark, table)

    # retried maintenance tick: re-consume the same change set under
    # the same batch id → dynamic partition overwrite keeps it
    # exactly-once
    replay, _ = tx_changes(spark, table, last - 1 if last > 0 else None)
    if replay is not None:
        upsert_rollup(replay, store, "1 hour", ("event_type",), batch_id=f"v{last}")
    assert _view(spark, store) == before
