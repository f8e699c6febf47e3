"""SCD Type 2 (operators/scd.py): version chains must match a DuckDB
window replay, re-stated values must not open versions, multi-update
batches must splice in timestamp order, as-of reads must reconstruct
any past state, and late updates against closed history must raise."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.scd import (
    scd2_apply,
    scd2_as_of,
    scd2_init,
)

KEYS, TS, TRACKED = ["supp_id"], "ts", ["city", "tier"]


def _ts(day: int) -> dt.datetime:
    return dt.datetime(2026, 1, day)


@pytest.fixture(scope="module")
def dim0(spark):
    snap = spark.createDataFrame(
        [
            (1, _ts(1), "lyon", "gold"),
            (2, _ts(1), "oslo", "silver"),
            (3, _ts(2), "kiel", "bronze"),
        ],
        "supp_id long, ts timestamp, city string, tier string",
    )
    return scd2_init(snap, KEYS, TS, TRACKED)


def _rows(df):
    return {
        (r.supp_id, r.valid_from, r.valid_to, r.is_current, r.city, r.tier)
        for r in df.collect()
    }


def test_init_all_open(dim0):
    got = _rows(dim0)
    assert len(got) == 3
    assert all(r[2] is None and r[3] for r in got)


def test_apply_closes_and_opens(spark, dim0):
    updates = spark.createDataFrame(
        [
            (1, _ts(5), "lyon", "platinum"),   # tier change
            (2, _ts(6), "oslo", "silver"),     # re-stated: NOT a change
            (4, _ts(7), "bern", "gold"),       # brand-new key
        ],
        "supp_id long, ts timestamp, city string, tier string",
    )
    dim1 = scd2_apply(dim0, updates, KEYS, TS, TRACKED)
    rows = _rows(dim1)
    # key 1: closed old version [d1, d5), open new one
    assert (1, _ts(1), _ts(5), False, "lyon", "gold") in rows
    assert (1, _ts(5), None, True, "lyon", "platinum") in rows
    # key 2: untouched single open version (re-statement absorbed)
    assert (2, _ts(1), None, True, "oslo", "silver") in rows
    # key 4: new open version
    assert (4, _ts(7), None, True, "bern", "gold") in rows
    assert len(rows) == 5

    # as-of reads reconstruct both states
    before = {
        (r.supp_id, r.tier) for r in scd2_as_of(dim1, _ts(3)).collect()
    }
    assert (1, "gold") in before and (4, "gold") not in before
    after = {
        (r.supp_id, r.tier) for r in scd2_as_of(dim1, _ts(8)).collect()
    }
    assert (1, "platinum") in after and (4, "gold") in after


def test_multi_update_batch_matches_duckdb(spark, dim0):
    """Several updates for one key in one batch splice in ts order —
    replayed by a DuckDB window query over the same union."""
    updates = spark.createDataFrame(
        [
            (1, _ts(3), "lyon", "silver"),
            (1, _ts(9), "nice", "silver"),
            (1, _ts(6), "lyon", "gold"),  # out-of-order arrival
            (3, _ts(4), "kiel", "bronze"),  # re-statement
        ],
        "supp_id long, ts timestamp, city string, tier string",
    )
    dim1 = scd2_apply(dim0, updates, KEYS, TS, TRACKED)

    import duckdb

    con = duckdb.connect()
    base = [
        (1, "2026-01-01", "lyon", "gold"),
        (2, "2026-01-01", "oslo", "silver"),
        (3, "2026-01-02", "kiel", "bronze"),
        (1, "2026-01-03", "lyon", "silver"),
        (1, "2026-01-09", "nice", "silver"),
        (1, "2026-01-06", "lyon", "gold"),
        (3, "2026-01-04", "kiel", "bronze"),
    ]
    vals = ", ".join(
        f"({k}, TIMESTAMP '{t}', '{c}', '{tr}')" for k, t, c, tr in base
    )
    want = set(
        con.execute(
            f"""
            WITH chain AS (SELECT * FROM (VALUES {vals}) t(supp_id, vf, city, tier)),
            d AS (
              SELECT *, lag(city || '|' || tier) OVER
                     (PARTITION BY supp_id ORDER BY vf, city, tier) AS prev
              FROM chain
            ),
            kept AS (SELECT * FROM d WHERE prev IS NULL OR prev <> city || '|' || tier)
            SELECT supp_id, vf,
                   lead(vf) OVER (PARTITION BY supp_id ORDER BY vf, city, tier) AS vt,
                   city, tier
            FROM kept
            """
        ).fetchall()
    )
    con.close()
    got = {
        (r.supp_id, r.valid_from, r.valid_to, r.city, r.tier)
        for r in dim1.collect()
    }
    assert got == want


def test_late_update_against_closed_history_raises(spark, dim0):
    first = spark.createDataFrame(
        [(1, _ts(5), "lyon", "platinum")],
        "supp_id long, ts timestamp, city string, tier string",
    )
    dim1 = scd2_apply(dim0, first, KEYS, TS, TRACKED)
    stale = spark.createDataFrame(
        [(1, _ts(2), "lyon", "iron")],
        "supp_id long, ts timestamp, city string, tier string",
    )
    with pytest.raises(ValueError, match="predates closed history"):
        scd2_apply(dim1, stale, KEYS, TS, TRACKED)
    # but an update between the open version's start and now is fine
    ok = spark.createDataFrame(
        [(1, _ts(8), "lyon", "gold")],
        "supp_id long, ts timestamp, city string, tier string",
    )
    dim2 = scd2_apply(dim1, ok, KEYS, TS, TRACKED)
    assert (1, _ts(8), None, True, "lyon", "gold") in _rows(dim2)
