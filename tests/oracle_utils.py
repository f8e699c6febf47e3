"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL over the same parquet
fixtures and compares row count, column names, and an order-insensitive
multiset of normalized values. Stricter locally than the driver needs to
be: floats must agree to 1e-9 relative (queries that can't guarantee that
cross-engine use decimal/rounding in BOTH sides instead).
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_value(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    if isinstance(v, float) and v != v:  # NaN sorts/compares as marker
        return "NaN"
    return v


def _rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(_norm_value(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


def _approx_eq(a, b, rel=1e-9, abs_tol=1e-9) -> bool:
    if isinstance(a, float) and isinstance(b, (float, int)):
        return math.isclose(a, float(b), rel_tol=rel, abs_tol=abs_tol)
    if isinstance(b, float) and isinstance(a, (float, int)):
        return math.isclose(float(a), b, rel_tol=rel, abs_tol=abs_tol)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_approx_eq(x, y) for x, y in zip(a, b))
    return a == b


def compare_query(
    spark, sf_dir: str, spark_df, oracle_sql: str,
    allow_empty: bool = False,
) -> None:
    """Assert Spark result ≍ DuckDB oracle result (order-insensitive).

    A comparison where BOTH sides return zero rows verified nothing —
    rows/schema/hash pass vacuously whatever the query computes (the
    round-12 ``hidden_partition_agg`` hole: a date window outside the
    data's range sailed green until the sf1 replay caught it). Such a
    result now FAILS unless the caller opts in with
    ``allow_empty=True`` for a genuinely expected-empty check."""
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]

    con = duck_connect(sf_dir)
    res = con.execute(oracle_sql)
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    assert s_rows or allow_empty, (
        "vacuous oracle comparison: both sides returned 0 rows, so the "
        "check verified nothing — fix the query/fixture window, or opt "
        "in explicitly with allow_empty=True"
    )

    s_norm = _rows_to_multiset(s_rows, s_cols)
    d_norm = _rows_to_multiset(d_rows, d_cols)
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if not _approx_eq(a, b)
    ]
    assert not mismatches, (
        f"{len(mismatches)} value mismatches; first 3: {mismatches[:3]}"
    )
