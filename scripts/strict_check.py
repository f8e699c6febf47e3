#!/usr/bin/env python3
"""Strict bit-exact oracle checker — mirrors the driver's hash compare.

Unlike tests/oracle_utils.compare_query (float-TOLERANT, for local
development), this stringifies every cell with repr() and demands exact
equality of the sorted normalized tuple multisets, columns sorted by
name — the same discipline as the driver's value-hash. A float that is
off by 1 ULP fails here, exactly as it would fail the driver.

Usage:
    python scripts/strict_check.py [--scale] [sf_dir] [query ...]
defaults: /root/testdata/sf0.01, all queries that have an oracle.

``--scale`` is the 10x-correctness gate (VERDICT r4 item 2): run as
``python scripts/strict_check.py --scale testdata_sf1`` to replay
every oracle against the 10x fixtures — catching overflow / precision
/ collation drift that sf0.01 can't see — skipping (and naming) only
the queries whose DuckDB oracle is documented O(N^2) brute force.
"""

from __future__ import annotations

import datetime as dt
import decimal
import sys

sys.path.insert(0, ".")


def norm(v):
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


#: Queries whose DUCKDB ORACLE is documented O(N^2) brute force — the
#: oracle (not the Spark query) is infeasible at the 10x fixtures
#: (embeddings=20k at sf1 → 2e8 scored pairs of 64-d list folds).
#: `--scale` skips exactly these, named in the output so the gap is
#: visible, and checks everything else bit-exact.
QUADRATIC_ORACLES = ("embedding_neardup",)


def main() -> int:
    import time

    args = [a for a in sys.argv[1:] if a != "--scale"]
    scale_mode = "--scale" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    from distributed_mapreduce__spark import registry
    from distributed_mapreduce__spark.session import get_spark
    from tests.oracle_utils import duck_connect

    registry.load_all()
    names = args[1:] or [n for n in registry.QUERIES if n in registry.ORACLES]
    spark = get_spark()
    con = duck_connect(sf_dir)
    n_bad = 0
    for name in names:
        if name not in registry.ORACLES:
            print(f"{name}: SKIP (no oracle)")
            continue
        if scale_mode and name in QUADRATIC_ORACLES:
            print(f"{name}: SKIP (oracle is O(N^2) brute force — "
                  "infeasible at scale fixtures; exact baseline is "
                  "checked at sf0.01)")
            continue
        t0 = time.time()
        try:
            sdf = registry.QUERIES[name](spark, sf_dir)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
            res = con.execute(registry.ORACLES[name])
            d_cols = [c[0].lower() for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERR {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"{name}: SCHEMA MISMATCH spark={sorted(s_cols)} duck={sorted(d_cols)}")
            n_bad += 1
            continue
        sm, dm = multiset(s_rows, s_cols), multiset(d_rows, d_cols)
        if sm == dm:
            print(f"{name}: OK ({len(s_rows)} rows bit-exact, "
                  f"{time.time() - t0:.1f}s)")
        else:
            n_bad += 1
            diff = [(a, b) for a, b in zip(sm, dm) if a != b]
            print(f"{name}: VALUE MISMATCH rows spark={len(sm)} duck={len(dm)}; "
                  f"first diffs: {diff[:3]}")
    print(f"strict_check: {n_bad} failures / {len(names)} queries")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
