#!/usr/bin/env python3
"""Generate a scaled copy of the driver's sf0.1 fixtures for the
local order-of-magnitude scale proofs (SCALE.md appendices).

TPC-H-ish tables are scaled by key-shifted replication of sf0.1
(``--copies`` copies with disjoint key ranges — distribution-
preserving, join-consistent; region/nation stay fixed like real
TPC-H). The synthetic tables (documents / embeddings / events) are
regenerated at the scaled size with the same schemas, vocabularies,
and physical types — events.ts mirrors the source fixture's current
timestamp flavor (the generator has drifted across rounds) so the
footer-sniffed read path is exercised identically.

Default: the round-4 10x step (testdata_sf1, ~500 MB, all tables).
Round 11's 100x step: ``--copies 100 --out testdata_sf10 --skip
events,embeddings`` (~2 GB; the sf10 replay needs the TPC-H tables
and documents only). All outputs are gitignored. Deterministic
(seeded); rerunning overwrites in place.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "testdata_sf1")
COPIES = 10

# Key-space sizes at sf0.1 (max key + 1), used as per-copy shifts.
SHIFTS = {"custkey": 15_000, "orderkey": 150_000, "partkey": 20_000,
          "suppkey": 1_000}


def tpch_tables(con: duckdb.DuckDBPyConnection) -> None:
    con.execute(f"COPY (SELECT * FROM '{SRC}/region.parquet') TO "
                f"'{OUT}/region.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY (SELECT * FROM '{SRC}/nation.parquet') TO "
                f"'{OUT}/nation.parquet' (FORMAT PARQUET)")
    plans = {
        "customer": "SELECT c_custkey + {i} * {custkey} AS c_custkey, "
                    "c_name, c_nationkey, c_acctbal, c_mktsegment "
                    "FROM '{src}/customer.parquet'",
        "supplier": "SELECT s_suppkey + {i} * {suppkey} AS s_suppkey, "
                    "s_name, s_nationkey, s_acctbal "
                    "FROM '{src}/supplier.parquet'",
        "part": "SELECT p_partkey + {i} * {partkey} AS p_partkey, p_name, "
                "p_brand, p_type, p_size, p_retailprice "
                "FROM '{src}/part.parquet'",
        "orders": "SELECT o_orderkey + {i} * {orderkey} AS o_orderkey, "
                  "o_custkey + {i} * {custkey} AS o_custkey, o_orderstatus, "
                  "o_totalprice, o_orderdate, o_orderpriority "
                  "FROM '{src}/orders.parquet'",
        "lineitem": "SELECT l_orderkey + {i} * {orderkey} AS l_orderkey, "
                    "l_partkey + {i} * {partkey} AS l_partkey, "
                    "l_suppkey + {i} * {suppkey} AS l_suppkey, "
                    "l_linenumber, l_quantity, l_extendedprice, l_discount, "
                    "l_tax, l_returnflag, l_linestatus, l_shipdate "
                    "FROM '{src}/lineitem.parquet'",
    }
    for table, tmpl in plans.items():
        selects = " UNION ALL ".join(
            tmpl.format(i=i, src=SRC, **SHIFTS) for i in range(COPIES)
        )
        con.execute(f"COPY ({selects}) TO '{OUT}/{table}.parquet' "
                    "(FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")


def documents(
    con: duckdb.DuckDBPyConnection, rng: np.random.Generator
) -> None:
    vocab = [r[0] for r in con.execute(
        f"SELECT DISTINCT unnest(string_split(text, ' ')) FROM "
        f"'{SRC}/documents.parquet'").fetchall() if r[0]]
    vocab = sorted(vocab)
    langs = ["en", "de", "es", "fr", "zh"]
    lang_p = [0.41, 0.14, 0.15, 0.15, 0.15]
    n_docs = 5_000 * COPIES
    lengths = rng.integers(8, 101, size=n_docs)
    lang_ix = rng.choice(len(langs), size=n_docs, p=lang_p)
    words = rng.choice(vocab, size=int(lengths.sum()))
    texts, pos = [], 0
    for ln in lengths:
        texts.append(" ".join(words[pos:pos + ln]))
        pos += ln
    # Plant NEAR-DUPLICATES (round 13): the driver's own fixtures pair
    # up organically (skewed word draw), but a uniform draw over this
    # vocabulary makes jaccard>=0.5 pairs vanishingly rare — which
    # left dedup_minhash_pairs verifying a 0-row result at sf1 (the
    # exact vacuous-green the new oracle guard now refuses). The last
    # 2% of docs become one-word-mutated copies of earlier LONG docs:
    # deterministic, exact-dup-free, and guaranteed high-jaccard.
    n_dup = n_docs // 50
    long_ix = [i for i, t in enumerate(texts[: n_docs - n_dup])
               if len(t.split()) >= 30]
    src_ix = rng.choice(len(long_ix), size=n_dup)
    for k in range(n_dup):
        src = texts[long_ix[int(src_ix[k])]].split()
        p = int(rng.integers(0, len(src)))
        repl = str(rng.choice(vocab))
        if repl == src[p]:  # mutation must CHANGE the text
            repl = vocab[(vocab.index(repl) + 1) % len(vocab)]
        src[p] = repl
        texts[n_docs - n_dup + k] = " ".join(src)
    tbl = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array([langs[i] for i in lang_ix]),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{OUT}/documents.parquet")
    print(f"documents: {n_docs} rows")


def embeddings(rng: np.random.Generator) -> None:
    n, dim = 2_000 * COPIES, 64
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n), pa.int32()),
    })
    pq.write_table(tbl, f"{OUT}/embeddings.parquet")
    print(f"embeddings: {n} rows")


def events(rng: np.random.Generator) -> None:
    n = 100_000 * COPIES
    start_ns = np.datetime64("2024-01-01T00:00:00", "ns").astype(np.int64)
    span_ns = 30 * 24 * 3600 * 10**9
    ts = np.sort(start_ns + rng.integers(0, span_ns, size=n))
    types = np.array(["view", "click", "purchase", "signup", "error"])
    # mirror the CURRENT sf0.1 ts flavor (the generator has drifted
    # across rounds: ns → µs-NTZ) so the scale proof exercises the same
    # read path the driver's data does
    src_ts_type = pq.ParquetFile(f"{SRC}/events.parquet").schema_arrow.field(
        "ts"
    ).type
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts).cast(pa.timestamp("ns")).cast(src_ts_type, safe=False),
        "user_id": pa.array(rng.integers(1, 15_001, size=n), pa.int64()),
        "event_type": pa.array(types[rng.integers(0, 5, size=n)]),
        "value": pa.array(np.round(rng.exponential(50.0, size=n), 2)),
        "props": pa.array([f'{{"k": {int(k)}}}'
                           for k in rng.integers(0, 100, size=n)]),
    })
    pq.write_table(tbl, f"{OUT}/events.parquet")
    print(f"events: {n} rows")


def main() -> int:
    global OUT, COPIES
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=COPIES,
                    help="sf0.1 multiples to generate (default 10)")
    ap.add_argument("--out", default=OUT,
                    help="output dir (relative = under the repo root)")
    ap.add_argument("--skip", default="",
                    help="comma list of synthetic tables to skip "
                         "(documents,embeddings,events)")
    args = ap.parse_args()
    COPIES = args.copies
    OUT = args.out if os.path.isabs(args.out) else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), args.out
    )
    skip = {s.strip() for s in args.skip.split(",") if s.strip()}
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    rng = np.random.default_rng(42)
    tpch_tables(con)
    if "documents" not in skip:
        documents(con, rng)
    if "embeddings" not in skip:
        embeddings(rng)
    if "events" not in skip:
        events(rng)
    sizes = {f: round(os.path.getsize(os.path.join(OUT, f)) / 2**20, 1)
             for f in sorted(os.listdir(OUT))}
    print(json.dumps({"out": OUT, "copies": COPIES, "mb": sizes}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
