"""PII scrub: DuckDB runs the identical patterns (with its 'g' flag)
over both the fixture corpus and planted-PII docs; plus direct
assertions on what gets masked and what survives."""

from __future__ import annotations

import duckdb

from distributed_mapreduce__spark.operators.pii import (
    PII_CLASSES,
    pii_scrub,
)
from distributed_mapreduce__spark.sources.tables import load_table
from tests.oracle_utils import compare_query

SF = "/root/testdata/sf0.01"


def _oracle_sql(table: str = "documents") -> str:
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{p}')) AS INTEGER) AS n_{n}"
        for n, p, _ in PII_CLASSES
    )
    red = "text"
    for _, p, mask in PII_CLASSES:
        red = f"regexp_replace({red}, '{p}', '{mask}', 'g')"
    return f"SELECT doc_id, {counts}, {red} AS redacted FROM {table}"


PLANTED = [
    (1, "contact bob.smith+spam@example.co.uk or call +1 555-867-5309 now"),
    (2, "server at 192.168.0.1 and 10.0.0.255, backup 256.1.1.1"),
    (3, "no identifiers here, just prose with numbers like 42 and 7"),
    (4, "a@b.io a@b.io duplicate emails; phone (020) 7946-0958"),
    (5, ""),
]


def test_pii_matches_oracle_on_corpus(spark):
    docs = load_table(spark, SF, "documents")
    compare_query(spark, SF, pii_scrub(docs), _oracle_sql())


def test_pii_matches_oracle_on_planted_docs(spark):
    docs = spark.createDataFrame(PLANTED, "doc_id long, text string")
    got = sorted(map(tuple, pii_scrub(docs).collect()))

    con = duckdb.connect()
    con.execute("CREATE TABLE planted (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO planted VALUES (?, ?)", PLANTED)
    want = sorted(con.execute(_oracle_sql("planted")).fetchall())
    assert got == want


def test_pii_masking_behavior(spark):
    docs = spark.createDataFrame(PLANTED, "doc_id long, text string")
    rows = {r.doc_id: r for r in pii_scrub(docs).collect()}

    r1 = rows[1]
    assert r1.n_emails == 1 and r1.n_phones == 1
    assert "<EMAIL>" in r1.redacted and "<PHONE>" in r1.redacted
    assert "example.co.uk" not in r1.redacted
    assert "555" not in r1.redacted

    r2 = rows[2]
    assert r2.n_ips == 3  # regex is shape-based: 256.1.1.1 still masks
    assert r2.redacted.count("<IP>") == 3

    r3 = rows[3]
    assert (r3.n_emails, r3.n_ips, r3.n_phones) == (0, 0, 0)
    assert r3.redacted == PLANTED[2][1]  # untouched

    r4 = rows[4]
    assert r4.n_emails == 2 and r4.redacted.count("<EMAIL>") == 2
    assert r4.n_phones == 1

    assert rows[5].redacted == ""
