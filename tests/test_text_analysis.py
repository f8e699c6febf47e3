"""Unicode portability of the rolling fingerprint: Spark's split('') +
ascii() must walk full code points exactly like DuckDB's string_split +
ord — pinned here on non-ASCII and astral-plane (emoji) inputs, which
the ASCII-only fixture corpus can't exercise.

Empty-document contract: both engines split '' into [''], but Spark's
ascii('') is 0 while DuckDB's ord('') is -1 — the oracle clamps with
greatest(ord(ch), 0) so an empty doc fingerprints to 0 in both."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.text_analysis import (
    FP_BASE,
    FP_MOD,
    rolling_fingerprint,
)

TEXTS = [
    "plain ascii text",
    "héllo wörld — accented + punctuation",
    "日本語テキストの行",
    "mixed: café 日本 und emoji 😀🚀 end",
    "𝕬𝖘𝖙𝖗𝖆𝖑 mathematical alphanumerics",
    "",
]


def test_fingerprint_matches_duckdb_on_unicode(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.fingerprint for r in rolling_fingerprint(docs).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", list(enumerate(TEXTS)))
    want = dict(
        con.execute(
            f"""
            SELECT doc_id,
                   list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                                  list_transform(string_split(text, ''),
                                                 ch -> CAST(greatest(ord(ch), 0) AS BIGINT))),
                     (acc, c) -> (acc * {FP_BASE} + c) % {FP_MOD}) AS fp
            FROM docs
            """
        ).fetchall()
    )
    assert got == want
