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


def test_compression_ratio_matches_zlib_replay(spark):
    import zlib

    import pytest

    from distributed_mapreduce__spark.operators.text_analysis import (
        compression_ratio,
    )
    from distributed_mapreduce__spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    got = {
        r.doc_id: (r.compressed_len, r.compression_ratio)
        for r in compression_ratio(docs).collect()
    }
    for r in docs.collect():
        want_len = len(zlib.compress(r.text.encode("utf-8"), 6))
        raw = len(r.text.encode("utf-8"))
        assert got[r.doc_id][0] == want_len, r.doc_id
        assert got[r.doc_id][1] == pytest.approx(want_len / raw, abs=1e-12)
    # long repetitive prose compresses into (0, 1); short docs can
    # exceed 1 on stream overhead, which is why the signal is used
    # with a length floor in practice
    long_ratios = [
        got[r.doc_id][1]
        for r in docs.collect()
        if len(r.text.encode("utf-8")) >= 200
    ]
    assert long_ratios and all(0 < v < 1 for v in long_ratios)


def test_compression_ratio_null_and_empty(spark):
    from distributed_mapreduce__spark.operators.text_analysis import (
        compression_ratio,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "spam spam spam spam spam spam spam spam")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in compression_ratio(df).collect()}
    assert rows[1].compressed_len is None and rows[1].compression_ratio is None
    assert rows[2].compressed_len is not None  # 8-byte empty stream
    assert rows[2].compression_ratio is None   # 0 raw bytes -> NULL
    # highly repetitive text compresses hard
    assert rows[3].compression_ratio < 0.6
