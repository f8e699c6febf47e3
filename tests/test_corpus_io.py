"""Corpus ingest/export edges: jsonl reading with corrupt-line
quarantine (DuckDB parity on the good rows), and bounded-size shard
export with a row-count manifest."""

from __future__ import annotations

import glob
import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.sources.sinks import write_training_shards
from distributed_mapreduce__spark.sources.text import read_jsonl_corpus

GOOD = [
    {"doc_id": 1, "text": "alpha beta", "lang": "en"},
    {"doc_id": 2, "text": "gamma", "lang": "de"},
    {"doc_id": 3, "text": "", "lang": "en"},
]
BAD_LINES = ['{"doc_id": 4, "text": "trunca', "not json at all"]


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "corpus"
    p.mkdir()
    with open(p / "shard-0.jsonl", "w") as f:
        for row in GOOD[:2]:
            f.write(json.dumps(row) + "\n")
        f.write(BAD_LINES[0] + "\n")
    with open(p / "shard-1.jsonl", "w") as f:
        f.write(json.dumps(GOOD[2]) + "\n")
        f.write(BAD_LINES[1] + "\n")
    return str(p)


def test_jsonl_good_rows_match_duckdb(spark, jsonl_dir):
    df = read_jsonl_corpus(
        spark, jsonl_dir + "/*.jsonl", "doc_id bigint, text string, lang string"
    )
    good = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    got = sorted(map(tuple, good.collect()))
    con = duckdb.connect()
    # DuckDB's ignore_errors yields an all-NULL row per bad line rather
    # than dropping it — exclude those to compare the salvaged rows
    want = sorted(
        con.execute(
            f"SELECT doc_id, text, lang FROM read_json_auto('{jsonl_dir}/*.jsonl', "
            "ignore_errors=true) WHERE doc_id IS NOT NULL"
        ).fetchall()
    )
    assert got == want
    assert len(got) == len(GOOD)


def test_jsonl_corrupt_lines_quarantined_not_fatal(spark, jsonl_dir):
    df = read_jsonl_corpus(
        spark, jsonl_dir + "/*.jsonl", "doc_id bigint, text string, lang string"
    )
    bad = df.filter(F.col("_corrupt").isNotNull())
    assert sorted(r._corrupt for r in bad.collect()) == sorted(BAD_LINES)
    # funnel-style accounting: total = good + quarantined
    assert df.count() == len(GOOD) + len(BAD_LINES)


def test_training_shards_bounded_and_manifested(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.md5(F.col("id").cast("string")).alias("text")
    )
    manifest = write_training_shards(df, out, rows_per_shard=128, shard_key="doc_id")
    rows = manifest.collect()
    # every shard within budget, totals conserved
    assert all(r.n_rows <= 128 for r in rows)
    assert sum(r.n_rows for r in rows) == 1000
    # manifest on disk is ONE real JSON-lines FILE (not a directory) a
    # loader can open at the advertised path, and it matches the
    # returned DataFrame
    mpath = os.path.join(out, "_manifest.json")
    assert os.path.isfile(mpath)
    with open(mpath) as fh:
        disk = [json.loads(line) for line in fh if line.strip()]
    assert sorted((d["shard"], d["n_rows"]) for d in disk) == sorted(
        (r.shard, r.n_rows) for r in rows
    )
    listed = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(out, "*.parquet"))
    }
    assert {r.shard for r in rows} == listed
    # reread equals the input
    assert spark.read.parquet(out).count() == 1000


def test_csv_corpus_quarantines_bad_rows(spark, tmp_path):
    """CSV ingest: good rows parse, malformed rows (wrong arity /
    unparseable types) are quarantined whole into _corrupt — same
    funnel accounting as the jsonl reader."""
    from distributed_mapreduce__spark.sources.text import read_csv_corpus

    p = tmp_path / "meta.csv"
    p.write_text(
        "doc_id,lang,score\n"
        "1,en,0.9\n"
        "2,fr,0.5\n"
        "not-a-number,xx,oops\n"   # doc_id/score unparseable
        "3,de,0.7\n"
    )
    df = read_csv_corpus(
        spark, str(p), "doc_id bigint, lang string, score double"
    )
    good = df.filter(F.col("_corrupt").isNull())
    # NB: count()/select on ONLY the corrupt column is disallowed by
    # Spark on raw CSV scans — touch full rows (see reader docstring)
    bad = df.filter(F.col("_corrupt").isNotNull()).collect()
    assert sorted(r.doc_id for r in good.collect()) == [1, 2, 3]
    assert len(bad) == 1
    assert "not-a-number" in bad[0]._corrupt
    # TSV flavor
    t = tmp_path / "meta.tsv"
    t.write_text("doc_id\tlang\n7\ten\n")
    tsv = read_csv_corpus(spark, str(t), "doc_id bigint, lang string", sep="\t")
    assert tsv.filter(F.col("_corrupt").isNull()).first().doc_id == 7
