"""Text-file sources (reference operator O1, SURVEY.md §2.1).

The reference reads one whole input file per map task
(mapreduce/mapreduce.go:59-65, ``os.ReadFile``; one MapTask per file at
master/master.go:50-62). Spark's line-oriented ``spark.read.text`` is the
scalable equivalent: files are split into partitions at block boundaries,
so a single 1 TB file parallelizes instead of pinning one task. For
operators that genuinely need file granularity (per-document semantics),
``read_whole_files`` exposes (path, content) rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_corpus(spark: SparkSession, paths: Sequence[str] | str) -> DataFrame:
    """Line-per-row text scan → DataFrame[value: string].

    File boundaries are irrelevant for bag-of-words semantics (the
    reference's per-file map tasks are a parallelization detail, not a
    semantic one), so the splittable line scan is strictly better.
    """
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.text(list(paths))


def read_whole_files(spark: SparkSession, paths: Sequence[str] | str) -> DataFrame:
    """File-per-row scan → DataFrame[path: string, content: string].

    Mirrors the reference's one-file-one-map-task input model
    (master/master.go:50-62). Built on ``wholeTextFiles`` — only for
    corpora of many small files; large files should use
    :func:`read_text_corpus` which splits.
    """
    if isinstance(paths, str):
        paths = [paths]
    rdd = spark.sparkContext.wholeTextFiles(",".join(paths))
    return rdd.toDF(["path", "content"]).select(
        F.col("path"), F.col("content")
    )


def read_jsonl_corpus(
    spark: SparkSession,
    paths: Sequence[str] | str,
    schema: str,
    corrupt_col: str = "_corrupt",
) -> DataFrame:
    """JSON-lines corpus reader — the interchange format LLM corpora
    actually ship in (one document object per line).

    ``schema`` is REQUIRED (e.g. ``"doc_id bigint, text string"``):
    schema inference is a full extra pass over the data, unacceptable at
    crawl scale, and silently widens types when shards disagree.

    Malformed lines (truncated shards, stray log output, encoding
    damage) do NOT fail the job: PERMISSIVE mode parses what it can and
    routes the raw offending line into ``corrupt_col`` (appended to the
    schema automatically), so the caller can count/quarantine bad rows
    — the funnel-style accounting a curation pipeline needs — instead
    of discovering them as a task failure three hours in. Good rows
    have ``corrupt_col`` NULL; fully-parsed corpora can just drop it.

    Scale: jsonl is line-splittable, so files parallelize at block
    granularity exactly like ``read_text_corpus``; column pruning still
    applies (Spark's JSON reader skips unrequested fields per row, and
    at rest you should convert to parquet with ``compact_parquet``
    anyway — this reader is the ingest edge, not the steady state).
    """
    if isinstance(paths, str):
        paths = [paths]
    return (
        spark.read.schema(f"{schema}, {corrupt_col} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(list(paths))
    )


def read_csv_corpus(
    spark: SparkSession,
    paths: Sequence[str] | str,
    schema: str,
    corrupt_col: str = "_corrupt",
    sep: str = ",",
    header: bool = True,
    multiline: bool = False,
) -> DataFrame:
    """CSV/TSV corpus reader with the same quarantine discipline as
    :func:`read_jsonl_corpus` — crawl metadata, label sheets, and
    index dumps still arrive as delimited text.

    ``schema`` is REQUIRED for the same reasons as jsonl (inference is
    an extra full pass and widens types shard-by-shard). Malformed rows
    land intact in ``corrupt_col`` under PERMISSIVE mode instead of
    failing the job, preserving funnel-style accounting.

    Scale notes: with ``multiline=False`` (default) files split at line
    boundaries and parallelize like any text scan. ``multiline=True``
    (quoted embedded newlines) makes each FILE one unsplittable task —
    only for small-file corpora; re-shard big multiline CSVs upstream.
    ``sep='\\t'`` reads TSV.

    Spark wart shared with the jsonl reader: a query whose referenced
    columns are ONLY ``corrupt_col`` is disallowed on raw CSV/JSON
    scans (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) —
    select at least one data column alongside it (or cache first) when
    counting quarantined rows.
    """
    if isinstance(paths, str):
        paths = [paths]
    return (
        spark.read.schema(f"{schema}, {corrupt_col} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("multiLine", str(multiline).lower())
        .csv(list(paths))
    )
