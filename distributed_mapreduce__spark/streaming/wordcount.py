"""Streaming word count — the reference's one job (SURVEY.md §2.1 Q1)
as a Structured Streaming query.

The reference processes a fixed file list once; the streaming form is
the same four declarative transforms over a file-replay source, with
complete-mode aggregation state standing in for the master's merge step
(master/master.go:258-285). Batch/stream equality is the test contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.wordcount import word_counts

_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def stream_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word → count over the documents replay; run with outputMode
    'complete' (word counts are a running global aggregate)."""
    return word_counts(read_documents_stream(spark, sf_dir), text_col="text")
