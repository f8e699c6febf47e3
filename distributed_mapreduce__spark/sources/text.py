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
