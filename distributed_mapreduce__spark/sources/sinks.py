"""Sinks (reference operators O7/O10/O14, SURVEY.md §2.1).

The reference materializes JSON-lines intermediates (mr-<m>-<r>,
mapreduce/mapreduce.go:66-84) and text outputs (mr-out-<r> :108-123,
mr-final.txt master/master.go:300-311). Spark manages its own shuffle,
so the only user-visible sinks we provide are *result* writers:

- JSON-lines        — format parity with the reference's intermediates.
- partitioned parquet — THE 100 TB sink: downstream scans prune on the
  partition columns (verify via PartitionFilters in explain).
- bucketed table    — pre-shuffled storage: later joins/aggs on the
  bucket key skip their exchange entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_json_lines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """One JSON object per line (the reference's intermediate format)."""
    df.write.mode(mode).json(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, *partition_cols: str, mode: str = "overwrite"
) -> None:
    """Hive-style directory partitioning; keep partition cardinality
    bounded (≤ ~10k dirs) and files ≥ ~100 MB at scale."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    n_buckets: int,
    *bucket_cols: str,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed + sorted table: co-locates rows by key so a later
    join/agg on ``bucket_cols`` reads shuffle-free (pinned by
    tests/test_sinks_and_stream_wc.py on the physical plan). ``path``
    makes it external (data at ``path``, metadata in the catalog)."""
    w = (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
