"""Partitioning helpers.

A small parquet file arrives as ONE scan partition, which serializes all
per-row compute (explode/hash/fold chains) onto one core until the first
shuffle — the dominant cost for the text/vector operators on the test
fixtures. At 100 TB the scan has thousands of splits and this is moot;
``spread`` encodes that adaptively: it widens only when the scan under-
parallelizes the session, and never narrows an already-parallel input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    """Repartition up to session parallelism iff the plan currently has
    fewer partitions (round-robin; one cheap narrow-input shuffle)."""
    if df.isStreaming:  # micro-batch sizing is the stream scheduler's job
        return df
    cores = df.sparkSession.sparkContext.defaultParallelism
    target = max(1, int(cores * min_factor))
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
