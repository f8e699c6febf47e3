"""Multi-dimensional data layout (Z-order clustering) for scan pruning.

Parquet/Delta-style data skipping works off per-file min/max column
stats: a file whose [min, max] misses the predicate range is never
read. A linear sort clusters ONE column perfectly and leaves every
other column's per-file range at ~the full domain. Interleaving the
bits of several columns (a Z-order / Morton curve) bounds EVERY
dimension's per-file range, so selective multi-column (or
either-column) predicates skip most files.

Pipeline (all engine-side except one tiny sketch collect):
1. Per column, ``approxQuantile`` yields 2**bits quantile boundaries —
   a driver-side array of a few dozen doubles (the same
   KLL/Greenwald-Khanna sketch pass a 100 TB job would run; NOT a data
   collect).
2. Each value maps to its quantile bucket via a literal-array binary
   search fold — pure column algebra, no UDF. Quantile (not
   uniform-width) binning keeps the curve balanced under skew.
3. Bucket bits interleave into the Morton code ``z``:
   bit i of column d lands at position ``i * ndims + d``.
4. ``repartitionByRange(n, z)`` + ``sortWithinPartitions(z)`` gives
   each output file a compact z-range, hence a compact range in every
   constituent column.

At 100 TB: one sketch pass + one range shuffle — the same cost shape as
any global sort; the win is amortized over every subsequent scan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(col: str, boundaries: Sequence[float]) -> Column:
    """0-based quantile-bucket index: #boundaries strictly below value.

    ``boundaries`` are the interior quantile cuts (len = 2**bits - 1),
    broadcast as an array literal; the fold is JVM-side."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(F.col(col) > b, 1).otherwise(0),
    )


def zorder_code(buckets: Sequence[Column], bits: int) -> Column:
    """Morton code from per-dimension bucket indices (bit interleave)."""
    ndims = len(buckets)
    z = F.lit(0).cast("long")
    for d, bucket in enumerate(buckets):
        b = bucket.cast("long")
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)), i * ndims + d
            )
    return z


def zorder_by(
    df: DataFrame,
    cols: Sequence[str],
    n_files: int,
    bits: int = 4,
    rel_err: float = 0.01,
) -> DataFrame:
    """Cluster ``df`` on the Z-order curve over ``cols``.

    Returns the range-partitioned, z-sorted DataFrame (write it with
    any sink); ``n_files`` output partitions. ``bits`` quantile bits
    per dimension (2**bits buckets)."""
    probs = [i / 2**bits for i in range(1, 2**bits)]
    buckets = []
    for c in cols:
        cuts = df.approxQuantile(c, probs, rel_err)
        buckets.append(_bucket_expr(c, cuts))
    with_z = df.withColumn("_z", zorder_code(buckets, bits))
    return (
        with_z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def file_stats(spark, path: str, cols: Sequence[str]) -> DataFrame:
    """Per-file min/max for ``cols`` — the stats a footer-based pruner
    consults, materialized here for layout-quality measurement."""
    df = spark.read.parquet(path)
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def files_overlapping(
    stats: list, col: str, lo: float, hi: float
) -> int:
    """How many files a [lo, hi] predicate on ``col`` must read."""
    return sum(
        1
        for r in stats
        if not (r[f"{col}_max"] < lo or r[f"{col}_min"] > hi)
    )


# --- bucketed tables: co-located joins without a shuffle ------------------


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-bucketed)
    parquet table — the pre-shuffled layout for repeated joins and
    aggregations on ``bucket_cols``.

    At 100 TB the dominant recurring cost of a star-schema workload is
    re-shuffling the fact table for every join/agg on its key. Spark's
    bucketing (Hive-compatible ``Murmur3(key) % n_buckets`` file
    assignment, recorded in the catalog) pays that shuffle ONCE at
    write time: a subsequent join of two tables bucketed into the same
    ``n_buckets`` on the join key — or a groupBy on the bucket key —
    reads each bucket as a pre-partitioned input and the plan carries
    ZERO Exchange for that key (``test_bucketed_layout.py`` pins the
    plan). ``sort_cols`` additionally sorts within each bucket file,
    letting sort-merge joins skip their sort.

    ``path`` makes it an EXTERNAL table: data lives at the given
    location; only metadata (bucket spec) goes through the session
    catalog — the catalog entry is what tells the planner the files
    are pre-partitioned, which a bare ``.parquet(path)`` write cannot
    convey. Pick ``n_buckets`` so one bucket of the LARGER table is a
    few hundred MB (e.g. 100 TB fact / 4096 buckets ≈ 25 GB per bucket
    spread over its files); both sides of a planned join must use the
    SAME bucket count, or Spark re-shuffles the mismatched side.
    """
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
