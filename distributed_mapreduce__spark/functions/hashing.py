"""Deterministic, engine-portable hashing helpers.

The reference hash-partitions shuffle data with FNV-1a
(mapreduce/mapreduce.go:24-28); partition assignment is not observable in
results, so we use Spark's own Murmur3 shuffle hashing (SURVEY.md §2.1 O6:
"do not reproduce FNV"). Where a *semantically observable* hash is needed
(minhash signatures, LSH buckets, fingerprints), we use md5 — available
and bit-identical in both Spark and the DuckDB oracle, which lets fuzzy
dedup / LSH be correctness-checked cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column | str, seed: int = 0) -> Column:
    """63-bit non-negative integer hash derived from md5(seed||value).

    ``conv(substr(md5, 1, 15), 16, 10)`` keeps 60 bits — small enough to
    fit a BIGINT exactly in both Spark and DuckDB (no overflow wrap to
    disagree on).
    """
    c = F.col(col) if isinstance(col, str) else col
    seeded = F.concat(F.lit(f"{seed}:"), c)
    return F.conv(F.substring(F.md5(seeded), 1, 15), 16, 10).cast("long")


def stable_bucket(col: Column | str, n_buckets: int, seed: int = 0) -> Column:
    """Deterministic bucket id in [0, n_buckets) — portable across engines."""
    return md5_long(col, seed) % F.lit(n_buckets)
