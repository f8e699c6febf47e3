"""Streaming deduplication (E1/E2 × Structured Streaming).

An ingestion pipeline dedups *as data arrives*, not in a nightly batch.
Two forms, both pure built-in operators:

- ``stream_exact_dedup`` — ``dropDuplicates`` on a content hash:
  unbounded state (every hash ever seen), exact forever. Right when
  the key space is bounded or the run is finite (a backfill).
- ``stream_dedup_within_watermark`` — ``dropDuplicatesWithinWatermark``
  on (key) with an event-time watermark: state is evicted once the
  watermark passes, so memory is bounded by the dedup horizon ×
  arrival rate — the 100 TB/day-safe form. Duplicates separated by
  more than the horizon are NOT caught (that's the contract: dedup
  within the replay/retry window, where real duplicates live).

The content hash is md5 (32-byte state keys instead of documents —
same shuffle-size reasoning as batch exact dedup, operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """First arrival of each distinct (hashed) text wins; later copies
    are dropped. State = one 32-char key per distinct text, forever."""
    return docs.withColumn("text_hash", F.md5(F.col(text_col))).dropDuplicates(
        ["text_hash"]
    )


def stream_dedup_within_watermark(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    horizon: str = "1 hour",
) -> DataFrame:
    """Drop rows whose key was already seen within the watermark
    horizon. State for a key is evicted once the watermark passes its
    event time + horizon — bounded memory at any input scale."""
    return events.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
        key_cols
    )
