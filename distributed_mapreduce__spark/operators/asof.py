"""As-of (point-in-time) join — an operator Spark lacks natively
(SURVEY.md §2.2 gap list; a staple of feature-store / training-data
pipelines).

Implementation: the union-timeline trick. Tag left (probe) and right
(reference) rows, union them into one per-key timeline, sort within key
by (ts, side, tie), and carry the last non-null reference value forward
with an unbounded-preceding window. One shuffle on the key, no range
join, no per-row binary search — this is the form that scales to 100 TB
(a naive ts-range join explodes; ``merge_asof`` per group needs the
whole key in memory).

Determinism: the within-key sort is total — (ts, side, tie_col) — so
ties between reference rows at the same timestamp resolve identically
everywhere (DuckDB's native ASOF JOIN leaves that unspecified, which is
why the oracle replays this same window form instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    tie_col: str,
) -> DataFrame:
    """For each left row: ``value_col`` of the right row with the largest
    ``right_ts`` ≤ ``left_ts`` within ``key`` (ties on right_ts broken by
    largest ``tie_col``). Null when no earlier right row exists.

    Returns the left columns + ``asof_<value_col>``.
    """
    lcols = left.columns
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # after reference rows at equal ts
        F.lit(None).cast("long").alias("_tie"),
        F.lit(None).cast(right.schema[value_col].dataType).alias("_val"),
        *[F.col(c) for c in lcols],
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tie_col).cast("long").alias("_tie"),
        F.col(value_col).alias("_val"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_ts"), F.asc("_side"), F.asc("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l_tagged.unionByName(r_tagged)
        .withColumn("_asof", F.last("_val", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(*lcols, F.col("_asof").alias(f"asof_{value_col}"))
    )
