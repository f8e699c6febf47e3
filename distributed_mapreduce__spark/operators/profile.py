"""Dataset profiling (pipeline pre-flight QA).

``profile_table`` computes per-column statistics in ONE aggregation
pass over the data — (column, metric, value) long form, every value
rendered as a string so heterogeneous column types coexist in one
result:

- n_nulls     — count of NULLs (all types).
- n_distinct  — exact distinct count (all types).
- min / max   — numeric, string, date, and timestamp columns.

One job, one shuffle-free final aggregate (a single global aggregation
row); distinct counts use Spark's partial-aggregated count-distinct.
At 100 TB you'd swap exact ``countDistinct`` for
``approx_count_distinct`` (one flag below) — the HLL sketch turns the
expand-heavy exact plan into a constant-memory pass; everything else
is already a single-pass fold.

Binary and complex (array/struct/map) columns get null/distinct but no
min/max (no portable total order worth asserting)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ORDERED_PREFIXES = (
    "int",
    "bigint",
    "smallint",
    "tinyint",
    "double",
    "float",
    "decimal",
    "string",
    "date",
    "timestamp",
)


def profile_table(df: DataFrame, approx: bool = False) -> DataFrame:
    """(column, metric, value): per-column profile in one aggregation.

    ``approx=True`` swaps exact distinct counts for HLL estimates —
    the 100 TB form."""
    aggs = []
    fields = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    for name, typ in fields:
        aggs.append(
            F.count(F.when(F.col(name).isNull(), 1)).alias(f"{name}|n_nulls")
        )
        # MAP columns are not comparable in Spark (countDistinct/HLL on
        # a map throws) — distinct-count their JSON rendering instead.
        # NULL maps stay NULL under to_json; caveat: two maps equal up
        # to key ORDER render differently and count as distinct.
        dcol = F.to_json(name) if typ.startswith("map") else F.col(name)
        distinct = (
            F.approx_count_distinct(dcol)
            if approx
            else F.countDistinct(dcol)
        )
        aggs.append(distinct.alias(f"{name}|n_distinct"))
        if typ.startswith(_ORDERED_PREFIXES):
            aggs.append(F.min(name).cast("string").alias(f"{name}|min"))
            aggs.append(F.max(name).cast("string").alias(f"{name}|max"))
    row = df.agg(*aggs)
    metrics = [
        F.struct(
            F.lit(c.split("|")[0]).alias("column"),
            F.lit(c.split("|")[1]).alias("metric"),
            F.col(f"`{c}`").cast("string").alias("value"),
        )
        for c in row.columns
    ]
    return (
        row.select(F.explode(F.array(*metrics)).alias("m"))
        .select("m.column", "m.metric", "m.value")
    )
