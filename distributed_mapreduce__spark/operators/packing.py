"""Token packing: concat-and-chunk documents into fixed token budgets
(LLM-pipeline surface — building fixed-length training sequences).

The standard pre-training layout streams the corpus in a canonical
order, concatenates token streams, and cuts every ``budget`` tokens;
documents may span chunk boundaries. Computing each document's global
token offset is a prefix sum over a total order — and a naive
``Window.orderBy(doc_id)`` with no partitioning collapses to ONE task
(Spark warns "No Partition Defined for Window"), the classic
scale trap. ``with_global_offset`` does it the scalable way, the
two-pass distributed prefix sum:

1. range-partition by the order key; per-partition running sums
   (window partitioned by partition id — parallel);
2. per-partition totals (one tiny row per partition) → exclusive
   prefix per partition, computed in a single-partition window over
   ~hundreds of rows — trivially cheap;
3. broadcast-join the prefixes back: global offset = partition prefix
   + local running sum − own weight.

The result is partition-INDEPENDENT (it's a pure function of the
total order), so the range partitioner's sampled boundaries don't
affect values — only parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_offset(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    offset_col: str = "offset",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``offset_col`` = sum of ``weight_col`` over all rows strictly
    before this one in ``order_col`` order (exclusive prefix sum).
    ``order_col`` must be unique — it defines the total order."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("_pid").orderBy(order_col)
    local = part.withColumn(
        "_local_cum", F.sum(weight_col).over(local_w)
    )
    totals = local.groupBy("_pid").agg(F.max("_local_cum").alias("_ptotal"))
    # Hundreds of rows at most: the single-partition window is fine HERE
    # (and only here) — it runs over one row per partition, not the data.
    prefix_w = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = totals.withColumn(
        "_pprefix", F.coalesce(F.sum("_ptotal").over(prefix_w), F.lit(0))
    ).select("_pid", "_pprefix")
    return (
        local.join(F.broadcast(prefixes), "_pid")
        .withColumn(
            offset_col,
            F.col("_pprefix") + F.col("_local_cum") - F.col(weight_col),
        )
        .drop("_pid", "_local_cum", "_pprefix")
    )


def token_count_expr(col: str = "text") -> Column:
    """Whitespace token count with the parity tokenization (engine-
    identical to DuckDB's len(string_split(...)) on collapsed text)."""
    return F.size(
        F.filter(
            F.split(F.regexp_replace(F.trim(F.col(col)), r"\s+", " "), " "),
            lambda t: t != "",
        )
    ).cast("long")


def pack_into_chunks(
    docs: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(chunk_id, doc_id, n_tokens, offset): assignment of documents to
    fixed-``budget`` token chunks in canonical order; a document
    spanning a boundary appears in every chunk it overlaps.

    Zero-token documents are dropped (they occupy no chunk space).
    Row count per chunk ≈ docs-per-budget; the explode emits
    ceil(n_tokens/budget)+1 rows per doc at most — bounded fanout."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    weighted = docs.withColumn("n_tokens", token_count_expr(text_col)).filter(
        F.col("n_tokens") > 0
    )
    offs = with_global_offset(weighted, order_col, "n_tokens")
    first = (F.col("offset") / budget).cast("long")
    last = ((F.col("offset") + F.col("n_tokens") - 1) / budget).cast("long")
    return offs.select(
        F.explode(F.sequence(first, last)).alias("chunk_id"),
        order_col,
        "n_tokens",
        "offset",
    )
