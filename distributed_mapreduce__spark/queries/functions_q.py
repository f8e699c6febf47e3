"""Scalar-function coverage queries (string / date / conditional /
array families) — each expression chosen to have identical semantics in
Spark and DuckDB (1-based substring, same LIKE, same date_trunc, etc.),
so the whole function surface is value-hash-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register, register_local
from ..sources.tables import load_table


@register_local(
    "scalar_functions",
    oracle="""
    SELECT o_orderkey,
           upper(c_name) AS name_upper,
           substring(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_key,
           replace(c_name, '#', '-') AS name_dashed,
           (c_name LIKE '%1%') AS has_one,
           concat(c_mktsegment, ':', c_name) AS tagged,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(quarter(o_orderdate) AS INTEGER) AS oq,
           CAST(day(o_orderdate) AS INTEGER) AS od,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid'
                ELSE 'small' END AS size_class,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm
    FROM orders JOIN customer ON c_custkey = o_custkey
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function gauntlet over a broadcast-joined row set: the
    string family (case, substring, length, pad, replace, LIKE, concat)
    on customer columns and the date + conditional family (truncation,
    parts, last_day, CASE, nullif/coalesce) on order columns — one row
    per order, every expression value-hash-checked cross-engine."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey")).select(
        "o_orderkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.col("c_name").like("%1%").alias("has_one"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("tagged"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.quarter("o_orderdate").cast("int").alias("oq"),
        F.dayofmonth("o_orderdate").cast("int").alias("od"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
    )


@register_local(
    "array_functions",
    oracle="""
    SELECT label,
           count(*) AS n_vecs,
           array_to_string(list_transform(list_sort(list(vec_id)),
                                          x -> CAST(x AS VARCHAR)), ',') AS all_ids_csv,
           array_to_string(list_transform(list_sort(list(vec_id))[1:3],
                                          x -> CAST(x AS VARCHAR)), ',') AS first_ids_csv,
           list_sort(list(vec_id))[1] AS first_id,
           len(list(vec_id)) AS ids_len
    FROM embeddings
    GROUP BY label
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: collect + sort (deterministic list), slice, index,
    size. collect_list order is nondeterministic — array_sort makes the
    value comparable across engines and partitionings. Array-typed
    results are projected to CSV scalars (concat_ws / array_to_string)
    so the cross-engine canonicalizer sees only hashable scalar cells;
    the array ops themselves (collect, sort, slice, element_at, size)
    still run inside the plan."""
    e = load_table(spark, sf_dir, "embeddings")
    ids = F.array_sort(F.collect_list("vec_id"))
    as_csv = lambda arr: F.concat_ws(",", F.transform(arr, lambda x: x.cast("string")))
    return e.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        as_csv(ids).alias("all_ids_csv"),
        as_csv(F.slice(ids, 1, 3)).alias("first_ids_csv"),
        F.element_at(ids, 1).alias("first_id"),
        F.size(F.collect_list("vec_id")).cast("long").alias("ids_len"),
    )
