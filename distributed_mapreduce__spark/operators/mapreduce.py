"""Generalized map/shuffle/reduce — the reference's actual extension
surface, rebuilt Spark-first.

The reference's "UDF story" is compile-time function parameters:
``DoMap(..., mapF)`` / ``DoReduce(..., reduceF)`` with
``MapF(doc, contents) []KeyValue`` and ``ReduceF(key, values) string``
(mapreduce/mapreduce.go:59, :88; hardwired at worker/worker.go:59,63).
This module is that capability as a library API, in two tiers:

1. ``map_reduce`` — DECLARATIVE: the mapper is a Column expression
   producing an array of (key, value) structs; the reducer is an
   aggregate Column. Stays fully inside Catalyst/codegen — this is the
   form all built-in operators use, and the one to prefer.
2. ``map_reduce_pandas`` — ARBITRARY PYTHON: mapper and reducer are
   Python callables run via Arrow-batched ``mapInPandas`` +
   ``applyInPandas``. The escape hatch for logic Columns can't express;
   ~10-100× slower per row than tier 1, still distributed and
   combiner-less only on the Python side (Spark still partial-aggregates
   nothing here — the shuffle carries every emitted pair, like the
   reference without its combiner).

Scale: tier 1 gets map-side partial aggregation automatically (the
reference's combiner, mapreduce/mapreduce.go:32-39). Tier 2's shuffle is
bounded by emitted pairs — mappers should pre-aggregate within batches
(the word-count example in tests does), which is exactly the combiner
discipline the reference hand-rolled.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def map_reduce(
    df: DataFrame,
    mapper: Column,
    reducer: Callable[[Column], Column],
    key_type: str = "string",
) -> DataFrame:
    """Declarative KV map/shuffle/reduce.

    ``mapper``: array<struct<key,value>> expression evaluated per row
    (the MapF emit list). ``reducer``: fn(value_column) -> aggregate
    Column (the ReduceF fold). Returns DataFrame[key, value].
    """
    pairs = df.select(F.explode(mapper).alias("kv")).select(
        F.col("kv.key").cast(key_type).alias("key"), F.col("kv.value").alias("value")
    )
    return pairs.groupBy("key").agg(reducer(F.col("value")).alias("value"))


def map_reduce_pandas(
    df: DataFrame,
    map_f: Callable[[Iterable], Iterator],
    reduce_f: Callable,
    pair_schema: str = "key string, value long",
) -> DataFrame:
    """Arbitrary-Python KV map/shuffle/reduce.

    ``map_f``: mapInPandas generator (pandas batches in → (key,value)
    frames out). ``reduce_f``: fn(key, pandas.Series) -> scalar, applied
    per key after the shuffle. Schema of the shuffled pairs (and result)
    is ``pair_schema``.
    """
    pairs = df.mapInPandas(map_f, schema=pair_schema)

    def reduce_group(key_tuple: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": [key_tuple[0]], "value": [reduce_f(key_tuple[0], pdf["value"])]}
        )

    return pairs.groupBy("key").applyInPandas(reduce_group, schema=pair_schema)


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: Column,
    alias: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase (salted) sum for skewed keys.

    Phase 1 groups on (key, salt) so one hot key spreads over
    ``n_salts`` reducers; phase 2 merges the partials — sums are
    algebraic, so the result is exactly ``groupBy(key).sum(value)``.
    AQE's skew handling covers joins; this is the aggregation-side
    analog for when one key dominates (the classic hot-key failure at
    100 TB). The salt is a per-row hash — deterministic result for any
    salt distribution.
    """
    salt = (
        F.pmod(
            F.xxhash64(*[F.col(c) for c in key_cols], F.monotonically_increasing_id()),
            F.lit(n_salts),
        )
    ).alias("_salt")
    partial = (
        df.select(*key_cols, value_col.alias("_v"), salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.sum("_v").alias("_partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias(alias))
