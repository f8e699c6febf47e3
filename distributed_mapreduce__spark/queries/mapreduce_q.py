"""Generalized map/reduce queries — capability parity with the
reference's MapF/ReduceF parameterization (SURVEY.md §2.2: that
parameterization is its entire UDF surface).

All three run the reference's word-count job through the generalized
APIs and share the ``wordcount_full`` oracle — proving the general
operator reproduces the specialized pipeline exactly. Only the salted
variant is driver-registered (it adds the distinct hot-key treatment);
the declarative and pandas tiers duplicate wordcount_full's oracle, so
they are gated locally in tests/test_queries_oracle.py instead of
spending two of the driver's 50 checked-query slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textnorm import normalize_word, tokenize
from ..operators.mapreduce import map_reduce, map_reduce_pandas, salted_sum
from ..plans.partitioning import spread
from ..registry import register
from ..sources.tables import load_table
from .wordcount_q import _WORDS_SQL

_WC_ORACLE = f"""
    SELECT word, count(*) AS cnt
    FROM ({_WORDS_SQL})
    GROUP BY word
"""


def wordcount_generalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count through the declarative map_reduce API: mapper emits
    (word, 1) structs, reducer sums — MapF/ReduceF as Column algebra
    (mapreduce/mapreduce.go:31-56 parity, combiner included for free)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    words_arr = F.filter(
        F.transform(tokenize("text"), normalize_word), lambda w: w != ""
    )
    mapper = F.transform(
        words_arr,
        lambda w: F.struct(w.alias("key"), F.lit(1).cast("long").alias("value")),
    )
    return map_reduce(docs, mapper, lambda v: F.sum(v)).select(
        F.col("key").alias("word"), F.col("value").alias("cnt")
    )


def wordcount_pandas_mr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count through the arbitrary-Python tier: the mapper
    pre-aggregates within each Arrow batch (the reference's per-document
    combiner, mapreduce/mapreduce.go:32-39), the reducer sums per key.
    Integer counts → result is still oracle-exact."""
    import pandas as pd

    def map_f(batches):
        for pdf in batches:
            counts: dict[str, int] = {}
            for text in pdf["text"]:
                for tok in str(text).split():
                    w = tok.strip(".,!?:;\"'").lower()
                    if w:
                        counts[w] = counts.get(w, 0) + 1
            yield pd.DataFrame(
                {"key": list(counts.keys()), "value": list(counts.values())}
            )

    docs = spread(load_table(spark, sf_dir, "documents"))
    out = map_reduce_pandas(docs, map_f, lambda key, values: int(values.sum()))
    return out.select(F.col("key").alias("word"), F.col("value").alias("cnt"))


@register("wordcount_salted", oracle=_WC_ORACLE)
def wordcount_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count through the salted two-phase aggregation — the hot-key
    treatment (a natural-language corpus IS skewed: 'the' dominates).
    Exact same result as the direct groupBy, by construction."""
    from ..operators.wordcount import words

    docs = load_table(spark, sf_dir, "documents")
    w = words(docs, text_col="text")
    return salted_sum(w, ["word"], F.lit(1).cast("long"), alias="cnt").select(
        "word", "cnt"
    )
