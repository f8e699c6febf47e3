"""The reference's one end-to-end query: word count + top-k (SURVEY.md §2.1).

Reference dataflow (Go, cite-checked):

    text files → tokenize (mapreduce/mapreduce.go:33)
               → normalize/trim+lower (:35) → filter empty (:36)
               → per-doc combiner count (:32-44)
               → FNV hash shuffle (:24-28,77) → group-by-key (:88-107)
               → sum (:48-56) → master merge (master/master.go:258-285)
               → sort count desc, word asc (:286-299) → top-k (:305-311)

Spark-first rebuild: the whole chain is four declarative transforms; the
combiner (O5) is Catalyst's partial HashAggregate, the shuffle (O6-O8) is
the Exchange, the merge (O11) is unnecessary (aggregation is already
global), and sort+limit (O12-O13) plans as TakeOrderedAndProject — a
distributed per-partition heap + driver merge of k rows, strictly better
than the reference's full sort on the master.

Scale: the only shuffle is the groupBy on ``word``; partial aggregation
collapses each input partition to its distinct words before the exchange,
so shuffle volume is bounded by (partitions × vocabulary), not corpus
size. TakeOrderedAndProject moves only k rows per partition to the
driver. This plan survives a 100 TB corpus unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textnorm import normalize_word, tokenize

#: Reference defaults: k=5, main.go:21.
DEFAULT_TOP_K = 5


def words(df: DataFrame, text_col: str = "value") -> DataFrame:
    """O2-O4: tokenize → normalize → drop empties. → DataFrame[word]."""
    from ..plans.partitioning import spread

    return (
        spread(df)
        .select(F.explode(tokenize(text_col)).alias("tok"))
        .select(normalize_word("tok").alias("word"))
        .filter(F.col("word") != "")
    )


def word_counts(df: DataFrame, text_col: str = "value") -> DataFrame:
    """O5+O8+O9: global per-word counts. → DataFrame[word, cnt].

    ``groupBy(word).count()`` = reference combiner + shuffle + reduce sum
    + master re-merge, in one declarative aggregate.
    """
    return words(df, text_col).groupBy("word").agg(F.count("*").alias("cnt"))


def top_k_from_counts(counts: DataFrame, k: int = DEFAULT_TOP_K) -> DataFrame:
    """O12+O13 on pre-aggregated counts: order by count desc, word asc
    (byte-order tie-break, master/master.go:294-299), keep k rows.
    Plans as TakeOrderedAndProject — k rows per partition to the driver."""
    return counts.orderBy(F.desc("cnt"), F.asc("word")).limit(k)


def top_k_words(
    df: DataFrame, text_col: str = "value", k: int = DEFAULT_TOP_K
) -> DataFrame:
    """O12+O13 from raw text: fully deterministic top-k word counts."""
    return top_k_from_counts(word_counts(df, text_col), k)


def write_final_text(df: DataFrame, path: str) -> None:
    """O14 compatibility sink: ``"word: count"`` lines (master/master.go:309).

    The engine's results stay DataFrames; this sink exists only for
    format parity with the reference's ``mr-final.txt``.
    """
    (
        df.select(F.format_string("%s: %d", F.col("word"), F.col("cnt")).alias("value"))
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )
