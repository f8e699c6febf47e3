"""Heavy hitters: the Misra–Gries candidate pass must never lose an
item above the N/width guarantee line, the recount must be exact
(DuckDB oracle), and the rejoin must broadcast, not sort-merge."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.sketches import (
    _mg_summary,
    heavy_hitters,
)
from distributed_mapreduce__spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_mg_summary_guarantee():
    """Any item with frequency > N/(width+1) keeps a counter — the
    textbook MG bound, exercised with adversarial eviction pressure."""
    import pandas as pd

    rng = np.random.default_rng(3)
    heavy = ["h0"] * 1000 + ["h1"] * 600 + ["h2"] * 400
    tail = [f"t{i}" for i in rng.integers(0, 5000, size=4000)]
    stream = heavy + tail
    rng.shuffle(stream)
    n = len(stream)
    width = 16
    mg = _mg_summary(iter([pd.Series(stream)]), width)
    assert len(mg) <= width
    for k, freq in (("h0", 1000), ("h1", 600), ("h2", 400)):
        assert freq > n / (width + 1)  # fixture sanity
        assert k in mg, (k, mg)


@pytest.mark.parametrize("n_parts", [1, 7])
def test_heavy_hitters_match_exact_oracle(spark, n_parts):
    """Planted heavies + a 5000-key long tail across partitions: the
    result must EQUAL the exact filtered group-by (exact counts, no
    false negatives above threshold, no false positives below)."""
    rng = np.random.default_rng(7)
    rows = (
        [("h0",)] * 900 + [("h1",)] * 400 + [("h2",)] * 200
        + [(f"t{i}",) for i in rng.integers(0, 5000, size=6000)]
    )
    perm = rng.permutation(len(rows))
    df = spark.createDataFrame(
        [rows[i] for i in perm], "k string"
    ).repartition(n_parts)
    n = len(rows)
    width = 64
    threshold = max(100, n // width + 1)  # inside the guarantee zone
    got = sorted(map(tuple, heavy_hitters(df, "k", threshold, width).collect()))
    want = sorted(
        map(
            tuple,
            df.groupBy("k").count()
            .filter(F.col("count") >= threshold)
            .withColumnRenamed("count", "cnt")
            .collect(),
        )
    )
    assert got == want
    assert ("h0", 900) in got


def test_heavy_hitters_corpus_oracle(spark):
    """Over the real documents table keyed by source, against DuckDB."""
    docs = load_table(spark, SF, "documents")
    # 500 docs, width=32 → guarantee line at ~15.6 < threshold 20
    got = sorted(map(tuple, heavy_hitters(docs, "source", 20, width=32).collect()))
    con = duckdb.connect()
    want = sorted(
        con.execute(
            f"SELECT source, count(*) AS cnt FROM '{SF}/documents.parquet' "
            "GROUP BY source HAVING count(*) >= 20"
        ).fetchall()
    )
    assert got == want


def test_choose_count_strategy_routing():
    from distributed_mapreduce__spark.operators.sketches import (
        choose_count_strategy,
    )

    # all counts wanted → only exact can answer
    assert choose_count_strategy(10**9, 10**8, 1) == "exact"
    # modest cardinality → exact shuffle is trivial, sketch pointless
    assert choose_count_strategy(10**9, 50_000, 100) == "exact"
    # high cardinality + affordable guarantee (N/t + 1 ≤ max width) → sketch
    assert choose_count_strategy(10**9, 10**8, 100_000) == "sketch"
    # guarantee line unaffordable (N/t too wide) → exact, never lossy
    assert choose_count_strategy(10**9, 10**8, 100) == "exact"


def test_key_counts_dispatch_matches_exact(spark):
    """Both branches of the front door return identical exact counts;
    the auto route on a high-cardinality fixture picks the sketch and
    still equals the exact group-by."""
    from distributed_mapreduce__spark.operators.sketches import key_counts

    rng = np.random.default_rng(13)
    rows = (
        [("h0",)] * 500 + [("h1",)] * 300
        + [(f"t{i}",) for i in rng.integers(0, 3000, size=4000)]
    )
    df = spark.createDataFrame(rows, "k string").repartition(6)
    n = len(rows)
    threshold = n // 20  # inside the guarantee at width = N/t + 1
    exact = sorted(
        map(tuple, key_counts(df, "k", threshold, strategy="exact").collect())
    )
    sketch = sorted(
        map(tuple, key_counts(df, "k", threshold, strategy="sketch").collect())
    )
    # force the sketch branch through auto by declaring high cardinality
    auto = sorted(
        map(
            tuple,
            key_counts(
                df, "k", threshold, n_rows=n, n_distinct=2_000_000
            ).collect(),
        )
    )
    assert exact == sketch == auto
    assert ("h0", 500) in exact


def test_key_type_round_trips(spark):
    """Numeric keys keep their type in the output schema (the string
    view is internal to the two passes), so callers can join the result
    back on the original key without an implicit cast."""
    rows = [(7,)] * 50 + [(8,)] * 30 + [(i,) for i in range(100, 140)]
    df = spark.createDataFrame(rows, "k long")
    out = heavy_hitters(df, "k", threshold=20, width=16)
    assert dict(out.dtypes)["k"] == "bigint"
    got = sorted(map(tuple, out.collect()))
    assert got == [(7, 50), (8, 30)]


def test_rejoin_broadcasts(spark):
    docs = load_table(spark, SF, "documents")
    plan = (
        heavy_hitters(docs, "source", 20, width=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan


def test_key_counts_null_keys_consistent_across_branches(spark):
    """NULL keys are not countable keys: both branches drop them, so
    auto can't change the answer by switching branches."""
    from distributed_mapreduce__spark.operators.sketches import key_counts

    rows = [(None,)] * 50 + [("a",)] * 40 + [("b",)] * 5
    df = spark.createDataFrame(rows, "k string")
    exact = sorted(map(tuple, key_counts(df, "k", 10, strategy="exact").collect()))
    sketch = sorted(map(tuple, key_counts(df, "k", 10, strategy="sketch").collect()))
    assert exact == sketch == [("a", 40)]
