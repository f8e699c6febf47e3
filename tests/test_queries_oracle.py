"""Driver-contract mirror: every registered query with an oracle must
hash-match DuckDB on the fixture tables (SURVEY.md §5.2).

Runs at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF_DIR to
/root/testdata/sf0.01 to reproduce the driver's t2 gate exactly.
"""

from __future__ import annotations

import pytest

from distributed_mapreduce__spark import registry

from .oracle_utils import compare_query

registry.load_all()

ORACLE_CASES = sorted(registry.ORACLES)
ROWS_ONLY_CASES = sorted(set(registry.QUERIES) - set(registry.ORACLES))
# Local tier (registry.register_local): same oracle rigor, but not
# exported to the driver — redundant demos demoted to free slots in
# the driver's 50-query cap.
LOCAL_ORACLE_CASES = sorted(registry.LOCAL_ORACLES)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_match(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    compare_query(spark, sf_dir, df, registry.ORACLES[name])


@pytest.mark.parametrize("name", LOCAL_ORACLE_CASES)
def test_local_oracle_match(spark, sf_dir, name):
    df = registry.LOCAL_QUERIES[name](spark, sf_dir)
    compare_query(spark, sf_dir, df, registry.LOCAL_ORACLES[name])


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_runs(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


# --- unregistered variants ---------------------------------------------------
# These duplicate a registered query's oracle (or have none), so they
# don't spend one of the driver's 50 checked-query slots — but they stay
# oracle-gated here.


@pytest.mark.parametrize("fn_name", ["wordcount_generalized", "wordcount_pandas_mr"])
def test_generalized_mapreduce_matches_wordcount_oracle(spark, sf_dir, fn_name):
    from distributed_mapreduce__spark.queries import mapreduce_q

    df = getattr(mapreduce_q, fn_name)(spark, sf_dir)
    compare_query(spark, sf_dir, df, mapreduce_q._WC_ORACLE)


def test_ml_minhash_matches_portable_pairs(spark, sf_dir):
    """The Spark-ML MinHashLSH path must find the same verified
    duplicate pairs as the oracle-checked portable-md5 LSH pipeline
    (both band at ~0.5 Jaccard on the same shingle sets)."""
    from distributed_mapreduce__spark.queries.dedup_q import dedup_minhash_ml

    ml_pairs = {
        (r.doc_a, r.doc_b) for r in dedup_minhash_ml(spark, sf_dir).collect()
    }
    portable = {
        (r.doc_a, r.doc_b)
        for r in registry.resolve("dedup_minhash_pairs")(spark, sf_dir).collect()
    }
    assert ml_pairs == portable


def test_multimodal_variant_operators_run(spark, sf_dir):
    from distributed_mapreduce__spark.queries import multimodal_q

    feats = multimodal_q.multimodal_features(spark, sf_dir)
    assert feats.count() > 0
    stats = multimodal_q.multimodal_frame_stats(spark, sf_dir)
    assert stats.count() > 0


def test_coverage_md_local_membership_matches_registry():
    """COVERAGE.md's 'Current local membership (N)' paragraph is the
    map the next round navigates by — it drifted twice (VERDICT r11
    wrong #3), so it is now parsed and pinned against the registry."""
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "COVERAGE.md")) as fh:
        text = fh.read()
    m = re.search(
        r"Current local membership \((\d+)\): (.*?) — tests must",
        text,
        re.S,
    )
    assert m, "COVERAGE.md membership paragraph not found"
    count = int(m.group(1))
    listed = {
        n.strip() for n in m.group(2).replace("\n", " ").split(",") if n.strip()
    }
    actual = set(registry.LOCAL_QUERIES)
    assert count == len(actual), (count, len(actual))
    assert listed == actual, (
        sorted(listed - actual), sorted(actual - listed)
    )
