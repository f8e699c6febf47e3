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


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_match(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    compare_query(spark, sf_dir, df, registry.ORACLES[name])


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_runs(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
