"""Dataset profiler: DuckDB-oracle parity on a real table and a
planted-nulls check that the null accounting is right."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.profile import profile_table
from distributed_mapreduce__spark.sources.tables import load_table
from tests.oracle_utils import compare_query

SF = "/root/testdata/sf0.01"


def test_profile_documents_matches_oracle(spark):
    docs = load_table(spark, SF, "documents")
    got = profile_table(docs)
    pieces = []
    for col, has_minmax in [
        ("doc_id", True),
        ("text", True),
        ("lang", True),
        ("source", True),
        ("n_chars", True),
    ]:
        pieces.append(f"""
        SELECT '{col}' AS "column", 'n_nulls' AS metric,
               CAST(count(*) FILTER ({col} IS NULL) AS VARCHAR) AS value FROM documents
        UNION ALL
        SELECT '{col}', 'n_distinct',
               CAST(count(DISTINCT {col}) AS VARCHAR) FROM documents
        """)
        if has_minmax:
            pieces.append(f"""
            UNION ALL SELECT '{col}', 'min', CAST(min({col}) AS VARCHAR) FROM documents
            UNION ALL SELECT '{col}', 'max', CAST(max({col}) AS VARCHAR) FROM documents
            """)
        pieces.append(" UNION ALL ")
    pieces.append(
        "SELECT '__table__', 'n_rows', CAST(count(*) AS VARCHAR) FROM documents"
    )
    compare_query(spark, SF, got, "".join(pieces))


def test_profile_counts_planted_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "b")], "id long, s string"
    )
    prof = {
        (r.column, r.metric): r.value for r in profile_table(df).collect()
    }
    assert prof[("s", "n_nulls")] == "2"
    assert prof[("s", "n_distinct")] == "2"
    assert prof[("id", "n_nulls")] == "0"
    assert prof[("id", "min")] == "1" and prof[("id", "max")] == "4"


def test_profile_approx_mode_runs(spark):
    docs = load_table(spark, SF, "documents")
    prof = {
        (r.column, r.metric): r.value
        for r in profile_table(docs, approx=True).collect()
    }
    exact = 500
    est = int(prof[("doc_id", "n_distinct")])
    assert abs(est - exact) / exact < 0.1  # HLL default ~2% rsd


def test_profile_handles_map_columns(spark):
    """MAP columns are not comparable in Spark — the profiler must
    distinct-count their JSON rendering instead of throwing
    (ADVICE r3). Array columns stay natively comparable."""
    df = spark.createDataFrame(
        [(1, {"a": 1}, [1, 2]), (2, {"a": 1}, [1, 2]), (3, None, None)],
        "id long, m map<string,int>, arr array<int>",
    )
    for approx in (False, True):
        prof = {
            (r.column, r.metric): r.value
            for r in profile_table(df, approx=approx).collect()
        }
        assert prof[("m", "n_nulls")] == "1"
        assert prof[("arr", "n_nulls")] == "1"
        if not approx:
            assert prof[("m", "n_distinct")] == "1"
            assert prof[("arr", "n_distinct")] == "1"


def test_profile_sidecar_feeds_front_doors(spark, tmp_path):
    """save_profile → load_profile_hints → the auto front doors route
    from the persisted stats with zero extra scans of the corpus."""
    from distributed_mapreduce__spark.operators.profile import (
        load_profile_hints,
        save_profile,
    )
    from distributed_mapreduce__spark.operators.sketches import key_counts

    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "profile")
    save_profile(docs, path)
    hints = load_profile_hints(spark, path)
    assert hints["n_rows"] == 500
    assert 0 < hints["n_distinct"]["source"] < 500

    routed = key_counts(
        docs, "source", threshold=20,
        n_rows=hints["n_rows"], n_distinct=hints["n_distinct"]["source"],
    )
    exact = key_counts(docs, "source", threshold=20, strategy="exact")
    assert sorted(map(tuple, routed.collect())) == sorted(
        map(tuple, exact.collect())
    )


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_env_pointed_sidecars_drive_registered_front_doors(spark, tmp_path, monkeypatch):
    """The bench wiring (VERDICT r5 item 7): profiles written per table
    under $SPARK_GRAFT_PROFILE_DIR make every auto-routed registered
    query resolve its counts from metadata — results must be identical
    to the estimate-on-the-fly path, and max_group_rows must surface
    for the quantile route."""
    from distributed_mapreduce__spark import registry
    from distributed_mapreduce__spark.operators.profile import (
        load_profile_hints,
        save_profile,
        table_hints,
    )

    registry.load_all()
    names = [
        "neardup_front_door", "similarity_topk_auto",
        "key_counts_auto", "quantile_quantity",
    ]
    baseline = {
        n: sorted(map(tuple, registry.resolve(n)(spark, SF).collect()),
                  key=lambda t: tuple(map(repr, t)))
        for n in names
    }

    d = str(tmp_path / "profiles")
    save_profile(load_table(spark, SF, "documents"), f"{d}/documents")
    save_profile(load_table(spark, SF, "embeddings"), f"{d}/embeddings")
    save_profile(
        load_table(spark, SF, "lineitem"), f"{d}/lineitem",
        group_count_cols=["l_returnflag"],
    )
    li_hints = load_profile_hints(spark, f"{d}/lineitem")
    assert li_hints["max_group_rows"]["l_returnflag"] > 0

    monkeypatch.setenv("SPARK_GRAFT_PROFILE_DIR", d)
    assert table_hints(spark, "lineitem") == li_hints
    assert table_hints(spark, "nonexistent_table") is None
    for n in names:
        hinted = sorted(map(tuple, registry.resolve(n)(spark, SF).collect()),
                        key=lambda t: tuple(map(repr, t)))
        assert hinted == baseline[n], n

    monkeypatch.delenv("SPARK_GRAFT_PROFILE_DIR")
    assert table_hints(spark, "lineitem") is None


def test_compare_profiles_drift_report(spark):
    from distributed_mapreduce__spark.operators.profile import (
        compare_profiles,
        profile_table,
    )

    old = spark.createDataFrame(
        [(i, f"w{i % 5}", None if i % 10 == 0 else i * 1.0) for i in range(100)],
        "id long, word string, score double",
    )
    # new version: nulls doubled in score, a column replaced, ranges moved
    new = spark.createDataFrame(
        [
            (i, None if i % 5 == 0 else i * 2.0, f"s{i}")
            for i in range(100)
        ],
        "id long, score double, source string",
    )
    rep = compare_profiles(
        profile_table(old, approx=False), profile_table(new, approx=False)
    )
    rows = {(r.column, r.metric): r for r in rep.collect()}
    # schema drift both ways
    assert rows[("word", "n_nulls")].flag == "removed"
    assert rows[("source", "n_nulls")].flag == "added"
    # score nulls went 10 -> 20: rel_change 1.0, flagged
    r = rows[("score", "n_nulls")]
    assert r.flag == "shifted" and r.rel_change == 1.0
    # id column is identical: no flags on ANY of its metrics
    assert all(rows[k].flag is None for k in rows if k[0] == "id")
    # score max moved (99.0 -> 198.0): range drift flagged, rel NULL
    r = rows[("score", "max")]
    assert r.flag == "shifted" and r.rel_change is None


def test_compare_profiles_within_tolerance_is_quiet(spark):
    from distributed_mapreduce__spark.operators.profile import (
        compare_profiles,
        profile_table,
    )

    df = spark.createDataFrame(
        [(i, f"w{i % 7}") for i in range(1000)], "id long, word string"
    )
    p = profile_table(df, approx=False)
    rep = compare_profiles(p, p)
    assert rep.filter(F.col("flag").isNotNull()).count() == 0


def test_compare_profiles_null_minmax_and_n_rows(spark):
    from distributed_mapreduce__spark.operators.profile import (
        compare_profiles,
        profile_table,
    )

    # all-NULL column: min/max are NULL VALUES, not missing rows —
    # self-compare must stay quiet (no false 'added'/'removed')
    df = spark.createDataFrame(
        [(i, None) for i in range(50)], "id long, empty double"
    )
    p = profile_table(df, approx=False)
    rep = compare_profiles(p, p)
    assert rep.filter(F.col("flag").isNotNull()).count() == 0

    # n_rows is a count metric: +2% growth is quiet at the default 10%
    # threshold, 3x growth flags with a real rel_change
    grown = spark.createDataFrame(
        [(i, None) for i in range(51)], "id long, empty double"
    )
    quiet = compare_profiles(p, profile_table(grown, approx=False))
    nr = quiet.filter(
        (F.col("column") == "__table__") & (F.col("metric") == "n_rows")
    ).first()
    assert nr.flag is None and abs(nr.rel_change - 0.02) < 1e-9
    big = spark.createDataFrame(
        [(i, None) for i in range(150)], "id long, empty double"
    )
    loud = compare_profiles(p, profile_table(big, approx=False))
    nr = loud.filter(
        (F.col("column") == "__table__") & (F.col("metric") == "n_rows")
    ).first()
    assert nr.flag == "shifted" and nr.rel_change == 2.0


def test_empty_table_group_hint_is_skipped_not_crash(spark, tmp_path):
    from distributed_mapreduce__spark.operators.profile import (
        load_profile_hints,
        save_profile,
    )

    empty = spark.createDataFrame([], "id long, grp string")
    path = str(tmp_path / "prof")
    save_profile(empty, path, approx=False, group_count_cols=["grp"])
    hints = load_profile_hints(spark, path)
    assert hints["n_rows"] == 0
    # max over zero groups is NULL -> hint absent, not TypeError
    assert "grp" not in hints["max_group_rows"]
