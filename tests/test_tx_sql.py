"""SQL DML front door (sources/tx_sql.py, round 13): every statement
type dispatches to its Python front and must act bit-identically to
calling that front directly; reads re-resolve registered snapshots so
SELECT-after-DML sees the commit; everything outside the documented
grammar refuses loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.sources.tx_sql import (
    tx_register_table,
    tx_sql,
)
from distributed_mapreduce__spark.sources.txlog import (
    _replay,
    tx_delete_where,
    tx_merge,
    tx_read,
    tx_update,
    tx_write,
)


def _df(spark):
    return spark.range(200).select(
        "id", (F.col("id") % 10).alias("v"), F.lit("x").alias("tag")
    )


def _rows(spark, path):
    return sorted(tuple(r) for r in tx_read(spark, path).collect())


@pytest.fixture()
def pair(spark, tmp_path):
    """Two identical tables: one driven by SQL, the twin by Python."""
    a, b = str(tmp_path / "sql"), str(tmp_path / "py")
    tx_write(_df(spark).repartition(4), a, stats_cols=["id"])
    tx_write(_df(spark).repartition(4), b, stats_cols=["id"])
    tx_register_table(spark, "t_sql", a)
    return a, b


def test_update_matches_python_twin(spark, pair):
    a, b = pair
    v = tx_sql(
        spark,
        "UPDATE t_sql SET tag = 'hot', v = v + 100 WHERE v = 3",
    )
    tx_update(spark, b, "v = 3", {"tag": "'hot'", "v": "v + 100"})
    assert isinstance(v, int)
    assert _rows(spark, a) == _rows(spark, b)
    # the registered view refreshed: SQL reads see the commit
    assert (
        tx_sql(spark, "SELECT count(*) AS n FROM t_sql WHERE tag = 'hot'")
        .collect()[0].n == 20
    )


def test_delete_matches_python_twin(spark, pair):
    a, b = pair
    tx_sql(spark, "DELETE FROM t_sql WHERE id % 7 = 0")
    tx_delete_where(spark, b, "id % 7 = 0")
    assert _rows(spark, a) == _rows(spark, b)


def test_insert_select_and_values(spark, pair):
    a, b = pair
    tx_sql(
        spark,
        "INSERT INTO t_sql SELECT id + 1000 AS id, "
        "CAST(id % 10 AS BIGINT) AS v, 'new' AS tag FROM range(10)",
    )
    tx_write(
        spark.sql(
            "SELECT id + 1000 AS id, CAST(id % 10 AS BIGINT) AS v, "
            "'new' AS tag FROM range(10)"
        ),
        b,
    )
    assert _rows(spark, a) == _rows(spark, b)
    # VALUES binds by position to the table schema
    tx_sql(spark, "INSERT INTO t_sql VALUES (9999, CAST(1 AS BIGINT), 'v')")
    assert tx_read(spark, a).filter("id = 9999").count() == 1
    with pytest.raises(ValueError, match="arity"):
        tx_sql(spark, "INSERT INTO t_sql VALUES (1, 2)")


def test_merge_matches_python_twin(spark, pair):
    a, b = pair
    upd = spark.createDataFrame(
        [(5, 500, "merged"), (5000, 1, "fresh")],
        "id long, v long, tag string",
    )
    upd.createOrReplaceTempView("updates_src")
    tx_sql(spark, "MERGE INTO t_sql USING updates_src ON t.id = s.id")
    tx_merge(upd, b, "id")
    assert _rows(spark, a) == _rows(spark, b)
    with pytest.raises(ValueError, match="MERGE ON"):
        tx_sql(spark, "MERGE INTO t_sql USING updates_src ON t.id = s.key")
    with pytest.raises(ValueError, match="subqueries"):
        tx_sql(
            spark,
            "MERGE INTO t_sql USING (SELECT 1 AS id) ON id",
        )


def test_optimize_vacuum_preserve_rows(spark, pair):
    a, _ = pair
    for i in range(3):
        tx_sql(
            spark,
            f"INSERT INTO t_sql SELECT id + {2000 + i * 100} AS id, "
            "CAST(0 AS BIGINT) AS v, 'z' AS tag FROM range(5)",
        )
    before = _rows(spark, a)
    assert tx_sql(spark, "OPTIMIZE t_sql") is not None
    deleted = tx_sql(spark, "VACUUM t_sql")
    assert isinstance(deleted, list)
    assert _rows(spark, a) == before
    # ZORDER form
    assert tx_sql(spark, "OPTIMIZE t_sql ZORDER BY (id, v)") is not None
    assert _rows(spark, a) == before


def test_alter_family(spark, pair):
    a, _ = pair
    tx_sql(spark, "ALTER TABLE t_sql RENAME COLUMN tag TO label")
    assert "label" in tx_read(spark, a).columns
    tx_sql(spark, "ALTER TABLE t_sql ADD CONSTRAINT v_small CHECK (v < 1000)")
    with pytest.raises(Exception, match="v_small"):
        tx_sql(spark, "UPDATE t_sql SET v = CAST(5000 AS BIGINT) WHERE id = 1")
    tx_sql(spark, "ALTER TABLE t_sql DROP CONSTRAINT v_small")
    tx_sql(spark, "ALTER TABLE t_sql DROP COLUMN label")
    assert tx_read(spark, a).columns == ["id", "v"]
    tx_sql(spark, "UPDATE t_sql SET v = CAST(5000 AS BIGINT) WHERE id = 1")
    assert tx_read(spark, a).filter("v = 5000").count() == 1


def test_set_partitioned_by(spark, pair):
    a, _ = pair
    tx_sql(spark, "ALTER TABLE t_sql SET PARTITIONED BY (v)")
    tx_sql(
        spark,
        "INSERT INTO t_sql SELECT CAST(7777 AS BIGINT) AS id, "
        "CAST(7 AS BIGINT) AS v, 'p' AS tag",
    )
    snap = _replay(spark, a)
    new = [f for f, ver in snap.eps.items() if ver == snap.version]
    assert new and all("v=7" in f for f in new)


def test_inline_path_form(spark, tmp_path):
    t = str(tmp_path / "inline")
    tx_write(_df(spark), t)
    v = tx_sql(spark, f"DELETE FROM txtable.`{t}` WHERE id < 100")
    assert isinstance(v, int)
    assert tx_read(spark, t).count() == 100


def test_refusals(spark, pair):
    with pytest.raises(KeyError, match="unknown table"):
        tx_sql(spark, "DELETE FROM nope WHERE 1=1")
    with pytest.raises(ValueError, match="unsupported statement"):
        tx_sql(spark, "TRUNCATE TABLE t_sql")
    with pytest.raises(ValueError, match="SET assignment"):
        tx_sql(spark, "UPDATE t_sql SET 5 WHERE id = 1")


def test_restore_and_describe_detail(spark, pair):
    a, _ = pair
    tx_sql(spark, "DELETE FROM t_sql WHERE id < 150")
    assert tx_sql(spark, "SELECT count(*) AS n FROM t_sql").first().n == 50
    tx_sql(spark, "RESTORE TABLE t_sql TO VERSION AS OF 0")
    assert tx_sql(spark, "SELECT count(*) AS n FROM t_sql").first().n == 200
    det = tx_sql(spark, "DESCRIBE DETAIL t_sql").collect()
    assert len(det) == 1
    row = det[0].asDict()
    assert row["num_files"] >= 1 and row["version"] >= 2
