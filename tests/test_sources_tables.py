"""Source contracts: the events reader must not mutate session state.

The TIMESTAMP(NANOS) workaround is an explicit per-read schema; flipping
``spark.sql.legacy.parquet.nanosAsLong`` session-wide would silently
change NANOS handling for every other read sharing the session."""

from __future__ import annotations

from distributed_mapreduce__spark.sources.tables import load_table

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def test_events_load_leaves_session_conf_alone(spark, sf_dir):
    before = spark.conf.get(NANOS_CONF, None)
    df = load_table(spark, sf_dir, "events")
    rows = df.limit(5).collect()
    assert len(rows) == 5
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert spark.conf.get(NANOS_CONF, None) == before


def test_events_ts_type_empty_dir_raises_clearly(tmp_path):
    """An empty / partially-written events.parquet directory (e.g. only
    _SUCCESS) must raise a descriptive FileNotFoundError naming the
    path, not an opaque IndexError."""
    import pytest

    from distributed_mapreduce__spark.sources.tables import events_ts_type

    d = tmp_path / "events.parquet"
    d.mkdir()
    (d / "_SUCCESS").touch()
    with pytest.raises(FileNotFoundError, match=str(d)):
        events_ts_type(str(d))


def test_schema_evolution_merge_read(spark, tmp_path):
    """Pipelines evolve schemas in place: new files gain columns. A
    mergeSchema read must surface the union schema with nulls for
    old files — the contract long-lived partitioned datasets rely on."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "evolving")
    spark.range(0, 10).select(F.col("id").alias("k")).write.parquet(out)
    spark.range(10, 20).select(
        F.col("id").alias("k"), F.lit("new").alias("extra")
    ).write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"k", "extra"}
    assert merged.count() == 20
    nulls = merged.filter(F.col("extra").isNull()).count()
    assert nulls == 10  # the pre-evolution files


def test_events_ts_micros_match_raw_footer_values(spark, sf_dir):
    """Whatever flavor the fixture generator emitted (ns / µs-instant /
    µs-NTZ), the loaded ts must equal the raw stored value truncated to
    microseconds, exactly as Arrow/DuckDB convert."""
    import pyarrow.parquet as pq
    import os

    from pyspark.sql import functions as F

    raw = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts"])
    unit = raw["ts"].type.unit
    div = {"ns": 1000, "us": 1, "ms": 1}[unit]
    mul = 1000 if unit == "ms" else 1
    want = {
        i.as_py(): t.value * mul // div  # → µs, matching Arrow/DuckDB truncation
        for i, t in zip(raw["event_id"], raw["ts"])
    }
    df = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("us")
    )
    got = {r.event_id: r.us for r in df.limit(100).collect()}
    assert got
    for k, v in got.items():
        assert want[k] == v


def test_footer_schema_matches_spark_inference(spark, sf_dir):
    """footer_schema (pyarrow footer → from_arrow_schema) must reproduce
    Spark's own parquet inference EXACTLY for every fixture table —
    load_table passes it as an explicit read schema to skip the
    per-read inference job (round-15 optimization), so any divergence
    would silently change column types under every query."""
    import os

    from distributed_mapreduce__spark.sources.tables import (
        TABLE_NAMES,
        footer_schema,
    )

    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        got = footer_schema(path)
        assert got is not None, name
        want = spark.read.format("parquet").load(path).schema
        assert got == want, (name, got.simpleString(), want.simpleString())


def test_footer_schema_unreadable_returns_none(tmp_path):
    from distributed_mapreduce__spark.sources.tables import footer_schema

    assert footer_schema(str(tmp_path / "nope.parquet")) is None
    (tmp_path / "empty").mkdir()
    assert footer_schema(str(tmp_path / "empty")) is None


def test_footer_schema_multifile_agreement_guard(tmp_path):
    """Round-16 hardening (VERDICT r15 #8): a directory whose footers
    AGREE takes the shortcut; drifted footers (or more files than the
    bounded read count) return None so Spark's own inference — which
    merges or errors per its documented rules — stays the source of
    truth. Without the guard, file[0]'s footer would silently type the
    whole table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from distributed_mapreduce__spark.sources.tables import footer_schema

    agree = tmp_path / "agree"
    agree.mkdir()
    t = pa.table({"a": pa.array([1, 2], type=pa.int64())})
    pq.write_table(t, agree / "p1.parquet")
    pq.write_table(t, agree / "p2.parquet")
    got = footer_schema(str(agree))
    assert got is not None and got.fieldNames() == ["a"]

    drift = tmp_path / "drift"
    drift.mkdir()
    pq.write_table(t, drift / "p1.parquet")
    pq.write_table(
        pa.table({"a": pa.array(["x"], type=pa.string())}),
        drift / "p2.parquet",
    )
    assert footer_schema(str(drift)) is None

    many = tmp_path / "many"
    many.mkdir()
    for i in range(17):  # beyond the bounded footer-read count
        pq.write_table(t, many / f"p{i:02d}.parquet")
    assert footer_schema(str(many)) is None
