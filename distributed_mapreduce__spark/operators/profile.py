"""Dataset profiling (pipeline pre-flight QA).

``profile_table`` computes per-column statistics in ONE aggregation
pass over the data — (column, metric, value) long form, every value
rendered as a string so heterogeneous column types coexist in one
result:

- n_nulls     — count of NULLs (all types).
- n_distinct  — exact distinct count (all types).
- min / max   — numeric, string, date, and timestamp columns.

One job, one shuffle-free final aggregate (a single global aggregation
row); distinct counts use Spark's partial-aggregated count-distinct.
At 100 TB you'd swap exact ``countDistinct`` for
``approx_count_distinct`` (one flag below) — the HLL sketch turns the
expand-heavy exact plan into a constant-memory pass; everything else
is already a single-pass fold.

Binary and complex (array/struct/map) columns get null/distinct but no
min/max (no portable total order worth asserting)."""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ORDERED_PREFIXES = (
    "int",
    "bigint",
    "smallint",
    "tinyint",
    "double",
    "float",
    "decimal",
    "string",
    "date",
    "timestamp",
)


def profile_table(
    df: DataFrame,
    approx: bool = False,
    group_count_cols: "Sequence[str]" = (),
) -> DataFrame:
    """(column, metric, value): per-column profile in one aggregation.

    ``approx=True`` swaps exact distinct counts for HLL estimates —
    the 100 TB form.

    The table-level row count rides along as ``(__table__, n_rows)`` —
    together with per-column ``n_distinct`` it is exactly what the
    auto-routing front doors consume (see :func:`save_profile`).

    ``group_count_cols`` names columns whose LARGEST group size should
    also be recorded (metric ``max_group_rows``) — one extra
    ``groupBy(col).count().max()`` aggregation per named column, worth
    it because a mean (n_rows / n_distinct) can never prove a max: the
    quantile front door routes exact-vs-sketch on the largest group,
    and a profiled max lets it skip both the estimation job AND the
    100x skew margin the mean-based inference must carry."""
    aggs = [F.count(F.lit(1)).alias("__table__|n_rows")]
    fields = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    for name, typ in fields:
        aggs.append(
            F.count(F.when(F.col(name).isNull(), 1)).alias(f"{name}|n_nulls")
        )
        # MAP columns are not comparable in Spark (countDistinct/HLL on
        # a map throws) — distinct-count their JSON rendering instead.
        # NULL maps stay NULL under to_json; caveat: two maps equal up
        # to key ORDER render differently and count as distinct.
        dcol = F.to_json(name) if typ.startswith("map") else F.col(name)
        distinct = (
            F.approx_count_distinct(dcol)
            if approx
            else F.countDistinct(dcol)
        )
        aggs.append(distinct.alias(f"{name}|n_distinct"))
        if typ.startswith(_ORDERED_PREFIXES):
            aggs.append(F.min(name).cast("string").alias(f"{name}|min"))
            aggs.append(F.max(name).cast("string").alias(f"{name}|max"))
    row = df.agg(*aggs)
    metrics = [
        F.struct(
            F.lit(c.split("|")[0]).alias("column"),
            F.lit(c.split("|")[1]).alias("metric"),
            F.col(f"`{c}`").cast("string").alias("value"),
        )
        for c in row.columns
    ]
    out = (
        row.select(F.explode(F.array(*metrics)).alias("m"))
        .select("m.column", "m.metric", "m.value")
    )
    for gc in group_count_cols:
        out = out.unionByName(
            df.groupBy(gc)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.max("_n").alias("_m"))
            .select(
                F.lit(gc).alias("column"),
                F.lit("max_group_rows").alias("metric"),
                F.col("_m").cast("string").alias("value"),
            )
        )
    return out


def save_profile(
    df: DataFrame,
    path: str,
    approx: bool = True,
    group_count_cols: "Sequence[str]" = (),
) -> None:
    """Profile ``df`` in one pass and persist the result as a tiny
    parquet — the stats sidecar the auto-routing front doors read
    instead of re-scanning the corpus.

    A pipeline profiles once per dataset version (one pass, HLL
    distinct by default) and every later routing decision —
    ``similarity.topk(corpus_count=...)``, ``key_counts(n_rows=...,
    n_distinct=...)``, ``near_dup_pairs(doc_count=...)``,
    ``lsh_topk(corpus_count=...)`` — becomes a metadata read via
    :func:`load_profile_hints`."""
    profile_table(
        df, approx=approx, group_count_cols=group_count_cols
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_profile_hints(spark, path: str) -> dict:
    """Read a :func:`save_profile` sidecar into routing hints:
    ``{"n_rows": int, "n_distinct": {column: int}}``.

    Raises a descriptive error when the sidecar predates the
    ``(__table__, n_rows)`` row — a stale profile should fail HERE,
    not as a KeyError inside a front door."""
    rows = spark.read.parquet(path).collect()
    hints: dict = {"n_distinct": {}, "max_group_rows": {}}
    for r in rows:
        if r.column == "__table__" and r.metric == "n_rows":
            hints["n_rows"] = int(r.value)
        elif r.metric == "n_distinct":
            hints["n_distinct"][r.column] = int(r.value)
        elif r.metric == "max_group_rows":
            # NULL for an EMPTY profiled table (max over zero groups);
            # skip rather than crash — callers treat a missing hint as
            # "probe it yourself", which on an empty table is free
            if r.value is not None:
                hints["max_group_rows"][r.column] = int(r.value)
    if "n_rows" not in hints:
        raise ValueError(
            f"profile sidecar at {path!r} has no (__table__, n_rows) row — "
            "written by an old profile_table? Re-run save_profile."
        )
    return hints


def table_hints(spark, table: str) -> dict | None:
    """Routing hints for a named table from the profile sidecar
    directory in ``$SPARK_GRAFT_PROFILE_DIR`` (one
    :func:`save_profile` output per table, in a subdirectory named
    after it); ``None`` when the env var or the sidecar is absent.

    This is how the registered queries consume profiles without
    changing their ``(spark, sf_dir)`` signature: a pipeline (or
    ``bench.py``) profiles each table once, points the env var at the
    sidecar dir, and every auto-routing front door resolves its
    counts from metadata instead of running estimation jobs. With the
    env var unset the front doors estimate on the fly — correct
    either way, the sidecar only removes jobs from the hot path.
    Sidecars are tied to a dataset VERSION: regenerate them when the
    data changes (stale counts mis-route; they never affect
    correctness of exact branches, but can pick a branch sized for
    the old data)."""
    d = os.environ.get("SPARK_GRAFT_PROFILE_DIR")
    if not d:
        return None
    path = d.rstrip("/") + "/" + table
    # scheme-agnostic existence check: os.path.isdir would silently
    # return False for hdfs:// / s3a:// sidecar dirs — exactly the
    # deployments the sidecar exists for — and no-op the feature
    from ..sources.sinks import hadoop_fs

    fs, hpath = hadoop_fs(spark, path)
    if not fs.exists(hpath):
        return None
    return load_profile_hints(spark, path)


def compare_profiles(
    old: DataFrame, new: DataFrame, rel_threshold: float = 0.10
) -> DataFrame:
    """Drift report between two :func:`profile_table` outputs (or
    loaded :func:`save_profile` sidecars): one row per (column,
    metric) with ``old_value``, ``new_value``, ``rel_change`` and a
    ``flag``:

    - ``added`` / ``removed`` — the column+metric exists on one side
      only: schema drift, the loudest signal a pipeline can get;
    - ``shifted`` — count metrics (n_rows / n_nulls / n_distinct /
      max_group_rows) whose relative change exceeds
      ``rel_threshold`` (denominator max(old, 1) so 0→k flags), or a
      min/max whose value changed at all (range drift has no sensible
      relative measure on strings/dates);
    - NULL — within tolerance.

    The run-over-run data-quality gate: profile each dataset version
    once (one pass), diff the sidecars (two tiny tables — this whole
    comparison is metadata work, no corpus scan), alert on flags.
    Works on anything profile_table handles, at any corpus size, for
    the cost of reading two ~columns×4-row parquets."""
    # explicit presence flags: a metric VALUE can legitimately be NULL
    # (min/max of an all-NULL column), so value-NULL must not be the
    # row-presence sentinel or identical profiles would read as drift
    o = old.select(
        "column",
        "metric",
        F.col("value").alias("old_value"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        "column",
        "metric",
        F.col("value").alias("new_value"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, ["column", "metric"], "full_outer")
    count_metrics = ("n_rows", "n_nulls", "n_distinct", "max_group_rows")
    both = F.col("old_value").isNotNull() & F.col("new_value").isNotNull()
    is_count = F.col("metric").isin(*count_metrics)
    rel = F.when(
        both & is_count,
        (F.col("new_value").cast("double") - F.col("old_value").cast("double"))
        / F.greatest(F.col("old_value").cast("double"), F.lit(1.0)),
    )
    # eqNullSafe: NULL==NULL is "no change"; NULL vs value is a shift
    # for EVERY metric class (a count metric can go NULL too — e.g.
    # max_group_rows of an empty table version — and must not slip
    # through the rel-threshold branch, whose rel is NULL there)
    flag = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(is_count & both & (F.abs(rel) > rel_threshold), F.lit("shifted"))
        .when(
            ~both
            & ~F.col("old_value").eqNullSafe(F.col("new_value")),
            F.lit("shifted"),
        )
        .when(
            ~is_count
            & ~F.col("old_value").eqNullSafe(F.col("new_value")),
            F.lit("shifted"),
        )
    )
    return j.select(
        "column",
        "metric",
        "old_value",
        "new_value",
        F.round(rel, 6).alias("rel_change"),
        flag.alias("flag"),
    )
