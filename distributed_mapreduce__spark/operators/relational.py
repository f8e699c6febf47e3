"""Relational core operators (SURVEY.md §2.2 E5/E6).

The reference's data-processing capability is one generalized
map→shuffle→reduce (mapreduce/mapreduce.go DoMap/DoReduce); the
relational surface here is that capability expressed natively: scans,
projections, filters, hash aggregations, the join family, windows,
sort/limit — all declarative so Catalyst plans the physical strategy.

Scale notes (100 TB):
- Dimension tables (region/nation/supplier/part/customer) are broadcast
  explicitly — no shuffle of the fact side for star joins.
- Fact-fact joins (orders⋈lineitem) shuffle on the join key; at scale
  both sides would be bucketed on orderkey to co-locate (sort-merge
  without exchange). AQE handles skew.
- Top-k-per-group uses a window + row_number: one shuffle on the group
  key, per-partition sort, no global sort. Global top-k uses
  orderBy+limit which plans as TakeOrderedAndProject (per-partition
  heaps, k rows to driver).

Numeric discipline: money aggregates cast to DECIMAL before summing —
exact, order-independent arithmetic so results are bit-identical across
engines and across partitionings (a correctness property the DuckDB
oracle gate depends on; doubles would drift with partition order).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# All fixture money/rate columns carry exactly 2 decimal digits.
MONEY = "decimal(18,2)"


def dec(col: Column | str, typ: str = MONEY) -> Column:
    """Exact-decimal view of a 2-dp double column (order-independent sums)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact: DECIMAL(18,2)×DECIMAL(18,2)."""
    return dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))


def charge() -> Column:
    """l_extendedprice * (1-disc) * (1+tax), exact via a 4-dp factor cast.

    The (1-d)(1+t) double product has ≤4 decimal digits by construction
    (both inputs 2-dp); casting it to DECIMAL(8,4) recovers the exact
    value, keeping the final multiply inside DECIMAL(38,·) in every
    engine.
    """
    factor = ((F.lit(1) - F.col("l_discount")) * (F.lit(1) + F.col("l_tax"))).cast(
        "decimal(8,4)"
    )
    return dec("l_extendedprice") * factor


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rn_col: str = "rn",
) -> DataFrame:
    """E5: deterministic top-k within each group (generalizes O12+O13).

    ``order_cols`` must be a total order within the group (include a key
    tie-break) or results are nondeterministic. Plans as one shuffle on
    the group key + per-partition sort — no global sort, scales linearly.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rn_col, F.row_number().over(w))
        .filter(F.col(rn_col) <= k)
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt_by: str,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join resilient to hot keys: the skewed side gets a
    deterministic salt in [0, n_salts), the other side is replicated
    ``n_salts`` ways, and the join runs on (key, salt) — a hot key's
    rows spread over ``n_salts`` tasks instead of one straggler.

    ``salt_by`` must be a column that VARIES WITHIN the hot key on the
    skewed side (e.g., the fact row's own primary key) — salting by the
    join key itself would give every hot-key row the same salt and
    spread nothing. Hashing a column (rather than rand()) keeps the
    salt deterministic: task retries re-derive the same value — same
    rationale as content-addressed sampling.

    Cost: the other side shuffles ``n_salts``× its size — worth it when
    that side is above the broadcast threshold but far smaller than the
    skewed side, the exact regime where one hot key otherwise pins a
    single task. AQE's skew-join splitting handles moderate skew
    without this; salting is the explicit treatment for extreme
    single-key skew.

    Companion to ``salted_sum`` (operators/mapreduce.py) which treats
    skewed AGGREGATION; this treats the skewed JOIN.
    """
    from ..functions.hashing import stable_bucket

    salted = skewed.withColumn(
        "_salt", stable_bucket(F.col(salt_by).cast("string"), n_salts, seed=7)
    )
    replicated = other.withColumn(
        "_salt", F.explode(F.lit(list(range(n_salts))))
    )
    return salted.join(replicated, [on, "_salt"]).drop("_salt")


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — rows of ``left`` with ≥1 match; never duplicates left rows."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — rows of ``left`` with no match in ``right``."""
    return left.join(right, on, "left_anti")


#: Routing threshold for :func:`quantiles`: rows per group above which
#: the exact interpolated percentile — whose aggregation state holds
#: every value of the group in memory — stops being safe and the
#: mergeable GK sketch (approx_percentile) takes over.
EXACT_QUANTILE_MAX_GROUP_ROWS = 10_000_000

#: Skew headroom for the mean→max inference in :func:`quantiles`: the
#: mean rows/group estimate is multiplied by this before comparing to
#: the budget, so a hot group up to QUANTILE_SKEW_MARGIN× the mean
#: still fits. Beyond that, pass ``max_group_rows`` from a profile /
#: :func:`..sketches.key_counts` probe — a mean can never prove a max.
QUANTILE_SKEW_MARGIN = 100


def quantiles(
    df: DataFrame,
    value_col: str,
    probs: Sequence[float],
    group_cols: Sequence[str] = (),
    strategy: str = "auto",
    accuracy: int = 10_000,
    n_rows: int | None = None,
    n_groups: int | None = None,
    max_group_rows: int | None = None,
) -> DataFrame:
    """Per-group percentiles — the quantile front door: the engine
    picks exact interpolated ``percentile`` vs the mergeable
    ``approx_percentile`` GK sketch, because exact percentile's
    aggregation buffer holds EVERY value of a group in executor memory
    (the classic 100 TB OOM), while the sketch is O(accuracy) per
    group with a guaranteed rank error of at most 1/accuracy.

    ``strategy='auto'`` routes on the LARGEST group's row count:
    ``max_group_rows`` when the caller knows it (a profile /
    ``key_counts`` probe), else mean rows per group inflated by
    :data:`QUANTILE_SKEW_MARGIN` — a mean can't prove a max, so the
    margin keeps a hot group up to 100x the mean inside the exact
    budget, and anything that might exceed it routes to the sketch
    (safe: approximate, never OOM). Pass ``n_rows``/``n_groups`` from
    a profile sidecar to skip the estimation job; with no hints both
    numbers come from ONE combined aggregation pass. Output: one row
    per group with a ``q_<prob>`` double column per requested
    probability (dots become underscores), identical schema on both
    branches.
    """
    gcols = list(group_cols)

    def out_cols(fn):
        return [
            fn(p).alias("q_" + str(p).replace(".", "_")) for p in probs
        ]

    if strategy == "auto":
        if max_group_rows is not None:
            worst = max_group_rows
        else:
            if n_rows is None or (gcols and n_groups is None):
                aggs = [F.count(F.lit(1)).alias("n")]
                if gcols:
                    aggs.append(
                        F.approx_count_distinct(F.struct(*gcols)).alias("d")
                    )
                prof = df.agg(*aggs).first()
                n = n_rows if n_rows is not None else prof["n"]
                d = n_groups if n_groups is not None else (
                    prof["d"] if gcols else 1
                )
            else:
                n, d = n_rows, (n_groups if gcols else 1)
            worst = (n / max(1, d)) * QUANTILE_SKEW_MARGIN
        strategy = (
            "exact" if worst <= EXACT_QUANTILE_MAX_GROUP_ROWS else "approx"
        )
    if strategy == "exact":
        aggs = out_cols(
            lambda p: F.percentile(F.col(value_col), F.lit(p)).cast("double")
        )
    elif strategy == "approx":
        aggs = out_cols(
            lambda p: F.approx_percentile(
                F.col(value_col), F.lit(p), F.lit(accuracy)
            ).cast("double")
        )
    else:
        raise ValueError(
            f"unknown strategy {strategy!r}; expected auto/exact/approx"
        )
    grouped = df.groupBy(*gcols) if gcols else df.groupBy()
    return grouped.agg(*aggs)


def with_contiguous_ids(
    df: DataFrame, order_cols: Sequence[str], id_col: str = "row_id"
) -> DataFrame:
    """Assign CONTIGUOUS ids 0..N-1 in ``order_cols`` order — the
    distributed zipWithIndex. ``monotonically_increasing_id`` leaves
    gaps (partition-encoded), and a global ``row_number()`` window
    funnels all N rows through ONE partition; this does neither:

    1. range-partition + sort by ``order_cols`` (the distributed total
       sort — same machinery as deterministic_shuffle);
    2. count rows per partition (one job shuffling ≤ one row per
       partition) and prefix-sum the ≤ #partitions counts on the
       driver;
    3. enumerate each partition in an Arrow ``mapInPandas`` pass that
       adds its partition's offset (``TaskContext.partitionId`` keys
       the broadcast offset table) — zero further shuffles, order
       within partitions preserved by the Arrow batch iterator.

    Ties in ``order_cols`` make the assignment nondeterministic across
    runs — pass a tie-breaking unique column (the usual id) last.
    Training pipelines use this for sample indexing ("example 0..N-1
    of this epoch") after :func:`..sampling.deterministic_shuffle`.
    """
    from pyspark.sql import types as T

    cols = list(order_cols)
    spark = df.sparkSession
    parts = max(
        1,
        min(
            df.rdd.getNumPartitions(),
            int(spark.conf.get("spark.sql.shuffle.partitions")),
        ),
    )
    arranged = df.repartitionByRange(parts, *cols).sortWithinPartitions(*cols)
    arranged = arranged.localCheckpoint()  # pin the partitioning: the
    # count pass and the enumerate pass must see IDENTICAL partitions
    counts = dict(
        (r["pid"], r["n"])
        for r in arranged.select(
            F.spark_partition_id().alias("pid")
        )
        .groupBy("pid")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    ob = spark.sparkContext.broadcast(offsets)

    schema = T.StructType(
        list(arranged.schema.fields) + [T.StructField(id_col, T.LongType())]
    )

    def enumerate_rows(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        nxt = ob.value.get(pid, 0)
        for pdf in batches:
            pdf = pdf.copy()
            pdf[id_col] = range(nxt, nxt + len(pdf))
            nxt += len(pdf)
            yield pdf

    return arranged.mapInPandas(enumerate_rows, schema)


def join_auto(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_by: str | None = None,
    strategy: str = "auto",
    left_rows: int | None = None,
    right_rows: int | None = None,
    broadcast_max_rows: int = 1_000_000,
    skew_share: float = 0.2,
    sample_rows: int = 100_000,
    n_salts: int = 16,
    route_out: dict | None = None,
) -> DataFrame:
    """Join front door (the E6 auto-router, same contract as the
    counting/quantile/similarity front doors): callers state the JOIN,
    the engine picks the physical strategy —

    - **broadcast** when the build side is dimension-sized
      (``right_rows`` ≤ ``broadcast_max_rows``; pass the row count
      from a profile sidecar to make routing plan-only, else one count
      job runs) and ``how`` admits a right build side;
    - **salted** when a deterministic sample of the probe side's keys
      shows one key owning ≥ ``skew_share`` of rows (the
      one-reducer-drowns regime AQE's skew splitting handles only
      moderately) AND the caller named a ``salt_by`` column that
      varies within the hot key;
    - **plain** otherwise — AQE's runtime coalescing/skew handling is
      the right default for even keys.

    Routing never affects correctness — every branch computes the same
    join (property-tested); it only moves the shuffle/replication
    cost. ``strategy`` forces a branch; ``route_out`` (a dict) gets
    ``{"route": ..., "why": ...}`` for observability. Sampling is
    seeded (deterministic across retries) and bounded by
    ``sample_rows``.
    """
    routes = ("auto", "broadcast", "salted", "plain")
    if strategy not in routes:
        raise ValueError(f"strategy must be one of {routes}")
    broadcastable = how in ("inner", "left", "left_outer", "semi",
                            "left_semi", "anti", "left_anti")
    why = f"forced strategy={strategy!r}"
    if strategy == "auto":
        n_right = right_rows if right_rows is not None else right.count()
        if n_right <= broadcast_max_rows and broadcastable:
            strategy, why = "broadcast", (
                f"right side {n_right} rows <= {broadcast_max_rows}"
            )
        else:
            n_left = left_rows if left_rows is not None else left.count()
            frac = min(1.0, sample_rows / max(n_left, 1))
            sampled = left.select(on).sample(False, frac, seed=7)
            top = (
                sampled.groupBy(on)
                .count()
                .orderBy(F.desc("count"))
                .limit(1)
                .collect()
            )
            n_sampled = max(int(n_left * frac), 1)
            share = (top[0]["count"] / n_sampled) if top else 0.0
            if share >= skew_share and salt_by is not None:
                strategy, why = "salted", (
                    f"hot key {top[0][on]!r} holds ~{share:.0%} of probe rows"
                )
            elif share >= skew_share:
                strategy, why = "plain", (
                    f"hot key holds ~{share:.0%} but no salt_by column "
                    "was named — relying on AQE skew splitting"
                )
            else:
                strategy, why = "plain", f"max key share ~{share:.0%}, even"
    if route_out is not None:
        route_out.update({"route": strategy, "why": why})
    if strategy == "broadcast":
        if not broadcastable:
            raise ValueError(f"cannot broadcast the right side of {how!r}")
        return left.join(F.broadcast(right), on, how)
    if strategy == "salted":
        if salt_by is None:
            raise ValueError("salted route requires salt_by")
        if how != "inner":
            raise ValueError(
                "salted route supports inner joins (replicating the "
                "build side breaks outer-join null semantics)"
            )
        return salted_join(left, right, on, salt_by, n_salts=n_salts)
    return left.join(right, on, how)
