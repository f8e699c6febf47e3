"""Partitioning helpers.

A small parquet file arrives as ONE scan partition, which serializes all
per-row compute (explode/hash/fold chains) onto one core until the first
shuffle — the dominant cost for the text/vector operators on the test
fixtures. At 100 TB the scan has thousands of splits and this is moot;
``spread`` encodes that adaptively: it widens only when the scan under-
parallelizes the session, and never narrows an already-parallel input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(
    df: DataFrame,
    min_factor: float = 1.0,
    by: "list[str] | None" = None,
) -> DataFrame:
    """Repartition up to session parallelism iff the plan currently has
    fewer partitions (one cheap narrow-input shuffle; no-op whenever the
    input is already parallel, i.e. always at real scale).

    ``by`` picks HASH partitioning on those columns instead of the
    round-robin default. Round-robin pays a per-partition binary sort of
    its input before the exchange (``spark.sql.execution.sortBeforeRepartition``,
    on by default so task retries reproduce the same row placement);
    hash partitioning on a deterministic high-cardinality key skips that
    sort — measured 2x cheaper on the serial single-row-group fixture
    scans this helper exists for (round-15 guide §2.5: derive synthetic
    placement from a deterministic key, never ``rand()``). Use ``by``
    whenever a natural evenly-distributed key is at hand."""
    if df.isStreaming:  # micro-batch sizing is the stream scheduler's job
        return df
    cores = df.sparkSession.sparkContext.defaultParallelism
    target = max(1, int(cores * min_factor))
    if df.rdd.getNumPartitions() >= target:
        return df
    if by:
        return df.repartition(target, *by)
    return df.repartition(target)


def key_skew_report(
    df,
    key: str,
    top: int = 20,
    n_rows: int | None = None,
    n_distinct: int | None = None,
) -> dict:
    """Diagnose shuffle-key skew before a big join/agg: the planning
    question at 100 TB is "will one reducer drown?", answered by three
    numbers per hot key — count, share of all rows, and the skew
    factor vs a perfectly even shuffle partition.

    Uses the bounded-memory counting front door
    (:func:`...operators.sketches.key_counts`) so the diagnosis itself
    can't ruin the shuffle it is trying to protect. Returns::

        {"n_rows": N, "shuffle_partitions": P,
         "even_share": N / P,
         "hot_keys": [{"key", "cnt", "share",
                       "skew_factor",        # cnt / even_share
                       "salt_buckets"}, ...]  # ceil(cnt / even_share)
         "recommendation": "ok" | "salt" | "broadcast-or-salt"}

    ``salt_buckets`` is the per-key salting fan-out that levels that
    key back to the even-partition load — feed it to
    ``operators/relational.salted_join`` / ``mapreduce.salted_sum``.
    The recommendation is a coarse router: max skew ≤ 4 → "ok" (AQE's
    skew-join handles it), ≤ 64 → "salt", above → the key list is so
    degenerate the small side should broadcast or the key re-modeled.
    """
    import math

    from pyspark.sql import functions as F

    from ..operators.sketches import key_counts

    spark = df.sparkSession
    # ONE profile scan supplies both numbers key_counts' auto router
    # needs (passing only n_rows would make it run its own profile
    # aggregation — a second full scan of the 100 TB input)
    if n_rows is None or n_distinct is None:
        prof = df.agg(
            F.count("*").alias("n"),
            F.approx_count_distinct(key).alias("d"),
        ).collect()[0]
        n = n_rows if n_rows is not None else int(prof["n"])
        n_distinct = n_distinct if n_distinct is not None else int(prof["d"])
    else:
        n = n_rows
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    even = max(n / max(p, 1), 1.0)
    # only keys that could matter: ≥ half an even partition's load
    counts = key_counts(
        df,
        key,
        threshold=max(int(even // 2), 1),
        n_rows=n,
        n_distinct=n_distinct,
    )
    rows = (
        counts.orderBy(F.desc("cnt"), F.asc(key)).limit(top).collect()
    )
    hot = [
        {
            "key": r[key],
            "cnt": r["cnt"],
            "share": r["cnt"] / n if n else 0.0,
            "skew_factor": r["cnt"] / even,
            "salt_buckets": max(1, math.ceil(r["cnt"] / even)),
        }
        for r in rows
    ]
    worst = max((h["skew_factor"] for h in hot), default=0.0)
    rec = "ok" if worst <= 4 else ("salt" if worst <= 64 else "broadcast-or-salt")
    return {
        "n_rows": n,
        "shuffle_partitions": p,
        "even_share": even,
        "hot_keys": hot,
        "recommendation": rec,
    }
