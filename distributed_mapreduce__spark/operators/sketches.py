"""Heavy hitters (frequent items) with bounded memory.

"Which domains / templates / boilerplate strings dominate the corpus?"
is a pre-curation staple, and the naive ``groupBy(key).count()`` at
100 TB shuffles every distinct key — fine when the key space is small,
ruinous for high-cardinality keys (URLs, hosts, 5-gram shingles). The
classic fix is Misra–Gries summaries merged in two candidate-restricted
passes:

1. **Candidate pass** — each partition keeps a local Misra–Gries
   summary of ``width`` counters (Arrow-batched ``mapInPandas``,
   O(width) memory per task, no shuffle). The MG guarantee: any item
   with global frequency > N/width survives SOME partition's summary,
   because MG decrements are bounded per partition and a global heavy
   hitter cannot be decremented away everywhere (Misra & Gries 1982;
   the mergeability result is Agarwal et al. 2012, "Mergeable
   summaries").
2. **Exact pass** — re-count ONLY the union of candidates with an
   exact broadcast-semi-join aggregation. Counts are exact, never
   approximate; the sketch only bounds which keys are *considered* —
   the same candidate-restrict posture as the LSH verify join.

Result: exact counts for every item with frequency ≥ ``threshold``
(guaranteed complete when threshold > N/width), with shuffle volume
proportional to candidates · partitions, not distinct keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_ingest(
    counters: dict[str, int], weighted: Iterator[tuple[str, int]], width: int
) -> dict[str, int]:
    """One Misra–Gries update round: fold (value, count) pairs into an
    existing ≤ width-counter summary. Shared by the batch partition
    pass and the streaming state operator (MG is a one-pass stream
    algorithm — cross-batch state update IS the algorithm)."""
    for v, c in weighted:
        if v in counters:
            counters[v] += int(c)
        elif len(counters) < width:
            counters[v] = int(c)
        else:
            # decrement-all by the smallest deficit that frees a slot
            dec = min(int(c), min(counters.values()))
            counters = {
                k: n - dec for k, n in counters.items() if n - dec > 0
            }
            if int(c) - dec > 0:
                counters[v] = int(c) - dec
    return counters


def _mg_summary(values: Iterator[pd.Series], width: int) -> dict[str, int]:
    """Misra–Gries over a stream of pandas batches: ≤ width counters."""
    counters: dict[str, int] = {}
    for batch in values:
        counters = _mg_ingest(
            counters,
            ((v, int(c)) for v, c in batch.value_counts().items()),
            width,
        )
    return counters


#: Routing thresholds for :func:`choose_count_strategy`.
MAX_WIDTH = 65_536        # MG counters an executor task can hold comfortably
SMALL_DISTINCT = 1_000_000  # key cardinality where an exact shuffle is trivial


def choose_count_strategy(
    n_rows: int,
    n_distinct: int,
    threshold: int,
    max_width: int = MAX_WIDTH,
    small_distinct: int = SMALL_DISTINCT,
) -> str:
    """Pick exact ``groupBy.count`` vs the Misra–Gries sketch pass from
    three cheap numbers. Pure routing logic (unit-testable), used by
    :func:`key_counts` with ``strategy='auto'``:

    - ``exact`` when you asked for ALL counts (threshold ≤ 1) — a
      sketch can't answer that;
    - ``exact`` when the key cardinality is modest (the shuffle the
      sketch avoids is cheap anyway);
    - ``sketch`` when keys are high-cardinality AND the MG completeness
      guarantee is affordable: complete iff width > N/threshold, so the
      sketch qualifies exactly when ``N/threshold + 1`` counters fit
      the per-task budget. Below that line exact is the only complete
      answer — auto never silently drops heavy keys.
    """
    if threshold <= 1 or n_distinct <= small_distinct:
        return "exact"
    if n_rows // threshold + 1 <= max_width:
        return "sketch"
    return "exact"


def key_counts(
    df: DataFrame,
    key: str,
    threshold: int = 1,
    strategy: str = "auto",
    n_rows: int | None = None,
    n_distinct: int | None = None,
) -> DataFrame:
    """(key, cnt) for every key with count ≥ threshold — the counting
    front door: the engine picks exact group-by vs the bounded-memory
    Misra–Gries pass (:func:`heavy_hitters`), so high-cardinality keys
    (URLs, shingles) can't ruin the shuffle by default.

    ``strategy='auto'`` routes via :func:`choose_count_strategy`; pass
    ``n_rows``/``n_distinct`` from a persisted profile to skip the
    estimation pass (ONE aggregation job computing count +
    HLL ``approx_count_distinct`` together — shuffles ~one row per
    partition). Both branches return identical exact counts over
    NON-NULL keys (NULL is not a countable key here: the sketch's
    candidate pass drops it, so the exact branch filters it too rather
    than letting the two branches disagree). The sketch branch sizes
    its width to ``N/threshold + 1`` — inside the completeness
    guarantee by construction; auto only picks the sketch when that
    width fits the per-task budget, and FORCING ``strategy='sketch'``
    honors the guarantee width even above :data:`MAX_WIDTH` (the
    memory is the caller's explicit choice; silently capping would
    silently drop heavy keys)."""
    if strategy == "auto":
        if n_rows is None or n_distinct is None:
            prof = df.agg(
                F.count("*").alias("n"),
                F.approx_count_distinct(key).alias("d"),
            ).first()
            n = n_rows if n_rows is not None else prof["n"]
            d = n_distinct if n_distinct is not None else prof["d"]
        else:
            n, d = n_rows, n_distinct
        strategy = choose_count_strategy(n, d, threshold)
        n_rows = n
    if strategy == "exact":
        return (
            df.filter(F.col(key).isNotNull())
            .groupBy(key)
            .agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") >= F.lit(threshold))
        )
    if strategy == "sketch":
        n = n_rows if n_rows is not None else df.count()
        width = n // threshold + 1
        return heavy_hitters(df, key, threshold, width=width)
    raise ValueError(f"unknown strategy {strategy!r}; expected auto/exact/sketch")


def heavy_hitters(
    df: DataFrame, key: str, threshold: int, width: int = 1024
) -> DataFrame:
    """(key, cnt): every value of ``key`` with exact count ≥ threshold.

    Complete (no false negatives) whenever threshold > N/width; wider
    summaries widen the guarantee at O(width) task memory. Two jobs:
    a shuffle-free candidate scan, then one aggregation restricted to
    the broadcast candidate set. The output ``key`` column keeps the
    input column's type (the string view is internal to the passes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mg = _mg_summary((b[key].dropna() for b in batches), width)
        yield pd.DataFrame({key: list(mg.keys())})

    # one string-typed view of the key drives both passes (the summary
    # dict and the rejoin must agree on representation); the original
    # type is restored on the way out so callers can join back on key.
    key_type = df.schema[key].dataType
    keyed = df.select(F.col(key).cast("string").alias(key))
    candidates = keyed.mapInPandas(gen, schema=f"{key} string").distinct()
    return (
        keyed.join(F.broadcast(candidates), key)
        .groupBy(key)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= F.lit(threshold))
        .select(F.col(key).cast(key_type).alias(key), "cnt")
    )
