"""Event-time window operators (SURVEY.md §2.2 E7) — batch forms.

The reference has no time semantics at all (§2.2 gap list); these are
north-star extensions built on Spark's native event-time windowing so the
same operator definitions serve batch (here) and Structured Streaming
(``streaming/windows.py`` adds watermarks to these exact shapes).

Scale: windowed groupBy shuffles on (window, keys) — the window column is
derived, so partial aggregation still collapses each input partition to
one row per (window, key) before the exchange. Session windows shuffle on
the user key and merge per-key sorted runs; skewed users are the 100 TB
risk (bound session length or salt by day for pathological keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _agg_exprs() -> list[Column]:
    """Shared aggregate set for the window queries: count + exact sum +
    engine-identical double average (see operators/relational.py)."""
    value_dec = F.col("value").cast("decimal(18,4)")
    return [
        F.count("*").alias("n_events"),
        F.sum(value_dec).cast("double").alias("sum_value"),
        (F.sum(value_dec).cast("double") / F.count("*")).alias("avg_value"),
    ]


def tumbling(df: DataFrame, duration: str, *keys: str) -> DataFrame:
    """Fixed, non-overlapping event-time buckets (epoch-aligned)."""
    return (
        df.groupBy(F.window("ts", duration).alias("win"), *keys)
        .agg(*_agg_exprs())
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sliding(df: DataFrame, duration: str, slide: str, *keys: str) -> DataFrame:
    """Overlapping buckets: each event lands in duration/slide windows."""
    return (
        df.groupBy(F.window("ts", duration, slide).alias("win"), *keys)
        .agg(*_agg_exprs())
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sessionized(df: DataFrame, gap: str, *keys: str) -> DataFrame:
    """Session windows: runs of events per key separated by < gap;
    window end = last event + gap (Spark ``session_window`` semantics)."""
    return (
        df.groupBy(F.session_window("ts", gap).alias("win"), *keys)
        .agg(*_agg_exprs())
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            *keys,
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


# --------------------------------------------------------------------------
# Incremental rollup store ("hypertable rollup"): maintain per-window
# aggregates of an ever-growing event stream without ever re-scanning
# history. The store holds MERGEABLE PARTIALS (count + exact decimal
# sum — avg is derived at read), organized as
#
#     <store>/partials/batch=<batch_id>/part-*.parquet
#     <store>/_compactions/<n>.json        (compaction commit markers)
#
# Exactly-once unit = the batch id: upsert_rollup writes one batch's
# window partials via dynamic partition overwrite of batch=<id>, so a
# retried batch REPLACES its own partials instead of double-counting —
# the same idempotence mechanism as streaming/dedup.py's foreachBatch
# sink. Reads merge partials by window+key; read amplification is the
# number of live batches per window, bounded by compact_rollup, whose
# COMMIT POINT is a single marker-file create (the new merged dir is
# invisible to readers until its marker lands, and the marker excludes
# the source dirs even before they are garbage-collected — so a crash
# at ANY point between writing the compacted dir, writing the marker,
# and deleting sources never double-counts and never loses data).
# --------------------------------------------------------------------------


def rollup_batch(events: DataFrame, duration: str, *keys: str) -> DataFrame:
    """One batch's mergeable window partials:
    (window_start, window_end, *keys, n_events, sum_value_dec)."""
    return (
        events.groupBy(F.window("ts", duration).alias("win"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            # storage type pinned at decimal(38,4): re-summing partials
            # (compaction) must not widen the column, or batch dirs
            # written before and after a compaction disagree on schema
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("decimal(38,4)")
            .alias("sum_value_dec"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value_dec",
        )
    )


def _guard_batch_id(spark, store_path: str, bid: str) -> None:
    """Shared batch-id discipline for every fold flavor: the ``c<n>``
    namespace belongs to compaction targets, and an id RETIRED by a
    committed compaction can never be reused — its dir would be
    silently subtracted from every read. Both misuses raise loudly."""
    if bid.startswith("c") and bid[1:].isdigit():
        raise ValueError(
            f"batch_id {bid!r} is in the reserved compaction namespace c<n>"
        )
    retired = {
        s for m in _read_markers(spark, store_path) for s in m["sources"]
    }
    if bid in retired:
        raise ValueError(
            f"batch_id {bid!r} was retired by a committed compaction of "
            f"{store_path}; rows written under it would be invisible to "
            "read_rollup. Use a fresh batch id (or a fresh store) — e.g. "
            "a restarted stream whose checkpoint was lost must not reuse "
            "its old id sequence."
        )


def upsert_rollup(
    events: DataFrame,
    store_path: str,
    duration: str,
    keys: tuple[str, ...] = (),
    batch_id: str = "0",
) -> None:
    """Fold one event batch into the rollup store — idempotently: the
    batch's partials land under ``batch=<batch_id>`` via dynamic
    partition overwrite, so re-running a failed/duplicate batch
    replaces its own prior write. One aggregation of the NEW events
    only; history is never read, let alone re-aggregated.

    ``c<n>`` ids are reserved for compaction targets (the crash-window
    guard in ``_live_batches`` ignores uncommitted dirs of that shape),
    and an id RETIRED by a committed compaction can never be reused —
    its dir would be silently subtracted from every read. Both misuses
    raise here instead of losing data (the retired case happens when a
    streaming checkpoint is wiped and foreachBatch restarts at batch 0
    against a compacted store: the loud error says use a fresh store
    or a fresh id prefix).
    """
    bid = str(batch_id)
    _guard_batch_id(events.sparkSession, store_path, bid)
    _check_duration(events.sparkSession, store_path, duration)
    (
        rollup_batch(events, duration, *keys)
        .withColumn("batch", F.lit(str(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(f"{store_path}/partials")
    )


def retract_rollup(
    events: DataFrame,
    store_path: str,
    duration: str,
    keys: tuple[str, ...] = (),
    batch_id: str = "0",
) -> None:
    """Fold a DELETION batch into the rollup store: the same window
    partials as :func:`upsert_rollup` but NEGATED — additive
    count/sum partials make retraction free at merge time
    (incremental view maintenance under deletes, the classic
    counting-algorithm shape). ``events`` must be the deleted rows
    themselves (a CDC pre-image, e.g.
    ``tx_changes_cdf(preimage=True)``'s delete frames), not keys:
    the window and value of every retracted row decide which partial
    shrinks. Windows whose count reaches zero vanish from
    :func:`read_rollup`, matching a from-scratch recompute.

    Same idempotence and batch-id discipline as upsert (one dynamic
    partition per batch id; retried batches replace their own write);
    retracting MORE than was inserted leaves a negative-count window
    visible in reads — loud, attributable misuse rather than silent
    clamping."""
    bid = str(batch_id)
    _guard_batch_id(events.sparkSession, store_path, bid)
    _check_duration(events.sparkSession, store_path, duration)
    (
        rollup_batch(events, duration, *keys)
        .select(
            "window_start",
            "window_end",
            *keys,
            (-F.col("n_events")).alias("n_events"),
            (-F.col("sum_value_dec"))
            .cast("decimal(38,4)")
            .alias("sum_value_dec"),
        )
        .withColumn("batch", F.lit(bid))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(f"{store_path}/partials")
    )


def fold_rollup_cdf(
    inserts: DataFrame,
    deletes: DataFrame,
    store_path: str,
    duration: str,
    keys: tuple[str, ...] = (),
    batch_id: str = "0",
) -> None:
    """Fold one CDC batch carrying BOTH inserted and deleted rows
    (e.g. a merge commit's update post-images and pre-images from
    ``tx_changes_cdf``'s 'cdf' frames) into the rollup store as ONE
    batch partition: insert partials plus NEGATED delete partials net
    out per window before the write. One batch id per source version
    keeps the fold atomic-per-version — there is no crash window where
    the retraction landed but the insertion didn't (two separate
    :func:`upsert_rollup`/:func:`retract_rollup` calls would have
    one), and replays replace the whole signed partition idempotently.
    Same guards and store schema as the single-sided folds."""
    bid = str(batch_id)
    _guard_batch_id(inserts.sparkSession, store_path, bid)
    _check_duration(inserts.sparkSession, store_path, duration)
    pos = rollup_batch(inserts, duration, *keys)
    neg = rollup_batch(deletes, duration, *keys).select(
        "window_start",
        "window_end",
        *keys,
        (-F.col("n_events")).alias("n_events"),
        (-F.col("sum_value_dec"))
        .cast("decimal(38,4)")
        .alias("sum_value_dec"),
    )
    (
        pos.unionByName(neg)
        .groupBy("window_start", "window_end", *keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_dec")
            .cast("decimal(38,4)")
            .alias("sum_value_dec"),
        )
        .withColumn("batch", F.lit(bid))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(f"{store_path}/partials")
    )


def claim_rollup_writer(
    spark, store_path: str, writer: str, checkpoint_path: str
) -> None:
    """Claim a batch-id prefix for ONE stream (streaming/windows.py
    ``stream_rollup``). Batch numbering is per-checkpoint, so two
    concurrent streams sharing a store AND a prefix would overwrite
    each other's ``batch=<prefix><n>`` partitions silently (dynamic
    partition overwrite replaces same-named dirs). The claim is a
    ``_writers/<writer>.json`` sidecar recording the owning stream's
    checkpoint path, committed atomically (tmp+rename, same discipline
    as compaction markers):

    - no claim file → write it, proceed;
    - claim file naming THIS checkpoint → a restart of the same
      stream, proceed (its retries are idempotent by batch id);
    - claim file naming a DIFFERENT checkpoint → raise loudly — the
      caller must pass a distinct ``writer=`` per stream.

    The reserved compaction namespace (``c<n>``) is rejected up front:
    a writer literally named ``c`` would emit batch ids compaction
    targets own, and ``upsert_rollup`` would refuse every batch.
    """
    import json
    import re

    from ..sources.sinks import hadoop_fs

    if not writer or re.search(r"[/=\s]", writer):
        raise ValueError(
            f"writer prefix {writer!r} must be non-empty and free of "
            "'/', '=' and whitespace (it names partition dirs)"
        )
    if re.fullmatch(r"c\d*", writer):
        raise ValueError(
            f"writer prefix {writer!r} collides with the reserved "
            "compaction namespace c<n>"
        )
    fs, wpath = hadoop_fs(spark, f"{store_path}/_writers/{writer}.json")
    if fs.exists(wpath):
        raw = fs.open(wpath)
        try:
            data = bytes(
                spark.sparkContext._jvm.org.apache.commons.io.IOUtils.toByteArray(
                    raw
                )
            )
        finally:
            raw.close()
        owner = json.loads(data.decode("utf-8"))["checkpoint"]
        if owner != checkpoint_path:
            raise ValueError(
                f"rollup store {store_path} writer prefix {writer!r} is "
                f"claimed by the stream checkpointed at {owner!r}; this "
                f"stream (checkpoint {checkpoint_path!r}) would silently "
                "overwrite its partials. Pass a distinct writer= id per "
                "concurrent stream."
            )
        return
    marker = json.dumps({"writer": writer, "checkpoint": checkpoint_path})
    tmp = hadoop_fs(spark, f"{store_path}/_writers/{writer}.json.tmp")[1]
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(marker.encode()))
    finally:
        out.close()
    if not fs.rename(tmp, wpath):
        # lost a race with a concurrent claimer — re-read and re-check
        # rather than clobbering its committed marker
        raw = fs.open(wpath)
        try:
            data = bytes(
                spark.sparkContext._jvm.org.apache.commons.io.IOUtils.toByteArray(
                    raw
                )
            )
        finally:
            raw.close()
        owner = json.loads(data.decode("utf-8"))["checkpoint"]
        if owner != checkpoint_path:
            raise ValueError(
                f"rollup store {store_path} writer prefix {writer!r} was "
                f"concurrently claimed by {owner!r}; pass a distinct "
                "writer= id per stream."
            )


def _read_markers(spark, store_path: str) -> list[dict]:
    """All committed compaction markers (torn/unparseable ones from a
    crash mid-write are skipped — belt to the tmp+rename suspenders in
    compact_rollup)."""
    import json

    from ..sources.sinks import hadoop_fs

    fs, cpath = hadoop_fs(spark, f"{store_path}/_compactions")
    if not fs.exists(cpath):
        return []
    markers = []
    for st in fs.listStatus(cpath):
        if not st.getPath().getName().endswith(".json"):
            continue
        raw = fs.open(st.getPath())
        try:
            # py4j copies Python buffers INTO Java, so read(byte[])
            # can't fill a Python bytearray — drain JVM-side instead
            data = bytes(
                spark.sparkContext._jvm.org.apache.commons.io.IOUtils.toByteArray(
                    raw
                )
            )
        finally:
            raw.close()
        try:
            markers.append(json.loads(data.decode("utf-8")))
        except ValueError:
            continue
    return markers


def _live_batches(spark, store_path: str) -> list[str] | None:
    """Batch dirs minus those retired by any COMMITTED compaction
    marker. None = store absent."""
    from ..sources.sinks import hadoop_fs

    fs, ppath = hadoop_fs(spark, f"{store_path}/partials")
    if not fs.exists(ppath):
        return None
    batches = {
        st.getPath().getName().split("=", 1)[1]
        for st in fs.listStatus(ppath)
        if st.isDirectory() and st.getPath().getName().startswith("batch=")
    }
    committed: set[str] = set()
    for marker in _read_markers(spark, store_path):
        committed.add(marker["target"])
        # a committed marker retires its sources FOREVER — even after a
        # LATER compaction deletes this marker's target dir (the data
        # lives on in the later target). Conditioning on the target
        # dir's presence resurrected crash-leftover sources once a
        # second compaction ran, double-counting every read.
        batches -= set(marker["sources"])
    # the crash-window guard: a compaction TARGET dir whose marker
    # never landed is an orphan — counting it would double-count its
    # still-live sources. Target ids are the reserved c<n> namespace.
    batches -= {
        b
        for b in batches
        if b.startswith("c") and b[1:].isdigit() and b not in committed
    }
    return sorted(batches)


def read_rollup(
    spark,
    store_path: str,
    keys: tuple[str, ...] = (),
    coarsen: str | None = None,
) -> DataFrame:
    """The current rollup: merge live partials per (window, key) —
    additive count/sum, avg derived with the engine-identical single
    division the batch window queries use.

    ``coarsen`` re-buckets at read into WIDER epoch-aligned windows
    (store hourly, query daily — the continuous-aggregate pattern):
    base windows nest exactly when the coarser duration is an integer
    multiple of the stored one, which is validated against the store's
    ``_meta.json``; a non-multiple would straddle boundaries and is
    refused. Pure extra aggregation over already-rolled rows — the raw
    events are never touched."""
    live = _live_batches(spark, store_path)
    if not live:
        raise FileNotFoundError(f"no rollup partials at {store_path}")
    df = spark.read.parquet(
        *[f"{store_path}/partials/batch={b}" for b in live]
    )
    if coarsen is not None:
        base = _store_duration(spark, store_path)
        bsec, csec = _duration_seconds(base), _duration_seconds(coarsen)
        if bsec is None:
            raise ValueError(
                f"store {store_path} has no _meta.json duration; cannot "
                "validate coarsen nesting"
            )
        if csec % bsec != 0:
            raise ValueError(
                f"coarsen {coarsen!r} is not a multiple of the stored "
                f"duration {base!r}; straddled windows would miscount"
            )
        df = df.select(
            F.window("window_start", coarsen).alias("win"),
            *keys,
            "n_events",
            "sum_value_dec",
        ).select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value_dec",
        )
    return (
        df.groupBy("window_start", "window_end", *keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_dec").alias("sum_value_dec"),
        )
        # fully-retracted windows (insert + equal retraction netting to
        # zero) vanish, matching a from-scratch recompute; a NEGATIVE
        # count (over-retraction) stays visible as the loud misuse it is
        .filter(F.col("n_events") != 0)
        .select(
            "window_start",
            "window_end",
            *keys,
            "n_events",
            F.col("sum_value_dec").cast("double").alias("sum_value"),
            (F.col("sum_value_dec").cast("double") / F.col("n_events")).alias(
                "avg_value"
            ),
        )
    )


def compact_rollup(
    spark, store_path: str, keys: tuple[str, ...] = ()
) -> str | None:
    """Merge all live partial batches into one, bounding read
    amplification. Crash-safe by ordering:

    1. aggregate the live batches into a NEW dir ``batch=c<n>``
       (invisible — readers only trust dirs, never markers-less
       compactions... i.e. an uncommitted target is just an extra
       batch dir that double-counts NOTHING because step 2 hasn't
       retired its sources yet and the target is excluded until its
       marker commits — see guard below);
    2. create ``_compactions/<n>.json`` naming target + sources — the
       single-file ATOMIC COMMIT: from this instant readers use the
       target and ignore the sources;
    3. delete the source dirs (pure garbage collection — a crash here
       only leaves ignored dirs).

    The step-1 guard: ``_live_batches`` drops a target dir whose
    marker is absent, so a crash between 1 and 2 leaves the store
    exactly as before (plus one orphan dir the next compaction
    overwrites). Returns the new batch id, or None if ≤1 live batch.
    """
    import json

    from ..sources.sinks import hadoop_fs

    live = _live_batches(spark, store_path)
    if not live or len(live) <= 1:
        return None
    fs, cpath = hadoop_fs(spark, f"{store_path}/_compactions")
    seq = 0
    if fs.exists(cpath):
        for st in fs.listStatus(cpath):
            name = st.getPath().getName()
            if name.endswith(".json"):
                seq = max(seq, int(name.split(".")[0]) + 1)
    target = f"c{seq}"

    df = spark.read.parquet(
        *[f"{store_path}/partials/batch={b}" for b in live]
    )
    merged = df.groupBy("window_start", "window_end", *keys).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value_dec").cast("decimal(38,4)").alias("sum_value_dec"),
    )
    merged.write.mode("overwrite").parquet(
        f"{store_path}/partials/batch={target}"
    )
    # marker commit is write-to-tmp + rename so a crash mid-write can
    # never leave a torn .json (readers also skip unparseable markers)
    marker = json.dumps({"target": target, "sources": live}).encode()
    tmp_p = hadoop_fs(spark, f"{store_path}/_compactions/{seq}.json.tmp")[1]
    out = fs.create(tmp_p, True)
    try:
        out.write(bytearray(marker))
    finally:
        out.close()
    final_p = hadoop_fs(spark, f"{store_path}/_compactions/{seq}.json")[1]
    if not fs.rename(tmp_p, final_p):
        raise RuntimeError(f"could not commit compaction marker {final_p}")
    for b in live:
        fs.delete(hadoop_fs(spark, f"{store_path}/partials/batch={b}")[1], True)
    return target


def reset_rollup(
    spark,
    store_path: str,
    snapshot: DataFrame,
    duration: str,
    keys: tuple[str, ...] = (),
    reset_id: str = "0",
) -> str:
    """Atomically REPLACE the store's contents with the rollup of
    ``snapshot`` (a full source snapshot — e.g. a txlog overwrite or
    RESTORE delivered by the change feed): the new partials are
    written to an invisible compaction-namespace target, then ONE
    marker commit simultaneously retires every previously-live batch
    and reveals the target — readers never observe an empty, doubled,
    or half-reset store, the same crash discipline as
    :func:`compact_rollup`.

    Idempotent by ``reset_id``: a committed marker stamped with it
    makes a replay a no-op returning the original target (the view
    maintainer derives the id from the source version, so crash
    replays re-derive it). Retiring the old batch ids also makes a
    FULL history replay safe: a pre-reset version's fold lands on a
    retired id, which the maintainer recognizes as
    already-accounted-for and skips (see
    ``rollup_view_available_now``)."""
    import json

    from ..sources.sinks import hadoop_fs

    rid = str(reset_id)
    for m in _read_markers(spark, store_path):
        if m.get("reset") == rid:
            return m["target"]  # replay of a committed reset
    _check_duration(spark, store_path, duration)
    live = _live_batches(spark, store_path) or []
    fs, cpath = hadoop_fs(spark, f"{store_path}/_compactions")
    seq = 0
    if fs.exists(cpath):
        for st in fs.listStatus(cpath):
            name = st.getPath().getName()
            if name.endswith(".json"):
                seq = max(seq, int(name.split(".")[0]) + 1)
    target = f"c{seq}"
    rollup_batch(snapshot, duration, *keys).write.mode("overwrite").parquet(
        f"{store_path}/partials/batch={target}"
    )
    marker = json.dumps(
        {"target": target, "sources": live, "reset": rid}
    ).encode()
    tmp_p = hadoop_fs(spark, f"{store_path}/_compactions/{seq}.json.tmp")[1]
    out = fs.create(tmp_p, True)
    try:
        out.write(bytearray(marker))
    finally:
        out.close()
    final_p = hadoop_fs(spark, f"{store_path}/_compactions/{seq}.json")[1]
    if not fs.rename(tmp_p, final_p):
        raise RuntimeError(f"could not commit reset marker {final_p}")
    for b in live:
        fs.delete(
            hadoop_fs(spark, f"{store_path}/partials/batch={b}")[1], True
        )
    return target


def retired_rollup_ids(spark, store_path: str) -> set:
    """Batch ids retired by any committed compaction/reset marker —
    their rows are already merged into a live target, so re-folding
    one would double-count (and ``upsert_rollup`` refuses it)."""
    return {
        s for m in _read_markers(spark, store_path) for s in m["sources"]
    }


def vacuum_rollup(spark, store_path: str) -> list[str]:
    """Garbage-collect dead partial dirs: sources retired by a
    committed compaction whose target dir exists (normally deleted by
    compact_rollup itself — this catches the crash-before-GC window).
    Orphan ``c<n>`` targets from crashed attempts are deliberately NOT
    deleted: compact_rollup derives its sequence from committed
    markers only, so the next compaction reuses the same seq and
    OVERWRITES the orphan — it is self-recycling, and deleting it here
    would race an in-flight compaction. Returns the deleted batch ids.
    Pure metadata work; safe to run any time."""
    from ..sources.sinks import hadoop_fs

    fs, ppath = hadoop_fs(spark, f"{store_path}/partials")
    if not fs.exists(ppath):
        return []
    dirs = {
        st.getPath().getName().split("=", 1)[1]
        for st in fs.listStatus(ppath)
        if st.isDirectory() and st.getPath().getName().startswith("batch=")
    }
    dead: set[str] = set()
    for m in _read_markers(spark, store_path):
        # sources of ANY committed marker are dead — including when a
        # later compaction already deleted this marker's own target
        dead |= set(m["sources"]) & dirs
    for b in sorted(dead):
        fs.delete(hadoop_fs(spark, f"{store_path}/partials/batch={b}")[1], True)
    return sorted(dead)


def _check_duration(spark, store_path: str, duration: str) -> None:
    """Pin the store's base window duration in a ``_meta.json``
    sidecar on first write; later writes with a DIFFERENT duration
    raise — mixing window widths in one partial store would silently
    corrupt every merged read."""
    import json

    from ..sources.sinks import hadoop_fs

    _duration_seconds(duration)  # reject unsupported width syntax early
    fs, mpath = hadoop_fs(spark, f"{store_path}/_meta.json")
    if fs.exists(mpath):
        raw = fs.open(mpath)
        try:
            data = bytes(
                spark.sparkContext._jvm.org.apache.commons.io.IOUtils.toByteArray(
                    raw
                )
            )
        finally:
            raw.close()
        stored = json.loads(data.decode("utf-8"))["duration"]
        if stored != duration:
            raise ValueError(
                f"rollup store {store_path} was built with duration "
                f"{stored!r}; refusing to upsert {duration!r} partials "
                "into it (mixed widths corrupt merged reads). Coarser "
                "readouts belong at read time: read_rollup(..., "
                "coarsen=...)."
            )
        return
    out = fs.create(mpath, True)
    try:
        out.write(bytearray(json.dumps({"duration": duration}).encode()))
    finally:
        out.close()


def _store_duration(spark, store_path: str) -> str | None:
    """The base window duration pinned in the store's _meta.json."""
    import json

    from ..sources.sinks import hadoop_fs

    fs, mpath = hadoop_fs(spark, f"{store_path}/_meta.json")
    if not fs.exists(mpath):
        return None
    raw = fs.open(mpath)
    try:
        data = bytes(
            spark.sparkContext._jvm.org.apache.commons.io.IOUtils.toByteArray(raw)
        )
    finally:
        raw.close()
    return json.loads(data.decode("utf-8"))["duration"]


_UNIT_SECONDS = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _duration_seconds(s: str | None) -> int | None:
    """Parse Spark's '<n> <unit>' window-duration strings to seconds
    (the subset the rollup store accepts — sub-second widths are not
    meaningful for a persisted rollup)."""
    if s is None:
        return None
    parts = s.strip().split()
    if len(parts) != 2 or not parts[0].isdigit() or parts[1] not in _UNIT_SECONDS:
        raise ValueError(
            f"unsupported rollup duration {s!r}; use '<n> "
            "second(s)/minute(s)/hour(s)/day(s)/week(s)'"
        )
    return int(parts[0]) * _UNIT_SECONDS[parts[1]]
