"""Model-based randomized-operations test for the transactional table
(sources/txlog.py): a seeded random sequence of append / overwrite /
merge / delete / compact / vacuum runs against both the real table and
a trivial in-memory reference model; after EVERY operation the
snapshot read must equal the model, and a remembered historical
version must keep replaying exactly until a vacuum retires it.

This is the cheap half of Jepsen-style checking: single-writer
linear histories, exhaustively compared — the concurrency windows are
covered by the targeted race/conflict tests in test_txlog.py."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from distributed_mapreduce__spark.sources.txlog import (
    tx_compact,
    tx_delete,
    tx_merge,
    tx_read,
    tx_vacuum,
    tx_write,
)

#: slow tier (round 16): excluded from the driver-window default
#: run; the full suite (pytest -m "") runs and is logged every round.
pytestmark = __import__("pytest").mark.slow

N_OPS = 36
KEYSPACE = 60


def _to_df(spark, rows):
    if not rows:
        return spark.createDataFrame([], "id long, tag string")
    return spark.createDataFrame(rows, "id long, tag string")


def _snapshot(spark, path, version=None):
    return sorted(
        (r.id, r.tag)
        for r in tx_read(spark, path, version=version).collect()
    )


def test_random_op_sequence_matches_model(spark, tmp_path):
    rng = random.Random(20260814)
    t = str(tmp_path / "t")
    model: list[tuple[int, str]] = []
    tag_seq = 0

    def fresh_rows(k):
        nonlocal tag_seq
        tag_seq += 1
        keys = rng.sample(range(KEYSPACE), k)
        return [(key, f"t{tag_seq}") for key in keys]

    # bootstrap so every op has a table to act on
    model = fresh_rows(10)
    tx_write(_to_df(spark, model), t, stats_cols=["id"])
    history: list[tuple[int, list]] = []  # (version, expected rows)

    version = 0
    for step in range(N_OPS):
        op = rng.choice(
            ["append", "append", "merge", "merge", "delete",
             "overwrite", "compact", "vacuum"]
        )
        if op == "append":
            rows = fresh_rows(rng.randint(1, 8))
            version = tx_write(
                _to_df(spark, rows), t,
                stats_cols=["id"] if rng.random() < 0.5 else None,
            )
            model = model + rows
        elif op == "overwrite":
            rows = fresh_rows(rng.randint(1, 8))
            version = tx_write(_to_df(spark, rows), t, mode="overwrite")
            model = rows
        elif op == "merge":
            ups = fresh_rows(rng.randint(1, 6))
            version = tx_merge(_to_df(spark, ups), t, "id")
            up_keys = {k for k, _ in ups}
            model = [r for r in model if r[0] not in up_keys] + ups
        elif op == "delete":
            keys = rng.sample(range(KEYSPACE), rng.randint(1, 6))
            version = tx_delete(
                spark.createDataFrame([(k,) for k in keys], "id long"),
                t, "id",
            )
            model = [r for r in model if r[0] not in set(keys)]
        elif op == "compact":
            got = tx_compact(spark, t, target_files=2)
            if got is not None:
                version = got
        elif op == "vacuum":
            tx_vacuum(spark, t)
            history.clear()  # time travel legitimately dies here
        assert _snapshot(spark, t) == sorted(model), f"step {step} op {op}"
        if rng.random() < 0.25:
            history.append((version, sorted(model)))
        # a remembered old version still replays exactly
        if history and rng.random() < 0.3:
            v_old, want = rng.choice(history)
            assert _snapshot(spark, t, version=v_old) == want, (
                f"time travel to v{v_old} diverged at step {step}"
            )


def test_two_writer_interleaving_replays_consistently(spark, tmp_path):
    """Round-12 concurrency model test (VERDICT r11 #7, extended to
    the round-12-late surface): two writer threads interleave
    partitioned appends, keyed merges/deletes, DV predicate deletes
    (tx_delete_where), DV updates (tx_update), DV settlement
    (tx_apply_deletes), partition evolution, CHECK-constraint ADDs,
    CDF merges, and multi-table MERGEs against ONE bloom-covered
    table (plus a second participant table). Threads own disjoint
    keyspaces, so content-wise their successful operations commute
    and the final table must equal the union of the per-thread
    models; loud commit-time conflicts are legal outcomes (caught, op
    skipped) — including the NEW ones: a rewrite racing a live DV
    aborts via the planned-DV check, a DV commit racing a rewrite of
    its targets aborts via revalidation, and file-set ops refuse
    while DV debt is live. Afterwards EVERY version in the history
    must replay without error, and the writer-features property must
    carry the union of both threads' auto-stamps."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from distributed_mapreduce__spark.sources.multitx import tx_multi
    from distributed_mapreduce__spark.sources.txlog import (
        tx_add_constraint,
        tx_apply_deletes,
        tx_delete_where,
        tx_update,
        tx_history,
        tx_properties,
        tx_set_partitioning,
    )

    t = str(tmp_path / "t")
    t2 = str(tmp_path / "t2")
    coord = str(tmp_path / "coord")

    def mk(rows):
        return spark.createDataFrame(rows, "id long, k long, tag string")

    def rowset(lo, hi, n, tag, rng):
        return [(i, i % 4, tag) for i in rng.sample(range(lo, hi), n)]

    # bootstrap: partitioned on k, one row block per thread's range
    seed_a = rowset(0, 500, 8, "seed_a", random.Random(1))
    seed_b = rowset(500, 1000, 8, "seed_b", random.Random(2))
    tx_write(
        mk(seed_a + seed_b), t, partition_by=["k"], stats_cols=["id"],
        bloom_cols=["id"],  # merges/deletes exercise bloom refinement
    )
    tx_write(mk(seed_a), t2)
    tx_add_constraint(spark, t, "id_box", "id >= 0 AND id < 1000")

    models = {"a": {r[0]: r for r in seed_a}, "b": {r[0]: r for r in seed_b}}
    model2 = {"a": {r[0]: r for r in seed_a}, "b": {}}
    conflicts = []
    lock = threading.Lock()

    def is_conflict(exc) -> bool:
        msg = str(exc)
        return (
            "conflict" in msg
            or "does not match the table's" in msg
            or "changed while this" in msg
            or "could not commit" in msg
            # DV-debt refusals under interleaving: legal skips — the
            # other thread's delete/update debt is live until someone
            # settles it
            or "deletion vectors" in msg
            or "tombstones" in msg
        )

    def writer(name: str, lo: int, hi: int, seed: int):
        rng = random.Random(seed)
        step = 0
        for _ in range(10):
            step += 1
            op = rng.choice(
                ["append", "merge", "merge_cdf", "delete", "evolve",
                 "constraint", "multi", "dv_delete", "dv_update",
                 "settle"]
            )
            try:
                if op == "append":
                    avail = [
                        i for i in range(lo, hi) if i not in models[name]
                    ]
                    ids = rng.sample(avail, min(rng.randint(1, 5),
                                                len(avail)))
                    rows = [(i, i % 4, f"{name}{step}") for i in ids]
                    tx_write(mk(rows), t)
                    with lock:
                        models[name].update({r[0]: r for r in rows})
                elif op == "dv_delete":
                    x = rng.randint(lo, hi - 10)
                    tx_delete_where(
                        spark, t, f"id >= {x} AND id < {x + 10}"
                    )
                    with lock:
                        for k in [k for k in models[name]
                                  if x <= k < x + 10]:
                            models[name].pop(k)
                elif op == "dv_update":
                    x = rng.randint(lo, hi - 20)
                    tag = f"u{name}{step}"
                    tx_update(
                        spark, t, f"id >= {x} AND id < {x + 20}",
                        {"tag": f"'{tag}'"},
                    )
                    with lock:
                        for k in [k for k in models[name]
                                  if x <= k < x + 20]:
                            r = models[name][k]
                            models[name][k] = (r[0], r[1], tag)
                elif op == "settle":
                    tx_apply_deletes(spark, t)
                elif op in ("merge", "merge_cdf"):
                    rows = rowset(lo, hi, rng.randint(1, 4),
                                  f"{name}{step}", rng)
                    tx_merge(mk(rows), t, "id", cdf=(op == "merge_cdf"))
                    with lock:
                        models[name].update({r[0]: r for r in rows})
                elif op == "delete":
                    keys = rng.sample(range(lo, hi), rng.randint(1, 4))
                    tx_delete(
                        spark.createDataFrame([(k,) for k in keys], "id long"),
                        t, "id",
                    )
                    with lock:
                        for k in keys:
                            models[name].pop(k, None)
                elif op == "evolve":
                    spec = rng.choice([["k"], ["bucket(4, id)"], []])
                    tx_set_partitioning(spark, t, spec)
                elif op == "constraint":
                    # always-true for every row either thread writes
                    tx_add_constraint(
                        spark, t, f"tag_{name}", "tag IS NOT NULL"
                    )
                elif op == "multi":
                    rows = rowset(lo, hi, rng.randint(1, 3),
                                  f"{name}{step}m", rng)
                    tx_multi(
                        {t: mk(rows), t2: mk(rows)},
                        coordinator=coord,
                        txn=f"{name}-multi-{step}",
                        modes={t: "merge", t2: "merge"},
                        merge_keys={t: "id", t2: "id"},
                    )
                    with lock:
                        models[name].update({r[0]: r for r in rows})
                        model2[name].update({r[0]: r for r in rows})
            except Exception as exc:  # noqa: BLE001
                if is_conflict(exc):
                    conflicts.append((name, op, str(exc)[:60]))
                else:
                    raise

    with ThreadPoolExecutor(2) as pool:
        fa = pool.submit(writer, "a", 0, 500, 20260815)
        fb = pool.submit(writer, "b", 500, 1000, 20260816)
        fa.result()
        fb.result()

    want = sorted({**models["a"], **models["b"]}.values())
    got = sorted(
        (r.id, r.k, r.tag) for r in tx_read(spark, t).collect()
    )
    assert got == want
    want2 = sorted({**model2["a"], **model2["b"]}.values())
    got2 = sorted(
        (r.id, r.k, r.tag) for r in tx_read(spark, t2).collect()
    )
    assert got2 == want2
    # every committed version replays without error (torn-history pin)
    for h in tx_history(spark, t):
        assert tx_read(spark, t, version=h["version"]).count() >= 0
    # the union fold under real interleaving: a CDF merge by one
    # thread and partitioned/evolution commits by the other must BOTH
    # survive in writer.features
    feats = set(tx_properties(spark, t).get("writer.features", []))
    assert {"partitioning", "constraints"} <= feats


def test_row_id_invariants_over_random_ops(spark, tmp_path):
    """Row-tracking model pins over a seeded random op sequence
    (round 13): after EVERY operation on a tracked table,

    - every visible row has a NON-NULL id and ids are UNIQUE
      (count == countDistinct — the core identity contract);
    - PURE rewrites (compact, settle) preserve the full id -> row
      mapping bit-exactly;
    - content-changing ops (merge, DV delete/update) may retire and
      mint ids but never collide with ids seen across the table's
      whole history (version-scoped ranges make reuse impossible)."""
    import random

    from pyspark.sql import functions as F

    from distributed_mapreduce__spark.sources.txlog import (
        tx_apply_deletes,
        tx_delete_where,
        tx_enable_row_tracking,
        tx_scan_with_row_ids,
        tx_update,
    )

    rng = random.Random(20260817)
    t = str(tmp_path / "t")
    tx_write(
        _to_df(spark, [(i, "base") for i in range(40)]).repartition(3),
        t, stats_cols=["id"],
    )
    tx_enable_row_tracking(spark, t)

    def id_map():
        return {
            r._row_id: (r.id, r.tag)
            for r in tx_scan_with_row_ids(spark, t).collect()
        }

    seen_ids = set(id_map())
    tag_seq = 0
    for step in range(18):
        op = rng.choice(
            ["append", "append", "merge", "dv_delete", "dv_update",
             "compact", "settle"]
        )
        tag_seq += 1
        before = id_map()
        pure = False
        try:
            if op == "append":
                rows = [(100 * tag_seq + j, f"a{tag_seq}")
                        for j in range(rng.randint(1, 6))]
                tx_write(_to_df(spark, rows), t)
            elif op == "merge":
                rows = [(rng.randrange(40), f"m{tag_seq}")]
                tx_merge(_to_df(spark, rows), t, "id")
            elif op == "dv_delete":
                tx_delete_where(spark, t, f"id % 9 = {step % 9}")
            elif op == "dv_update":
                tx_update(
                    spark, t, f"id % 7 = {step % 7}",
                    {"tag": f"'u{tag_seq}'"},
                )
            elif op == "compact":
                tx_compact(spark, t, target_files=2)
                pure = True
            elif op == "settle":
                tx_apply_deletes(spark, t)
                pure = True
        except (RuntimeError, ValueError):
            # legal refusals (compact/merge over live DV debt) leave
            # the table consistent; the invariants must hold anyway
            pure = None
        after = id_map()
        # uniqueness + completeness, every step
        df = tx_scan_with_row_ids(spark, t)
        agg = df.agg(
            F.count("*").alias("n"),
            F.countDistinct("_row_id").alias("d"),
            F.sum(F.col("_row_id").isNull().cast("int")).alias("nulls"),
        ).collect()[0]
        assert agg.n == agg.d and (agg.nulls or 0) == 0, (step, op)
        if pure:
            assert after == before, f"step {step}: {op} re-identified rows"
        # no id from the table's history is ever minted twice for a
        # DIFFERENT row
        for rid, row in after.items():
            if rid in seen_ids and rid in before:
                continue  # still the same id; row content may evolve
            assert rid not in seen_ids, (step, op, rid)
        seen_ids |= set(after)
