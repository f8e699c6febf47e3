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
