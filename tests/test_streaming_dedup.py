"""Streaming dedup: first arrival wins, duplicates dropped as data
arrives; watermarked variant bounds state. Driven synchronously through
the memory sink like the other streaming parity tests."""

from __future__ import annotations

import pytest

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_mapreduce__spark.streaming.dedup import (
    stream_dedup_within_watermark,
    stream_exact_dedup,
)
from distributed_mapreduce__spark.streaming.windows import run_to_memory_sink

_DOCS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)
_EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def test_stream_exact_dedup_keeps_one_per_text(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    # Two micro-files; 'alpha' and 'beta' each appear in both.
    (src / "a.json").write_text(
        "\n".join(
            json.dumps(d)
            for d in [
                {"doc_id": 1, "text": "alpha"},
                {"doc_id": 2, "text": "beta"},
                {"doc_id": 3, "text": "alpha"},
            ]
        )
    )
    (src / "b.json").write_text(
        "\n".join(
            json.dumps(d)
            for d in [
                {"doc_id": 4, "text": "beta"},
                {"doc_id": 5, "text": "gamma"},
            ]
        )
    )
    stream = spark.readStream.schema(_DOCS).json(str(src))
    run_to_memory_sink(stream_exact_dedup(stream), "sdedup", output_mode="append")
    out = spark.table("sdedup")
    texts = [r.text for r in out.collect()]
    assert sorted(texts) == ["alpha", "beta", "gamma"]  # one survivor each
    assert out.select("text_hash").distinct().count() == 3


def _wc_text(seed: str, n: int = 40) -> str:
    """Deterministic ~40-token text with a seed-specific vocabulary."""
    words = [f"{seed}w{i % 7}" for i in range(n)]
    return " ".join(words)


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_stream_incremental_dedup_end_to_end(spark, tmp_path):
    """The production curation shape: three micro-batches arrive; exact
    and NEAR duplicates — both within a batch and against PRIOR batches
    — are dropped via the persisted signature index; survivors and the
    index grow batch by batch; a restart with a new file neither loses
    nor duplicates output (checkpoint + per-batch dynamic overwrite)."""
    from distributed_mapreduce__spark.streaming.dedup import (
        stream_incremental_dedup,
    )

    src = tmp_path / "arriving"
    src.mkdir()
    index_path = str(tmp_path / "index")
    out_path = str(tmp_path / "survivors")
    ckpt = str(tmp_path / "ckpt")

    near_a = _wc_text("alpha") + " extratoken"  # near-dup of alpha
    # batch 1: two originals + one intra-batch exact dup
    (src / "b1.json").write_text(
        "\n".join(
            json.dumps(d)
            for d in [
                {"doc_id": 1, "text": _wc_text("alpha")},
                {"doc_id": 2, "text": _wc_text("beta")},
                {"doc_id": 3, "text": _wc_text("alpha")},  # exact dup of 1
            ]
        )
    )
    stream = spark.readStream.schema(_DOCS).json(str(src))
    q = stream_incremental_dedup(stream, index_path, out_path, ckpt)
    q.processAllAvailable()

    # batch 2: exact dup of doc 2 (cross-batch), near-dup of doc 1, new doc
    (src / "b2.json").write_text(
        "\n".join(
            json.dumps(d)
            for d in [
                {"doc_id": 10, "text": _wc_text("beta")},   # exact vs history
                {"doc_id": 11, "text": near_a},              # near vs history
                {"doc_id": 12, "text": _wc_text("gamma")},
            ]
        )
    )
    q.processAllAvailable()

    kept = sorted(r.doc_id for r in spark.read.parquet(out_path).collect())
    assert kept == [1, 2, 12]
    idx_ids = sorted(r.doc_id for r in spark.read.parquet(index_path).collect())
    assert idx_ids == [1, 2, 12]  # index grew with the survivors only
    q.stop()

    # restart: a NEW query from the same checkpoint sees only new files
    (src / "b3.json").write_text(
        json.dumps({"doc_id": 20, "text": _wc_text("gamma")})  # dup vs history
        + "\n"
        + json.dumps({"doc_id": 21, "text": _wc_text("delta")})
    )
    stream2 = spark.readStream.schema(_DOCS).json(str(src))
    q2 = stream_incremental_dedup(stream2, index_path, out_path, ckpt)
    q2.processAllAvailable()
    q2.stop()

    kept2 = sorted(r.doc_id for r in spark.read.parquet(out_path).collect())
    assert kept2 == [1, 2, 12, 21]  # no loss, no duplication, 20 dropped


def test_stream_dedup_within_watermark_drops_replays(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    rows = [
        {"event_id": 1, "ts": "2026-01-01T10:00:00"},
        {"event_id": 2, "ts": "2026-01-01T10:05:00"},
        {"event_id": 1, "ts": "2026-01-01T10:10:00"},  # replay within horizon
        {"event_id": 3, "ts": "2026-01-01T10:15:00"},
        {"event_id": 2, "ts": "2026-01-01T10:20:00"},  # replay within horizon
    ]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema(_EVENTS).json(str(src))
    deduped = stream_dedup_within_watermark(stream, ["event_id"], horizon="1 hour")
    run_to_memory_sink(deduped, "swdedup", output_mode="append")
    out = spark.table("swdedup")
    ids = sorted(r.event_id for r in out.collect())
    assert ids == [1, 2, 3]
    # First arrival wins: the surviving ts for id 1 is the 10:00 row.
    first = {r.event_id: r.ts for r in out.collect()}
    assert first[1].minute == 0 and first[2].minute == 5


# --- round 11: exact-verify option for the intra-batch near-dup drop --


def _planted_batch(spark):
    """Deterministic paraphrase strata: 8 base docs (12 tokens each),
    a HIGH paraphrase of each (1 token changed → true 3-gram Jaccard
    ≈ 0.82) and a LOW variant (7 tokens changed → well under 0.5)."""
    rows = []
    for i in range(8):
        toks = [f"w{i}x{j}" for j in range(12)]
        rows.append((i * 10, " ".join(toks), "en", "s", 0))
        high = list(toks)
        high[-1] = "CHANGED"
        rows.append((i * 10 + 1, " ".join(high), "en", "s", 0))
        low = list(toks)
        for j in range(3, 10):
            low[j] = f"other{i}x{j}"
        rows.append((i * 10 + 2, " ".join(low), "en", "s", 0))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_exact_verify_precision_recall_gate(spark):
    """VERDICT r10 #5: verify='exact' makes the intra-batch near-dup
    drop estimator-noise-free — its drop set is EXACTLY the banded
    candidates whose true Jaccard clears the threshold (perfect
    precision AND recall vs ground truth); the 16-seed estimate mode
    must catch every high-J paraphrase and never drop a low-J one,
    but may wobble on borderline pairs (why 'exact' exists)."""
    from distributed_mapreduce__spark.operators.dedup import (
        dedup_index,
        doc_shingles,
        exact_jaccard,
        hashed_shingles,
        lsh_bands,
        lsh_candidate_pairs,
    )
    from distributed_mapreduce__spark.streaming.dedup import intra_batch_dedup

    batch = _planted_batch(spark)
    all_ids = {r.doc_id for r in batch.select("doc_id").collect()}

    # ground truth: banded candidates with true Jaccard >= 0.5
    idx = dedup_index(batch)
    cand = lsh_candidate_pairs(lsh_bands(idx.filter(F.col("mh0").isNotNull())))
    hs = hashed_shingles(doc_shingles(batch, distinct=False))
    truth = {
        (r.doc_a, r.doc_b)
        for r in exact_jaccard(hs, pairs=cand, key="hm")
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }
    assert truth  # the high stratum must actually produce candidates
    want_drop = {b for _, b in truth}

    clean_exact = intra_batch_dedup(batch, 0.5, verify="exact")
    kept_exact = {r.doc_id for r in clean_exact.select("doc_id").collect()}
    assert all_ids - kept_exact == want_drop  # perfect precision+recall

    clean_est = intra_batch_dedup(batch, 0.5, verify="estimate")
    kept_est = {r.doc_id for r in clean_est.select("doc_id").collect()}
    dropped_est = all_ids - kept_est
    high_ids = {i * 10 + 1 for i in range(8)}
    low_ids = {i * 10 + 2 for i in range(8)}
    # measured floors, not perfection: on THIS fixture one J≈0.82
    # pair never shares a band (8-bands-of-2 recall, upstream of BOTH
    # verifiers), so its paraphrase survives everywhere. Within the
    # candidates, exact mode is noise-free by the set-equality assert
    # above; the estimate may additionally wobble on borderline pairs.
    assert len(high_ids & dropped_est) >= 7   # recall ≥ 7/8 on positives
    assert not (low_ids & dropped_est)        # precision on clear negatives
    # exact-verified drops are never WRONG (subset of true positives)
    assert (all_ids - kept_exact) <= high_ids

    import pytest

    with pytest.raises(ValueError, match="verify must be"):
        intra_batch_dedup(batch, 0.5, verify="simhash")


def test_dedup_pipe_exact_verify_end_to_end(spark, tmp_path):
    """The pipe threads verify='exact' through: planted high-J
    paraphrases are dropped, low-J variants kept, across a two-commit
    incremental drain."""
    from distributed_mapreduce__spark.sources.txlog import tx_read, tx_write
    from distributed_mapreduce__spark.streaming.dedup import (
        dedup_pipe_available_now,
    )

    batch = _planted_batch(spark)
    src, dst, idx = (
        str(tmp_path / "src"), str(tmp_path / "dst"), str(tmp_path / "idx")
    )
    tx_write(batch.filter(F.col("doc_id") < 40), src)
    tx_write(batch.filter(F.col("doc_id") >= 40), src)
    dedup_pipe_available_now(
        spark, src, dst, checkpoint=str(tmp_path / "ck"), index=idx,
        verify="exact",
    )
    kept = {r.doc_id for r in tx_read(spark, dst).collect()}
    high_ids = {i * 10 + 1 for i in range(8)}
    assert {i * 10 for i in range(8)} <= kept      # bases survive
    # ≥7/8 high paraphrases drop (one pair never bands — LSH recall,
    # upstream of the verifier; see the gate test) and nothing else does
    assert len(high_ids - kept) >= 7
    assert kept - {i * 10 for i in range(8)} - {
        i * 10 + 2 for i in range(8)
    } <= high_ids
    assert {i * 10 + 2 for i in range(8)} <= kept  # low variants survive


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_tx_dedup_table_in_place(spark, tmp_path):
    """tx_dedup_table: the pipe's decision procedure over a table
    snapshot, losers erased as a deletion vector — zero rewrites."""
    from pyspark.sql import functions as F

    from distributed_mapreduce__spark.sources.txlog import (
        _replay,
        _snapshot_files,
        tx_read,
        tx_write,
    )
    from distributed_mapreduce__spark.streaming.dedup import tx_dedup_table

    def text(i):  # 30 unique tokens per doc: no cross-doc shingles
        return " ".join(f"w{i}x{j}" for j in range(30))

    rows = [(i, text(i)) for i in range(20)]
    # whitespace/case-normalized EXACT dup of doc 3
    rows += [(100, "  " + text(3).upper() + "  ")]
    # near-dup paraphrase of doc 5: one token swapped
    rows += [(101, text(5).replace("w5x20", "zzz"))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = str(tmp_path / "t")
    tx_write(df.filter("doc_id < 10").coalesce(1), t)
    tx_write(df.filter("doc_id >= 10").coalesce(1), t)
    before, _ = _snapshot_files(spark, t)
    v = tx_dedup_table(spark, t)
    assert v is not None
    out = tx_read(spark, t)
    ids = {r.doc_id for r in out.collect()}
    # normalized-exact dup of doc 3 died; earlier copy survived
    assert 3 in ids
    # the paraphrase is a near-dup of doc 5: the later identity died
    assert 5 in ids and 101 not in ids
    # zero files rewritten
    after, _ = _snapshot_files(spark, t)
    assert sorted(before) == sorted(after)
    assert 100 not in ids  # the exact dup died
    assert len(ids) == 20  # everything else untouched
    # idempotent: a clean table commits nothing
    assert tx_dedup_table(spark, t) is None
    # exact-verify route agrees on this corpus
    t2 = str(tmp_path / "t2")
    tx_write(df.coalesce(1), t2)
    tx_dedup_table(spark, t2, verify="exact")
    ids2 = {r.doc_id for r in tx_read(spark, t2).collect()}
    assert 101 not in ids2 and 100 not in ids2 and 5 in ids2
