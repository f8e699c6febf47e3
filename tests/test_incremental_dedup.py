"""Incremental dedup against a persisted index: planted exact/near/
fresh docs behave as tagged, and the fuzzy decisions replay exactly in
DuckDB (band-candidate ∧ signature-estimate) on a history/new split of
the fixture corpus."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.dedup import (
    dedup_index,
    incremental_dedup,
)
from distributed_mapreduce__spark.queries.dedup_q import (
    _MH_BANDS_UNION,
    _MH_SIG_COLS,
    _SHINGLES_CTE,
)
from distributed_mapreduce__spark.sources.tables import load_table
from tests.oracle_utils import duck_connect

SF = "/root/testdata/sf0.01"
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_planted_batch_tags_and_index_update(spark):
    history = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again", "en", "s", 0),
            (2, "spark shuffles partition data between stages for joins", "en", "s", 0),
        ],
        DOC_SCHEMA,
    )
    idx = dedup_index(history)
    assert idx.count() == 2

    new = spark.createDataFrame(
        [
            # exact dup of 1 modulo case/whitespace normalization
            (10, "The quick  brown fox jumps over the lazy dog again and again", "en", "s", 0),
            # near dup of 2 (one token changed)
            (11, "spark shuffles partition data between stages for aggregations", "en", "s", 0),
            # fresh
            (12, "completely unrelated content about gardening tulips in spring soil", "en", "s", 0),
        ],
        DOC_SCHEMA,
    )
    tagged, updated = incremental_dedup(new, idx)
    reasons = {r.doc_id: r.drop_reason for r in tagged.collect()}
    assert reasons[10] == "dup_exact"
    assert reasons[11] == "dup_near"
    assert reasons[12] is None

    # index grew by exactly the kept doc, and is reusable: replaying the
    # same batch against it now drops everything
    assert updated.count() == 3
    replay, _ = incremental_dedup(new, updated)
    assert all(r.drop_reason is not None for r in replay.collect())


def test_fuzzy_decisions_match_duckdb_replay(spark):
    docs = load_table(spark, SF, "documents")
    history = docs.filter(F.col("doc_id") < 250)
    new = docs.filter(F.col("doc_id") >= 250)

    tagged, _ = incremental_dedup(new, dedup_index(history))
    got_near = {
        r.doc_id
        for r in tagged.filter(F.col("drop_reason") == "dup_near").collect()
    }
    got_exact = {
        r.doc_id
        for r in tagged.filter(F.col("drop_reason") == "dup_exact").collect()
    }

    con = duck_connect(SF)
    agree = " + ".join(
        f"CASE WHEN n.mh{s} = o.mh{s} THEN 1 ELSE 0 END" for s in range(16)
    )
    rows = con.execute(
        f"""
        WITH {_SHINGLES_CTE},
        hmv AS (
          SELECT doc_id,
                 list_reduce(list_transform(generate_series(1, 15),
                    i -> CAST(strpos('0123456789abcdef', substring(md5(shingle), i, 1)) - 1
                              AS BIGINT)),
                   (a, b) -> a * 16 + b) % 2147483647 AS hm
          FROM sh
        ),
        sig AS (SELECT doc_id, {_MH_SIG_COLS} FROM hmv GROUP BY doc_id),
        bands AS ({_MH_BANDS_UNION}),
        cand AS (
          SELECT DISTINCT nb.doc_id AS new_id, ob.doc_id AS old_id
          FROM bands nb JOIN bands ob
            ON nb.band = ob.band AND nb.band_key = ob.band_key
          WHERE nb.doc_id >= 250 AND ob.doc_id < 250
        ),
        exacts AS (
          SELECT DISTINCT n.doc_id AS new_id
          FROM documents n JOIN documents o
            ON md5(regexp_replace(trim(lower(n.text)), '\\s+', ' ', 'g'))
             = md5(regexp_replace(trim(lower(o.text)), '\\s+', ' ', 'g'))
          WHERE n.doc_id >= 250 AND o.doc_id < 250
        )
        SELECT c.new_id,
               max(CAST({agree} AS DOUBLE) / 16.0) AS best_est,
               bool_or(c.new_id IN (SELECT new_id FROM exacts)) AS is_exact
        FROM cand c
        JOIN sig n ON n.doc_id = c.new_id
        JOIN sig o ON o.doc_id = c.old_id
        GROUP BY c.new_id
        """
    ).fetchall()
    want_exact = {
        r[0] for r in con.execute("SELECT DISTINCT n.doc_id FROM documents n JOIN documents o ON md5(regexp_replace(trim(lower(n.text)), '\\s+', ' ', 'g')) = md5(regexp_replace(trim(lower(o.text)), '\\s+', ' ', 'g')) WHERE n.doc_id >= 250 AND o.doc_id < 250").fetchall()
    }
    want_near = {r[0] for r in rows if r[1] >= 0.5} - want_exact

    assert got_exact == want_exact
    assert got_near == want_near
    assert want_near or want_exact  # split actually exercises the paths


def test_near_dup_pairs_front_door(spark):
    """The near-dup front door: auto routes small corpora to the exact
    all-pairs baseline; the LSH branch is a PRECISION-IDENTICAL subset
    (candidates are exact-verified); planted near-dups surface on both
    branches; unknown strategies raise."""
    import pytest

    from distributed_mapreduce__spark.operators.dedup import near_dup_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, "en", "s", len(base)),
        (2, base + " extra", "en", "s", len(base) + 6),  # near-dup of 1
        (3, "completely different words in this unrelated document here",
         "en", "s", 58),
        (4, "yet another entirely distinct text with no overlap at all",
         "en", "s", 57),
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)

    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in near_dup_pairs(docs, threshold=0.5, strategy="exact").collect()
    }
    auto = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in near_dup_pairs(docs, threshold=0.5).collect()  # auto → exact
    }
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in near_dup_pairs(docs, threshold=0.5, strategy="lsh").collect()
    }
    assert auto == exact
    assert (1, 2) in exact
    assert set(lsh) <= set(exact)            # perfect precision
    for k, v in lsh.items():
        assert v == exact[k]                 # identical exact scores
    assert (1, 2) in lsh                     # the planted pair collides
    # forcing the big-corpus route via doc_count picks LSH
    routed = {
        (r.doc_a, r.doc_b)
        for r in near_dup_pairs(
            docs, threshold=0.5, doc_count=10**9
        ).collect()
    }
    assert routed == set(lsh)
    with pytest.raises(ValueError, match="unknown strategy"):
        near_dup_pairs(docs, strategy="simhashish")


@pytest.mark.slow  # round-16 tier: driver-window default excludes it
def test_dedup_pipe_over_txlog_feed_matches_single_batch(spark, tmp_path):
    """Round 10 capstone composition: the exactly-once dedup pipe over
    the txlog change feed. Ingesting the corpus as two id-ordered ACID
    commits and draining incrementally must keep EXACTLY the documents
    a single-batch run keeps (first-wins == min-id-wins when batches
    are id-ordered), the survivor and index tables must stay
    consistent through a lost-cursor crash replay, and a quiet tick
    writes nothing."""
    from distributed_mapreduce__spark.sources.tables import load_table
    from distributed_mapreduce__spark.sources.txlog import (
        tx_history,
        tx_read,
        tx_write,
    )
    from distributed_mapreduce__spark.streaming.dedup import (
        dedup_pipe_available_now,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]

    def survivors(path):
        return sorted(r.doc_id for r in tx_read(spark, path).collect())

    # incremental: two id-ordered commits, drained across two ticks
    src = str(tmp_path / "src")
    dst, idx = str(tmp_path / "dst"), str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    tx_write(docs.filter(F.col("doc_id") <= mid), src)
    r1 = dedup_pipe_available_now(
        spark, src, dst, checkpoint=ckpt, index=idx
    )
    assert r1["versions"] == 1 and r1["writes"] == 2
    tx_write(docs.filter(F.col("doc_id") > mid), src)
    dedup_pipe_available_now(spark, src, dst, checkpoint=ckpt, index=idx)
    incremental = survivors(dst)

    # reference: the whole corpus as ONE commit through the same pipe
    src2, dst2, idx2 = (
        str(tmp_path / "src2"), str(tmp_path / "dst2"), str(tmp_path / "idx2")
    )
    tx_write(docs, src2)
    dedup_pipe_available_now(
        spark, src2, dst2, checkpoint=str(tmp_path / "ckpt2"), index=idx2
    )
    assert incremental == survivors(dst2)
    assert 0 < len(incremental) < docs.count()  # it actually deduped

    # the index stays exactly the survivors' signatures
    assert sorted(
        r.doc_id for r in tx_read(spark, idx).collect()
    ) == incremental

    # crash replay: lost cursor, full re-drain — txn dedup on BOTH
    # tables, nothing duplicated, no new commits
    import pathlib

    pathlib.Path(ckpt, "cursor.json").unlink()
    n_dst, n_idx = len(tx_history(spark, dst)), len(tx_history(spark, idx))
    dedup_pipe_available_now(spark, src, dst, checkpoint=ckpt, index=idx)
    assert len(tx_history(spark, dst)) == n_dst
    assert len(tx_history(spark, idx)) == n_idx
    assert survivors(dst) == incremental

    # quiet tick
    r = dedup_pipe_available_now(spark, src, dst, checkpoint=ckpt, index=idx)
    assert r["writes"] == 0
