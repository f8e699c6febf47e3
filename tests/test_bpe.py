"""Trained BPE: learner vs a naive pure-Python re-implementation,
Arrow apply vs the pure-Python reference, determinism, reconstruction
and compression properties — on real sf0.001 documents plus adversarial
shapes."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.bpe import (
    PRETOKEN_RE,
    bpe_segment,
    bpe_token_counts,
    learn_bpe,
    learn_bpe_from_frequencies,
    segment_py,
    word_frequencies,
)
from distributed_mapreduce__spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _naive_learn(wordfreq, num_merges):
    """Textbook O(V) re-scan learner (Sennrich get_stats/merge_vocab),
    independent of the incremental implementation under test."""
    vocab = {tuple(w): n for w, n in wordfreq}
    merges = []
    for _ in range(num_merges):
        stats = {}
        for word, n in vocab.items():
            for p in zip(word, word[1:]):
                stats[p] = stats.get(p, 0) + n
        live = {p: n for p, n in stats.items() if n >= 2}
        if not live:
            break
        best = min(live, key=lambda p: (-live[p], p))
        merges.append(best)
        merged = best[0] + best[1]
        out = {}
        for word, n in vocab.items():
            w, j = [], 0
            while j < len(word):
                if j + 1 < len(word) and (word[j], word[j + 1]) == best:
                    w.append(merged)
                    j += 2
                else:
                    w.append(word[j])
                    j += 1
            out[tuple(w)] = out.get(tuple(w), 0) + n
        vocab = out
    return merges


def _naive_wordfreq(texts):
    freq = {}
    for t in texts:
        for w in re.findall(PRETOKEN_RE, t):
            freq[w] = freq.get(w, 0) + 1
    return sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text")


def test_word_frequencies_match_python(spark, docs):
    texts = [r.text for r in docs.collect()]
    got = word_frequencies(docs, max_word_types=10**9)
    assert got == _naive_wordfreq(texts)


def test_incremental_learner_matches_naive_rescan(spark, docs):
    wf = word_frequencies(docs, max_word_types=5000)
    assert learn_bpe_from_frequencies(wf, 150) == _naive_learn(wf, 150)


def test_learner_adversarial_shapes():
    # overlapping pairs ("aaaa"), full-word consumption, ties
    wf = [("aaaa", 3), ("abab", 2), ("ab", 5), ("ba", 5)]
    assert learn_bpe_from_frequencies(wf, 10) == _naive_learn(wf, 10)


def test_learn_is_deterministic(spark, docs):
    m1 = learn_bpe(docs, num_merges=60)
    m2 = learn_bpe(docs.repartition(7), num_merges=60)
    assert m1 == m2 and len(m1) == 60


def test_apply_matches_pure_python_reference(spark, docs):
    merges = learn_bpe(docs, num_merges=80)
    got = {
        r.doc_id: list(r.bpe_tokens)
        for r in bpe_segment(docs, merges).collect()
    }
    for r in docs.collect():
        assert got[r.doc_id] == segment_py(r.text, merges), r.doc_id
    assert any(len(t) > 1 for toks in got.values() for t in toks)


def test_tokens_reconstruct_pretokens(spark, docs):
    merges = learn_bpe(docs, num_merges=40)
    rows = (
        bpe_segment(docs, merges)
        .select(
            F.concat_ws("", "bpe_tokens").alias("joined"),
            F.concat_ws(
                "", F.regexp_extract_all("text", F.lit(PRETOKEN_RE), 0)
            ).alias("want"),
        )
        .filter(F.col("joined") != F.col("want"))
    )
    assert rows.count() == 0


def test_trained_counts_compress_vs_untrained(spark, docs):
    from distributed_mapreduce__spark.operators.text_analysis import (
        bpe_ish_token_count,
    )

    merges = learn_bpe(docs, num_merges=120)
    agg = (
        bpe_token_counts(docs, merges)
        .select(
            F.sum("bpe_token_count").alias("trained"),
            F.sum(F.length(F.concat_ws("", pretokens_col()))).alias("chars"),
            F.sum(bpe_ish_token_count()).alias("pretok"),
        )
        .first()
    )
    # trained tokens: strictly fewer than characters, and at least as
    # few as the zero-merge pre-token count is NOT guaranteed (BPE
    # splits below words) — the real invariant is chars >= trained >= pretok
    assert agg.chars > agg.trained >= agg.pretok


def pretokens_col():
    from distributed_mapreduce__spark.operators.bpe import pretokens

    return pretokens("text")


def test_nulls_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "ab ab ab")],
        "doc_id long, text string",
    )
    merges = [("a", "b")]
    got = {r.doc_id: list(r.bpe_tokens) for r in bpe_segment(df, merges).collect()}
    assert got == {1: [], 2: [], 3: [], 4: ["ab", "ab", "ab"]}


def test_merge_persistence_roundtrip(spark, docs, tmp_path):
    from distributed_mapreduce__spark.operators.bpe import (
        load_merges,
        save_merges,
    )

    merges = learn_bpe(docs, num_merges=50)
    path = str(tmp_path / "merges")
    save_merges(spark, merges, path)
    assert load_merges(spark, path) == merges


def test_vocab_and_id_encoding(spark):
    from distributed_mapreduce__spark.operators.bpe import (
        bpe_encode_ids,
        learn_bpe_from_frequencies,
        segment_py,
        vocab_from_merges,
    )

    wf = _naive_wordfreq(["ab ab abc", "ab abc abc"])
    merges = learn_bpe_from_frequencies(wf, 5)
    vocab = vocab_from_merges(wf, merges)
    # layout: unk, sorted alphabet, merge products in rank order
    assert vocab["<unk>"] == 0
    assert list(vocab)[1:4] == ["a", "b", "c"]
    for a, b in merges:
        assert a + b in vocab

    df = spark.createDataFrame(
        [(1, "ab abc"), (2, "zz ab")], "doc_id long, text string"
    )
    got = {r.doc_id: list(r.token_ids)
           for r in bpe_encode_ids(df, merges, vocab).collect()}
    want1 = [vocab[t] for t in segment_py("ab abc", merges)]
    assert got[1] == want1
    # 'z' was never in the training alphabet -> unk id 0
    assert got[2][:2] == [0, 0] or 0 in got[2]
    z_toks = segment_py("zz ab", merges)
    assert got[2] == [vocab.get(t, 0) for t in z_toks]
