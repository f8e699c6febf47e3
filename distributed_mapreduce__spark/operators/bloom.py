"""Broadcast Bloom-filter membership — decontamination at corpus scale.

The decontamination scan (operators/dedup.ngram_contamination) joins
every training-corpus shingle against the eval set's shingles. That is
map-only while the eval shingles fit a broadcast hash table — but a
large benchmark suite at n=13 can carry 10⁷–10⁸ distinct shingle
STRINGS (GBs as a broadcast of strings, past Spark's 8 GB broadcast
ceiling), and the join probes a string hash table for every corpus
shingle. A Bloom filter fixes both ends:

- the broadcast artifact is a bitset — ~1.2 MB per million items at
  1% fpp, two orders smaller than the string table;
- the corpus-side pass is a pure map (k hash-and-bit-test per
  shingle): no join, no shuffle, no aggregation touches the 100 TB
  side until it has been pruned to the (tiny) maybe-contaminated set;
- the exact verify then joins ONLY Bloom survivors against the eval
  shingles — false positives die there, and Bloom filters have no
  false negatives, so the final output is bit-identical to the exact
  scan (the same candidate-restrict posture as the LSH verify join
  and the Misra–Gries recount).

Hashes are the repo's content-addressed md5 family
(functions/hashing.md5_long with seed = hash index), so membership is
a pure function of (value, m, k) — any engine replays it, and the
DuckDB oracle checks the bit arithmetic itself (tests/test_bloom.py).

Two probe methods with identical results (same posture as
operators/projection.py):

- ``method='sql'``: the word array inlined as an array<bigint>
  literal; position + bit test are whole-stage-codegen column algebra,
  SQL-replayable. Guarded at :data:`SQL_MAX_WORDS` — beyond it the
  literal bloats the plan.
- ``method='arrow'``: one Arrow-batched ``mapInPandas`` with the
  packed bitset shipped once per executor via ``sc.broadcast`` — for
  production-sized filters (MBs–GBs of bitset).

Build is mergeable-summaries style: each partition folds its values
into a local m-bit numpy bitset (O(m/8) task memory, zero shuffle of
the value strings — only ≤ n_partitions bitset rows come back to be
OR-ed). The value side of a Bloom build is the EVAL side — benchmark
suites, blocklists — so n_partitions × m/8 bytes collected is bounded
small; the 100 TB side only ever probes.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

#: method='sql' guard: beyond this many inlined 64-bit words the plan
#: literal stops being reasonable — route bigger filters to 'arrow'.
#: 8192 words = 512 Kbit ≈ 54k items at 1% fpp.
SQL_MAX_WORDS = 8_192

#: Partitions the value side is coalesced to before the bitset fold, so
#: the driver OR-merge sees a bounded number of m/8-byte rows.
BUILD_PARTITIONS = 64


def bloom_parameters(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Textbook sizing: m = ⌈-n·ln p / ln²2⌉ bits (rounded up to a
    64-bit word), k = round(m/n · ln 2) hash functions."""
    if n_items <= 0:
        raise ValueError(f"n_items must be positive, got {n_items}")
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    m = math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


@dataclass(frozen=True)
class BloomFilter:
    """Packed Bloom bitset + its hash parameters.

    ``words`` is little-endian within each 64-bit word: bit ``pos`` of
    the filter lives at ``words[pos >> 6] >> (pos & 63) & 1``. Hash i
    of a value is ``md5_long(value, seed=i) % m`` — the same
    content-addressed family as the sampling/minhash operators, so any
    engine recomputes identical positions.
    """

    m: int
    k: int
    words: np.ndarray  # uint64[m / 64]

    def contains(self, value: str) -> bool:
        """Driver-side membership (tests / spot checks)."""
        for pos in _positions_py(value, self.m, self.k):
            if not (int(self.words[pos >> 6]) >> (pos & 63)) & 1:
                return False
        return True

    def to_bytes(self) -> bytes:
        return self.words.astype("<u8").tobytes()

    @classmethod
    def from_bytes(cls, m: int, k: int, raw: bytes) -> "BloomFilter":
        return cls(m=m, k=k, words=np.frombuffer(raw, dtype="<u8").copy())


def _positions_py(value: str, m: int, k: int) -> list[int]:
    """Pure-Python mirror of the column-side hash chain: 60-bit fold of
    md5('<i>:' || value) mod m, per hash index i."""
    out = []
    for i in range(k):
        h = int(hashlib.md5(f"{i}:{value}".encode()).hexdigest()[:15], 16)
        out.append(h % m)
    return out


def _position_col(col: Column, m: int, i: int) -> Column:
    return md5_long(col, seed=i) % F.lit(m)


#: Values one fold task should own before the build fans out: below
#: this, python-worker task startup dominates the md5 hashing itself
#: (measured at a 26k-item build: 32 fold tasks 1.9 s vs ONE task
#: 0.49 s on the same cached input — guide §4.5's amortization logic
#: applied to task count).
BUILD_ITEMS_PER_TASK = 200_000


def bloom_build(
    df: DataFrame,
    col: Column | str,
    m: int,
    k: int,
    n_items_hint: int | None = None,
) -> BloomFilter:
    """Fold ``col``'s values into an m-bit Bloom filter.

    Two narrow map stages, no shuffle of values: each task builds a
    local bitset (numpy, m/64 uint64 words) over its partition's
    values and emits it as one binary row; a second single-task map
    stage ORs the ≤ :data:`BUILD_PARTITIONS` partials executor-side,
    so the driver receives exactly ONE filter-sized row — there is no
    driver-side fold anywhere in the family. The value strings never
    move; only bitsets do. NULLs are skipped (NULL is not a member of
    anything).

    ``n_items_hint`` (the caller usually just counted the values to
    size ``m``) picks the fold parallelism: ~one task per
    :data:`BUILD_ITEMS_PER_TASK` values, so an eval-set-sized build is
    ONE task (and skips the or-merge stage entirely) while a 10⁸-item
    blocklist still fans out to :data:`BUILD_PARTITIONS` tasks.

    CONTRACT (ADVICE r15): the hint must be an actual measured count
    of the values — every in-repo caller passes the count it already
    ran to size ``m``. An undersized ESTIMATE (hint 1k, actual 10⁸)
    stays correct but coalesces the dominant md5 fold onto one task;
    pass None when no exact count is at hand and the fold keeps the
    input's own parallelism (capped at :data:`BUILD_PARTITIONS`).
    """
    if m % 64 != 0:
        raise ValueError(f"m must be a multiple of 64, got {m}")
    c = F.col(col) if isinstance(col, str) else col
    vals = df.select(c.cast("string").alias("v")).filter(F.col("v").isNotNull())
    if n_items_hint is not None:
        parts = max(
            1, min(BUILD_PARTITIONS, math.ceil(n_items_hint / BUILD_ITEMS_PER_TASK))
        )
        if vals.rdd.getNumPartitions() > parts:
            vals = vals.coalesce(parts)
    elif vals.rdd.getNumPartitions() > BUILD_PARTITIONS:
        vals = vals.coalesce(BUILD_PARTITIONS)

    n_words = m // 64

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Batch the bit-sets: collect all positions of a batch first,
        # then one vectorized scatter-OR — per-element numpy scalar |=
        # cost ~2 µs each and dominated the build (guide §4.2).
        words = np.zeros(n_words, dtype=np.uint64)
        for batch in batches:
            pos = [
                p
                for v in batch["v"]
                for p in _positions_py(v, m, k)
            ]
            if pos:
                arr = np.asarray(pos, dtype=np.int64)
                np.bitwise_or.at(
                    words,
                    arr >> 6,
                    np.uint64(1) << (arr & 63).astype(np.uint64),
                )
        yield pd.DataFrame({"words": [words.astype("<u8").tobytes()]})

    def or_fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        merged = np.zeros(n_words, dtype=np.uint64)
        for batch in batches:
            for raw in batch["words"]:
                merged |= np.frombuffer(raw, dtype="<u8").astype(np.uint64)
        yield pd.DataFrame({"words": [merged.astype("<u8").tobytes()]})

    folded = vals.mapInPandas(fold, schema="words binary")
    if vals.rdd.getNumPartitions() > 1:
        # >1 partials: OR them executor-side so the driver still
        # receives exactly one filter-sized row
        folded = folded.coalesce(1).mapInPandas(or_fold, schema="words binary")
    rows = folded.collect()
    if not rows:  # zero input partitions → empty filter
        return BloomFilter(m=m, k=k, words=np.zeros(n_words, dtype=np.uint64))
    merged = np.frombuffer(rows[0]["words"], dtype="<u8").astype(np.uint64)
    return BloomFilter(m=m, k=k, words=merged)


def bloom_probe(
    df: DataFrame,
    col: Column | str,
    bf: BloomFilter,
    out_col: str = "maybe_member",
    method: str = "auto",
) -> DataFrame:
    """Add boolean ``out_col``: True iff all k Bloom bits for ``col``
    are set (i.e. the value MAY be a member; False is definitive
    non-membership). NULL values probe NULL.

    Pure map either way — the probed side never joins, shuffles, or
    aggregates here; that is the whole point at 100 TB.
    """
    if method == "auto":
        method = "sql" if bf.m // 64 <= SQL_MAX_WORDS else "arrow"
    if method == "sql":
        if bf.m // 64 > SQL_MAX_WORDS:
            raise ValueError(
                f"method='sql' with {bf.m // 64} words exceeds "
                f"SQL_MAX_WORDS={SQL_MAX_WORDS}; use method='arrow'"
            )
        return _probe_sql(df, col, bf, out_col)
    if method != "arrow":
        raise ValueError(f"unknown method {method!r}; expected sql/arrow/auto")
    return _probe_arrow(df, col, bf, out_col)


def _probe_sql(
    df: DataFrame, col: Column | str, bf: BloomFilter, out_col: str
) -> DataFrame:
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    # int64 view of the uint64 words: getbit reads bit positions
    # directly, so the sign of the stored long never matters (and the
    # DuckDB replay's arithmetic (word >> b) & 1 agrees for b < 64).
    # ONE array literal (single py4j call): the per-word
    # F.array(*[F.lit(w) ...]) form cost one gateway roundtrip per
    # 64-bit word — ~2.4 s of driver time for a 26k-item filter's 3876
    # words (guide §1 measurement, round 15). Same Literal plan node.
    words = F.lit([int(w) for w in bf.words.astype("<u8").view("<i8")])
    tests = []
    for i in range(bf.k):
        pos = _position_col(s, bf.m, i)
        word = F.element_at(words, (pos / 64).cast("int") + 1)
        tests.append(F.getbit(word, pos % 64) == 1)
    hit = tests[0]
    for t in tests[1:]:
        hit = hit & t
    return df.withColumn(out_col, F.when(s.isNull(), F.lit(None)).otherwise(hit))


def _probe_arrow(
    df: DataFrame, col: Column | str, bf: BloomFilter, out_col: str
) -> DataFrame:
    c = F.col(col) if isinstance(col, str) else col
    name = "__bloom_probe_val"
    src = df.withColumn(name, c.cast("string"))
    sc = df.sparkSession.sparkContext
    wb = sc.broadcast((bf.m, bf.k, bf.to_bytes()))
    cols = src.columns

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m, k, raw = wb.value
        # plain Python ints: indexing a numpy uint64 array yields numpy
        # scalars whose per-test shift/mask cost ~2 µs each; a list of
        # ints keeps the k bit-tests in fast native-int ops (guide §4.2)
        words = np.frombuffer(raw, dtype="<u8").tolist()
        for batch in batches:
            out = []
            for v in batch[name]:
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    out.append(None)
                    continue
                ok = True
                for pos in _positions_py(v, m, k):
                    if not (words[pos >> 6] >> (pos & 63)) & 1:
                        ok = False
                        break
                out.append(ok)
            res = batch.copy()
            res[out_col] = pd.array(out, dtype="boolean")
            yield res

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in src.schema.fields
    )
    out = src.mapInPandas(probe, schema=f"{schema}, `{out_col}` boolean")
    return out.select(*[x for x in cols if x != name], out_col)


def decontaminate_bloom(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    fpp: float = 0.01,
    n_items_hint: int | None = None,
    method: str = "auto",
) -> DataFrame:
    """Exact decontamination scan with a Bloom-pruned corpus pass:
    (train_doc, eval_doc, n_shared) — bit-identical output to
    :func:`~.dedup.ngram_contamination` (the Bloom stage only PRUNES;
    no false negatives by construction, false positives are removed by
    the exact verify join).

    Stages, in 100 TB order of magnitude:

    1. eval shingles → Bloom filter (eval-set-sized build, bitset MBs);
    2. corpus shingles probe the broadcast bitset — PURE MAP, the only
       full-corpus pass, no join/shuffle/aggregation;
    3. Bloom survivors (contaminated + fpp·|corpus shingles| strays)
       equi-join the eval shingles UNHINTED — AQE picks broadcast vs
       shuffled hash from the actual survivor size (the round-6 ANN
       discipline) — then aggregate to pair counts.

    ``n_items_hint`` skips the eval-side sizing count (profile-sidecar
    posture — pass a known shingle count to make this plan-only).
    """
    from .dedup import doc_shingles

    # the eval-shingle pipeline (incl. its distinct shuffle) feeds the
    # sizing count, the bitset build, AND the verify join — persist it
    # once (eval-set-sized by this operator's whole premise) instead of
    # recomputing it three times
    eval_sh = (
        doc_shingles(eval_docs, n=n)
        .select(F.col("doc_id").alias("eval_doc"), "shingle")
        .persist()
    )
    try:
        n_items = n_items_hint if n_items_hint is not None else eval_sh.count()
        m, k = bloom_parameters(max(n_items, 1), fpp)
        bf = bloom_build(eval_sh, "shingle", m, k, n_items_hint=n_items)
    finally:
        # release before returning the lazy plan: the eager consumers
        # (sizing count + bitset build) are done, and the verify join
        # below recomputing the eval-set-sized shingles once per action
        # beats leaking cached blocks for the life of the session
        # (bench loops and build_training_set call this repeatedly)
        eval_sh.unpersist()

    train_sh = doc_shingles(train, n=n).select(
        F.col("doc_id").alias("train_doc"), "shingle"
    )
    survivors = bloom_probe(train_sh, "shingle", bf, method=method).filter(
        F.col("maybe_member")
    )
    return (
        survivors.join(eval_sh, "shingle")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count("*").alias("n_shared"))
    )
