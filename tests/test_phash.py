"""Perceptual-hash image dedup: dHash replayed by an independent
pure-Python oracle, planted near-duplicates found exactly at their true
Hamming distance, and the banded Hamming join proven EQUAL to the
brute-force all-pairs answer (pigeonhole completeness), never planned
as a cartesian product."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_mapreduce__spark.operators.dedup import hamming_near_pairs
from distributed_mapreduce__spark.operators.multimodal import (
    _dhash_bits,
    _fake_decode,
    phash_media,
    phash_near_dups,
    synthesize_media,
)

SF = "/root/testdata/sf0.001"


def _ref_dhash(grid: np.ndarray) -> int:
    """Independent textbook dHash: same spec, written separately —
    float block means would drift, so it uses exact integer sums too,
    but derives the block slicing arithmetic its own way."""
    h, w = grid.shape
    g = grid.astype(np.int64)
    blocks = np.zeros((8, 9), dtype=np.int64)
    for i in range(8):
        for j in range(9):
            r0, r1 = (i * h) // 8, ((i + 1) * h) // 8
            c0, c1 = (j * w) // 9, ((j + 1) * w) // 9
            r1, c1 = max(r1, r0 + 1), max(c1, c0 + 1)
            blocks[i, j] = int(g[r0:r1, c0:c1].sum()) // ((r1 - r0) * (c1 - c0))
    ph = 0
    for i in range(8):
        for j in range(8):
            ph = (ph << 1) | (1 if blocks[i, j] < blocks[i, j + 1] else 0)
    return ph - (1 << 64) if ph >= 1 << 63 else ph


def test_phash_matches_pure_python_oracle(spark):
    media = synthesize_media(spark, SF).filter(F.col("kind") == "image")
    got = {r.media_id: r.phash for r in phash_media(media).collect()}
    src = media.select("media_id", "payload", "meta.width", "meta.height").collect()
    assert len(got) == len(src) > 0
    for r in src:
        grid = _fake_decode(bytes(r.payload), r.width, r.height)
        assert got[r.media_id] == _ref_dhash(grid), r.media_id


def _image_row(mid: int, pixels: np.ndarray):
    h, w = pixels.shape
    return {
        "media_id": mid,
        "kind": "image",
        "payload": pixels.astype(np.uint8).tobytes(),
        "meta": {
            "width": w,
            "height": h,
            "sample_rate": 0,
            "n_frames": 1,
            "format": "fake/raw",
        },
    }


@pytest.fixture(scope="module")
def planted(spark):
    """20 random 32x36 images + 3 perturbed copies of image 0 at
    increasing corruption."""
    rng = np.random.default_rng(7)
    base = [rng.integers(0, 256, size=(36, 32)) for _ in range(20)]
    rows = [_image_row(i, px) for i, px in enumerate(base)]
    for j, noise in enumerate((2, 8, 20)):
        px = base[0].copy()
        # perturb a few pixels slightly — gradients mostly keep sign
        idx = rng.integers(0, px.size, size=noise)
        px.ravel()[idx] = np.clip(px.ravel()[idx] + 3, 0, 255)
        rows.append(_image_row(100 + j, px))
    from distributed_mapreduce__spark.operators.multimodal import MEDIA_SCHEMA
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
    return df.cache()


def test_planted_near_dups_found(planted):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_dups(planted, max_hamming=10).collect()
    }
    # every perturbed copy pairs with its source within the budget
    for j in range(3):
        assert (0, 100 + j) in pairs, (j, sorted(pairs))
    # distances replay exactly from driver-side hashes
    hashes = {r.media_id: r.phash for r in phash_media(planted).collect()}
    for (a, b), d in pairs.items():
        assert d == bin((hashes[a] ^ hashes[b]) & (1 << 64) - 1).count("1")


def test_banded_join_equals_brute_force(planted):
    """Pigeonhole completeness: the banded candidate join followed by
    the exact verify must equal the all-pairs answer EXACTLY."""
    hashes = {r.media_id: r.phash for r in phash_media(planted).collect()}
    for t in (2, 6, 13):
        want = set()
        ids = sorted(hashes)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                d = bin((hashes[a] ^ hashes[b]) & (1 << 64) - 1).count("1")
                if d <= t:
                    want.add((a, b, d))
        got = {
            (r.id_a, r.id_b, r.hamming)
            for r in phash_near_dups(planted, max_hamming=t).collect()
        }
        assert got == want, (t, got ^ want)


def test_hamming_pairs_on_16_bit_fingerprints(spark):
    """Generic over narrow fingerprints (the simhash16 width)."""
    rows = [(i, i % 7 * 3) for i in range(40)]  # many exact collisions
    df = spark.createDataFrame(rows, "doc_id long, fp long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_near_pairs(df, bits=16, max_hamming=1).collect()
    }
    want = set()
    for i, a in rows:
        for j, b in rows:
            if i < j and bin(a ^ b).count("1") <= 1:
                want.add((i, j, bin(a ^ b).count("1")))
    assert got == want


def test_never_a_cartesian_plan(planted):
    plan = (
        phash_near_dups(planted, max_hamming=6)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_bad_band_count_raises(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id long, fp long")
    with pytest.raises(ValueError):
        hamming_near_pairs(df, bits=16, max_hamming=16)


def test_full_width_band_exact_duplicates(spark):
    """max_hamming=0 at bits=64 makes a single band span all 64 bits;
    the (1<<64)-1 mask literal used to overflow LongType at plan build.
    The band key is just the fingerprint — exact-duplicate pairing must
    work, including negative (sign-bit-bearing) fingerprints."""
    rows = [
        (1, 7),
        (2, 7),
        (3, -(1 << 62)),
        (4, -(1 << 62)),
        (5, 9),
    ]
    df = spark.createDataFrame(rows, "doc_id long, fp long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_near_pairs(df, bits=64, max_hamming=0).collect()
    }
    assert got == {(1, 2, 0), (3, 4, 0)}
