"""Property tests for the hash-sketch family's driver-side mirrors —
the pure-Python functions that define cross-engine semantics (Bloom
membership, dHash packing, Hamming band selection). These run WITHOUT
Spark (fast hypothesis loops); the Spark==mirror equivalences are
pinned separately by the engine tests (test_bloom.py, test_phash.py)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from distributed_mapreduce__spark.operators.bloom import (
    BloomFilter,
    _positions_py,
    bloom_parameters,
)

keys = st.text(min_size=0, max_size=40)


@given(st.lists(keys, min_size=1, max_size=60, unique=True), st.floats(0.001, 0.3))
@settings(max_examples=60, deadline=None)
def test_bloom_never_false_negative(members, fpp):
    """Driver-side build+probe: every inserted value is ALWAYS found,
    for arbitrary unicode keys and any sizing."""
    import numpy as np

    m, k = bloom_parameters(len(members), fpp)
    words = np.zeros(m // 64, dtype=np.uint64)
    for v in members:
        for pos in _positions_py(v, m, k):
            words[pos >> 6] |= np.uint64(1 << (pos & 63))
    bf = BloomFilter(m=m, k=k, words=words)
    assert all(bf.contains(v) for v in members)


@given(st.integers(1, 10_000), st.floats(0.0001, 0.5))
@settings(max_examples=100, deadline=None)
def test_bloom_parameters_always_valid(n, p):
    m, k = bloom_parameters(n, p)
    assert m % 64 == 0 and m > 0 and k >= 1
    # more items or stricter fpp never shrink the filter
    m2, _ = bloom_parameters(n + 1, p)
    assert m2 >= m


@given(
    st.lists(st.integers(-(2**63), 2**63 - 1), min_size=2, max_size=25, unique=True),
    st.integers(0, 8),
)
@settings(max_examples=60, deadline=None)
def test_hamming_band_pigeonhole(fps, t):
    """The band decomposition used by hamming_near_pairs: any two
    64-bit fingerprints within Hamming distance t MUST agree exactly
    on at least one of the t+1 disjoint bands — the completeness
    theorem the join relies on, checked against random fingerprints."""
    bits, n_bands = 64, t + 1

    def band_keys(h):
        out = []
        for b in range(n_bands):
            lo = b * bits // n_bands
            hi = (b + 1) * bits // n_bands
            mask = (1 << (hi - lo)) - 1
            out.append(((h >> lo) & mask, b))
        return out

    for i, a in enumerate(fps):
        for b_ in fps[i + 1 :]:
            d = bin((a ^ b_) & (1 << 64) - 1).count("1")
            shares = any(
                x == y for x, y in zip(band_keys(a & (1 << 64) - 1),
                                       band_keys(b_ & (1 << 64) - 1))
            )
            if d <= t:
                assert shares, (a, b_, d, t)
