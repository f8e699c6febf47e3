"""Approximate sketches must track their exact counterparts within the
documented error bounds (HLL++ rsd default 5%; percentile_approx with
10k accuracy ≈ exact on 60k rows)."""

from __future__ import annotations

from distributed_mapreduce__spark import registry

registry.load_all()


def test_sketches_within_tolerance(spark, sf_dir):
    rows = registry.QUERIES["approx_stats"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_parts - r.exact_parts) <= max(5, 0.1 * r.exact_parts), r
        rel = abs(r.approx_median_price - r.exact_median_price) / r.exact_median_price
        assert rel <= 0.02, r
