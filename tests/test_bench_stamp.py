"""The bench harness's contention stamp (bench.contended_stamp): the
rule that decides whether an artifact's numbers are comparable across
rounds. Round-9 postmortem: an outside ramp to loadavg 7.96 passed the
8.0 ceiling as contended=false — the stamp must also see the direct
between-query CPU probe, which carries none of the bench's own load.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import contended_stamp  # noqa: E402


def test_idle_run_is_not_contended():
    ok, note = contended_stamp(
        load_start=0.2,
        query_loads={"q1": 1.1, "q2": 7.3},  # own-load peak, under HI
        query_busys={"q1": 0.1, "q2": 0.4},
    )
    assert not ok and note is None


def test_busy_probe_catches_sub_ceiling_ramp():
    """The r9 artifact's shape: loadavg ramps to just UNDER the own-load
    ceiling, but the between-query probe sees outside CPUs burning —
    contended, with the probe named in the note."""
    ok, note = contended_stamp(
        load_start=0.2,
        query_loads={"q1": 1.5, "q2": 7.96},  # under the 8.0 ceiling
        query_busys={"q1": 0.2, "q2": 6.0},
    )
    assert ok
    assert "outside CPUs busy" in note and "'q2'" in note


def test_loadavg_ceiling_still_fires():
    ok, note = contended_stamp(
        load_start=0.2,
        query_loads={"q1": 9.6},
        query_busys={"q1": 0.0},  # probe missed it (burst between probes)
    )
    assert ok and "ramped to 9.6" in note


def test_start_load_dominates():
    ok, note = contended_stamp(
        load_start=5.0, query_loads={}, query_busys={}
    )
    assert ok and "idle wait exhausted" in note


def test_busy_threshold_is_exclusive_below():
    ok, _ = contended_stamp(
        load_start=0.0,
        query_loads={"q": 2.0},
        query_busys={"q": 2.9},  # under the 3.0 default: fine
    )
    assert not ok
    ok2, _ = contended_stamp(
        load_start=0.0, query_loads={"q": 2.0}, query_busys={"q": 3.0}
    )
    assert ok2


# ---- round-16 contended-run guard (bench.validity_stamp) ------------


def test_validity_stamp_clean_run_has_no_invalid():
    from bench import validity_stamp

    out = validity_stamp(contended=False, attempts=1)
    assert out == {"timed_attempts": 1}
    assert "invalid" not in out


def test_validity_stamp_contended_run_is_invalid():
    from bench import validity_stamp

    out = validity_stamp(contended=True, attempts=2)
    assert out["invalid"] is True
    assert out["timed_attempts"] == 2


def test_validity_stamp_retry_that_recovered_is_valid():
    # second attempt came out clean: attempts recorded, no invalid flag
    from bench import validity_stamp

    out = validity_stamp(contended=False, attempts=2)
    assert out == {"timed_attempts": 2}
