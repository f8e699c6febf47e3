"""CLI parity tests (reference main.go:17-44, master/master.go:258-311).

``master <files...>`` must produce the reference's artifacts — ``mr-out``
partition files of ``word count`` lines and ``mr-final.txt`` of
``word: count`` top-k lines, count desc / word asc — and ``worker <addr>``
must attach to a running master's dashboard endpoint.
"""

from __future__ import annotations

import io
import os
import urllib.request

from distributed_mapreduce__spark.cli import run_master, run_worker
from distributed_mapreduce__spark.runtime.progress import serve_dashboard

# Mirrors the reference's bundled sample corpus shape (input1.txt /
# input2.txt: short plain-text lines with repeated words).
FILE1 = "the quick brown fox jumps over the lazy dog\nthe dog barks\n"
FILE2 = "quick quick fox and the hound\n"
# Counts: the=4 quick=3 dog=2 fox=2 and/barks/brown/hound/jumps/lazy/over=1


def _write_inputs(tmp_path):
    p1, p2 = tmp_path / "input1.txt", tmp_path / "input2.txt"
    p1.write_text(FILE1)
    p2.write_text(FILE2)
    return str(p1), str(p2)


def test_master_writes_reference_artifacts(spark, tmp_path, capsys):
    inputs = _write_inputs(tmp_path)
    out = tmp_path / "out"
    out.mkdir()
    top = run_master(
        inputs, out_dir=str(out), dashboard_port=None, spark=spark
    )

    assert top[:4] == [("the", 4), ("quick", 3), ("dog", 2), ("fox", 2)]
    assert len(top) == 5 and top[4][1] == 1  # k=5 default, tie broken by word

    final = (out / "mr-final.txt").read_text().splitlines()
    assert final == [f"{w}: {c}" for w, c in top]

    # mr-out: nReduce=2 partition files whose union is the full counts.
    parts = sorted(
        f for f in os.listdir(out / "mr-out") if f.startswith("part-")
    )
    assert len(parts) == 2
    merged = {}
    for f in parts:
        for line in (out / "mr-out" / f).read_text().splitlines():
            word, cnt = line.rsplit(" ", 1)
            merged[word] = merged.get(word, 0) + int(cnt)
    assert merged["the"] == 4 and merged["quick"] == 3 and len(merged) == 11

    assert "Top 1: the: 4" in capsys.readouterr().out


def test_worker_attaches_to_master_dashboard(spark):
    with serve_dashboard(spark, port=0) as port:
        buf = io.StringIO()
        rc = run_worker(f"127.0.0.1:{port}", max_polls=2, out=buf)
    assert rc == 0
    lines = buf.getvalue().splitlines()
    assert len(lines) == 2 and all(line.startswith("progress") for line in lines)


def test_worker_tails_live_master_job(spark, tmp_path):
    """End-to-end master+worker concurrency: the worker attaches while
    the master's job is actually running (reference operation: workers
    poll the master for tasks while the job executes) and both finish
    cleanly — master with artifacts, worker with progress lines."""
    import queue
    import threading

    inputs = _write_inputs(tmp_path)
    out = tmp_path / "out"
    out.mkdir()
    port_q: queue.Queue = queue.Queue()
    result: dict = {}

    def _master():
        result["top"] = run_master(
            inputs,
            out_dir=str(out),
            dashboard_port=0,
            spark=spark,
            port_callback=port_q.put,
        )

    t = threading.Thread(target=_master)
    t.start()
    try:
        port = port_q.get(timeout=60)
        buf = io.StringIO()
        rc = run_worker(
            f"127.0.0.1:{port}", max_polls=3, poll_interval=0.2, out=buf
        )
    finally:
        t.join(timeout=120)
    assert not t.is_alive()
    assert rc == 0
    lines = buf.getvalue().splitlines()
    # The master may finish between polls — "master gone; exiting" is a
    # normal tail; at least one live progress line must have landed.
    assert lines and lines[0].startswith("progress")
    assert result["top"][0] == ("the", 4)
    assert (out / "mr-final.txt").exists()


def test_worker_unreachable_master_fails_fast():
    buf = io.StringIO()
    rc = run_worker("127.0.0.1:1", max_polls=1, out=buf)
    assert rc == 1
    assert "cannot reach" in buf.getvalue()


def test_dashboard_serves_html_page(spark):
    with serve_dashboard(spark, port=0) as port:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=10) as r:
            ctype = r.headers["Content-Type"]
            body = r.read().decode()
    assert ctype.startswith("text/html")
    assert "/data" in body and "progress_pct" in body
