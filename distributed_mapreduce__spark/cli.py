"""Command-line entry with reference parity (main.go:17-44).

The reference ships one binary with two modes::

    prog master <input_file1> [input_file2 ...]   # run the job
    prog worker <master_addr>                     # join as a worker

Spark-first reinterpretation:

- ``master`` runs the reference's end-to-end job (word count → top-k,
  nReduce=2 / k=5 defaults, main.go:20-21) on a SparkSession, writes the
  reference's artifacts — per-reduce-partition ``mr-out`` text files
  (mapreduce/mapreduce.go:108-123) and a single ``mr-final.txt`` of
  ``word: count`` lines (master/master.go:300-311) — prints the same
  ``Top N: word: count`` lines, and serves the dashboard (``/`` +
  ``/data``) while the job runs.
- ``worker`` exists in the reference to *execute* tasks
  (worker/worker.go); under Spark, task execution belongs to executors
  managed by the cluster manager, so a separate user-run worker process
  has nothing to execute. The subcommand is kept as the reference's
  operational companion: it attaches to a running master's dashboard
  address and tails job progress from ``/data`` (the same endpoint the
  reference's web UI polls), exiting when the master goes away.

Run as ``python -m distributed_mapreduce__spark <mode> ...``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.error
import urllib.request
from collections.abc import Sequence

#: Reference job defaults: nReduce=2, k=5 (main.go:20-21).
DEFAULT_N_REDUCE = 2
DEFAULT_TOP_K = 5


def run_master(
    input_files: Sequence[str],
    *,
    n_reduce: int = DEFAULT_N_REDUCE,
    top_k: int = DEFAULT_TOP_K,
    out_dir: str = ".",
    dashboard_port: int | None = 8080,
    spark=None,
    port_callback=None,
) -> list[tuple[str, int]]:
    """Run the reference job end-to-end; return the top-k (word, count).

    Artifacts land in ``out_dir``: ``mr-out/`` (text files of
    ``word count`` lines, one per reduce partition — the reference's
    ``mr-out-<r>``) and ``mr-final.txt`` (``word: count``, count desc /
    word asc, top-k — the reference's merged output, which it also
    builds driver-side from the k-row result, master/master.go:258-311).
    """
    from pyspark.sql import functions as F

    from .operators.wordcount import top_k_from_counts, word_counts
    from .runtime.progress import serve_dashboard
    from .session import build_session
    from .sources.text import read_text_corpus

    if spark is None:
        spark = build_session(app_name="distributed_mapreduce__spark-master")

    def _run() -> list[tuple[str, int]]:
        corpus = read_text_corpus(spark, list(input_files))
        counts = word_counts(corpus).cache()

        # mr-out shape parity: one text file per reduce partition,
        # hash-partitioned by word into n_reduce files. Partition
        # ASSIGNMENT is Spark Murmur3, intentionally not the
        # reference's FNV-1a (mapreduce/mapreduce.go ihash) — see
        # functions/hashing.py for the no-FNV-parity policy — so
        # per-file contents differ from the reference's mr-out-<r>
        # while the file count and union of rows match.
        (
            counts.repartition(n_reduce, "word")
            .select(F.format_string("%s %d", "word", "cnt").alias("value"))
            .write.mode("overwrite")
            .text(os.path.join(out_dir, "mr-out"))
        )

        top = [
            (r.word, r.cnt) for r in top_k_from_counts(counts, k=top_k).collect()
        ]
        counts.unpersist()
        return top

    if dashboard_port is not None:
        with serve_dashboard(spark, port=dashboard_port) as port:
            print(f"Dashboard: http://127.0.0.1:{port}/")
            if port_callback is not None:
                # Lets a supervisor (or test) learn the bound port when
                # an ephemeral port=0 was requested.
                port_callback(port)
            top = _run()
    else:
        top = _run()

    # k rows — driver-side file write mirrors the reference's own
    # driver-side mergeOutputs (master/master.go:258-311).
    final = os.path.join(out_dir, "mr-final.txt")
    with open(final, "w", encoding="utf-8") as fh:
        for i, (word, cnt) in enumerate(top, start=1):
            fh.write(f"{word}: {cnt}\n")
            print(f"Top {i}: {word}: {cnt}")
    print("Distributed MapReduce completed. Check mr-final.txt for top words.")
    return top


def run_worker(
    master_addr: str,
    *,
    poll_interval: float = 1.0,
    max_polls: int | None = None,
    out=sys.stdout,
) -> int:
    """Attach to a master's dashboard and tail progress from ``/data``.

    Returns 0 if the master was reached at least once (it finishing and
    going away is a normal exit, like a reference worker whose RPC calls
    start failing after job completion, worker/worker.go run loop), 1 if
    it was never reachable.
    """
    if "://" not in master_addr:
        master_addr = "http://" + master_addr
    url = master_addr.rstrip("/") + "/data"
    seen = 0
    while max_polls is None or seen < max_polls:
        try:
            with urllib.request.urlopen(url, timeout=5) as resp:
                snap = json.loads(resp.read())
        except (urllib.error.URLError, OSError, ValueError):
            if seen:
                print("master gone; exiting", file=out)
                return 0
            print(f"worker: cannot reach master at {url}", file=out)
            return 1
        seen += 1
        print(
            f"progress {snap['progress_pct']:.1f}% "
            f"jobs={len(snap['active_jobs'])} "
            f"stages={len(snap['active_stages'])}",
            file=out,
        )
        if max_polls is None or seen < max_polls:
            time.sleep(poll_interval)
    return 0


def main(argv: Sequence[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="distributed_mapreduce__spark",
        description="Word-count MapReduce engine on Spark (reference CLI parity).",
    )
    sub = parser.add_subparsers(dest="mode", required=True)

    m = sub.add_parser("master", help="run the word-count job on input files")
    m.add_argument("input_files", nargs="+")
    m.add_argument("--n-reduce", type=int, default=DEFAULT_N_REDUCE)
    m.add_argument("--top-k", type=int, default=DEFAULT_TOP_K)
    m.add_argument("--out-dir", default=".")
    m.add_argument("--dashboard-port", type=int, default=8080)
    m.add_argument("--no-dashboard", action="store_true")

    w = sub.add_parser("worker", help="attach to a running master's dashboard")
    w.add_argument("master_addr")
    w.add_argument("--max-polls", type=int, default=None)

    args = parser.parse_args(argv)
    if args.mode == "master":
        run_master(
            args.input_files,
            n_reduce=args.n_reduce,
            top_k=args.top_k,
            out_dir=args.out_dir,
            dashboard_port=None if args.no_dashboard else args.dashboard_port,
        )
        return 0
    return run_worker(args.master_addr, max_polls=args.max_polls)
