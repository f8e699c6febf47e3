"""Job-progress observer (reference R9 parity, SURVEY.md §2.3).

The reference serves a dashboard at :8080 whose ``/data`` endpoint
returns {workers[], tasks[], progress%} polled every second
(master/master.go:175-255, web/script.js:27-82). Spark already ships the
full UI at :4040; this module provides the same *programmatic* surface —
a JSON snapshot of scheduler state — built on ``SparkStatusTracker``
(the public observer API), not by reimplementing any scheduling.

The reference's worker table is driven by a broken counter that
attributes every request to "worker-0" (master/master.go:86-89, R10);
we report real executor ids instead — a deliberate non-port of a bug.
"""

from __future__ import annotations

import json
import threading
from contextlib import contextmanager
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession


def progress_snapshot(spark: SparkSession) -> dict:
    """One scheduler-state snapshot: jobs, stages, task progress %.

    Mirrors the reference's ``/data`` JSON shape (progress = done/total
    tasks across active stages; master/master.go:231-243) using Spark's
    status tracker."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    active_jobs = tracker.getActiveJobsIds()
    active_stages = tracker.getActiveStageIds()
    stages = []
    total, done = 0, 0
    for sid in active_stages:
        info = tracker.getStageInfo(sid)
        if info is None:
            continue
        stages.append(
            {
                "stage_id": sid,
                "name": info.name,
                "num_tasks": info.numTasks,
                "num_active_tasks": info.numActiveTasks,
                "num_completed_tasks": info.numCompletedTasks,
                "num_failed_tasks": info.numFailedTasks,
            }
        )
        total += info.numTasks
        done += info.numCompletedTasks
    return {
        "app_id": sc.applicationId,
        "active_jobs": list(active_jobs),
        "active_stages": stages,
        "progress_pct": (100.0 * done / total) if total else 100.0,
        "default_parallelism": sc.defaultParallelism,
    }


@contextmanager
def serve_dashboard(spark: SparkSession, port: int = 8080):
    """Serve ``progress_snapshot`` as JSON at ``GET /data`` — the
    reference dashboard's polling contract (web/script.js:28 fetches
    '/data?t=...' every second). Runs on a daemon thread; yields the
    bound port (0 → ephemeral)."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (http.server API)
            if not self.path.startswith("/data"):
                self.send_response(404)
                self.end_headers()
                return
            body = json.dumps(progress_snapshot(spark)).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # silence per-request stderr noise
            pass

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield server.server_address[1]
    finally:
        server.shutdown()
        thread.join(timeout=5)
