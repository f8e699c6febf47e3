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

#: Self-contained dashboard page (reference web/index.html:1-47 +
#: web/script.js:27-82: progress bar + tables polling ``/data`` at 1 Hz).
#: The reference pulls Tailwind and Chart.js from CDNs; this page is
#: dependency-free (inline CSS bar, vanilla JS) so it renders offline.
DASHBOARD_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>Spark Job Dashboard</title>
<style>
 body { font-family: sans-serif; background: #f3f4f6; margin: 2rem; }
 .wrap { max-width: 56rem; margin: 0 auto; }
 h1 { font-size: 1.6rem; } h2 { font-size: 1.1rem; margin-top: 1.5rem; }
 table { width: 100%; border-collapse: collapse; background: #fff; }
 th, td { text-align: left; padding: .4rem .6rem; border-bottom: 1px solid #e5e7eb; }
 thead tr { background: #e5e7eb; }
 .bar { background: #e5e7eb; border-radius: 4px; height: 1.2rem; }
 .bar > div { background: #4caf50; height: 100%; border-radius: 4px; width: 0; }
</style>
</head>
<body>
<div class="wrap">
 <h1>Spark Job Dashboard</h1>
 <h2>Job Progress</h2>
 <div class="bar"><div id="bar"></div></div>
 <p id="pct">0%</p>
 <h2>Active Stages</h2>
 <table><thead><tr><th>Stage</th><th>Name</th><th>Tasks</th>
  <th>Active</th><th>Done</th><th>Failed</th></tr></thead>
  <tbody id="stages"></tbody></table>
 <h2>Application</h2>
 <table><tbody id="app"></tbody></table>
</div>
<script>
function refresh() {
  fetch('/data?t=' + Date.now())
    .then(function (r) { if (!r.ok) throw new Error(r.status); return r.json(); })
    .then(function (d) {
      var pct = d.progress_pct.toFixed(1);
      document.getElementById('bar').style.width = pct + '%';
      document.getElementById('pct').textContent = pct + '%';
      var rows = d.active_stages.map(function (s) {
        return '<tr><td>' + s.stage_id + '</td><td>' + s.name +
          '</td><td>' + s.num_tasks + '</td><td>' + s.num_active_tasks +
          '</td><td>' + s.num_completed_tasks + '</td><td>' +
          s.num_failed_tasks + '</td></tr>';
      });
      document.getElementById('stages').innerHTML = rows.join('');
      document.getElementById('app').innerHTML =
        '<tr><td>app_id</td><td>' + d.app_id + '</td></tr>' +
        '<tr><td>active jobs</td><td>' + d.active_jobs.join(', ') + '</td></tr>' +
        '<tr><td>parallelism</td><td>' + d.default_parallelism + '</td></tr>';
    })
    .catch(function (e) { console.error('dashboard poll failed', e); });
}
setInterval(refresh, 1000);
refresh();
</script>
</body>
</html>
"""


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
    out = {
        "app_id": sc.applicationId,
        "active_jobs": list(active_jobs),
        "active_stages": stages,
        "progress_pct": (100.0 * done / total) if total else 100.0,
        "default_parallelism": sc.defaultParallelism,
    }
    from ..streaming.table_stream import PIPES_STATUS

    if PIPES_STATUS:
        # the multi-pipe scheduler's live row (streaming/table_stream
        # run_pipes): name -> status/ticks/versions/failures
        out["pipes"] = {
            name: {
                k: st[k]
                for k in ("status", "ticks", "versions", "failures",
                          "last_error")
            }
            for name, st in PIPES_STATUS.items()
        }
    return out


@contextmanager
def serve_dashboard(spark: SparkSession, port: int = 8080):
    """Serve the dashboard page at ``GET /`` and ``progress_snapshot``
    as JSON at ``GET /data`` — the reference dashboard's polling
    contract (web/script.js:28 fetches '/data?t=...' every second;
    master/master.go:247-255 mounts the static page on :8080). Runs on
    a daemon thread; yields the bound port (0 → ephemeral)."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path.startswith("/data"):
                body = json.dumps(progress_snapshot(spark)).encode()
                ctype = "application/json"
            elif self.path in ("/", "/index.html"):
                body = DASHBOARD_HTML.encode()
                ctype = "text/html; charset=utf-8"
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
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
