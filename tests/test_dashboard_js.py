"""Execute the dashboard page's ACTUAL JavaScript (node + a minimal DOM
stub) against a real progress snapshot — catches JS syntax errors and
payload-contract drift that string-matching the HTML cannot."""

from __future__ import annotations

import json
import re
import shutil
import subprocess

import pytest

from distributed_mapreduce__spark.runtime.progress import (
    DASHBOARD_HTML,
    progress_snapshot,
)

NODE = shutil.which("node")

HARNESS = """
const payload = JSON.parse(process.env.SNAPSHOT_JSON);
const els = {};
function el(id) {
  if (!els[id]) els[id] = { style: {}, textContent: '', innerHTML: '' };
  return els[id];
}
global.document = { getElementById: el };
global.fetch = () => Promise.resolve({ ok: true, json: () => Promise.resolve(payload) });
global.setInterval = () => {};   // harness drives one refresh() only
%s
setTimeout(() => {
  console.log(JSON.stringify({
    pct: el('pct').textContent,
    bar: el('bar').style.width,
    stages: el('stages').innerHTML,
    app: el('app').innerHTML,
  }));
}, 100);
"""


@pytest.mark.skipif(NODE is None, reason="node not installed")
def test_dashboard_js_renders_snapshot(spark):
    m = re.search(r"<script>(.*?)</script>", DASHBOARD_HTML, re.S)
    assert m, "dashboard page lost its script tag"
    snap = progress_snapshot(spark)
    snap["active_stages"] = [
        {
            "stage_id": 7,
            "name": "Exchange hashpartitioning",
            "num_tasks": 8,
            "num_active_tasks": 2,
            "num_completed_tasks": 5,
            "num_failed_tasks": 0,
        }
    ]
    snap["progress_pct"] = 62.5
    import os

    proc = subprocess.run(
        [NODE, "-e", HARNESS % m.group(1)],
        capture_output=True,
        text=True,
        timeout=30,
        env={**os.environ, "SNAPSHOT_JSON": json.dumps(snap)},
    )
    assert proc.returncode == 0, proc.stderr
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["pct"] == "62.5%"
    assert out["bar"] == "62.5%"
    assert "Exchange hashpartitioning" in out["stages"] and "<td>7</td>" in out["stages"]
    assert snap["app_id"] in out["app"]
