"""The driver contract must work from a FOREIGN cwd: Ray workers inherit
the raylet's cwd (not the driver's sys.path), so every map_batches
callable, closure and actor the queries ship must be registered BY
VALUE with Ray's cloudpickle (entry/common.py) — a worker must never
need to import this repo.  Pins the r3 foreign-cwd fix across the r4
entry-package split."""

import os
import subprocess
import sys

SCRIPT = """
import sys, ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
sys.path.insert(0, "/root/repo")
import __ray_entry__ as E   # FIRST: the by-value registration lives in this import
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
q = E.queries()
# one query per entry module, each shipping closures/actors to workers
for name in ("token_count", "dedup_exact", "broadcast_join", "cdc_lww_upsert"):
    r = q[name]("/root/testdata/sf0.001")
    n = r.count() if hasattr(r, "count") and not hasattr(r, "num_rows") else r.num_rows
    assert n > 0, name
print("FOREIGN_CWD_OK")
ray.shutdown()
"""


def test_queries_run_from_foreign_cwd(tmp_path):
    env = dict(os.environ, RAY_ADDRESS="local")
    env.pop("PYTHONPATH", None)  # the repo must NOT be inherited implicitly
    r = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        cwd=str(tmp_path),  # a cwd from which the repo is not importable
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "FOREIGN_CWD_OK" in r.stdout
