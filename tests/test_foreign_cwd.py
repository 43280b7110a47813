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


SHADOW_SCRIPT = """
import sys
sys.path.insert(0, ".")
import entry                       # the FOREIGN entry.py in cwd
assert not hasattr(entry, "common")
import importlib.util
spec = importlib.util.spec_from_file_location(
    "__ray_entry__", "/root/repo/__ray_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)       # facade must evict the shadow and load OURS
assert len(mod.queries()) > 90 and len(mod.oracle_sql()) > 90
print("SHADOW_OK")
"""


def test_facade_survives_foreign_entry_module(tmp_path):
    """'entry' is a generic module name: a driver whose cwd holds an
    entry.py (or that imported a PyPI 'entry') must still load the
    facade — it evicts the foreign sys.modules slot."""
    (tmp_path / "entry.py").write_text("THIS_IS_NOT_OURS = True\n")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [sys.executable, "-c", SHADOW_SCRIPT],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "SHADOW_OK" in r.stdout


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
