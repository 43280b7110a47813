"""Hot-key storm witness (north_rule: skew handled explicitly).

Replays two feeds of IDENTICAL size through the full engine at the same
parallelism:

- uniform-ish: zipf_a=2.0 (the default corpus shape — mild skew), and
- storm: zipf_a=8.0 with n_keys = n_events/10, which concentrates
  ~20% of ALL events on a single url (and >40% on the top 5),

and reports per-cycle wall times, the committed skew histograms (rows
routed per partition, post-combine), and precombined_rows (rows the
adaptive push-side LWW combine collapsed before the exchange,
merge.py PRECOMBINE_DUP_THRESHOLD).  Claim under test: the storm replay
costs ~the same as the uniform replay and its routed load stays
balanced — the combine defuses the storm BEFORE any data moves, which
is strictly stronger than salting the hot key (salting spreads the hot
rows; the combine deletes them).

Output: one JSON line + BENCH/skew.json.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
N_EVENTS = int(os.environ.get("GRAFT_SKEW_EVENTS", "2000000"))
CYCLE = N_EVENTS // 4
CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
root = "/tmp/skew_storm"

import numpy as np
import ray

ray.init(address="local", num_cpus=CPUS, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
from arcane_stream_sqlserver_change_tracking_ray.gen import CtLogSpec, plan_events, write_ctlog
from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import StreamRunner
from arcane_stream_sqlserver_change_tracking_ray.state.manifest import ManifestLog, prepare_watermark

shutil.rmtree(root, ignore_errors=True)
results = {}
for name, zipf_a in (("uniform", 2.0), ("storm", 8.0)):
    spec = CtLogSpec(
        n_keys=N_EVENTS // 10, n_events=N_EVENTS, seed=42, zipf_a=zipf_a,
        events_per_file=250_000,
    )
    keys, _ = plan_events(spec)
    counts = np.bincount(keys)
    top = np.sort(counts)[::-1]
    ct, tgt = f"{root}/{name}/ct", f"{root}/{name}/tgt"
    write_ctlog(ct, spec, use_ray=True)
    prepare_watermark(tgt, 0, num_partitions=32)
    ctx = StreamContext.from_dict(
        {
            "source": {"ctlog_dir": ct, "key_columns": ["url"]},
            "sink": {"target_root": tgt, "num_partitions": 32},
            "throughput": {"rows_per_group": CYCLE},
            "maintenance": {"enabled": False},
        }
    )
    t0 = time.perf_counter()
    metrics = StreamRunner(ctx).run()
    wall = time.perf_counter() - t0
    m_last = ManifestLog(tgt).latest().metrics
    results[name] = {
        "zipf_a": zipf_a,
        "hot_key_frac": round(float(top[0]) / N_EVENTS, 4),
        "top5_frac": round(float(top[:5].sum()) / N_EVENTS, 4),
        "wall_s": round(wall, 2),
        "cycle_s": [round(m["cycle_s"], 2) for m in metrics],
        "events_per_sec": round(N_EVENTS / wall, 1),
        "last_cycle_skew": m_last.get("skew"),
        "last_cycle_precombined_rows": m_last.get("precombined_rows"),
        "last_cycle_changes_in": m_last.get("changes_in"),
    }
    print(json.dumps({name: results[name]}), flush=True)
    shutil.rmtree(f"{root}/{name}", ignore_errors=True)

doc = {
    "metric": "skew_storm_overhead",
    # storm wall / uniform wall — ~1.0 means the storm is fully defused
    "value": round(results["storm"]["wall_s"] / results["uniform"]["wall_s"], 3),
    "unit": "ratio",
    "num_cpus": CPUS,
    "events": N_EVENTS,
    **results,
}
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "skew.json"), "w") as f:
    json.dump(doc, f, indent=1)
print(json.dumps(doc))
ray.shutdown()
shutil.rmtree(root, ignore_errors=True)
