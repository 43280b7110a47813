#!/usr/bin/env python
"""Change-data-feed read cost: proportional to CHANGES, not table size.

The scale claim behind ``read_change_feed``: a one-cycle feed read
touches only that cycle's delta files plus a bloom-assisted point probe
of the FROM snapshot for the touched keys — so its wall-time stays
~flat as the accumulated TABLE grows, while a naive snapshot-diff
(resolve both full snapshots and anti-join) grows linearly.

Protocol: replay a growing feed (all-new keys per cycle, fixed cycle
size) for N cycles; after every cycle, time (a) ``read_change_feed``
over just that last cycle and (b) the brute-force snapshot diff of the
same two versions.  Run:

    python BENCH/change_feed_cost.py   # writes BENCH/change_feed_cost.json

Env: RAY_GRAFT_CPUS (default 16), GRAFT_CDF_EVENTS (default 2_000_000).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "16"))
N_EVENTS = int(os.environ.get("GRAFT_CDF_EVENTS", "2000000"))
CYCLES = 10
CACHE_ROOT = os.environ.get("GRAFT_BENCH_CACHE", "/tmp/graft_bench")


def ensure_feed() -> str:
    from arcane_stream_sqlserver_change_tracking_ray.gen import CtLogSpec, write_ctlog
    from arcane_stream_sqlserver_change_tracking_ray.sources.ctlog import (
        max_available_version,
    )

    d = os.path.join(CACHE_ROOT, f"cdffeed-{N_EVENTS}")
    if max_available_version(d) == N_EVENTS:
        return d
    shutil.rmtree(d, ignore_errors=True)
    write_ctlog(
        d,
        CtLogSpec(
            n_keys=N_EVENTS,  # all-new keys: the table grows a full cycle per cycle
            n_events=N_EVENTS,
            zipf_a=1.0,
            events_per_file=N_EVENTS // CYCLES,
        ),
        use_ray=True,
    )
    return d


def snapshot_diff_rows(tgt: str, v_from: int, v_to: int) -> int:
    """Brute-force baseline: resolve BOTH full snapshots, diff by key."""
    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
        read_target_table,
    )

    def kv(version):
        t = read_target_table(tgt, drop_meta=False, version=version)
        if "url" not in t.column_names:  # v0: prepared manifest, no data
            return {}
        return dict(zip(t["url"].to_pylist(), t["sys_change_version"].to_pylist()))

    ka = kv(v_from)
    b = read_target_table(tgt, drop_meta=False, version=v_to)
    bk = b["url"].to_pylist()
    n = sum(
        1 for k, v in zip(bk, b["sys_change_version"].to_pylist()) if ka.get(k) != v
    )
    bset = set(bk)
    n += sum(1 for k in ka if k not in bset)
    return n


def main() -> None:
    import ray

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    dc = DataContext.get_current()
    dc.enable_progress_bars = False
    dc.min_parallelism = NUM_CPUS
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
        StreamRunner,
        read_change_feed_table,
    )
    from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
        ManifestLog,
        prepare_watermark,
    )

    feed = ensure_feed()
    os.makedirs(CACHE_ROOT, exist_ok=True)
    tgt = tempfile.mkdtemp(prefix="cdf_cost_", dir=CACHE_ROOT)
    out = {
        "events": N_EVENTS,
        "cycles": CYCLES,
        "num_cpus": NUM_CPUS,
        "rows_per_cycle": N_EVENTS // CYCLES,
        "per_cycle": [],
    }
    try:
        prepare_watermark(tgt, 0, num_partitions=32)
        ctx = StreamContext.from_dict(
            {
                "source": {"ctlog_dir": feed, "key_columns": ["url"]},
                "sink": {
                    "target_root": tgt,
                    "num_partitions": 32,
                    "durable_writes": False,
                    "bloomFilterColumns": ["arcane_merge_key"],
                },
                "throughput": {"rows_per_group": N_EVENTS // CYCLES},
                # steady-state config: OPTIMIZE folds delta chains every
                # few cycles, bounding the per-pid file count the FROM
                # probe must bloom-check (exactly what production runs do)
                "maintenance": {"batchThreshold": 3},
            }
        )
        log = ManifestLog(tgt)
        for cyc in range(CYCLES):
            v_from = log.versions()[-1]  # before this cycle (maintenance
            # may commit extra manifests; the range is whatever the cycle
            # appended, which is exactly the one-cycle feed)
            StreamRunner(ctx).run(max_cycles=1)
            v_to = log.versions()[-1]
            t0 = time.perf_counter()
            feed_rows = read_change_feed_table(tgt, v_from, v_to).num_rows
            feed_s = time.perf_counter() - t0
            rec = {
                "cycle": cyc + 1,
                "table_rows": (cyc + 1) * (N_EVENTS // CYCLES),
                "feed_rows": feed_rows,
                "change_feed_s": round(feed_s, 3),
            }
            # the brute-force diff gets expensive fast; sample it on the
            # first, middle and last cycles only
            if cyc in (0, CYCLES // 2, CYCLES - 1):
                t0 = time.perf_counter()
                diff_rows = snapshot_diff_rows(tgt, v_from, v_to)
                rec["snapshot_diff_s"] = round(time.perf_counter() - t0, 3)
                rec["snapshot_diff_rows"] = diff_rows
            out["per_cycle"].append(rec)
            print(rec, flush=True)
    finally:
        shutil.rmtree(tgt, ignore_errors=True)
        ray.shutdown()

    c = [r["change_feed_s"] for r in out["per_cycle"][1:]]
    out["feed_time_growth_last3_over_first3"] = (
        round(sum(c[-3:]) / sum(c[:3]), 2) if len(c) >= 6 else None
    )
    diffs = [r for r in out["per_cycle"] if "snapshot_diff_s" in r]
    if len(diffs) >= 2:
        out["snapshot_diff_growth"] = round(
            diffs[-1]["snapshot_diff_s"] / max(diffs[0]["snapshot_diff_s"], 1e-9), 2
        )
    path = os.path.join(REPO, "BENCH", "change_feed_cost.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
