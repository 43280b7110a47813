#!/usr/bin/env python
"""Write-amplification bench: merge-on-read vs copy-on-write.

The round-1 verdict's scale-killer: partition-granularity CoW rewrites
~the whole table every cycle once hash routing touches every partition,
so cycle wall-time grows linearly with the accumulated TABLE size even
at a fixed CYCLE size.  Merge-on-read writes cycle-sized delta files, so
cycle time stays ~flat as the table grows.

Protocol: replay the same 10-cycle feed (fixed cycle size, mostly-new
keys so the table grows every cycle) under merge_mode=cow and =mor;
report per-cycle wall seconds and bytes written.  Run:

    python BENCH/mor_amplification.py            # writes BENCH/mor_amplification.json

Env: RAY_GRAFT_CPUS (default 16), GRAFT_AMP_EVENTS (default 5_000_000).
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
N_EVENTS = int(os.environ.get("GRAFT_AMP_EVENTS", "5000000"))
CYCLES = 10
CACHE_ROOT = os.environ.get("GRAFT_BENCH_CACHE", "/tmp/graft_bench")


def ensure_feed() -> str:
    """A feed whose keys are ~all distinct (n_keys == n_events, zipf off)
    so the target GROWS by a full cycle every cycle — the worst case for
    copy-on-write amplification."""
    from arcane_stream_sqlserver_change_tracking_ray.gen import CtLogSpec, write_ctlog
    from arcane_stream_sqlserver_change_tracking_ray.sources.ctlog import (
        max_available_version,
    )

    d = os.path.join(CACHE_ROOT, f"ampfeed-{N_EVENTS}")
    if max_available_version(d) == N_EVENTS:
        return d
    shutil.rmtree(d, ignore_errors=True)
    write_ctlog(
        d,
        CtLogSpec(
            n_keys=N_EVENTS,  # ~every event a new key: table grows per cycle
            n_events=N_EVENTS,
            zipf_a=1.0,
            events_per_file=N_EVENTS // CYCLES,
        ),
        use_ray=True,
    )
    return d


def run_mode(mode: str, feed: str) -> dict:
    from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import StreamRunner
    from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
        prepare_watermark,
    )

    tgt = tempfile.mkdtemp(prefix=f"amp_{mode}_", dir=CACHE_ROOT)
    try:
        prepare_watermark(tgt, 0, num_partitions=32)
        ctx = StreamContext.from_dict(
            {
                "source": {"ctlog_dir": feed, "key_columns": ["url"]},
                "sink": {
                    "target_root": tgt,
                    "num_partitions": 32,
                    "merge_mode": mode,
                    "durable_writes": False,
                },
                "throughput": {"rows_per_group": N_EVENTS // CYCLES},
                "maintenance": {"enabled": False},
            }
        )
        metrics = StreamRunner(ctx).run()
        return {
            "cycle_s": [round(m["cycle_s"], 2) for m in metrics],
            "bytes_written": [m["bytes"] for m in metrics],
            "rows_per_cycle": N_EVENTS // CYCLES,
        }
    finally:
        shutil.rmtree(tgt, ignore_errors=True)


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

    feed = ensure_feed()
    out = {"events": N_EVENTS, "cycles": CYCLES, "num_cpus": NUM_CPUS}
    for mode in ("cow", "mor"):
        t0 = time.perf_counter()
        out[mode] = run_mode(mode, feed)
        out[mode]["total_s"] = round(time.perf_counter() - t0, 2)
    ray.shutdown()

    # flatness metric: last-3-cycle mean over first-3-cycle mean (cycle 1
    # excluded: first-touch warmup) — ~1.0 means cycle cost does NOT grow
    # with table size
    def growth(mode):
        c = out[mode]["cycle_s"][1:]
        head = sum(c[:3]) / 3
        tail = sum(c[-3:]) / 3
        return round(tail / head, 2) if head else None

    out["cycle_time_growth"] = {m: growth(m) for m in ("cow", "mor")}
    out["bytes_amplification_last_cycle"] = {
        m: round(
            out[m]["bytes_written"][-1] / max(out[m]["bytes_written"][0], 1), 2
        )
        for m in ("cow", "mor")
    }
    path = os.path.join(REPO, "BENCH", "mor_amplification.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
