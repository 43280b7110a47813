#!/usr/bin/env python
"""Time every queries() entry at sf0.01 — the scale the driver's
correctness gate runs at — to keep each query cheap enough that the
driver samples the whole suite (round-3 verdict item #1: 45/95 queries
had no driver-checked row in round 2 because the sampler skipped them).

Usage: python BENCH/query_times_sf001.py [sf_dir]
Writes BENCH/query_times_sf001.json sorted slowest-first.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from bench import init_ray

    init_ray(int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    import __ray_entry__ as E

    # First-pipeline warmup: Ray Data's initial execution (worker pool
    # spin-up, datasource registry, first object-store allocation) costs
    # ~2-3 s once per process and lands on whichever query runs first —
    # it is session overhead, not that query's cost.  Pay it here on a
    # trivial pipeline and record it separately.
    import ray.data

    t0 = time.perf_counter()
    ray.data.range(8).map_batches(lambda b: b).take_all()
    warmup_s = round(time.perf_counter() - t0, 3)

    out: dict[str, float] = {}
    for name, fn in E.queries().items():
        t0 = time.perf_counter()
        res = fn(sf_dir)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        out[name] = round(time.perf_counter() - t0, 3)
        print(f"{out[name]:8.3f}  {name}", flush=True)
    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]))
    doc = {
        "sf_dir": sf_dir,
        "warmup_s": warmup_s,
        "total_s": round(sum(out.values()), 1),
        "over_3s": [k for k, v in ranked.items() if v > 3.0],
        "times": ranked,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "query_times_sf001.json"), "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: doc[k] for k in ("total_s", "over_3s")}))


if __name__ == "__main__":
    main()
