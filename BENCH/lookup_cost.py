"""Point-lookup pushdown cost at bench scale (r4 verdict stretch #7):
key→partition hash routing + per-file bloom sidecars mean a lookup
probes files ≪ files live.

Lake: 4M events replayed CoW in 8 cycles into P=64 partitions with a
bloom sidecar on the key column — 64 base files live, one per
partition (the direct-MoR layout shares physical delta files across
partitions via row-group fragments, which hides the file-level pruning
this bench demonstrates).
Lookups: 8 present + 8 missing keys, instrumented with the stats dict
resolve_partition_table fills (files_read / files_skipped).  Baseline:
the same answer via a full-table scan + filter.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

N_EVENTS = int(os.environ.get("GRAFT_LOOKUP_EVENTS", "4000000"))
SEED = 7
CACHE_ROOT = "/tmp/graft_bench"
P = 64
CYCLES = 8


def ensure_feed() -> str:
    from arcane_stream_sqlserver_change_tracking_ray.gen import CtLogSpec, write_ctlog
    from arcane_stream_sqlserver_change_tracking_ray.sources.ctlog import (
        max_available_version,
    )

    d = os.path.join(CACHE_ROOT, f"ctlog-bb-{N_EVENTS}-{SEED}")
    if max_available_version(d) == N_EVENTS:
        return d
    shutil.rmtree(d, ignore_errors=True)
    write_ctlog(
        d,
        CtLogSpec(
            n_keys=max(N_EVENTS // 10, 1000),
            n_events=N_EVENTS,
            seed=SEED,
            events_per_file=250_000,
        ),
        use_ray=True,
    )
    return d


def main():
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.compute as pc

    from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
        StreamRunner,
        lookup_keys,
        read_target_table,
    )
    from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
        ManifestLog,
        prepare_watermark,
    )

    ctlog = ensure_feed()
    target = os.path.join(CACHE_ROOT, "lookup-lake")
    shutil.rmtree(target, ignore_errors=True)
    prepare_watermark(target, 0, num_partitions=P)
    ctx = StreamContext.from_dict(
        {
            "source": {"ctlog_dir": ctlog, "key_columns": ["url"]},
            "sink": {
                "target_root": target,
                "num_partitions": P,
                "durable_writes": False,
                "merge_mode": "cow",
                "bloom_filter_columns": ["url"],
            },
            "throughput": {"rows_per_group": N_EVENTS // CYCLES},
            "maintenance": {"enabled": False},
        }
    )
    t0 = time.perf_counter()
    StreamRunner(ctx).run()
    build_s = time.perf_counter() - t0

    m = ManifestLog(target).require_watermark()
    files_live = len(m.all_files())

    n_keys = max(N_EVENTS // 10, 1000)
    present = [f"https://example.com/doc/{i}" for i in (0, 1, 7, 1000, 4242)]
    # key domain check: sample real keys from the table instead of guessing
    urls = read_target_table(target).column("url")
    step = max(1, len(urls) // 8)
    present = [str(urls[i]) for i in range(0, step * 8, step)][:8]
    missing = [f"nonexistent-key-{i}" for i in range(8)]

    out_modes = {}
    for name, keys in (("present", present), ("missing", missing), ("mixed", present[:4] + missing[:4])):
        stats: dict = {}
        t0 = time.perf_counter()
        tbl = lookup_keys(target, keys, key_col="url", stats=stats)
        wall = time.perf_counter() - t0
        out_modes[name] = {
            "keys": len(keys),
            "rows_found": tbl.num_rows,
            "files_read": stats.get("files_read", 0),
            "files_skipped_by_bloom": stats.get("files_skipped", 0),
            "lookup_s": round(wall, 3),
        }

    # baseline: full scan + filter for the same present keys
    import pyarrow as pa

    t0 = time.perf_counter()
    full = read_target_table(target)
    cnt = full.filter(pc.is_in(full["url"], value_set=pa.array(present))).num_rows
    full_scan_s = time.perf_counter() - t0

    out = {
        "events": N_EVENTS,
        "partitions": P,
        "cycles": CYCLES,
        "build_s": round(build_s, 2),
        "files_live": files_live,
        "modes": out_modes,
        "full_scan_s": round(full_scan_s, 3),
        "full_scan_rows_found": cnt,
        "probe_fraction_present": round(
            out_modes["present"]["files_read"] / files_live, 4
        ),
        "speedup_vs_full_scan": round(
            full_scan_s / max(out_modes["present"]["lookup_s"], 1e-9), 1
        ),
    }
    print(json.dumps(out))
    with open("/root/repo/BENCH/lookup_cost.json", "w") as f:
        json.dump(out, f, indent=1)
    shutil.rmtree(target, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
