"""G3 bounded source buffering — the hard end-to-end signal (r4 verdict
#6): replay an OVERSIZED single poll (rows_per_group = the whole feed)
with `source.buffering: bounded` at a small maxBufferSize, and show the
object store stays bounded while `unbounded` balloons, with the final
table byte-identical between modes.

Measurement: plasma lives in /dev/shm on this host (files are unlinked
after mmap, so tmpfs USAGE via statvfs is the probe); a sampler thread
records peak usage during each replay.  Each mode runs in a FRESH
process (`--mode` child) so the DataContext resource limit and plasma
pools can't leak across modes.
"""

import json
import os
import shutil
import subprocess
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

N_EVENTS = int(os.environ.get("GRAFT_BB_EVENTS", "4000000"))
SEED = 7
CACHE_ROOT = "/tmp/graft_bench"
MAX_BUFFER_ROWS = 200_000


def shm_used() -> int:
    st = os.statvfs("/dev/shm")
    return (st.f_blocks - st.f_bfree) * st.f_frsize


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


def run_mode(mode: str) -> dict:
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

    from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
        StreamRunner,
        read_target_table,
    )
    from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
        prepare_watermark,
    )

    ctlog = ensure_feed()
    target = os.path.join(CACHE_ROOT, f"bb-target-{mode}")
    shutil.rmtree(target, ignore_errors=True)
    prepare_watermark(target, 0, num_partitions=32)
    ctx = StreamContext.from_dict(
        {
            "source": {
                "ctlog_dir": ctlog,
                "key_columns": ["url"],
                "buffering": mode,
                "max_buffer_size": MAX_BUFFER_ROWS,
            },
            "sink": {"target_root": target, "num_partitions": 32,
                     "durable_writes": False},
            # ONE oversized poll: the whole feed in a single cycle
            "throughput": {"rows_per_group": N_EVENTS},
            "maintenance": {"enabled": False},
        }
    )

    base = shm_used()
    peak = [0]
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            peak[0] = max(peak[0], shm_used() - base)
            time.sleep(0.05)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    t0 = time.perf_counter()
    StreamRunner(ctx).run()
    wall = time.perf_counter() - t0
    stop.set()
    th.join()

    # cheap whole-table fingerprint for the oracle-identical claim
    tbl = read_target_table(target)
    n = tbl.num_rows
    import hashlib

    import pandas as pd

    df = tbl.to_pandas().sort_values("url").reset_index(drop=True)
    fingerprint = hashlib.sha1(
        pd.util.hash_pandas_object(df[sorted(df.columns)], index=False).values.tobytes()
    ).hexdigest()
    shutil.rmtree(target, ignore_errors=True)
    ray.shutdown()
    return {
        "mode": mode,
        "wall_s": round(wall, 2),
        "rows_final": int(n),
        "fingerprint": fingerprint,
        "peak_object_store_bytes": int(peak[0]),
    }


def main():
    out = {"events": N_EVENTS, "max_buffer_rows": MAX_BUFFER_ROWS, "modes": {}}
    for mode in ("unbounded", "bounded"):
        r = subprocess.run(
            [sys.executable, __file__, "--mode", mode],
            capture_output=True,
            text=True,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        out["modes"][mode] = json.loads(line)
    u, b = out["modes"]["unbounded"], out["modes"]["bounded"]
    out["identical_output"] = (
        u["fingerprint"] == b["fingerprint"] and u["rows_final"] == b["rows_final"]
    )
    out["peak_ratio_unbounded_over_bounded"] = round(
        u["peak_object_store_bytes"] / max(b["peak_object_store_bytes"], 1), 2
    )
    print(json.dumps(out))
    with open("/root/repo/BENCH/bounded_buffer.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--mode":
        print(json.dumps(run_mode(sys.argv[2])))
    else:
        main()
