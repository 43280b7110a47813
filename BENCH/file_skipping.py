"""Manifest-level file skipping cost/benefit (r3 verdict stretch #7).

Builds a lake of K files range-partitioned on event_id, runs ANALYZE
(footer-only per-file bounds -> manifest), then times a selective
``read_target(where=...)`` point-range query with and without the
manifest stats.  Reports files scanned + wall time for both.

Run: python BENCH/file_skipping.py  (writes BENCH/file_skipping.json)
"""

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    ray.data.DataContext.get_current().enable_progress_bars = False

    from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import read_target
    from arcane_stream_sqlserver_change_tracking_ray.stages.maintenance import analyze
    from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
        ManifestLog,
        prepare_watermark,
        prune_files_by_stats,
    )

    root = "/tmp/file_skipping_lake"
    shutil.rmtree(root, ignore_errors=True)
    n_files, rows = 64, 50_000
    prepare_watermark(root, version=0, num_partitions=1)
    log = ManifestLog(root)
    m = log.require_watermark()
    nxt = m.next()
    rels = []
    for i in range(n_files):
        lo = i * rows
        ids = np.arange(lo, lo + rows, dtype=np.int64)
        t = pa.table(
            {
                "arcane_merge_key": pa.array([f"k{j}" for j in ids]),
                "sys_change_version": pa.array(ids),
                "sys_change_operation": pa.array(["I"] * rows),
                "event_id": pa.array(ids),
                "value": pa.array(ids.astype(np.float64) / 10.0),
            }
        )
        rel = f"part-0/file-{i:03d}.parquet"
        log.fs.write_table(t, rel)
        rels.append(rel)
    nxt.schema = t.schema
    nxt.partitions = {0: rels}
    nxt.watermark = n_files * rows
    log.commit(nxt, expect_version=m.version)

    ctx = StreamContext.from_dict(
        {
            "source": {"ctlog_dir": "/tmp/none"},
            "sink": {"target_root": root, "num_partitions": 1},
            "maintenance": {"analyze_included_columns": ["event_id"]},
        }
    )
    t0 = time.monotonic()
    analyze(log, ctx)
    analyze_s = time.monotonic() - t0

    where = [["event_id", ">=", 10 * rows], ["event_id", "<", 11 * rows]]
    man = log.require_watermark()
    kept = prune_files_by_stats(sorted(man.all_files()), man.file_stats, where)

    def timed_read(strip_stats: bool) -> float:
        if strip_stats:
            # simulate the pre-r4 manifest: no file_stats -> no pruning
            man2 = log.require_watermark()
            man2.file_stats = {}
            saved = ManifestLog.require_watermark
            ManifestLog.require_watermark = lambda self: man2
        try:
            t0 = time.monotonic()
            n = read_target(root, columns=["event_id", "value"], where=where).count()
            dt = time.monotonic() - t0
            assert n == rows, n
            return dt
        finally:
            if strip_stats:
                ManifestLog.require_watermark = saved

    warm = timed_read(False)  # warm the fs cache
    pruned_s = min(timed_read(False) for _ in range(3))
    full_s = min(timed_read(True) for _ in range(3))

    out = {
        "metric": "manifest_file_skipping",
        "files_total": n_files,
        "rows_per_file": rows,
        "files_scanned_with_stats": len(kept),
        "files_scanned_without_stats": n_files,
        "analyze_footer_pass_seconds": round(analyze_s, 3),
        "read_seconds_with_stats": round(pruned_s, 3),
        "read_seconds_without_stats": round(full_s, 3),
        "speedup_x": round(full_s / max(pruned_s, 1e-9), 1),
        "warmup_read_seconds": round(warm, 3),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "file_skipping.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
