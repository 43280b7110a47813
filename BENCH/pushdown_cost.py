#!/usr/bin/env python
"""Filtered-read pushdown evidence (K11 × sortedBy).

Claim under test: `read_target(where=...)` on a column the table is
sorted by prunes parquet row groups at the scan, so a selective read
costs a fraction of a full scan — the lake-side analog of the
reference's Iceberg metadata + sortedBy file skipping.  The same
predicate on an UNSORTED copy of the table cannot skip (every row
group's min/max straddles the predicate), isolating the sortedBy
contribution from mere output-size effects.

Protocol: build the same MoR target twice (sorted_by=url vs unsorted),
fold both (OPTIMIZE re-sorts per the table property), then time at each:
a full scan, a selective pushdown read (url < p10 cutoff), and the same
predicate evaluated client-side after a full scan.  Run:

    python BENCH/pushdown_cost.py        # writes BENCH/pushdown_cost.json

Env: RAY_GRAFT_CPUS (default 16), GRAFT_DEL_EVENTS (default 2_000_000).
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
N_EVENTS = int(os.environ.get("GRAFT_DEL_EVENTS", "2000000"))
CACHE_ROOT = os.environ.get("GRAFT_BENCH_CACHE", "/tmp/graft_bench")


def ensure_feed() -> str:
    from arcane_stream_sqlserver_change_tracking_ray.gen import CtLogSpec, write_ctlog
    from arcane_stream_sqlserver_change_tracking_ray.sources.ctlog import (
        max_available_version,
    )

    d = os.path.join(CACHE_ROOT, f"delfeed-{N_EVENTS}")
    if max_available_version(d) == N_EVENTS:
        return d
    shutil.rmtree(d, ignore_errors=True)
    write_ctlog(
        d,
        CtLogSpec(
            n_keys=N_EVENTS, n_events=N_EVENTS, zipf_a=1.0,
            events_per_file=N_EVENTS // 10,
        ),
        use_ray=True,
    )
    return d


def build(feed: str, sorted_by: list[str]) -> tuple[str, "object"]:
    from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import StreamRunner
    from arcane_stream_sqlserver_change_tracking_ray.stages.maintenance import (
        run_maintenance,
    )
    from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
        ManifestLog,
        prepare_watermark,
    )

    tgt = tempfile.mkdtemp(prefix="push_", dir=CACHE_ROOT)
    prepare_watermark(tgt, 0, num_partitions=32)
    ctx = StreamContext.from_dict(
        {
            "source": {"ctlog_dir": feed, "key_columns": ["url"]},
            "sink": {
                "target_root": tgt,
                "num_partitions": 32,
                "merge_mode": "mor",
                "durable_writes": False,
                "sorted_by": sorted_by,
            },
            "throughput": {"rows_per_group": N_EVENTS // 2},
            "maintenance": {"enabled": False},
        }
    )
    StreamRunner(ctx).run()
    run_maintenance(ManifestLog(tgt), ctx)  # fold: pure pushdown path
    return tgt, ctx


def timed_scan(ds) -> tuple[float, int]:
    """Force a REAL scan (a bare .count() on unfiltered parquet answers
    from footer metadata without reading a byte): fold every batch to a
    row count and sum."""
    import pyarrow as pa

    def fold(b):
        return pa.table({"n": pa.array([b.num_rows], pa.int64())})

    t0 = time.perf_counter()
    n = int(ds.map_batches(fold, batch_format="pyarrow").sum("n") or 0)
    return round(time.perf_counter() - t0, 3), n


def measure(tgt: str, cutoff: str) -> dict:
    import pyarrow.compute as pc

    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import read_target

    rec: dict = {}
    rec["full_scan_s"], rec["rows_total"] = timed_scan(read_target(tgt))
    rec["pushdown_s"], rec["rows_selected"] = timed_scan(
        read_target(tgt, where=[["url", "<", cutoff]])
    )
    t0 = time.perf_counter()
    n = (
        read_target(tgt)
        .map_batches(
            lambda b: b.filter(pc.less(b["url"], cutoff)), batch_format="pyarrow"
        )
        .count()
    )
    rec["client_filter_s"] = round(time.perf_counter() - t0, 3)
    assert n == rec["rows_selected"]
    return rec


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

    import pyarrow.parquet as pq

    feed = ensure_feed()
    seg = sorted(
        os.path.join(feed, f) for f in os.listdir(feed) if f.endswith(".parquet")
    )[0]
    urls = sorted(pq.read_table(seg, columns=["url"])["url"].to_pylist())
    cutoff = urls[len(urls) // 10]  # ~p10 of the key space

    out = {"events": N_EVENTS, "num_cpus": NUM_CPUS, "cutoff_pct": 10}
    for label, sort in (("sorted", ["url"]), ("unsorted", [])):
        tgt, _ = build(feed, sort)
        try:
            out[label] = measure(tgt, cutoff)
        finally:
            shutil.rmtree(tgt, ignore_errors=True)
    ray.shutdown()

    out["pushdown_speedup_vs_full_scan"] = {
        k: round(out[k]["full_scan_s"] / out[k]["pushdown_s"], 2)
        for k in ("sorted", "unsorted")
    }
    path = os.path.join(REPO, "BENCH", "pushdown_cost.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
