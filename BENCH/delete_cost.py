#!/usr/bin/env python
"""Merge-on-read DELETE cost evidence (K9/K9b).

Claim under test: the delete COMMIT is O(1) (predicate) / O(|keys|)
(equality) — independent of table size — while the physical fold
(materialize_deletes) is the only table-sized cost, deferrable to the
maintenance window.  At 100 TB this is the difference between a
milliseconds GDPR erasure request and a full-table rewrite on the
request path.

Protocol: build the same all-distinct-key MoR target at two sizes
(SMALL = 2 cycles, LARGE = 10 cycles of the identical feed), then at
each size time: a clean full read, a predicate-delete commit, a read
with the predicate pending, an equality-delete commit of N_KEYS keys,
a read with both pending, and the materialize fold.  Commits should be
~flat across sizes; only materialize (and reads, which scan the table
anyway) may grow with the table.

    python BENCH/delete_cost.py        # writes BENCH/delete_cost.json

Env: RAY_GRAFT_CPUS (default 16), GRAFT_DEL_EVENTS (default 2_000_000),
GRAFT_DEL_KEYS (default 100_000).
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
N_KEYS = int(os.environ.get("GRAFT_DEL_KEYS", "100000"))
CYCLES = 10
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
            n_keys=N_EVENTS,
            n_events=N_EVENTS,
            zipf_a=1.0,
            events_per_file=N_EVENTS // CYCLES,
        ),
        use_ray=True,
    )
    return d


def build_target(feed: str, cycles: int) -> tuple[str, "object"]:
    from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import StreamRunner
    from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
        prepare_watermark,
    )

    tgt = tempfile.mkdtemp(prefix=f"delcost_{cycles}_", dir=CACHE_ROOT)
    prepare_watermark(tgt, 0, num_partitions=32)
    ctx = StreamContext.from_dict(
        {
            "source": {"ctlog_dir": feed, "key_columns": ["url"]},
            "sink": {
                "target_root": tgt,
                "num_partitions": 32,
                "merge_mode": "mor",
                "durable_writes": False,
            },
            "throughput": {"rows_per_group": N_EVENTS // CYCLES},
            "maintenance": {"enabled": False},
        }
    )
    StreamRunner(ctx).run(max_cycles=cycles)
    return tgt, ctx


def sample_keys(feed: str, n: int) -> list[str]:
    import pyarrow.parquet as pq

    seg = sorted(
        os.path.join(feed, f) for f in os.listdir(feed) if f.endswith(".parquet")
    )[0]
    urls = pq.read_table(seg, columns=["url"])["url"].to_pylist()
    return urls[:n]


def measure(size_name: str, feed: str, cycles: int) -> dict:
    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
        delete_keys,
        delete_where,
        read_target_table,
    )
    from arcane_stream_sqlserver_change_tracking_ray.stages.maintenance import (
        materialize_deletes,
    )
    from arcane_stream_sqlserver_change_tracking_ray.state.manifest import ManifestLog

    tgt, ctx = build_target(feed, cycles)
    try:
        rec: dict = {"cycles": cycles}

        t0 = time.perf_counter()
        t = read_target_table(tgt)
        rec["rows"] = t.num_rows
        rec["read_clean_s"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        delete_where(tgt, [["lang", "==", "en"]])
        rec["predicate_commit_s"] = round(time.perf_counter() - t0, 4)

        t0 = time.perf_counter()
        rec["rows_after_predicate"] = read_target_table(tgt).num_rows
        rec["read_with_predicate_s"] = round(time.perf_counter() - t0, 3)

        keys = sample_keys(feed, N_KEYS)
        t0 = time.perf_counter()
        delete_keys(tgt, keys)
        rec["equality_commit_s"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        rec["rows_after_both"] = read_target_table(tgt).num_rows
        rec["read_with_both_s"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        materialize_deletes(ManifestLog(tgt), ctx)
        rec["materialize_s"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        assert read_target_table(tgt).num_rows == rec["rows_after_both"]
        rec["read_after_materialize_s"] = round(time.perf_counter() - t0, 3)
        return rec
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
    out = {"events": N_EVENTS, "n_keys": N_KEYS, "num_cpus": NUM_CPUS}
    out["small"] = measure("small", feed, 2)
    out["large"] = measure("large", feed, CYCLES)
    ray.shutdown()

    # flatness: commit cost ratio large/small (~1.0 = size-independent)
    for k in ("predicate_commit_s", "equality_commit_s", "materialize_s"):
        s, l = out["small"][k], out["large"][k]
        out[f"{k}_growth"] = round(l / s, 2) if s else None
    path = os.path.join(REPO, "BENCH", "delete_cost.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
