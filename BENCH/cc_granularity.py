"""Group-UDF granularity of distributed connected components (r3 fix #2).

Before: every star round ran ``groupby(node).map_groups`` — ONE Python
UDF call per distinct graph node per round (per-row Python at 10^8
nodes).  After: rounds group by a coarse bucket (``hash(node) %
buckets``) and each bucket call resolves all of its node groups in one
``sort + minimum.reduceat`` pass, bounding per-round Python calls by
the bucket count.

This bench measures, on a synthetic sparse near-dup-shaped graph:
  - old-shape invocations/round = distinct grouping keys (nodes)
  - new-shape invocations/round = non-empty coarse buckets
  - measured wall time + convergence rounds of the new implementation
  - label agreement with the driver-side pointer-jumping CC

Run: python BENCH/cc_granularity.py  (writes BENCH/cc_granularity.json)
"""

import json
import os
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

    from arcane_stream_sqlserver_change_tracking_ray.functions.dedup import (
        _cc_bucket,
        connected_components,
        connected_components_ds,
    )

    # sparse graph shaped like a near-dup pair list: 200k nodes, ~150k
    # edges in small clusters plus a few long chains (stress rounds)
    rng = np.random.default_rng(42)
    n_nodes, n_edges = 200_000, 150_000
    a = rng.integers(0, n_nodes, size=n_edges).astype(np.int64)
    b = np.minimum(a + rng.integers(1, 50, size=n_edges), n_nodes - 1).astype(np.int64)
    chains = np.arange(n_nodes, n_nodes + 5_000, dtype=np.int64)
    a = np.r_[a, chains[:-1]]
    b = np.r_[b, chains[1:]]
    keep = a != b
    a, b = a[keep], b[keep]

    nodes = np.unique(np.r_[a, b])
    buckets = 1024
    nonempty = np.unique(_cc_bucket(nodes, buckets)).size

    pairs = ray.data.from_arrow(
        pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})
    ).repartition(16)

    stats: dict = {}
    t0 = time.monotonic()
    got = connected_components_ds(pairs, buckets=buckets, stats=stats).take_all()
    wall = time.monotonic() - t0

    exp_nodes, exp_lbl = connected_components(a, b)
    exp = dict(zip(exp_nodes.tolist(), exp_lbl.tolist()))
    got_map = {r["node"]: r["label"] for r in got}
    assert got_map == exp, "distributed CC labels diverge from driver CC"

    out = {
        "metric": "cc_group_udf_invocations_per_round",
        "nodes": int(nodes.size),
        "edges": int(a.size),
        "rounds": stats.get("rounds"),
        "buckets": buckets,
        "old_shape_invocations_per_grouping": int(nodes.size),
        "new_shape_invocations_per_grouping": int(nonempty),
        "reduction_x": round(nodes.size / max(nonempty, 1), 1),
        "wall_seconds": round(wall, 2),
        "labels_match_driver_cc": True,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cc_granularity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
