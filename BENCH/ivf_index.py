"""Persisted IVF sidecar (r5, verdict #3): query-time cost with the
index built ONCE vs the r4 shape (per-query corpus materialization +
k-means rebuild).

Records, at $GRAFT_SF_DIR (default sf0.1):
- build_s: one-time index build (k-means + streaming posting write)
- cold_query_s: r4-equivalent cost = build + probe (what EVERY query
  paid before the sidecar)
- warm_query_s: probe against the persisted index (what queries pay now)
- scan_bytes_warm / corpus_bytes: the probed posting files' bytes vs the
  whole embedding corpus — the nprobe/n_clusters pruning claim, measured
  from the files the probe plan actually reads
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__  # noqa: F401  (by-value registration)
    from entry.common import _read
    from entry.queries_dedup import _query_vectors
    from arcane_stream_sqlserver_change_tracking_ray.functions.similarity import (
        build_ivf_index,
        ivf_probe,
        load_ivf_index,
    )
    from arcane_stream_sqlserver_change_tracking_ray.state.fs import lakefs

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_clusters, nprobe, iters, k = 64, 4, 5, 10  # scale posture: scan ~ nprobe/n_clusters
    q = _query_vectors(sf_dir)
    root = "/tmp/graft_bench_ivf"
    shutil.rmtree(root, ignore_errors=True)

    def consume(ds):
        return ds.to_pandas()

    # one-time build (the maintenance pass)
    t0 = time.perf_counter()
    build_ivf_index(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        root, n_clusters=n_clusters, iters=iters,
    )
    build_s = time.perf_counter() - t0

    # r4-equivalent: every query paid build + probe (fresh root per rep)
    cold = []
    for rep in range(2):
        r = f"{root}-cold{rep}"
        shutil.rmtree(r, ignore_errors=True)
        t0 = time.perf_counter()
        build_ivf_index(
            _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
            r, n_clusters=n_clusters, iters=iters,
        )
        df_cold = consume(ivf_probe(r, q, k=k, nprobe=nprobe))
        cold.append(time.perf_counter() - t0)
        shutil.rmtree(r, ignore_errors=True)

    # persisted-index path: probe only
    warm = []
    for _ in range(3):
        t0 = time.perf_counter()
        df_warm = consume(ivf_probe(root, q, k=k, nprobe=nprobe))
        warm.append(time.perf_counter() - t0)
    assert sorted(map(tuple, df_warm[["query_id", "vec_id"]].values)) == sorted(
        map(tuple, df_cold[["query_id", "vec_id"]].values)
    ), "persisted-index probe must match the rebuild path"

    # measured scan bytes: the probed clusters' posting files
    cents, manifest, meta = load_ivf_index(root)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    probed = np.unique(np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe])
    fs = lakefs(root)
    scan_bytes = sum(
        fs.getsize(rel)
        for c in probed.tolist()
        for rel in manifest.partitions.get(int(c), [])
    )
    index_bytes = sum(
        fs.getsize(rel) for files in manifest.partitions.values() for rel in files
    )
    corpus_bytes = os.path.getsize(f"{sf_dir}/embeddings.parquet")

    out = {
        "sf_dir": sf_dir,
        "rows": meta["rows"],
        "n_clusters": n_clusters,
        "nprobe": nprobe,
        "build_s": round(build_s, 3),
        "cold_query_s": round(min(cold), 3),
        "warm_query_s": round(min(warm), 3),
        "speedup_warm_vs_cold": round(min(cold) / min(warm), 2),
        "scan_bytes_warm": scan_bytes,
        "index_bytes": index_bytes,
        "corpus_bytes": corpus_bytes,
        "scan_fraction_of_index": round(scan_bytes / index_bytes, 3),
        "clusters_probed": int(len(probed)),
    }
    print(json.dumps(out))
    with open("/root/repo/BENCH/ivf_index.json", "w") as f:
        json.dump(out, f, indent=1)
    shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
