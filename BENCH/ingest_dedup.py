#!/usr/bin/env python
"""Bounded-probe evidence for ingest-time streaming dedup.

The claim (ingest_dedup.py): per-cycle probe I/O is bounded by the
cycle (duplicates + bloom fpr), NOT by the index size — without the
posting-file bloom sidecars every cycle would re-read the whole
committed index.  This harness replays a synthetic corpus with a fixed
dup rate through the full engine in N cycles, instruments the lake
filesystem, and records per-cycle: committed posting files (what a
bloom-less probe MUST read), files actually read, and bytes actually
read.  Flat actual-reads vs linearly growing committed count = claim
holds.

Usage: python BENCH/ingest_dedup.py [n_cycles] [docs_per_cycle]
Writes BENCH/ingest_dedup.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def make_texts(n: int, seed: int, dup_rate: float = 0.02) -> list[str]:
    """Deterministic corpus; ~dup_rate of docs repeat an earlier text."""
    import numpy as np

    rng = np.random.default_rng(seed)
    words = [f"w{i:04d}" for i in range(2000)]
    texts: list[str] = []
    for i in range(n):
        if texts and rng.random() < dup_rate:
            texts.append(texts[int(rng.integers(0, len(texts)))])
        else:
            idx = rng.integers(0, len(words), size=30)
            texts.append(" ".join(words[j] for j in idx))
    return texts


def main() -> None:
    n_cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    per_cycle = int(sys.argv[2]) if len(sys.argv) > 2 else 4000

    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.parquet as pq

    from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
    from arcane_stream_sqlserver_change_tracking_ray.functions import ingest_dedup as ID
    from arcane_stream_sqlserver_change_tracking_ray.gen import segment_path
    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import StreamRunner
    from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
        ManifestLog,
        prepare_watermark,
    )
    from arcane_stream_sqlserver_change_tracking_ray.types import OP_COL, VERSION_COL

    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="bench_ingest_dedup_")
    try:
        n = n_cycles * per_cycle
        texts = make_texts(n, seed=3)
        feed = pa.table({
            "doc_id": pa.array(range(1, n + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            VERSION_COL: pa.array(range(1, n + 1), pa.int64()),
            OP_COL: pa.array(["U"] * n, pa.string()),
        })
        ct, tgt, idx_root = f"{root}/ct", f"{root}/tgt", f"{root}/idx"
        os.makedirs(ct, exist_ok=True)
        chunk = max(math.ceil(n / n_cycles), 1)
        prev = 0
        for off in range(0, n, chunk):
            sl = feed.slice(off, chunk)
            hi = int(sl[VERSION_COL][-1].as_py())
            pq.write_table(sl, segment_path(ct, prev, hi))
            prev = hi
        prepare_watermark(tgt, version=0, num_partitions=8)
        ctx = StreamContext.from_dict({
            "source": {"ctlog_dir": ct, "key_columns": ["doc_id"]},
            "sink": {"target_root": tgt, "num_partitions": 8},
            "throughput": {"rows_per_group": chunk},
        })
        t0 = time.perf_counter()
        StreamRunner(ctx).run()
        replay_s = round(time.perf_counter() - t0, 2)

        # measure the probe's pruning per cycle by re-deriving the
        # decision driver-side from manifest diffs (the probe itself runs
        # in Ray workers): committed = previous manifest's postings,
        # incoming = this cycle's newly registered postings; a committed
        # file is READ only when its bloom sidecar cannot rule out every
        # incoming key of some kind.
        from arcane_stream_sqlserver_change_tracking_ray.state.fs import lakefs

        def probe_cost(index_root, prev_parts, new_parts):
            import numpy as np

            fs = lakefs(index_root)
            committed_total = files_read = bytes_read = 0
            for pid, rels in new_parts.items():
                inc_rels = [r for r in rels if r not in set(prev_parts.get(pid, []))]
                if not inc_rels:
                    continue
                committed = prev_parts.get(pid, [])
                committed_total += len(committed)
                if not committed:
                    continue
                inc = pa.concat_tables([fs.read_table(r) for r in inc_rels])
                inc_kind = inc["kind"].to_numpy(zero_copy_only=False)
                inc_hk = inc["hk"].to_numpy(zero_copy_only=False)
                by_kind = {k: inc_hk[inc_kind == k] for k in (0, 1)
                           if (inc_kind == k).any()}
                for rel in committed:
                    z = fs.read_npz(rel + ID._BLOOM_SUFFIX)
                    pruned = z is not None and all(
                        f"kind{k}" in z for k in by_kind) and not any(
                        ID.hk_bloom_may_contain(z[f"kind{k}"], h).any()
                        for k, h in by_kind.items())
                    if not pruned:
                        files_read += 1
                        bytes_read += os.path.getsize(
                            os.path.join(index_root, rel))
            return committed_total, files_read, bytes_read

        def fold_all(index_root, resident, compact=False):
            stats = []
            idx = ID.IngestDedupIndex(index_root, num_partitions=8,
                                      resident=resident)
            idx.create()
            up = ManifestLog(tgt)
            idx_log = ManifestLog(index_root)
            done = 0
            for v in [x for x in up.versions() if x > 0]:
                prev_parts = {k: list(vv)
                              for k, vv in idx_log.latest().partitions.items()}
                t0 = time.perf_counter()
                idx._advance_one(tgt, done, v, up.read(v).watermark)
                wall = round(time.perf_counter() - t0, 3)
                committed, files_read, bytes_read = probe_cost(
                    index_root, prev_parts, idx_log.latest().partitions)
                if compact:
                    idx.compact(min_files=2)
                stats.append({
                    "cycle": len(stats) + 1, "wall_s": wall,
                    "committed_files": committed,
                    "stateless_files_read": files_read,
                    "stateless_bytes_read": bytes_read,
                })
                done = v
            return idx, stats

        # resident owners (the default): per-cycle cost must stay flat
        idx, per_cycle_stats = fold_all(idx_root, resident=True)
        # stateless probe tasks for contrast: same lake, separate index
        _, stateless_stats = fold_all(f"{root}/idx_stateless", resident=False)
        # stateless + per-cycle compaction: committed file fan-in bounded
        # at num_partitions forever (the index's OPTIMIZE)
        idx_c, compact_stats = fold_all(f"{root}/idx_compact",
                                        resident=False, compact=True)
        for a, b, c in zip(per_cycle_stats, stateless_stats, compact_stats):
            a["stateless_wall_s"] = b["wall_s"]
            a["compacted_committed_files"] = c["committed_files"]
            a["compacted_files_read"] = c["stateless_files_read"]
            a["compacted_wall_s"] = c["wall_s"]
        # compaction must not change any verdict
        import pandas.testing as pdt

        fa = idx.flags().sort_by([("doc_id", "ascending")]).to_pandas()
        fc = idx_c.flags().sort_by([("doc_id", "ascending")]).to_pandas()
        pdt.assert_frame_equal(
            fa[["doc_id", "exact_dup", "near_candidate"]].reset_index(drop=True),
            fc[["doc_id", "exact_dup", "near_candidate"]].reset_index(drop=True),
        )

        flags = idx.flags()
        n_exact = flags["exact_dup"].to_pandas().sum()
        doc = {
            "metric": "ingest_dedup_bounded_probe",
            "n_docs": n, "n_cycles": n_cycles, "dup_rate": 0.02,
            "replay_s": replay_s,
            "exact_dups_found": int(n_exact),
            "near_candidates": int(flags["near_candidate"].to_pandas().sum()),
            "per_cycle": per_cycle_stats,
            "summary": {
                "committed_files_last_cycle": per_cycle_stats[-1]["committed_files"],
                "stateless_files_read_last_cycle": per_cycle_stats[-1]["stateless_files_read"],
                "stateless_bytes_last_cycle": per_cycle_stats[-1]["stateless_bytes_read"],
                "resident_wall_first3": [c["wall_s"] for c in per_cycle_stats[:3]],
                "resident_wall_last3": [c["wall_s"] for c in per_cycle_stats[-3:]],
                "stateless_wall_first3": [c["stateless_wall_s"] for c in per_cycle_stats[:3]],
                "stateless_wall_last3": [c["stateless_wall_s"] for c in per_cycle_stats[-3:]],
                "compacted_committed_files_last_cycle":
                    per_cycle_stats[-1]["compacted_committed_files"],
                "compacted_files_read_last_cycle":
                    per_cycle_stats[-1]["compacted_files_read"],
                "compacted_wall_last3":
                    [c["compacted_wall_s"] for c in per_cycle_stats[-3:]],
            },
        }
        with open(os.path.join(HERE, "ingest_dedup.json"), "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps({k: doc[k] for k in
                          ("replay_s", "exact_dups_found", "summary")}))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    main()
