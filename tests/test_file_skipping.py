"""Manifest-level file skipping (r3 verdict stretch #7): ANALYZE folds
per-FILE column min/max (from parquet footers — no data scan) into the
manifest, and ``read_target(where=...)`` prunes whole files whose stats
prove no row can match, BEFORE any scan task is launched.  Reference
analog: Iceberg manifest-entry column bounds + ``sortedBy``
(docs/crd.md:114-119,136-172)."""

import numpy as np
import pyarrow as pa

from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
    ManifestLog,
    prune_files_by_stats,
)


def test_prune_files_by_stats_pure():
    fs = {
        "p0/a.parquet": {"x": [0, 99], "s": ["a", "m"]},
        "p0/b.parquet": {"x": [100, 199]},
        "p0/c.parquet": {},  # no stats -> never pruned
    }
    files = sorted(fs)
    # equality outside a file's range prunes it
    assert prune_files_by_stats(files, fs, [["x", "=", 150]]) == [
        "p0/b.parquet",
        "p0/c.parquet",
    ]
    # range ops
    assert prune_files_by_stats(files, fs, [["x", ">", 99]]) == [
        "p0/b.parquet",
        "p0/c.parquet",
    ]
    assert prune_files_by_stats(files, fs, [["x", "<=", 99]]) == [
        "p0/a.parquet",
        "p0/c.parquet",
    ]
    # string bounds work too
    assert prune_files_by_stats(files, fs, [["s", ">=", "z"]]) == [
        "p0/b.parquet",  # no 's' stats on b -> kept
        "p0/c.parquet",
    ]
    # != prunes only a constant file
    fs2 = {"k.parquet": {"x": [7, 7]}, "l.parquet": {"x": [7, 9]}}
    assert prune_files_by_stats(sorted(fs2), fs2, [["x", "!=", 7]]) == ["l.parquet"]
    # un-comparable literal: fail open (keep everything)
    assert prune_files_by_stats(files, fs, [["x", ">", "not-a-number"]]) == files
    # AND semantics: any provably-false conjunct prunes
    assert prune_files_by_stats(files, fs, [["x", ">=", 0], ["x", "<", 50]]) == [
        "p0/a.parquet",
        "p0/c.parquet",
    ]


def _mk_lake(tmp_path, n_files=8, rows_per_file=500):
    """A committed lake whose files are range-partitioned on event_id —
    the sorted-column layout file skipping is built for."""
    import pyarrow.parquet as pq

    from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
        Manifest,
        prepare_watermark,
    )

    root = str(tmp_path / "lake")
    prepare_watermark(root, version=0, num_partitions=1)
    log = ManifestLog(root)
    m = log.require_watermark()
    nxt = m.next()
    schema = pa.schema(
        [
            ("arcane_merge_key", pa.string()),
            ("sys_change_version", pa.int64()),
            ("sys_change_operation", pa.string()),
            ("event_id", pa.int64()),
            ("value", pa.float64()),
        ]
    )
    rels = []
    for i in range(n_files):
        lo = i * rows_per_file
        ids = np.arange(lo, lo + rows_per_file, dtype=np.int64)
        t = pa.table(
            {
                "arcane_merge_key": pa.array([f"k{j}" for j in ids]),
                "sys_change_version": pa.array(ids),
                "sys_change_operation": pa.array(["I"] * rows_per_file),
                "event_id": pa.array(ids),
                "value": pa.array(ids.astype(np.float64) / 10.0),
            }
        )
        rel = f"part-0/file-{i:03d}.parquet"
        log.fs.write_table(t, rel)
        rels.append(rel)
    nxt.schema = schema
    nxt.partitions = {0: rels}
    nxt.watermark = n_files * rows_per_file
    log.commit(nxt, expect_version=m.version)
    return root, rels


def test_analyze_records_file_stats_and_read_target_prunes(tmp_path, ray_session):
    from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
        read_target,
    )
    from arcane_stream_sqlserver_change_tracking_ray.stages.maintenance import analyze

    root, rels = _mk_lake(tmp_path)
    log = ManifestLog(root)
    ctx = StreamContext.from_dict(
        {
            "source": {"ctlog_dir": str(tmp_path / "nope")},
            "sink": {"target_root": root, "num_partitions": 1},
            "maintenance": {"analyze_included_columns": ["event_id", "value"]},
        }
    )
    analyze(log, ctx)
    m = log.require_watermark()
    # every live file got footer-derived bounds for the analyzed columns
    assert set(m.file_stats) == set(rels)
    assert m.file_stats[rels[0]]["event_id"] == [0, 499]
    assert m.file_stats[rels[3]]["event_id"] == [1500, 1999]

    # the pure pruner keeps exactly the one covering file
    where = [["event_id", ">=", 1500], ["event_id", "<", 2000]]
    kept = prune_files_by_stats(sorted(m.all_files()), m.file_stats, where)
    assert kept == [rels[3]]

    # read_target over the pruned scan returns exactly the right rows
    got = read_target(root, columns=["event_id", "value"], where=where).to_pandas()
    got = got.sort_values("event_id").reset_index(drop=True)
    assert len(got) == 500
    assert got["event_id"].min() == 1500 and got["event_id"].max() == 1999

    # a filter matching nothing prunes every file and returns empty
    # with the projected schema intact (dataset-level: Ray's to_pandas
    # drops columns on 0-row datasets regardless of schema)
    none = read_target(root, columns=["event_id"], where=[["event_id", ">", 10**9]])
    assert none.count() == 0
    assert none.schema().names == ["event_id"]


def test_file_stats_survive_json_roundtrip(tmp_path):
    from arcane_stream_sqlserver_change_tracking_ray.state.manifest import Manifest

    m = Manifest(version=1, watermark=5, num_partitions=1)
    m.file_stats = {"p/f.parquet": {"x": [1, 2], "s": ["a", "b"]}}
    m2 = Manifest.from_json(m.to_json())
    assert m2.file_stats == m.file_stats
    # next() carries them forward
    assert m2.next().file_stats == m.file_stats


def test_mor_path_partition_pruning(tmp_path, ray_session):
    """With deltas pending (merge-on-read), a where-filtered read skips
    every PARTITION whose base+delta bounds all exclude the predicate —
    and still returns the exact LWW-resolved rows."""
    import pyarrow.parquet as pq

    from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
        read_target,
    )
    from arcane_stream_sqlserver_change_tracking_ray.stages.maintenance import analyze
    from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
        prepare_watermark,
    )

    root = str(tmp_path / "mor_lake")
    prepare_watermark(root, version=0, num_partitions=4)
    log = ManifestLog(root)
    m = log.require_watermark()
    nxt = m.next()

    def tbl(lo, hi, version_bump=0):
        ids = np.arange(lo, hi, dtype=np.int64)
        return pa.table(
            {
                "arcane_merge_key": pa.array([f"k{j}" for j in ids]),
                "sys_change_version": pa.array(ids + version_bump),
                "sys_change_operation": pa.array(["I"] * len(ids)),
                "event_id": pa.array(ids),
                "value": pa.array(ids.astype(np.float64)),
            }
        )

    parts, deltas = {}, {}
    for pid in range(4):
        base = tbl(pid * 1000, pid * 1000 + 500)
        rel_b = f"part-{pid}/base.parquet"
        log.fs.write_table(base, rel_b)
        parts[pid] = [rel_b]
        delta = tbl(pid * 1000 + 500, pid * 1000 + 600)
        rel_d = f"cycles/c1/delta-{pid}.parquet"
        log.fs.write_table(delta, rel_d)
        deltas[pid] = [rel_d]
    nxt.schema = tbl(0, 1).schema
    nxt.partitions, nxt.deltas = parts, deltas
    nxt.watermark = 4000
    log.commit(nxt, expect_version=m.version)

    ctx = StreamContext.from_dict(
        {
            "source": {"ctlog_dir": str(tmp_path / "nope")},
            "sink": {"target_root": root, "num_partitions": 4},
            "maintenance": {"analyze_included_columns": ["event_id"]},
        }
    )
    analyze(log, ctx)
    man = log.require_watermark()
    # delta files got bounds too
    assert "cycles/c1/delta-2.parquet" in man.file_stats

    where = [["event_id", ">=", 2400], ["event_id", "<", 2600]]
    got = read_target(root, columns=["event_id", "value"], where=where).to_pandas()
    got = got.sort_values("event_id").reset_index(drop=True)
    # pid 2 holds 2000-2599: 2400-2599 match (100 base + 100 delta rows)
    assert len(got) == 200
    assert got["event_id"].min() == 2400 and got["event_id"].max() == 2599

    # pruning skipped 3 of 4 partitions (assert via the pure helper)
    from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
        prune_files_by_stats,
    )

    kept_pids = [
        pid
        for pid in range(4)
        if prune_files_by_stats(
            man.partitions[pid] + man.deltas[pid], man.file_stats, where
        )
    ]
    assert kept_pids == [2]
