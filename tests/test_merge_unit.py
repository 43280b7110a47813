"""M1/M2 merge kernel unit tests: LWW, tombstones, stable routing."""

import numpy as np
import pyarrow as pa

from arcane_stream_sqlserver_change_tracking_ray.stages.merge import (
    PrecombineAndRoute,
    drop_tombstones,
    lww_table,
    partition_ids,
    stable_hash,
)
from arcane_stream_sqlserver_change_tracking_ray.types import (
    MERGE_KEY_COL,
    OP_COL,
    PID_COL,
    VERSION_COL,
)


def _t(rows):
    return pa.table(
        {
            MERGE_KEY_COL: [r[0] for r in rows],
            VERSION_COL: pa.array([r[1] for r in rows], pa.int64()),
            OP_COL: [r[2] for r in rows],
        }
    )


def test_lww_picks_max_version_per_key():
    t = _t([("a", 1, "I"), ("a", 3, "U"), ("a", 2, "U"), ("b", 5, "I")])
    out = lww_table(t)
    got = sorted(zip(out[MERGE_KEY_COL].to_pylist(), out[VERSION_COL].to_pylist()))
    assert got == [("a", 3), ("b", 5)]


def test_lww_empty_and_singleton():
    assert lww_table(_t([])).num_rows == 0
    assert lww_table(_t([("a", 1, "I")])).num_rows == 1


def test_tombstones_dropped():
    t = _t([("a", 3, "D"), ("b", 5, "U")])
    out = drop_tombstones(t)
    assert out[MERGE_KEY_COL].to_pylist() == ["b"]


def test_delete_then_reinsert_wins():
    t = _t([("a", 1, "I"), ("a", 2, "D"), ("a", 3, "I")])
    out = drop_tombstones(lww_table(t))
    assert out[VERSION_COL].to_pylist() == [3]


def test_stable_hash_process_stable():
    # pinned values: routing must never change across runs/versions, or
    # committed partition files would be read by the wrong owner
    h = stable_hash(np.array(["https://a/x", "https://b/y"], dtype=object))
    assert h.tolist() == [14245038171000130420, 13612805710151817711]


def test_partition_ids_range_and_determinism():
    keys = pa.array([f"k{i}" for i in range(1000)])
    p1 = partition_ids(keys, 16)
    p2 = partition_ids(keys, 16)
    assert (p1 == p2).all()
    assert p1.min() >= 0 and p1.max() < 16
    # reasonably uniform: every partition hit
    assert len(set(p1.tolist())) == 16


def test_precombine_and_route():
    t = _t([("a", 1, "I"), ("a", 2, "U"), ("b", 3, "I")])
    out = PrecombineAndRoute(4)(t)
    assert out.num_rows == 2  # within-batch LWW collapsed key 'a'
    assert PID_COL in out.column_names


def test_direct_mode_accounts_precombined_rows(tmp_path):
    """The cycle invariant 'every arriving row is accounted'
    (changes_in == rows arriving) must hold in direct MoR mode even when
    the adaptive pre-combine collapses duplicates before routing
    (regression: direct stats once reported combined_away=0 with
    post-combine changes_in, undercounting the cycle)."""
    import ray.data

    from arcane_stream_sqlserver_change_tracking_ray.stages.merge import (
        apply_change_batch_direct,
        fold_stats_into_manifest,
    )
    from arcane_stream_sqlserver_change_tracking_ray.state.manifest import Manifest
    from arcane_stream_sqlserver_change_tracking_ray.types import (
        MERGE_KEY_COL,
        OP_COL,
        VERSION_COL,
    )

    n, keys = 400, 20  # heavy duplication -> combiner collapses a lot
    t = pa.table(
        {
            MERGE_KEY_COL: pa.array([str(i % keys) for i in range(n)]),
            VERSION_COL: pa.array(np.arange(n, dtype=np.int64)),
            OP_COL: pa.array(["U"] * n),
            "v": pa.array(np.arange(n, dtype=np.float64)),
        }
    )
    stats = apply_change_batch_direct(
        ray.data.from_arrow(t).repartition(2),
        target_root=str(tmp_path),
        cycle_id="c1",
        schema=t.schema,
        num_partitions=4,
        hash_algo="polars",
        precombine_threshold=0.0,  # force the combiner on
    )
    m = Manifest(version=1, watermark=0, num_partitions=4)
    metrics = fold_stats_into_manifest(m, stats, "c1")
    assert metrics["precombined_rows"] > 0
    assert metrics["changes_in"] == n
    assert metrics["upserts"] == metrics["changes_in"] - metrics["precombined_rows"]
