"""CDF→CT-log replication bridge: a replica running the unmodified
engine over bridged segments converges to the primary's exact state."""

import pyarrow as pa

from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
from arcane_stream_sqlserver_change_tracking_ray.gen import small_spec, write_ctlog
from arcane_stream_sqlserver_change_tracking_ray.pipelines.replicate import (
    bridge_changes,
    bridged_source_version,
)
from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
    StreamRunner,
    read_target_table,
)
from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
    ManifestLog,
    prepare_watermark,
)
from tests.util import assert_tables_equal


def _ctx(ct, tgt, rows=300, parts=8):
    return StreamContext.from_dict(
        {
            "source": {"ctlog_dir": ct, "key_columns": ["url"]},
            "sink": {"target_root": tgt, "num_partitions": parts},
            "throughput": {"rows_per_group": rows},
            "maintenance": {"enabled": False},
        }
    )


def _table(tgt):
    t = read_target_table(tgt)
    return t.sort_by("url").select(sorted(t.column_names))


def test_replica_converges_incrementally(tmp_path):
    """Primary streams in cycles; the replica is bridged MID-stream and
    again at the end — two incremental hops, exact final equality."""
    src_ct = str(tmp_path / "src_ct")
    src = str(tmp_path / "src")
    rep_ct = str(tmp_path / "rep_ct")
    rep = str(tmp_path / "rep")
    write_ctlog(src_ct, small_spec())
    prepare_watermark(src, 0, num_partitions=8)
    # replica uses a DIFFERENT partition count: replication is logical
    prepare_watermark(rep, 0, num_partitions=4)

    # hop 1: primary applies two cycles, bridge, replica catches up
    StreamRunner(_ctx(src_ct, src)).run(max_cycles=2)
    span1 = bridge_changes(src, rep_ct)
    assert span1 is not None and span1[0] == 0
    StreamRunner(_ctx(rep_ct, rep, parts=4)).run()
    mid_src = _table(src)
    assert_tables_equal(_table(rep), mid_src)

    # hop 2: primary finishes, bridge the remainder only
    StreamRunner(_ctx(src_ct, src)).run()
    span2 = bridge_changes(src, rep_ct)
    assert span2 is not None and span2[0] == span1[1]  # resumes, no overlap
    StreamRunner(_ctx(rep_ct, rep, parts=4)).run()
    assert_tables_equal(_table(rep), _table(src))

    # caught up: bridging again is a no-op
    assert bridge_changes(src, rep_ct) is None
    # bookmark points at the primary's latest applied manifest
    bk = bridged_source_version(src, rep_ct)
    log = ManifestLog(src)
    assert log.read(bk).watermark == log.require_watermark().watermark


def test_bridge_refuses_expired_bookmark(tmp_path):
    """If the primary's retention expired the bookmark manifest, the
    bridge fails loudly instead of silently skipping the gap (which
    would leave the replica tailer waiting on missing versions)."""
    import pytest

    src_ct = str(tmp_path / "src_ct")
    src = str(tmp_path / "src")
    rep_ct = str(tmp_path / "rep_ct")
    write_ctlog(src_ct, small_spec())
    prepare_watermark(src, 0, num_partitions=4)
    StreamRunner(_ctx(src_ct, src, parts=4, rows=200)).run(max_cycles=1)
    assert bridge_changes(src, rep_ct) is not None
    StreamRunner(_ctx(src_ct, src, parts=4, rows=200)).run()
    ManifestLog(src).expire_versions(keep=1)  # bookmark manifest gone
    with pytest.raises(ValueError, match="re-seed the replica"):
        bridge_changes(src, rep_ct)


def test_bridge_carries_deletes_and_nets_out_transients(tmp_path):
    """Deleted keys vanish on the replica; keys born+deleted between
    bridges never reach it at all."""
    import os

    import pyarrow.parquet as pq

    from arcane_stream_sqlserver_change_tracking_ray.gen import segment_path
    from arcane_stream_sqlserver_change_tracking_ray.sources.ctlog import list_segments

    src_ct = str(tmp_path / "src_ct")
    src = str(tmp_path / "src")
    rep_ct = str(tmp_path / "rep_ct")
    rep = str(tmp_path / "rep")
    os.makedirs(src_ct)

    def seg(lo, rows):
        tbl = pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "sys_change_version": pa.array([r[1] for r in rows], pa.int64()),
                "sys_change_operation": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
        pq.write_table(tbl, segment_path(src_ct, lo, max(r[1] for r in rows)))

    seg(0, [("a", 1, "U", 1), ("b", 2, "U", 2)])
    seg(2, [("b", 3, "D", 0), ("c", 4, "U", 4), ("c", 5, "D", 0), ("d", 6, "U", 6)])
    prepare_watermark(src, 0, num_partitions=4)
    prepare_watermark(rep, 0, num_partitions=4)
    StreamRunner(_ctx(src_ct, src, rows=2, parts=4)).run()
    bridge_changes(src, rep_ct)
    # transient key c netted out of the bridged segment entirely
    seg_rows = pq.read_table(list_segments(rep_ct)[0][2])
    assert "c" not in set(seg_rows["url"].to_pylist())
    StreamRunner(_ctx(rep_ct, rep, rows=10, parts=4)).run()
    got = {r["url"]: r["value"] for r in read_target_table(rep).to_pylist()}
    assert got == {"a": 1, "d": 6}  # b deleted, c never existed
