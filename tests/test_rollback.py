"""Snapshot rollback (K10): one manifest commit restores an old
snapshot's full state (files, schema, watermark); time travel keeps
working across it, the stream self-heals by idempotent LWW
re-application, and the change feed refuses to cross the commit."""

import pyarrow.compute as pc
import pytest

from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
from arcane_stream_sqlserver_change_tracking_ray.gen import (
    expected_final_state,
    small_spec,
    write_ctlog,
)
from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
    StreamRunner,
    delete_keys,
    read_change_feed_table,
    read_target_table,
    rollback_to,
)
from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
    ManifestLog,
    prepare_watermark,
)
from tests.util import assert_tables_equal


def make_ctx(ct, tgt):
    return StreamContext.from_dict(
        {
            "source": {"ctlog_dir": ct, "key_columns": ["url"]},
            "sink": {"target_root": tgt, "num_partitions": 4, "merge_mode": "mor"},
            "throughput": {"rows_per_group": 200},
            "maintenance": {"enabled": False},
        }
    )


def test_rollback_restores_state_and_stream_self_heals(tmp_lake):
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = make_ctx(ct, tgt)
    StreamRunner(ctx).run(max_cycles=2)
    v_good = ManifestLog(tgt).latest().version
    wm_good = ManifestLog(tgt).latest().watermark
    good = read_target_table(tgt)
    StreamRunner(ctx).run()  # the "bad" range we will roll back
    assert ManifestLog(tgt).latest().watermark > wm_good

    out = rollback_to(tgt, v_good)
    assert out["watermark"] == wm_good
    m = ManifestLog(tgt).latest()
    assert m.version == out["new_version"] and m.watermark == wm_good
    assert_tables_equal(read_target_table(tgt), good)
    # time travel into the rolled-back range still works (linear history)
    assert read_target_table(tgt, version=v_good).num_rows == good.num_rows

    # the stream re-polls from the restored watermark; LWW re-application
    # is idempotent, so the final state matches the oracle exactly
    StreamRunner(ctx).run()
    assert_tables_equal(read_target_table(tgt), expected_final_state(ct))


def test_rollback_validation(tmp_lake):
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = make_ctx(ct, tgt)
    StreamRunner(ctx).run(max_cycles=2)
    cur = ManifestLog(tgt).latest().version
    with pytest.raises(ValueError, match="not older"):
        rollback_to(tgt, cur)
    with pytest.raises(ValueError, match="not older"):
        rollback_to(tgt, cur + 5)


def test_rollback_restores_pending_deletes_too(tmp_lake):
    """The rolled-back state includes pending equality deletes — the
    snapshot is restored WHOLE, not just its file map."""
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = make_ctx(ct, tgt)
    StreamRunner(ctx).run()
    exp = expected_final_state(ct)
    doomed = exp["url"].to_pylist()[:5]
    delete_keys(tgt, doomed)
    v_del = ManifestLog(tgt).latest().version
    from arcane_stream_sqlserver_change_tracking_ray.stages.maintenance import (
        materialize_deletes,
    )

    materialize_deletes(ManifestLog(tgt), ctx)
    assert ManifestLog(tgt).latest().key_deletes == {}
    rollback_to(tgt, v_del)
    m = ManifestLog(tgt).latest()
    assert m.key_deletes  # pending again
    got = read_target_table(tgt)
    assert got.num_rows == exp.num_rows - len(doomed)


def test_change_feed_refuses_to_cross_rollback(tmp_lake):
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = make_ctx(ct, tgt)
    StreamRunner(ctx).run(max_cycles=2)
    v_before = ManifestLog(tgt).latest().version
    StreamRunner(ctx).run(max_cycles=1)
    rollback_to(tgt, v_before)
    v_rb = ManifestLog(tgt).latest().version
    StreamRunner(ctx).run()

    with pytest.raises(ValueError, match="rollback"):
        read_change_feed_table(tgt, from_version=v_before)
    feed = read_change_feed_table(tgt, from_version=v_rb)
    assert feed.num_rows > 0
