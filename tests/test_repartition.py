"""Partition-spec evolution: re-bucketing a live table from P to P'
(the Iceberg bucket(arcane_merge_key, P) spec-change analog,
docs/crd.md:114-119) must be atomic, preserve the visible LWW state,
fold all pending deltas, keep point lookups pruned correctly under the
new spec, and let streaming continue seamlessly."""

import pytest

from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
from arcane_stream_sqlserver_change_tracking_ray.gen import (
    expected_final_state,
    small_spec,
    write_ctlog,
)
from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
    StreamRunner,
    get_watermark,
    lookup_keys,
    read_change_feed_table,
    read_target_table,
)
from arcane_stream_sqlserver_change_tracking_ray.stages.maintenance import (
    repartition_table,
)
from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
    ManifestLog,
    prepare_watermark,
)
from tests.util import assert_tables_equal


def make_ctx(ct, tgt, **overrides):
    spec = {
        "source": {"ctlog_dir": ct, "key_columns": ["url"]},
        "sink": {"target_root": tgt, "num_partitions": 4, "merge_mode": "mor"},
        "throughput": {"rows_per_group": 200},
        "maintenance": {"enabled": False},
    }
    for sec, vals in overrides.items():
        spec.setdefault(sec, {}).update(vals)
    return StreamContext.from_dict(spec)


def test_repartition_preserves_state_and_folds_deltas(tmp_lake):
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = make_ctx(ct, tgt)
    StreamRunner(ctx).run()
    before = read_target_table(tgt)
    wm = get_watermark(tgt)

    out = repartition_table(ManifestLog(tgt), ctx, 7)  # non-divisor rehash
    assert out["repartitioned"] and out["from"] == 4 and out["to"] == 7

    log = ManifestLog(tgt)
    m = log.latest()
    assert m.num_partitions == 7
    assert not m.deltas  # all pending deltas folded into the new base
    assert set(m.partitions) <= set(range(7))
    assert m.watermark == wm  # watermark untouched
    assert_tables_equal(read_target_table(tgt), before)
    assert_tables_equal(read_target_table(tgt), expected_final_state(ct))


def test_repartition_point_lookup_prunes_under_new_spec(tmp_lake):
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = make_ctx(ct, tgt)
    StreamRunner(ctx).run()
    exp = expected_final_state(ct).to_pandas().set_index("url")
    probe = list(exp.index[:3])

    repartition_table(ManifestLog(tgt), ctx, 9)
    stats = {}
    got = lookup_keys(tgt, probe, stats=stats).to_pandas().set_index("url")
    assert sorted(got.index) == sorted(probe)
    for u in probe:
        assert got.loc[u, "text"] == exp.loc[u, "text"]
    # pruning actually happened: only the probed keys' partitions read
    assert stats.get("files_read", 0) < sum(
        len(v) for v in ManifestLog(tgt).latest().partitions.values()
    )


def test_stream_continues_after_repartition(tmp_lake):
    """Repartition mid-stream: remaining segments route under the new
    spec and the final table still equals the full LWW oracle."""
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = make_ctx(ct, tgt)
    StreamRunner(ctx).run(max_cycles=2)
    assert get_watermark(tgt) < 1000

    repartition_table(ManifestLog(tgt), ctx, 6)
    StreamRunner(ctx).run()  # drain the rest under P=6

    m = ManifestLog(tgt).latest()
    assert m.num_partitions == 6
    assert get_watermark(tgt) == 1000
    assert_tables_equal(read_target_table(tgt), expected_final_state(ct))


def test_change_feed_refuses_to_cross_repartition_boundary(tmp_lake):
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = make_ctx(ct, tgt)
    StreamRunner(ctx).run(max_cycles=2)
    v_before = ManifestLog(tgt).latest().version
    repartition_table(ManifestLog(tgt), ctx, 6)
    StreamRunner(ctx).run()

    with pytest.raises(ValueError, match="repartition"):
        read_change_feed_table(tgt, from_version=v_before)
    # re-baselined from the post-repartition snapshot it works
    v_after = v_before + 1
    feed = read_change_feed_table(tgt, from_version=v_after)
    assert feed.num_rows > 0


def test_change_feed_refuses_repartition_round_trip(tmp_lake):
    """A P->P'->P round trip inside the feed range passes the planner's
    endpoint num_partitions comparison; the appended_deltas walk itself
    must refuse the repartition commits (ADVICE r2: pids collected under
    the intermediate spec resolve prior state against the wrong files)."""
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = make_ctx(ct, tgt)
    StreamRunner(ctx).run(max_cycles=2)
    v_before = ManifestLog(tgt).latest().version
    repartition_table(ManifestLog(tgt), ctx, 6)
    repartition_table(ManifestLog(tgt), ctx, 4)  # back to P=4: endpoints agree
    StreamRunner(ctx).run()

    with pytest.raises(ValueError, match="repartition commit"):
        read_change_feed_table(tgt, from_version=v_before)
    # re-baselined from the post-round-trip snapshot it works
    v_after = v_before + 2
    feed = read_change_feed_table(tgt, from_version=v_after)
    assert feed.num_rows > 0


def test_repartition_noop_and_validation(tmp_lake):
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = make_ctx(ct, tgt)
    StreamRunner(ctx).run(max_cycles=1)
    log = ManifestLog(tgt)
    v = log.latest().version
    assert repartition_table(log, ctx, 4) == {
        "repartitioned": False,
        "num_partitions": 4,
    }
    assert log.latest().version == v  # no-op commits nothing
    with pytest.raises(ValueError, match=">= 1"):
        repartition_table(log, ctx, 0)
