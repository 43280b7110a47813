"""Merge-on-read delta log: cycles write per-partition DELTA files only
(no base rewrite), readers resolve LWW across base+deltas, and the
maintenance OPTIMIZE pass is the fold point.

This is the scale-critical property: partition-granularity copy-on-write
rewrites ~the whole table every cycle once hash routing touches every
partition; MoR makes cycle cost proportional to CYCLE size, not TABLE
size (the reference gets the equivalent from Iceberg MERGE file-level
CoW + maintenance compaction, docs/crd.md:136-172)."""

import os

import pyarrow.parquet as pq

from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
from arcane_stream_sqlserver_change_tracking_ray.gen import (
    expected_final_state,
    small_spec,
    write_ctlog,
    write_snapshot,
)
from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
    StreamRunner,
    get_watermark,
    lookup_keys,
    read_target,
    read_target_table,
)
from arcane_stream_sqlserver_change_tracking_ray.stages.maintenance import run_maintenance
from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
    ManifestLog,
    prepare_watermark,
)
from tests.util import assert_tables_equal


def make_ctx(ct, tgt, snap="", **overrides):
    spec = {
        "source": {"ctlog_dir": ct, "snapshot_dir": snap, "key_columns": ["url"]},
        "sink": {"target_root": tgt, "num_partitions": 4, "merge_mode": "mor"},
        "throughput": {"rows_per_group": 200},
        "maintenance": {"enabled": False},
    }
    for sec, vals in overrides.items():
        spec.setdefault(sec, {}).update(vals)
    return StreamContext.from_dict(spec)


def replay(ct, tgt, **overrides):
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = make_ctx(ct, tgt, **overrides)
    runner = StreamRunner(ctx)
    metrics = runner.run()
    return ctx, metrics


def test_mor_cycles_never_rewrite_base(tmp_lake):
    """After the first cycle establishes deltas, later cycles leave the
    base files untouched and only APPEND delta files."""
    ct, tgt, _ = tmp_lake
    _, metrics = replay(ct, tgt)
    assert len(metrics) >= 4  # 1000 events / 200 per cycle
    log = ManifestLog(tgt)
    m = log.latest()
    # pure-MoR stream: no base files at all, only delta chains
    assert not m.partitions
    assert m.deltas and all(files for files in m.deltas.values())
    # every delta file is tiny (cycle-sized), and one cycle appended at
    # most one file per touched partition
    n_files = sum(len(v) for v in m.deltas.values())
    assert n_files >= len(metrics)  # grew per cycle
    # the final state still equals the LWW oracle
    assert_tables_equal(
        read_target_table(tgt), expected_final_state(ct)
    )
    assert get_watermark(tgt) == 1000


def test_mor_write_amplification_is_cycle_sized(tmp_lake):
    """Bytes written per cycle track the CYCLE's change rows, not the
    table size: the last cycle writes no more bytes than the first
    (under CoW it grows with the accumulated table)."""
    ct, tgt, _ = tmp_lake
    _, metrics = replay(ct, tgt)
    bytes_per_cycle = [m["bytes"] for m in metrics]
    rows_per_cycle = [m["changes_in"] for m in metrics]
    # each cycle has the same nominal change volume; MoR bytes stay flat
    assert max(rows_per_cycle) <= 220
    assert max(bytes_per_cycle) <= 2.0 * min(b for b in bytes_per_cycle if b)


def test_optimize_folds_deltas(tmp_lake):
    """OPTIMIZE resolves base+deltas into fresh base files and clears the
    delta chains; table content is unchanged."""
    ct, tgt, _ = tmp_lake
    ctx, _ = replay(ct, tgt)
    before = read_target_table(tgt)
    out = run_maintenance(ManifestLog(tgt), ctx)
    assert out["optimize"]["folded_deltas"] > 0
    m = ManifestLog(tgt).latest()
    assert not any(m.deltas.values())
    assert m.partitions  # folded into base files
    assert_tables_equal(read_target_table(tgt), before)
    # after the fold the zero-overhead (no-delta) lazy read path serves
    # the same rows
    import pyarrow as pa

    lazy = pa.Table.from_pandas(
        read_target(tgt, drop_meta=True).to_pandas(), preserve_index=False
    )
    assert sorted(lazy["url"].to_pylist()) == sorted(before["url"].to_pylist())


def test_mor_lazy_read_resolves_deltas(tmp_lake):
    """read_target (the lazy Dataset path) resolves deltas per partition
    and supports column pruning."""
    ct, tgt, _ = tmp_lake
    replay(ct, tgt)
    ds = read_target(tgt, columns=["url", "text"], drop_meta=True)
    got = ds.to_pandas().sort_values("url").reset_index(drop=True)
    exp = (
        expected_final_state(ct)
        .select(["url", "text"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got[["url", "text"]], exp)


def test_mor_lookup_keys_resolves_deltas(tmp_lake):
    """Point lookups apply LWW + tombstones across the delta chain: a key
    deleted in a later delta must not resurface from an earlier one."""
    ct, tgt, _ = tmp_lake
    replay(ct, tgt)
    exp = expected_final_state(ct)
    urls = sorted(exp["url"].to_pylist())
    hit = lookup_keys(tgt, [urls[0]], key_col="arcane_merge_key")
    assert hit.num_rows == 1
    assert hit["url"][0].as_py() == urls[0]
    # a key the oracle says is deleted must return no rows
    all_urls = set()
    seg = pq.read_table(sorted(os.path.join(ct, f) for f in os.listdir(ct))[0])
    all_urls = set(seg["url"].to_pylist())
    deleted = sorted(all_urls - set(urls))
    if deleted:
        miss = lookup_keys(tgt, [deleted[0]], key_col="arcane_merge_key")
        assert miss.num_rows == 0


def test_cow_mode_still_supported(tmp_lake):
    """merge_mode='cow' keeps the round-1 behavior: base files rewritten
    per cycle, no deltas, same final table."""
    ct, tgt, _ = tmp_lake
    _, metrics = replay(ct, tgt, sink={"merge_mode": "cow"})
    m = ManifestLog(tgt).latest()
    assert m.partitions and not any(m.deltas.values())
    assert_tables_equal(read_target_table(tgt), expected_final_state(ct))


def test_cow_cycle_folds_pending_deltas(tmp_lake):
    """Switching a stream from mor to cow mid-flight folds pending deltas
    for the partitions the CoW cycle touches (the rewrite replaces the
    partition's visible state wholesale)."""
    ct, tgt, _ = tmp_lake
    stage = ct + "_all"
    write_ctlog(stage, small_spec())
    segs = sorted(os.listdir(stage))
    os.makedirs(ct)
    import shutil

    for s in segs[:3]:
        shutil.copy(os.path.join(stage, s), os.path.join(ct, s))
    prepare_watermark(tgt, version=0, num_partitions=4)
    StreamRunner(make_ctx(ct, tgt)).run()  # mor cycles -> deltas
    assert any(ManifestLog(tgt).latest().deltas.values())
    for s in segs[3:]:
        shutil.copy(os.path.join(stage, s), os.path.join(ct, s))
    StreamRunner(make_ctx(ct, tgt, sink={"merge_mode": "cow"})).run()
    m = ManifestLog(tgt).latest()
    # the tail cycles touched (with P=4 and this corpus) every partition,
    # folding all deltas into fresh base files
    assert not any(m.deltas.values())
    assert_tables_equal(read_target_table(tgt), expected_final_state(stage))


def test_mor_backfill_merge_converges(tmp_lake):
    """Merge-behavior backfill under mor: snapshot lands as a delta, the
    convergence replay still produces the oracle row set."""
    ct, tgt, snap = tmp_lake
    ctx, _ = replay(ct, tgt, snap=snap)
    before = read_target_table(tgt)
    write_snapshot(ct, snap, at_version=600)
    bf = make_ctx(ct, tgt, snap=snap, stream_mode={"backfill": True, "backfill_id": "m1",
                                                   "backfill_behavior": "merge"})
    StreamRunner(bf).run_backfill()
    assert_tables_equal(
        read_target_table(tgt).drop_columns(["sys_change_version"]),
        before.drop_columns(["sys_change_version"]),
    )


def test_backfill_merge_snapshot_ahead_of_watermark(tmp_lake):
    """ADVICE regression: merge-backfill from a snapshot NEWER than the
    watermark must apply delete events in (watermark, stamp] — rows
    deleted in the gap may not survive as phantoms."""
    ct, tgt, snap = tmp_lake
    stage = ct + "_all"
    write_ctlog(stage, small_spec())
    segs = sorted(os.listdir(stage))
    os.makedirs(ct)
    import shutil

    # stream only the first fifth of the feed (watermark = 200)
    shutil.copy(os.path.join(stage, segs[0]), os.path.join(ct, segs[0]))
    prepare_watermark(tgt, version=0, num_partitions=4)
    StreamRunner(make_ctx(ct, tgt, snap=snap)).run()
    assert get_watermark(tgt) == 200
    # the full feed is now visible (so the gap replay can read it), and a
    # snapshot taken at v600 is merge-backfilled in
    for s in segs[1:]:
        shutil.copy(os.path.join(stage, s), os.path.join(ct, s))
    write_snapshot(stage, snap, at_version=600)
    bf = make_ctx(ct, tgt, snap=snap, stream_mode={"backfill": True, "backfill_id": "f1",
                                                   "backfill_behavior": "merge"})
    StreamRunner(bf).run_backfill()
    assert get_watermark(tgt) == 600
    got = read_target_table(tgt).drop_columns(["sys_change_version"])
    exp = expected_final_state(stage, upto_version=600).drop_columns(["sys_change_version"])
    # without the forward gap replay, rows deleted in (200, 600] survive
    # as phantoms and this comparison fails with extra rows
    assert_tables_equal(got, exp)


def test_cow_backfill_merge_snapshot_ahead_of_watermark(tmp_lake):
    """Same regression under cow mode."""
    ct, tgt, snap = tmp_lake
    stage = ct + "_all"
    write_ctlog(stage, small_spec())
    segs = sorted(os.listdir(stage))
    os.makedirs(ct)
    import shutil

    shutil.copy(os.path.join(stage, segs[0]), os.path.join(ct, segs[0]))
    prepare_watermark(tgt, version=0, num_partitions=4)
    StreamRunner(make_ctx(ct, tgt, snap=snap, sink={"merge_mode": "cow"})).run()
    for s in segs[1:]:
        shutil.copy(os.path.join(stage, s), os.path.join(ct, s))
    write_snapshot(stage, snap, at_version=600)
    bf = make_ctx(ct, tgt, snap=snap, sink={"merge_mode": "cow"},
                  stream_mode={"backfill": True, "backfill_id": "f2",
                               "backfill_behavior": "merge"})
    StreamRunner(bf).run_backfill()
    got = read_target_table(tgt).drop_columns(["sys_change_version"])
    exp = expected_final_state(stage, upto_version=600).drop_columns(["sys_change_version"])
    assert_tables_equal(got, exp)
