"""Change-data-feed reads (net row-level changes between two snapshots).

The sink-side analog of the very feed the reference consumes upstream:
SQL Server ``CHANGETABLE(CHANGES t, @from)`` with net semantics — one
row per key changed in ``(from, to]``, classified insert / update /
delete, keys created-and-deleted inside the range netting out.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
from arcane_stream_sqlserver_change_tracking_ray.gen import (
    segment_path,
    small_spec,
    write_ctlog,
)
from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
    StreamRunner,
    read_change_feed,
    read_change_feed_table,
    read_target_table,
)
from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
    ManifestLog,
    prepare_watermark,
)


def _seg(ct, lo, rows):
    """Write one CT segment with rows [(url, version, op, value), ...]."""
    os.makedirs(ct, exist_ok=True)
    tbl = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "sys_change_version": pa.array([r[1] for r in rows], pa.int64()),
            "sys_change_operation": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, segment_path(ct, lo, max(r[1] for r in rows)))


def _ctx(ct, tgt, rows):
    return StreamContext.from_dict(
        {
            "source": {"ctlog_dir": ct, "key_columns": ["url"]},
            "sink": {"target_root": tgt, "num_partitions": 4},
            "throughput": {"rows_per_group": rows},
            "maintenance": {"enabled": False},
        }
    )


def test_change_feed_classifies(tmp_lake):
    """Hand-planted insert / update / delete / net-no-op / untouched."""
    ct, tgt, _ = tmp_lake
    # cycle 1: a,b,c,d born (v1-4)
    _seg(ct, 0, [("a", 1, "U", 10), ("b", 2, "U", 20), ("c", 3, "U", 30), ("d", 4, "U", 40)])
    # cycle 2: a updated, b deleted, e inserted, f inserted
    _seg(ct, 4, [("a", 5, "U", 11), ("b", 6, "D", 0), ("e", 7, "U", 50), ("f", 8, "U", 60)])
    # cycle 3: f deleted (born + dead inside the range -> net no-op)
    _seg(ct, 8, [("f", 9, "D", 0)])
    prepare_watermark(tgt, 0, num_partitions=4)
    StreamRunner(_ctx(ct, tgt, rows=4)).run()
    versions = ManifestLog(tgt).versions()
    assert len(versions) == 4  # v0 + 3 cycles

    feed = read_change_feed_table(tgt, from_version=versions[1])
    got = {
        r["url"]: (r["change_type"], r["sys_change_version"], r["value"])
        for r in feed.to_pylist()
    }
    assert got == {
        "a": ("update", 5, 11),
        "b": ("delete", 6, 0),  # version = the deleting change's version
        "e": ("insert", 7, 50),
    }  # c, d untouched; f netted out

    # bounded upper version: only cycle 2's changes, f still visible as insert
    feed2 = read_change_feed_table(tgt, from_version=versions[1], to_version=versions[2])
    got2 = {r["url"]: r["change_type"] for r in feed2.to_pylist()}
    assert got2 == {"a": "update", "b": "delete", "e": "insert", "f": "insert"}

    # Dataset variant agrees with the driver-side table
    ds = read_change_feed(tgt, from_version=versions[1])
    assert sorted(ds.take_all(), key=lambda r: r["url"]) == sorted(
        feed.to_pylist(), key=lambda r: r["url"]
    )

    # empty range -> empty feed with the right schema
    empty = read_change_feed_table(tgt, from_version=versions[-1])
    assert empty.num_rows == 0 and "change_type" in empty.column_names

    # all-changes mode: every persisted change row in the range, the
    # logged op surfaced as-is (f appears twice: its upsert AND delete)
    allf = read_change_feed_table(tgt, from_version=versions[1], net=False)
    got_all = sorted(
        (r["url"], r["sys_change_version"], r["change_type"])
        for r in allf.to_pylist()
    )
    assert got_all == [
        ("a", 5, "update"),
        ("b", 6, "delete"),
        ("e", 7, "update"),
        ("f", 8, "update"),
        ("f", 9, "delete"),
    ]
    with pytest.raises(ValueError, match="net=True"):
        read_change_feed_table(
            tgt, from_version=versions[1], net=False, pre_image_columns=("value",)
        )

    # pre-images: FROM-snapshot values for update/delete, null for insert
    pre = read_change_feed_table(
        tgt, from_version=versions[1], pre_image_columns=("value",)
    )
    got_pre = {r["url"]: r["pre_value"] for r in pre.to_pylist()}
    assert got_pre == {"a": 10, "b": 20, "e": None}
    empty_pre = read_change_feed_table(
        tgt, from_version=versions[-1], pre_image_columns=("value",)
    )
    assert "pre_value" in empty_pre.column_names and empty_pre.num_rows == 0


def test_change_feed_delete_reinsert_patterns(tmp_lake):
    """Tombstone churn: delete-then-reinsert inside the range is an
    UPDATE (key alive at FROM), reinsert of a key dead at FROM is an
    INSERT, and a tombstone for a never-alive key stays invisible."""
    ct, tgt, _ = tmp_lake
    # cycle 1 (the FROM snapshot): a, b live; c only ever a tombstone
    _seg(ct, 0, [("a", 1, "U", 1), ("b", 2, "U", 2), ("c", 3, "D", 0)])
    # cycle 2: a deleted then reinserted; b deleted; c (re)inserted
    _seg(ct, 3, [("a", 4, "D", 0), ("a", 5, "U", 11), ("b", 6, "D", 0), ("c", 7, "U", 30)])
    prepare_watermark(tgt, 0, num_partitions=4)
    StreamRunner(_ctx(ct, tgt, rows=3)).run()
    versions = ManifestLog(tgt).versions()
    feed = read_change_feed_table(tgt, from_version=versions[1])
    got = {
        r["url"]: (r["change_type"], r["sys_change_version"]) for r in feed.to_pylist()
    }
    assert got == {
        "a": ("update", 5),  # delete+reinsert nets to the reinsert
        "b": ("delete", 6),
        "c": ("insert", 7),  # its FROM-side tombstone never made it alive
    }


def test_change_feed_matches_snapshot_diff(tmp_lake):
    """On a generated multi-cycle stream, the delta-sourced feed must
    equal the brute-force diff of the two full snapshots."""
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, 0, num_partitions=8)
    StreamRunner(_ctx(ct, tgt, rows=300)).run()
    versions = ManifestLog(tgt).versions()
    assert len(versions) >= 4
    v_from, v_to = versions[1], versions[-1]

    feed = read_change_feed_table(tgt, from_version=v_from, to_version=v_to)
    got = {r["url"]: r["change_type"] for r in feed.to_pylist()}

    def snap(v):
        t = read_target_table(tgt, drop_meta=False, version=v)
        return {
            r["url"]: r["sys_change_version"] for r in t.to_pylist()
        }

    a, b = snap(v_from), snap(v_to)
    exp = {}
    for k in b:
        if k not in a:
            exp[k] = "insert"
        elif b[k] != a[k]:
            exp[k] = "update"
    wm_from = ManifestLog(tgt).read(v_from).watermark
    # deletes: alive at FROM, gone at TO
    for k in a:
        if k not in b:
            exp[k] = "delete"
    assert got == exp
    assert feed.num_rows > 0
    # every change's version postdates the FROM watermark
    assert all(v > wm_from for v in feed["sys_change_version"].to_pylist())


def test_change_feed_incremental_matview(tmp_lake):
    """The CDC-consumer contract: matview@FROM + apply/retract from the
    pre-imaged feed == full recompute@TO (per-lang row counts)."""
    import collections

    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, 0, num_partitions=8)
    StreamRunner(_ctx(ct, tgt, rows=300)).run()
    versions = ManifestLog(tgt).versions()
    v_from, v_to = versions[1], versions[-1]
    mv = collections.Counter(
        read_target_table(tgt, version=v_from)["lang"].to_pylist()
    )
    feed = read_change_feed_table(
        tgt, v_from, v_to, pre_image_columns=("lang",)
    )
    assert feed.num_rows > 0
    for r in feed.to_pylist():
        if r["change_type"] in ("insert", "update"):
            mv[r["lang"]] += 1
        if r["change_type"] in ("update", "delete"):
            mv[r["pre_lang"]] -= 1  # deletes null payload; pre-image carries it
    want = collections.Counter(
        read_target_table(tgt, version=v_to)["lang"].to_pylist()
    )
    assert {k: v for k, v in mv.items() if v} == dict(want)


def test_change_feed_across_schema_migration(tmp_lake):
    """A range spanning an additive migration: the feed carries the TO
    schema; changes persisted before the column existed read back null."""
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec(add_column_at=500))
    prepare_watermark(tgt, 0, num_partitions=8)
    StreamRunner(_ctx(ct, tgt, rows=250)).run()
    versions = ManifestLog(tgt).versions()
    # all-changes mode: every persisted row in range appears, so both
    # sides of the migration boundary are guaranteed represented
    feed = read_change_feed_table(tgt, from_version=versions[1], net=False)
    assert "title" in feed.column_names
    rows = [r for r in feed.to_pylist() if r["change_type"] != "delete"]
    pre = [r for r in rows if r["sys_change_version"] < 500]
    post = [r for r in rows if r["sys_change_version"] >= 500]
    assert pre and post  # the range really spans the migration
    assert all(r["title"] is None for r in pre)
    assert all(r["title"] is not None for r in post)


def test_change_feed_rejects_cow_history(tmp_lake):
    """Copy-on-write snapshots carry no row-level change history — the
    reader must refuse rather than fabricate a diff."""
    ct, tgt, _ = tmp_lake
    _seg(ct, 0, [("a", 1, "U", 1), ("b", 2, "U", 2)])
    _seg(ct, 2, [("a", 3, "U", 9)])
    prepare_watermark(tgt, 0, num_partitions=4)
    ctx = StreamContext.from_dict(
        {
            "source": {"ctlog_dir": ct, "key_columns": ["url"]},
            "sink": {"target_root": tgt, "num_partitions": 4, "mergeMode": "cow"},
            "throughput": {"rows_per_group": 2},
            "maintenance": {"enabled": False},
        }
    )
    StreamRunner(ctx).run()
    versions = ManifestLog(tgt).versions()
    with pytest.raises(ValueError, match="delta history"):
        read_change_feed_table(tgt, from_version=versions[1])


def test_advance_matview_unit():
    """Library IVM operator: planted feed with a group MOVE, a delete,
    an insert, and a value change — exact (n, cents) outcome."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.incremental import (
        advance_matview,
    )

    mv = pa.table(  # base view: x has 2 rows / 300c, y has 1 row / 50c
        {
            "group": pa.array(["x", "y"]),
            "dn": pa.array([2, 1], pa.int64()),
            "dv": pa.array([30000, 5000], pa.int64()),
        }
    )
    feed = pa.table(
        {
            "change_type": pa.array(["update", "delete", "insert", "update"]),
            "grp": pa.array(["y", None, "z", "x"]),  # row 1 MOVES x -> y
            "val": pa.array([100.0, None, 7.5, 2.25], pa.float64()),
            "pre_grp": pa.array(["x", "y", None, "x"]),
            "pre_val": pa.array([100.0, 50.0, None, 1.0], pa.float64()),
        }
    )
    out = advance_matview(mv, feed, "grp", "val")
    got = {
        r["group"]: (r["dn"], r["dv"]) for r in out.to_pylist()
    }
    assert got == {
        # x: row moved out (-1, -10000); in-place value update -100 +225
        "x": (1, 30000 - 10000 - 100 + 225),
        # y: its old row deleted (-1, -5000); the moved row arrives
        "y": (1, 5000 - 5000 + 10000),
        "z": (1, 750),  # fresh insert
    }


def test_change_feed_expired_lookback_refused(tmp_lake):
    """Feeds can only look back over RETAINED versions: once
    expire_versions drops the from_version manifest, the read fails
    loudly instead of fabricating a partial diff."""
    ct, tgt, _ = tmp_lake
    _seg(ct, 0, [("a", 1, "U", 1), ("b", 2, "U", 2)])
    _seg(ct, 2, [("a", 3, "U", 9), ("c", 4, "U", 4)])
    _seg(ct, 4, [("b", 5, "U", 7)])
    prepare_watermark(tgt, 0, num_partitions=4)
    StreamRunner(_ctx(ct, tgt, rows=2)).run()
    log = ManifestLog(tgt)
    v1 = log.versions()[1]
    log.expire_versions(keep=2)
    assert v1 not in log.versions()
    with pytest.raises(ValueError, match="unknown from_version"):
        read_change_feed_table(tgt, from_version=v1)
    # retained range still works
    vs = log.versions()
    assert read_change_feed_table(tgt, from_version=vs[0]).num_rows > 0


def test_change_feed_survives_optimize(tmp_lake):
    """An OPTIMIZE fold inside the range removes delta files from the
    LATEST manifest but not from history — the feed still resolves from
    the per-cycle manifests (expire_versions is what limits lookback)."""
    from arcane_stream_sqlserver_change_tracking_ray.stages.maintenance import (
        run_maintenance,
    )

    ct, tgt, _ = tmp_lake
    _seg(ct, 0, [("a", 1, "U", 10), ("b", 2, "U", 20)])
    _seg(ct, 2, [("a", 3, "U", 11), ("c", 4, "U", 30)])
    prepare_watermark(tgt, 0, num_partitions=4)
    StreamRunner(_ctx(ct, tgt, rows=2)).run()
    versions = ManifestLog(tgt).versions()
    run_maintenance(
        ManifestLog(tgt),
        StreamContext.from_dict(
            {
                "source": {"ctlog_dir": ct, "key_columns": ["url"]},
                "sink": {"target_root": tgt, "num_partitions": 4},
                "maintenance": {"maxDeltasPerPartition": 0},
            }
        ),
    )
    latest = ManifestLog(tgt).latest()
    assert not any(latest.deltas.values())  # folded
    feed = read_change_feed_table(tgt, from_version=versions[1], to_version=versions[2])
    got = {r["url"]: r["change_type"] for r in feed.to_pylist()}
    assert got == {"a": "update", "c": "insert"}
