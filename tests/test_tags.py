"""Named snapshot tags (K12, Iceberg tag analog): readable by name,
atomically re-pointable, pinned against expire_versions GC."""

import pytest

from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
from arcane_stream_sqlserver_change_tracking_ray.gen import (
    expected_final_state,
    small_spec,
    write_ctlog,
)
from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
    StreamRunner,
    read_target_table,
    rollback_to,
)
from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
    ManifestLog,
    prepare_watermark,
)
from tests.util import assert_tables_equal


def replay(ct, tgt, max_cycles=None):
    ctx = StreamContext.from_dict(
        {
            "source": {"ctlog_dir": ct, "key_columns": ["url"]},
            "sink": {"target_root": tgt, "num_partitions": 4, "merge_mode": "mor"},
            "throughput": {"rows_per_group": 200},
            "maintenance": {"enabled": False},
        }
    )
    StreamRunner(ctx).run(max_cycles=max_cycles)
    return ctx


def test_tag_read_retag_delete(tmp_lake):
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    replay(ct, tgt, max_cycles=2)
    log = ManifestLog(tgt)
    v2 = log.set_tag("baseline")  # defaults to latest
    mid = read_target_table(tgt)
    replay(ct, tgt)

    assert log.tags() == {"baseline": v2}
    assert_tables_equal(read_target_table(tgt, version="baseline"), mid)
    # retag repoints atomically
    log.set_tag("baseline")
    assert log.tags()["baseline"] == log.latest().version
    assert_tables_equal(
        read_target_table(tgt, version="baseline"), expected_final_state(ct)
    )
    log.delete_tag("baseline")
    with pytest.raises(ValueError, match="unknown tag"):
        read_target_table(tgt, version="baseline")
    with pytest.raises(ValueError, match="unknown tag"):
        log.delete_tag("baseline")


def test_tag_validation(tmp_lake):
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    log = ManifestLog(tgt)
    for bad in ("", "a/b", ".hidden"):
        with pytest.raises(ValueError, match="invalid tag name"):
            log.set_tag(bad)
    with pytest.raises(ValueError, match="unknown version"):
        log.set_tag("t", 999)


def test_change_feed_refuses_gc_gap_behind_pinned_tag(tmp_lake):
    """Tag-pinned GC leaves a HOLE in the version list; a feed
    baselined at the pinned snapshot must refuse rather than walk the
    gap (an expired delete/rollback commit would be silently skipped)."""
    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
        read_change_feed_table,
    )

    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    replay(ct, tgt, max_cycles=1)
    log = ManifestLog(tgt)
    v_tag = log.set_tag("pin")
    replay(ct, tgt)
    expired = log.expire_versions(keep=1)
    assert expired and v_tag in log.versions()
    with pytest.raises(ValueError, match="expired history"):
        read_change_feed_table(tgt, from_version="pin")


def test_lookup_keys_time_travels_by_tag(tmp_lake):
    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
        lookup_keys,
    )

    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    replay(ct, tgt, max_cycles=2)
    log = ManifestLog(tgt)
    log.set_tag("mid")
    mid = read_target_table(tgt).to_pandas().set_index("url")
    replay(ct, tgt)
    final = expected_final_state(ct).to_pandas().set_index("url")
    # a key whose payload changed after the tag
    changed = next(
        u for u in mid.index
        if u in final.index and final.loc[u, "text"] != mid.loc[u, "text"]
    )
    now = lookup_keys(tgt, [changed])
    then = lookup_keys(tgt, [changed], version="mid")
    assert now["text"][0].as_py() == final.loc[changed, "text"]
    assert then["text"][0].as_py() == mid.loc[changed, "text"]
    assert now["text"][0].as_py() != then["text"][0].as_py()


def test_table_history_classifies_commits(tmp_lake):
    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
        delete_keys,
        delete_where,
        table_history,
    )
    from arcane_stream_sqlserver_change_tracking_ray.stages.maintenance import (
        materialize_deletes,
    )

    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = replay(ct, tgt, max_cycles=2)
    urls = read_target_table(tgt)["url"].to_pylist()
    delete_where(tgt, [["lang", "==", "en"]])
    delete_keys(tgt, urls[:2])
    materialize_deletes(ManifestLog(tgt), ctx)
    StreamRunner(ctx).run(max_cycles=1)
    v_good = 2
    rollback_to(tgt, v_good)

    h = table_history(tgt)
    kinds = dict(zip(h["version"].to_pylist(), h["kind"].to_pylist()))
    assert kinds[0] == "bootstrap"
    assert kinds[1] == kinds[2] == "cycle"
    assert kinds[3] == "predicate_delete"
    assert kinds[4] == "equality_delete"
    assert kinds[5] == "maintenance"
    assert kinds[6] == "cycle"
    assert kinds[7] == "rollback"
    # watermark column mirrors the manifest log exactly
    assert h["watermark"].to_pylist() == [
        ManifestLog(tgt).read(v).watermark for v in sorted(kinds)
    ]


def test_table_history_no_bootstrap_after_expiry(tmp_lake):
    """After expire_versions GCs the true bootstrap (v0), the oldest
    surviving commit must NOT inherit the 'bootstrap' label (ADVICE r2:
    the old v == vs[0] test misclassified it)."""
    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
        table_history,
    )

    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    replay(ct, tgt)
    log = ManifestLog(tgt)
    expired = log.expire_versions(keep=2)
    assert 0 in expired  # the true bootstrap is gone
    h = table_history(tgt)
    assert "bootstrap" not in h["kind"].to_pylist()


def test_tagged_snapshot_survives_expiry(tmp_lake):
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    replay(ct, tgt, max_cycles=2)
    log = ManifestLog(tgt)
    v_tagged = log.set_tag("keepme")
    tagged = read_target_table(tgt)
    replay(ct, tgt)

    expired = log.expire_versions(keep=1)
    assert v_tagged not in expired and expired  # GC ran, tag pinned
    assert v_tagged in log.versions()
    assert_tables_equal(read_target_table(tgt, version="keepme"), tagged)
    # rollback accepts the tag name (resolve_ref path)
    rollback_to(tgt, "keepme")
    assert_tables_equal(read_target_table(tgt), tagged)
