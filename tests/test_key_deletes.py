"""Merge-on-read equality deletes (K9b): DELETE by key set as one
O(|keys|) commit of hash-routed per-partition delete files, applied by
every reader, point-in-time vs later upserts, physically erased (and
cleared) by materialize_deletes; repartition refuses while pending."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
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
    delete_where,
    lookup_keys,
    read_change_feed_table,
    read_target,
    read_target_table,
)
from arcane_stream_sqlserver_change_tracking_ray.stages.maintenance import (
    materialize_deletes,
    repartition_table,
    run_maintenance,
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


def replay(ct, tgt):
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = make_ctx(ct, tgt)
    StreamRunner(ctx).run()
    return ctx


def _minus_urls(tbl: pa.Table, urls: list[str]) -> pa.Table:
    return tbl.filter(pc.invert(pc.is_in(tbl["url"], value_set=pa.array(urls))))


def test_delete_keys_filters_all_read_paths(tmp_lake):
    ct, tgt, _ = tmp_lake
    replay(ct, tgt)
    exp = expected_final_state(ct)
    doomed = exp["url"].to_pylist()[::5]  # every 5th live key
    out = delete_keys(tgt, doomed)
    assert out["keys"] == len(set(doomed))
    assert out["files"] >= 1

    want = _minus_urls(exp, doomed)
    assert want.num_rows == exp.num_rows - len(doomed)
    assert_tables_equal(read_target_table(tgt), want)
    ds = read_target(tgt, columns=["url", "text", "lang"])
    assert ds.count() == want.num_rows
    kept = want["url"][0].as_py()
    assert lookup_keys(tgt, [doomed[0]]).num_rows == 0
    assert lookup_keys(tgt, [kept]).num_rows == 1


def test_delete_keys_is_point_in_time_vs_later_upserts(tmp_lake):
    """A deleted key re-upserted AFTER the delete commit must survive
    with its new payload (SQL DELETE-then-INSERT semantics)."""
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = make_ctx(ct, tgt)
    StreamRunner(ctx).run(max_cycles=2)  # partial replay
    cut = read_target_table(tgt).to_pandas().set_index("url")
    doomed = sorted(cut.index)[::3]
    delete_keys(tgt, doomed)
    assert lookup_keys(tgt, [doomed[0]]).num_rows == 0
    StreamRunner(ctx).run()  # drain: later versions re-upsert some keys

    got = read_target_table(tgt).to_pandas().set_index("url")
    oracle = expected_final_state(ct).to_pandas().set_index("url")
    doomed_set = set(doomed)
    for url, row in oracle.iterrows():
        deleted_at_cut = (
            url in doomed_set
            and url in cut.index
            and row["sys_change_version"] <= cut.loc[url, "sys_change_version"]
        )
        if deleted_at_cut:
            assert url not in got.index, url
        else:
            assert url in got.index, url
            assert got.loc[url, "text"] == row["text"]


def test_materialize_erases_key_deletes_and_clears(tmp_lake):
    ct, tgt, _ = tmp_lake
    ctx = replay(ct, tgt)
    exp = expected_final_state(ct)
    doomed = exp["url"].to_pylist()[:7]
    delete_keys(tgt, doomed)
    before = read_target_table(tgt)

    out = materialize_deletes(ManifestLog(tgt), ctx)
    assert out["materialized"] >= 1
    m = ManifestLog(tgt).latest()
    assert m.key_deletes == {}
    assert not m.deltas
    assert_tables_equal(read_target_table(tgt), before)
    # PHYSICAL erasure from the live base files
    for rel in sorted(m.all_files()):
        t = pq.read_table(os.path.join(tgt, rel), columns=["url"])
        hits = pc.sum(
            pc.cast(pc.is_in(t["url"], value_set=pa.array(doomed)), pa.int64())
        ).as_py()
        assert hits in (0, None), rel
    assert materialize_deletes(ManifestLog(tgt), ctx) == {"materialized": 0}


def test_optimize_keeps_key_deletes_applicable(tmp_lake):
    ct, tgt, _ = tmp_lake
    ctx = replay(ct, tgt)
    exp = expected_final_state(ct)
    doomed = exp["url"].to_pylist()[:5]
    delete_keys(tgt, doomed)
    want = _minus_urls(exp, doomed)
    run_maintenance(ManifestLog(tgt), ctx)
    m = ManifestLog(tgt).latest()
    assert m.key_deletes  # survived the fold
    assert_tables_equal(read_target_table(tgt), want)


def test_null_version_rows_survive_key_deletes():
    """A row with a null version must never be silently deleted by a
    pending key-delete entry (null comparisons are non-matches)."""
    import tempfile

    import pyarrow.parquet as pq

    from arcane_stream_sqlserver_change_tracking_ray.stages.merge import (
        MERGE_KEY_COL,
        VERSION_COL,
        apply_key_deletes,
    )

    with tempfile.TemporaryDirectory() as root:
        pq.write_table(
            pa.table({MERGE_KEY_COL: pa.array(["a", "b"])}),
            f"{root}/del.parquet",
        )
        t = pa.table(
            {
                MERGE_KEY_COL: pa.array(["a", "b", "c"]),
                VERSION_COL: pa.array([5, None, 5], pa.int64()),
            }
        )
        out = apply_key_deletes(
            t, root, [{"file": "del.parquet", "watermark": 10, "cycle": "x"}]
        )
        # 'a' deleted (matched, version<=wm); 'b' KEPT (null version);
        # 'c' kept (not in the delete set)
        assert out[MERGE_KEY_COL].to_pylist() == ["b", "c"]


def test_change_feed_refuses_delete_materialized_inside_range(tmp_lake):
    """A delete committed AND materialized inside the feed range leaves
    both endpoint manifests clean — the walk itself must refuse, or a
    GDPR-erased key with no later CT activity would never emit a DELETE
    event downstream."""
    from arcane_stream_sqlserver_change_tracking_ray.stages.maintenance import (
        materialize_deletes,
    )

    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = make_ctx(ct, tgt)
    StreamRunner(ctx).run(max_cycles=2)
    v_before = ManifestLog(tgt).latest().version
    doomed = read_target_table(tgt)["url"].to_pylist()[:3]
    delete_keys(tgt, doomed)
    materialize_deletes(ManifestLog(tgt), ctx)
    assert ManifestLog(tgt).latest().key_deletes == {}  # endpoints clean
    StreamRunner(ctx).run()

    with pytest.raises(ValueError, match="equality-delete"):
        read_change_feed_table(tgt, from_version=v_before)


def test_change_feed_refuses_to_cross_key_delete(tmp_lake):
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = make_ctx(ct, tgt)
    StreamRunner(ctx).run(max_cycles=2)
    v_before = ManifestLog(tgt).latest().version
    doomed = read_target_table(tgt)["url"].to_pylist()[:3]
    delete_keys(tgt, doomed)
    v_delete = ManifestLog(tgt).latest().version
    StreamRunner(ctx).run()

    with pytest.raises(ValueError, match="equality-delete"):
        read_change_feed_table(tgt, from_version=v_before)
    feed = read_change_feed_table(tgt, from_version=v_delete)
    assert feed.num_rows > 0


def test_repartition_refuses_pending_key_deletes(tmp_lake):
    ct, tgt, _ = tmp_lake
    ctx = replay(ct, tgt)
    doomed = expected_final_state(ct)["url"].to_pylist()[:2]
    delete_keys(tgt, doomed)
    with pytest.raises(ValueError, match="equality-delete"):
        repartition_table(ManifestLog(tgt), ctx, 7)
    # after materialize the spec change goes through
    materialize_deletes(ManifestLog(tgt), ctx)
    out = repartition_table(ManifestLog(tgt), ctx, 7)
    assert out["repartitioned"] is True
    assert (out["from"], out["to"]) == (4, 7)
    assert 0 < out["new_pids"] <= 7
    want = _minus_urls(expected_final_state(ct), doomed)
    assert_tables_equal(read_target_table(tgt), want)


def test_delete_commits_retry_cas_conflicts(tmp_lake, monkeypatch):
    """A delete racing a concurrent commit re-reads the manifest and
    re-stamps at the NEW watermark instead of failing (the delete means
    'as of now' either way)."""
    from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
        CommitConflictError,
        ManifestLog as ML,
    )

    ct, tgt, _ = tmp_lake
    replay(ct, tgt)
    exp = expected_final_state(ct)

    real_commit = ML.commit
    fails = {"n": 2}

    def flaky_commit(self, manifest, expect_version=None):
        if fails["n"] > 0:
            fails["n"] -= 1
            raise CommitConflictError("simulated concurrent commit")
        return real_commit(self, manifest, expect_version=expect_version)

    monkeypatch.setattr(ML, "commit", flaky_commit)
    doomed = exp["url"].to_pylist()[:3]
    out = delete_keys(tgt, doomed)
    assert out["keys"] == 3
    fails["n"] = 2
    delete_where(tgt, [["lang", "==", exp["lang"][0].as_py()]])
    monkeypatch.undo()
    m = ManifestLog(tgt).latest()
    assert m.key_deletes and len(m.delete_predicates) == 1
    # exhausting the budget surfaces the conflict
    fails["n"] = 10**9
    monkeypatch.setattr(ML, "commit", flaky_commit)
    with pytest.raises(CommitConflictError):
        delete_keys(tgt, doomed)


def test_delete_keys_validation_and_nonstring_keys(tmp_lake):
    ct, tgt, _ = tmp_lake
    replay(ct, tgt)
    with pytest.raises(ValueError, match="at least one"):
        delete_keys(tgt, [])
    # a bare string would silently explode into per-character keys
    with pytest.raises(ValueError, match="COLLECTION"):
        delete_keys(tgt, "https://example.com/0")
    # duplicate + null keys collapse; count reflects unique non-null
    exp = expected_final_state(ct)
    u = exp["url"][0].as_py()
    out = delete_keys(tgt, [u, u, None])
    assert out["keys"] == 1
    assert lookup_keys(tgt, [u]).num_rows == 0
