"""Merge-on-read predicate deletes (K9): DELETE FROM target WHERE
<conjunction> as one O(1) manifest commit, applied by every reader,
point-in-time vs later upserts, physically erased (and cleared) by the
materialize_deletes maintenance action."""

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
    delete_where,
    lookup_keys,
    read_change_feed_table,
    read_target,
    read_target_table,
)
from arcane_stream_sqlserver_change_tracking_ray.stages.maintenance import (
    materialize_deletes,
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


def _minus_lang(tbl: pa.Table, lang: str) -> pa.Table:
    return tbl.filter(pc.not_equal(tbl["lang"], lang))


def test_delete_where_filters_all_read_paths(tmp_lake):
    ct, tgt, _ = tmp_lake
    ctx = replay(ct, tgt)
    exp = expected_final_state(ct)
    lang = exp["lang"][0].as_py()  # a lang with live rows
    out = delete_where(tgt, [["lang", "==", lang]])
    assert out["predicates"] == 1

    want = _minus_lang(exp, lang)
    assert want.num_rows < exp.num_rows  # the delete actually bites
    assert_tables_equal(read_target_table(tgt), want)
    # lazy Dataset read path agrees (and prunes through predicates)
    ds = read_target(tgt, columns=["url", "text", "lang"])
    assert ds.count() == want.num_rows
    # point lookups: a deleted key vanishes, others survive
    deleted_urls = exp.filter(pc.equal(exp["lang"], lang))["url"].to_pylist()
    kept_urls = want["url"].to_pylist()
    assert lookup_keys(tgt, [deleted_urls[0]]).num_rows == 0
    assert lookup_keys(tgt, [kept_urls[0]]).num_rows == 1


def test_delete_is_point_in_time_vs_later_upserts(tmp_lake):
    """A key matching the predicate but re-upserted AFTER the delete
    commit must survive (SQL DELETE-then-INSERT semantics)."""
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = make_ctx(ct, tgt)
    StreamRunner(ctx).run(max_cycles=2)  # partial replay
    exp_partial = read_target_table(tgt)
    lang = exp_partial["lang"][0].as_py()
    delete_where(tgt, [["lang", "==", lang]])
    assert read_target_table(tgt).filter(
        pc.equal(read_target_table(tgt)["lang"], lang)
    ).num_rows == 0
    StreamRunner(ctx).run()  # drain the rest: later versions re-upsert

    final = read_target_table(tgt)
    oracle = expected_final_state(ct).to_pandas().set_index("url")
    got = final.to_pandas().set_index("url")
    wm_delete = exp_partial  # rows as of the delete
    cut = wm_delete.to_pandas().set_index("url")
    for url, row in oracle.iterrows():
        version = row["sys_change_version"]
        deleted_at_cut = (
            url in cut.index
            and cut.loc[url, "lang"] == lang
            and version <= cut.loc[url, "sys_change_version"]
        )
        if deleted_at_cut:
            assert url not in got.index, url
        else:
            assert url in got.index, url
            assert got.loc[url, "text"] == row["text"]


def test_materialize_deletes_erases_bytes_and_clears_predicates(tmp_lake):
    ct, tgt, _ = tmp_lake
    ctx = replay(ct, tgt)
    exp = expected_final_state(ct)
    lang = exp["lang"][0].as_py()
    delete_where(tgt, [["lang", "==", lang]])
    before = read_target_table(tgt)

    out = materialize_deletes(ManifestLog(tgt), ctx)
    assert out["materialized"] == 1
    m = ManifestLog(tgt).latest()
    assert m.delete_predicates == []
    assert not m.deltas  # folded too
    assert_tables_equal(read_target_table(tgt), before)
    # PHYSICAL erasure: the live files contain no matching row at all
    for rel in sorted(m.all_files()):
        t = pq.read_table(os.path.join(tgt, rel), columns=["lang"])
        assert pc.sum(pc.cast(pc.equal(t["lang"], lang), pa.int64())).as_py() in (0, None)
    # idempotent no-op afterwards
    assert materialize_deletes(ManifestLog(tgt), ctx) == {"materialized": 0}


def test_optimize_keeps_predicates_applicable(tmp_lake):
    """The regular OPTIMIZE fold neither applies nor drops predicates —
    folded base rows keep their version column so reads stay correct."""
    ct, tgt, _ = tmp_lake
    ctx = replay(ct, tgt)
    exp = expected_final_state(ct)
    lang = exp["lang"][0].as_py()
    delete_where(tgt, [["lang", "==", lang]])
    want = _minus_lang(exp, lang)
    run_maintenance(ManifestLog(tgt), ctx)
    m = ManifestLog(tgt).latest()
    assert len(m.delete_predicates) == 1  # survived the fold
    assert_tables_equal(read_target_table(tgt), want)


def test_change_feed_refuses_to_cross_predicate_delete(tmp_lake):
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = make_ctx(ct, tgt)
    StreamRunner(ctx).run(max_cycles=2)
    v_before = ManifestLog(tgt).latest().version
    lang = read_target_table(tgt)["lang"][0].as_py()
    delete_where(tgt, [["lang", "==", lang]])
    v_delete = ManifestLog(tgt).latest().version
    StreamRunner(ctx).run()

    with pytest.raises(ValueError, match="predicate-delete"):
        read_change_feed_table(tgt, from_version=v_before)
    # baselined at the delete commit it works (predicates equal both ends)
    feed = read_change_feed_table(tgt, from_version=v_delete)
    assert feed.num_rows > 0


def test_delete_where_validation(tmp_lake):
    ct, tgt, _ = tmp_lake
    replay(ct, tgt)
    with pytest.raises(ValueError, match="unknown column"):
        delete_where(tgt, [["nope", "==", 1]])
    with pytest.raises(ValueError, match="unsupported predicate op"):
        delete_where(tgt, [["lang", "~", "en"]])
    with pytest.raises(ValueError, match="at least one"):
        delete_where(tgt, [])
