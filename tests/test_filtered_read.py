"""Filtered reads: read_target(where=[[col, op, lit], ...]) — pushed
into the parquet scan on the no-delta fast path (row-group stats
pruning), applied post-LWW on the merge-on-read path (pre-LWW filtering
could resurrect an older version of a key whose winner doesn't match)."""

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
    read_target,
)
from arcane_stream_sqlserver_change_tracking_ray.stages.maintenance import (
    run_maintenance,
)
from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
    ManifestLog,
    prepare_watermark,
)


def replay(ct, tgt, merge_mode="mor"):
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = StreamContext.from_dict(
        {
            "source": {"ctlog_dir": ct, "key_columns": ["url"]},
            "sink": {"target_root": tgt, "num_partitions": 4, "merge_mode": merge_mode},
            "throughput": {"rows_per_group": 200},
            "maintenance": {"enabled": False},
        }
    )
    StreamRunner(ctx).run()
    return ctx


def _want(ct, lang):
    exp = expected_final_state(ct)
    return exp.filter(pc.equal(exp["lang"], lang))


def test_where_on_merge_on_read_path(tmp_lake):
    ct, tgt, _ = tmp_lake
    replay(ct, tgt)
    assert any(ManifestLog(tgt).latest().deltas.values())  # really MoR
    lang = expected_final_state(ct)["lang"][0].as_py()
    want = _want(ct, lang)
    got = read_target(tgt, where=[["lang", "==", lang]])
    assert got.count() == want.num_rows
    # a filter column NOT in the projection still works (union-read)
    slim = read_target(tgt, columns=["url", "text"], where=[["lang", "==", lang]])
    t = slim.take_all()
    assert len(t) == want.num_rows
    assert set(t[0].keys()) == {"url", "text"}


def test_where_on_fast_path_equals_mor_path(tmp_lake):
    ct, tgt, _ = tmp_lake
    ctx = replay(ct, tgt)
    lang = expected_final_state(ct)["lang"][0].as_py()
    mor = sorted(
        r["url"] for r in read_target(tgt, where=[["lang", "==", lang]]).take_all()
    )
    run_maintenance(ManifestLog(tgt), ctx)  # fold: no deltas left
    assert not any(ManifestLog(tgt).latest().deltas.values())
    fast = sorted(
        r["url"] for r in read_target(tgt, where=[["lang", "==", lang]]).take_all()
    )
    assert fast == mor == sorted(_want(ct, lang)["url"].to_pylist())
    # pushdown + projection + drop_meta compose
    slim = read_target(
        tgt, columns=["url"], where=[["lang", "==", lang]], drop_meta=True
    ).take_all()
    assert sorted(r["url"] for r in slim) == fast


def test_where_composes_with_pending_deletes(tmp_lake):
    ct, tgt, _ = tmp_lake
    replay(ct, tgt)
    exp = expected_final_state(ct)
    lang = exp["lang"][0].as_py()
    want = _want(ct, lang)
    doomed = want["url"].to_pylist()[:3]
    delete_keys(tgt, doomed)
    got = read_target(tgt, where=[["lang", "==", lang]])
    assert got.count() == want.num_rows - len(doomed)


def test_float_literal_on_int_column_matches_both_paths(tmp_lake):
    """A float literal on an int64 column must NOT truncate (10.5 -> 10)
    on the MoR path: both paths must evaluate v < X+0.5 ≡ v <= X."""
    ct, tgt, _ = tmp_lake
    ctx = replay(ct, tgt)
    exp = expected_final_state(ct)
    versions = sorted(exp["sys_change_version"].to_pylist())
    cut = versions[len(versions) // 2]  # a version that exists
    want = sum(1 for v in versions if v <= cut)
    assert want > sum(1 for v in versions if v < cut)  # boundary bites
    pred = [["sys_change_version", "<", cut + 0.5]]
    assert read_target(tgt, where=pred).count() == want  # MoR path
    run_maintenance(ManifestLog(tgt), ctx)
    assert read_target(tgt, where=pred).count() == want  # pushdown path


def test_optimize_preserves_sorted_by(tmp_lake):
    """The fold re-sorts compacted base files per the table's sortedBy
    property — the row-group min/max locality the `where` pushdown
    prunes with would otherwise degrade after every OPTIMIZE."""
    import os

    import pyarrow.parquet as pq

    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = StreamContext.from_dict(
        {
            "source": {"ctlog_dir": ct, "key_columns": ["url"]},
            "sink": {
                "target_root": tgt,
                "num_partitions": 4,
                "merge_mode": "mor",
                "sorted_by": ["url"],
            },
            "throughput": {"rows_per_group": 200},
            "maintenance": {"enabled": False},
        }
    )
    StreamRunner(ctx).run()
    run_maintenance(ManifestLog(tgt), ctx)
    m = ManifestLog(tgt).latest()
    assert not any(m.deltas.values())
    checked = 0
    for files in m.partitions.values():
        for rel in files:
            col = pq.read_table(os.path.join(tgt, rel), columns=["url"])["url"]
            vals = col.to_pylist()
            assert vals == sorted(vals), rel
            checked += 1
    assert checked > 0


def test_timestamp_predicates_work_on_all_paths(tmp_lake):
    """Epoch-int literals on a timestamp[us] column have no promoting
    compare kernel — the literal must be cast to the column type, not
    brick every reader (regression: retention-style deletes)."""
    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
        delete_where,
        read_target_table,
    )

    ct, tgt, _ = tmp_lake
    ctx = replay(ct, tgt)
    exp = expected_final_state(ct)
    ts = sorted(t.value for t in exp["warc_ts"])  # epoch micros ints
    cutoff = ts[len(ts) // 2]
    want = sum(1 for v in ts if v >= cutoff)
    assert 0 < want < len(ts)
    # filtered read, MoR path then pushdown path
    pred = [["warc_ts", ">=", cutoff]]
    assert read_target(tgt, where=pred).count() == want
    run_maintenance(ManifestLog(tgt), ctx)
    assert read_target(tgt, where=pred).count() == want
    # retention delete on the timestamp column
    delete_where(tgt, [["warc_ts", "<", cutoff]])
    assert read_target_table(tgt).num_rows == want


def test_where_validation(tmp_lake):
    ct, tgt, _ = tmp_lake
    replay(ct, tgt)
    with pytest.raises(ValueError, match="unknown column"):
        read_target(tgt, where=[["nope", "==", 1]])
    with pytest.raises(ValueError, match="unsupported predicate op"):
        read_target(tgt, where=[["lang", "like", "en"]])
