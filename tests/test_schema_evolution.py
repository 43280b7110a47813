"""E1 schema-evolution scenarios (reference SchemaMigrationTests.scala).

F3 #3: a column (`title`) appears mid-stream -> pre-evolution rows read
NULL.  F3 #4: the column disappears from the feed -> the target RETAINS
it and post-drop rows read NULL (additive-only, never destructive)."""

import pyarrow as pa
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
)
from arcane_stream_sqlserver_change_tracking_ray.stages.schema_evo import (
    unify_target_schema,
)
from arcane_stream_sqlserver_change_tracking_ray.state.manifest import prepare_watermark
from tests.util import assert_tables_equal


def make_ctx(ct, tgt):
    return StreamContext.from_dict(
        {
            "source": {"ctlog_dir": ct, "key_columns": ["url"]},
            "sink": {"target_root": tgt, "num_partitions": 4},
            "throughput": {"rows_per_group": 250},
        }
    )


# ------------------------------------------------------------------ unit
def test_unify_adds_new_columns():
    a = pa.schema([("x", pa.int64())])
    b = pa.schema([("x", pa.int64()), ("y", pa.string())])
    u, migrated = unify_target_schema(a, b)
    assert [f.name for f in u] == ["x", "y"] and migrated


def test_unify_retains_dropped_columns():
    a = pa.schema([("x", pa.int64()), ("y", pa.string())])
    b = pa.schema([("x", pa.int64())])
    u, migrated = unify_target_schema(a, b)
    assert [f.name for f in u] == ["x", "y"] and not migrated


def test_unify_widens():
    a = pa.schema([("x", pa.int32()), ("s", pa.string())])
    b = pa.schema([("x", pa.int64()), ("s", pa.large_string())])
    u, migrated = unify_target_schema(a, b)
    assert u.field("x").type == pa.int64()
    assert u.field("s").type == pa.large_string()
    assert migrated


def test_unify_never_narrows():
    a = pa.schema([("x", pa.int64())])
    b = pa.schema([("x", pa.int32())])
    u, migrated = unify_target_schema(a, b)
    assert u.field("x").type == pa.int64() and not migrated


def test_unify_incompatible_raises():
    a = pa.schema([("x", pa.int64())])
    b = pa.schema([("x", pa.timestamp("us"))])
    with pytest.raises(TypeError, match="incompatible"):
        unify_target_schema(a, b)


# ------------------------------------------------------------------- e2e
def test_add_column_mid_stream(tmp_lake):
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec(add_column_at=500))
    prepare_watermark(tgt, version=0, num_partitions=4)
    StreamRunner(make_ctx(ct, tgt)).run()
    got = read_target_table(tgt)
    assert "title" in got.column_names
    assert_tables_equal(got, expected_final_state(ct))
    # rows whose last event predates the evolution read NULL title
    import pandas as pd

    df = got.to_pandas()
    pre = df[df.sys_change_version < 500]
    post = df[df.sys_change_version >= 500]
    assert pre["title"].isna().all()
    assert post["title"].notna().all()
    assert len(pre) > 0 and len(post) > 0


def test_drop_column_mid_stream_retained(tmp_lake):
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec(add_column_at=300, drop_column_at=700))
    prepare_watermark(tgt, version=0, num_partitions=4)
    StreamRunner(make_ctx(ct, tgt)).run()
    got = read_target_table(tgt)
    # target RETAINS the dropped column (additive-only)
    assert "title" in got.column_names
    assert_tables_equal(got, expected_final_state(ct))
    df = got.to_pandas()
    in_window = df[(df.sys_change_version >= 300) & (df.sys_change_version < 700)]
    outside = df[(df.sys_change_version < 300) | (df.sys_change_version >= 700)]
    assert in_window["title"].notna().all()
    assert outside["title"].isna().all()
