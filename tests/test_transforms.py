"""T1-T5 transform unit tests."""

import pyarrow as pa
import pytest

from arcane_stream_sqlserver_change_tracking_ray.functions import transforms as T
from arcane_stream_sqlserver_change_tracking_ray.types import (
    MERGE_KEY_COL,
    OP_COL,
    VERSION_COL,
)


def test_normalize_name():
    assert T.normalize_name("Order$Total/Price\\EUR") == "ordertotalpriceeur"
    assert T.normalize_name("already_ok") == "already_ok"


def test_normalize_column_names():
    t = pa.table({"Some$Col": [1], "other/col": [2]})
    assert T.normalize_column_names(t).column_names == ["somecol", "othercol"]


@pytest.fixture()
def change_batch():
    return pa.table(
        {
            VERSION_COL: pa.array([1, 2], pa.int64()),
            OP_COL: ["I", "U"],
            MERGE_KEY_COL: ["a", "b"],
            "url": ["a", "b"],
            "text": ["x", "y"],
            "lang": ["en", "de"],
        }
    )


def test_select_include_keeps_essential(change_batch):
    out = T.select_fields(change_batch, "include", ("text",))
    assert set(out.column_names) == {VERSION_COL, OP_COL, MERGE_KEY_COL, "text"}


def test_select_exclude_cannot_drop_essential(change_batch):
    out = T.select_fields(change_batch, "exclude", ("lang", MERGE_KEY_COL))
    # lang dropped; merge key retained despite being excluded (CRD ...:432)
    assert "lang" not in out.column_names
    assert MERGE_KEY_COL in out.column_names


def test_select_all(change_batch):
    assert T.select_fields(change_batch, "all").column_names == change_batch.column_names


def test_unknown_rule(change_batch):
    with pytest.raises(ValueError):
        T.select_fields(change_batch, "nope")


def test_merge_key_single_column():
    t = pa.table({"url": ["u1", "u2"]})
    out = T.synthesize_merge_key(t, ("url",))
    assert out[MERGE_KEY_COL].to_pylist() == ["u1", "u2"]


def test_merge_key_composite():
    t = pa.table({"a": [1, 2], "b": ["x", "y"]})
    out = T.synthesize_merge_key(t, ("a", "b"))
    assert out[MERGE_KEY_COL].to_pylist() == ["1#x", "2#y"]


def test_cast_columns_arcane_names():
    t = pa.table({"n": pa.array([1, 2], pa.int32())})
    out = T.cast_columns(t, {"n": "LongType"})
    assert out["n"].type == pa.int64()


def test_cast_to_schema_adds_nulls_and_orders():
    t = pa.table({"b": [1], "a": ["x"]})
    schema = pa.schema([("a", pa.string()), ("b", pa.int64()), ("c", pa.float64())])
    out = T.cast_to_schema(t, schema)
    assert out.schema == schema
    assert out["c"].null_count == 1


def test_column_summary():
    t = pa.table({"n": [1, 2, None], "b": pa.array([b"x"], pa.binary()).take([0, 0, 0])})
    s = T.column_summary(t, ("n", "b"))
    assert s["n"] == {"min": 1, "max": 2, "null_count": 1, "count": 3}
    assert s["b"]["min"] is None  # binary columns skip min/max
