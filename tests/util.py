"""Shared test helpers: order-insensitive table compare (the reference
asserts `.sorted` row sets, StreamRunner.scala:254-258)."""

import pandas as pd
import pyarrow as pa


def assert_tables_equal(got: pa.Table, expected: pa.Table, sort_by: str = "url"):
    g = got.to_pandas().sort_values(sort_by).reset_index(drop=True)
    e = expected.to_pandas().sort_values(sort_by).reset_index(drop=True)
    cols = sorted(e.columns)
    assert sorted(g.columns) == cols, f"columns differ: {sorted(g.columns)} vs {cols}"
    pd.testing.assert_frame_equal(g[cols], e[cols], check_like=True)
