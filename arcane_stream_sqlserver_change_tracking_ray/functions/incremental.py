"""Incremental view maintenance from a pre-imaged change feed.

The canonical CDC consumer (SURVEY §2 downstream patterns; Delta CDF's
documented use case): a grouped aggregate materialized view advances
from snapshot A to snapshot B using ONLY the net change feed —
inserts apply the post-image, deletes retract the pre-image, updates do
both (rows MOVE between groups when the group column changes).  Cost is
proportional to the change count, never the view's base table.

Aggregates maintained: ``n`` (row count) and one integral ``value_u``
sum — integer units by contract (see ``to_units``) so maintenance is
exact and an SQL oracle can hash-compare the result
(``cdc_incremental_matview``).  Averages derive as value_u/n; min/max
are NOT maintainable from a feed alone (a retraction below the current
max needs a rescan) — that asymmetry is inherent to IVM, not this
implementation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from arcane_stream_sqlserver_change_tracking_ray.stages.merge import CHANGE_TYPE_COL


def to_units(col, scale: float = 100.0) -> pa.Array:
    """Integer fixed-point units (default cents).  half_towards_infinity
    matches DuckDB/SQL ``round()`` on exact .5 boundaries (pyarrow's
    default half-to-even would diverge)."""
    return pc.cast(
        pc.round(pc.multiply(col, scale), 0, round_mode="half_towards_infinity"),
        pa.int64(),
    )


def _contrib(groups, dn: int, units, sign: int) -> pa.Table:
    if isinstance(groups, pa.ChunkedArray):
        groups = groups.combine_chunks()
    return pa.table(
        {
            "group": groups,
            "dn": pa.array(np.full(len(groups), dn, np.int64)),
            "dv": pc.multiply(units, pa.scalar(sign, pa.int64())),
        }
    )


def grouped_agg_contribs(batch: pa.Table, group_col: str, value_col: str,
                         scale: float = 100.0) -> pa.Table:
    """Per-batch PARTIAL (group, dn, dv) rows for building the base view
    — use inside ``map_batches`` so the driver only folds tiny partials
    (the ``topk_tokens`` pre-aggregation shape)."""
    t = _contrib(batch[group_col], 1, to_units(batch[value_col], scale), 1)
    g = t.group_by("group").aggregate([("dn", "sum"), ("dv", "sum")])
    return g.rename_columns(["group", "dn", "dv"])


def advance_matview(
    mv: pa.Table,
    feed: pa.Table,
    group_col: str,
    value_col: str,
    scale: float = 100.0,
) -> pa.Table:
    """Advance a (group, dn, dv) materialized view with a net change
    feed carrying ``change_type`` and ``pre_<group_col>``/``pre_<value_col>``
    pre-image columns (``read_change_feed(pre_image_columns=...)``).
    Returns the updated (group, dn, dv) view with empty groups dropped."""
    post = feed.filter(
        pc.is_in(feed[CHANGE_TYPE_COL], value_set=pa.array(["insert", "update"]))
    )
    pre = feed.filter(
        pc.is_in(feed[CHANGE_TYPE_COL], value_set=pa.array(["update", "delete"]))
    )
    folded = (
        pa.concat_tables(
            [
                mv,
                _contrib(post[group_col], 1, to_units(post[value_col], scale), 1),
                _contrib(
                    pre[f"pre_{group_col}"],
                    -1,
                    to_units(pre[f"pre_{value_col}"], scale),
                    -1,
                ),
            ]
        )
        .group_by("group")
        .aggregate([("dn", "sum"), ("dv", "sum")])
        .rename_columns(["group", "dn", "dv"])
    )
    return folded.filter(pc.greater(folded["dn"], 0))
