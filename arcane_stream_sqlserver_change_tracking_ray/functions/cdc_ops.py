"""Change-feed consumption operators beyond the LWW merge itself.

SQL Server change tracking exposes NET changes per key relative to a
baseline version (``CHANGETABLE(CHANGES t, @since)`` — the contract the
reference's MsSqlStreamingSource consumes, see reference
``docs/crd.md`` change-capture semantics), and downstream warehouses
commonly fold the same feed into a type-2 slowly-changing-dimension
history.  Both are implemented here as vectorized per-bucket kernels:
the only shuffle is a key-bucketed co-shuffle of pre-combined partials
(net changes) or of the pruned feed columns (SCD2) — payloads never
move more than once and nothing materializes on the driver.

Scale notes
-----------
- ``last_per_key_side`` is the pre-combiner: each batch collapses to at
  most two rows per key (baseline side / post side) before any data
  movement, so the exchange carries O(keys), not O(events).
- The fold kernels are vectorized over MANY keys per bucket (run-length
  boundaries on sorted arrays), not one Python call per key.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "last_per_key_side",
    "net_changes_fold",
    "scd2_intervals",
]


def _run_starts(arr: np.ndarray) -> np.ndarray:
    """Boolean mask: True where a new run of equal values starts
    (``arr`` must be sorted / grouped)."""
    if arr.size == 0:
        return np.zeros(0, dtype=bool)
    return np.r_[True, arr[1:] != arr[:-1]]


def last_per_key_side(
    tbl: pa.Table,
    key_col: str = "user_id",
    side_col: str = "side",
    version_col: str = "version",
) -> pa.Table:
    """Keep only the max-``version`` row per (key, side).

    Used both as the per-batch PRE-COMBINER (collapse a batch to <=2
    rows per key before the shuffle) and as the first step of the
    per-bucket fold — the operation is associative, so applying it
    twice is exact.
    """
    if tbl.num_rows == 0:
        return tbl
    order = pc.sort_indices(
        tbl,
        sort_keys=[
            (key_col, "ascending"),
            (side_col, "ascending"),
            (version_col, "ascending"),
        ],
    )
    g = tbl.take(order)
    k = g[key_col].to_numpy(zero_copy_only=False)
    s = g[side_col].to_numpy(zero_copy_only=False)
    # last row of each (key, side) run wins (max version = last in order)
    starts = _run_starts(k) | _run_starts(s)
    last = np.r_[starts[1:], True]
    return g.filter(pa.array(last))


def net_changes_fold(group: pa.Table) -> pa.Table:
    """Vectorized net-change resolution over ONE co-shuffled bucket of
    pre-combined partials (many keys per call).

    Net-op rules (CHANGETABLE semantics):
      - key existed at baseline (side-0 winner op != 'D'):
          post winner 'D' -> net 'D' (keys only), else net 'U'
      - key did NOT exist at baseline:
          post winner 'D' -> no row (created+deleted nets out),
          else net 'I'
      - no post rows -> no row (unchanged since baseline)
    """
    reduced = last_per_key_side(group)
    k = reduced["user_id"].to_numpy(zero_copy_only=False)
    s = reduced["side"].to_numpy(zero_copy_only=False)
    ops = reduced["op"].to_numpy(zero_copy_only=False)

    base_mask = s == 0
    post_mask = ~base_mask
    base_keys = k[base_mask]
    base_alive = ops[base_mask] != "D"
    post = reduced.filter(pa.array(post_mask))
    pk = k[post_mask]
    p_del = ops[post_mask] == "D"

    # align baseline existence onto post keys (both sorted by key)
    idx = np.searchsorted(base_keys, pk)
    has_base = np.zeros(len(pk), dtype=bool)
    in_range = idx < len(base_keys)
    has_base[in_range] = base_keys[idx[in_range]] == pk[in_range]
    existed = np.zeros(len(pk), dtype=bool)
    existed[has_base] = base_alive[idx[has_base]]

    net = np.where(existed, np.where(p_del, "D", "U"), "I")
    keep = existed | ~p_del  # drop created-then-deleted keys
    post = post.filter(pa.array(keep))
    net = net[keep]
    deleted = net == "D"

    def _payload(col: str):
        arr = post[col].combine_chunks()
        return pc.if_else(pa.array(deleted), pa.nulls(len(net), arr.type), arr)

    return pa.table(
        {
            "user_id": post["user_id"],
            "sys_change_operation": pa.array(net, pa.string()),
            "sys_change_version": post["version"],
            "ts": _payload("ts"),
            "event_type": _payload("event_type"),
            "value": _payload("value"),
        }
    )


def scd2_intervals(group: pa.Table) -> pa.Table:
    """Type-2 history intervals over ONE co-shuffled bucket of feed rows
    (many keys per call, vectorized).

    Per key, events ordered by version open intervals
    ``[version, next_version)``; the newest non-delete interval is
    current (``valid_to`` NULL).  Delete events close the previous
    interval but open none — a key whose last event is a delete has no
    current row.
    """
    if group.num_rows == 0:
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "valid_from": pa.array([], pa.int64()),
                "valid_to": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
                "is_current": pa.array([], pa.int64()),
            }
        )
    order = pc.sort_indices(
        group, sort_keys=[("user_id", "ascending"), ("version", "ascending")]
    )
    g = group.take(order)
    k = g["user_id"].to_numpy(zero_copy_only=False)
    v = g["version"].to_numpy(zero_copy_only=False)
    n = len(k)
    same_next = np.r_[k[1:] == k[:-1], False]
    valid_to = np.empty(n, dtype=np.int64)
    valid_to[:-1] = v[1:]
    valid_to[-1] = 0  # masked
    ops = g["op"].to_numpy(zero_copy_only=False)
    keep = ops != "D"
    out = pa.table(
        {
            "user_id": g["user_id"],
            "valid_from": g["version"],
            "valid_to": pa.array(valid_to, pa.int64(), mask=~same_next),
            "event_type": g["event_type"],
            "value": g["value"],
            "is_current": pa.array((~same_next).astype(np.int64)),
        }
    )
    return out.filter(pa.array(keep))
