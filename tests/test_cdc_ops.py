"""Planted-feed unit tests for the net-changes / SCD2 kernels
(functions/cdc_ops.py): CHANGETABLE net-op rules and type-2 interval
chains on a hand-written feed where every rule fires at least once."""

import pyarrow as pa

from arcane_stream_sqlserver_change_tracking_ray.functions.cdc_ops import (
    last_per_key_side,
    net_changes_fold,
    scd2_intervals,
)


def _feed(rows):
    """rows: (user, version, op[, value])"""
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "side": pa.array([r[4] for r in rows], pa.int64()),
            "version": pa.array([r[1] for r in rows], pa.int64()),
            "op": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array([r[1] * 1000 for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([float(r[3]) for r in rows], pa.float64()),
        }
    )


def test_last_per_key_side_is_associative_precombine():
    rows = [
        (1, 10, "U", 1.0, 0),
        (1, 12, "U", 2.0, 0),  # key 1 baseline winner v12
        (1, 20, "U", 3.0, 1),
        (1, 25, "D", 4.0, 1),  # key 1 post winner v25
        (2, 30, "U", 5.0, 1),
    ]
    whole = last_per_key_side(_feed(rows))
    # split into two "batches", pre-combine each, then combine again
    a = last_per_key_side(_feed(rows[:2]))
    b = last_per_key_side(_feed(rows[2:]))
    again = last_per_key_side(pa.concat_tables([a, b]))
    assert whole.sort_by("version").equals(again.sort_by("version"))
    assert whole.num_rows == 3  # (1,base) (1,post) (2,post)
    win = {
        (u, s): v
        for u, s, v in zip(
            whole["user_id"].to_pylist(),
            whole["side"].to_pylist(),
            whole["version"].to_pylist(),
        )
    }
    assert win == {(1, 0): 12, (1, 1): 25, (2, 1): 30}


def test_net_changes_every_rule():
    rows = [
        # key 1: existed at baseline, updated after -> U
        (1, 10, "U", 1.0, 0),
        (1, 20, "U", 2.0, 1),
        # key 2: existed at baseline, deleted after -> D (keys only)
        (2, 11, "U", 1.0, 0),
        (2, 21, "D", 0.0, 1),
        # key 3: created after baseline, still alive -> I
        (3, 22, "U", 3.0, 1),
        # key 4: created after baseline then deleted -> nets out
        (4, 23, "U", 4.0, 1),
        (4, 24, "D", 0.0, 1),
        # key 5: deleted at baseline, recreated after -> I
        (5, 12, "D", 0.0, 0),
        (5, 25, "U", 5.0, 1),
        # key 6: baseline only, no post rows -> no row
        (6, 13, "U", 6.0, 0),
    ]
    out = net_changes_fold(_feed(rows)).sort_by("user_id")
    assert out["user_id"].to_pylist() == [1, 2, 3, 5]
    assert out["sys_change_operation"].to_pylist() == ["U", "D", "I", "I"]
    assert out["sys_change_version"].to_pylist() == [20, 21, 22, 25]
    # delete rows carry keys only
    assert out["value"].to_pylist() == [2.0, None, 3.0, 5.0]
    assert out["ts"].is_null().to_pylist() == [False, True, False, False]


def test_net_changes_fold_accepts_precombined_partials():
    rows = [
        (1, 10, "U", 1.0, 0),
        (1, 12, "U", 2.0, 0),
        (1, 20, "U", 3.0, 1),
        (1, 25, "U", 4.0, 1),
    ]
    direct = net_changes_fold(_feed(rows))
    pre = pa.concat_tables(
        [last_per_key_side(_feed(rows[:2])), last_per_key_side(_feed(rows[2:]))]
    )
    assert net_changes_fold(pre).equals(direct)
    assert direct["sys_change_version"].to_pylist() == [25]
    assert direct["value"].to_pylist() == [4.0]


def _scd_feed(rows):
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "version": pa.array([r[1] for r in rows], pa.int64()),
            "op": pa.array([r[2] for r in rows], pa.string()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([float(r[3]) for r in rows], pa.float64()),
        }
    )


def test_scd2_interval_chain_and_deletes():
    rows = [
        (1, 10, "U", 1.0),
        (1, 20, "U", 2.0),
        (1, 30, "D", 0.0),  # closes [20,30), opens nothing
        (2, 15, "U", 5.0),  # single-event key: current
        (3, 40, "D", 0.0),  # delete-only key: no rows
    ]
    out = scd2_intervals(_scd_feed(rows)).sort_by(
        [("user_id", "ascending"), ("valid_from", "ascending")]
    )
    assert out["user_id"].to_pylist() == [1, 1, 2]
    assert out["valid_from"].to_pylist() == [10, 20, 15]
    assert out["valid_to"].to_pylist() == [20, 30, None]
    assert out["is_current"].to_pylist() == [0, 0, 1]


def test_scd2_last_event_delete_leaves_no_current_row():
    rows = [(7, 1, "U", 1.0), (7, 2, "D", 0.0)]
    out = scd2_intervals(_scd_feed(rows))
    assert out["valid_to"].to_pylist() == [2]
    assert out["is_current"].to_pylist() == [0]


def test_scd2_empty_group():
    out = scd2_intervals(_scd_feed([]))
    assert out.num_rows == 0
    assert set(out.schema.names) == {
        "user_id", "valid_from", "valid_to", "event_type", "value", "is_current",
    }
