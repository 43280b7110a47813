"""Run the driver contract end-to-end at sf0.001: every queries() entry
executes and every oracle_sql() entry matches DuckDB exactly (the same
row-count + schema + order-insensitive value compare the driver runs)."""

import sys


def test_all_queries_match_oracles():
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tests")
    from driver_sim import main

    assert main("/root/testdata/sf0.001") == 0


def test_entry_smoke():
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    r = E.entry()
    assert r.num_rows >= 0
    assert set(r.schema.names) == {
        "user_id", "sys_change_version", "ts", "event_type", "value", "props",
    }
