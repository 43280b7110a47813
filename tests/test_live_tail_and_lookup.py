"""Live-tail mode (segments arriving DURING the run) + partition-pruned
point lookups."""

import os
import shutil
import threading
import time

from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
from arcane_stream_sqlserver_change_tracking_ray.gen import (
    expected_final_state,
    small_spec,
    write_ctlog,
)
from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
    StreamRunner,
    get_watermark,
    lookup_keys,
    read_target_table,
)
from arcane_stream_sqlserver_change_tracking_ray.state.manifest import prepare_watermark
from tests.util import assert_tables_equal


def test_live_tail_picks_up_arriving_segments(tmp_lake):
    """The reference's poll loop: segments land while the stream runs;
    the tailer must pick them up within its interval and converge."""
    ct, tgt, _ = tmp_lake
    stage = ct + "_all"
    write_ctlog(stage, small_spec())
    segs = sorted(os.listdir(stage))
    os.makedirs(ct)
    shutil.copy(os.path.join(stage, segs[0]), os.path.join(ct, segs[0]))
    prepare_watermark(tgt, 0, num_partitions=4)

    def feeder():
        for s in segs[1:]:
            time.sleep(0.4)
            shutil.copy(os.path.join(stage, s), os.path.join(ct, s))

    t = threading.Thread(target=feeder, daemon=True)
    ctx = StreamContext.from_dict(
        {
            "source": {"ctlog_dir": ct, "key_columns": ["url"],
                       "change_capture_interval": 0.05,
                       "change_capture_jitter": 0.2},
            "sink": {"target_root": tgt, "num_partitions": 4},
            "throughput": {"rows_per_group": 300},
            "maintenance": {"enabled": False},
        }
    )
    t.start()
    StreamRunner(ctx).run(max_seconds=30)
    t.join()
    # one final catch-up pass in case the clock ran out first
    StreamRunner(ctx).run()
    assert get_watermark(tgt) == 1000
    assert_tables_equal(read_target_table(tgt), expected_final_state(ct))


def test_lookup_keys_partition_pruned(tmp_lake):
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, 0, num_partitions=8)
    ctx = StreamContext.from_dict(
        {
            "source": {"ctlog_dir": ct, "key_columns": ["url"]},
            "sink": {"target_root": tgt, "num_partitions": 8},
            "throughput": {"rows_per_group": 500},
        }
    )
    StreamRunner(ctx).run()
    exp = expected_final_state(ct)
    urls = exp["url"].to_pylist()
    probe = [urls[0], urls[len(urls) // 2], urls[-1], "https://nope/x"]
    got = lookup_keys(tgt, probe)
    assert set(got["arcane_merge_key"].to_pylist()) == set(probe) - {"https://nope/x"}
    # values match the oracle rows
    exp_rows = exp.to_pandas().set_index("url").loc[[u for u in probe if u in urls]]
    got_rows = got.to_pandas().set_index("url")
    for u in exp_rows.index:
        assert got_rows.loc[u, "text"] == exp_rows.loc[u, "text"]


def test_lookup_finds_every_int_key_individually(tmp_lake):
    """Regression: with a single NON-STRING key column the alias fast
    path routes on the raw column while lookups hash the canonical
    string merge key — the two must place every key identically
    (hash_keys canonicalizes the domain).  Probing ONE key at a time
    leaves no room for accidental pid coverage to mask a mismatch."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from arcane_stream_sqlserver_change_tracking_ray.types import OP_COL, VERSION_COL

    ct, tgt, _ = tmp_lake
    os.makedirs(ct, exist_ok=True)
    n = 64
    feed = pa.table(
        {
            "user_id": pa.array(np.arange(n, dtype=np.int64)),
            "val": pa.array(np.arange(n, dtype=np.float64)),
            VERSION_COL: pa.array(np.arange(1, n + 1, dtype=np.int64)),
            OP_COL: pa.array(["U"] * n),
        }
    )
    pq.write_table(feed, os.path.join(ct, f"v{1:012d}-{n:012d}.parquet"))
    prepare_watermark(tgt, 0, num_partitions=8)
    ctx = StreamContext.from_dict(
        {
            "source": {"ctlog_dir": ct, "key_columns": ["user_id"]},
            "sink": {"target_root": tgt, "num_partitions": 8},
            "throughput": {"rows_per_group": 64},
        }
    )
    StreamRunner(ctx).run()
    for k in (0, 1, 2, 3, 5, 8, 13, 21, 34, 55, 63):
        got = lookup_keys(tgt, [str(k)])
        assert got.num_rows == 1, f"key {k} not found by single-key lookup"
        assert got["user_id"][0].as_py() == k
