"""Generator determinism + tailer planning tests."""

import hashlib

import numpy as np
import pyarrow.parquet as pq

from arcane_stream_sqlserver_change_tracking_ray.gen import (
    plan_events,
    render_events,
    small_spec,
    write_ctlog,
)
from arcane_stream_sqlserver_change_tracking_ray.sources.ctlog import (
    ChangeFeedTailer,
    list_segments,
    max_available_version,
)


def _digest(tbl):
    return hashlib.sha256(tbl.to_pandas().to_csv().encode()).hexdigest()


def test_plan_deterministic():
    k1, o1 = plan_events(small_spec())
    k2, o2 = plan_events(small_spec())
    assert (k1 == k2).all() and (o1 == o2).all()


def test_render_chunk_independent():
    """Rendering a sub-range yields identical bytes to slicing the full
    render — required for distributed generation to be deterministic."""
    spec = small_spec()
    k, o = plan_events(spec)
    v = np.arange(1, spec.n_events + 1, dtype=np.int64)
    full = render_events(v, k, o, spec)
    part = render_events(v[100:300], k[100:300], o[100:300], spec)
    assert _digest(full.slice(100, 200)) == _digest(part)


def test_write_ctlog_deterministic(tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    p1 = write_ctlog(d1, small_spec())
    p2 = write_ctlog(d2, small_spec())
    for a, b in zip(p1, p2):
        assert _digest(pq.read_table(a)) == _digest(pq.read_table(b))


def test_ops_start_with_insert():
    spec = small_spec()
    k, o = plan_events(spec)
    first_occurrence = {}
    for key, op in zip(k.tolist(), o.tolist()):
        if key not in first_occurrence:
            first_occurrence[key] = op
    assert all(op == 0 for op in first_occurrence.values())  # 0 == 'I'


def test_tailer_plans_in_version_order(tmp_path):
    d = str(tmp_path / "ct")
    write_ctlog(d, small_spec())
    assert max_available_version(d) == 1000
    t = ChangeFeedTailer(d, watermark=0, rows_per_poll=250)
    seen_hi = 0
    while (p := t.plan()) is not None:
        paths, hi = p
        assert hi > seen_hi
        # planned segments must cover contiguously from the cursor
        los = [lo for lo, h, pa_ in list_segments(d) if pa_ in paths]
        assert min(los) == seen_hi + 1
        seen_hi = hi
        t.advance(hi)
    assert seen_hi == 1000


def test_tailer_jitter_deterministic(tmp_path):
    d = str(tmp_path / "ct")
    write_ctlog(d, small_spec())
    a = ChangeFeedTailer(d, 0, poll_interval=10, jitter=0.5, jitter_seed=7)
    b = ChangeFeedTailer(d, 0, poll_interval=10, jitter=0.5, jitter_seed=7)
    assert [a.next_interval() for _ in range(5)] == [b.next_interval() for _ in range(5)]
    assert all(5 <= x <= 15 for (x) in [a.next_interval() for _ in range(20)])

def test_tailer_waits_on_version_gap(tmp_path):
    """Out-of-order segment arrival must never advance the watermark over
    a hole (those versions would be lost forever)."""
    import os
    import shutil

    stage = str(tmp_path / "all")
    live = str(tmp_path / "live")
    write_ctlog(stage, small_spec())  # segments of 200 versions each
    segs = sorted(os.listdir(stage))
    os.makedirs(live)
    # segment 3 (v401-600) arrives BEFORE segments 1-2
    shutil.copy(os.path.join(stage, segs[2]), os.path.join(live, segs[2]))
    t = ChangeFeedTailer(live, watermark=0, rows_per_poll=10_000)
    assert t.plan() is None  # waits: next segment starts at 401, wm=0
    # first segment lands -> only the contiguous prefix (v1-200) is planned
    shutil.copy(os.path.join(stage, segs[0]), os.path.join(live, segs[0]))
    paths, hi = t.plan()
    assert hi == 200 and len(paths) == 1
    t.advance(hi)
    assert t.plan() is None  # v201-400 still missing
    shutil.copy(os.path.join(stage, segs[1]), os.path.join(live, segs[1]))
    paths, hi = t.plan()
    assert hi == 600 and len(paths) == 2


def test_tailer_satisfies_change_source_protocol(tmp_path):
    """The bundled tailer implements the user-extension surface."""
    from arcane_stream_sqlserver_change_tracking_ray.sources.base import ChangeSource

    d = str(tmp_path / "ct")
    write_ctlog(d, small_spec())
    t = ChangeFeedTailer(d, 0)
    assert isinstance(t, ChangeSource)
