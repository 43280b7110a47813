"""HA posture: two writers racing on ONE table.

The reference deploys one stream pod per table (the operator enforces a
singleton), but a real cluster still sees split-brain restarts and
standby writers racing a primary.  The engine's contract: the manifest
CAS serializes commits, the LOSER resyncs to the winner's watermark and
keeps going (the feed replay is idempotent LWW, so re-execution is
harmless), and the startup sweep's grace window keeps a bootstrapping
standby from deleting the primary's in-flight cycle dir."""

import threading

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
from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
    CommitConflictError,
    ManifestLog,
    prepare_watermark,
)

from tests.util import assert_tables_equal


def _ctx(ct, tgt, **sink_extra):
    return StreamContext.from_dict(
        {
            "source": {"ctlog_dir": ct, "key_columns": ["url"]},
            "sink": {"target_root": tgt, "num_partitions": 8,
                     "sweepGraceSeconds": 300, **sink_extra},
            "throughput": {"rows_per_group": 150},
        }
    )


def test_two_racing_writers_converge(tmp_lake):
    """Both writers drain the same feed concurrently; every CAS loss is
    absorbed by a resync; the final table matches the LWW oracle and the
    watermark is fully caught up."""
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=8)

    # Ray's _is_http_filesystem re-imports fsspec.implementations.http on
    # EVERY read and tolerates only a clean ModuleNotFoundError (aiohttp
    # is absent here); two threads racing that failing import turn it
    # into a bare ImportError that escapes Ray's except.  Pre-seed a stub
    # module so the import deterministically succeeds — the dummy class
    # matches no real filesystem, which is exactly the
    # ModuleNotFoundError fallback behavior.  (Real multi-writer
    # deployments are separate processes; the race is thread-only.)
    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        import sys as _sys
        import types as _types

        _stub = _types.ModuleType("fsspec.implementations.http")
        _stub.HTTPFileSystem = type("HTTPFileSystem", (), {})
        _sys.modules["fsspec.implementations.http"] = _stub

    errors: list[BaseException] = []

    def drain():
        try:
            StreamRunner(_ctx(ct, tgt)).run()
        except BaseException as e:  # surfaced after join
            errors.append(e)

    threads = [threading.Thread(target=drain) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, f"racing writer died: {errors!r}"
    log = ManifestLog(tgt)
    assert log.require_watermark().watermark == 1000
    assert_tables_equal(read_target_table(tgt), expected_final_state(ct))


def test_conflict_resync_absorbs_a_lost_race(tmp_lake, monkeypatch):
    """Deterministic single-conflict variant: writer A commits a cycle
    BETWEEN B's plan and B's commit (injected via a commit wrapper), so
    B's CAS expect_version is stale exactly once; run()'s conflict path
    resyncs B to A's watermark and B finishes the stream alone."""
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=8)

    b = StreamRunner(_ctx(ct, tgt))
    orig_commit = b.log.commit
    injected = {"done": False}

    def racing_commit(manifest, **kw):
        if not injected["done"]:
            injected["done"] = True
            # the peer wins the race mid-commit-window (its bootstrap
            # sweep runs under the grace window, so B's freshly staged
            # cycle dir survives it)
            StreamRunner(_ctx(ct, tgt)).run(max_cycles=1)
        return orig_commit(manifest, **kw)

    monkeypatch.setattr(b.log, "commit", racing_commit)
    metrics = b.run()
    assert metrics, "B never committed after the lost race"
    log = ManifestLog(tgt)
    assert log.require_watermark().watermark == 1000
    assert_tables_equal(read_target_table(tgt), expected_final_state(ct))


def test_sweep_grace_preserves_inflight_dirs(tmp_lake):
    """A standby bootstrapping mid-cycle must NOT delete a fresh
    uncommitted cycle dir (grace window), but a zero-grace bootstrap
    (single-writer semantics) still sweeps it."""
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=8)
    log = ManifestLog(tgt)
    # plant a fake in-flight cycle dir (what a mid-cycle primary has)
    log.fs.write_bytes("cycles/c999-inflight/part-0.parquet", b"x")

    swept = log.sweep_uncommitted(grace_seconds=300)
    assert swept == []
    assert log.fs.exists("cycles/c999-inflight/part-0.parquet")

    swept = log.sweep_uncommitted(grace_seconds=0)
    assert "cycles/c999-inflight" in swept
    assert not log.fs.exists("cycles/c999-inflight/part-0.parquet")


def test_sixteen_straight_conflicts_reraise(tmp_lake, monkeypatch):
    """The resync loop is not an infinite swallow: a writer that loses
    every race without ever committing gives up loudly."""
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=8)
    r = StreamRunner(_ctx(ct, tgt))

    def always_conflict():
        raise CommitConflictError("synthetic: peer always wins")

    monkeypatch.setattr(r, "run_cycle", always_conflict)
    with pytest.raises(CommitConflictError, match="peer always wins"):
        r.run()


def test_custom_staging_root_sweep_honors_grace(tmp_lake, tmp_path):
    """ADVICE r3: a bootstrapping standby with sweep_grace_seconds set
    must not delete the primary's in-flight dirs in a CUSTOM staging
    root either (bootstrap() forwards the grace to sweep_staging)."""
    from arcane_stream_sqlserver_change_tracking_ray.stages.staging import (
        sweep_staging,
    )

    root = str(tmp_path / "custom_staging")
    import os

    os.makedirs(os.path.join(root, "staging_fresh"), exist_ok=True)
    with open(os.path.join(root, "staging_fresh", "f.parquet"), "wb") as f:
        f.write(b"x")
    os.makedirs(os.path.join(root, "other_prefix"), exist_ok=True)

    # grace window: the fresh prefix-matched dir survives
    assert sweep_staging(root, "staging_", grace_seconds=300) == []
    assert os.path.isdir(os.path.join(root, "staging_fresh"))
    # zero grace (single-writer): swept
    swept = sweep_staging(root, "staging_", grace_seconds=0)
    assert swept == ["staging_fresh"]
    assert not os.path.isdir(os.path.join(root, "staging_fresh"))
    # non-prefix dirs are never touched
    assert os.path.isdir(os.path.join(root, "other_prefix"))


def test_grace_fails_safe_on_mtime_error(tmp_lake, monkeypatch):
    """ADVICE r3: with a grace window configured, an unreadable mtime
    must be treated as in-grace (skip deletion), not deleted."""
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, version=0, num_partitions=8)
    log = ManifestLog(tgt)
    log.fs.write_bytes("cycles/c998-inflight/part-0.parquet", b"x")

    def broken_getmtime(rel):
        raise OSError("synthetic: stat raced a concurrent rename")

    monkeypatch.setattr(log.fs, "getmtime", broken_getmtime)
    assert log.sweep_uncommitted(grace_seconds=300) == []
    assert log.fs.exists("cycles/c998-inflight/part-0.parquet")
    # zero grace still sweeps regardless of mtime readability
    assert "cycles/c998-inflight" in log.sweep_uncommitted(grace_seconds=0)


def test_fs_cache_is_bounded(tmp_path):
    """ADVICE r3: the facade memo evicts instead of growing forever."""
    from arcane_stream_sqlserver_change_tracking_ray.state import fs as fsmod

    before = dict(fsmod._FS_CACHE)
    try:
        fsmod._FS_CACHE.clear()
        for i in range(fsmod._FS_CACHE_MAX + 10):
            fsmod.lakefs(str(tmp_path / f"root{i}"))
        assert len(fsmod._FS_CACHE) <= fsmod._FS_CACHE_MAX
        # memoization still works for a live root
        a = fsmod.lakefs(str(tmp_path / "stable"))
        assert fsmod.lakefs(str(tmp_path / "stable")) is a
    finally:
        fsmod._FS_CACHE.clear()
        fsmod._FS_CACHE.update(before)
