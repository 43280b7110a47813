"""Manifest log unit tests: CAS commit, monotone watermark, sweep, expiry."""

import os

import pyarrow as pa
import pytest

from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
    CommitConflictError,
    InvalidWatermarkError,
    Manifest,
    ManifestLog,
    prepare_watermark,
)


def test_watermark_gate(tmp_path):
    log = ManifestLog(str(tmp_path / "t"))
    with pytest.raises(InvalidWatermarkError, match="Invalid watermark value: 'null'"):
        log.require_watermark()


def test_prepare_watermark_idempotent(tmp_path):
    root = str(tmp_path / "t")
    m1 = prepare_watermark(root, version=5, num_partitions=4)
    m2 = prepare_watermark(root, version=99, num_partitions=8)
    assert m2.watermark == m1.watermark == 5
    assert m2.num_partitions == 4


def test_cas_conflict(tmp_path):
    root = str(tmp_path / "t")
    prepare_watermark(root, version=0, num_partitions=2)
    log = ManifestLog(root)
    base = log.latest()
    a, b = base.next(), base.next()
    a.watermark = 10
    b.watermark = 11
    log.commit(a, expect_version=base.version)
    with pytest.raises(CommitConflictError):
        log.commit(b, expect_version=base.version)


def test_monotone_watermark(tmp_path):
    root = str(tmp_path / "t")
    prepare_watermark(root, version=100, num_partitions=2)
    log = ManifestLog(root)
    nxt = log.latest().next()
    nxt.watermark = 50
    with pytest.raises(CommitConflictError, match="non-monotone"):
        log.commit(nxt)


def test_schema_roundtrip(tmp_path):
    root = str(tmp_path / "t")
    schema = pa.schema([("url", pa.string()), ("v", pa.int64())])
    prepare_watermark(root, version=0, num_partitions=2, schema=schema)
    assert ManifestLog(root).latest().schema == schema


def test_sweep_uncommitted(tmp_path):
    root = str(tmp_path / "t")
    prepare_watermark(root, version=0, num_partitions=2)
    log = ManifestLog(root)
    # a committed cycle dir + an orphan
    m = log.latest().next()
    os.makedirs(os.path.join(root, "cycles", "c1"))
    open(os.path.join(root, "cycles", "c1", "f.parquet"), "w").write("x")
    m.partitions[0] = ["cycles/c1/f.parquet"]
    m.watermark = 1
    log.commit(m)
    os.makedirs(os.path.join(root, "cycles", "orphan"))
    os.makedirs(os.path.join(root, "staging", "staging_x"))
    removed = log.sweep_uncommitted()
    assert "cycles/orphan" in removed and "staging/staging_x" in removed
    assert os.path.exists(os.path.join(root, "cycles", "c1", "f.parquet"))


def test_expire_versions(tmp_path):
    root = str(tmp_path / "t")
    prepare_watermark(root, version=0, num_partitions=1)
    log = ManifestLog(root)
    files = []
    for i in range(5):
        m = log.latest().next()
        d = os.path.join(root, "cycles", f"c{i}")
        os.makedirs(d)
        f = os.path.join(d, "f.parquet")
        open(f, "w").write("x")
        files.append(f)
        m.partitions[0] = [f"cycles/c{i}/f.parquet"]  # replaces previous file
        m.watermark = i + 1
        log.commit(m)
    expired = log.expire_versions(keep=2)
    assert len(expired) == 4  # v0..v3 dropped, v4/v5 kept
    assert os.path.exists(files[4]) and os.path.exists(files[3])
    assert not os.path.exists(files[0]) and not os.path.exists(files[1])
    assert log.versions() == [4, 5]
