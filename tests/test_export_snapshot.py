"""Resumable consistent-snapshot export (pid-partitioned parquet)."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
from arcane_stream_sqlserver_change_tracking_ray.gen import (
    expected_final_state,
    small_spec,
    write_ctlog,
)
from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
    StreamRunner,
    export_snapshot,
    read_target_table,
)
from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
    ManifestLog,
    prepare_watermark,
)
from tests.util import assert_tables_equal


def _run_stream(ct, tgt, rows=300):
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, 0, num_partitions=8)
    StreamRunner(
        StreamContext.from_dict(
            {
                "source": {"ctlog_dir": ct, "key_columns": ["url"]},
                "sink": {"target_root": tgt, "num_partitions": 8},
                "throughput": {"rows_per_group": rows},
                "maintenance": {"enabled": False},
            }
        )
    ).run()


def _read_export(out):
    tables = [pq.read_table(p) for p in sorted(glob.glob(f"{out}/pid=*/part-0.parquet"))]
    return pa.concat_tables([t for t in tables if t.num_rows])


def test_export_matches_oracle_and_is_resumable(tmp_lake, tmp_path):
    ct, tgt, _ = tmp_lake
    _run_stream(ct, tgt)
    out = str(tmp_path / "export")

    res = export_snapshot(tgt, out)
    assert res["skipped"] == 0 and res["partitions"] == 8
    exported = _read_export(out).sort_by("url")
    exp = expected_final_state(ct).sort_by("url")
    assert_tables_equal(exported.select(exp.column_names), exp)
    marker = json.load(open(f"{out}/_SUCCESS"))
    assert marker["manifest_version"] == ManifestLog(tgt).latest().version

    # resume: knock out one partition (simulate a crash before it wrote)
    victim = sorted(glob.glob(f"{out}/pid=*/part-0.parquet"))[3]
    os.unlink(victim)
    res2 = export_snapshot(tgt, out)
    assert res2["skipped"] == 7  # finished partitions untouched
    assert os.path.exists(victim)
    assert_tables_equal(_read_export(out).sort_by("url").select(exp.column_names), exp)


def test_export_resume_pins_manifest_version(tmp_lake, tmp_path):
    """A partial export is pinned to the manifest version it started
    with: resuming at a DIFFERENT version must refuse rather than stitch
    a mixed-version snapshot."""
    import pytest

    ct, tgt, _ = tmp_lake
    _run_stream(ct, tgt)
    log = ManifestLog(tgt)
    mid, latest = log.versions()[1], log.versions()[-1]
    out = str(tmp_path / "export_pin")
    export_snapshot(tgt, out, version=mid)
    # same-version re-export: pure resume, everything skipped
    res = export_snapshot(tgt, out, version=mid)
    assert res["skipped"] == res["partitions"]
    with pytest.raises(ValueError, match=f"partial export of manifest v{mid}"):
        export_snapshot(tgt, out)  # latest != mid


def test_export_as_of_version(tmp_lake, tmp_path):
    """Exporting AS OF an old manifest publishes exactly that prefix."""
    ct, tgt, _ = tmp_lake
    _run_stream(ct, tgt)
    log = ManifestLog(tgt)
    mid = log.versions()[1]
    out = str(tmp_path / "export_mid")
    export_snapshot(tgt, out, version=mid)
    exported = _read_export(out).sort_by("url")
    want = pa.Table.from_pandas(
        read_target_table(tgt, version=mid).to_pandas()
    ).sort_by("url")
    assert_tables_equal(exported.select(want.column_names), want)
