"""F4 metrics/lineage + skew telemetry + snapshot time travel."""

from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
from arcane_stream_sqlserver_change_tracking_ray.gen import (
    CtLogSpec,
    expected_final_state,
    small_spec,
    write_ctlog,
)
from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
    StreamRunner,
    read_target,
)
from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
    ManifestLog,
    prepare_watermark,
)
from tests.util import assert_tables_equal


def make_ctx(ct, tgt, rows=300):
    return StreamContext.from_dict(
        {
            "source": {"ctlog_dir": ct, "key_columns": ["url"]},
            "sink": {"target_root": tgt, "num_partitions": 8},
            "throughput": {"rows_per_group": rows},
            "maintenance": {"enabled": False},
        }
    )


def test_cycle_metrics_and_lineage_persisted(tmp_lake):
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, 0, num_partitions=8)
    metrics = StreamRunner(make_ctx(ct, tgt)).run()
    m = ManifestLog(tgt).latest()
    # per-cycle metrics persisted in the committed manifest (F4)
    assert m.metrics["changes_in"] > 0
    assert m.metrics["versions"][1] == 1000
    assert m.metrics["merge_s"] > 0
    assert "skew" in m.metrics and m.metrics["skew"]["max_over_mean"] >= 1.0
    # per-partition lineage: every live partition names its writing cycle
    assert set(m.lineage) >= set(m.partitions)
    for pid, lin in m.lineage.items():
        assert lin["rows"] >= 0 and lin["cycle"]
    # run() returned the same metrics stream
    assert [mm["versions"] for mm in metrics][-1][1] == 1000


def test_skew_metric_reflects_hot_keys(tmp_lake):
    """A storm on very few keys shows up in the skew histogram."""
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, CtLogSpec(n_keys=3, n_events=1500, zipf_a=6.0, events_per_file=1500))
    prepare_watermark(tgt, 0, num_partitions=8)
    StreamRunner(make_ctx(ct, tgt, rows=1500)).run()
    skew = ManifestLog(tgt).latest().metrics["skew"]
    # 3 keys over 8 partitions: at most 3 partitions touched, load uneven
    assert skew["max_partition_changes"] >= 1
    assert ManifestLog(tgt).latest().metrics["partitions_touched"] <= 3


def test_time_travel_read(tmp_lake):
    ct, tgt, _ = tmp_lake
    write_ctlog(ct, small_spec())
    prepare_watermark(tgt, 0, num_partitions=8)
    StreamRunner(make_ctx(ct, tgt, rows=500)).run()
    log = ManifestLog(tgt)
    versions = log.versions()
    assert len(versions) >= 3  # v0 + >=2 cycles
    mid = versions[1]  # after the first cycle
    wm_mid = log.read(mid).watermark
    old = read_target(tgt, version=mid)
    got = old.to_pandas()
    import pyarrow as pa

    exp = expected_final_state(ct, upto_version=wm_mid)
    assert_tables_equal(
        pa.Table.from_pandas(got).drop_columns(
            [c for c in ("sys_change_operation", "arcane_merge_key") if c in got.columns]
        ),
        exp,
    )
    # latest still equals the full oracle
    assert_tables_equal(
        read_target(tgt, drop_meta=True).to_pandas().pipe(pa.Table.from_pandas),
        expected_final_state(ct),
    )


def test_hot_key_storm_defused_by_precombine(tmp_lake):
    """north_rule skew clause: a storm where ~40% of ALL events hit one
    url must (a) still converge to the LWW oracle and (b) arrive at the
    partition owners near-balanced — the adaptive push-side LWW combine
    collapses the storm BEFORE the exchange (merge.py:112), which is the
    engine's hot-key defusal (strictly stronger than salting: salting
    spreads the hot key's rows, the combine deletes them)."""
    import numpy as np

    from arcane_stream_sqlserver_change_tracking_ray.gen import plan_events

    ct, tgt, _ = tmp_lake
    spec = CtLogSpec(n_keys=400, n_events=8000, zipf_a=7.0, events_per_file=2000)
    keys, _ops = plan_events(spec)
    hot_frac = np.bincount(keys).max() / len(keys)
    assert hot_frac > 0.30  # the raw feed really is a single-key storm
    write_ctlog(ct, spec)
    prepare_watermark(tgt, 0, num_partitions=8)
    StreamRunner(make_ctx(ct, tgt, rows=2000)).run()
    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import read_target_table

    assert_tables_equal(read_target_table(tgt), expected_final_state(ct))
    skew = ManifestLog(tgt).latest().metrics["skew"]
    # uncombined, the hot partition would carry ~hot_frac of all routed
    # rows: max/mean ≈ hot_frac * P ≈ 0.4 * 8 > 3; combined, the storm
    # key ships at most once per push task
    assert skew["max_over_mean"] < 2.0, skew
    # the telemetry names the mechanism: a storm-sized share of the
    # cycle's rows was collapsed before the exchange
    m = ManifestLog(tgt).latest().metrics
    assert m["precombined_rows"] > 0.25 * 2000, m["precombined_rows"]
