"""Downstream replication: change-data-feed → CT-log bridge.

The natural consumer of :func:`runner.read_change_feed`: a REPLICA of a
lake table is just another stream whose change source is the primary's
feed.  The bridge materializes the net changes committed on the primary
since the last bridged point as an ordinary CT-log segment (the same
version-range parquet the tailer consumes), so the replica runs the
UNMODIFIED engine — tailer, transforms, LWW merge, watermark commits —
and converges to the primary's exact state (hash-gated by the
``cdc_replica_sync`` driver query).  This is the reference app's own
topology one hop downstream: SQL Server → primary is CHANGETABLE → CT
segments; primary → replica is read_change_feed → CT segments.

Net-mode semantics make the bridge cheap and still exact for an LWW
replica: keys born AND deleted between bridges net out (the replica
never materializes them), and each surviving key ships ONE winner row
carrying its original ``sys_change_version`` — versions pass through,
so the replica's watermark speaks the primary's version domain and
bridging is idempotent/resumable from the segment directory alone.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from arcane_stream_sqlserver_change_tracking_ray.sources.ctlog import list_segments
from arcane_stream_sqlserver_change_tracking_ray.state.manifest import ManifestLog
from arcane_stream_sqlserver_change_tracking_ray.types import MERGE_KEY_COL

from arcane_stream_sqlserver_change_tracking_ray.stages.merge import CHANGE_TYPE_COL


def bridged_source_version(source_root: str, ct_dir: str) -> int:
    """The primary MANIFEST VERSION the bridge has already shipped:
    the latest source manifest whose watermark EQUALS the last bridged
    segment's hi bound (maintenance manifests share the cycle's
    watermark; the max version among them is correct because they
    append no deltas).  Oldest retained manifest when nothing has been
    bridged yet.

    Raises ``ValueError`` when the bookmark manifest has been EXPIRED on
    the primary: resuming from a later manifest would silently skip the
    changes in between and leave a version gap the replica tailer waits
    on forever — the same fail-loud contract as the direct feed path's
    expired-lookback error."""
    segs = list_segments(ct_dir)
    log = ManifestLog(source_root)
    versions = log.versions()
    if not segs:
        return versions[0]
    last_hi = segs[-1][1]
    # watermarks are monotone in version: scan newest-first, stop at the
    # first manifest at or below the bookmark (O(gap), not O(history))
    for v in reversed(versions):
        wm = log.read(v).watermark
        if wm <= last_hi:
            if wm != last_hi:
                raise ValueError(
                    f"replication bookmark (primary watermark {last_hi}) "
                    f"predates the oldest retained manifest history "
                    f"(nearest watermark {wm}); the primary's "
                    "retention_versions expired the lookback — "
                    "re-seed the replica from a snapshot export"
                )
            return v
    raise ValueError(
        f"replication bookmark (primary watermark {last_hi}) predates "
        "every retained manifest; re-seed the replica from a snapshot export"
    )


def bridge_changes(source_root: str, ct_dir: str) -> tuple[int, int] | None:
    """One bridge step: write the primary's net changes since the last
    bridged point as ONE CT-log segment under *ct_dir*; returns the
    segment's (lo, hi) version bounds, or ``None`` when the replica is
    caught up.  Driver-side materialization is bounded by the net
    change count (the feed itself resolves distributed; a huge backlog
    can be bridged in several steps by passing intermediate
    ``to_version`` manifests through :func:`bridged_source_version`'s
    contract — each cycle's worth of changes is one natural step)."""
    from arcane_stream_sqlserver_change_tracking_ray.gen import segment_path
    from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import (
        read_change_feed_table,
    )

    log = ManifestLog(source_root)
    from_version = bridged_source_version(source_root, ct_dir)
    latest = log.require_watermark()
    lo = log.read(from_version).watermark
    hi = latest.watermark
    if hi <= lo:
        return None
    feed = read_change_feed_table(
        source_root, from_version, latest.version, drop_meta=False
    )
    if feed.num_rows == 0:
        # every change in the range netted out: nothing for an LWW
        # replica to apply; leave the bookmark behind (idempotent)
        return None
    # the replica re-synthesizes the merge key from its own (matching)
    # key_columns config; change_type is feed-only metadata
    drop = [c for c in (CHANGE_TYPE_COL, MERGE_KEY_COL) if c in feed.column_names]
    seg = feed.drop_columns(drop)
    os.makedirs(ct_dir, exist_ok=True)
    # atomic publish: a polling replica must never see a half-written
    # segment, and a crash mid-write must not advance the bookmark
    # (bridged_source_version reads bounds from the FILE NAME)
    final = segment_path(ct_dir, lo, hi)
    import uuid

    tmp = os.path.join(ct_dir, f".tmp-{uuid.uuid4().hex}")
    pq.write_table(seg, tmp)
    os.replace(tmp, final)
    return lo, hi
