"""Ingest-time streaming dedup: signature chains, the sidecar's
exactly-once per-cycle fold, resume, and orphan tolerance."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from arcane_stream_sqlserver_change_tracking_ray.config import StreamContext
from arcane_stream_sqlserver_change_tracking_ray.functions.ingest_dedup import (
    _BLOOM_SUFFIX as _BLOOM,
    IngestDedupIndex,
    band_keys,
    doc_postings,
    text_hashes,
)
from arcane_stream_sqlserver_change_tracking_ray.gen import segment_path
from arcane_stream_sqlserver_change_tracking_ray.types import OP_COL, VERSION_COL
from arcane_stream_sqlserver_change_tracking_ray.pipelines.runner import StreamRunner
from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
    ManifestLog,
    prepare_watermark,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog today",   # 1 (cycle 1)
    "an entirely different document about arrow batches",  # 2 (cycle 1)
    "the quick brown fox jumps over the lazy dog today",   # 3 exact dup of 1
    "the quick brown fox jumps over the lazy cat today",   # 4 near dup of 1
    "short",                                               # 5 (no shingles)
    "yet another unrelated body of text for the index",    # 6
]


def _replay_docs(root: str, texts, n_segments: int) -> str:
    """texts -> CT feed (doc_id = version = 1..n) -> engine replay with
    one segment per cycle; returns target root."""
    import math

    ct, tgt = f"{root}/ctlog", f"{root}/target"
    os.makedirs(ct, exist_ok=True)
    n = len(texts)
    feed = pa.table(
        {
            "doc_id": pa.array(range(1, n + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            VERSION_COL: pa.array(range(1, n + 1), pa.int64()),
            OP_COL: pa.array(["U"] * n, pa.string()),
        }
    )
    chunk = max(math.ceil(n / n_segments), 1)
    prev = 0
    for off in range(0, n, chunk):
        sl = feed.slice(off, chunk)
        hi = int(sl[VERSION_COL][-1].as_py())
        pq.write_table(sl, segment_path(ct, prev, hi))
        prev = hi
    prepare_watermark(tgt, version=0, num_partitions=4)
    ctx = StreamContext.from_dict(
        {
            "source": {"ctlog_dir": ct, "key_columns": ["doc_id"]},
            "sink": {"target_root": tgt, "num_partitions": 4},
            "throughput": {"rows_per_group": chunk},
        }
    )
    StreamRunner(ctx).run()
    return tgt


def _flags_df(index: IngestDedupIndex):
    return (
        index.flags()
        .sort_by([("doc_id", "ascending")])
        .to_pandas()
        .reset_index(drop=True)
    )


def test_signature_chains_deterministic():
    texts = pa.array(TEXTS)
    th1, th2 = text_hashes(texts), text_hashes(texts)
    assert (th1 == th2).all()
    bk1, di1 = band_keys(texts)
    bk2, di2 = band_keys(texts)
    assert (bk1 == bk2).all() and (di1 == di2).all()
    # exact-dup pair shares the text hash; near pair does not
    assert th1[0] == th1[2] and th1[0] != th1[3]
    # 'short' has no 3-shingles -> emits no band keys
    assert 4 not in set(di1.tolist())
    # near-dup pair shares at least one band key
    k1 = set(bk1[di1 == 0].tolist())
    k4 = set(bk1[di1 == 3].tolist())
    assert k1 & k4


def test_doc_postings_shape():
    batch = pa.table(
        {"doc_id": pa.array([10, 11], pa.int64()),
         "text": pa.array([TEXTS[0], "short"], pa.string())}
    )
    post = doc_postings(batch, "doc_id", "text", 4)
    # one TEXT row per doc + 4 band rows for the long doc only
    kinds = post["kind"].to_pylist()
    assert kinds.count(0) == 2 and kinds.count(1) == 4
    assert set(post["pid"].to_pylist()) <= {0, 1, 2, 3}


def test_ingest_dedup_flags_earlier_cycles_only(tmp_path):
    tgt = _replay_docs(str(tmp_path), TEXTS, n_segments=3)  # 2 docs/cycle
    idx = IngestDedupIndex(str(tmp_path / "idx"), num_partitions=4)
    assert idx.advance(tgt) >= 3
    df = _flags_df(idx)
    assert len(df) == len(TEXTS)
    # doc 3 (cycle 2) exactly duplicates doc 1 (cycle 1)
    assert bool(df.loc[df.doc_id == 3, "exact_dup"].iloc[0])
    assert bool(df.loc[df.doc_id == 3, "near_candidate"].iloc[0])
    # doc 4 (cycle 2) is a near (not exact) dup of doc 1
    assert not bool(df.loc[df.doc_id == 4, "exact_dup"].iloc[0])
    assert bool(df.loc[df.doc_id == 4, "near_candidate"].iloc[0])
    # cycle-1 docs precede everything -> never flagged
    assert not df.loc[df.doc_id.isin([1, 2]), ["exact_dup", "near_candidate"]].any().any()
    # shingle-free doc: no near flag
    assert not bool(df.loc[df.doc_id == 5, "near_candidate"].iloc[0])
    # idempotent: nothing pending, flags unchanged
    assert idx.advance(tgt) == 0
    assert _flags_df(idx).equals(df)


def test_ingest_dedup_incremental_equals_full(tmp_path):
    # full fold at the end
    tgt_a = _replay_docs(str(tmp_path / "a"), TEXTS, n_segments=3)
    idx_a = IngestDedupIndex(str(tmp_path / "a_idx"), num_partitions=4)
    idx_a.advance(tgt_a)

    # fold after every upstream commit (a fresh IngestDedupIndex object
    # each time: resume is manifest state, not process state)
    tgt_b = _replay_docs(str(tmp_path / "b"), TEXTS, n_segments=3)
    idx_root_b = str(tmp_path / "b_idx")
    up = ManifestLog(tgt_b)
    for _v in up.versions():
        IngestDedupIndex(idx_root_b, num_partitions=4).advance(tgt_b)
    df_a = _flags_df(idx_a)
    df_b = _flags_df(IngestDedupIndex(idx_root_b, num_partitions=4))
    assert df_a[["doc_id", "exact_dup", "near_candidate"]].equals(
        df_b[["doc_id", "exact_dup", "near_candidate"]]
    )


def test_ingest_dedup_ignores_orphans(tmp_path):
    """A crashed attempt leaves posting/flag files the manifest never
    referenced; a re-advance must neither read nor double-count them."""
    tgt = _replay_docs(str(tmp_path), TEXTS, n_segments=3)
    idx_root = str(tmp_path / "idx")
    idx = IngestDedupIndex(idx_root, num_partitions=4)

    # fold only the first upstream cycle, then plant orphans simulating
    # a SIGKILL mid-second-cycle (files written, manifest not committed)
    up = ManifestLog(tgt)
    v1 = [v for v in up.versions() if v > 0][0]  # first real cycle
    idx.create()
    idx._advance_one(tgt, 0, v1, up.read(v1).watermark)
    junk = pa.table(
        {"k": pa.array([999], pa.int64()),
         "kind": pa.array([0], pa.int8()),
         "hk": pa.array([123456789], pa.uint64())}
    )
    os.makedirs(f"{idx_root}/postings/p0000", exist_ok=True)
    pq.write_table(junk, f"{idx_root}/postings/p0000/v99-deadbeef.parquet")
    flag_junk = pa.table(
        {"doc_id": pa.array([999], pa.int64()),
         "cycle": pa.array([99], pa.int64()),
         "exact_dup": pa.array([True]),
         "near_candidate": pa.array([True])}
    )
    os.makedirs(f"{idx_root}/flags", exist_ok=True)
    pq.write_table(flag_junk, f"{idx_root}/flags/v99-deadbeef.parquet")

    assert idx.advance(tgt) >= 2  # folds the rest
    df = _flags_df(idx)
    assert 999 not in set(df.doc_id)
    assert len(df) == len(TEXTS)
    # verdicts identical to a clean full fold
    tgt2 = _replay_docs(str(tmp_path / "clean"), TEXTS, n_segments=3)
    idx2 = IngestDedupIndex(str(tmp_path / "clean_idx"), num_partitions=4)
    idx2.advance(tgt2)
    assert df[["doc_id", "exact_dup", "near_candidate"]].equals(
        _flags_df(idx2)[["doc_id", "exact_dup", "near_candidate"]]
    )


def test_hk_bloom_properties():
    import numpy as np

    from arcane_stream_sqlserver_change_tracking_ray.functions.ingest_dedup import (
        build_hk_bloom,
        hk_bloom_may_contain,
    )

    rng = np.random.default_rng(11)
    inside = rng.integers(0, 1 << 63, size=5000, dtype=np.uint64)
    outside = rng.integers(0, 1 << 63, size=5000, dtype=np.uint64)
    outside = outside[~np.isin(outside, inside)]
    bs = build_hk_bloom(inside)
    # no false negatives
    assert hk_bloom_may_contain(bs, inside).all()
    # false-positive rate near the design point ((1/2)^4 ≈ 6%)
    fpr = hk_bloom_may_contain(bs, outside).mean()
    assert fpr < 0.15


def test_probe_prunes_disjoint_files(tmp_path):
    """A committed posting file with a sidecar and no shared keys is
    never read: flags identical, and deleting the parquet (keeping the
    sidecar) doesn't break the probe."""
    import numpy as np

    from arcane_stream_sqlserver_change_tracking_ray.functions.ingest_dedup import (
        _probe_pid,
        build_hk_bloom,
    )
    from arcane_stream_sqlserver_change_tracking_ray.state.fs import lakefs

    root = str(tmp_path)
    fs = lakefs(root)
    committed = pa.table(
        {"k": pa.array([1, 2], pa.int64()),
         "kind": pa.array([0, 1], pa.int8()),
         "hk": pa.array(np.array([111, 222], np.uint64), pa.uint64())}
    )
    fs.write_table(committed, "postings/p0000/v1-aaaa.parquet")
    hks = committed["hk"].to_numpy(zero_copy_only=False)
    kinds = committed["kind"].to_numpy(zero_copy_only=False)
    fs.write_npz("postings/p0000/v1-aaaa.parquet.bloom.npz", **{
        f"kind{kd}": build_hk_bloom(hks[kinds == kd]) for kd in (0, 1)
    })
    incoming = pa.table(
        {"k": pa.array([9], pa.int64()),
         "kind": pa.array([0], pa.int8()),
         "hk": pa.array(np.array([999999], np.uint64), pa.uint64())}
    )
    fs.write_table(incoming, "postings/p0000/v2-bbbb.parquet")
    # delete the committed parquet: if the bloom prunes it (it must —
    # disjoint keys), the probe never notices
    os.remove(f"{root}/postings/p0000/v1-aaaa.parquet")
    hits = _probe_pid(root, ["postings/p0000/v1-aaaa.parquet"],
                      ["postings/p0000/v2-bbbb.parquet"])
    assert hits.num_rows == 0


def test_compact_preserves_flags_and_bounds_files(tmp_path):
    """Compaction between cycles (the auto_compact_files posture) must
    leave every verdict identical to the never-compacted twin, fold each
    partition to one file, and survive the resident owners' loaded-rel
    vanish/rebuild path (the SAME index object advances across the
    swaps)."""
    tgt = _replay_docs(str(tmp_path), TEXTS, n_segments=3)

    plain = IngestDedupIndex(str(tmp_path / "plain_idx"), num_partitions=4)
    plain.advance(tgt)

    root_c = str(tmp_path / "compact_idx")
    idx = IngestDedupIndex(root_c, num_partitions=4, resident=True)
    idx.create()
    up = ManifestLog(tgt)
    done = 0
    for v in [v for v in up.versions() if v > 0]:
        idx._advance_one(tgt, done, v, up.read(v).watermark)
        idx.compact(min_files=2)
        done = v

    cols = ["doc_id", "exact_dup", "near_candidate"]
    assert _flags_df(plain)[cols].equals(_flags_df(idx)[cols])

    cur = ManifestLog(root_c).latest()
    assert all(len(rels) == 1 for rels in cur.partitions.values())
    # compacted files are sorted by (kind, hk) with duplicate hashes
    # dropped, and each carries a bloom sidecar
    import numpy as np

    from arcane_stream_sqlserver_change_tracking_ray.state.fs import lakefs

    fs = lakefs(root_c)
    for rels in cur.partitions.values():
        t = fs.read_table(rels[0])
        kind = t["kind"].to_numpy(zero_copy_only=False).astype(np.int64)
        hk = t["hk"].to_numpy(zero_copy_only=False)
        comb = list(zip(kind.tolist(), hk.tolist()))
        assert comb == sorted(set(comb))
        assert fs.read_npz(rels[0] + _BLOOM) is not None


def test_compact_crash_orphan_and_expiry(tmp_path):
    """A compacted file written by a crashed attempt is never referenced;
    after a successful compact, expire_versions reclaims the replaced
    posting files (bloom sidecars included) while flags stay readable."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.ingest_dedup import (
        _compact_pid,
    )
    from arcane_stream_sqlserver_change_tracking_ray.state.fs import lakefs

    tgt = _replay_docs(str(tmp_path), TEXTS, n_segments=3)
    root = str(tmp_path / "idx")
    idx = IngestDedupIndex(root, num_partitions=4)
    idx.advance(tgt)
    before = _flags_df(idx)

    log = ManifestLog(root)
    cur = log.latest()
    pid, rels = next((p, r) for p, r in sorted(cur.partitions.items())
                     if len(r) >= 2)
    # simulated SIGKILL between the compacted write and the commit
    orphan_rel, _, _ = _compact_pid(root, pid, rels, cur.version)
    assert orphan_rel not in set(log.latest().partitions.get(pid, []))

    folded = idx.compact(min_files=2)
    assert pid in folded and folded[pid][1] >= folded[pid][2]
    assert _flags_df(idx)[["doc_id", "exact_dup", "near_candidate"]].equals(
        before[["doc_id", "exact_dup", "near_candidate"]]
    )

    fs = lakefs(root)
    assert all(fs.exists(r) for r in rels)  # old manifests still own them
    expired = log.expire_versions(keep=1)
    assert expired
    assert not any(fs.exists(r) or fs.exists(r + _BLOOM) for r in rels)
    live = log.latest().partitions[pid]
    assert len(live) == 1 and fs.exists(live[0])
    assert _flags_df(idx)[["doc_id", "exact_dup", "near_candidate"]].equals(
        before[["doc_id", "exact_dup", "near_candidate"]]
    )


def test_resident_and_stateless_probes_agree(tmp_path):
    tgt = _replay_docs(str(tmp_path), TEXTS, n_segments=3)
    a = IngestDedupIndex(str(tmp_path / "ra"), num_partitions=4, resident=True)
    a.advance(tgt)
    b = IngestDedupIndex(str(tmp_path / "rb"), num_partitions=4, resident=False)
    b.advance(tgt)
    cols = ["doc_id", "exact_dup", "near_candidate"]
    assert _flags_df(a)[cols].equals(_flags_df(b)[cols])
