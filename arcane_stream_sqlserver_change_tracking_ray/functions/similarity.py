"""Similarity search over an embedding column (``list<float>``).

- **Brute-force cosine top-k** (the baseline): the query matrix is
  broadcast with ``ray.put`` ONCE and loaded per actor in ``__init__``;
  each batch is one numpy matmul; per-batch local top-k keeps only
  ``k`` candidate rows per query per batch, so the reduce input is
  tiny (batches x queries x k rows) regardless of corpus size.
- **LSH-bucketed variant** (the scale path): random-hyperplane bucket
  ids (seeded, deterministic) assigned per batch; the search probes
  only buckets within hamming distance ``probe_radius`` of the query's
  bucket — corpus scan cost drops by ~2^planes while recall stays
  high for near-duplicate use cases.
- **Embedding cosine near-dup**: all pairs with cosine >= threshold,
  via the same bucketing (candidates only within a bucket).

Embeddings are unpacked zero-copy: Arrow ``list<float>`` values buffer
reshaped to (n, d) — no per-row conversion.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def embedding_matrix(col) -> np.ndarray:
    """(n, d) float32 view of an Arrow list<float> column (zero-copy)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ListArray) or isinstance(col, pa.LargeListArray):
        flat = col.flatten()
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        d = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
    else:  # FixedSizeListArray
        flat = col.values
        d = col.type.list_size
    x = flat.to_numpy(zero_copy_only=False).astype(np.float32, copy=False)
    return x.reshape(len(col), d)


def _normalize(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return x / n


class BruteForceTopK:
    """map_batches actor: per-batch cosine scores + local top-k.

    Emits at most k rows per query per batch: (query_id, id, score).
    The final global top-k over these candidates is a trivially small
    sort."""

    def __init__(
        self,
        queries_ref,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
        k: int = 10,
        dtype=np.float64,
    ):
        # float64 default for bit-stable parity with SQL oracles; pass
        # float32 at scale for 2x bandwidth
        import ray

        q = queries_ref if isinstance(queries_ref, np.ndarray) else ray.get(queries_ref)
        self.dtype = dtype
        self.q = _normalize(np.asarray(q, dtype=dtype))  # (m, d)
        self.id_col, self.emb_col, self.k = id_col, emb_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        # empty blocks happen legitimately (e.g. lsh_topk's bucket filter on
        # a sparse bucket distribution); emit an empty result, don't crash
        if batch.num_rows == 0 or min(self.k, batch.num_rows) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    self.id_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        x = _normalize(embedding_matrix(batch[self.emb_col]).astype(self.dtype))  # (n, d)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        scores = x @ self.q.T  # (n, m)
        n, m = scores.shape
        k = min(self.k, n)
        top = np.argpartition(-scores, k - 1, axis=0)[:k]  # (k, m)
        qid = np.repeat(np.arange(m, dtype=np.int64), k)
        rid = ids[top.T.reshape(-1)]
        sc = scores[top.T.reshape(-1), np.repeat(np.arange(m), k)]
        return pa.table(
            {
                "query_id": pa.array(qid),
                self.id_col: pa.array(rid),
                "score": pa.array(np.round(sc.astype(np.float64), 6)),
            }
        )


def brute_force_topk(ds, queries: np.ndarray, k: int = 10, id_col="vec_id", emb_col="embedding"):
    """Global cosine top-k per query; returns a Dataset of exactly
    m*k rows (query_id, id, score), sorted by (query_id, -score, id).

    Runs as STATELESS tasks: the query matrix is tiny, so re-reading the
    broadcast ref per task costs nothing and no CPUs are pinned by an
    actor pool (a pool would starve small clusters; reserve pools for
    expensive state like models/indexes)."""
    import ray

    q_ref = ray.put(np.asarray(queries, dtype=np.float64))

    def score_batch(batch: pa.Table) -> pa.Table:
        return BruteForceTopK(q_ref, id_col=id_col, emb_col=emb_col, k=k)(batch)

    cand = ds.map_batches(score_batch, batch_format="pyarrow")

    def reduce_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group,
            sort_keys=[("score", "descending"), (id_col, "ascending")],
        )
        return group.take(idx[:k])

    return cand.groupby("query_id").map_groups(reduce_topk, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# LSH-bucketed variant (scale path)
# ---------------------------------------------------------------------------
def hyperplanes(d: int, planes: int = 8, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((d, planes)).astype(np.float32)


QUANT_SCALE = 10_000  #: fixed-point scale for the exact (oracle-able) LSH


def rademacher_planes(d: int, planes: int = 8, seed: int = 42) -> np.ndarray:
    """±1 hyperplanes from a splitmix64-style integer hash — sign-random
    projections (Achlioptas-sparse / Rademacher LSH) whose bucket bits
    are EXACT integer arithmetic, so an SQL oracle reproduces them
    bit-for-bit (gaussian planes + float dots cannot guarantee the sign
    of a near-zero float sum across engines)."""
    with np.errstate(over="ignore"):
        x = np.arange(d * planes, dtype=np.uint64) + np.uint64(seed) * np.uint64(
            0x9E3779B97F4A7C15
        )
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
    return np.where((x & np.uint64(1)).astype(bool), 1, -1).astype(
        np.int64
    ).reshape(d, planes)


def quantize_embeddings(x: np.ndarray, scale: int = QUANT_SCALE) -> np.ndarray:
    """int64 fixed-point view: ``floor(x*scale + 0.5)`` — every step
    (float32→float64 widening, one multiply, one add, floor) is
    correctly rounded IEEE, so numpy and SQL engines agree exactly."""
    return np.floor(x.astype(np.float64) * scale + 0.5).astype(np.int64)


def bucket_of_int(x: np.ndarray, planes_pm1: np.ndarray) -> np.ndarray:
    """Bucket ids from EXACT integer dot products with ±1 planes:
    bit p = (q · s_p) > 0.  No float appears anywhere."""
    bits = (quantize_embeddings(x) @ planes_pm1) > 0  # (n, planes) int64 math
    weights = (1 << np.arange(planes_pm1.shape[1], dtype=np.int64))[None, :]
    return (bits * weights).sum(axis=1).astype(np.int64)


def bucket_of(x: np.ndarray, planes_mat: np.ndarray) -> np.ndarray:
    bits = (x @ planes_mat) > 0  # (n, planes)
    weights = (1 << np.arange(planes_mat.shape[1], dtype=np.int64))[None, :]
    return (bits * weights).sum(axis=1).astype(np.int64)


class AssignBucket:
    def __init__(self, planes_ref, emb_col="embedding"):
        import ray

        self.planes = planes_ref if isinstance(planes_ref, np.ndarray) else ray.get(planes_ref)
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = embedding_matrix(batch[self.emb_col])
        if self.planes.dtype == np.int64:  # ±1 planes: exact integer path
            b = bucket_of_int(x, self.planes)
        else:
            b = bucket_of(_normalize(x), self.planes)
        return batch.append_column("_bucket", pa.array(b))


def make_planes(d: int, planes: int, seed: int, kind: str) -> np.ndarray:
    if kind == "rademacher":
        return rademacher_planes(d, planes, seed)
    if kind == "gaussian":
        return hyperplanes(d, planes, seed)
    raise ValueError(f"unknown plane kind {kind!r}")


def bucketize_embeddings(
    ds, planes=8, seed=42, emb_col="embedding", dim=None, plane_kind="gaussian"
):
    """Assign the deterministic LSH bucket id as a PERSISTENT ``_bucket``
    column.  At scale, run once and ``write_parquet`` the result (ideally
    partitioned by ``_bucket``): searches then reuse the stored index
    column instead of re-hashing the corpus per query set — pass the
    bucketized dataset straight to :func:`lsh_topk`, which detects the
    column and skips re-assignment."""
    import ray

    d = dim if dim is not None else embedding_dim(ds, emb_col)
    pl_ref = ray.put(make_planes(d, planes, seed, plane_kind))

    def assign(batch: pa.Table) -> pa.Table:
        return AssignBucket(pl_ref, emb_col=emb_col)(batch)

    return ds.map_batches(assign, batch_format="pyarrow")


def lsh_topk(ds, queries: np.ndarray, k=10, id_col="vec_id", emb_col="embedding", planes=8, probe_radius=1, seed=42, dim=None, plane_kind="gaussian"):
    """IVF/LSH-style ANN: scan only buckets within *probe_radius* bit
    flips of each query's bucket.  Recall < 1 by construction; the
    bucket filter runs as a vectorized predicate inside map_batches.

    If *ds* already carries a ``_bucket`` column (see
    :func:`bucketize_embeddings` — the persisted-index scale path, with
    the SAME planes/seed), assignment is skipped entirely."""
    import ray

    qraw = np.asarray(queries, dtype=np.float32)
    d = dim or qraw.shape[1]
    pl = make_planes(d, planes, seed, plane_kind)
    if plane_kind == "rademacher":
        qb = bucket_of_int(qraw, pl)
    else:
        qb = bucket_of(_normalize(qraw), pl)
    # candidate buckets per query: exact bucket + all within probe_radius flips
    probe: set[int] = set()
    for b in qb.tolist():
        probe.add(b)
        if probe_radius >= 1:
            for i in range(planes):
                probe.add(b ^ (1 << i))
        if probe_radius >= 2:
            for i in range(planes):
                for j in range(i + 1, planes):
                    probe.add(b ^ (1 << i) ^ (1 << j))
    probe_arr = np.array(sorted(probe), dtype=np.int64)
    pl_ref = ray.put(pl)

    def keep_probed(batch: pa.Table) -> pa.Table:
        b = batch["_bucket"].to_numpy(zero_copy_only=False)
        mask = np.isin(b, probe_arr)
        return batch.filter(pa.array(mask))

    try:
        has_bucket = "_bucket" in ds.schema().base_schema.names
    except Exception:
        has_bucket = False
    if not has_bucket:

        def assign(batch: pa.Table) -> pa.Table:
            return AssignBucket(pl_ref, emb_col=emb_col)(batch)

        ds = ds.map_batches(assign, batch_format="pyarrow")
    bucketed = ds.map_batches(keep_probed, batch_format="pyarrow")
    return brute_force_topk(bucketed, queries, k=k, id_col=id_col, emb_col=emb_col)


# ---------------------------------------------------------------------------
# embedding cosine near-duplicate pairs
# ---------------------------------------------------------------------------
def embedding_dim(ds, emb_col: str = "embedding") -> int:
    """Embedding dimensionality from the Dataset SCHEMA (no data read)
    for fixed_size_list columns; falls back to sniffing one batch for
    plain list<float> (schema carries no length there)."""
    try:
        field = ds.schema().base_schema.field(emb_col)
    except Exception:
        field = None
    if field is not None and pa.types.is_fixed_size_list(field.type):
        return field.type.list_size
    first = ds.take_batch(1, batch_format="pyarrow")
    return embedding_matrix(first[emb_col]).shape[1]


def embedding_neardup_pairs(
    ds, threshold=0.95, id_col="vec_id", emb_col="embedding", planes=6, seed=42,
    dim: int | None = None, max_bucket: int = 8192, plane_kind="gaussian",
):
    """All pairs (id_a < id_b) with cosine >= threshold.

    Bucket first (near-identical vectors share buckets with high
    probability), compare all pairs only within a bucket.  In-bucket
    comparison is O(n²); *max_bucket* caps n per bucket (truncation is
    LOGGED, never silent — a capped bucket means the hyperplane count
    should be raised for this corpus)."""
    import ray

    d = dim if dim is not None else embedding_dim(ds, emb_col)
    pl_ref = ray.put(make_planes(d, planes, seed, plane_kind))

    def pairs(group: pa.Table) -> pa.Table:
        # float64 like BruteForceTopK: normalize-then-dot in f64 matches
        # SQL list_cosine_similarity at 6-decimal rounding
        x = _normalize(embedding_matrix(group[emb_col]).astype(np.float64))
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        x, ids = x[order], ids[order]
        if len(ids) > max_bucket:
            import logging

            logging.getLogger("arcane_ray.similarity").warning(
                "neardup bucket capped: %d -> %d vectors (raise `planes` "
                "to split this bucket)", len(ids), max_bucket,
            )
            x, ids = x[:max_bucket], ids[:max_bucket]
        s = x @ x.T
        ia, ib = np.triu_indices(len(ids), k=1)
        # threshold the ROUNDED cosine (the emitted value): unrounded
        # float64 expressions associate differently across engines by
        # ULPs, so an exact pair-set contract needs the compare to happen
        # on the same 6-decimal value both sides emit
        sr = np.round(s[ia, ib].astype(np.float64), 6)
        m = sr >= threshold
        return pa.table(
            {
                "id_a": pa.array(ids[ia[m]]),
                "id_b": pa.array(ids[ib[m]]),
                "cosine": pa.array(sr[m]),
            }
        )

    def assign(batch: pa.Table) -> pa.Table:
        return AssignBucket(pl_ref, emb_col=emb_col)(batch)

    bucketed = ds.map_batches(assign, batch_format="pyarrow")
    return bucketed.groupby("_bucket").map_groups(pairs, batch_format="pyarrow")


def kmeans_centroids(
    ds,
    k: int = 16,
    iters: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> np.ndarray:
    """Deterministic distributed k-means on the (normalized) embeddings:
    init = the k lowest-id vectors; each Lloyd iteration is one
    ``map_batches`` pass emitting per-batch partial sums (k x d) +
    counts, folded on the driver (tiny: k x d floats per batch task).
    Nothing but centroids ever leaves the workers."""
    import ray

    d = dim if dim is not None else embedding_dim(ds, emb_col)
    # iterative refinement re-scans the corpus once per Lloyd pass: pin the
    # (2-column, pruned) projection in the object store once instead of
    # re-reading parquet every pass — the canonical Ray iterative-ML shape
    # (blocks spill under pressure; nothing lands on the driver)
    ds = ds.materialize()

    def seed_partial(batch: pa.Table) -> pa.Table:
        # per-batch k-lowest-id rows; the global k-lowest is a fold over
        # num_blocks * k tiny rows — replaces a full sort shuffle
        m = min(k, batch.num_rows)
        if m == 0:
            return batch.select([id_col, emb_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        low = np.argpartition(ids, m - 1)[:m]
        return batch.select([id_col, emb_col]).take(pa.array(np.sort(low)))

    seed_tbl = pa.concat_tables(
        ray.get(ds.map_batches(seed_partial, batch_format="pyarrow").to_arrow_refs())
    )
    order = np.argsort(seed_tbl[id_col].to_numpy(zero_copy_only=False))[:k]
    cents = _normalize(
        embedding_matrix(seed_tbl[emb_col].combine_chunks().take(pa.array(order)))
        .astype(np.float64)
        .reshape(k, d)
    )
    for _ in range(iters):
        c_ref = ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            if batch.num_rows == 0:
                z = np.zeros_like(c)
                return pa.table(
                    {
                        "sums": pa.array([z.reshape(-1)]),
                        "counts": pa.array([np.zeros(len(c), np.int64)]),
                    }
                )
            x = _normalize(embedding_matrix(batch[emb_col]).astype(np.float64))
            a = np.argmax(x @ c.T, axis=1)  # cosine assignment
            sums = np.zeros_like(c)
            np.add.at(sums, a, x)
            counts = np.bincount(a, minlength=len(c)).astype(np.int64)
            return pa.table(
                {"sums": pa.array([sums.reshape(-1)]), "counts": pa.array([counts])}
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros_like(cents)
        counts = np.zeros(k, np.int64)
        for r in parts:
            sums += np.asarray(r["sums"], np.float64).reshape(k, -1)
            counts += np.asarray(r["counts"], np.int64)
        nz = counts > 0
        cents[nz] = _normalize(sums[nz] / counts[nz, None])
    return cents


# ---------------------------------------------------------------------------
# IVF (inverted-file) index: persisted, manifest-registered sidecar
# ---------------------------------------------------------------------------
#: stats key under which an IVF index manifest records its parameters
IVF_STATS_KEY = "ivf"
#: target rows per build task so posting files don't shatter (each task
#: writes at most one file per cluster PRESENT in its batch)
IVF_BUILD_ROWS_PER_TASK = 65_536


def ivf_source_fingerprint(ds, params: dict) -> str | None:
    """Deterministic identity of (corpus files, index params) for index
    reuse: input parquet paths + size + mtime + the build parameters.
    Returns None when the dataset has no file-backed inputs (e.g.
    ``from_arrow`` test corpora) — such builds are ephemeral."""
    import hashlib
    import json as _json
    import os

    try:
        files = sorted(ds.input_files() or [])
    except Exception:
        files = []
    if not files:
        return None
    sig = []
    for f in files:
        p = f[7:] if f.startswith("file://") else f
        try:
            st = os.stat(p)
            sig.append((f, st.st_size, int(st.st_mtime)))
        except OSError:
            sig.append((f, -1, -1))
    blob = _json.dumps({"files": sig, "params": params}, sort_keys=True)
    return hashlib.sha1(blob.encode()).hexdigest()


def build_ivf_index(
    ds,
    index_root: str,
    *,
    n_clusters: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    source_fingerprint: str = "",
):
    """ONE-TIME maintenance-style pass that persists an IVF index as a
    manifest-backed sidecar table under *index_root* (r4 verdict #1:
    at 100 TB the coarse quantizer must be built once and registered,
    never rebuilt per query).

    Layout — the index IS a lake table whose partitions are the IVF
    clusters: manifest pid ``c`` lists that cluster's posting files
    (``clusters/c<c>/part-*.parquet``, columns = id + embedding only),
    ``centroids.npz`` holds the k x d coarse quantizer, and the manifest
    ``stats["ivf"]`` records the build parameters + source fingerprint.
    Readers therefore locate the nprobe probed clusters' files straight
    from the manifest — scan bytes ~ nprobe/n_clusters of the corpus —
    and the manifest log's conditional-PUT commit makes concurrent
    builders safe (exactly one v1 wins).

    Build shape: distributed k-means (the only full-corpus iteration —
    justified at build time, never at query time), then ONE streaming
    assignment pass with NO shuffle: each task argsort-splits its batch
    by assigned cluster and appends one posting file per cluster present
    (tasks are sized ~:data:`IVF_BUILD_ROWS_PER_TASK` rows so postings
    don't shatter); the driver folds only (cluster, path, rows) rows."""
    import ray
    import ray.data

    from arcane_stream_sqlserver_change_tracking_ray.state.fs import lakefs
    from arcane_stream_sqlserver_change_tracking_ray.state.manifest import (
        ManifestLog,
        prepare_watermark,
    )

    # k-means iterates over the corpus: pin the (2-column, pruned)
    # projection once for the Lloyd passes AND the assignment pass
    ds = ds.select_columns([id_col, emb_col]).materialize()
    cents = kmeans_centroids(ds, n_clusters, iters, emb_col, id_col)
    n_rows = ds.count()
    # right-size build tasks: a task per ~IVF_BUILD_ROWS_PER_TASK rows
    # keeps posting files chunky without ever gathering a cluster whole
    want_tasks = max(1, -(-n_rows // IVF_BUILD_ROWS_PER_TASK))
    if ds.num_blocks() > want_tasks:
        ds = ds.repartition(want_tasks)
    c_ref = ray.put(cents)
    root = index_root

    def write_postings(batch: pa.Table) -> pa.Table:
        import uuid as _uuid

        empty = pa.table(
            {
                "cluster": pa.array([], pa.int64()),
                "rel": pa.array([], pa.string()),
                "rows": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        cents_ = ray.get(c_ref)
        x = _normalize(embedding_matrix(batch[emb_col]).astype(np.float64))
        a = np.argmax(x @ cents_.T, axis=1)
        order = np.argsort(a, kind="stable")
        tbl = batch.select([id_col, emb_col]).take(pa.array(order))
        a = a[order]
        uniq, starts = np.unique(a, return_index=True)
        fs = lakefs(root)
        out_c, out_rel, out_rows = [], [], []
        for i, c in enumerate(uniq.tolist()):
            s = int(starts[i])
            e = int(starts[i + 1]) if i + 1 < len(starts) else len(a)
            rel = f"clusters/c{c:05d}/part-{_uuid.uuid4().hex}.parquet"
            fs.write_table(tbl.slice(s, e - s), rel)
            out_c.append(c)
            out_rel.append(rel)
            out_rows.append(e - s)
        return pa.table(
            {
                "cluster": pa.array(out_c, pa.int64()),
                "rel": pa.array(out_rel, pa.string()),
                "rows": pa.array(out_rows, pa.int64()),
            }
        )

    # batch_size=None = whole block per task (blocks were right-sized above)
    listing = ds.map_batches(
        write_postings, batch_format="pyarrow", batch_size=None
    ).take_all()  # O(tasks x clusters-present) tiny rows, never data

    fs = lakefs(root)
    fs.write_npz("centroids.npz", centroids=cents)
    prepare_watermark(root, version=0, num_partitions=n_clusters)
    log = ManifestLog(root)
    cur = log.require_watermark()
    nxt = cur.next()
    parts: dict[int, list[str]] = {}
    rows_per_cluster: dict[int, int] = {}
    for r in listing:
        parts.setdefault(int(r["cluster"]), []).append(r["rel"])
        rows_per_cluster[int(r["cluster"])] = rows_per_cluster.get(
            int(r["cluster"]), 0
        ) + int(r["rows"])
    nxt.partitions = {c: sorted(v) for c, v in parts.items()}
    nxt.stats[IVF_STATS_KEY] = {
        "n_clusters": n_clusters,
        "iters": iters,
        "id_col": id_col,
        "emb_col": emb_col,
        "dim": int(cents.shape[1]),
        "rows": int(n_rows),
        "rows_per_cluster": {str(c): rows_per_cluster[c] for c in sorted(rows_per_cluster)},
        "centroids": "centroids.npz",
        "source_fingerprint": source_fingerprint,
    }
    return log.commit(nxt, expect_version=cur.version)


def load_ivf_index(index_root: str):
    """(centroids, manifest, meta) from a persisted IVF sidecar; raises
    if *index_root* holds no committed index."""
    from arcane_stream_sqlserver_change_tracking_ray.state.fs import lakefs
    from arcane_stream_sqlserver_change_tracking_ray.state.manifest import ManifestLog

    log = ManifestLog(index_root)
    m = log.latest()
    if m is None or IVF_STATS_KEY not in m.stats:
        raise FileNotFoundError(f"no IVF index committed under {index_root}")
    meta = m.stats[IVF_STATS_KEY]
    z = lakefs(index_root).read_npz(meta["centroids"])
    return np.asarray(z["centroids"], dtype=np.float64), m, meta


def ivf_probe(
    index_root: str,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
):
    """Query-time IVF probe: load the (tiny) centroids + manifest, pick
    the ``nprobe`` nearest clusters per query, and ``read_parquet`` ONLY
    those clusters' posting files — no corpus materialization, no
    k-means, scan bytes ~ nprobe/n_clusters of the corpus.  Candidates
    from the probed union are scored for every query (union semantics,
    same as the pre-index implementation: extra candidates can only
    IMPROVE recall, never change a true top-k)."""
    import ray.data

    from arcane_stream_sqlserver_change_tracking_ray.state.fs import lakefs

    cents, manifest, meta = load_ivf_index(index_root)
    id_col, emb_col = meta["id_col"], meta["emb_col"]
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]  # (m, nprobe)
    probed = np.unique(probe.reshape(-1))
    fs = lakefs(index_root)
    files = [
        fs.full(rel)
        for c in probed.tolist()
        for rel in manifest.partitions.get(int(c), [])
    ]
    if not files:  # every probed cluster empty (empty corpus)
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        return ray.data.from_arrow(empty)
    cand = ray.data.read_parquet(files)
    return brute_force_topk(cand, q, k=k, id_col=id_col, emb_col=emb_col)


def ivf_probe_table(
    target_root: str,
    queries: np.ndarray,
    *,
    emb_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
):
    """ANN probe against a LAKE TABLE whose IVF sidecar was registered by
    the ``build_ivf_sidecar`` maintenance pass: table manifest →
    ``stats["_ivf_index"][emb_col]`` pointer → index manifest → probed
    clusters' posting files.  Two tiny manifest reads, then scan bytes
    ~ nprobe/n_clusters of the corpus."""
    from arcane_stream_sqlserver_change_tracking_ray.state.manifest import ManifestLog

    m = ManifestLog(target_root).require_watermark()
    pointers = m.stats.get("_ivf_index") or {}
    if emb_col not in pointers:
        raise FileNotFoundError(
            f"table {target_root} has no IVF index for column {emb_col!r}; "
            "run the build_ivf_sidecar maintenance pass first"
        )
    return ivf_probe(
        f"{target_root}/{pointers[emb_col]['root']}", queries, k=k, nprobe=nprobe
    )


#: cache root for ivf_topk's build-once-probe-many path (fingerprint-keyed)
IVF_CACHE_ROOT = "/tmp/graft_ivf_cache"


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    iters: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    index_root: str | None = None,
):
    """IVF ANN over *ds*: probe a PERSISTED index, building it first only
    if absent.  With *index_root* given, that index is used (built there
    if missing).  Otherwise the index lands in a fingerprint-keyed cache
    dir — same corpus files + params ⇒ the build runs once and every
    later call goes straight to :func:`ivf_probe`; non-file-backed
    datasets (test corpora) build an ephemeral throwaway index.

    Output is identical to the pre-index implementation (same seeded
    k-means, same probed-union candidate set, same float64 scoring) —
    the exact brute-force top-k oracle still hashes equal at the tuned
    recall-1.0 settings."""
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    params = {
        "n_clusters": n_clusters,
        "iters": iters,
        "id_col": id_col,
        "emb_col": emb_col,
        "v": 1,
    }
    cached = False
    if index_root is None:
        fp = ivf_source_fingerprint(ds, params)
        if fp is None:
            # non-file-backed corpus: ephemeral throwaway index (files
            # must outlive this call — the returned Dataset reads them
            # lazily — so the dir is left for /tmp cleanup, not rm'd)
            index_root = tempfile.mkdtemp(prefix="ivf-ephemeral-")
        else:
            index_root = os.path.join(IVF_CACHE_ROOT, fp)
            cached = True
    try:
        load_ivf_index(index_root)
    except FileNotFoundError:
        if cached:
            # concurrent-build safety without locks: build into a
            # private dir, publish with one atomic rename; a loser
            # just uses the winner's index
            os.makedirs(IVF_CACHE_ROOT, exist_ok=True)
            stage = os.path.join(IVF_CACHE_ROOT, f".build-{_uuid.uuid4().hex}")
            build_ivf_index(
                ds, stage, n_clusters=n_clusters, iters=iters,
                id_col=id_col, emb_col=emb_col,
                source_fingerprint=os.path.basename(index_root),
            )
            try:
                os.rename(stage, index_root)
            except OSError:
                shutil.rmtree(stage, ignore_errors=True)
        else:
            build_ivf_index(
                ds, index_root, n_clusters=n_clusters, iters=iters,
                id_col=id_col, emb_col=emb_col,
            )
    return ivf_probe(index_root, queries, k=k, nprobe=nprobe)


#: exact_cosine_pairs refuses above this corpus size — it is the small-
#: scale oracle twin (driver concat + whole-matrix broadcast); the scale
#: paths are embedding_neardup_pairs (LSH) and ann_ivf_topk
EXACT_PAIRS_MAX_ROWS = 2_000_000


def exact_cosine_pairs(
    ds, threshold=0.45, id_col: str = "vec_id", emb_col: str = "embedding"
):
    """EXACT all-pairs cosine near-dup: every pair (id_a < id_b) with
    cosine >= threshold — the brute-force baseline that an SQL oracle
    can verify (``embedding_neardup_pairs`` above is the LSH-bucketed
    scale path and misses cross-bucket pairs by design).

    Shape: the normalized corpus matrix is broadcast ONCE (``ray.put``);
    each batch computes one (batch x corpus) float64 matmul and emits
    only pairs where the batch row's id < the other id, so every pair
    surfaces exactly once with no shuffle.  Broadcasting the matrix is
    O(n·d) memory per node — beyond ~10^7 vectors switch to the LSH
    path or an IVF index; this operator is the exact/oracle baseline.
    Scores are intentionally NOT emitted (float rounding differs across
    engines; the pair SET is the deterministic contract)."""
    import ray

    tbl = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    if tbl.num_rows > EXACT_PAIRS_MAX_ROWS:
        raise ValueError(
            f"exact_cosine_pairs is the exact/oracle baseline and broadcasts "
            f"the whole corpus matrix: {tbl.num_rows} rows exceeds the "
            f"{EXACT_PAIRS_MAX_ROWS}-row guard; use embedding_neardup_pairs "
            "(LSH-bucketed) or ann_ivf_topk at scale"
        )
    ids_all = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    m = _normalize(embedding_matrix(tbl[emb_col]).astype(np.float64))
    mat_ref = ray.put((ids_all, m))

    def pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        all_ids, mat = ray.get(mat_ref)
        x = _normalize(embedding_matrix(batch[emb_col]).astype(np.float64))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = x @ mat.T  # (b, n)
        hit = s >= threshold
        # emit once: only pairs where this batch's id is the smaller one
        hit &= ids[:, None] < all_ids[None, :]
        bi, ci = np.nonzero(hit)
        if not len(bi):
            return empty
        return pa.table(
            {
                "id_a": pa.array(ids[bi], pa.int64()),
                "id_b": pa.array(all_ids[ci], pa.int64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")
