"""Ingest-time streaming dedup: flag every incoming document against a
PERSISTED dedup index maintained exactly-once per committed cycle.

At 100 TB you dedup Common-Crawl-style corpora AT INGEST, not as a
post-pass over the whole lake: each CDC cycle's fresh documents are
checked against everything ingested in STRICTLY EARLIER cycles, then
folded into the index — so the index grows with the corpus while each
cycle's work is bounded by the cycle.

Two detectors per document, both bit-reproducible in DuckDB (the
repo-wide oracle discipline):

* ``exact_dup`` — whole-text polynomial hash (base 1000003 mod 2^64,
  the same definition as ``train_eval_split``) seen in an earlier cycle.
* ``near_candidate`` — MinHash-LSH band collision: 3-word-shingle poly
  hashes (``shingle_hashes(hash_impl='poly')``, the SimHash oracle's
  chain) are min-reduced under ``n_bands*rows_per_band`` affine
  permutations of Z/2^64 (odd multiplier + offset — TRUE bijections,
  wrap arithmetic is exact on both sides via the split-32 HUGEINT
  multiply), and each band's row minima Horner-combine into one uint64
  band key.  A band key seen in an earlier cycle flags the doc as a
  near-duplicate candidate (the LSH candidate stage of MinHash dedup —
  production pipelines verify candidates with true Jaccard; the
  all-pairs verifier already exists in ``dedup.py``).

Index layout (the sidecar IS a lake table, same protocol as the IVF
sidecar in ``similarity.py``): posting files of ``(k, kind, hk)`` rows
hash-partitioned by ``hk % num_partitions`` under ``postings/p{pid}/``,
per-cycle flag files under ``flags/``, and a manifest whose watermark
mirrors the upstream table's — committed with the conditional-PUT CAS,
so a SIGKILL mid-cycle leaves only orphaned posting files and the
re-run re-derives the identical cycle (exactly-once by construction:
flags for cycle N depend only on the index state committed for cycles
< N, never on partial work).

Scale shape per cycle: signatures are computed ``map_batches`` over the
upstream change feed (vectorized, zero per-row Python); incoming
postings are WRITTEN per partition by the same tasks (no driver data
hop); probing is per touched partition with TWO modes — the default
RESIDENT mode probes a per-pid :class:`PidOwner` actor that keeps the
committed hk sets sorted in memory across cycles (probe cost
O(incoming·log index), zero index re-reads; restart-safe because memory
is incrementally synced to exactly the committed posting list), and the
stateless mode re-reads committed posting files with bloom-sidecar
pruning (right for sparse/one-shot probes; a BULK cycle's key set hits
every file with probability ~1, which is why resident is the default).
Either way only the HIT keys return to the driver — bounded by the
duplicate rate, exactly like ``dedup_minhash``'s candidate-pair table;
flags are then written distributed with the hit-key sets broadcast via
``ray.put``.  Reference analog: the reference dedups nothing — this is
part of the beyond-reference training-data suite, fused with the S1/M1
cycle commit protocol (reference stream lifecycle: ``main.scala:69-117``).
"""

from __future__ import annotations

import uuid
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.fs import lakefs
from .dedup import shingle_hashes
from .text import rolling_window_hashes

_U64 = np.uint64
_MASK64 = (1 << 64) - 1

#: default LSH geometry: 4 bands x 2 rows -> candidate threshold around
#: Jaccard ~ (1/4)^(1/2) = 0.5, matching ``dedup_minhash``'s tau
N_BANDS = 4
ROWS_PER_BAND = 2
PERM_SEED = 7
#: Horner base for band-key combine (same small base as the poly chain,
#: products stay under 2^84 -> plain HUGEINT in the oracle)
_BAND_BASE = 1000003

TEXT_KIND = 0
BAND_KIND = 1


def perm_constants(
    n_perm: int = N_BANDS * ROWS_PER_BAND, seed: int = PERM_SEED
) -> tuple[np.ndarray, np.ndarray]:
    """Seeded (A, B) for the affine permutations ``x -> A*x + B mod 2^64``
    (A odd => bijective).  Shared with the SQL oracle as literal
    constants, like ``_rademacher_values_sql`` shares its plane matrix."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, _MASK64, size=n_perm, dtype=np.uint64) | _U64(1)
    b = rng.integers(0, _MASK64, size=n_perm, dtype=np.uint64)
    return a, b


def text_hashes(texts) -> np.ndarray:
    """Whole-text polynomial hash per doc (empty text -> 0) — identical
    to ``train_eval_split``'s definition and its DuckDB twin."""
    h, offs = rolling_window_hashes(texts, k=1 << 31)
    out = np.zeros(len(offs) - 1, np.uint64)
    out[np.diff(offs) > 0] = h
    return out


def band_keys(
    texts,
    n_bands: int = N_BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    seed: int = PERM_SEED,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc LSH band keys.

    Returns ``(keys, doc_idx)`` — flat uint64 band keys and the local
    doc index each belongs to; docs with no 3-shingles emit none.  Band
    b's key is ``Horner_b(min-perm row minima) + b  (mod 2^64)`` — the
    band index folds INTO the key so a cross-band collision cannot
    alias (the index stores keys flat, the oracle groups by the same
    combined value)."""
    h, offs = shingle_hashes(texts, 3, hash_impl="poly")
    n_docs = len(offs) - 1
    counts = np.diff(offs)
    has = counts > 0
    if h.size == 0 or not has.any():
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    a, b = perm_constants(n_bands * rows_per_band, seed)
    starts = offs[:-1][has]
    docs = np.flatnonzero(has).astype(np.int64)
    with np.errstate(over="ignore"):
        minima = np.empty((len(docs), n_bands * rows_per_band), np.uint64)
        for i in range(n_bands * rows_per_band):
            hv = h * a[i] + b[i]  # uint64 wrap == mod 2^64
            minima[:, i] = np.minimum.reduceat(hv, starts)
        keys = np.empty((len(docs), n_bands), np.uint64)
        for bnd in range(n_bands):
            acc = np.zeros(len(docs), np.uint64)
            for r in range(rows_per_band):
                acc = acc * _U64(_BAND_BASE) + minima[:, bnd * rows_per_band + r]
            keys[:, bnd] = acc + _U64(bnd)
    return keys.reshape(-1), np.repeat(docs, n_bands)


def doc_postings(
    batch: pa.Table,
    key_col: str,
    text_col: str,
    num_partitions: int,
    n_bands: int = N_BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    seed: int = PERM_SEED,
) -> pa.Table:
    """``(k, kind, hk, pid)`` posting rows for a batch of documents:
    one TEXT_KIND row per doc (its whole-text hash — this also
    enumerates the cycle's docs exactly once) plus one BAND_KIND row per
    non-degenerate band key."""
    keys_col = batch[key_col]
    if isinstance(keys_col, pa.ChunkedArray):
        keys_col = keys_col.combine_chunks()
    th = text_hashes(batch[text_col])
    bk, doc_idx = band_keys(batch[text_col], n_bands, rows_per_band, seed)
    k_out = pa.concat_arrays(
        [keys_col, keys_col.take(pa.array(doc_idx, pa.int64()))]
    )
    kind = np.concatenate(
        [np.full(len(th), TEXT_KIND, np.int8), np.full(len(bk), BAND_KIND, np.int8)]
    )
    hk = np.concatenate([th, bk])
    return pa.table(
        {
            "k": k_out,
            "kind": pa.array(kind, pa.int8()),
            "hk": pa.array(hk, pa.uint64()),
            "pid": pa.array((hk % _U64(num_partitions)).astype(np.int32), pa.int32()),
        }
    )


#: posting-file bloom sidecars: hk values are already uniform uint64, so
#: the filter hashes are derived directly (h1 = hk, h2 = (hk>>33)|1 —
#: the same double-hashing scheme as merge.py's merge-key blooms) with
#: one bitset per posting kind.  They serve the STATELESS probe path: a
#: file is read only when some incoming key might be inside — effective
#: for sparse/point probes (cold resumes, trickle cycles); a bulk
#: cycle's key set hits every file with probability ~1, which is what
#: the resident PidOwner path is for (see its docstring).
_BLOOM_SUFFIX = ".bloom.npz"
_BLOOM_BITS_PER_KEY = 10
_BLOOM_HASHES = 4


def _bloom_m_bits(n_keys: int) -> int:
    m = 64
    while m < n_keys * _BLOOM_BITS_PER_KEY:
        m <<= 1
    return m


def _bloom_positions(hk: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    h2 = (hk >> _U64(33)) | _U64(1)
    idx = np.empty((_BLOOM_HASHES, len(hk)), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(_BLOOM_HASHES):
            idx[i] = (hk + _U64(i) * h2) % _U64(m)
    return idx >> _U64(6), idx & _U64(63)


def build_hk_bloom(hk: np.ndarray) -> np.ndarray:
    m = _bloom_m_bits(max(len(hk), 1))
    words, bits = _bloom_positions(hk, m)
    out = np.zeros(m >> 6, dtype=np.uint64)
    np.bitwise_or.at(out, words.ravel(), _U64(1) << bits.ravel())
    return out


def hk_bloom_may_contain(bitset: np.ndarray, hk: np.ndarray) -> np.ndarray:
    m = len(bitset) << 6
    words, bits = _bloom_positions(hk, m)
    hit = np.ones(words.shape[1], dtype=bool)
    for i in range(_BLOOM_HASHES):
        hit &= (bitset[words[i]] >> bits[i]) & _U64(1) != 0
    return hit


def _write_posting_bloom(fs, rel: str, kind: np.ndarray, hk: np.ndarray) -> None:
    """Bloom sidecar for a posting file: one bitset per posting kind."""
    fs.write_npz(rel + _BLOOM_SUFFIX, **{
        f"kind{k}": build_hk_bloom(hk[kind == k])
        for k in (TEXT_KIND, BAND_KIND)
        if (kind == k).any()
    })


def _compact_pid(
    index_root: str, pid: int, rels: list[str], version: int
) -> tuple[str, int, int]:
    """Fold one partition's committed posting files into a single file
    sorted by (kind, hk) with duplicate (kind, hk) rows dropped — probes
    only test hk membership per kind, so multiplicity carries no
    information (the same doc text re-ingested across cycles repeats its
    hashes).  Returns ``(new_rel, rows_before, rows_after)``.  The file
    is an orphan until the caller's manifest commit swaps it in; a crash
    between write and commit leaves it unreferenced and ignored, the
    same protocol as the engine's staging sweep.  (lakefs imported at
    module level: ships to workers as a raw ``ray.remote``.)"""
    fs = lakefs(index_root)
    t = pa.concat_tables([fs.read_table(r) for r in rels])
    kind = t["kind"].to_numpy(zero_copy_only=False)
    hk = t["hk"].to_numpy(zero_copy_only=False)
    # lexsort by (kind, hk); first occurrence keeps its k
    order = np.lexsort((hk, kind))
    kind_s, hk_s = kind[order], hk[order]
    first = np.ones(len(order), bool)
    if len(order) > 1:
        first[1:] = (kind_s[1:] != kind_s[:-1]) | (hk_s[1:] != hk_s[:-1])
    keep = order[first]
    out = t.take(pa.array(keep))
    rel = f"postings/p{pid:04d}/compact-v{version}-{uuid.uuid4().hex}.parquet"
    fs.write_table(out, rel)
    _write_posting_bloom(fs, rel, kind_s[first], hk_s[first])
    return rel, t.num_rows, out.num_rows


def _probe_pid(
    index_root: str, committed_rels: list[str], incoming_rels: list[str]
) -> pa.Table:
    """One partition's probe: which incoming (k, kind, hk) rows collide
    with the committed index?  Returns ONLY the hits (duplicate-rate
    bounded), never the postings themselves; committed files whose bloom
    sidecar rules out every incoming key are never read (files without a
    sidecar are always read).  (lakefs is a
    MODULE-level import: this function ships to workers as a raw
    ``ray.remote``, and a body-level package import breaks under
    foreign-cwd workers.)"""
    fs = lakefs(index_root)
    inc = pa.concat_tables([fs.read_table(r) for r in incoming_rels])
    if inc.num_rows == 0 or not committed_rels:
        return inc.select(["k", "kind"]).slice(0, 0)
    inc_kind = inc["kind"].to_numpy(zero_copy_only=False)
    inc_hk = inc["hk"].to_numpy(zero_copy_only=False)
    by_kind = {
        kind: inc_hk[inc_kind == kind]
        for kind in (TEXT_KIND, BAND_KIND)
        if (inc_kind == kind).any()
    }
    survivors = []
    for rel in committed_rels:
        z = fs.read_npz(rel + _BLOOM_SUFFIX)
        if z is not None and all(
            f"kind{kind}" in z for kind in by_kind
        ) and not any(
            hk_bloom_may_contain(z[f"kind{kind}"], hks).any()
            for kind, hks in by_kind.items()
        ):
            continue  # sidecar rules out every incoming key
        survivors.append(rel)
    if not survivors:
        return inc.select(["k", "kind"]).slice(0, 0)
    idx = pa.concat_tables(
        [fs.read_table(r, columns=["kind", "hk"]) for r in survivors]
    )
    hits_mask = np.zeros(inc.num_rows, bool)
    idx_kind = idx["kind"].to_numpy(zero_copy_only=False)
    idx_hk = idx["hk"].to_numpy(zero_copy_only=False)
    for kind in (TEXT_KIND, BAND_KIND):
        m_in = inc_kind == kind
        if m_in.any():
            hits_mask[m_in] = np.isin(inc_hk[m_in], idx_hk[idx_kind == kind])
    hit = inc.filter(pa.array(hits_mask))
    return hit.select(["k", "kind"])


class SigStage:
    """Actor-pool/task stage over the upstream change feed: computes the
    batch's postings, writes them per-PARTITION under
    ``postings/p{pid}/v{v}-<guid>.parquet`` (data never hops through the
    driver) and returns only the tiny ``(pid, rel, rows)`` listing."""

    def __init__(self, index_root: str, version: int, key_col: str,
                 text_col: str, num_partitions: int,
                 n_bands: int = N_BANDS, rows_per_band: int = ROWS_PER_BAND,
                 seed: int = PERM_SEED):
        self.fs = lakefs(index_root)
        self.version = version
        self.key_col, self.text_col = key_col, text_col
        self.num_partitions = num_partitions
        self.n_bands, self.rows_per_band, self.seed = n_bands, rows_per_band, seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "pid": pa.array([], pa.int32()),
            "rel": pa.array([], pa.string()),
            "rows": pa.array([], pa.int64()),
        })
        if batch.num_rows == 0:
            return empty
        post = doc_postings(batch, self.key_col, self.text_col,
                            self.num_partitions, self.n_bands,
                            self.rows_per_band, self.seed)
        pid = post["pid"].to_numpy()
        order = np.argsort(pid, kind="stable")
        post = post.take(pa.array(order))
        pid = pid[order]
        uniq, starts = np.unique(pid, return_index=True)
        out_pid, out_rel, out_rows = [], [], []
        for i, p in enumerate(uniq.tolist()):
            s = int(starts[i])
            e = int(starts[i + 1]) if i + 1 < len(starts) else len(pid)
            rel = f"postings/p{p:04d}/v{self.version}-{uuid.uuid4().hex}.parquet"
            sl = post.slice(s, e - s).drop_columns(["pid"])
            self.fs.write_table(sl, rel)
            _write_posting_bloom(
                self.fs, rel,
                sl["kind"].to_numpy(zero_copy_only=False),
                sl["hk"].to_numpy(zero_copy_only=False),
            )
            out_pid.append(p)
            out_rel.append(rel)
            out_rows.append(e - s)
        return pa.table({
            "pid": pa.array(out_pid, pa.int32()),
            "rel": pa.array(out_rel, pa.string()),
            "rows": pa.array(out_rows, pa.int64()),
        })


class PidOwner:
    """RESIDENT owner of one index partition (the scale path for bulk
    cycles): caches the committed hk sets in memory as sorted arrays and
    incrementally syncs to whatever committed posting list each probe
    passes in — memory is a pure function of the COMMITTED manifest
    state, so a crashed/restarted owner simply cold-loads and every
    answer stays exactly-once-consistent.  Probe cost per cycle is then
    O(incoming · log index) with ZERO index re-reads (the stateless
    ``_probe_pid`` task re-reads surviving posting files every cycle —
    bloom sidecars prune that path only when the incoming key set is
    sparse; a bulk cycle touches every file with probability ~1, which
    is why resident owners are the default).  Same pattern as the
    merge engine's partition owner actors (``merge.py:1247``)."""

    def __init__(self, index_root: str):
        self.fs = lakefs(index_root)
        self.loaded: set[str] = set()
        self.hk = {TEXT_KIND: np.empty(0, np.uint64),
                   BAND_KIND: np.empty(0, np.uint64)}

    def _sync(self, committed_rels: list[str]) -> None:
        committed = set(committed_rels)
        if self.loaded - committed:
            # a rel vanished (future compaction): rebuild from scratch
            self.loaded = set()
            self.hk = {TEXT_KIND: np.empty(0, np.uint64),
                       BAND_KIND: np.empty(0, np.uint64)}
        new = [r for r in committed_rels if r not in self.loaded]
        for r in new:
            t = self.fs.read_table(r, columns=["kind", "hk"])
            k = t["kind"].to_numpy(zero_copy_only=False)
            h = t["hk"].to_numpy(zero_copy_only=False)
            for kind in (TEXT_KIND, BAND_KIND):
                add = h[k == kind]
                if len(add):
                    self.hk[kind] = np.sort(
                        np.concatenate([self.hk[kind], add])
                    )
            self.loaded.add(r)

    def probe(self, committed_rels: list[str],
              incoming_rels: list[str]) -> pa.Table:
        self._sync(committed_rels)
        inc = pa.concat_tables([self.fs.read_table(r) for r in incoming_rels])
        if inc.num_rows == 0:
            return inc.select(["k", "kind"]).slice(0, 0)
        ik = inc["kind"].to_numpy(zero_copy_only=False)
        ih = inc["hk"].to_numpy(zero_copy_only=False)
        mask = np.zeros(inc.num_rows, bool)
        for kind in (TEXT_KIND, BAND_KIND):
            m = ik == kind
            arr = self.hk[kind]
            if m.any() and len(arr):
                pos = np.clip(np.searchsorted(arr, ih[m]), 0, len(arr) - 1)
                mask[m] = arr[pos] == ih[m]
        return inc.filter(pa.array(mask)).select(["k", "kind"])


class IngestDedupIndex:
    """The persisted dedup-index sidecar (see module docstring).

    ``advance(table_root)`` folds every upstream cycle committed beyond
    the index's own watermark, one manifest commit per cycle — crash
    anywhere and the next ``advance`` redoes exactly the unfinished
    cycle (orphaned posting/flag files from the dead attempt are ignored
    by the manifest, same protocol as the engine's staging sweep).

    ``resident=True`` (default) probes through per-pid :class:`PidOwner`
    actors that keep the committed hk sets in memory across cycles;
    ``resident=False`` uses stateless bloom-pruned probe tasks (right
    for one-shot/trickle probes where holding actors is not worth it)."""

    def __init__(self, root: str, num_partitions: int = 4,
                 key_col: str = "doc_id", text_col: str = "text",
                 n_bands: int = N_BANDS, rows_per_band: int = ROWS_PER_BAND,
                 seed: int = PERM_SEED, resident: bool = True,
                 auto_compact_files: int | None = None):
        self.root = root
        self.num_partitions = num_partitions
        self.key_col, self.text_col = key_col, text_col
        self.n_bands, self.rows_per_band, self.seed = n_bands, rows_per_band, seed
        self.resident = resident
        #: when set, ``advance`` folds a partition's posting files into
        #: one whenever the committed count reaches this threshold —
        #: bounds the stateless probe's file fan-in (and the resident
        #: owner's cold-load) at ~threshold files per partition forever
        self.auto_compact_files = auto_compact_files
        self._owners: dict[int, Any] = {}

    def _owner(self, pid: int):
        import ray

        if pid not in self._owners:
            global _OWNER_CLS
            if _OWNER_CLS is None:
                _OWNER_CLS = ray.remote(PidOwner)
            self._owners[pid] = _OWNER_CLS.remote(self.root)
        return self._owners[pid]

    # ------------------------------------------------------------ state
    def _log(self):
        from ..state.manifest import ManifestLog

        return ManifestLog(self.root)

    def create(self) -> None:
        from ..state.manifest import prepare_watermark

        prepare_watermark(self.root, version=0,
                          num_partitions=self.num_partitions)
        cur = self._log().latest()
        if "ingest_dedup" not in cur.stats:
            nxt = cur.next()
            nxt.stats["ingest_dedup"] = {
                "key_col": self.key_col, "text_col": self.text_col,
                "n_bands": self.n_bands, "rows_per_band": self.rows_per_band,
                "seed": self.seed, "upstream_version": 0,
            }
            nxt.stats["flag_files"] = []
            try:
                self._log().commit(nxt, expect_version=cur.version)
            except Exception:
                pass  # concurrent creator won; their params are identical

    # ---------------------------------------------------------- advance
    def advance(self, table_root: str) -> int:
        """Fold all pending upstream cycles; returns how many."""
        from ..state.manifest import ManifestLog

        self.create()
        up = ManifestLog(table_root)
        versions = up.versions()
        folded = 0
        while True:
            cur = self._log().latest()
            done_v = int(cur.stats["ingest_dedup"]["upstream_version"])
            pending = [v for v in versions if v > done_v]
            if not pending:
                return folded
            v = pending[0]
            self._advance_one(table_root, done_v, v, up.read(v).watermark)
            if self.auto_compact_files:
                self.compact(min_files=self.auto_compact_files)
            folded += 1

    def _advance_one(self, table_root: str, from_v: int, to_v: int,
                     up_watermark: int) -> None:
        import ray

        from ..pipelines.runner import read_change_feed

        cur = self._log().latest()
        # one cycle's net changes — bounded by the cycle (the engine's
        # own poll buffer bound), pinned once and reused by BOTH passes
        # (postings, then flags) instead of resolving the feed twice
        feed = read_change_feed(table_root, from_v, to_v)
        keep = {self.key_col, self.text_col, "change_type"}
        cols = [c for c in feed.schema().names if c in keep]
        feed = feed.select_columns(cols).materialize()
        sig = SigStage(self.root, to_v, self.key_col, self.text_col,
                       self.num_partitions, self.n_bands,
                       self.rows_per_band, self.seed)

        def stage(batch: pa.Table) -> pa.Table:
            alive = batch.filter(
                pc.not_equal(batch["change_type"], pa.scalar("delete"))
            )
            return sig(alive)

        listing = (
            feed.map_batches(stage, batch_format="pyarrow")
            .take_all()  # (pid, rel, rows) rows only — never data
        )
        by_pid: dict[int, list[str]] = {}
        for r in listing:
            by_pid.setdefault(int(r["pid"]), []).append(r["rel"])

        # probe each touched partition against the COMMITTED postings
        if self.resident:
            refs = [
                self._owner(p).probe.remote(cur.partitions.get(p, []), rels)
                for p, rels in sorted(by_pid.items())
            ]
        else:
            global _PROBE_TASK
            if _PROBE_TASK is None:
                _PROBE_TASK = ray.remote(_probe_pid)
            refs = [
                _PROBE_TASK.remote(self.root, cur.partitions.get(p, []), rels)
                for p, rels in sorted(by_pid.items())
            ]
        if refs:
            got = ray.get(refs)
            hits = pa.concat_tables(got) if got else None
        else:
            hits = None
        if hits is None or hits.num_rows == 0:
            exact_arr = near_arr = None
        else:
            hk = hits["k"]
            exact_arr = hk.filter(pc.equal(hits["kind"], TEXT_KIND))
            near_arr = hk.filter(pc.equal(hits["kind"], BAND_KIND))

        # flags written where the feed rows live; hit-key sets broadcast
        # (duplicate-rate bounded, like dedup_minhash's candidate pairs)
        hits_ref = ray.put((exact_arr, near_arr))
        root, key_col = self.root, self.key_col

        def write_flags(batch: pa.Table) -> pa.Table:
            empty = pa.table({"rel": pa.array([], pa.string()),
                              "rows": pa.array([], pa.int64())})
            alive = batch.filter(
                pc.not_equal(batch["change_type"], pa.scalar("delete"))
            )
            if alive.num_rows == 0:
                return empty
            ex, nr = ray.get(hits_ref)
            ks = alive[key_col]
            if isinstance(ks, pa.ChunkedArray):
                ks = ks.combine_chunks()
            f = pa.array([False] * len(ks), pa.bool_())
            flags = pa.table({
                key_col: ks,
                "cycle": pa.array([to_v] * len(ks), pa.int64()),
                "exact_dup": pc.is_in(ks, value_set=ex)
                if ex is not None and len(ex) else f,
                "near_candidate": pc.is_in(ks, value_set=nr)
                if nr is not None and len(nr) else f,
            })
            rel = f"flags/v{to_v}-{uuid.uuid4().hex}.parquet"
            lakefs(root).write_table(flags, rel)
            return pa.table({"rel": pa.array([rel], pa.string()),
                             "rows": pa.array([flags.num_rows], pa.int64())})

        flag_listing = (
            feed.map_batches(write_flags, batch_format="pyarrow")
            .take_all()
        )

        nxt = cur.next()
        nxt.watermark = max(int(up_watermark), int(cur.watermark))
        for p, rels in by_pid.items():
            nxt.partitions.setdefault(p, []).extend(rels)
        nxt.stats["flag_files"] = list(cur.stats.get("flag_files", [])) + [
            r["rel"] for r in flag_listing
        ]
        nxt.stats["ingest_dedup"] = dict(cur.stats["ingest_dedup"],
                                         upstream_version=to_v)
        self._log().commit(nxt, expect_version=cur.version)

    # --------------------------------------------------------- maintain
    def compact(self, min_files: int = 2) -> dict[int, tuple[int, int, int]]:
        """OPTIMIZE for the dedup index: fold every partition holding
        ``>= min_files`` committed posting files into ONE file each
        (sorted by (kind, hk), duplicate hashes dropped), swapped in by
        a single CAS manifest commit.  Without this the per-cycle
        posting files accumulate forever — ``BENCH/ingest_dedup.json``
        measured the stateless probe re-reading 232 files by cycle 30 —
        and at 100 TB the resident owners' cold-load fan-in grows the
        same way.  Replaced files stay referenced by OLDER manifest
        versions (time travel) and are reclaimed by the standard
        ``ManifestLog.expire_versions`` GC, bloom sidecars included; a
        crash mid-compaction leaves only orphaned compacted files the
        manifest never references.  Resident owners detect the swap on
        their next probe (a loaded rel vanished) and rebuild from the
        compacted file.  Returns ``{pid: (files_before, rows_before,
        rows_after)}`` for the partitions folded."""
        import ray

        self.create()
        cur = self._log().latest()
        todo = {int(p): list(rels) for p, rels in cur.partitions.items()
                if len(rels) >= max(min_files, 2)}
        if not todo:
            return {}
        global _COMPACT_TASK
        if _COMPACT_TASK is None:
            _COMPACT_TASK = ray.remote(_compact_pid)
        pids = sorted(todo)
        results = ray.get([
            _COMPACT_TASK.remote(self.root, p, todo[p], cur.version)
            for p in pids
        ])
        nxt = cur.next()
        out: dict[int, tuple[int, int, int]] = {}
        for p, (rel, before, after) in zip(pids, results):
            nxt.partitions[p] = [rel]
            out[p] = (len(todo[p]), before, after)
        self._log().commit(nxt, expect_version=cur.version)
        return out

    # ------------------------------------------------------------ reads
    def flags(self) -> pa.Table:
        """All committed per-doc verdicts (doc key, cycle, exact_dup,
        near_candidate) — cycle is the upstream manifest version."""
        cur = self._log().latest()
        fs = lakefs(self.root)
        rels = cur.stats.get("flag_files", [])
        if not rels:
            return pa.table({
                self.key_col: pa.array([], pa.string()),
                "cycle": pa.array([], pa.int64()),
                "exact_dup": pa.array([], pa.bool_()),
                "near_candidate": pa.array([], pa.bool_()),
            })
        return pa.concat_tables([fs.read_table(r) for r in rels])


_PROBE_TASK = None
_OWNER_CLS = None
_COMPACT_TASK = None
