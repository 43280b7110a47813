"""Count-min sketch: sub-linear heavy-hitter counting (the "novel
sketch" operator class).

A (depth × width) counter grid; every token occurrence increments one
counter per row at a position derived from the token's hash; a point
estimate is the MIN across rows (always >= the true count; error is
bounded by total_count/width per row).  The sketch is a MERGEABLE
commutative monoid, so the Ray shape is the canonical pre-aggregation
pattern: each ``map_batches`` task folds its batch into a 32 KB partial
grid and the driver (or a tree reduce at cluster scale) sums the
partials — corpus size never touches the driver.

Everything is EXACTLY SQL-replayable (the ``cms_heavy_hitters`` oracle):
token hash = the repo's polynomial byte hash (``poly_word_hashes``,
Horner base 1000003 mod 2^64 — HUGEINT-provable, same as the
fingerprint oracle), and row ``j``'s position is bit field
``(h >> 10*j) & 1023`` — disjoint 10-bit fields of one 64-bit hash, so
positions are pure integer arithmetic in both engines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from arcane_stream_sqlserver_change_tracking_ray.functions.dedup import (
    poly_word_hashes,
)
from arcane_stream_sqlserver_change_tracking_ray.functions.text import words_flat

CMS_WIDTH = 1024
CMS_DEPTH = 4


def cms_positions(h: np.ndarray) -> np.ndarray:
    """(depth, n) int64 counter positions from uint64 hashes."""
    return np.stack(
        [
            ((h >> np.uint64(10 * j)) & np.uint64(CMS_WIDTH - 1)).astype(np.int64)
            for j in range(CMS_DEPTH)
        ]
    )


def _token_hashes(texts) -> np.ndarray:
    flat, _ = words_flat(texts)
    flat = flat.filter(pc.greater(pc.binary_length(flat), 0))
    return poly_word_hashes(flat)


def cms_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """One flattened partial grid per batch (the mergeable unit)."""
    sk = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    h = _token_hashes(batch[text_col])
    if h.size:
        pos = cms_positions(h)
        for j in range(CMS_DEPTH):
            np.add.at(sk[j], pos[j], 1)
    return pa.table({"sketch": pa.array([sk.reshape(-1)])})


def count_min_sketch(ds, text_col: str = "text") -> np.ndarray:
    """(depth, width) int64 grid over every token occurrence in *ds*."""
    parts = ds.map_batches(
        lambda b: cms_partial(b, text_col), batch_format="pyarrow"
    ).take_all()
    sk = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    for r in parts:
        sk += np.asarray(r["sketch"], dtype=np.int64).reshape(CMS_DEPTH, CMS_WIDTH)
    return sk


def cms_estimate(sketch: np.ndarray, tokens) -> np.ndarray:
    """Point estimates (int64, >= true counts) for *tokens*."""
    if isinstance(tokens, (list, tuple)):
        tokens = pa.array(tokens, pa.string())
    h = poly_word_hashes(tokens)
    pos = cms_positions(h)
    ests = np.stack([sketch[j, pos[j]] for j in range(CMS_DEPTH)])
    return ests.min(axis=0)


# ---------------------------------------------------------------------------
# HyperLogLog (approximate distinct count)
# ---------------------------------------------------------------------------
HLL_P = 10
HLL_BUCKETS = 1 << HLL_P  #: 1024 registers -> ~3.25% standard error


def splitmix_finalize(h: np.ndarray) -> np.ndarray:
    """The repo's splitmix-style avalanche (same as ``shingle_hashes``,
    SQL-replayed in the dedup_simhash oracle): the raw polynomial hash
    of short digit strings has biased high bits, which skews HLL's
    trailing-zero ranks — finalize before bucketing."""
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint64(29))
        h = h * np.uint64(0xBF58476D1CE4E5B9)
        h = h ^ (h >> np.uint64(32))
    return h


def hll_bucket_rank(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rank) per uint64 hash: bucket = low 10 bits, rank =
    1 + trailing zeros of the remaining 54 bits (0 remainder caps at
    55).  Pure integer arithmetic — the SQL oracle replays it in
    HUGEINT (trailing zeros via the lowest-set-bit power of two, which
    float64 log2 represents exactly)."""
    bucket = (h & np.uint64(HLL_BUCKETS - 1)).astype(np.int64)
    x = h >> np.uint64(HLL_P)
    low = x & (~x + np.uint64(1))  # lowest set bit (0 when x == 0)
    tz = np.where(
        x == 0, 54, np.log2(np.maximum(low, np.uint64(1)).astype(np.float64))
    ).astype(np.int64)
    return bucket, tz + 1


def hll_partial(batch: pa.Table, col: str) -> pa.Table:
    """One flattened 1024-register partial per batch (merge = max)."""
    vals = batch[col]
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    if not pa.types.is_string(vals.type):
        vals = pc.cast(vals, pa.string())  # hash the decimal string (SQL parity)
    # nulls/empties hash to 0 -> bucket 0 at the MAX rank 55, a phantom
    # register that wrecks the estimate; they are not values — drop them
    vals = vals.drop_null()
    vals = vals.filter(pc.greater(pc.binary_length(vals), 0))
    regs = np.zeros(HLL_BUCKETS, dtype=np.int64)
    h = poly_word_hashes(vals)
    if h.size:
        bucket, rank = hll_bucket_rank(splitmix_finalize(h))
        np.maximum.at(regs, bucket, rank)
    return pa.table({"regs": pa.array([regs])})


def hll_registers(ds, col: str) -> np.ndarray:
    """The 1024 int64 registers over *ds[col]* — per-batch partials
    folded by elementwise max (8 KB per task; same scale shape as the
    count-min grid).  Registers are a deterministic integer function of
    the value SET, so they hash-compare against a SQL replay even
    though the derived cardinality is approximate."""
    parts = ds.map_batches(
        lambda b: hll_partial(b, col), batch_format="pyarrow"
    ).take_all()
    regs = np.zeros(HLL_BUCKETS, dtype=np.int64)
    for r in parts:
        regs = np.maximum(regs, np.asarray(r["regs"], dtype=np.int64))
    return regs


# ---------------------------------------------------------------------------
# Bloom filter (approximate set membership)
# ---------------------------------------------------------------------------
BLOOM_BITS = 8192  #: 2^13 bits
BLOOM_K = 4  #: hash functions = disjoint 13-bit fields (52 of 64 bits used)


def bloom_positions(h: np.ndarray) -> np.ndarray:
    """(k, n) int64 bit positions from splitmix-finalized uint64 hashes:
    bit field ``(h >> 13*j) & 8191`` — pure integer arithmetic, so the
    SQL oracle replays positions exactly in HUGEINT (``(h // 2^(13j)) %
    8192``), same technique as the count-min positions."""
    return np.stack(
        [
            ((h >> np.uint64(13 * j)) & np.uint64(BLOOM_BITS - 1)).astype(np.int64)
            for j in range(BLOOM_K)
        ]
    )


def _value_hashes(col) -> np.ndarray:
    """Finalized hashes of a column's non-null values as decimal/utf8
    strings (identical pre-hash canonicalization to the HLL path, so
    one SQL hash chain serves both sketches)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_string(col.type):
        col = pc.cast(col, pa.string())
    col = col.drop_null()
    col = col.filter(pc.greater(pc.binary_length(col), 0))
    h = poly_word_hashes(col)
    return splitmix_finalize(h) if h.size else h


def bloom_partial(batch: pa.Table, col: str) -> pa.Table:
    """One flattened 8192-bit partial per batch (merge = OR; shipped as
    a 1 KB packed uint64[128] word array — the mergeable unit)."""
    bits = np.zeros(BLOOM_BITS, dtype=bool)
    h = _value_hashes(batch[col])
    if h.size:
        bits[bloom_positions(h).reshape(-1)] = True
    packed = np.packbits(bits, bitorder="little").view(np.uint64)
    return pa.table({"words": pa.array([packed.astype(np.int64)])})


def bloom_build(ds, col: str) -> np.ndarray:
    """The 8192-entry bit array over *ds[col]* — per-batch packed
    partials folded by bitwise OR (1 KB per task at any corpus size;
    the same pre-aggregation shape as the count-min grid, and the
    mergeable form a tree reduce would fold on a cluster)."""
    parts = ds.map_batches(
        lambda b: bloom_partial(b, col), batch_format="pyarrow"
    ).take_all()
    words = np.zeros(BLOOM_BITS // 64, dtype=np.uint64)
    for r in parts:
        words |= np.asarray(r["words"], dtype=np.int64).view(np.uint64)
    return np.unpackbits(words.view(np.uint8), bitorder="little").astype(bool)


def bloom_probe(bits: np.ndarray, col) -> np.ndarray:
    """Membership verdicts (bool, no false negatives) for a column of
    probe values against a built filter.  The result is POSITIONALLY
    ALIGNED with the input column: null and empty-string probes — values
    ``bloom_build`` never inserts — get ``False`` at their slot, so
    callers can zip verdicts back onto rows safely."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    elif not isinstance(col, pa.Array):
        col = pa.array(col)
    n = len(col)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    s = col if pa.types.is_string(col.type) else pc.cast(col, pa.string())
    valid = pc.and_(
        pc.is_valid(s), pc.greater(pc.binary_length(pc.fill_null(s, "")), 0)
    ).to_numpy(zero_copy_only=False)
    h = _value_hashes(col)
    if h.size:
        out[valid] = bits[bloom_positions(h)].all(axis=0)
    return out


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch
# ---------------------------------------------------------------------------
KMV_K = 256  #: relative error ~ 1/sqrt(k-2) ≈ 6.3%


def kmv_partial(batch: pa.Table, col: str, k: int = KMV_K) -> pa.Table:
    """One partial = the batch's k smallest DISTINCT finalized hashes
    (≤ 2 KB; merge = union→unique→k smallest — an idempotent,
    commutative fold, so the sketch is also the mergeable form a tree
    reduce uses on a cluster)."""
    h = _value_hashes(batch[col])
    h = np.unique(h)[:k]  # unique() sorts ascending (uint64 order)
    return pa.table({"mins": pa.array([h.view(np.int64)])})


def kmv_sketch(ds, col: str, k: int = KMV_K) -> np.ndarray:
    """The k smallest distinct hashes over *ds[col]* (uint64, sorted).
    Unlike HLL this sketch supports set algebra (union = merge,
    intersection via inclusion–exclusion on the combined sketch), and —
    like the HLL registers and the count-min grid — it is an exact
    integer function of the value SET, so a SQL oracle replays it
    verbatim (hash chain + ORDER BY hash LIMIT k)."""
    parts = ds.map_batches(
        lambda b: kmv_partial(b, col, k), batch_format="pyarrow"
    ).take_all()
    if not parts:
        return np.zeros(0, dtype=np.uint64)
    allh = np.concatenate(
        [np.asarray(r["mins"], dtype=np.int64).view(np.uint64) for r in parts]
    )
    return np.unique(allh)[:k]


def kmv_estimate(mins: np.ndarray, k: int = KMV_K) -> float:
    """Distinct-count estimate: with the k-th smallest of n uniform
    hashes at position h_k, n ≈ (k-1) · 2^64 / h_k; exact count when
    fewer than k distinct values exist (the sketch IS the value set)."""
    if len(mins) < k:
        return float(len(mins))
    return (k - 1) * 2.0**64 / float(mins[-1])


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL cardinality estimate with the small-range
    (linear-counting) correction."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if raw <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(raw)
