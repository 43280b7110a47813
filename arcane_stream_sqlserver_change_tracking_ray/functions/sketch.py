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
