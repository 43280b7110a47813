"""Partition-expression transforms (E2 ``partitionExpressions``).

The reference exposes Iceberg partition expressions on the target table
(``docs/crd.md:114-119``: e.g. ``bucket(arcane_merge_key, 10)``,
``month(order_date)``; CRD ``…stream.yaml:106-133``).  The engine's
FIRST partition dimension — ``bucket(merge_key, P)`` — is the pid
routing itself (``SinkSettings.num_partitions``).  This module adds the
SECOND, value-based dimension: ``SinkSettings.partition_by`` expressions
cluster each partition's BASE data files by transform value at write
time (CoW rewrites, backfill bulk loads, compaction folds — MoR delta
files stay un-clustered: they are transient and folded by OPTIMIZE,
exactly where Iceberg re-clusters too).

Clustering is what makes pruning effective, not what makes it sound:
every written file's bounds over the transform SOURCE columns are
recorded in ``manifest.file_stats`` at write time (no ANALYZE needed),
and ``read_target(where=…)`` / ``prune_files_by_stats`` skip files
whose bounds can't match — the manifest-entry-bounds posture of
Iceberg's FileIO metadata, which is how the reference's Trino MERGE
prunes as well.

Supported transforms (the public Iceberg transform set, minus the ones
the engine expresses elsewhere):

- ``col`` / ``identity(col)``   — the raw value
- ``year(col)``                 — calendar year (timestamp/date cols)
- ``month(col)``                — months since epoch (total-ordered)
- ``day(col)``                  — days since epoch
- ``hour(col)``                 — hours since epoch
- ``truncate(col, W)``          — int: floor to W; string: W-char prefix
- ``bucket(col, N)``            — stable hash mod N
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from arcane_stream_sqlserver_change_tracking_ray.state.manifest import bound_key

_EXPR_RE = re.compile(
    r"^\s*(?:(?P<fn>identity|year|month|day|hour|truncate|bucket)\s*\(\s*"
    r"(?P<col>[A-Za-z_][A-Za-z0-9_]*)\s*(?:,\s*(?P<arg>\d+)\s*)?\)|"
    r"(?P<bare>[A-Za-z_][A-Za-z0-9_]*))\s*$"
)

_US_PER = {"day": 86_400_000_000, "hour": 3_600_000_000}


@dataclass(frozen=True)
class PartitionExpr:
    """One parsed partition expression; ``codes`` maps a table to one
    int64/str group value per row (vectorized, no Python row loop)."""

    raw: str
    transform: str
    col: str
    arg: int | None = None

    def codes(self, table: pa.Table) -> np.ndarray | None:
        import pyarrow.compute as pc

        if self.col not in table.column_names:
            return None  # schema evolution: absent column -> no clustering
        col = table[self.col].combine_chunks()
        # nulls cluster together under a type-stable sentinel: None vs
        # str breaks np.lexsort, and NaN != NaN would shatter every null
        # row into its own file run.  Bounds stay exact — column_bounds
        # reads the real column and min_max skips nulls (comparison
        # predicates never match null rows, so pruning stays sound).
        if col.null_count:
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                col = pc.fill_null(col, "")
            elif pa.types.is_timestamp(col.type):
                col = pc.fill_null(col, pa.scalar(0, col.type))
            elif pa.types.is_date(col.type):
                col = pc.fill_null(col, pa.scalar(0, pa.date32()).cast(col.type))
            elif pa.types.is_boolean(col.type):
                col = pc.fill_null(col, False)
            elif pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
                col = pc.fill_null(col, pa.scalar(0).cast(col.type))
            else:
                # any other nullable type (decimal/binary/dictionary/...):
                # None in an object array breaks np.lexsort / astype, so
                # group via first-appearance factorized codes for EVERY
                # transform (identity AND truncate/bucket/... — factorize
                # is finer-grained than the transform would be, which is
                # sound: clustering needs grouping, not exact transform
                # values, and the per-file BOUNDS always come from the
                # real column).  Before this, truncate(decimal_col, W)
                # with one null row raised TypeError mid-write.
                import pandas as pd

                return pd.factorize(
                    col.to_pandas(), use_na_sentinel=False
                )[0].astype(np.int64)
        t = self.transform
        if t == "identity":
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                # int dictionary codes instead of Python-object strings:
                # np.lexsort over objects is ~5x slower at CoW-rewrite
                # row counts (codes are per-call, so first-appearance
                # order is fine — clustering needs grouping, not order)
                return _dict_codes(col)
            vals = col.to_numpy(zero_copy_only=False)
            if pa.types.is_floating(col.type):
                # NaN != NaN would shatter every NaN row into its own
                # single-row file run under the run-split in
                # cluster_order; collapse NaNs into the 0.0 cluster
                # (coarser grouping is sound — bounds stay exact)
                nan = np.isnan(vals)
                if nan.any():
                    vals = np.where(nan, 0.0, vals)
            return vals
        if t in ("year", "month", "day", "hour"):
            vals = self._epoch_us(col)
            if vals is None:
                return None
            if t == "day" or t == "hour":
                return vals // _US_PER[t]
            days = vals // _US_PER["day"]
            # proleptic-Gregorian year/month without a Python date loop
            dt = (
                np.array(["1970-01-01"], dtype="datetime64[D]")[0] + days
            ).astype("datetime64[M]").astype(np.int64)  # months since epoch
            return dt if t == "month" else dt // 12 + 1970
        if t == "truncate":
            import pyarrow.compute as pc

            w = self.arg or 1
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                return _dict_codes(
                    pc.utf8_slice_codeunits(pc.fill_null(col, ""), 0, w)
                )
            v = col.to_numpy(zero_copy_only=False).astype(np.int64)
            return (v // w) * w
        if t == "bucket":
            n = self.arg or 1
            vals = col.to_numpy(zero_copy_only=False)
            if vals.dtype.kind in "iu":
                with np.errstate(over="ignore"):
                    h = vals.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                return ((h >> np.uint64(32)) % np.uint64(n)).astype(np.int64)
            import pandas as pd

            return (pd.util.hash_array(vals) % np.uint64(n)).astype(np.int64)
        raise ValueError(f"unknown transform {t!r}")  # pragma: no cover

    def _epoch_us(self, col: pa.ChunkedArray | pa.Array) -> np.ndarray | None:
        typ = col.type
        if pa.types.is_timestamp(typ):
            us = col.cast(pa.timestamp("us")).cast(pa.int64())
            return us.to_numpy(zero_copy_only=False).astype(np.int64)
        if pa.types.is_date(typ):
            days = col.cast(pa.date32()).cast(pa.int32())
            return days.to_numpy(zero_copy_only=False).astype(np.int64) * _US_PER["day"]
        return None  # not a temporal column: no clustering rather than error


def _dict_codes(col) -> np.ndarray:
    """int64 dictionary codes of a string array/chunked array (Arrow
    dictionary_encode — vectorized, no Python-object round-trip)."""
    import pyarrow.compute as pc

    enc = pc.dictionary_encode(col)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()  # unifies dictionaries across chunks
        if isinstance(enc, pa.ChunkedArray):
            if enc.num_chunks == 0:
                return np.empty(0, dtype=np.int64)
            enc = enc.chunk(0)
    return enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)


def parse_partition_exprs(exprs) -> tuple[PartitionExpr, ...]:
    """Parse ``SinkSettings.partition_by`` strings; raises ValueError on
    malformed expressions (fail fast at bootstrap, like the reference's
    CRD validation)."""
    out = []
    for raw in exprs or ():
        m = _EXPR_RE.match(raw)
        if not m:
            raise ValueError(f"bad partition expression: {raw!r}")
        if m.group("bare"):
            out.append(PartitionExpr(raw, "identity", m.group("bare")))
            continue
        fn, col, arg = m.group("fn"), m.group("col"), m.group("arg")
        if fn in ("truncate", "bucket") and not arg:
            raise ValueError(f"{fn}() needs a width/bucket count: {raw!r}")
        if fn not in ("truncate", "bucket") and arg:
            raise ValueError(f"{fn}() takes one column only: {raw!r}")
        out.append(PartitionExpr(raw, fn, col, int(arg) if arg else None))
    return tuple(out)


def cluster_order(table: pa.Table, exprs) -> tuple[np.ndarray, np.ndarray] | None:
    """Stable sort order + split boundaries for value clustering.

    Returns ``(order, starts)``: row indices sorting the table by the
    combined transform values (stable — an earlier ``sorted_by`` sort
    survives within each cluster), and the start offsets of each
    cluster run in the sorted order (last element = num_rows).  None
    when no expression applies to this table's schema."""
    cols = []
    for e in exprs:
        c = e.codes(table)
        if c is not None:
            cols.append(c)
    if not cols:
        return None
    order = np.lexsort(tuple(reversed(cols)))  # primary expr outermost
    changed = np.zeros(len(order), dtype=bool)
    for c in cols:
        s = c[order]
        changed[1:] |= s[1:] != s[:-1]
    changed[0] = True
    starts = np.r_[np.flatnonzero(changed), len(order)]
    return order, starts


def coalesce_runs(starts: np.ndarray, min_rows: int) -> np.ndarray:
    """Greedily pack ADJACENT cluster runs smaller than *min_rows* into
    one file run (Iceberg compaction's bin-packing posture): guards
    against tiny-file explosion when a transform is high-cardinality
    (``identity(user_id)``, ``day(ts)`` over years).  Bounds stay EXACT —
    a packed file's recorded min/max still come from its real rows; the
    file just covers a small contiguous value range instead of one
    value.  ``min_rows<=0`` keeps value-pure files."""
    if min_rows <= 0 or len(starts) <= 2:
        return starts
    out = [int(starts[0])]
    for s, e in zip(starts[1:-1], starts[2:]):
        if int(s) - out[-1] >= min_rows:
            out.append(int(s))
    out.append(int(starts[-1]))
    return np.asarray(out, dtype=starts.dtype)


def source_columns(exprs) -> tuple[str, ...]:
    """Distinct source columns of a parsed expression tuple — the
    columns whose write-time bounds go into ``manifest.file_stats``."""
    seen: dict[str, None] = {}
    for e in exprs:
        seen.setdefault(e.col, None)
    return tuple(seen)


def column_bounds(table: pa.Table, cols) -> dict[str, list]:
    """JSON-safe ``{col: [min, max]}`` over *cols* (normalized through
    ``bound_key`` so timestamps/dates compare as epoch ints — the same
    normalization ``prune_files_by_stats`` applies to query literals)."""
    import pyarrow.compute as pc

    out: dict[str, list] = {}
    if table.num_rows == 0:
        return out
    for c in cols:
        if c not in table.column_names:
            continue
        try:
            mm = pc.min_max(table[c])
            lo = bound_key(mm["min"].as_py())
            hi = bound_key(mm["max"].as_py())
        except Exception:
            continue
        if lo is None or hi is None:
            continue
        if not isinstance(lo, (int, float, str, bool)) or not isinstance(
            hi, (int, float, str, bool)
        ):
            continue
        out[c] = [lo, hi]
    return out
