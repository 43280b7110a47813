"""Additive-only schema evolution (E1, SURVEY.md §2.5).

Reference behavior (``SchemaMigrationTests.scala:161-250``;
``main.scala:104``): per batch, diff the batch schema against the
target schema; **add** new columns (old rows read NULL); columns that
disappear from the source are **retained** in the target and new rows
get NULL — evolution is additive, never destructive.  Safe widening is
allowed (int32→int64, float→double, string→large_string).

The unification decision is made ONCE per cycle on the driver before
any partition writer runs (SURVEY.md §7.5.3 — the reference's
``isUnifiedSchema`` flag exists for the same reason), then every writer
aligns batches with ``cast_to_schema``.
"""

from __future__ import annotations

import pyarrow as pa


class SchemaMismatchError(RuntimeError):
    """Raised when ``sink.isUnifiedSchema`` is true and a batch's schema
    drifts from the bootstrap-unified target schema mid-stream (reference
    ``docs/crd.md:59-61``: unified mode confines migration to bootstrap
    and "could fail on batch schema mismatch")."""


_WIDENING: dict[tuple, pa.DataType] = {}


def _widened(a: pa.DataType, b: pa.DataType) -> pa.DataType | None:
    """The common wider type of (a, b) if a safe widening exists, else None."""
    if a == b:
        return a
    num_order = [
        pa.int8(), pa.int16(), pa.int32(), pa.int64(),
    ]
    flt_order = [pa.float16(), pa.float32(), pa.float64()]
    for order in (num_order, flt_order):
        if a in order and b in order:
            return order[max(order.index(a), order.index(b))]
    if {a, b} <= {pa.string(), pa.large_string()}:
        return pa.large_string()
    if {a, b} <= {pa.binary(), pa.large_binary()}:
        return pa.large_binary()
    if (a in num_order and b in flt_order) or (b in num_order and a in flt_order):
        return pa.float64()
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    return None


def unify_target_schema(
    target: pa.Schema | None, batch: pa.Schema
) -> tuple[pa.Schema, bool]:
    """Return ``(unified, migrated)``.

    *unified* keeps every target field (in order, possibly widened),
    then appends batch-only fields.  Raises on an incompatible type
    change (the reference would fail the batch the same way)."""
    if target is None:
        return batch, True
    fields: list[pa.Field] = []
    migrated = False
    batch_types = {f.name: f.type for f in batch}
    for f in target:
        if f.name in batch_types and batch_types[f.name] != f.type:
            w = _widened(f.type, batch_types[f.name])
            if w is None:
                raise TypeError(
                    f"incompatible schema change for column {f.name!r}: "
                    f"{f.type} vs {batch_types[f.name]}"
                )
            if w != f.type:
                migrated = True
            fields.append(pa.field(f.name, w))
        else:
            fields.append(f)
    target_names = {f.name for f in target}
    for f in batch:
        if f.name not in target_names:
            fields.append(f)
            migrated = True
    return pa.schema(fields), migrated


def schemas_of_parquet_files(paths: list[str]) -> pa.Schema:
    """Unified physical schema of a set of parquet files (driver-side,
    metadata-only — no data read)."""
    import pyarrow.parquet as pq

    schemas = [pq.read_schema(p) for p in paths]
    out = schemas[0]
    for s in schemas[1:]:
        out, _ = unify_target_schema(out, s)
    return out
