"""Per-batch transforms T1-T5 (SURVEY.md §2.2), all zero-copy Arrow.

Every function here is either a schema-level operation (column prune /
rename) or a vectorized ``pyarrow.compute`` kernel, applied inside
``Dataset.map_batches(batch_format="pyarrow")`` — no Python row loops.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from arcane_stream_sqlserver_change_tracking_ray.types import (
    ARCANE_TO_ARROW,
    ESSENTIAL_COLS,
    MERGE_KEY_COL,
)

# ---------------------------------------------------------------------------
# T2: field-name normalization — "removes the special characters (e.g. $, /, \)"
# (reference docs/crd.md:226-227)
# ---------------------------------------------------------------------------
_NORMALIZE_RE = re.compile(r"[^0-9A-Za-z_]")


def normalize_name(name: str) -> str:
    return _NORMALIZE_RE.sub("", name).lower()


def normalize_column_names(batch: pa.Table) -> pa.Table:
    """Rename every column to its normalized form (metadata-only, zero-copy)."""
    return batch.rename_columns([normalize_name(n) for n in batch.column_names])


# ---------------------------------------------------------------------------
# T1: field selection rule ∈ {all, include, exclude}; essential fields always
# retained (reference docs/crd.md:224-241; CRD ...stream.yaml:400-449)
# ---------------------------------------------------------------------------
def resolve_selected_columns(
    available: list[str],
    rule: str = "all",
    fields: tuple[str, ...] = (),
    essential: tuple[str, ...] = ESSENTIAL_COLS,
) -> list[str]:
    """The column list a selection rule yields, in source order.

    Used both app-side (filter a batch) and "server-side" — pushed into
    ``read_parquet(columns=...)`` so pruned columns never leave storage
    (the analog of the reference's ``isServerSide: true`` pushing the
    projection into the source SQL query).
    """
    fields_set = {normalize_name(f) for f in fields}
    # compare essential names NORMALIZED so a raw source column ("Doc$Id")
    # is recognized as the essential key ("docid") before renaming happens
    keep_always = {normalize_name(e) for e in essential}
    if rule == "all":
        selected = list(available)
    elif rule == "include":
        selected = [
            c for c in available
            if normalize_name(c) in fields_set or normalize_name(c) in keep_always
        ]
    elif rule == "exclude":
        selected = [
            c for c in available
            if normalize_name(c) not in fields_set or normalize_name(c) in keep_always
        ]
    else:
        raise ValueError(f"unknown field-selection rule: {rule!r}")
    have = {normalize_name(c) for c in selected}
    missing = keep_always - have
    if missing:
        selected += [c for c in available if normalize_name(c) in missing]
    return selected


def select_fields(
    batch: pa.Table,
    rule: str = "all",
    fields: tuple[str, ...] = (),
    essential: tuple[str, ...] = ESSENTIAL_COLS,
) -> pa.Table:
    return batch.select(resolve_selected_columns(batch.column_names, rule, fields, essential))


# ---------------------------------------------------------------------------
# T3: merge-key synthesis from the source PK column(s)
# (reference IndexedMergeKeyField, Fixtures.scala:22; CRD ...stream.yaml:420)
# ---------------------------------------------------------------------------
def synthesize_merge_key(
    batch: pa.Table, key_columns: tuple[str, ...] = ("url",), sep: str = "#"
) -> pa.Table:
    """Append ``arcane_merge_key`` = key columns cast to string, '#'-joined.

    For the web-page payload the PK is ``url`` so the key is the url
    itself (single-column fast path, zero-copy)."""
    if MERGE_KEY_COL in batch.column_names:
        return batch
    if len(key_columns) == 1:
        col = batch[key_columns[0]]
        key = col if pa.types.is_string(col.type) else pc.cast(col, pa.string())
    else:
        parts = [
            batch[c] if pa.types.is_string(batch[c].type) else pc.cast(batch[c], pa.string())
            for c in key_columns
        ]
        key = pc.binary_join_element_wise(*parts, sep)
    return batch.append_column(MERGE_KEY_COL, key)


# ---------------------------------------------------------------------------
# T4: declared type conversion (mssql→Arcane→Arrow in the reference; here a
# single Arrow cast table — SURVEY.md §2.2 T4)
# ---------------------------------------------------------------------------
def cast_columns(batch: pa.Table, casts: dict[str, pa.DataType | str]) -> pa.Table:
    """Cast named columns; values may be Arrow types or ArcaneType names."""
    for name, typ in casts.items():
        if isinstance(typ, str):
            typ = ARCANE_TO_ARROW[typ]
        if name in batch.column_names and batch[name].type != typ:
            idx = batch.schema.get_field_index(name)
            batch = batch.set_column(idx, name, pc.cast(batch[name], typ))
    return batch


def cast_to_schema(batch: pa.Table, schema: pa.Schema, safe: bool = True) -> pa.Table:
    """Align *batch* to *schema*: add missing columns as nulls, cast types,
    drop columns absent from the schema, and order columns.  The read-side
    half of additive schema evolution (E1)."""
    arrays = []
    n = batch.num_rows
    for f in schema:
        if f.name in batch.column_names:
            col = batch[f.name]
            arrays.append(col if col.type == f.type else pc.cast(col, f.type, safe=safe))
        else:
            arrays.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(arrays, schema=schema)


# ---------------------------------------------------------------------------
# T5: ANALYZE column subset + per-column stats (ColumnSummaryFieldsFiltering,
# reference main.scala:20,110; CRD targetAnalyzeSettings.includedColumns)
# ---------------------------------------------------------------------------
def column_summary(batch: pa.Table, included: tuple[str, ...] = ()) -> dict[str, dict]:
    """min/max/null_count per included column of one batch (mergeable)."""
    cols = [c for c in batch.column_names if not included or c in included]
    out: dict[str, dict] = {}
    for c in cols:
        col = batch[c]
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            mm = {"min": None, "max": None}
        else:
            s = pc.min_max(col)
            mm = {"min": s["min"].as_py(), "max": s["max"].as_py()}
        out[c] = {**mm, "null_count": col.null_count, "count": len(col)}
    return out
