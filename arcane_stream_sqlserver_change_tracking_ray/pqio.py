"""Parquet read helper: ``ray.data.read_parquet`` with a SMALL-READ
fast path.

``read_parquet`` pays a fixed planning cost per call — dataset metadata
resolution, a remote fragment-sampling round trip (launched
unconditionally in Ray 2.49 for the decoding-size estimate), and scan
operator startup — ~0.2–0.5 s that is pure overhead when the input is a
few MB.  That is exactly the per-cycle pattern of a streaming CDC
engine: poll a handful of fresh CT-log segments, re-read a just-written
staging dir, read a partition's delta files.  Profiled at sf0.01, 6 such
calls were ~1.5 s of the 4.1 s staged replay (BENCH/query_times_sf001).

``read_parquet_auto`` therefore short-circuits small inputs: when the
total byte size is under :data:`SMALL_READ_TOTAL_BYTES` (and every file
under :data:`SMALL_READ_FILE_BYTES`, so no block outgrows the target
block size), each file is read by ONE remote task (pyarrow dataset
projection + row filter inside the task, against the caller's unified
schema so cross-file column drift behaves exactly like read_parquet)
and the blocks are assembled with ``from_arrow_refs`` — identical rows,
zero planning round trips.  Anything larger takes the standard
streaming ``read_parquet`` path unchanged (row-group pruning, block
splitting, backpressure) — at 100 TB every hot read is far above the
threshold and this module is a no-op.
"""

from __future__ import annotations

import os

import pyarrow as pa

#: fast path only when the whole read fits comfortably in a few blocks
SMALL_READ_TOTAL_BYTES = 64 << 20
#: ... and no single file outgrows a sane object-store block
SMALL_READ_FILE_BYTES = 32 << 20

_READ_TASK = None  # lazily-created ray.remote handle (one per process)


def _read_one_file(path: str, schema, columns, filter_expr, fs) -> pa.Table:
    import pyarrow.dataset as pads

    ds = pads.dataset(path, schema=schema, format="parquet", filesystem=fs)
    return ds.to_table(columns=columns, filter=filter_expr)


def _file_sizes(paths, filesystem) -> list[int] | None:
    """Byte sizes per path, or None when any size is unknowable (then
    the caller must take the streaming path)."""
    sizes = []
    try:
        if filesystem is not None:
            for info in filesystem.get_file_info(list(paths)):
                if info.size is None:
                    return None
                sizes.append(info.size)
        else:
            for p in paths:
                sizes.append(os.path.getsize(p[7:] if p.startswith("file://") else p))
    except OSError:
        return None
    return sizes


def read_parquet_auto(
    paths: list[str],
    *,
    filesystem=None,
    columns: list[str] | None = None,
    filter=None,
    file_sizes: list[int] | None = None,
    **read_parquet_kwargs,
):
    """See module docstring.  *paths* must be FILES (not directories) for
    the fast path to engage; extra kwargs go to ``read_parquet`` on the
    streaming path (and disable the fast path if they would change
    semantics the fast path can't honor)."""
    import ray
    import ray.data

    fast_ok = not set(read_parquet_kwargs) - {"override_num_blocks"}
    sizes = file_sizes
    if fast_ok and sizes is None:
        sizes = _file_sizes(paths, filesystem)
    if (
        fast_ok
        and paths
        and sizes is not None
        and len(sizes) == len(paths)
        and sum(sizes) <= SMALL_READ_TOTAL_BYTES
        and max(sizes) <= SMALL_READ_FILE_BYTES
    ):
        import pyarrow.dataset as pads

        # ONE unified schema decision on the driver (footers only — the
        # cheap part of read_parquet's planning): cross-file column
        # drift (additive schema evolution mid-poll) then nulls-in
        # missing columns per file, like read_parquet's dataset scan
        d0 = pads.dataset(list(paths), format="parquet", filesystem=filesystem)
        try:
            unified = pa.unify_schemas(
                [f.physical_schema for f in d0.get_fragments()]
            )
        except pa.ArrowInvalid:
            unified = d0.schema
        global _READ_TASK
        if _READ_TASK is None:
            _READ_TASK = ray.remote(_read_one_file)
        refs = [
            _READ_TASK.remote(p, unified, columns, filter, filesystem)
            for p in paths
        ]
        return ray.data.from_arrow_refs(refs)
    return ray.data.read_parquet(
        list(paths),
        filesystem=filesystem,
        columns=columns,
        filter=filter,
        **read_parquet_kwargs,
    )
