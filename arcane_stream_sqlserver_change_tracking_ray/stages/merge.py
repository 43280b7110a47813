"""The partitioned last-writer-wins merge — the heart of the engine.

Reproduces the reference's ``MergeBatchProcessor`` semantics
(``main.scala:74,85``; results pinned by ``StreamRunner.scala:155-161,
254-258``): per ``arcane_merge_key`` take the event with max
``sys_change_version``; op ``D`` deletes the target row; otherwise
upsert all columns.  The reference delegates this to a Trino SQL
``MERGE``; here it is expressed Ray-Data-first:

1. **pre-combine** (combiner before the shuffle): within-batch LWW via
   ``map_batches`` keeps only the max-version event per key per batch —
   at 10^10-event scale this collapses hot-key event storms *before*
   any data moves (SURVEY.md §4.2 "skew"),
2. **route**: append ``_pid = stable_hash(key) % P`` (P fixed in the
   manifest — the analog of Iceberg ``bucket(arcane_merge_key, P)``),
3. **merge**: ``groupby(_pid).map_groups`` over zero-copy Arrow; each
   group task reads its partition's current parquet files, applies LWW
   against the incoming events, drops tombstones and rewrites the
   partition copy-on-write under an attempt-unique ``cycles/<id>/``
   dir.  Nothing is visible until the manifest commit.

Partition routing must be stable ACROSS runs and processes (files
persist): we use ``pandas.util.hash_array`` (SipHash with a fixed key),
never Python's salted ``hash()``.

The owner-actor strategy keys partition state to a single owner the way
Flink keys operator state to key groups (Carbone et al., "State
Management in Apache Flink", VLDB 2017 — PAPERS.md); the manifest log
follows Delta Lake's mutual-exclusion-on-rename protocol (Armbrust et
al., VLDB 2020).

Scale notes: only partitions touched by the cycle are rewritten; the
group payload held in memory is (changes for one partition) + (that
partition's current files) — size P so target_size/P is ~0.5-2 GB.
Tombstones need no persisted set: cycles apply strictly in version
order (monotone watermark), so a delete at version v can never be
trumped by a late event with version < v.
"""

from __future__ import annotations

import json
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from arcane_stream_sqlserver_change_tracking_ray.functions.transforms import cast_to_schema
from arcane_stream_sqlserver_change_tracking_ray.stages.partitioning import (
    cluster_order,
    coalesce_runs,
    column_bounds,
    source_columns,
)
from arcane_stream_sqlserver_change_tracking_ray.state.fs import lakefs
from arcane_stream_sqlserver_change_tracking_ray.types import (
    import_polars,
    MERGE_KEY_COL,
    OP_COL,
    OP_DELETE,
    PID_COL,
    VERSION_COL,
)

# ---------------------------------------------------------------------------
# stable partition routing
# ---------------------------------------------------------------------------
def stable_hash(keys: pa.ChunkedArray | pa.Array | np.ndarray) -> np.ndarray:
    """Process-stable uint64 hash of a string column (SipHash, fixed key).

    ~0.7 µs/row — it round-trips every value through a Python object.
    Kept as the ``"pandas"`` routing algo for tables committed by round 1
    (changing a table's routing hash orphans its partition files); new
    tables default to the ~30x faster ``"polars"`` algo below."""
    if isinstance(keys, (pa.ChunkedArray, pa.Array)):
        keys = keys.to_numpy(zero_copy_only=False)
    return pd.util.hash_array(np.asarray(keys, dtype=object))


def hash_keys(keys, algo: str = "pandas") -> np.ndarray:
    """uint64 key hash under a NAMED algorithm.

    The algo is recorded in the table's manifest (``key_hash_algo``) —
    routing must be stable across runs and processes for the life of the
    table, so the function is part of the table format, not a tunable.

    The hash DOMAIN is canonical too: non-string keys are cast to their
    decimal/utf8 string form first — exactly the ``arcane_merge_key``
    string ``synthesize_merge_key`` / ``ensure_merge_key_alias`` store.
    Every router and reader (cycle routing, point-lookup pruning,
    repartitioning) must place a key identically whether it sees the
    aliased raw column or the stored merge-key string; hashing raw int
    buffers here would silently route to a different partition than a
    string-keyed ``lookup_keys`` probes (found only by accident of
    pid coverage).  The url-keyed headline path is already a string —
    zero extra work there.

    - ``"pandas"``: pd.util.hash_array (SipHash-1-3, fixed key); slow
      (Python-object round-trip) but the round-1 format.
    - ``"polars"``: polars' ahash over the Arrow buffers directly —
      ~30x faster, deterministic across processes for a pinned polars
      version (verified 1.42); the default for new tables.
    """
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if isinstance(keys, pa.Array) and not (
        pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type)
    ):
        keys = pc.cast(keys, pa.string())
    if algo == "polars":
        pl = import_polars()

        if isinstance(keys, pa.Array):
            return pl.from_arrow(keys).hash(seed=42).to_numpy(allow_copy=True)
        return pl.Series(
            np.asarray(keys, dtype=object).astype(str)
        ).hash(seed=42).to_numpy(allow_copy=True)
    if algo != "pandas":
        raise ValueError(f"unknown key_hash_algo: {algo!r}")
    if isinstance(keys, pa.Array):
        return stable_hash(keys)
    arr = np.asarray(keys, dtype=object)
    if arr.size and not isinstance(arr.flat[0], str):
        arr = arr.astype(str).astype(object)
    return stable_hash(arr)


def partition_ids(keys, num_partitions: int, algo: str = "pandas") -> np.ndarray:
    return (hash_keys(keys, algo) % np.uint64(num_partitions)).astype(np.int64)


#: skip the push-side LWW combine when a batch's duplicate-key rate is
#: below this: at low dup rates the string sort costs more than shipping
#: the few duplicate rows (owners apply exact LWW at flush regardless);
#: at hot-key-storm rates the combine collapses the storm pre-exchange
PRECOMBINE_DUP_THRESHOLD = 0.25


def precombine_and_hash(
    batch: pa.Table, key_col: str, algo: str, threshold: float = PRECOMBINE_DUP_THRESHOLD
) -> tuple[pa.Table, np.ndarray]:
    """Hash the batch's keys once; LWW-combine the batch ONLY when its
    duplicate rate crosses *threshold* (M2 as an adaptive combiner).
    Returns the (possibly filtered) batch and its key hashes."""
    h = hash_keys(batch[key_col], algo)
    n = len(h)
    if n > 1 and (n - np.unique(h).size) > threshold * n:
        mask = lww_winner_mask(batch, key_col)
        batch = batch.filter(pa.array(mask))
        h = h[mask]
    return batch, h


# ---------------------------------------------------------------------------
# vectorized LWW
# ---------------------------------------------------------------------------
def lww_winner_mask(
    t: pa.Table, key_col: str = MERGE_KEY_COL, version_col: str = VERSION_COL
) -> np.ndarray:
    """Boolean mask (in ORIGINAL row order) of the max-version row per key.

    Sorts only the (key, version) projection — the payload columns are
    never gathered.  On a memory-bandwidth-bound box this matters: a
    full-table ``take`` is a pass over every payload byte; the mask +
    single ``filter`` halves the traffic of the old sort-take-filter."""
    sel = t.select([key_col, version_col])
    idx = pc.sort_indices(
        sel, sort_keys=[(key_col, "ascending"), (version_col, "descending")]
    )
    idxn = idx.to_numpy()
    k = sel[key_col].take(idx).to_numpy(zero_copy_only=False)
    first = np.r_[True, k[1:] != k[:-1]]
    mask = np.zeros(t.num_rows, dtype=bool)
    mask[idxn[first]] = True
    return mask


def lww_table(
    t: pa.Table, key_col: str = MERGE_KEY_COL, version_col: str = VERSION_COL
) -> pa.Table:
    """Keep the max-version row per key (rank-1 per key, reference M2:
    ``row_number() over (partition by merge_key order by version desc) = 1``).
    Vectorized; output keeps the surviving rows in their original order."""
    if t.num_rows <= 1:
        return t
    return t.filter(pa.array(lww_winner_mask(t, key_col, version_col)))


def ensure_merge_key_alias(t: pa.Table, key_col: str) -> pa.Table:
    """Append ``arcane_merge_key`` as a (cast) alias of *key_col* — done at
    write time only, so the duplicate string never travels through the
    exchange (see TransformStage's single-key fast path)."""
    if key_col == MERGE_KEY_COL or MERGE_KEY_COL in t.column_names:
        return t
    col = t[key_col]
    if not pa.types.is_string(col.type):
        col = pc.cast(col, pa.string())
    return t.append_column(MERGE_KEY_COL, col)


def drop_tombstones(t: pa.Table) -> pa.Table:
    if OP_COL not in t.column_names or t.num_rows == 0:
        return t
    return t.filter(pc.not_equal(pc.coalesce(t[OP_COL], pa.scalar("U")), OP_DELETE))


# ---------------------------------------------------------------------------
# bloom-filter sidecars (E2 parquetBloomFilterColumns analog)
# ---------------------------------------------------------------------------
#: pyarrow 16 cannot write parquet-native bloom filters, so the writers
#: emit `<file>.bloom.npz` sidecars (one bitset per configured column)
#: and `lookup_keys` prunes files whose bitset excludes every probed key
#: (reference targetTableProperties.parquetBloomFilterColumns,
#: docs/crd.md:111,128).
BLOOM_SUFFIX = ".bloom.npz"
_BLOOM_BITS_PER_KEY = 10
_BLOOM_HASHES = 4


def _bloom_m_bits(n_keys: int) -> int:
    m = 64
    while m < n_keys * _BLOOM_BITS_PER_KEY:
        m <<= 1
    return m


def _bloom_positions(values, m: int) -> tuple[np.ndarray, np.ndarray]:
    h1 = stable_hash(values)
    h2 = (h1 >> np.uint64(33)) | np.uint64(1)
    idx = np.empty((_BLOOM_HASHES, len(h1)), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(_BLOOM_HASHES):
            idx[i] = (h1 + np.uint64(i) * h2) % np.uint64(m)
    return idx >> np.uint64(6), idx & np.uint64(63)


def build_bloom(values) -> np.ndarray:
    """uint64 bitset bloom filter over a (string) column's values."""
    m = _bloom_m_bits(len(values))
    words, bits = _bloom_positions(values, m)
    out = np.zeros(m >> 6, dtype=np.uint64)
    np.bitwise_or.at(out, words.ravel(), np.uint64(1) << bits.ravel())
    return out


def bloom_may_contain(bitset: np.ndarray, keys) -> np.ndarray:
    """Per-key boolean: could the file contain this key? (no false
    negatives; false-positive rate ~ (1/2)^4 at 10 bits/key)."""
    m = len(bitset) << 6
    words, bits = _bloom_positions(keys, m)
    hit = np.ones(words.shape[1], dtype=bool)
    for i in range(_BLOOM_HASHES):
        hit &= (bitset[words[i]] >> bits[i]) & np.uint64(1) != 0
    return hit


def write_bloom_sidecar(
    fs, parquet_rel: str, table: pa.Table, columns: tuple[str, ...]
) -> None:
    blooms = {
        c: build_bloom(table[c]) for c in columns if c in table.column_names
    }
    if blooms:
        fs.write_npz(parquet_rel + BLOOM_SUFFIX, **blooms)


def bloom_sidecar_excludes(fs, parquet_rel: str, column: str, keys) -> bool:
    """True iff a sidecar exists for *column* and rules out EVERY key."""
    z = fs.read_npz(parquet_rel + BLOOM_SUFFIX)
    if z is None or column not in z:
        return False
    try:
        return not bloom_may_contain(z[column], keys).any()
    except Exception:
        return False


#: rows per parquet ROW GROUP inside partition files.  Partitioning is
#: by key HASH, so a whole file's min/max on any payload/sort column
#: spans ~the full domain and can never be skipped; row groups within a
#: file DO carry narrow min/max ranges when the file is sorted
#: (sortedBy), and pyarrow's scan-filter prunes at row-group
#: granularity — this is what makes `read_target(where=...)` skip I/O
#: on a sorted column.  ~32k rows ≈ tens of MB for webtext rows, the
#: usual lake sweet spot.
ROW_GROUP_ROWS = 32_768


def write_partition_files(
    table: pa.Table,
    target_root: str,
    cycle_id: str,
    pid: int,
    *,
    max_rows_per_file: int,
    compression: str,
    fsync: bool = True,
    prefix: str = "part",
    bloom_columns: tuple[str, ...] = (),
    row_group_rows: int = ROW_GROUP_ROWS,
    cluster_by: tuple = (),
    cluster_min_rows: int = 0,
    bounds_cols: tuple[str, ...] = (),
    bounds_out: dict | None = None,
) -> tuple[list[str], int]:
    """Write one partition's rows under the attempt-unique cycle dir;
    returns (relative paths, bytes).  Shared by the CoW rewrite, the MoR
    delta writer and compaction.  *bloom_columns* adds per-file bloom
    sidecars for point-lookup file skipping (E2).

    *cluster_by* (parsed ``PartitionExpr`` tuple — the E2
    ``partitionExpressions`` value dimension, reference
    ``docs/crd.md:114-119``) splits the partition's rows into one file
    run per transform value (stable, so an upstream ``sorted_by`` order
    survives within each cluster).  *bounds_out*, when given a dict,
    receives write-time ``{rel: {col: [lo, hi]}}`` bounds over the
    transform source columns for ``manifest.file_stats`` — pruning
    works immediately, no ANALYZE pass needed."""
    rels: list[str] = []
    total = 0
    if table.num_rows == 0:
        return rels, 0
    fs = lakefs(target_root)

    runs: list[pa.Table] = [table]
    bcols: tuple[str, ...] = tuple(bounds_cols)
    if cluster_by:
        bcols = bcols or source_columns(cluster_by)
        co = cluster_order(table, cluster_by)
        if co is not None:
            order, starts = co
            starts = coalesce_runs(starts, cluster_min_rows)
            sorted_tbl = table.take(pa.array(order))
            runs = [
                sorted_tbl.slice(s, e - s) for s, e in zip(starts[:-1], starts[1:])
            ]

    for run in runs:
        for off in range(0, run.num_rows, max_rows_per_file):
            chunk = run.slice(off, max_rows_per_file)
            rel = f"cycles/{cycle_id}/{prefix}-{pid:05d}-{uuid.uuid4().hex}.parquet"
            total += fs.write_table(
                chunk,
                rel,
                durable=fsync,
                compression=compression,
                row_group_size=row_group_rows,
            )
            if bloom_columns:
                write_bloom_sidecar(fs, rel, chunk, bloom_columns)
            if bounds_out is not None and bcols:
                b = column_bounds(chunk, bcols)
                if b:
                    bounds_out[rel] = b
            rels.append(rel)
    return rels, total


def split_entry(entry: str) -> tuple[str, list[int] | None]:
    """Parse a manifest file entry into ``(relpath, row_group_indices)``.

    Plain entries are whole files.  The 'direct' MoR merge writes ONE
    pid-sorted delta file per push task with row groups aligned to
    partition boundaries; the manifest then references the pid's slice
    as ``<relpath>#rg=<a>-<b>`` (inclusive) so readers fetch only that
    partition's row groups."""
    rel, sep, frag = entry.partition("#rg=")
    if not sep:
        return entry, None
    lo, dash, hi = frag.partition("-")
    return rel, list(range(int(lo), int(hi) + 1 if dash else int(lo) + 1))


def read_entry_table(
    target_root: str,
    entry: str,
    wanted: set[str] | None = None,
    use_threads: bool = True,
) -> pa.Table:
    """Read a manifest file entry (fragment-aware)."""
    rel, rgs = split_entry(entry)
    pf = lakefs(target_root).parquet_file(rel)
    cols = (
        [c for c in pf.schema_arrow.names if c in wanted] if wanted is not None else None
    )
    if rgs is None:
        return pf.read(columns=cols, use_threads=use_threads)
    return pf.read_row_groups(rgs, columns=cols, use_threads=use_threads)


#: comparison operators a delete predicate may use (K9 predicate
#: deletes): conjunction terms are ``[column, op, literal]``
PREDICATE_OPS = {
    "==": pc.equal,
    "!=": pc.not_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
}


def term_scalar(op: str, lit, col_type: pa.DataType) -> pa.Scalar:
    """The literal as a scalar comparable against *col_type*: a PLAIN
    scalar when the compare kernel promotes the pair (int64 column vs
    float literal compares exactly, no truncation), else the literal is
    cast to the column type (a timestamp column vs an epoch-micros int
    literal has no promoting kernel).  Raises when neither works —
    ``validate_conjunction`` surfaces that as a clean ValueError at
    commit/read time instead of a bricked reader."""
    plain = pa.scalar(lit)
    try:
        PREDICATE_OPS[op](pa.nulls(0, col_type), plain)
        return plain
    except pa.ArrowNotImplementedError:
        return pa.scalar(lit, col_type)


def validate_conjunction(
    conjunction: list, schema: pa.Schema | None, allow_temporal: bool = False
) -> list:
    """Validate and normalize a ``[[col, op, literal], ...]`` AND-ed
    conjunction (shared by ``delete_where`` and filtered reads).

    *allow_temporal* additionally admits datetime/date literals —
    filtered READS pass it (timestamp predicates drive the
    partition_by file pruning); the delete_where path keeps the strict
    JSON-scalar contract because its predicates PERSIST in the manifest
    until ``materialize_deletes``."""
    import datetime as _dt

    if not conjunction:
        raise ValueError("predicate requires at least one [col, op, literal] term")
    ok_types: tuple = (int, float, str, bool)
    if allow_temporal:
        ok_types += (_dt.datetime, _dt.date)
    norm = []
    for term in conjunction:
        col, op, lit = term
        if op not in PREDICATE_OPS:
            raise ValueError(f"unsupported predicate op {op!r}")
        if schema is not None and col not in schema.names:
            raise ValueError(f"unknown column {col!r} in predicate")
        if not isinstance(lit, ok_types):
            raise ValueError(f"unsupported literal type {type(lit).__name__}")
        if schema is not None:
            col_type = schema.field(col).type
            try:
                term_scalar(op, lit, col_type)
            except Exception:
                raise ValueError(
                    f"literal {lit!r} is not comparable with column "
                    f"{col!r} ({col_type})"
                )
        norm.append([col, op, lit])
    return norm


def conjunction_expression(conjunction: list, schema: pa.Schema | None = None):
    """The conjunction as a ``pyarrow.dataset`` filter Expression — fed
    to ``read_parquet(filter=...)`` so parquet row-group statistics
    prune non-matching row groups AT THE SCAN (no bytes leave storage
    for excluded groups).  With *schema*, literals whose pair has no
    promoting compare kernel (timestamp column vs epoch int) are cast
    to the column type, mirroring the merge-on-read apply path."""
    import operator as _op

    import pyarrow.dataset as pads

    ops = {
        "==": _op.eq, "!=": _op.ne, "<": _op.lt,
        "<=": _op.le, ">": _op.gt, ">=": _op.ge,
    }
    expr = None
    for col, op, lit in conjunction:
        rhs = (
            term_scalar(op, lit, schema.field(col).type)
            if schema is not None and col in schema.names
            else lit
        )
        e = ops[op](pads.field(col), rhs)
        expr = e if expr is None else expr & e
    return expr


def filter_conjunction(t: pa.Table, conjunction: list) -> pa.Table:
    """SQL ``WHERE`` over an Arrow table: keep rows matching every term;
    null comparisons are non-matches (dropped), unlike delete
    predicates where null comparisons mean 'keep the row'."""
    if t.num_rows == 0:
        return t
    mask = None
    for col, op, lit in conjunction:
        m = PREDICATE_OPS[op](t[col], term_scalar(op, lit, t[col].type))
        mask = m if mask is None else pc.and_kleene(mask, m)
    return t.filter(pc.coalesce(mask, pa.scalar(False)))


def predicate_columns(delete_predicates) -> set[str]:
    """Every column referenced by any predicate (readers must retain
    them through column pruning so the filter can evaluate)."""
    return {
        term[0]
        for pred in (delete_predicates or [])
        for term in pred["conjunction"]
    }


def apply_delete_predicates(
    t: pa.Table, delete_predicates, version_col: str = VERSION_COL
) -> pa.Table:
    """Apply committed MoR DELETE predicates to LWW-resolved rows.

    Each predicate is point-in-time: it deletes rows whose winning
    version is ≤ the predicate's commit watermark AND whose payload
    matches the conjunction — a key re-upserted AFTER the delete
    survives, exactly like SQL ``DELETE`` followed by new inserts.  A
    conjunction term naming a column absent from *t* (pre-evolution
    files) cannot match, so the predicate drops nothing there."""
    for pred in delete_predicates or []:
        if t.num_rows == 0:
            break
        mask = pc.less_equal(t[version_col], pa.scalar(pred["watermark"], pa.int64()))
        ok = True
        for col, op, lit in pred["conjunction"]:
            if col not in t.column_names:
                ok = False
                break
            # kernel promotion where possible (never literal truncation),
            # typed cast only where no promoting kernel exists (timestamps)
            mask = pc.and_kleene(
                mask, PREDICATE_OPS[op](t[col], term_scalar(op, lit, t[col].type))
            )
        if not ok:
            continue
        # null comparisons stay null -> treated as non-matching (kept)
        t = t.filter(pc.coalesce(pc.invert(mask), pa.scalar(True)))
    return t


def apply_key_deletes(
    t: pa.Table,
    target_root: str,
    key_delete_entries,
    key_col: str = MERGE_KEY_COL,
    version_col: str = VERSION_COL,
) -> pa.Table:
    """Apply this partition's committed equality-delete files (K9b) to
    LWW-resolved rows: drop rows whose canonical merge-key string is in
    the delete file AND whose winning version is ≤ the delete's commit
    watermark — a key re-upserted after the delete survives (Iceberg v2
    equality deletes scoped by sequence number)."""
    for entry in key_delete_entries or []:
        if t.num_rows == 0:
            break
        dk = lakefs(target_root).read_table(
            entry["file"], columns=[MERGE_KEY_COL]
        )[MERGE_KEY_COL].combine_chunks()
        name = MERGE_KEY_COL if MERGE_KEY_COL in t.column_names else key_col
        col = t[name]
        if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
            col = pc.cast(col, pa.string())  # the canonical hash/key domain
        mask = pc.and_kleene(
            pc.is_in(col, value_set=dk),
            pc.less_equal(t[version_col], pa.scalar(entry["watermark"], pa.int64())),
        )
        # null key/version comparisons stay null -> treated as
        # non-matching (row KEPT), same contract as delete predicates
        t = t.filter(pc.coalesce(pc.invert(mask), pa.scalar(True)))
    return t


def resolve_partition_table(
    target_root: str,
    base_files: list[str],
    delta_files: list[str],
    schema: pa.Schema,
    key_filter: pa.Array | None = None,
    key_col: str = MERGE_KEY_COL,
    use_threads: bool = True,
    bloom_column: str | None = None,
    stats: dict | None = None,
    delete_predicates=None,
    key_deletes=None,
) -> pa.Table:
    """Merge-on-read resolve of ONE partition: LWW across base + deltas,
    tombstones dropped.  Partitions are key-disjoint, so this is exact.
    *key_filter* prunes rows early (point lookups) — filtering by key
    before LWW is safe because every version of a key lives in the same
    partition.  With *bloom_column*, files whose bloom sidecar rules out
    every probed key are skipped entirely (no false negatives, so
    skipping cannot change the LWW outcome for the probed keys)."""
    wanted = set(schema.names)
    fs = lakefs(target_root)
    tables = []
    for entry in list(base_files) + list(delta_files):
        rel, _ = split_entry(entry)
        if (
            key_filter is not None
            and bloom_column is not None
            and bloom_sidecar_excludes(fs, rel, bloom_column, key_filter)
        ):
            if stats is not None:
                stats["files_skipped"] = stats.get("files_skipped", 0) + 1
            continue
        if stats is not None:
            stats["files_read"] = stats.get("files_read", 0) + 1
        t = read_entry_table(target_root, entry, wanted, use_threads=use_threads)
        if key_filter is not None:
            t = t.filter(pc.is_in(t[key_col], value_set=key_filter))
        tables.append(cast_to_schema(t, schema))
    if not tables:
        return schema.empty_table()
    combined = pa.concat_tables(tables)
    if delta_files:
        combined = drop_tombstones(lww_table(combined))
    # else: base files are already LWW-resolved and alive
    if key_deletes:
        combined = apply_key_deletes(combined, target_root, key_deletes, key_col)
    if delete_predicates:
        combined = apply_delete_predicates(combined, delete_predicates)
    return combined


CHANGE_TYPE_COL = "change_type"


def change_feed_schema_fields(
    schema: pa.Schema, drop_meta: bool, pre_image_columns: tuple[str, ...] = ()
) -> list[pa.Field]:
    """Output fields of a change-feed read (shared by the per-partition
    resolver and the Dataset wrapper so empty results keep the schema)."""
    fields = [f for f in schema] + [pa.field(CHANGE_TYPE_COL, pa.string())]
    fields += [pa.field(f"pre_{c}", schema.field(c).type) for c in pre_image_columns]
    if drop_meta:
        fields = [f for f in fields if f.name not in (OP_COL, MERGE_KEY_COL)]
    return fields


def change_feed_partition(
    target_root: str,
    appended_entries: list[str],
    base_at_from: list[str],
    deltas_at_from: list[str],
    schema: pa.Schema,
    drop_meta: bool = True,
    key_col: str = MERGE_KEY_COL,
    pre_image_columns: tuple[str, ...] = (),
    delete_predicates=None,
    key_deletes=None,
) -> pa.Table:
    """NET row-level changes of ONE partition between two snapshots —
    the change-data-feed resolve (SQL Server ``CHANGETABLE(CHANGES t,
    @from)`` net semantics, the very feed the reference consumes:
    ``docs/crd.md`` change-tracking contract; Delta-Lake CDF analog).

    Reads ONLY the delta entries appended in ``(from, to]`` (cost ∝
    changes, never table size), takes the LWW winner per key among
    them, then probes the FROM snapshot for just those keys (key_filter
    + bloom sidecars — the same partition-pruned point-lookup path as
    ``lookup_keys``) to classify:

    - winner is a tombstone, key alive at FROM    -> ``delete``
    - winner is a tombstone, key absent at FROM   -> net no-op (dropped)
    - winner is an upsert, key alive at FROM      -> ``update``
    - winner is an upsert, key absent at FROM     -> ``insert``

    Emits the winner's payload row (for deletes: the tombstone's row —
    its ``sys_change_version`` is the deleting change's version) plus a
    ``change_type`` column.  *pre_image_columns* additionally attaches
    the FROM-snapshot value of those columns as ``pre_<name>`` (null for
    inserts) — what an incremental consumer needs to RETRACT the old
    contribution of an updated/deleted row (materialized-view
    maintenance; Delta CDF ``update_preimage`` analog).  The pre-images
    come from the prior-snapshot probe already performed for
    classification, so they cost no extra reads."""
    wanted = set(schema.names)
    tables = [
        cast_to_schema(read_entry_table(target_root, e, wanted), schema)
        for e in appended_entries
    ]
    tables = [t for t in tables if t.num_rows]
    out_fields = change_feed_schema_fields(schema, drop_meta, pre_image_columns)
    empty = pa.schema(out_fields).empty_table()
    if not tables:
        return empty
    changes = lww_table(pa.concat_tables(tables), key_col=key_col)
    keys = changes[key_col].combine_chunks()
    # the FROM-snapshot probe needs only existence (key/version/op for
    # the LWW resolve) plus any requested pre-image columns — never the
    # full payload (html/text dominate a webtext row; reading them here
    # would make feed cost grow with row width for no reason)
    probe_need = (
        {key_col, VERSION_COL, OP_COL}
        | set(pre_image_columns)
        | predicate_columns(delete_predicates)
    )
    probe_schema = pa.schema([f for f in schema if f.name in probe_need])
    prior = resolve_partition_table(
        target_root,
        base_at_from,
        deltas_at_from,
        probe_schema,
        key_filter=keys,
        key_col=key_col,
        bloom_column=key_col,
        delete_predicates=delete_predicates,
        key_deletes=key_deletes,
    )
    prior_keys = prior[key_col].combine_chunks()
    existed = pc.is_in(changes[key_col], value_set=prior_keys)
    is_del = pc.equal(pc.coalesce(changes[OP_COL], pa.scalar("U")), OP_DELETE)
    kind = pc.if_else(
        is_del,
        pa.scalar("delete"),
        pc.if_else(existed, pa.scalar("update"), pa.scalar("insert")),
    )
    out = changes.append_column(CHANGE_TYPE_COL, kind)
    if pre_image_columns:
        idx = pc.index_in(changes[key_col], value_set=prior_keys)
        for c in pre_image_columns:  # null index -> null pre-image (inserts)
            out = out.append_column(f"pre_{c}", prior[c].combine_chunks().take(idx))
    # a key created AND deleted inside the range never existed in either
    # snapshot: net no-op, exactly like CHANGETABLE's net mode
    out = out.filter(pc.or_(pc.invert(is_del), existed))
    if drop_meta:
        out = out.drop_columns([c for c in (OP_COL, MERGE_KEY_COL) if c in out.column_names])
    return out.select([f.name for f in out_fields])


def change_feed_all_partition(
    target_root: str,
    appended_entries: list[str],
    schema: pa.Schema,
    drop_meta: bool = True,
) -> pa.Table:
    """ALL row-level changes of one partition appended in ``(from, to]``
    — the per-change history as persisted (``cdc.fn_cdc_get_all_changes``
    analog; :func:`change_feed_partition` above is the NET mode that
    collapses to per-key winners).  ``change_type`` surfaces each row's
    logged operation (I/U/D → insert/update/delete) — source-claimed,
    not snapshot-relative.  Under the adaptive pre-combine the persisted
    history is the per-push LWW survivors; replay with
    ``precombine_dup_threshold > 1`` when raw per-event fidelity is
    required (same knob the exact cycle counters need)."""
    wanted = set(schema.names)
    tables = [
        cast_to_schema(read_entry_table(target_root, e, wanted), schema)
        for e in appended_entries
    ]
    tables = [t for t in tables if t.num_rows]
    out_fields = change_feed_schema_fields(schema, drop_meta)
    if not tables:
        return pa.schema(out_fields).empty_table()
    rows = pa.concat_tables(tables)
    op = pc.coalesce(rows[OP_COL], pa.scalar("U"))
    kind = pc.if_else(
        pc.equal(op, OP_DELETE),
        pa.scalar("delete"),
        pc.if_else(pc.equal(op, "I"), pa.scalar("insert"), pa.scalar("update")),
    )
    out = rows.append_column(CHANGE_TYPE_COL, kind)
    if drop_meta:
        out = out.drop_columns(
            [c for c in (OP_COL, MERGE_KEY_COL) if c in out.column_names]
        )
    return out.select([f.name for f in out_fields])


# ---------------------------------------------------------------------------
# map_batches stage: pre-combine + route (runs before the shuffle)
# ---------------------------------------------------------------------------
class PrecombineAndRoute:
    """Adaptive within-batch LWW combiner + partition-id routing column.

    A plain callable class usable in ``map_batches`` (stateless enough
    for tasks, but compiled once per actor when used in an actor pool).
    The key is hashed ONCE (routing + dup-rate detection share it); the
    LWW combine runs only when the batch's duplicate rate warrants it.
    """

    def __init__(self, num_partitions: int, key_col: str = MERGE_KEY_COL,
                 hash_algo: str = "pandas",
                 precombine_threshold: float = PRECOMBINE_DUP_THRESHOLD):
        self.num_partitions = num_partitions
        self.key_col = key_col
        self.hash_algo = hash_algo
        self.precombine_threshold = precombine_threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(PID_COL, pa.array([], pa.int64()))
        batch, h = precombine_and_hash(
            batch, self.key_col, self.hash_algo, self.precombine_threshold
        )
        pid = (h % np.uint64(self.num_partitions)).astype(np.int64)
        return batch.append_column(PID_COL, pa.array(pid, type=pa.int64()))


# ---------------------------------------------------------------------------
# map_groups stage: per-partition copy-on-write merge
# ---------------------------------------------------------------------------
class PartitionMergeFn:
    """``groupby(_pid).map_groups`` function: merge one partition.

    Returns a one-row stats table (pid, rows, upserts, deletes, files
    written as a JSON list) — the driver folds these into the next
    manifest's ``partitions`` / ``lineage``.  The group function is
    shipped once per task; its captured state (partition→files map +
    target schema) is a few KB.
    """

    STATS_SCHEMA = pa.schema(
        [
            pa.field(PID_COL, pa.int64()),
            pa.field("rows", pa.int64()),
            pa.field("upserts", pa.int64()),
            pa.field("deletes", pa.int64()),
            pa.field("changes_in", pa.int64()),
            pa.field("bytes", pa.int64()),
            pa.field("files_json", pa.string()),
            pa.field("mode", pa.string()),  # "cow" base rewrite | "mor" delta
            #: write-time {rel: {col: [lo,hi]}} for manifest.file_stats
            pa.field("file_stats_json", pa.string()),
        ]
    )

    def __init__(
        self,
        target_root: str,
        cycle_id: str,
        partition_files: dict[int, list[str]],
        schema: pa.Schema,
        max_rows_per_file: int = 1_000_000,
        compression: str = "zstd",
        sorted_by: tuple[str, ...] = (),
        key_col: str = MERGE_KEY_COL,
        mode: str = "mor",
        fsync: bool = True,
        bloom_columns: tuple[str, ...] = (),
        cluster_by: tuple = (),
        cluster_min_rows: int = 0,
    ):
        self.target_root = target_root
        self.cycle_id = cycle_id
        self.partition_files = partition_files
        self.schema = schema
        self.max_rows_per_file = max_rows_per_file
        self.compression = compression
        self.sorted_by = sorted_by
        self.key_col = key_col
        self.mode = mode
        self.fsync = fsync
        self.bloom_columns = bloom_columns
        self.cluster_by = cluster_by
        self.cluster_min_rows = cluster_min_rows

    # -- target partition io -------------------------------------------------
    def _read_existing(self, pid: int) -> pa.Table | None:
        files = self.partition_files.get(pid, [])
        if not files:
            return None
        tables = []
        for entry in files:  # fragment-aware: deltas may be #rg= slices
            t = read_entry_table(self.target_root, entry)
            tables.append(cast_to_schema(t, self.schema))
        return pa.concat_tables(tables)

    def _write(
        self, pid: int, table: pa.Table, prefix: str = "part"
    ) -> tuple[list[str], int, dict]:
        if self.sorted_by and table.num_rows:
            table = table.sort_by([(c, "ascending") for c in self.sorted_by])
        bounds: dict = {}
        rels, nbytes = write_partition_files(
            table,
            self.target_root,
            self.cycle_id,
            pid,
            max_rows_per_file=self.max_rows_per_file,
            compression=self.compression,
            fsync=self.fsync,
            prefix=prefix,
            bloom_columns=self.bloom_columns,
            cluster_by=self.cluster_by,
            cluster_min_rows=self.cluster_min_rows,
            # sortedBy columns get write-time bounds too: a sorted write
            # yields disjoint per-file ranges, so pruning engages with no
            # ANALYZE pass (Iceberg manifest-entry bounds posture)
            bounds_cols=tuple(
                dict.fromkeys(source_columns(self.cluster_by) + tuple(self.sorted_by))
            ),
            bounds_out=bounds,
        )
        return rels, nbytes, bounds

    # -- the merge -----------------------------------------------------------
    def __call__(self, group: pa.Table) -> pa.Table:
        pid = int(group[PID_COL][0].as_py())
        changes = ensure_merge_key_alias(group.drop_columns([PID_COL]), self.key_col)
        changes = cast_to_schema(changes, self.schema)
        n_changes = changes.num_rows

        if self.mode == "mor":
            # merge-on-read: write the cycle's changes as a DELTA file —
            # never read or rewrite the base files, so cycle cost scales
            # with cycle size, not table size (the Iceberg-MERGE-style
            # partition-granularity CoW rewrote ~the whole table per
            # cycle at scale).  Tombstones (op='D') persist in the delta
            # until the maintenance OPTIMIZE fold.
            delta = lww_table(changes)  # collapse within-cycle event storms
            deletes = delta.num_rows - drop_tombstones(delta).num_rows
            rels, nbytes, bounds = self._write(pid, delta, prefix="delta")
            return pa.table(
                {
                    PID_COL: [pid],
                    "rows": [delta.num_rows],
                    "upserts": [n_changes - deletes],
                    "deletes": [deletes],
                    "changes_in": [n_changes],
                    "bytes": [nbytes],
                    "files_json": [json.dumps(rels)],
                    "mode": ["mor"],
                    "file_stats_json": [json.dumps(bounds) if bounds else ""],
                },
                schema=self.STATS_SCHEMA,
            )

        existing = self._read_existing(pid)
        if existing is not None:
            combined = pa.concat_tables([existing, changes])
        else:
            combined = changes
        merged = lww_table(combined)
        alive = drop_tombstones(merged)
        deletes = merged.num_rows - alive.num_rows
        upserts = n_changes - deletes

        rels, nbytes, bounds = self._write(pid, alive)
        return pa.table(
            {
                PID_COL: [pid],
                "rows": [alive.num_rows],
                "upserts": [upserts],
                "deletes": [deletes],
                "changes_in": [n_changes],
                "bytes": [nbytes],
                "files_json": [json.dumps(rels)],
                "mode": ["cow"],
                "file_stats_json": [json.dumps(bounds) if bounds else ""],
            },
            schema=self.STATS_SCHEMA,
        )


def apply_change_batch(
    changes_ds,
    *,
    target_root: str,
    cycle_id: str,
    partition_files: dict[int, list[str]],
    schema: pa.Schema,
    num_partitions: int,
    max_rows_per_file: int = 1_000_000,
    compression: str = "zstd",
    sorted_by: tuple[str, ...] = (),
    batch_size: int = 65536,
    key_col: str = MERGE_KEY_COL,
    mode: str = "cow",
    fsync: bool = True,
    bloom_columns: tuple[str, ...] = (),
    hash_algo: str = "pandas",
    precombine_threshold: float = PRECOMBINE_DUP_THRESHOLD,
    cluster_by: tuple = (),
    cluster_min_rows: int = 0,
) -> list[dict]:
    """Run the full merge pipeline for one change batch; returns per-touched-
    partition stats dicts.  The only materialized result is the tiny stats
    table (one row per touched partition)."""
    routed = changes_ds.map_batches(
        PrecombineAndRoute(num_partitions, key_col, hash_algo, precombine_threshold),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    merge_fn = PartitionMergeFn(
        target_root=target_root,
        cycle_id=cycle_id,
        partition_files=partition_files,
        schema=schema,
        max_rows_per_file=max_rows_per_file,
        compression=compression,
        sorted_by=sorted_by,
        key_col=key_col,
        mode=mode,
        fsync=fsync,
        bloom_columns=bloom_columns,
        cluster_by=cluster_by,
        cluster_min_rows=cluster_min_rows,
    )
    def merge_partition(group: pa.Table) -> pa.Table:
        return merge_fn(group)

    stats_ds = routed.groupby(PID_COL).map_groups(merge_partition, batch_format="pyarrow")
    return stats_ds.take_all()  # one small dict per touched partition


def fold_stats_into_manifest(manifest, stats: list[dict], cycle_id: str) -> dict:
    """Update manifest.partitions / lineage from merge stats; returns the
    cycle metrics dict (rows_in, upserts, deletes, bytes, partitions)."""
    totals = {
        "changes_in": 0,
        "combined_away": 0,
        "upserts": 0,
        "deletes": 0,
        "bytes": 0,
        "rows": 0,
    }
    per_pid_load: dict[int, int] = {}
    for s in stats:
        pid = int(s[PID_COL])
        files = json.loads(s["files_json"])
        mode = s.get("mode", "cow")
        if mode == "mor":
            # delta files APPEND (append order == version order); base
            # files untouched.  The OPTIMIZE fold rewrites base + clears.
            if files:
                manifest.deltas.setdefault(pid, []).extend(files)
        else:
            manifest.partitions[pid] = files
            if not files:
                manifest.partitions.pop(pid, None)
            # a CoW rewrite folded every visible row (callers pass
            # base+deltas as partition_files), so pending deltas are dead
            manifest.deltas.pop(pid, None)
        manifest.lineage[pid] = {
            "cycle": cycle_id,
            "rows": int(s["rows"]),
            "files": len(files),
            "bytes": int(s["bytes"]),
            "mode": mode,
            "deltas": len(manifest.deltas.get(pid, [])),
        }
        per_pid_load[pid] = per_pid_load.get(pid, 0) + int(s["changes_in"])
        fsj = s.get("file_stats_json") if hasattr(s, "get") else None
        if fsj:
            # write-time column bounds (partition_by source columns) —
            # read_target pruning engages without waiting for ANALYZE
            manifest.file_stats.update(json.loads(fsj))
        for k in totals:
            v = s[k] if k in s else None
            totals[k] += int(v) if v is not None else 0
    # distinct pids: the 'direct' strategy emits one stats row per
    # (task, pid), so len(stats) would overcount
    totals["partitions_touched"] = len(per_pid_load)
    # every arriving row is accounted: routed + collapsed-by-combine
    # (precombined_rows is kept visible — storm-defusal telemetry)
    totals["precombined_rows"] = totals.pop("combined_away")
    totals["changes_in"] += totals["precombined_rows"]
    # skew telemetry (SURVEY.md §4.2): per-cycle partition load histogram
    # over rows ROUTED per partition (post-combine — the physical
    # exchange/write load).  A max/mean ratio near 1 means hot keys were
    # defused before the exchange; sustained high ratios would call for
    # re-bucketing the hot partitions
    loads = list(per_pid_load.values())
    if loads:
        mean = sum(loads) / len(loads)
        totals["skew"] = {
            "max_partition_changes": max(loads),
            "mean_partition_changes": round(mean, 1),
            "max_over_mean": round(max(loads) / mean, 3) if mean else 0.0,
        }
    if manifest.file_stats:
        # drop bounds of files this commit superseded (CoW rewrites /
        # delta folds); surviving entries stay exact — files are immutable
        live = manifest.all_files()
        manifest.file_stats = {
            k: v for k, v in manifest.file_stats.items() if k in live
        }
    return totals


# ---------------------------------------------------------------------------
# strategy 3: direct per-task delta writes (MoR only — the scale default)
# ---------------------------------------------------------------------------
_DIRECT_STATS_SCHEMA = pa.schema(
    [
        (PID_COL, pa.int64()),
        ("rows", pa.int64()),
        ("upserts", pa.int64()),
        ("deletes", pa.int64()),
        ("changes_in", pa.int64()),
        #: rows the adaptive pre-combine collapsed away BEFORE routing
        #: (attributed to the task's first stats row; cycle accounting +
        #: storm-defusal telemetry — NOT part of any partition's load)
        ("combined_away", pa.int64()),
        ("bytes", pa.int64()),
        ("files_json", pa.string()),
        ("mode", pa.string()),
        #: whole-file write-time bounds (attributed to the first pid row;
        #: one physical file per task, shared across its pid slices)
        ("file_stats_json", pa.string()),
    ]
)


def apply_change_batch_direct(
    changes_ds,
    *,
    target_root: str,
    cycle_id: str,
    schema: pa.Schema,
    num_partitions: int,
    compression: str = "zstd",
    sorted_by: tuple[str, ...] = (),
    batch_size: int | None = None,
    key_col: str = MERGE_KEY_COL,
    fsync: bool = True,
    bloom_columns: tuple[str, ...] = (),
    hash_algo: str = "pandas",
    max_rows_per_file: int = 1_000_000,
    precombine_threshold: float = PRECOMBINE_DUP_THRESHOLD,
    bounds_cols: tuple[str, ...] = (),
) -> list[dict]:
    """Merge-on-read WITHOUT an exchange: every push task writes its own
    pid-sorted delta parquet, row groups aligned to partition boundaries,
    and the manifest records each partition's slice as
    ``<file>#rg=<a>-<b>`` (see ``split_entry``).

    *bounds_cols* (the partition_by source columns): whole-file
    write-time bounds are recorded for manifest.file_stats so the
    merge-on-read pid pruning in ``read_target`` can skip partitions
    whose every base AND delta file excludes the predicate.  Direct
    deltas are NOT value-clustered — they are transient and the
    OPTIMIZE fold re-clusters when it rewrites base files (Iceberg
    compaction's posture).

    Why: the owner-actor exchange round-trips the full change payload
    through the object store (serialize → plasma → deserialize → buffer
    → write) before anything hits disk.  On bandwidth-bound hosts that
    copy chain is the non-scaling term of the cycle (BENCH/BASELINE.md
    round-2 profile: push_s flat from 2→8 CPUs while flush_s scales).
    Direct mode keeps the data inside the map task: read → transform →
    route (one argsort + one gather) → zstd to disk.  There is no
    barrier besides the tiny per-task stats collection, and no state —
    tasks are fully elastic across a cluster.

    Correctness: read-side LWW resolves strictly by version
    (``lww_table``), so cross-task duplicate keys within a cycle are
    resolved at read/OPTIMIZE exactly as cross-cycle duplicates already
    are; tombstones are retained in the delta.  The per-cycle combine
    the owner actors performed was an optimization, not a correctness
    point — within-task storms still collapse via the adaptive
    pre-combine.
    """
    P = num_partitions

    def write_task_delta(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _DIRECT_STATS_SCHEMA.empty_table()
        changes_in_total = batch.num_rows
        batch, h = precombine_and_hash(batch, key_col, hash_algo, precombine_threshold)
        combined_away_total = changes_in_total - batch.num_rows
        pid = (h % np.uint64(P)).astype(np.int64)
        order = np.argsort(pid, kind="stable")
        b = batch.take(pa.array(order))  # ONE payload gather
        pids = pid[order]
        b = cast_to_schema(ensure_merge_key_alias(b, key_col), schema)
        bounds = np.r_[np.flatnonzero(np.r_[True, pids[1:] != pids[:-1]]), len(pids)]
        fs = lakefs(target_root)
        rel = f"cycles/{cycle_id}/delta-{uuid.uuid4().hex}.parquet"
        rows_stat: list[dict] = []
        writer = fs.parquet_writer(rel, b.schema, compression=compression)
        try:
            rg = 0
            for slice_i, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
                sl = b.slice(s, e - s)
                if sorted_by:
                    sl = sl.sort_by([(c, "ascending") for c in sorted_by])
                first_rg = rg
                for off in range(0, sl.num_rows, max_rows_per_file):
                    chunk = sl.slice(off, max_rows_per_file)
                    writer.write_table(chunk, row_group_size=chunk.num_rows)
                    rg += 1
                deletes = sl.num_rows - drop_tombstones(sl).num_rows
                rows_stat.append(
                    {
                        PID_COL: int(pids[s]),
                        "rows": sl.num_rows,
                        "upserts": sl.num_rows - deletes,
                        "deletes": deletes,
                        "changes_in": sl.num_rows,
                        # task-level combine remainder is attributed to the
                        # first pid row so the cycle's 'every arriving row
                        # is accounted' invariant holds under pre-combine
                        "combined_away": combined_away_total if slice_i == 0 else 0,
                        "bytes": 0,  # filled from row-group metadata below
                        "files_json": json.dumps([f"{rel}#rg={first_rg}-{rg - 1}"]),
                        "mode": "mor",
                        "file_stats_json": "",
                    }
                )
        finally:
            writer.close(durable=fsync)
        if bloom_columns:
            write_bloom_sidecar(fs, rel, b, bloom_columns)
        # exact per-partition COMPRESSED sizes from the footer (summed per
        # column chunk — rg.total_byte_size is the uncompressed size)
        md = fs.parquet_file(rel).metadata
        rg_bytes = [
            sum(
                md.row_group(i).column(j).total_compressed_size
                for j in range(md.row_group(i).num_columns)
            )
            for i in range(md.num_row_groups)
        ]
        for r in rows_stat:
            _, rgs = split_entry(json.loads(r["files_json"])[0])
            r["bytes"] = int(sum(rg_bytes[i] for i in rgs))
        # account the pre-combine drop separately (combined_away) so the
        # cycle totals still see every arriving row WITHOUT inflating any
        # partition's routed load — changes_in stays the true per-pid
        # exchange/write load the skew histogram measures
        if rows_stat:
            rows_stat[0]["combined_away"] = changes_in_total - int(
                sum(r["rows"] for r in rows_stat)
            )
            if bounds_cols:
                fb = column_bounds(b, bounds_cols)
                if fb:
                    rows_stat[0]["file_stats_json"] = json.dumps({rel: fb})
        return pa.Table.from_pylist(rows_stat, schema=_DIRECT_STATS_SCHEMA)

    # batch_size=None → one delta file per BLOCK: file granularity is then
    # governed by the read split (4x CPUs, runner.bootstrap), not by a
    # row-count constant — fewer, larger files at low parallelism
    return changes_ds.map_batches(
        write_task_delta, batch_format="pyarrow", batch_size=batch_size
    ).take_all()


# ---------------------------------------------------------------------------
# strategy 2: persistent partition-owner merge actors
# ---------------------------------------------------------------------------
def _make_owner_actor():
    """Define the owner actor lazily so importing this module never
    requires an initialized Ray."""
    import ray

    @ray.remote(num_cpus=0, max_restarts=0)
    class MergeOwnerActor:
        """Owns a fixed subset of partitions (pid % A == actor_index).

        Deterministic actor<->partition affinity (SURVEY.md §7.5.2): every
        change slice for a pid is pushed to its one owner, so per-partition
        merge state never needs coordination.  ``num_cpus=0`` because the
        ingest path only appends table slices (microseconds); the heavy
        flush work runs when the map stage has drained, so the owners use
        the then-idle CPUs.  On a multi-node cluster you would reserve
        owners a real CPU and size the map stage to ``cpus - A``.

        The actors are PERSISTENT across poll cycles: allocator arenas and
        page mappings stay warm, which on this sandbox is worth ~10x on
        the first post-startup cycle (first-touch page-zeroing).
        """

        def __init__(
            self,
            target_root: str,
            compression: str,
            max_rows_per_file: int,
            mode: str = "mor",
            fsync: bool = True,
            bloom_columns: tuple[str, ...] = (),
        ):
            self.target_root = target_root
            self.compression = compression
            self.max_rows_per_file = max_rows_per_file
            self.mode = mode
            self.fsync = fsync
            self.bloom_columns = tuple(bloom_columns)
            self.buf: dict[int, list[pa.Table]] = {}

        def add(self, slices: list[tuple[int, pa.Table]]) -> int:
            for pid, t in slices:
                self.buf.setdefault(pid, []).append(t)
            return sum(t.num_rows for _, t in slices)

        def add_ipc(self, slices: list[tuple[int, bytes]]) -> int:
            """Compressed-exchange variant: slices arrive as Arrow IPC
            buffers (lz4/zstd) — the object store then carries 2-4x
            fewer bytes at a small CPU cost, a good trade on
            bandwidth-bound hosts (BENCH/BASELINE.md)."""
            n = 0
            for pid, buf in slices:
                t = pa.ipc.open_stream(pa.BufferReader(buf)).read_all()
                self.buf.setdefault(pid, []).append(t)
                n += t.num_rows
            return n

        def reset(self) -> None:
            """Drop buffered deltas (start of cycle / after a failed one)."""
            self.buf.clear()

        def flush(
            self,
            cycle_id: str,
            partition_files: dict[int, list[str]],
            schema: pa.Schema,
            sorted_by: tuple[str, ...] = (),
            key_col: str = MERGE_KEY_COL,
            cluster_by: tuple = (),
            cluster_min_rows: int = 0,
        ) -> list[dict]:
            """Merge buffered deltas into owned partitions, copy-on-write."""
            # NOTE: no package imports inside worker-executed code — when the
            # driver ships this class by value (foreign-cwd drivers,
            # __ray_entry__ registers the package with ray.cloudpickle), a
            # runtime import would fail on workers; use the module globals
            # captured at definition time (cast_to_schema is imported at the
            # top of this module).
            out: list[dict] = []
            for pid, tables in sorted(self.buf.items()):
                changes = cast_to_schema(pa.concat_tables(
                    [cast_to_schema(ensure_merge_key_alias(t, key_col), schema)
                     for t in tables]
                ), schema)
                n_changes = changes.num_rows

                if self.mode == "mor":
                    # delta write: never touch base files (see
                    # PartitionMergeFn mor path for the rationale)
                    delta = lww_table(changes)
                    deletes = delta.num_rows - drop_tombstones(delta).num_rows
                    if sorted_by and delta.num_rows:
                        delta = delta.sort_by([(c, "ascending") for c in sorted_by])
                    fb: dict = {}
                    rels, nbytes = write_partition_files(
                        delta, self.target_root, cycle_id, pid,
                        max_rows_per_file=self.max_rows_per_file,
                        compression=self.compression, fsync=self.fsync,
                        prefix="delta", bloom_columns=self.bloom_columns,
                        bounds_cols=tuple(dict.fromkeys(
                            source_columns(cluster_by) + tuple(sorted_by))),
                        bounds_out=fb,
                    )
                    out.append(
                        {
                            PID_COL: pid,
                            "rows": delta.num_rows,
                            "upserts": n_changes - deletes,
                            "deletes": deletes,
                            "changes_in": n_changes,
                            "bytes": nbytes,
                            "files_json": json.dumps(rels),
                            "mode": "mor",
                            "file_stats_json": json.dumps(fb) if fb else "",
                        }
                    )
                    continue

                existing = []
                for entry in partition_files.get(pid, []):
                    existing.append(
                        cast_to_schema(
                            read_entry_table(
                                self.target_root, entry, use_threads=False
                            ),
                            schema,
                        )
                    )
                combined = pa.concat_tables(existing + [changes])
                merged = lww_table(combined)
                alive = drop_tombstones(merged)
                deletes = merged.num_rows - alive.num_rows
                if sorted_by:
                    alive = alive.sort_by([(c, "ascending") for c in sorted_by])
                # fully-deleted partition -> no files; fold_stats then drops
                # it from the manifest (same behavior as the groupby path)
                fb = {}
                rels, nbytes = write_partition_files(
                    alive, self.target_root, cycle_id, pid,
                    max_rows_per_file=self.max_rows_per_file,
                    compression=self.compression, fsync=self.fsync,
                    bloom_columns=self.bloom_columns,
                    cluster_by=cluster_by,
                    cluster_min_rows=cluster_min_rows,
                    bounds_cols=tuple(dict.fromkeys(
                        source_columns(cluster_by) + tuple(sorted_by))),
                    bounds_out=fb,
                )
                out.append(
                    {
                        PID_COL: pid,
                        "rows": alive.num_rows,
                        "upserts": n_changes - deletes,
                        "deletes": deletes,
                        "changes_in": n_changes,
                        "bytes": nbytes,
                        "files_json": json.dumps(rels),
                        "mode": "cow",
                        "file_stats_json": json.dumps(fb) if fb else "",
                    }
                )
            self.buf.clear()
            return out

    return MergeOwnerActor


class ActorMergePool:
    """Persistent pool of partition-owner actors, one per StreamRunner.

    Per cycle:  ``map_batches(push)`` streams the change batches — each
    task LWW-combines its batch, routes rows to pids with the stable
    hash, slices ONCE (single int64 sort + one payload gather) and ships
    each owner its slices; then ``flush`` merges + rewrites the touched
    partitions in parallel across owners.  No all-to-all operator, no
    sort barrier: the exchange is point-to-point object transfers.
    """

    def __init__(
        self,
        target_root: str,
        num_partitions: int,
        num_actors: int = 0,
        compression: str = "zstd",
        max_rows_per_file: int = 1_000_000,
        exchange_compression: str = "",
        mode: str = "mor",
        fsync: bool = True,
        bloom_columns: tuple[str, ...] = (),
        hash_algo: str = "pandas",
    ):
        import ray

        self.hash_algo = hash_algo
        if num_actors <= 0:
            cpus = int(ray.cluster_resources().get("CPU", 8))
            num_actors = max(1, min(num_partitions, cpus))
        cls = _make_owner_actor()
        self.actors = [
            cls.remote(target_root, compression, max_rows_per_file, mode, fsync,
                       tuple(bloom_columns))
            for _ in range(num_actors)
        ]
        self.num_partitions = num_partitions
        if exchange_compression not in ("", "lz4", "zstd"):
            raise ValueError(
                f"unknown exchange_compression: {exchange_compression!r} "
                "(expected '', 'lz4' or 'zstd')"
            )
        self.exchange_compression = exchange_compression

    def apply_change_batch(
        self,
        changes_ds,
        *,
        cycle_id: str,
        partition_files: dict[int, list[str]],
        schema: pa.Schema,
        sorted_by: tuple[str, ...] = (),
        batch_size: int = 131072,
        key_col: str = MERGE_KEY_COL,
        precombine_threshold: float = PRECOMBINE_DUP_THRESHOLD,
        cluster_by: tuple = (),
        cluster_min_rows: int = 0,
    ) -> list[dict]:
        import ray

        actors = self.actors
        A = len(actors)
        P = self.num_partitions
        codec = self.exchange_compression

        ray.get([a.reset.remote() for a in actors])

        hash_algo = self.hash_algo

        def push(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"rows_pushed": [0]})
            # hash once; combine only when the dup rate warrants it (M2)
            batch, h = precombine_and_hash(batch, key_col, hash_algo, precombine_threshold)
            pid = (h % np.uint64(P)).astype(np.int64)
            order = np.argsort(pid, kind="stable")
            b = batch.take(pa.array(order))  # ONE payload gather
            pids = pid[order]
            bounds = np.r_[np.flatnonzero(np.r_[True, pids[1:] != pids[:-1]]), len(pids)]
            per_actor: dict[int, list] = {}
            for s, e in zip(bounds[:-1], bounds[1:]):
                p = int(pids[s])
                sl = b.slice(s, e - s)
                if codec:
                    sink = pa.BufferOutputStream()
                    opts = pa.ipc.IpcWriteOptions(compression=codec)
                    with pa.ipc.new_stream(sink, sl.schema, options=opts) as w:
                        w.write_table(sl)
                    sl = sink.getvalue().to_pybytes()
                per_actor.setdefault(p % A, []).append((p, sl))
            # blocking gets provide backpressure: a task finishes only
            # after its owners ingested the slices
            method = "add_ipc" if codec else "add"
            ray.get([getattr(actors[a], method).remote(sl) for a, sl in per_actor.items()])
            return pa.table({"rows_pushed": [batch.num_rows]})

        import time as _time

        t0 = _time.perf_counter()
        # consume with take_all: the per-task result is ONE tiny row, and
        # a driver-side sum avoids scheduling an AllToAll aggregate op
        # (a fixed ~0.2-0.5s shuffle-barrier tax per cycle)
        pushed = sum(
            r["rows_pushed"]
            for r in changes_ds.map_batches(
                push, batch_format="pyarrow", batch_size=batch_size
            ).take_all()
        )
        _ = pushed
        t1 = _time.perf_counter()
        flush_refs = [
            a.flush.remote(
                cycle_id, partition_files, schema, sorted_by, key_col,
                cluster_by, cluster_min_rows,
            )
            for a in actors
        ]
        out = [s for o in ray.get(flush_refs) for s in o]
        #: per-cycle stage timings, folded into cycle metrics by the runner
        self.last_timings = {
            "push_s": round(t1 - t0, 4),
            "flush_s": round(_time.perf_counter() - t1, 4),
        }
        return out

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []
