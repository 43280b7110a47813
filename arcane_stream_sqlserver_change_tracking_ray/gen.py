"""Deterministic synthetic base-table + change-log generator.

Produces the engine's test/bench corpus per FIXTURES.md F1/F2: a
Common-Crawl-style page table ``(url, warc_ts, html, text, lang)`` and a
change-event feed ``(sys_change_version, sys_change_operation, payload)``
— the synthetic analog of SQL Server's ``CHANGETABLE(CHANGES ...)``
joined to the base table (reference ``Common.scala:110-119``;
``integration-tests.sql``).

Determinism contract (the per-row invariant in BASELINE.json
``input_hint``): every payload value is a pure function of
``(key_id, version)`` — **no wall clock, no process-dependent hashing**
— so ``text`` is byte-identical per ``(url, version)`` across runs,
machines and parallelism levels.

Op pattern: per key the k-th event (0-based occurrence) is
``I`` if k % 7 == 0, ``D`` if k % 7 == 6, else ``U`` — i.e. every key is
inserted first, updated, occasionally deleted, and re-inserted after a
delete.  Occurrence math is vectorized; key popularity is
Zipf-shaped (``key = floor(n_keys * u**zipf_a)``) so a few keys/domains
are hot, exercising skew handling.

Layout: ``<ctlog_dir>/v{lo:012d}-{hi:012d}.parquet`` — version-range
partitioned segments the ``ChangeFeedTailer`` polls incrementally
(FIXTURES.md F2).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from arcane_stream_sqlserver_change_tracking_ray.types import OP_COL, VERSION_COL

# deterministic little vocabulary for text payloads
_VOCAB_SRC = (
    "stream change track merge key version table scan row batch lake parquet "
    "arrow shard data page crawl web text html lang index hash salt actor "
    "partition commit watermark manifest cycle upsert delete insert update "
    "schema evolve column widen null order sort group filter select cast "
    "token count quality score shingle minhash simhash cosine vector nearest "
    "bucket band jaccard window poll interval jitter fetch chunk stage sweep "
    "compact expire orphan analyze optimize retention threshold backfill"
)
VOCAB = np.array(_VOCAB_SRC.split(), dtype=object)
LANGS = np.array(["en", "de", "fr", "es", "da", "it", "pt", "nl"], dtype=object)

_A = np.uint64(1315423911)
_B = np.uint64(2654435761)
_C = np.uint64(97)

BASE_TS_US = np.int64(1_700_000_000_000_000)  # fixed epoch base, microseconds


@dataclass(frozen=True)
class CtLogSpec:
    n_keys: int = 1_000
    n_events: int = 10_000
    seed: int = 42
    zipf_a: float = 2.0  # >1 skews popularity toward low key ids
    n_domains: int = 50
    filler_words: int = 16
    events_per_file: int = 100_000
    #: parquet row-group size — keep small enough that readers can split a
    #: segment into multiple blocks (read parallelism at high CPU counts)
    row_group_size: int = 50_000
    #: schema evolution (FIXTURES.md F3 #3/#4): events with version >= add_column_at
    #: carry an extra payload column `title`; events with version >= drop_column_at
    #: no longer carry it (the target must retain it, additive-only).
    add_column_at: int | None = None
    drop_column_at: int | None = None
    #: repeated additive drift (E1 storm coverage): every ``drift_every``
    #: versions a NEW string column ``extra{k:02d}`` (k = 1, 2, ...)
    #: appears on all subsequent events — N cycles of drift means N
    #: distinct additive schema migrations interacting with CAS commits
    #: and the startup sweep (reference SchemaMigrationTests.scala adds
    #: one column once; this generalizes it to a migration-per-cycle).
    drift_every: int | None = None


# --------------------------------------------------------------------------
# planning (cheap, driver-side): key id + op code per event
# --------------------------------------------------------------------------
def plan_events(spec: CtLogSpec) -> tuple[np.ndarray, np.ndarray]:
    """Return ``(key_ids int64[n], op_codes uint8[n])`` for versions 1..n.

    op codes: 0=I, 1=U, 2=D.  Vectorized occurrence counting via a
    stable argsort (no Python loop over events).
    """
    rng = np.random.default_rng(spec.seed)
    u = rng.random(spec.n_events)
    key_ids = np.minimum(
        (spec.n_keys * np.power(u, spec.zipf_a)).astype(np.int64),
        spec.n_keys - 1,
    )
    # occurrence index of each event within its key's event sequence
    order = np.argsort(key_ids, kind="stable")
    sk = key_ids[order]
    n = spec.n_events
    run_start = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
    run_len = np.diff(np.r_[run_start, n])
    occ_sorted = np.arange(n, dtype=np.int64) - np.repeat(run_start, run_len)
    occ = np.empty(n, dtype=np.int64)
    occ[order] = occ_sorted
    m = occ % 7
    ops = np.full(n, 1, dtype=np.uint8)  # U
    ops[m == 0] = 0  # I
    ops[m == 6] = 2  # D
    return key_ids, ops


# --------------------------------------------------------------------------
# rendering (heavy, distributable): payload for a version range
# --------------------------------------------------------------------------
def _mix(key: np.ndarray, version: np.ndarray, j: int) -> np.ndarray:
    """Deterministic uint64 mix of (key, version, j)."""
    with np.errstate(over="ignore"):
        h = key.astype(np.uint64) * _A + version.astype(np.uint64) * _B + np.uint64(j) * _C
        h ^= h >> np.uint64(13)
        h = h * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(31)
    return h


def urls_for_keys(key_ids: np.ndarray, spec: CtLogSpec) -> np.ndarray:
    """Deterministic url per key; hot (low) keys share few domains so url
    prefixes are skewed (FIXTURES.md F1)."""
    dom = (spec.n_domains * np.power(key_ids / max(spec.n_keys, 1), 2.0)).astype(np.int64)
    dom_s = np.char.mod("site%04d.example.com", dom)
    key_s = np.char.mod("/page/%09d", key_ids)
    return np.char.add(np.char.add("https://", dom_s), key_s).astype(object)


def render_events(
    versions: np.ndarray, key_ids: np.ndarray, op_codes: np.ndarray, spec: CtLogSpec
) -> pa.Table:
    """Materialize payload columns for the given events (vectorized)."""
    n = len(versions)
    url = urls_for_keys(key_ids, spec)

    # text: "page <key> v<version> w0 w1 ... wk" — byte-identical per (url, version)
    head = np.char.add(
        np.char.mod("page %d", key_ids), np.char.mod(" v%d", versions)
    ).astype(object)
    parts = [head]
    V = len(VOCAB)
    for j in range(spec.filler_words):
        idx = (_mix(key_ids, versions, j) % np.uint64(V)).astype(np.int64)
        parts.append(VOCAB[idx])
    # single join pass via arrow (fast, avoids np.char quadratic adds)
    text_arr = pc.binary_join_element_wise(
        *[pa.array(p, type=pa.string()) for p in parts], " "
    )

    pad_len = (_mix(key_ids, versions, 9999) % np.uint64(64)).astype(np.int64)
    pad = pc.binary_repeat(pa.array(["x"] * n, type=pa.string()), pa.array(pad_len))
    html_arr = pc.binary_join_element_wise(
        pa.array(["<html><body>"] * n, type=pa.string()),
        text_arr,
        pad,
        pa.array(["</body></html>"] * n, type=pa.string()),
        "",
    ).cast(pa.binary())

    ts = pa.array(BASE_TS_US + versions.astype(np.int64) * 1_000_000).cast(
        pa.timestamp("us")
    )
    lang = pa.array(LANGS[key_ids % len(LANGS)], type=pa.string())
    op = pa.array(np.array(["I", "U", "D"], dtype=object)[op_codes], type=pa.string())

    cols = {
        VERSION_COL: pa.array(versions, type=pa.int64()),
        OP_COL: op,
        "url": pa.array(url, type=pa.string()),
        "warc_ts": ts,
        "html": html_arr,
        "text": text_arr,
        "lang": lang,
    }

    # schema evolution window for the optional `title` column
    lo_v = int(versions[0]) if n else 0
    hi_v = int(versions[-1]) if n else 0
    if spec.add_column_at is not None and hi_v >= spec.add_column_at and (
        spec.drop_column_at is None or lo_v < spec.drop_column_at
    ):
        title = pc.binary_join_element_wise(
            pa.array(["Title"] * n, type=pa.string()),
            pa.array(np.char.mod("%d", key_ids).astype(object), type=pa.string()),
            pa.array(np.char.mod("v%d", versions).astype(object), type=pa.string()),
            " ",
        )
        mask = versions >= spec.add_column_at
        if spec.drop_column_at is not None:
            mask &= versions < spec.drop_column_at
        cols["title"] = pc.if_else(pa.array(mask), title, pa.scalar(None, pa.string()))

    if spec.drift_every is not None and n:
        key_str = pa.array(np.char.mod("%d", key_ids).astype(object), type=pa.string())
        ver_str = pa.array(np.char.mod("v%d", versions).astype(object), type=pa.string())
        for k in range(1, spec.n_events // spec.drift_every + 1):
            at = k * spec.drift_every
            if hi_v < at:
                break  # ascending thresholds: later columns absent too
            val = pc.binary_join_element_wise(
                pa.array([f"e{k}"] * n, type=pa.string()), key_str, ver_str, "-"
            )
            mask = versions >= at
            cols[f"extra{k:02d}"] = pc.if_else(
                pa.array(mask), val, pa.scalar(None, pa.string())
            )

    tbl = pa.table(cols)
    # delete events carry only the key + metadata (CT net-change semantics):
    # null out payload columns on 'D'
    is_del = pc.equal(tbl[OP_COL], "D")
    for name in tbl.column_names:
        if name in (VERSION_COL, OP_COL, "url"):
            continue
        col = tbl[name]
        tbl = tbl.set_column(
            tbl.schema.get_field_index(name),
            name,
            pc.if_else(is_del, pa.scalar(None, col.type), col),
        )
    return tbl


def _segments(spec: CtLogSpec) -> list[tuple[int, int]]:
    """(lo, hi] version ranges, respecting schema-evolution breakpoints so a
    single file never mixes schemas."""
    breaks = {0, spec.n_events}
    drift_breaks = (
        [k * spec.drift_every for k in range(1, spec.n_events // spec.drift_every + 1)]
        if spec.drift_every is not None
        else []
    )
    for b in (spec.add_column_at, spec.drop_column_at, *drift_breaks):
        if b is not None and 0 < b - 1 < spec.n_events:
            breaks.add(b - 1)
    bounds = sorted(breaks)
    out: list[tuple[int, int]] = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        v = lo
        while v < hi:
            nxt = min(v + spec.events_per_file, hi)
            out.append((v, nxt))
            v = nxt
    return out


def segment_path(ctlog_dir: str, lo: int, hi: int) -> str:
    import os

    return os.path.join(ctlog_dir, f"v{lo + 1:012d}-{hi:012d}.parquet")


def write_ctlog(ctlog_dir: str, spec: CtLogSpec, use_ray: bool = False) -> list[str]:
    """Write the change log as version-range parquet segments.

    ``use_ray=True`` renders segments in parallel with Ray tasks — the
    plan arrays ship to the object store ONCE via ``ray.put`` (broadcast,
    not re-shipped per segment)."""
    import os

    os.makedirs(ctlog_dir, exist_ok=True)
    key_ids, op_codes = plan_events(spec)
    segs = _segments(spec)
    paths = [segment_path(ctlog_dir, lo, hi) for lo, hi in segs]

    if not use_ray:
        for (lo, hi), path in zip(segs, paths):
            versions = np.arange(lo + 1, hi + 1, dtype=np.int64)
            tbl = render_events(versions, key_ids[lo:hi], op_codes[lo:hi], spec)
            pq.write_table(tbl, path, compression="zstd", row_group_size=spec.row_group_size)
        return paths

    import ray

    keys_ref = ray.put(key_ids)
    ops_ref = ray.put(op_codes)

    @ray.remote(num_cpus=1)
    def _render(lo: int, hi: int, path: str, keys, ops) -> str:
        versions = np.arange(lo + 1, hi + 1, dtype=np.int64)
        tbl = render_events(versions, keys[lo:hi], ops[lo:hi], spec)
        pq.write_table(tbl, path, compression="zstd", row_group_size=spec.row_group_size)
        return path

    futs = [_render.remote(lo, hi, p, keys_ref, ops_ref) for (lo, hi), p in zip(segs, paths)]
    return ray.get(futs)


# --------------------------------------------------------------------------
# oracles / snapshots (test utilities; DuckDB-based like the driver)
# --------------------------------------------------------------------------
LWW_ORACLE_SQL = """
SELECT * EXCLUDE (rn, {op})
FROM (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY {ver} DESC) AS rn
  FROM {src}
  {where}
)
WHERE rn = 1 AND {op} <> 'D'
"""


def expected_final_state(ctlog_dir: str, upto_version: int | None = None) -> pa.Table:
    """DuckDB LWW oracle over the generated log (FIXTURES.md F3)."""
    import duckdb

    where = f"WHERE {VERSION_COL} <= {upto_version}" if upto_version is not None else ""
    sql = LWW_ORACLE_SQL.format(
        op=OP_COL, ver=VERSION_COL, src=f"read_parquet('{ctlog_dir}/*.parquet', union_by_name=true)",
        where=where,
    )
    con = duckdb.connect()
    try:
        return con.sql(sql).arrow()
    finally:
        con.close()


def write_snapshot(
    ctlog_dir: str, out_dir: str, at_version: int, num_files: int = 1
) -> list[str]:
    """Materialize the base-table state at *at_version* as a parquet
    snapshot dir — the backfill source (reference S2 re-reads the whole
    source table; ours re-reads this snapshot).  *num_files* > 1 splits
    it into several files = several restartable backfill shards (the
    analog of the reference's shard tables under
    ``backfillShardSchemaName``)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    tbl = expected_final_state(ctlog_dir, upto_version=at_version)
    tbl = tbl.drop_columns([VERSION_COL]) if VERSION_COL in tbl.column_names else tbl
    paths = []
    step = -(-tbl.num_rows // max(num_files, 1)) or 1
    for i in range(num_files):
        chunk = tbl.slice(i * step, step)
        path = os.path.join(out_dir, f"shard{i:04d}-snapshot-v{at_version:012d}.parquet")
        pq.write_table(chunk, path, compression="zstd")
        paths.append(path)
    return paths


def small_spec(**overrides) -> CtLogSpec:
    """Unit-tier spec (FIXTURES.md F5)."""
    return replace(CtLogSpec(n_keys=100, n_events=1000, events_per_file=200), **overrides)
