"""Web/URL operators for Common-Crawl-style corpora.

URL canonicalization is the first transform of any webtext CDC pipeline:
the url is the merge key (reference: the CT feed keys rows by primary
key; in the web analog that key is the canonical url), so two crawls of
``HTTPS://WWW.Example.COM:443/a?utm_source=x`` and
``https://example.com/a`` must collapse to one key before the LWW merge.

All kernels run inside Arrow's vectorized re2 engine (`extract_regex`,
`replace_substring_regex`) — no Python loop touches a row, and the same
pattern strings run under DuckDB's RE2 so a SQL oracle reproduces every
byte.  The synthetic-url builder exists because the test corpus has no
url column; at production scale the input table carries a real ``url``
(see BASELINE.json input_hint) and ``normalize_urls`` applies unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: query params dropped during canonicalization (tracking params — the
#: standard CCNet/crawler blocklist subset expressible as one regex)
TRACKING_PARAM_PATTERN = r"^(utm_[A-Za-z0-9_]*|ref|fbclid|gclid)="

#: one pass over the url: scheme://host[:port][path][?query][#fragment]
URL_PATTERN = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
    r"(?P<host>[^/:?#]*)(?::(?P<port>[0-9]+))?"
    r"(?P<path>/[^?#]*)?(?:\?(?P<query>[^#]*))?"
)

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _combine(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def synth_urls(batch: pa.Table) -> pa.Array:
    """Deterministic messy URL per document (mixed case, www, default
    port, tracking params, fragment) built from (source, doc_id, lang) —
    the test corpus has no url column, so both the engine and the SQL
    oracle synthesize the identical string and then normalize it."""
    ids = _combine(batch["doc_id"])
    ids_s = pc.cast(ids, pa.string())
    cat = pc.cast(pa.array(ids.to_numpy(zero_copy_only=False) % 7, pa.int64()), pa.string())
    return pc.binary_join_element_wise(
        pa.scalar("HTTPS://WWW."),
        pc.utf8_upper(_combine(batch["source"])),
        pa.scalar(".Example.COM:443/Cat-"),
        cat,
        pa.scalar("/Page_"),
        ids_s,
        pa.scalar(".html?utm_source=feed&id="),
        ids_s,
        pa.scalar("&ref="),
        _combine(batch["lang"]),
        pa.scalar("#sec"),
        "",
    )


def _filter_params(qs: pa.Array, drop_pattern: str = TRACKING_PARAM_PATTERN) -> pa.Array:
    """Drop tracking params from '&'-joined query strings, preserving
    the order of the survivors.  Vectorized list rebuild: split, regex
    mask on the flat params, bincount the kept counts, re-join."""
    lists = pc.split_pattern(qs, "&")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    cnt = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = pc.invert(pc.match_substring_regex(flat, drop_pattern))
    keep_np = keep.to_numpy(zero_copy_only=False)
    row = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
    kept_flat = flat.filter(keep)
    new_cnt = np.bincount(row[keep_np], minlength=len(cnt)).astype(np.int64)
    offs = pa.array(np.r_[0, np.cumsum(new_cnt)], pa.int32())
    rebuilt = pa.ListArray.from_arrays(offs, kept_flat)
    return pc.binary_join(rebuilt, "&")


def normalize_urls(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Canonicalize a url column: lowercase scheme+host, strip a leading
    ``www.``, drop the scheme's default port (keep a non-default one),
    default the empty path to ``/``, drop tracking query params and the
    fragment.  Appends ``url_norm``, ``host``, ``path``."""
    urls = _combine(batch[url_col])
    parts = pc.extract_regex(urls, URL_PATTERN)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    host = pc.replace_substring_regex(
        pc.utf8_lower(pc.struct_field(parts, "host")), r"^www\.", ""
    )
    port = pc.fill_null(pc.struct_field(parts, "port"), "")
    path = pc.fill_null(pc.struct_field(parts, "path"), "")
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)
    query = _filter_params(pc.fill_null(pc.struct_field(parts, "query"), ""))
    # keep :port only when it differs from the scheme default
    is_http = pc.equal(scheme, "http")
    default_port = pc.if_else(is_http, pa.scalar("80"), pa.scalar("443"))
    keep_port = pc.and_(pc.not_equal(port, ""), pc.not_equal(port, default_port))
    hostport = pc.if_else(
        keep_port, pc.binary_join_element_wise(host, port, ":"), host
    )
    has_q = pc.not_equal(query, "")
    tail = pc.if_else(
        has_q, pc.binary_join_element_wise(path, query, "?"), path
    )
    url_norm = pc.binary_join_element_wise(scheme, "://", hostport, tail, "")
    batch = batch.append_column("url_norm", url_norm)
    batch = batch.append_column("host", host)
    return batch.append_column("path", path)
