"""SQL-construction helpers shared by the DuckDB oracle registry.

Split out of __ray_entry__.py (r3 verdict #5).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from arcane_stream_sqlserver_change_tracking_ray.functions import transforms as T
from arcane_stream_sqlserver_change_tracking_ray.functions.text import (
    BPE_ISH_PATTERN,
    PUNCT_PATTERN,
    STOPWORDS,
    UPPER_PATTERN,
    WORD_PATTERN,
    FingerprintStage,
    LangIdStage,
    QualityScoreStage,
    TfidfTopKStage,
    TokenCountStage,
    _stopword_regex,
    contamination_counts,
    token_count_partials,
    escape_html_text,
    rolling_window_hashes,
)
from arcane_stream_sqlserver_change_tracking_ray.types import (
    MERGE_KEY_COL,
    OP_COL,
    VERSION_COL,
)


def _url_norm_sql(select: str) -> str:
    """Shared oracle CTE for url_normalize / domain_stats: synthesize the
    identical messy url from (source, doc_id, lang), then canonicalize
    with the SAME RE2 patterns the Arrow kernels run (lowercase
    scheme+host, strip www. and the scheme-default port, '/' for the
    empty path, drop tracking params + fragment)."""
    return rf"""
        WITH u AS (
          SELECT doc_id, n_chars,
            'HTTPS://WWW.' || upper(source) || '.Example.COM:443/Cat-' || (doc_id % 7)
              || '/Page_' || doc_id || '.html?utm_source=feed&id=' || doc_id
              || '&ref=' || lang || '#sec' AS url
          FROM documents
        ), q0 AS (
          SELECT doc_id, n_chars, url,
            lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
            regexp_replace(lower(regexp_extract(url,
              '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1)), '^www\.', '') AS host,
            regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]*:([0-9]+)', 1)
              AS port,
            coalesce(nullif(regexp_extract(url,
              '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1), ''), '/') AS path,
            array_to_string(list_filter(
              string_split(coalesce(regexp_extract(url, '\?([^#]*)', 1), ''), '&'),
              p -> NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|ref|fbclid|gclid)=')),
              '&') AS q
          FROM u
        ), p AS (
          SELECT doc_id, n_chars, url, host, path,
            scheme || '://' ||
            (CASE WHEN port <> ''
                   AND port <> (CASE WHEN scheme = 'http' THEN '80' ELSE '443' END)
                  THEN host || ':' || port ELSE host END) ||
            path || (CASE WHEN q <> '' THEN '?' || q ELSE '' END) AS url_norm
          FROM q0
        )
        {select}
    """


def _pii_sql() -> str:
    """Oracle for pii_redact: build the same planted contact block with
    integer || concatenation, then apply the SAME RE2 patterns with
    nested regexp_replace (counts taken on the progressively-redacted
    text, mirroring the stage's sequential attribution)."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import PII_PATTERNS

    (_, em, em_r), (_, ip, ip_r), (_, ph, ph_r) = PII_PATTERNS
    return f"""
        WITH aug AS (
          SELECT doc_id,
                 text || ' contact user' || doc_id || '@example.com or call +1 555 000 '
                      || (doc_id % 10000) || ' from ' || (doc_id % 256) || '.0.0.1' AS t0
          FROM documents
        ), s AS (
          SELECT doc_id, t0,
                 regexp_replace(t0, '{em}', '{em_r}', 'g') AS t1
          FROM aug
        ), s2 AS (
          SELECT *, regexp_replace(t1, '{ip}', '{ip_r}', 'g') AS t2 FROM s
        )
        SELECT doc_id,
               len(regexp_extract_all(t0, '{em}')) AS n_email,
               len(regexp_extract_all(t1, '{ip}')) AS n_ipv4,
               len(regexp_extract_all(t2, '{ph}')) AS n_phone,
               regexp_replace(t2, '{ph}', '{ph_r}', 'g') AS text_redacted
        FROM s2
    """


def _lang_id_sql() -> str:
    langs = list(STOPWORDS.keys())
    count_cols = ",\n    ".join(
        f"len(regexp_extract_all(text, '{_stopword_regex(STOPWORDS[lang])}')) AS c_{lang}"
        for lang in langs
    )
    greatest = "greatest(" + ", ".join(f"c_{lang}" for lang in langs) + ")"
    cases = "\n      ".join(f"WHEN c_{lang} = mx THEN '{lang}'" for lang in langs)
    return f"""
WITH c AS (
  SELECT doc_id,
    {count_cols}
  FROM documents
), m AS (
  SELECT *, {greatest} AS mx FROM c
)
SELECT doc_id,
  CASE WHEN mx = 0 THEN 'und'
      {cases}
  END AS lang_pred
FROM m
"""


_NGRAM_JACCARD_SQL = r"""
            WITH w AS (
              SELECT doc_id, string_split_regex(lower(text), '\s+') AS ws FROM documents
            ), sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(range(1, len(ws) - 1),
                       i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
              FROM w WHERE len(ws) >= 3
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   len(list_intersect(a.s, b.s))::DOUBLE
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.2
"""


def _simhash_sql(max_hamming: int = 3) -> str:
    """All-pairs SimHash oracle, recomputing the ENTIRE signature
    definition of ``shingle_hashes(hash_impl='poly')`` in DuckDB HUGEINT
    arithmetic: per-word byte-polynomial hash (base 1000003 mod 2^64),
    Horner 3-shingle combine, splitmix64 finalizer (the 64x64-bit
    multiply emulated as split 32-bit products), per-bit majority vote,
    then brute-force hamming over every doc pair.  Corpus is ASCII so
    unicode(char) == utf8 byte.  The banding the engine uses is
    pigeonhole-exact at hamming<=3, so identical pair sets certify it."""
    M = "18446744073709551616::HUGEINT"  # 2^64
    pow2 = ", ".join(f"{1 << j}::HUGEINT" for j in range(64))
    return f"""
        WITH w AS (
          SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ws
          FROM documents
        ), wh AS (
          SELECT doc_id, len(ws) AS n,
                 list_transform(ws, w -> CASE WHEN length(w) = 0 THEN 0::HUGEINT
                   ELSE list_reduce(
                          list_transform(range(1, length(w) + 1),
                                         i -> unicode(substr(w, i, 1))::HUGEINT),
                          (a, x) -> (a * 1000003 + x) % {M}) END) AS hs
          FROM w
        ), raw AS (
          SELECT doc_id, list_transform(range(1, n - 1),
                   i -> ((((hs[i] * 1000003 + hs[i+1]) % {M}) * 1000003
                          + hs[i+2]) % {M})) AS sg
          FROM wh WHERE n >= 3
        ), f1 AS (
          SELECT doc_id, list_transform(sg, s -> xor(s, s // 536870912)) AS sg
          FROM raw
        ), f2 AS (
          SELECT doc_id, list_transform(sg, s ->
                   ((s * 484763065)
                    + ((((s % 4294967296) * 3210233709) % 4294967296)
                       * 4294967296)) % {M}) AS sg
          FROM f1
        ), f3 AS (
          SELECT doc_id, list_transform(sg, s -> xor(s, s // 4294967296)) AS sg
          FROM f2
        ), u AS (
          SELECT doc_id, unnest(sg) AS h FROM f3
        ), p AS (
          SELECT unnest([{pow2}]) AS pw
        ), bits AS (
          SELECT doc_id, pw,
                 CASE WHEN 2 * sum((h // pw) % 2) > count(*)
                      THEN pw ELSE 0::HUGEINT END AS wbit
          FROM u CROSS JOIN p GROUP BY doc_id, pw
        ), sig AS (
          SELECT doc_id, sum(wbit)::HUGEINT AS s FROM bits GROUP BY doc_id
          UNION ALL
          SELECT doc_id, 0::HUGEINT FROM wh WHERE n < 3
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.s, b.s))::BIGINT AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.s, b.s)) <= {max_hamming}
    """


def _rademacher_values_sql(d: int, planes: int, seed: int = 42) -> str:
    """The ±1 plane matrix as an SQL VALUES list — the LSH oracle shares
    the plane CONSTANTS (like thresholds/query ids) but recomputes
    quantization, bucket bits, probing and ranking independently."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.similarity import (
        rademacher_planes,
    )

    pl = rademacher_planes(d, planes, seed)
    return ",".join(
        f"({i + 1},{p},{int(pl[i, p])})" for i in range(d) for p in range(planes)
    )


def _lsh_bucket_cte(d: int, planes: int) -> str:
    """Shared oracle CTEs: fixed-point quantization (floor(x*1e4+0.5),
    every step correctly-rounded IEEE so numpy and DuckDB agree), exact
    integer dot signs per ±1 plane, bucket = sum(bit << p)."""
    return f"""
            pl(i, p, s) AS (VALUES {{values}}),
            qd AS (
              SELECT vec_id, g.i AS i,
                     CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 10000 + 0.5)
                          AS BIGINT) AS qv
              FROM embeddings, generate_series(1, {d}) g(i)
            ),
            bits AS (
              SELECT qd.vec_id, pl.p,
                     CASE WHEN sum(qd.qv * pl.s) > 0 THEN 1 ELSE 0 END AS bit
              FROM qd JOIN pl ON pl.i = qd.i GROUP BY qd.vec_id, pl.p
            ),
            bkt AS (
              SELECT vec_id, CAST(sum(bit * (1::BIGINT << p)) AS BIGINT) AS bucket
              FROM bits GROUP BY vec_id
            )"""


def _ingest_dedup_sql(n_cycles: int = 6) -> str:
    """Full DuckDB recompute of ``cdc_ingest_dedup``: both detector
    chains in HUGEINT arithmetic against strictly-earlier cycles.

    Shares only the seeded perm CONSTANTS with the engine (split into
    32-bit halves so every multiply stays inside HUGEINT — the same
    split-product trick as the simhash finalizer); the whole-text poly
    hash, the shingle chain (word hash, Horner 3-combine, splitmix
    finalizer) and the min-perm band combine are recomputed
    independently.  cycle = 1-based segment rank by row_number over
    doc_id order, chunk = ceil(n / n_cycles) — exactly
    ``_write_events_segments``'s cuts."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.ingest_dedup import (
        N_BANDS,
        ROWS_PER_BAND,
        perm_constants,
    )

    a, b = perm_constants()
    M = "18446744073709551616::HUGEINT"
    perm_vals = ",".join(
        f"({i},{int(a[i]) & 0xFFFFFFFF},{int(a[i]) >> 32},{int(b[i])})"
        for i in range(N_BANDS * ROWS_PER_BAND)
    )
    return f"""
        WITH base AS (
          SELECT doc_id, text, row_number() OVER (ORDER BY doc_id) AS rn,
                 count(*) OVER () AS n
          FROM documents
        ), p AS (
          SELECT max((n + {n_cycles} - 1) // {n_cycles}) AS chunk FROM base
        ), cyc AS (
          SELECT doc_id, text, ((rn - 1) // p.chunk) + 1 AS cycle
          FROM base, p
        ), th AS (
          SELECT doc_id, cycle,
                 CASE WHEN length(text) = 0 THEN 0::HUGEINT
                      ELSE list_reduce(
                             list_transform(range(1, length(text) + 1),
                               i -> unicode(substr(text, i, 1))::HUGEINT),
                             (a, x) -> (a * 1000003 + x) % {M}) END AS hv
          FROM cyc
        ), exact AS (
          SELECT doc_id, cycle,
                 min(cycle) OVER (PARTITION BY hv) < cycle AS exact_dup
          FROM th
        ), w AS (
          SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ws FROM cyc
        ), wh AS (
          SELECT doc_id, len(ws) AS n,
                 list_transform(ws, w -> CASE WHEN length(w) = 0 THEN 0::HUGEINT
                   ELSE list_reduce(
                          list_transform(range(1, length(w) + 1),
                                         i -> unicode(substr(w, i, 1))::HUGEINT),
                          (a, x) -> (a * 1000003 + x) % {M}) END) AS hs
          FROM w
        ), raw AS (
          SELECT doc_id, list_transform(range(1, n - 1),
                   i -> ((((hs[i] * 1000003 + hs[i+1]) % {M}) * 1000003
                          + hs[i+2]) % {M})) AS sg
          FROM wh WHERE n >= 3
        ), f1 AS (
          SELECT doc_id, list_transform(sg, s -> xor(s, s // 536870912)) AS sg
          FROM raw
        ), f2 AS (
          SELECT doc_id, list_transform(sg, s ->
                   ((s * 484763065)
                    + ((((s % 4294967296) * 3210233709) % 4294967296)
                       * 4294967296)) % {M}) AS sg
          FROM f1
        ), f3 AS (
          SELECT doc_id, list_transform(sg, s -> xor(s, s // 4294967296)) AS sg
          FROM f2
        ), sh AS (
          SELECT doc_id, unnest(sg) AS s FROM f3
        ), perm(i, alo, ahi, pb) AS (VALUES {perm_vals}),
        mins AS (
          SELECT doc_id, i,
                 min((s * alo
                      + (((s % 4294967296) * ahi) % 4294967296) * 4294967296
                      + pb) % {M}) AS m
          FROM sh CROSS JOIN perm GROUP BY doc_id, i
        ), bands AS (
          SELECT doc_id, i // {ROWS_PER_BAND} AS band,
                 (list_reduce(list(m ORDER BY i),
                              (acc, x) -> (acc * 1000003 + x) % {M})
                  + i // {ROWS_PER_BAND}) % {M} AS bkey
          FROM mins GROUP BY doc_id, i // {ROWS_PER_BAND}
        ), bmin AS (
          SELECT bkey, min(cycle) AS c0
          FROM bands JOIN cyc USING (doc_id) GROUP BY bkey
        ), near AS (
          SELECT b.doc_id, bool_or(bmin.c0 < c.cycle) AS near_candidate
          FROM bands b JOIN cyc c USING (doc_id)
               JOIN bmin USING (bkey)
          GROUP BY b.doc_id
        )
        SELECT e.doc_id, e.cycle, e.exact_dup,
               coalesce(n.near_candidate, false) AS near_candidate
        FROM exact e LEFT JOIN near n USING (doc_id)
        ORDER BY e.doc_id
    """
