"""The DuckDB oracle registry: one ANSI-SQL twin per SQL-expressible
query (column names match the Ray side exactly — the driver
hash-compares values after sorting columns by name).

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

from .oracle_helpers import (  # noqa: F401
    _NGRAM_JACCARD_SQL,
    _ingest_dedup_sql,
    _lang_id_sql,
    _lsh_bucket_cte,
    _pii_sql,
    _rademacher_values_sql,
    _simhash_sql,
    _url_norm_sql,
)
from .queries_cdc import _LOOKUP_KEYS  # noqa: F401



def oracle_sql() -> dict[str, str]:
    stop_en = _stopword_regex(STOPWORDS["en"])
    lsh_cte = _lsh_bucket_cte(64, 8).format(values=_rademacher_values_sql(64, 8))
    nd_cte = _lsh_bucket_cte(64, 4).format(values=_rademacher_values_sql(64, 4))
    return {
        "cdc_lww_upsert": """
            SELECT user_id, event_id AS sys_change_version, ts, event_type, value, props
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
                  FROM events)
            WHERE rn = 1 AND event_type <> 'error'
        """,
        # post-OPTIMIZE file-skipping read: same LWW winners, value-filtered
        "cdc_pruned_read": """
            SELECT user_id, event_id AS sys_change_version, ts, event_type, value, props
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
                  FROM events)
            WHERE rn = 1 AND event_type <> 'error' AND value >= 100.0
        """,
        # partition_by=day(ts) write-time clustering + pruned day read
        "cdc_time_partition": """
            SELECT user_id, event_id AS sys_change_version, ts, event_type, value, props
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
                  FROM events)
            WHERE rn = 1 AND event_type <> 'error'
              AND ts < TIMESTAMP '2024-01-30 00:00:00'
        """,
        # post-LWW filtered read over pending MoR deltas
        "cdc_filtered_read": """
            SELECT user_id, event_id AS sys_change_version, ts, event_type, value, props
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
                  FROM events)
            WHERE rn = 1 AND event_type = 'click' AND value >= 10.0
        """,
        # rollback + idempotent re-drain must land EXACTLY on plain LWW
        "cdc_rollback": """
            SELECT user_id, event_id AS sys_change_version, ts, event_type, value, props
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
                  FROM events)
            WHERE rn = 1 AND event_type <> 'error'
        """,
        "cdc_lww_rank1": """
            SELECT user_id, event_id AS sys_change_version, event_type, value
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
                  FROM events)
            WHERE rn = 1
        """,
        # composite merge key: LWW per (user_id, event_type); the
        # all-'error' composite keys are pure-delete and vanish
        "cdc_composite_key": """
            SELECT user_id, event_id AS sys_change_version, ts, event_type, value
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                               ORDER BY event_id DESC) rn
                  FROM events)
            WHERE rn = 1 AND event_type <> 'error'
        """,
        # OPTIMIZE fold + snapshot expiry must not change the visible
        # state: same LWW oracle as the plain replay
        "cdc_maintenance_fold": """
            SELECT user_id, event_id AS sys_change_version, ts, event_type, value, props
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
                  FROM events)
            WHERE rn = 1 AND event_type <> 'error'
        """,
        # order independence: the shuffled-segment replay converges to
        # the identical LWW state (version decides, never arrival order)
        "cdc_unordered_feed": """
            SELECT user_id, event_id AS sys_change_version, ts, event_type, value, props
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
                  FROM events)
            WHERE rn = 1 AND event_type <> 'error'
        """,
        # per-cycle engine telemetry vs deterministic segment cuts
        # (single-segment cycles; pre-combine disabled so raw counters
        # are exact).  Segment layout covers ALL rows, but version 0
        # equals the bootstrap watermark, so by the strictly-greater
        # tailer contract (CHANGETABLE(…, @since) semantics) event 0 is
        # never polled and cycle 1's counters exclude it.
        "cdc_cycle_metrics": """
            WITH o AS (
              SELECT *, row_number() OVER (ORDER BY event_id) AS rn,
                     count(*) OVER () AS n
              FROM events
            )
            SELECT ((rn - 1) // ((n + 7) // 8) + 1)::BIGINT AS cycle,
                   max(event_id)::BIGINT AS watermark,
                   count(*) FILTER (WHERE event_id > 0)::BIGINT AS changes_in,
                   sum(CASE WHEN event_type <> 'error' AND event_id > 0
                            THEN 1 ELSE 0 END)::BIGINT AS upserts,
                   sum(CASE WHEN event_type = 'error' AND event_id > 0
                            THEN 1 ELSE 0 END)::BIGINT AS deletes
            FROM o GROUP BY 1
        """,
        # the partition-pruned + bloom point-lookup read path: plain LWW
        # restricted to the fixed key set (deleted/absent keys -> no row)
        "cdc_point_lookup": f"""
            SELECT user_id, event_id AS sys_change_version, ts, event_type,
                   value, props
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                               ORDER BY event_id DESC) rn
                  FROM events)
            WHERE rn = 1 AND event_type <> 'error'
              AND user_id IN ({", ".join(str(k) for k in _LOOKUP_KEYS)})
        """,
        # CHANGETABLE(CHANGES …, @since) net-op semantics with
        # since = max(event_id)//2: I/U/D per key, created-then-deleted
        # keys net out, delete rows carry keys only (NULL payload)
        "cdc_net_changes": """
            WITH s AS (SELECT max(event_id) // 2 AS v FROM events),
            e AS (SELECT user_id, event_id AS version, ts, event_type, value,
                         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
                  FROM events),
            base AS (SELECT user_id, arg_max(op, version) AS bop
                     FROM e, s WHERE version <= s.v GROUP BY user_id),
            post AS (SELECT user_id, max(version) AS sys_change_version,
                            arg_max(op, version) AS lop,
                            arg_max(ts, version) AS ts,
                            arg_max(event_type, version) AS event_type,
                            arg_max(value, version) AS value
                     FROM e, s WHERE version > s.v GROUP BY user_id)
            SELECT p.user_id,
                   CASE WHEN coalesce(b.bop, 'D') <> 'D'
                        THEN CASE WHEN p.lop = 'D' THEN 'D' ELSE 'U' END
                        ELSE 'I' END AS sys_change_operation,
                   p.sys_change_version,
                   CASE WHEN p.lop = 'D' THEN NULL ELSE p.ts END AS ts,
                   CASE WHEN p.lop = 'D' THEN NULL ELSE p.event_type END AS event_type,
                   CASE WHEN p.lop = 'D' THEN NULL ELSE p.value END AS value
            FROM post p LEFT JOIN base b USING (user_id)
            WHERE coalesce(b.bop, 'D') <> 'D' OR p.lop <> 'D'
        """,
        # type-2 history: non-delete events open [version, next_version);
        # the newest non-delete interval per key is current
        "scd2_history": """
            WITH e AS (SELECT user_id, event_id AS version, event_type, value,
                              CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
                       FROM events),
            w AS (SELECT *, lead(version) OVER (PARTITION BY user_id
                                                ORDER BY version) AS valid_to
                  FROM e)
            SELECT user_id, version AS valid_from, valid_to, event_type, value,
                   CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT)
                       AS is_current
            FROM w WHERE op <> 'D'
        """,
        "funnel_users": """
            SELECT user_id, first_view, last_purchase FROM (
              SELECT user_id,
                     min(ts) FILTER (WHERE event_type = 'view') AS first_view,
                     max(ts) FILTER (WHERE event_type = 'purchase') AS last_purchase
              FROM events GROUP BY user_id)
            WHERE first_view IS NOT NULL AND last_purchase IS NOT NULL
              AND first_view < last_purchase
        """,
        # Q5-lite: integer 1e-4-dollar revenue units so float summation
        # order cannot perturb the hash
        "revenue_by_nation": """
            SELECT n_name,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
                       AS revenue_u
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "per_domain_topk": """
            SELECT source, doc_id, n_chars FROM (
              SELECT source, doc_id, n_chars,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY n_chars DESC, doc_id) AS rn
              FROM documents) WHERE rn <= 3
        """,
        # the FULL engine (tailer -> transforms -> direct MoR merge ->
        # manifest commits -> merge-on-read read) replaying the events
        # table as its change feed must converge to plain LWW SQL
        "cdc_engine_events_replay": """
            SELECT user_id, event_id AS sys_change_version, ts, event_type, value, props
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
                  FROM events)
            WHERE rn = 1 AND event_type <> 'error'
        """,
        # HLL registers replayed exactly: bucket = h % 1024, rank = 1 +
        # trailing zeros of h // 1024 (min set bit via exact power(2, j))
        # same shingle CTE as the Jaccard oracle; containment ratio
        "containment_join": r"""
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
                     / least(len(a.s), len(b.s)) AS containment
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / least(len(a.s), len(b.s)) >= 0.6
        """,
        # the KMV min-set replayed exactly: the HLL hash+finalize chain,
        # then the 256 smallest distinct hashes in unsigned order
        "kmv_distinct": r"""
            WITH d AS (
              SELECT DISTINCT CAST(user_id AS VARCHAR) AS s FROM events
            ), hashed AS (
              SELECT list_reduce(list_transform(range(1, length(s) + 1),
                  i -> unicode(substr(s, i, 1))::HUGEINT),
                (a, x) -> (a * 1000003 + x)
                          % 18446744073709551616::HUGEINT) AS h
              FROM d
            ), f1 AS (SELECT xor(h, h // 536870912) AS h FROM hashed
            ), f2 AS (
              SELECT ((h * 484763065)
                      + ((((h % 4294967296) * 3210233709) % 4294967296)
                         * 4294967296)) % 18446744073709551616::HUGEINT AS h
              FROM f1
            ), f3 AS (SELECT xor(h, h // 4294967296) AS h FROM f2
            ), u AS (SELECT DISTINCT h FROM f3)
            -- ORDER BY u.h (the HUGEINT), NOT the bare name: a bare h in
            -- the outer ORDER BY binds to the VARCHAR output alias and
            -- LIMIT would take the LEXICOGRAPHICALLY smallest strings —
            -- wrong whenever more than k distinct hashes exist (caught
            -- by the sf0.1 pre-flight; invisible at sf<=0.01 where the
            -- LIMIT never binds)
            SELECT (row_number() OVER (ORDER BY u.h) - 1)::BIGINT AS rank,
                   CAST(u.h AS VARCHAR) AS h
            FROM u ORDER BY u.h LIMIT 256
        """,
        "semi_join_buyers": """
            SELECT c_custkey, c_name, c_acctbal FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "anti_join_customers": """
            SELECT c_custkey, c_name, c_acctbal FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_totalprice >= 300000.0)
        """,
        # identical blocking (last whitespace token) + DuckDB's own
        # levenshtein certify the vectorized Wagner–Fischer DP
        "fuzzy_join_parts": r"""
            WITH d AS (
              SELECT DISTINCT p_name,
                     regexp_extract(p_name, '(\S+)$', 1) AS blk
              FROM part
            )
            SELECT a.p_name AS name_a, b.p_name AS name_b,
                   levenshtein(a.p_name, b.p_name)::BIGINT AS dist
            FROM d a JOIN d b ON a.blk = b.blk AND a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= 3
        """,
        # the whole Bloom filter replayed in SQL: HUGEINT polynomial hash
        # of the decimal key string, splitmix finalize (the HLL chain),
        # 13-bit-field positions, distinct-bit set, all-4-set membership
        "bloom_membership": r"""
            WITH dv(j, d) AS (
              VALUES (0, 1::HUGEINT), (1, 8192::HUGEINT),
                     (2, 67108864::HUGEINT), (3, 549755813888::HUGEINT)
            ), built AS (
              SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS s
              FROM orders WHERE o_orderstatus = 'F'
            ), bh AS (
              SELECT list_reduce(list_transform(range(1, length(s) + 1),
                  i -> unicode(substr(s, i, 1))::HUGEINT),
                (a, x) -> (a * 1000003 + x)
                          % 18446744073709551616::HUGEINT) AS h
              FROM built
            ), bf1 AS (SELECT xor(h, h // 536870912) AS h FROM bh
            ), bf2 AS (
              SELECT ((h * 484763065)
                      + ((((h % 4294967296) * 3210233709) % 4294967296)
                         * 4294967296)) % 18446744073709551616::HUGEINT AS h
              FROM bf1
            ), bf3 AS (SELECT xor(h, h // 4294967296) AS h FROM bf2
            ), bits AS (
              SELECT DISTINCT ((h // dv.d) % 8192)::BIGINT AS p FROM bf3, dv
            ), ph AS (
              SELECT c_custkey,
                list_reduce(list_transform(
                    range(1, length(CAST(c_custkey AS VARCHAR)) + 1),
                    i -> unicode(substr(CAST(c_custkey AS VARCHAR), i, 1))::HUGEINT),
                  (a, x) -> (a * 1000003 + x)
                            % 18446744073709551616::HUGEINT) AS h
              FROM customer
            ), pf1 AS (SELECT c_custkey, xor(h, h // 536870912) AS h FROM ph
            ), pf2 AS (
              SELECT c_custkey,
                     ((h * 484763065)
                      + ((((h % 4294967296) * 3210233709) % 4294967296)
                         * 4294967296)) % 18446744073709551616::HUGEINT AS h
              FROM pf1
            ), pf3 AS (SELECT c_custkey, xor(h, h // 4294967296) AS h FROM pf2
            ), pp AS (
              SELECT c_custkey, ((h // dv.d) % 8192)::BIGINT AS p FROM pf3, dv
            )
            SELECT pp.c_custkey,
                   (CASE WHEN count(*) FILTER (WHERE pp.p IN (SELECT p FROM bits)) = 4
                         THEN 1 ELSE 0 END)::BIGINT AS maybe,
                   (CASE WHEN EXISTS (SELECT 1 FROM orders
                                      WHERE o_custkey = pp.c_custkey
                                        AND o_orderstatus = 'F')
                         THEN 1 ELSE 0 END)::BIGINT AS actual
            FROM pp GROUP BY pp.c_custkey
        """,
        # BM25 with raw-ratio idf: the identical IEEE expression tree
        # (term order merge, stream, vector) makes every double exact
        "bm25_topk": r"""
            WITH toks AS (
              SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
              FROM documents
            ), t2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
            dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM t2 GROUP BY doc_id),
            g AS (
              SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                     (SELECT count(*) FROM t2)::DOUBLE AS total
            ), df AS (
              SELECT tok, count(DISTINCT doc_id)::DOUBLE AS df FROM t2
              WHERE tok IN ('merge', 'stream', 'vector') GROUP BY tok
            ), tf AS (
              SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM t2
              WHERE tok IN ('merge', 'stream', 'vector') GROUP BY doc_id, tok
            ), p AS (
              SELECT d.doc_id, d.dl,
                coalesce(max(CASE WHEN tf.tok = 'merge' THEN tf.tf END), 0.0) AS tf1,
                coalesce(max(CASE WHEN tf.tok = 'stream' THEN tf.tf END), 0.0) AS tf2,
                coalesce(max(CASE WHEN tf.tok = 'vector' THEN tf.tf END), 0.0) AS tf3
              FROM dl d LEFT JOIN tf ON tf.doc_id = d.doc_id
              GROUP BY d.doc_id, d.dl
            ), idf AS (
              SELECT
                (g.n - coalesce((SELECT df FROM df WHERE tok = 'merge'), 0.0) + 0.5)
                  / (coalesce((SELECT df FROM df WHERE tok = 'merge'), 0.0) + 0.5) AS i1,
                (g.n - coalesce((SELECT df FROM df WHERE tok = 'stream'), 0.0) + 0.5)
                  / (coalesce((SELECT df FROM df WHERE tok = 'stream'), 0.0) + 0.5) AS i2,
                (g.n - coalesce((SELECT df FROM df WHERE tok = 'vector'), 0.0) + 0.5)
                  / (coalesce((SELECT df FROM df WHERE tok = 'vector'), 0.0) + 0.5) AS i3,
                g.total / g.n AS avgdl
              FROM g
            ), s AS (
              SELECT p.doc_id,
                idf.i1 * ((p.tf1 * 2.2) / (p.tf1 + 1.2 * (0.25 + 0.75 * (p.dl / idf.avgdl))))
                + idf.i2 * ((p.tf2 * 2.2) / (p.tf2 + 1.2 * (0.25 + 0.75 * (p.dl / idf.avgdl))))
                + idf.i3 * ((p.tf3 * 2.2) / (p.tf3 + 1.2 * (0.25 + 0.75 * (p.dl / idf.avgdl))))
                  AS score
              FROM p, idf
            )
            SELECT doc_id, score FROM s WHERE score > 0.0
            ORDER BY score DESC, doc_id LIMIT 10
        """,
        "hll_distinct_users": r"""
            WITH d AS (
              SELECT DISTINCT CAST(user_id AS VARCHAR) AS s FROM events
            ), hashed AS (
              SELECT list_reduce(list_transform(range(1, length(s) + 1),
                  i -> unicode(substr(s, i, 1))::HUGEINT),
                (a, x) -> (a * 1000003 + x)
                          % 18446744073709551616::HUGEINT) AS h
              FROM d
            ), f1 AS (
              SELECT xor(h, h // 536870912) AS h FROM hashed
            ), f2 AS (
              SELECT ((h * 484763065)
                      + ((((h % 4294967296) * 3210233709) % 4294967296)
                         * 4294967296)) % 18446744073709551616::HUGEINT AS h
              FROM f1
            ), f3 AS (
              SELECT xor(h, h // 4294967296) AS h FROM f2
            ), br AS (
              SELECT (h % 1024)::BIGINT AS bucket, h // 1024 AS x FROM f3
            ), ranked AS (
              SELECT bucket,
                CASE WHEN x = 0 THEN 55
                     ELSE 1 + (SELECT min(j.j) - 1 FROM generate_series(1, 54) j(j)
                               WHERE (x // CAST(power(2, j.j - 1) AS HUGEINT)) % 2 = 1)
                END AS rank
              FROM br
            )
            SELECT bucket, max(rank)::BIGINT AS reg
            FROM ranked GROUP BY bucket
        """,
        # the count-min sketch replayed exactly: HUGEINT polynomial byte
        # hash, 10-bit-field positions, per-cell sums, min across rows
        "cms_heavy_hitters": r"""
            WITH toks AS (
              SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
              FROM documents
            ), cnt AS (
              SELECT token, count(*)::HUGEINT AS c
              FROM toks WHERE token <> '' GROUP BY token
            ), hashed AS (
              SELECT token,
                list_reduce(list_transform(range(1, length(token) + 1),
                    i -> unicode(substr(token, i, 1))::HUGEINT),
                  (a, x) -> (a * 1000003 + x)
                            % 18446744073709551616::HUGEINT) AS h
              FROM cnt
            ), pos AS (
              SELECT token, dv.j, ((h // dv.d) % 1024)::BIGINT AS p
              FROM hashed,
                   (VALUES (0, 1::HUGEINT), (1, 1024::HUGEINT),
                           (2, 1048576::HUGEINT),
                           (3, 1073741824::HUGEINT)) dv(j, d)
            ), cells AS (
              SELECT pos.j, pos.p, sum(cnt.c)::BIGINT AS cell
              FROM pos JOIN cnt USING (token) GROUP BY pos.j, pos.p
            ), probe AS (
              SELECT token, c::BIGINT AS cnt FROM cnt
              WHERE length(token) >= 6 ORDER BY token LIMIT 16
            )
            SELECT probe.token, probe.cnt, min(cells.cell) AS est
            FROM probe
            JOIN pos ON pos.token = probe.token
            JOIN cells ON cells.j = pos.j AND cells.p = pos.p
            GROUP BY probe.token, probe.cnt
        """,
        # interval join over the same literal bands
        "range_join_bands": """
            SELECT o_orderkey, o_totalprice, b.band
            FROM orders
            JOIN (VALUES (0.0, 50000.0, 'small'),
                         (50000.0, 150000.0, 'mid'),
                         (150000.0, 300000.0, 'large'),
                         (300000.0, 1e12, 'jumbo')) b(lo, hi, band)
              ON o_totalprice >= b.lo AND o_totalprice < b.hi
        """,
        # point-in-time predicate delete after the 4th single-segment
        # cycle (event_id keys): matching rows ingested by the cut are
        # gone; matching rows arriving after the cut survive
        "cdc_predicate_delete": """
            WITH o AS (
              SELECT *, row_number() OVER (ORDER BY event_id) AS rn,
                     count(*) OVER () AS n
              FROM events
            )
            SELECT user_id, event_id AS sys_change_version, ts, event_type, value, props
            FROM o
            WHERE event_type <> 'error'
              AND NOT (rn <= 4 * ((n + 7) // 8)
                       AND event_type = 'view' AND value < 30.0)
        """,
        # point-in-time equality delete (forget-list of event_id keys,
        # event_id % 7 == 0) after the 4th single-segment cycle
        "cdc_equality_delete": """
            WITH o AS (
              SELECT *, row_number() OVER (ORDER BY event_id) AS rn,
                     count(*) OVER () AS n
              FROM events
            )
            SELECT user_id, event_id AS sys_change_version, ts, event_type, value, props
            FROM o
            WHERE event_type <> 'error'
              AND NOT (rn <= 4 * ((n + 7) // 8) AND event_id % 7 = 0)
        """,
        # mid-stream re-bucketing (8 -> 5) must preserve plain-LWW state
        "cdc_repartition": """
            SELECT user_id, event_id AS sys_change_version, ts, event_type, value, props
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
                  FROM events)
            WHERE rn = 1 AND event_type <> 'error'
        """,
        # the twice-bridged replica must equal plain LWW over all events
        "cdc_replica_sync": """
            SELECT user_id, event_id AS sys_change_version, ts, event_type, value, props
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
                  FROM events)
            WHERE rn = 1 AND event_type <> 'error'
        """,
        # the exported files must round-trip the same LWW state
        "cdc_snapshot_export": """
            SELECT user_id, event_id AS sys_change_version, ts, event_type, value, props
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
                  FROM events)
            WHERE rn = 1 AND event_type <> 'error'
        """,
        # snapshot isolation: LWW over exactly the first 3 single-segment
        # cycles' events (3 * ceil(n/8) by event_id order) — the engine's
        # time-travel read of the cycle-3 manifest must equal this prefix
        # the commit-history metadata table: bootstrap + 8 cycles + 1
        # predicate-delete commit, every column deterministic
        "cdc_history": """
            WITH o AS (
              SELECT event_id, row_number() OVER (ORDER BY event_id) AS rn,
                     count(*) OVER () AS n
              FROM events
            ), c AS (SELECT (max(n) + 7) // 8 AS chunk, max(n) AS n FROM o)
            SELECT 0::BIGINT AS version, 0::BIGINT AS watermark,
                   'bootstrap' AS kind, 0::BIGINT AS changes_in
            UNION ALL
            -- cycle k ingests versions in (wm_{k-1}, wm_k]; the initial
            -- watermark 0 excludes any event with event_id <= 0, so the
            -- first cycle is one short when ids start at 0
            SELECT g.k, o.event_id, 'cycle',
                   least(g.k * c.chunk, c.n) - (g.k - 1) * c.chunk
                   - (CASE WHEN g.k = 1
                           THEN (SELECT count(*) FROM o WHERE event_id <= 0)
                           ELSE 0 END)
            FROM generate_series(1, 8) g(k), c, o
            WHERE o.rn = least(g.k * c.chunk, c.n)
            UNION ALL
            SELECT 9, o.event_id, 'predicate_delete', 0
            FROM o, c WHERE o.rn = c.n
        """,
        # read BY TAG after GC: same cycle-3 prefix as time travel
        "cdc_tagged_read": """
            WITH o AS (
              SELECT *, row_number() OVER (ORDER BY event_id) AS rn,
                     count(*) OVER () AS n
              FROM events
            ), cut AS (
              SELECT max(3 * ((n + 7) // 8)) AS c FROM o
            )
            SELECT user_id, event_id AS sys_change_version, ts, event_type,
                   value, props
            FROM (SELECT o.*, row_number() OVER (PARTITION BY user_id
                                                 ORDER BY event_id DESC) urn
                  FROM o, cut WHERE o.rn <= cut.c)
            WHERE urn = 1 AND event_type <> 'error'
        """,
        "cdc_time_travel": """
            WITH o AS (
              SELECT *, row_number() OVER (ORDER BY event_id) AS rn,
                     count(*) OVER () AS n
              FROM events
            ), cut AS (
              SELECT max(3 * ((n + 7) // 8)) AS c FROM o
            )
            SELECT user_id, event_id AS sys_change_version, ts, event_type,
                   value, props
            FROM (SELECT o.*, row_number() OVER (PARTITION BY user_id
                                                 ORDER BY event_id DESC) urn
                  FROM o, cut WHERE o.rn <= cut.c)
            WHERE urn = 1 AND event_type <> 'error'
        """,
        # net change feed between the cycle-3 and cycle-6 cuts: LWW
        # winners INSIDE the range, classified against the cycle-3 alive
        # set; winners that are deletes of never-alive keys net out
        "cdc_change_feed": """
            WITH o AS (
              SELECT *, row_number() OVER (ORDER BY event_id) AS rn,
                     count(*) OVER () AS n
              FROM events
            ), cuts AS (
              SELECT max(3 * ((n + 7) // 8)) AS a,
                     max(6 * ((n + 7) // 8)) AS b
              FROM o
            ), w AS (
              SELECT * FROM (
                SELECT o.*, row_number() OVER (PARTITION BY user_id
                                               ORDER BY event_id DESC) urn
                FROM o, cuts WHERE o.rn > cuts.a AND o.rn <= cuts.b)
              WHERE urn = 1
            ), alive AS (
              SELECT user_id FROM (
                SELECT o.*, row_number() OVER (PARTITION BY user_id
                                               ORDER BY event_id DESC) urn
                FROM o, cuts WHERE o.rn <= cuts.a)
              WHERE urn = 1 AND event_type <> 'error'
            )
            SELECT w.user_id, w.event_id AS sys_change_version, w.ts,
                   w.event_type, w.value, w.props,
                   CASE WHEN w.event_type = 'error' THEN 'delete'
                        WHEN alive.user_id IS NOT NULL THEN 'update'
                        ELSE 'insert' END AS change_type
            FROM w LEFT JOIN alive ON w.user_id = alive.user_id
            WHERE NOT (w.event_type = 'error' AND alive.user_id IS NULL)
        """,
        # all-changes history: every feed row between the two cuts with
        # its logged op (U->update, D->delete; the feed logs no inserts)
        "cdc_change_feed_all": """
            WITH o AS (
              SELECT *, row_number() OVER (ORDER BY event_id) AS rn,
                     count(*) OVER () AS n
              FROM events
            ), cuts AS (
              SELECT max(3 * ((n + 7) // 8)) AS a,
                     max(6 * ((n + 7) // 8)) AS b
              FROM o
            )
            SELECT user_id, event_id AS sys_change_version, ts, event_type,
                   value, props,
                   CASE WHEN event_type = 'error' THEN 'delete'
                        ELSE 'update' END AS change_type
            FROM o, cuts WHERE o.rn > cuts.a AND o.rn <= cuts.b
        """,
        # incremental view maintenance: the maintained matview must
        # equal a straight group-by over the cycle-6 LWW alive set
        # ingest-time streaming dedup: both detector chains recomputed in
        # HUGEINT, strictly-earlier-cycle semantics (see _ingest_dedup_sql)
        "cdc_ingest_dedup": _ingest_dedup_sql(6),
        "cdc_incremental_matview": """
            WITH o AS (
              SELECT *, row_number() OVER (ORDER BY event_id) AS rn,
                     count(*) OVER () AS n
              FROM events
            ), cut AS (
              SELECT max(6 * ((n + 7) // 8)) AS c FROM o
            ), w AS (
              SELECT * FROM (
                SELECT o.*, row_number() OVER (PARTITION BY user_id
                                               ORDER BY event_id DESC) urn
                FROM o, cut WHERE o.rn <= cut.c)
              WHERE urn = 1 AND event_type <> 'error'
            )
            SELECT event_type, count(*)::BIGINT AS n,
                   sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS value_u
            FROM w GROUP BY event_type
        """,
        # bootstrap -> stream: plain LWW over ALL events, except rows
        # untouched after the snapshot keep the backfill stamp (the
        # version current at backfill start = the cut event) as their
        # sys_change_version — StreamRunner.scala:209-223 semantics
        "cdc_backfill_then_stream": """
            WITH o AS (
              SELECT *, row_number() OVER (ORDER BY event_id) AS rn,
                     count(*) OVER () AS n
              FROM events
            ), cutv AS (
              SELECT event_id AS v FROM o
              WHERE rn = (SELECT max(least(3 * ((n + 7) // 8), n)) FROM o)
            )
            SELECT user_id,
                   CASE WHEN event_id <= cutv.v THEN cutv.v
                        ELSE event_id END AS sys_change_version,
                   ts, event_type, value, props
            FROM (SELECT o.*, row_number() OVER (PARTITION BY user_id
                                                 ORDER BY event_id DESC) urn
                  FROM o) l, cutv
            WHERE urn = 1 AND event_type <> 'error'
        """,
        # additive migration: the column exists only for the LAST 64
        # events; LWW winners from before that must read back NULL
        "cdc_schema_evolution": """
            WITH o AS (
              SELECT *, row_number() OVER (ORDER BY event_id) AS rn,
                     count(*) OVER () AS n
              FROM events
            ), cut AS (
              SELECT max(greatest(n - 64, 0)) AS c FROM o
            )
            SELECT user_id, event_id AS sys_change_version, ts, event_type,
                   value, props,
                   CASE WHEN rn > cut.c THEN upper(event_type) END
                     AS source_region
            FROM (SELECT o.*, row_number() OVER (PARTITION BY user_id
                                                 ORDER BY event_id DESC) urn
                  FROM o) l, cut
            WHERE urn = 1 AND event_type <> 'error'
        """,
        # repeated additive drift: column extra{k} exists only for feed
        # positions past the k-th eighth; the LWW winner's own position
        # decides which extras it carries
        "cdc_schema_drift": """
            WITH o AS (
              SELECT *, row_number() OVER (ORDER BY event_id) AS rn,
                     count(*) OVER () AS n
              FROM events
            ), p AS (
              SELECT max((n + 7) // 8) AS chunk FROM o
            )
            SELECT user_id, event_id AS sys_change_version, ts, event_type,
                   value, props,
                   CASE WHEN rn > 1 * p.chunk THEN event_type || '#1' END AS extra01,
                   CASE WHEN rn > 2 * p.chunk THEN event_type || '#2' END AS extra02,
                   CASE WHEN rn > 3 * p.chunk THEN event_type || '#3' END AS extra03,
                   CASE WHEN rn > 4 * p.chunk THEN event_type || '#4' END AS extra04,
                   CASE WHEN rn > 5 * p.chunk THEN event_type || '#5' END AS extra05,
                   CASE WHEN rn > 6 * p.chunk THEN event_type || '#6' END AS extra06,
                   CASE WHEN rn > 7 * p.chunk THEN event_type || '#7' END AS extra07
            FROM (SELECT o.*, row_number() OVER (PARTITION BY user_id
                                                 ORDER BY event_id DESC) urn
                  FROM o) l, p
            WHERE urn = 1 AND event_type <> 'error'
        """,
        "changefeed_window": """
            SELECT user_id, event_type, value, event_id AS sys_change_version
            FROM events
            WHERE event_id > (SELECT max(event_id) * 3 // 10 FROM events)
              AND event_id <= (SELECT max(event_id) * 6 // 10 FROM events)
        """,
        "watermark_after_replay": "SELECT max(event_id) AS watermark FROM events",
        "backfill_snapshot": "SELECT * FROM orders",
        "field_filter_include": "SELECT doc_id, text, lang FROM documents",
        "normalize_colnames": "SELECT doc_id AS docid, n_chars AS nchars FROM documents",
        "merge_key_synth": """
            SELECT cast(o_orderkey AS varchar) || '#' || cast(o_custkey AS varchar)
                   AS arcane_merge_key, o_totalprice
            FROM orders
        """,
        "type_cast": """
            SELECT cast(l_orderkey AS bigint) AS l_orderkey,
                   cast(l_linenumber AS integer) AS l_linenumber,
                   cast(l_quantity AS double) AS l_quantity
            FROM lineitem
        """,
        "column_stats": """
            SELECT min(l_quantity) AS min_l_quantity, max(l_quantity) AS max_l_quantity,
                   min(l_extendedprice) AS min_l_extendedprice,
                   max(l_extendedprice) AS max_l_extendedprice,
                   min(l_shipdate) AS min_l_shipdate, max(l_shipdate) AS max_l_shipdate,
                   count(l_quantity) AS n
            FROM lineitem
        """,
        "pruned_agg": """
            SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_qty,
                   count(l_quantity) AS n
            FROM lineitem GROUP BY l_returnflag
        """,
        "broadcast_join": """
            SELECT o_orderkey, o_custkey, c_name, o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        "partitioned_join": """
            SELECT o_orderkey, o_custkey, c_name, o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        # the window mirrors the engine's merge order exactly: right
        # (purchase) rows sort before left (click) rows at equal ts, so
        # a same-ts purchase matches; ties break to the max event_id
        "asof_join": """
            WITH e AS (
              SELECT event_id, user_id, ts, value, event_type FROM events
              WHERE event_type IN ('click', 'purchase')
            ), w AS (
              SELECT event_id, user_id, ts, event_type,
                last_value(CASE WHEN event_type = 'purchase' THEN event_id END
                           IGNORE NULLS)
                  OVER (PARTITION BY user_id
                        ORDER BY ts, (event_type = 'click'), event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_id,
                last_value(CASE WHEN event_type = 'purchase' THEN value END
                           IGNORE NULLS)
                  OVER (PARTITION BY user_id
                        ORDER BY ts, (event_type = 'click'), event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_val
              FROM e
            )
            SELECT event_id, user_id, ts,
                   coalesce(m_id, -1)::BIGINT AS matched_event_id,
                   coalesce(m_val, 0.0) AS matched_value
            FROM w WHERE event_type = 'click'
        """,
        "token_count": rf"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '{WORD_PATTERN}')) AS n_tokens_ws,
                   len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS n_tokens_bpe
            FROM documents
        """,
        # the oracle is the ORIGINAL text: escape -> wrap-in-markup ->
        # extract must be a byte-identical round trip (input_hint
        # per-row invariant), so a value-hash match here proves the
        # extraction exact rather than merely self-consistent
        "extract_text": """
            SELECT doc_id, text AS text_extracted FROM documents
        """,
        "quality_score": rf"""
            WITH b AS (
              SELECT doc_id,
                     length(text) AS n_chars_actual,
                     len(regexp_extract_all(text, '{WORD_PATTERN}')) AS n_words,
                     len(regexp_extract_all(text, '{PUNCT_PATTERN}')) AS n_punct,
                     len(regexp_extract_all(text, '{UPPER_PATTERN}')) AS n_upper,
                     len(regexp_extract_all(text, '{stop_en}')) AS n_stop
              FROM documents
            )
            SELECT doc_id, n_chars_actual, n_words,
                   round(cast(n_punct AS double) / greatest(n_chars_actual, 1), 6) AS punct_ratio,
                   round(cast(n_upper AS double) / greatest(n_chars_actual, 1), 6) AS upper_ratio,
                   round(cast(n_stop AS double) / greatest(n_words, 1), 6) AS stopword_ratio,
                   round(cast(n_chars_actual - (n_words - 1) AS double)
                         / greatest(n_words, 1), 6) AS mean_word_len
            FROM b
        """,
        # exact integer divisions (IEEE double division is deterministic)
        # so numpy and DuckDB agree bit-for-bit with no rounding
        "repetition_score": """
            WITH f AS (
              SELECT doc_id, unnest(string_split(text, chr(10))) AS line
              FROM documents
            ), g AS (
              SELECT doc_id, line, count(*) AS c, strlen(line) AS len
              FROM f GROUP BY doc_id, line
            ), agg AS (
              SELECT doc_id,
                     sum(c) AS n_lines,
                     count(*) AS n_distinct,
                     sum(c * len) AS tot_chars,
                     sum(CASE WHEN c > 1 THEN c * len ELSE 0 END) AS dup_chars
              FROM g GROUP BY doc_id
            )
            SELECT doc_id,
                   (n_lines - n_distinct)::DOUBLE / greatest(n_lines, 1) AS dup_line_frac,
                   CASE WHEN tot_chars > 0
                        THEN dup_chars::DOUBLE / tot_chars ELSE 0.0 END AS dup_char_frac
            FROM agg
        """,
        # word-n-gram repetition: the engine hashes words (64-bit ahash)
        # instead of materializing gram strings; collision probability is
        # negligible, so count*chars integers — and therefore the IEEE
        # double ratios — match the string-grouping SQL bit-for-bit
        "ngram_repetition": """
            WITH d AS (
              SELECT doc_id, string_split(text, chr(32)) AS arr FROM documents
            ), p2 AS (
              SELECT doc_id, arr,
                     unnest(generate_series(1, greatest(array_length(arr) - 1, 0))) AS i
              FROM d
            ), c2 AS (
              SELECT doc_id, arr[i] || chr(32) || arr[i+1] AS gram,
                     count(*) AS cnt, any_value(strlen(arr[i]) + strlen(arr[i+1]) + 1) AS len
              FROM p2 GROUP BY doc_id, gram
            ), a2 AS (
              SELECT doc_id, max(cnt * len) AS top_chars, sum(cnt * len) AS tot
              FROM c2 GROUP BY doc_id
            ), p5 AS (
              SELECT doc_id, arr,
                     unnest(generate_series(1, greatest(array_length(arr) - 4, 0))) AS i
              FROM d
            ), c5 AS (
              SELECT doc_id,
                     arr[i] || chr(32) || arr[i+1] || chr(32) || arr[i+2] || chr(32)
                            || arr[i+3] || chr(32) || arr[i+4] AS gram,
                     count(*) AS cnt,
                     any_value(strlen(arr[i]) + strlen(arr[i+1]) + strlen(arr[i+2])
                               + strlen(arr[i+3]) + strlen(arr[i+4]) + 4) AS len
              FROM p5 GROUP BY doc_id, gram
            ), a5 AS (
              SELECT doc_id,
                     sum(CASE WHEN cnt > 1 THEN cnt * len ELSE 0 END) AS dup_chars,
                     sum(cnt * len) AS tot
              FROM c5 GROUP BY doc_id
            )
            SELECT dd.doc_id,
                   CASE WHEN a2.tot > 0 THEN a2.top_chars::DOUBLE / a2.tot ELSE 0.0 END
                     AS top2_char_frac,
                   CASE WHEN a5.tot > 0 THEN a5.dup_chars::DOUBLE / a5.tot ELSE 0.0 END
                     AS dup5_char_frac
            FROM documents dd
            LEFT JOIN a2 ON dd.doc_id = a2.doc_id
            LEFT JOIN a5 ON dd.doc_id = a5.doc_id
        """,
        "corpus_prep": rf"""
            WITH d AS (
              SELECT doc_id, text, string_split(text, chr(32)) AS arr,
                     len(regexp_extract_all(text, '{WORD_PATTERN}')) AS n_tokens_ws
              FROM documents
            ), p2 AS (
              SELECT doc_id, arr,
                     unnest(generate_series(1, greatest(array_length(arr) - 1, 0))) AS i
              FROM d
            ), c2 AS (
              SELECT doc_id, arr[i] || chr(32) || arr[i+1] AS gram,
                     count(*) AS cnt, any_value(strlen(arr[i]) + strlen(arr[i+1]) + 1) AS len
              FROM p2 GROUP BY doc_id, gram
            ), a2 AS (
              SELECT doc_id, max(cnt * len) AS top_chars, sum(cnt * len) AS tot
              FROM c2 GROUP BY doc_id
            ), scored AS (
              SELECT d.doc_id, d.text, d.n_tokens_ws,
                     CASE WHEN a2.tot > 0 THEN a2.top_chars::DOUBLE / a2.tot ELSE 0.0 END
                       AS top2_char_frac
              FROM d LEFT JOIN a2 ON d.doc_id = a2.doc_id
            ), kept AS (
              SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
              FROM scored
              WHERE n_tokens_ws >= 40 AND top2_char_frac < 0.05
            )
            SELECT doc_id, n_tokens_ws, top2_char_frac FROM kept WHERE rn = 1
        """,
        "pii_redact": _pii_sql(),
        # whole-text polynomial hash mod 2^64 replayed in HUGEINT (same
        # technique as doc_fingerprint; codepoint==byte on this corpus)
        "train_eval_split": """
            WITH c AS (
              SELECT doc_id, length(text) AS L,
                     list_transform(range(1, length(text) + 1),
                       i -> unicode(substr(text, i, 1))::HUGEINT) AS b
              FROM documents
            ), h AS (
              SELECT doc_id,
                CASE WHEN L = 0 THEN 0::HUGEINT
                     ELSE list_reduce(b,
                       (a, x) -> (a * 1000003 + x) % 18446744073709551616::HUGEINT)
                END AS hv
              FROM c
            )
            SELECT doc_id,
                   (hv % 100)::BIGINT AS hash_pct,
                   CASE WHEN hv % 100 < 5 THEN 'eval' ELSE 'train' END AS split
            FROM h
        """,
        "stratified_sample": """
            WITH c AS (
              SELECT doc_id, lang, length(text) AS L,
                     list_transform(range(1, length(text) + 1),
                       i -> unicode(substr(text, i, 1))::HUGEINT) AS b
              FROM documents
            ), h AS (
              SELECT doc_id, lang,
                CASE WHEN L = 0 THEN 0::HUGEINT
                     ELSE list_reduce(b,
                       (a, x) -> (a * 1000003 + x) % 18446744073709551616::HUGEINT)
                END AS hv
              FROM c
            ), r AS (
              SELECT lang, doc_id,
                     row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id)
                       AS rnk
              FROM h
            )
            SELECT lang, doc_id, rnk FROM r WHERE rnk <= 5
        """,
        # floor(sqrt) of an int64 count is IEEE-exact in both numpy and
        # DuckDB; hash order replayed in HUGEINT as usual
        "domain_temperature_sample": """
            WITH c AS (
              SELECT doc_id, source, length(text) AS L,
                     list_transform(range(1, length(text) + 1),
                       i -> unicode(substr(text, i, 1))::HUGEINT) AS b
              FROM documents
            ), h AS (
              SELECT doc_id, source,
                CASE WHEN L = 0 THEN 0::HUGEINT
                     ELSE list_reduce(b,
                       (a, x) -> (a * 1000003 + x) % 18446744073709551616::HUGEINT)
                END AS hv
              FROM c
            ), q AS (
              SELECT source, floor(sqrt(count(*)))::BIGINT AS k
              FROM documents GROUP BY source
            ), r AS (
              SELECT h.source, h.doc_id, q.k,
                     row_number() OVER (PARTITION BY h.source
                                        ORDER BY hv, doc_id) AS rnk
              FROM h JOIN q USING (source)
            )
            SELECT source, doc_id, rnk FROM r WHERE rnk <= k
        """,
        "grouped_quantiles": rf"""
            WITH t AS (
              SELECT lang, len(regexp_extract_all(text, '{WORD_PATTERN}')) AS v
              FROM documents
            ), vc AS (
              SELECT lang, v, count(*) AS c FROM t GROUP BY lang, v
            ), w AS (
              SELECT lang, v, sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
                     sum(c) OVER (PARTITION BY lang) AS n
              FROM vc
            )
            SELECT lang, max(n)::BIGINT AS n_docs,
                   min(CASE WHEN cum >= (50 * n + 99) // 100 THEN v END)::BIGINT AS p50,
                   min(CASE WHEN cum >= (90 * n + 99) // 100 THEN v END)::BIGINT AS p90
            FROM w GROUP BY lang
        """,
        # same HUGEINT whole-text-hash replay as train_eval_split; uint64
        # and non-negative HUGEINT sort identically, so the global
        # (hash, doc_id) order — and therefore every rank — matches
        "corpus_shuffle": """
            WITH c AS (
              SELECT doc_id, length(text) AS L,
                     list_transform(range(1, length(text) + 1),
                       i -> unicode(substr(text, i, 1))::HUGEINT) AS b
              FROM documents
            ), h AS (
              SELECT doc_id,
                CASE WHEN L = 0 THEN 0::HUGEINT
                     ELSE list_reduce(b,
                       (a, x) -> (a * 1000003 + x) % 18446744073709551616::HUGEINT)
                END AS hv
              FROM c
            )
            SELECT doc_id,
                   (row_number() OVER (ORDER BY hv, doc_id) - 1)::BIGINT
                     AS shuffle_rank
            FROM h
        """,
        # 1-based inclusive list slices; generate_series step = stride
        "doc_chunk": """
            WITH d AS (
              SELECT doc_id, string_split(text, chr(32)) AS arr FROM documents
            ), s AS (
              SELECT doc_id, arr,
                     unnest(generate_series(1, array_length(arr), 24)) AS st
              FROM d
            )
            SELECT doc_id,
                   (st - 1) // 24 AS chunk_idx,
                   (least(st + 31, array_length(arr)) - st + 1)::BIGINT AS n_words,
                   array_to_string(arr[st:least(st + 31, array_length(arr))], chr(32))
                     AS chunk
            FROM s
        """,
        # engine compares 64-bit gram hashes, oracle compares gram strings
        # — identical counts modulo ~2^-64 collisions (same argument as
        # ngram_repetition)
        "decontaminate": """
            WITH d AS (
              SELECT doc_id, string_split(text, chr(32)) AS arr FROM documents
            ), g AS (
              SELECT doc_id, array_to_string(arr[i:i+7], chr(32)) AS gram
              FROM (SELECT doc_id, arr,
                           unnest(generate_series(1, greatest(array_length(arr) - 7, 0)))
                             AS i
                    FROM d)
            ), bench AS (
              SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 7
            ), hits AS (
              SELECT g.doc_id, count(*) AS nh
              FROM g JOIN bench USING (gram)
              WHERE g.doc_id % 10 <> 7
              GROUP BY g.doc_id
            )
            SELECT dd.doc_id,
                   coalesce(h.nh, 0)::BIGINT AS n_contaminated,
                   (CASE WHEN coalesce(h.nh, 0) > 0 THEN 1 ELSE 0 END)::BIGINT
                     AS contaminated
            FROM documents dd LEFT JOIN hits h ON dd.doc_id = h.doc_id
            WHERE dd.doc_id % 10 <> 7
        """,
        # rank rule: value at row ceil(p*n/100) = (p*n + 99) // 100 of the
        # sorted counts — integer arithmetic on both sides
        "length_quantiles": rf"""
            WITH t AS (
              SELECT len(regexp_extract_all(text, '{WORD_PATTERN}')) AS v
              FROM documents
            ), vc AS (
              SELECT v, count(*) AS c FROM t GROUP BY v
            ), w AS (
              SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM vc
            ), nn AS (
              SELECT count(*) AS n FROM t
            )
            SELECT nn.n::BIGINT AS n_docs,
                   (SELECT min(v) FROM w WHERE cum >= (25 * nn.n + 99) // 100)::BIGINT AS p25,
                   (SELECT min(v) FROM w WHERE cum >= (50 * nn.n + 99) // 100)::BIGINT AS p50,
                   (SELECT min(v) FROM w WHERE cum >= (75 * nn.n + 99) // 100)::BIGINT AS p75,
                   (SELECT min(v) FROM w WHERE cum >= (90 * nn.n + 99) // 100)::BIGINT AS p90,
                   (SELECT min(v) FROM w WHERE cum >= (99 * nn.n + 99) // 100)::BIGINT AS p99
            FROM nn
        """,
        "url_normalize": _url_norm_sql(
            "SELECT doc_id, url, url_norm, host, path FROM p ORDER BY doc_id"
        ),
        "domain_stats": _url_norm_sql(
            """SELECT host, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars
               FROM p GROUP BY host"""
        ),
        "sessionize": """
            SELECT event_id, user_id,
                   sum(CASE WHEN prev_ts IS NULL
                             OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                            THEN 1 ELSE 0 END) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS session_id
            FROM (
              SELECT event_id, user_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS prev_ts
              FROM events
            )
        """,
        "session_stats": """
            WITH s AS (
              SELECT event_id, user_id, ts,
                     sum(CASE WHEN prev_ts IS NULL
                               OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                              THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     )::BIGINT AS session_id
              FROM (
                SELECT event_id, user_id, ts,
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         AS prev_ts
                FROM events
              )
            )
            SELECT user_id, session_id, count(*)::BIGINT AS n_events,
                   min(ts) AS start_ts, max(ts) AS end_ts,
                   (epoch_us(max(ts)) - epoch_us(min(ts)))::BIGINT AS duration_us
            FROM s GROUP BY user_id, session_id
        """,
        # exact [p05, p95] outlier filter: same ceil(p*n/100) rank rule
        # as length_quantiles
        "length_percentile_filter": """
            WITH o AS (
              SELECT n_chars, row_number() OVER (ORDER BY n_chars) AS rn,
                     count(*) OVER () AS n
              FROM documents
            ), thr AS (
              SELECT max(CASE WHEN rn = (5 * n + 99) // 100 THEN n_chars END) AS lo,
                     max(CASE WHEN rn = (95 * n + 99) // 100 THEN n_chars END) AS hi
              FROM o
            )
            SELECT doc_id, n_chars FROM documents, thr
            WHERE n_chars BETWEEN thr.lo AND thr.hi
        """,
        "seq_pack": rf"""
            WITH t AS (
              SELECT doc_id,
                     len(regexp_extract_all(text, '{WORD_PATTERN}')) AS n_tokens_ws
              FROM documents
            )
            SELECT doc_id, n_tokens_ws,
                   ((sum(n_tokens_ws) OVER (
                      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ) - n_tokens_ws) // 512)::BIGINT AS bin_id
            FROM t
        """,
        "tfidf_topk": """
            WITH w AS (
              SELECT doc_id, unnest(string_split(text, chr(32))) AS token
              FROM documents
            ), tf AS (
              SELECT doc_id, token, count(*) AS tf FROM w GROUP BY doc_id, token
            ), df AS (
              SELECT token, count(*) AS df FROM tf GROUP BY token
            ), s AS (
              SELECT tf.doc_id, tf.token,
                     (tf.tf * (SELECT count(*) FROM documents))::DOUBLE / df.df
                       AS tfidf
              FROM tf JOIN df USING (token)
            ), r AS (
              SELECT *, row_number() OVER (
                       PARTITION BY doc_id ORDER BY tfidf DESC, token ASC
                     ) AS rnk
              FROM s
            )
            SELECT doc_id, token, tfidf, rnk FROM r WHERE rnk <= 3
        """,
        "lang_id": _lang_id_sql(),
        "windowed_agg": """
            SELECT event_type, date_trunc('hour', ts) AS w,
                   count(*) AS n,
                   cast(round(sum(value) * 10000) AS bigint) AS sv_u
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "hopping_window": """
            WITH e AS (
              SELECT event_type, value, date_trunc('hour', ts) AS h FROM events
            ), x AS (
              SELECT event_type, value, h AS w FROM e
              UNION ALL
              SELECT event_type, value, h - INTERVAL 1 HOUR AS w FROM e
            )
            SELECT event_type, w, count(*) AS n,
                   cast(round(sum(value) * 10000) AS bigint) AS sv_u
            FROM x GROUP BY event_type, w
        """,
        "distinct_count": """
            SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
            FROM events GROUP BY event_type
        """,
        "top_docs_by_len": rf"""
            SELECT doc_id,
                   round(cast(length(text) - (len(regexp_extract_all(text, '{WORD_PATTERN}')) - 1) AS double)
                         / greatest(len(regexp_extract_all(text, '{WORD_PATTERN}')), 1), 6) AS mean_word_len
            FROM documents
            ORDER BY mean_word_len DESC, doc_id ASC
            LIMIT 50
        """,
        "topk_tokens": r"""
            SELECT token, count(*) AS cnt FROM (
              SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
              FROM documents
            ) WHERE token <> ''
            GROUP BY token
            ORDER BY cnt DESC, token ASC
            LIMIT 20
        """,
        "dedup_exact": """
            SELECT doc_id, text, lang, source, n_chars FROM (
              SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) rn
              FROM documents
            ) WHERE rn = 1
        """,
        "ann_cosine_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, cast(embedding AS double[]) AS qe
              FROM embeddings WHERE vec_id IN (0, 1)
            ), scored AS (
              SELECT q.query_id, e.vec_id,
                     round(list_cosine_similarity(cast(e.embedding AS double[]), q.qe), 6) AS score,
                     row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round(list_cosine_similarity(cast(e.embedding AS double[]), q.qe), 6) DESC,
                                e.vec_id ASC
                     ) rn
              FROM embeddings e CROSS JOIN q
            )
            SELECT query_id, vec_id, score FROM scored WHERE rn <= 10
        """,
        # exact LSH ANN: integer Rademacher bucketing replayed in SQL,
        # radius-1 probing via bit flips, same float64 cosine ranking as
        # ann_cosine_topk (engine-equal at 6-decimal rounding)
        "ann_lsh_topk": f"""
            WITH {lsh_cte},
            probes AS (
              -- the engine filters once with the UNION of every query's
              -- probe set (batch LSH), then scores all candidates
              -- against all queries — the oracle does the same
              SELECT bucket AS pb FROM bkt WHERE vec_id IN (0, 1)
              UNION
              SELECT xor(b.bucket, CAST(1::BIGINT << f.j AS BIGINT))
              FROM bkt b, generate_series(0, 7) f(j) WHERE b.vec_id IN (0, 1)
            ),
            q AS (
              SELECT vec_id AS query_id, cast(embedding AS double[]) AS qe
              FROM embeddings WHERE vec_id IN (0, 1)
            ),
            cand AS (
              SELECT DISTINCT d.vec_id
              FROM probes p JOIN bkt d ON d.bucket = p.pb
            ),
            scored AS (
              SELECT q.query_id, c.vec_id,
                     round(list_cosine_similarity(cast(e.embedding AS double[]), q.qe), 6) AS score,
                     row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round(list_cosine_similarity(cast(e.embedding AS double[]), q.qe), 6) DESC,
                                c.vec_id ASC
                     ) rn
              FROM cand c
              JOIN embeddings e ON e.vec_id = c.vec_id
              CROSS JOIN q
            )
            SELECT query_id, vec_id, score FROM scored WHERE rn <= 10
        """,
        # exact LSH near-dup: same integer bucketing (4 planes), pairs
        # only within a bucket, float64 cosine at the 0.4 threshold
        "embedding_neardup": f"""
            WITH {nd_cte}
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(cast(ea.embedding AS double[]),
                                                cast(eb.embedding AS double[])), 6)
                     AS cosine
            FROM bkt a
            JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            JOIN embeddings ea ON ea.vec_id = a.vec_id
            JOIN embeddings eb ON eb.vec_id = b.vec_id
            WHERE round(list_cosine_similarity(cast(ea.embedding AS double[]),
                                               cast(eb.embedding AS double[])), 6)
                  >= 0.4
        """,
        "multimodal_meta": "SELECT doc_id, cast(strlen(text) AS bigint) AS n_bytes FROM documents",
        # exact n-gram Jaccard: the SQL computes the same distinct word-
        # 3-shingle sets (string form; the Ray side hashes them — equal
        # counts modulo 64-bit collisions) and the same c/(|A|+|B|-c)
        # double division, so values hash-compare bit-exactly
        "dedup_ngram_jaccard": _NGRAM_JACCARD_SQL,
        # exact oracle for the MinHash+LSH path: verification computes the
        # TRUE shingle Jaccard (integer ratio), so the value-hash compare
        # is exact — and a hash match additionally certifies LSH recall
        # 1.0 vs the sketch-free all-pairs ground truth on this corpus
        # (a banding miss would drop a row and fail the compare)
        "dedup_minhash": _NGRAM_JACCARD_SQL.replace(">= 0.2", ">= 0.5"),
        "dedup_simhash": _simhash_sql(max_hamming=3),
        # first-occurrence order is (doc_id, cidx) on both sides; the
        # engine compares chunk hashes, the oracle chunk strings
        "span_dedup": """
            WITH d AS (
              SELECT doc_id, string_split(text, chr(32)) AS arr FROM documents
            ), c AS (
              SELECT doc_id, (st - 1) // 16 AS cidx,
                     array_to_string(arr[st:least(st + 15, array_length(arr))],
                                     chr(32)) AS chunk
              FROM (SELECT doc_id, arr,
                           unnest(generate_series(1, array_length(arr), 16)) AS st
                    FROM d)
            ), r AS (
              SELECT *, row_number() OVER (PARTITION BY chunk
                                           ORDER BY doc_id, cidx) AS rn
              FROM c
            )
            SELECT doc_id,
                   count(*)::BIGINT AS n_chunks,
                   sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
                   coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, chr(32)
                                       ORDER BY cidx), '') AS text_dedup
            FROM r GROUP BY doc_id
        """,
        # connected components over the same pair list via recursive
        # min-label closure (components are tiny, so the closure is too)
        "dedup_clusters": f"""
            WITH RECURSIVE pairs AS (
              SELECT id_a, id_b FROM ({_NGRAM_JACCARD_SQL})
            ), edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL
              SELECT id_b, id_a FROM pairs
            ), lab AS (
              SELECT a AS id, a AS lbl FROM edges
              UNION
              SELECT e.a AS id, l.lbl FROM lab l JOIN edges e ON l.id = e.b
            )
            SELECT id AS doc_id, min(lbl) AS cluster_id FROM lab GROUP BY id
        """,
        # keep-one-per-cluster: longest doc wins (tie -> min id);
        # singleton docs (in no near-dup pair) are their own cluster
        "dedup_keep_best": f"""
            WITH RECURSIVE pairs AS (
              SELECT id_a, id_b FROM ({_NGRAM_JACCARD_SQL})
            ), edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL
              SELECT id_b, id_a FROM pairs
            ), lab AS (
              SELECT a AS id, a AS lbl FROM edges
              UNION
              SELECT e.a AS id, l.lbl FROM lab l JOIN edges e ON l.id = e.b
            ), cl AS (
              SELECT id AS doc_id, min(lbl) AS cluster_id FROM lab GROUP BY id
            ), assigned AS (
              SELECT coalesce(cl.cluster_id, d.doc_id) AS cluster_id,
                     d.doc_id, d.n_chars
              FROM documents d LEFT JOIN cl USING (doc_id)
            )
            SELECT cluster_id, doc_id, n_chars FROM (
              SELECT *, row_number() OVER (PARTITION BY cluster_id
                        ORDER BY n_chars DESC, doc_id) AS rn
              FROM assigned) WHERE rn = 1
        """,
        # inverted index: distinct (token, doc) -> df + ordered posting
        # list capped at 64 ids (df exact over the full set)
        "inverted_index": r"""
            WITH tok AS (
              SELECT DISTINCT doc_id, t AS token
              FROM (SELECT doc_id,
                           unnest(string_split_regex(lower(text), '\s+')) AS t
                    FROM documents)
              WHERE t <> ''
            ), agg AS (
              SELECT token, count(*)::BIGINT AS df,
                     list(doc_id ORDER BY doc_id) AS ids
              FROM tok GROUP BY token
            )
            SELECT token, df, array_to_string(ids[1:64], ',') AS postings
            FROM agg WHERE df >= 2
        """,
        # exact embedding near-dup: pair ids only (scores deliberately
        # omitted — identical pair SETS are the contract; threshold 0.45
        # has >= 1e-4 margin to the nearest cosine on every sf, far above
        # float64-summation-order noise)
        "neardup_cosine_exact": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(cast(a.embedding AS double[]),
                                         cast(b.embedding AS double[])) >= 0.45
        """,
        # winnowing fingerprint: the SAME polynomial rolling hash
        # (base 1000003, mod 2^64, min over min(16, len)-byte windows)
        # recomputed in DuckDB hugeint arithmetic; corpus is ASCII so
        # unicode(char) == byte value (functions/text.py kernel uses
        # utf8 bytes)
        "doc_fingerprint": r"""
            WITH c AS (
              SELECT doc_id, length(text) AS L,
                     list_transform(range(1, length(text) + 1),
                       i -> unicode(substr(text, i, 1))::HUGEINT) AS b
              FROM documents
            ), wh AS (
              SELECT doc_id,
                CASE WHEN L = 0 THEN [0::HUGEINT]
                     WHEN L < 16 THEN [list_reduce(b,
                       (a, x) -> (a * 1000003 + x) % 18446744073709551616::HUGEINT)]
                     ELSE list_transform(range(1, L - 14),
                       i -> list_reduce(b[i:i+15],
                         (a, x) -> (a * 1000003 + x) % 18446744073709551616::HUGEINT))
                END AS hs
              FROM c
            )
            SELECT doc_id,
              (CASE WHEN m >= 9223372036854775808::HUGEINT
                    THEN m - 18446744073709551616::HUGEINT ELSE m END)::BIGINT AS fingerprint
            FROM (SELECT doc_id, list_min(hs) AS m FROM wh)
        """,
        # the fake decoder derives every output from the SAME polynomial
        # rolling hash as doc_fingerprint (whole-payload window), so the
        # stubbed decode chain is exactly SQL-replicable; text is ASCII
        # (unicode(char) == byte) and HUGEINT emulates the mod-2^64 Horner
        "multimodal_decode": r"""
            WITH c AS (
              SELECT doc_id, strlen(text) AS L,
                     list_transform(range(1, length(text) + 1),
                       i -> unicode(substr(text, i, 1))::HUGEINT) AS b
              FROM documents
            ), h AS (
              SELECT doc_id, L,
                CASE WHEN L = 0 THEN 0::HUGEINT
                     ELSE list_reduce(b,
                       (a, x) -> (a * 1000003 + x) % 18446744073709551616::HUGEINT)
                END AS m
              FROM c
            )
            SELECT doc_id,
                   L::BIGINT AS n_bytes,
                   (64 + (m % 448))::INTEGER AS decoded_h,
                   (64 + ((m // 65536) % 448))::INTEGER AS decoded_w,
                   3::INTEGER AS channels,
                   224::INTEGER AS resized_h,
                   224::INTEGER AS resized_w
            FROM h
        """,
        # the flagship staged-path replay converges to the same LWW state
        # as the direct-path twin (cdc_engine_events_replay): staging is
        # an internal transport, not a semantic change
        "cdc_stream_replay": """
            SELECT user_id, event_id AS sys_change_version, ts, event_type, value, props
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
                  FROM events)
            WHERE rn = 1 AND event_type <> 'error'
        """,
        # ann_ivf_topk's contract: the coarse quantizer + nprobe=8/16
        # probing is tuned for recall@10 = 1.0 on this corpus (pytest-
        # asserted at sf0.001/0.01/0.1), so the EXACT brute-force top-k
        # *is* the oracle — any k-means/probing regression that drops a
        # true neighbor breaks the hash.  The scan still touches only
        # the probed half of the clusters (the IVF scale path).
        "ann_ivf_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, cast(embedding AS double[]) AS qe
              FROM embeddings WHERE vec_id IN (0, 1)
            ), scored AS (
              SELECT q.query_id, e.vec_id,
                     round(list_cosine_similarity(cast(e.embedding AS double[]), q.qe), 6) AS score,
                     row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round(list_cosine_similarity(cast(e.embedding AS double[]), q.qe), 6) DESC,
                                e.vec_id ASC
                     ) rn
              FROM embeddings e CROSS JOIN q
            )
            SELECT query_id, vec_id, score FROM scored WHERE rn <= 10
        """,
    }
