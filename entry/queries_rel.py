"""Relational queries: transforms T1-T5, joins (broadcast/partitioned/asof/
semi/anti/fuzzy), windows, funnels, BM25, bloom membership.

Split out of __ray_entry__.py (r3 verdict #5); re-exported by the
facade — the driver contract is unchanged.
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

from .common import _read  # noqa: F401


# ===========================================================================
# Transforms T1-T5
# ===========================================================================
def field_filter_include(sf_dir: str):
    cols = T.resolve_selected_columns(
        ["doc_id", "text", "lang", "source", "n_chars"],
        rule="include",
        fields=("text", "lang"),
        essential=("doc_id",),
    )
    return _read(sf_dir, "documents", columns=cols)


def normalize_colnames(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def weird_then_normalize(batch: pa.Table) -> pa.Table:
        batch = batch.rename_columns(["Doc$Id", "N-Chars"])  # simulate dirty source names
        return T.normalize_column_names(batch)

    return ds.map_batches(weird_then_normalize, batch_format="pyarrow")


def merge_key_synth(sf_dir: str):
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def synth(batch: pa.Table) -> pa.Table:
        batch = T.synthesize_merge_key(batch, ("o_orderkey", "o_custkey"))
        return batch.select([MERGE_KEY_COL, "o_totalprice"])

    return ds.map_batches(synth, batch_format="pyarrow")


def type_cast(sf_dir: str):
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def cast(batch: pa.Table) -> pa.Table:
        return T.cast_columns(
            batch,
            {"l_orderkey": "LongType", "l_linenumber": "IntType", "l_quantity": "DoubleType"},
        )

    return ds.map_batches(cast, batch_format="pyarrow")


def column_stats(sf_dir: str):
    """T5/K4 ANALYZE: per-column min/max/count over the included subset."""
    from ray.data.aggregate import Count, Max, Min

    ds = _read(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice", "l_shipdate"])
    res = ds.aggregate(
        Min("l_quantity", alias_name="min_l_quantity"),
        Max("l_quantity", alias_name="max_l_quantity"),
        Min("l_extendedprice", alias_name="min_l_extendedprice"),
        Max("l_extendedprice", alias_name="max_l_extendedprice"),
        Min("l_shipdate", alias_name="min_l_shipdate"),
        Max("l_shipdate", alias_name="max_l_shipdate"),
        Count("l_quantity", alias_name="n"),
    )
    return pa.table({k: [v] for k, v in res.items()})


def pruned_agg(sf_dir: str):
    """Pre-aggregated groupby over the volume table, columns pruned at the
    read.  The combiner runs INSIDE map_batches: each block collapses to
    <= |distinct flags| partial rows before anything moves, so the global
    groupby folds ~blocks x 3 rows instead of shuffling the table."""
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        gb = batch.group_by("l_returnflag").aggregate(
            [("l_quantity", "sum"), ("l_quantity", "count")]
        )
        return pa.table(
            {
                "l_returnflag": gb["l_returnflag"],
                "sum_qty": gb["l_quantity_sum"],
                "n": pc.cast(gb["l_quantity_count"], pa.int64()),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": group["l_returnflag"][:1],
                "sum_qty": pa.array(
                    [round(pc.sum(group["sum_qty"]).as_py(), 4)], pa.float64()
                ),
                "n": pa.array([pc.sum(group["n"]).as_py()], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .map_groups(fold, batch_format="pyarrow")
    )


# ===========================================================================
# Joins (M3 mechanism: change-event x base-row equi-join)
# ===========================================================================
def broadcast_join(sf_dir: str):
    """Small-side broadcast lookup join: orders x customer, no shuffle."""
    import pyarrow.parquet as pq

    from arcane_stream_sqlserver_change_tracking_ray.functions.join import (
        broadcast_lookup_join,
    )

    customer = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    out = broadcast_lookup_join(ds, customer, on="o_custkey", right_on="c_custkey")
    return out.select_columns(["o_orderkey", "o_custkey", "c_name", "o_totalprice"])


def partitioned_join(sf_dir: str):
    """Both-sides-large partitioned hash join (explicit bucket shuffle);
    same oracle as broadcast_join."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.join import (
        partitioned_equi_join,
    )

    left = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    right = _read(sf_dir, "customer", columns=["c_custkey", "c_name"]).map_batches(
        lambda b: b.rename_columns(["o_custkey", "c_name"]), batch_format="pyarrow"
    )
    out = partitioned_equi_join(left, right, on="o_custkey", num_buckets=16)
    return out.select_columns(["o_orderkey", "o_custkey", "c_name", "o_totalprice"])





def asof_join(sf_dir: str):
    """Backward as-of join: every click event picks up the user's latest
    purchase at-or-before it (the event×slowly-changing-dimension
    operator Ray Data lacks a primitive for).  One key-bucketed
    co-shuffle; inside each bucket a single lexsort + maximum.accumulate
    merge resolves all matches in O(n).  Nulls (no earlier purchase)
    are filled to sentinel values so the oracle compare stays typed."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.join import (
        asof_join as _asof,
    )

    ev = _read(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    left = ev.filter(expr="event_type == 'click'").select_columns(
        ["event_id", "user_id", "ts"]
    )
    right = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["event_id", "user_id", "ts", "value"]
    )
    out = _asof(
        left,
        right,
        key_col="user_id",
        ts_col="ts",
        tie_col="event_id",
        payload_cols=["event_id", "value"],
        # bucket count is the parallelism knob: sized to this corpus
        # (150 users); at cluster scale raise it with the key cardinality
        num_buckets=16,
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "matched_event_id": pc.fill_null(
                    batch["matched_event_id"], pa.scalar(-1, pa.int64())
                ),
                "matched_value": pc.fill_null(
                    batch["matched_value"], pa.scalar(0.0, pa.float64())
                ),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")

def funnel_users(sf_dir: str):
    """Conversion-funnel membership (view -> later purchase) — a pure
    pre-aggregable pattern: per-batch Arrow hash-aggregate collapses to
    one (user, min_view_ts, max_purchase_ts) row per key per batch
    (sentinel-filled, so the global Min/Max fold never sees nulls), then
    a tiny groupby folds partials and a final filter keeps converting
    users.  The events payload never shuffles."""
    from ray.data.aggregate import Min, Max

    I64MAX, I64MIN = 2**63 - 1, -(2**63)
    ds = _read(sf_dir, "events", columns=["ts", "user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64())
        fv = pc.if_else(
            pc.equal(batch["event_type"], "view"), ts, pa.scalar(I64MAX, pa.int64())
        )
        lp = pc.if_else(
            pc.equal(batch["event_type"], "purchase"), ts, pa.scalar(I64MIN, pa.int64())
        )
        t = pa.table({"user_id": batch["user_id"], "fv": fv, "lp": lp})
        g = t.group_by("user_id").aggregate([("fv", "min"), ("lp", "max")])
        return g.rename_columns(["user_id", "fv", "lp"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("fv", alias_name="fv"), Max("lp", alias_name="lp"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        fv, lp = batch["fv"], batch["lp"]
        keep = pc.and_(
            pc.and_(
                pc.not_equal(fv, pa.scalar(I64MAX, pa.int64())),
                pc.not_equal(lp, pa.scalar(I64MIN, pa.int64())),
            ),
            pc.less(fv, lp),
        )
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "first_view": pc.cast(fv, pa.timestamp("us")),
                "last_purchase": pc.cast(lp, pa.timestamp("us")),
            }
        )
        return t.filter(keep)

    return out.map_batches(finish, batch_format="pyarrow")


def per_domain_topk(sf_dir: str, k: int = 3):
    """Top-k documents per source domain by length (grouped top-k, the
    per-stratum ranking primitive): per-batch vectorized top-k per
    source runs BEFORE the shuffle, so at most k rows per (source,
    batch) move; the per-source finish re-ranks the partials."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    keys = [("source", "ascending"), ("n_chars", "descending"), ("doc_id", "ascending")]

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.take(pc.sort_indices(batch, sort_keys=keys))
        src = g["source"].to_numpy(zero_copy_only=False)
        n = len(src)
        if n == 0:
            return g
        starts = np.r_[True, src[1:] != src[:-1]]
        idx = np.flatnonzero(starts)
        counts = np.diff(np.r_[idx, n])
        rank = np.arange(n) - np.repeat(idx, counts)
        return g.filter(pa.array(rank < k))

    def finish(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("n_chars", "descending"), ("doc_id", "ascending")]
        )
        return group.take(order[:k])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .map_groups(finish, batch_format="pyarrow")
    )


def revenue_by_nation(sf_dir: str):
    """TPC-H Q5-lite: revenue by customer nation for orders placed in
    1996 — the classic fact×fact×dimension chain.  Scale shape: revenue
    pre-aggregates per (orderkey) INSIDE each lineitem batch before any
    movement (the fact table collapses ~4:1 and payload columns drop to
    one int64); the lineitem×orders join is the explicit partitioned
    hash join (both sides huge); customer⋈nation collapses to a
    custkey->n_name lookup broadcast once via ray.put (at extreme scale
    this becomes a second partitioned join on custkey — same operator).
    Revenue is integer 1e-4 units (price cents × (100 - discount
    cents)) so sums compare bit-for-bit with the SQL oracle."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.join import (
        broadcast_lookup_join,
        partitioned_equi_join,
    )
    from ray.data.aggregate import Sum
    import pyarrow.parquet as pq

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def li_partial(batch: pa.Table) -> pa.Table:
        # half_towards_infinity matches DuckDB round() on exact .5 cents
        price_c = pc.cast(
            pc.round(pc.multiply(batch["l_extendedprice"], 100.0), 0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        disc_c = pc.cast(
            pc.round(pc.multiply(batch["l_discount"], 100.0), 0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        rev = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        t = pa.table({"o_orderkey": batch["l_orderkey"], "rev_u": rev})
        g = t.group_by("o_orderkey").aggregate([("rev_u", "sum")])
        return g.rename_columns(["o_orderkey", "rev_u"])

    from datetime import datetime

    lo = pa.scalar(datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime(1997, 1, 1), pa.timestamp("us"))

    def od_filter(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(batch["o_orderdate"], lo), pc.less(batch["o_orderdate"], hi)
        )
        return batch.filter(keep).select(["o_orderkey", "o_custkey"])

    fact = li.map_batches(li_partial, batch_format="pyarrow")
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(od_filter, batch_format="pyarrow")
    joined = partitioned_equi_join(fact, orders, on="o_orderkey", num_buckets=16)

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    lookup = cust.join(
        nat, keys=["c_nationkey"], right_keys=["n_nationkey"], join_type="inner"
    ).select(["c_custkey", "n_name"])
    with_nation = broadcast_lookup_join(
        joined, lookup, on="o_custkey", right_on="c_custkey", small_columns=["n_name"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["n_name", "rev_u"])
            .group_by("n_name")
            .aggregate([("rev_u", "sum")])
        )
        return g.rename_columns(["n_name", "rev_u"])

    return (
        with_nation.map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("rev_u", alias_name="revenue_u"))
    )


def windowed_agg(sf_dir: str):
    """Tumbling-window aggregate over event time (the streaming-window
    operator the reference lacks): per (event_type, hour) row counts and
    value sums.  Shape: per-batch PARTIAL aggregation with Arrow's
    hash group_by inside map_batches, then a small global groupby over
    (type, window) partials — the full events payload never shuffles."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch["ts"], unit="hour")
        t = pa.table(
            {"event_type": batch["event_type"], "w": w, "value": batch["value"]}
        )
        g = t.group_by(["event_type", "w"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return g.rename_columns(["event_type", "w", "sv", "n"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "w"])
        .aggregate(Sum("sv", alias_name="sv"), Sum("n", alias_name="n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        # sum as integer 1e-4 units: float-sum low bits differ between
        # engines by summation order, and round() ulp behavior differs
        # between Arrow and DuckDB — integer units compare exactly
        sv_u = pc.cast(pc.round(pc.multiply(batch["sv"], 10000.0), 0,
                                round_mode="half_towards_infinity"), pa.int64())
        return pa.table(
            {
                "event_type": batch["event_type"],
                "w": pc.cast(batch["w"], pa.timestamp("us")),
                "n": pc.cast(batch["n"], pa.int64()),
                "sv_u": sv_u,
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def hopping_window(sf_dir: str):
    """Hopping (overlapping) window aggregate: 2-hour windows advancing
    hourly — each event lands in TWO windows.  The window expansion is a
    row-duplicating map_batches (event → its two window starts) with
    in-batch partial aggregation BEFORE the global (type, window)
    groupby, so the shuffle carries window partials, never the doubled
    event stream."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    hour = pa.scalar(3_600_000_000, pa.duration("us"))

    def partial(batch: pa.Table) -> pa.Table:
        w0 = pc.floor_temporal(batch["ts"], unit="hour")
        t = pa.concat_tables(
            [
                pa.table(
                    {"event_type": batch["event_type"], "w": w, "value": batch["value"]}
                )
                for w in (w0, pc.subtract(w0, hour))
            ]
        )
        g = t.group_by(["event_type", "w"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return g.rename_columns(["event_type", "w", "sv", "n"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "w"])
        .aggregate(Sum("sv", alias_name="sv"), Sum("n", alias_name="n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        sv_u = pc.cast(pc.round(pc.multiply(batch["sv"], 10000.0), 0,
                                round_mode="half_towards_infinity"), pa.int64())
        return pa.table(
            {
                "event_type": batch["event_type"],
                "w": pc.cast(batch["w"], pa.timestamp("us")),
                "n": pc.cast(batch["n"], pa.int64()),
                "sv_u": sv_u,
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def distinct_count(sf_dir: str):
    """Exact COUNT(DISTINCT) at scale: distinct users per event type via
    the standard two-level groupby — level 1 dedups (type, user) pairs
    (per-batch pre-distinct shrinks the exchange to unique pairs), level
    2 counts pairs per type with another partial/sum.  No sketches, no
    driver-side set."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def pre_distinct(batch: pa.Table) -> pa.Table:
        return batch.group_by(["event_type", "user_id"]).aggregate([])

    uniq = (
        ds.map_batches(pre_distinct, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_c"))
    )

    def count_per_type(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["event_type"])
            .group_by("event_type")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["event_type", "pn"])

    out = (
        uniq.map_batches(count_per_type, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("pn", alias_name="n_users"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "n_users": pc.cast(batch["n_users"], pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def top_docs_by_len(sf_dir: str):
    """Global sort + limit surface: top-50 documents by mean word length
    (rounded quality metric), doc_id tie-break — a distributed sort whose
    output is deterministic and SQL-oracle-checkable."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    scored = ds.map_batches(QualityScoreStage(), batch_format="pyarrow").select_columns(
        ["doc_id", "mean_word_len"]
    )
    return scored.sort(["mean_word_len", "doc_id"], descending=[True, False]).limit(50)



# ===========================================================================
# Semi/anti joins, Bloom membership, BM25 retrieval, fuzzy string join
# ===========================================================================
def semi_join_buyers(sf_dir: str):
    """Bucketed LEFT SEMI join (the fact×fact shape): customers with at
    least one order.  Both sides co-shuffle by key hash once and
    pyarrow's C++ 'left semi' join runs inside each bucket — duplicate
    right keys never multiply output rows, and only the right side's
    8-byte key column crosses the wire."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.join import (
        partitioned_equi_join,
    )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])
    okeys = _read(sf_dir, "orders", columns=["o_custkey"]).map_batches(
        lambda b: b.rename_columns(["c_custkey"]), batch_format="pyarrow"
    )
    return partitioned_equi_join(
        cust, okeys, on="c_custkey", num_buckets=16, join_type="left semi"
    )


def anti_join_customers(sf_dir: str):
    """Broadcast ANTI join: customers with NO jumbo (≥300k) order.  The
    key side is thinned to its distinct set distributedly (per-batch
    Arrow DISTINCT, tiny fold), broadcast once via ``ray.put``, and the
    probe side streams through one ``np.searchsorted`` per batch — no
    shuffle."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.join import (
        broadcast_semi_join,
    )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])
    jumbo = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        lambda b: b.filter(pc.greater_equal(b["o_totalprice"], 300000.0)).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    return broadcast_semi_join(
        cust, jumbo, on="c_custkey", right_on="o_custkey", anti=True
    )


def fuzzy_join_parts(sf_dir: str):
    """Blocked approximate-string self-join (record linkage): all
    distinct part-name pairs at Levenshtein distance ≤ 3 sharing the
    same last word.  Only distinct short strings shuffle (per-batch
    DISTINCT first); each block solves its pair-distance matrix with a
    numpy-VECTORIZED Wagner–Fischer DP (pair axis vectorized — no
    per-pair Python).  The oracle replays the identical blocking and
    DuckDB's own ``levenshtein``, so the hash gate certifies the DP."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.join import (
        fuzzy_self_join,
    )

    ds = _read(sf_dir, "part", columns=["p_name"])
    return fuzzy_self_join(ds, "p_name", max_distance=3)


def bloom_membership(sf_dir: str):
    """Bloom filter under the VALUE-HASH gate: an 8192-bit / 4-hash
    filter built over the custkeys of 'F'-status orders — per-batch
    1 KB packed-word partials folded by OR (the mergeable sketch shape:
    corpus size never touches the driver) — probed with every customer
    key next to exact membership.  The oracle replays the whole filter
    in SQL (HUGEINT polynomial hash + splitmix finalize, 13-bit-field
    positions, distinct-bit set, all-4-positions-set test), so the hash
    match certifies the filter's exact false-positive behavior; the
    no-false-negatives invariant is pytest-asserted too."""
    import ray

    from arcane_stream_sqlserver_change_tracking_ray.functions.sketch import (
        bloom_build,
        bloom_probe,
    )

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])
    fo = orders.map_batches(
        lambda b: b.filter(pc.equal(b["o_orderstatus"], "F")).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    bits = bloom_build(fo, "o_custkey")
    parts = fo.map_batches(
        lambda b: b.group_by(["o_custkey"]).aggregate([]), batch_format="pyarrow"
    ).take_all()
    exact = np.unique(np.array([r["o_custkey"] for r in parts], dtype=np.int64))
    ref = ray.put((bits, exact))

    def probe(batch: pa.Table) -> pa.Table:
        bits_, exact_ = ray.get(ref)
        maybe = bloom_probe(bits_, batch["c_custkey"])
        v = batch["c_custkey"].to_numpy(zero_copy_only=False)
        if len(exact_):
            pos = np.searchsorted(exact_, v)
            act = (pos < len(exact_)) & (exact_[np.clip(pos, 0, len(exact_) - 1)] == v)
        else:
            act = np.zeros(len(v), dtype=bool)
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "maybe": pa.array(maybe.astype(np.int64)),
                "actual": pa.array(act.astype(np.int64)),
            }
        )

    return _read(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        probe, batch_format="pyarrow"
    )


_BM25_TERMS = ("merge", "stream", "vector")


def bm25_topk(sf_dir: str, k: int = 10):
    """BM25 retrieval over the corpus (k1=1.2, b=0.75, raw-ratio idf —
    no transcendental ``ln``, so every double is the same IEEE
    expression tree in numpy and the SQL oracle and the hash gate
    certifies the scores bit-for-bit).  Two passes: (1) global stats as
    a 5-integer partial per task (N, total tokens, per-term df); (2)
    per-batch vectorized tf/dl scoring + LOCAL top-k, so only ≤k rows
    per batch ever reach the driver — the corpus never moves."""
    import ray

    from arcane_stream_sqlserver_change_tracking_ray.functions.text import words_flat

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats_partial(batch: pa.Table) -> pa.Table:
        flat, offsets = words_flat(batch["text"])
        ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        di = np.repeat(np.arange(batch.num_rows), np.diff(offsets))
        dfs = {}
        for t in _BM25_TERMS:
            eq = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            dfs[t] = len(np.unique(di[eq]))
        cols = {"n": [batch.num_rows], "total": [int(ne.sum())]}
        cols.update({f"df{i}": [dfs[t]] for i, t in enumerate(_BM25_TERMS)})
        return pa.table(cols)

    parts = ds.map_batches(stats_partial, batch_format="pyarrow").take_all()
    n_docs = sum(r["n"] for r in parts)
    total = sum(r["total"] for r in parts)
    dfs = [sum(r[f"df{i}"] for r in parts) for i in range(len(_BM25_TERMS))]
    gref = ray.put((float(n_docs), float(total), [float(d) for d in dfs]))

    def score_batch(batch: pa.Table) -> pa.Table:
        n_, total_, dfs_ = ray.get(gref)
        avgdl = total_ / n_
        flat, offsets = words_flat(batch["text"])
        ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        di = np.repeat(np.arange(batch.num_rows), np.diff(offsets))
        dl = np.bincount(di[ne], minlength=batch.num_rows).astype(np.float64)
        score = np.zeros(batch.num_rows, dtype=np.float64)
        for term, df in zip(_BM25_TERMS, dfs_):
            eq = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            tf = np.bincount(di[eq], minlength=batch.num_rows).astype(np.float64)
            idf = (n_ - df + 0.5) / (df + 0.5)
            s = idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
            score = score + s
        keep = score > 0.0
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)[keep]
        sc = score[keep]
        order = np.lexsort((ids, -sc))[:k]  # local top-k partial
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "score": pa.array(sc[order], pa.float64()),
            }
        )

    tops = ds.map_batches(score_batch, batch_format="pyarrow").take_all()
    ids = np.array([r["doc_id"] for r in tops], dtype=np.int64)
    sc = np.array([r["score"] for r in tops], dtype=np.float64)
    order = np.lexsort((ids, -sc))[:k]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], pa.int64()),
            "score": pa.array(sc[order], pa.float64()),
        }
    )

