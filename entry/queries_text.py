"""Text / corpus training-data queries: token counts, quality, language id,
PII redaction, TF-IDF, packing, sampling, shuffling, sessionization.

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
# Training-data operators: text analysis
# ===========================================================================
def token_count(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(TokenCountStage(), batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens_ws", "n_tokens_bpe"]
    )


class _PageHtmlBuilder:
    """Render each document as a Common-Crawl-style page (escape text,
    wrap in markup with attributes + a content-bearing meta tag) — the
    query scaffolding that lets ``ExtractTextStage`` be oracle-checked as
    an exact round trip (input_hint: byte-identical extracted text)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        esc = escape_html_text(batch["text"])
        doc_s = pc.cast(batch["doc_id"], pa.string())
        html = pc.binary_join_element_wise(
            pa.array(['<html lang="'] * n, pa.string()),
            batch["lang"].combine_chunks() if isinstance(batch["lang"], pa.ChunkedArray) else batch["lang"],
            pa.array(['"><head><meta name="title" content="doc '] * n, pa.string()),
            doc_s,
            pa.array(['"/></head><body><p>'] * n, pa.string()),
            esc,
            pa.array(["</p></body></html>"] * n, pa.string()),
            "",
        ).cast(pa.binary())
        return batch.append_column("html", html)


def extract_text(sf_dir: str):
    """html->text extraction (input_hint invariant): build a page per
    document, extract, and return the extracted text.  The oracle is the
    ORIGINAL text column — a hash match proves the extraction is a
    byte-identical round trip, not merely self-consistent."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import ExtractTextStage

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    ds = ds.map_batches(_PageHtmlBuilder(), batch_format="pyarrow")
    ds = ds.map_batches(ExtractTextStage(), batch_format="pyarrow")
    return ds.select_columns(["doc_id", "text_extracted"])


def quality_score(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(QualityScoreStage(), batch_format="pyarrow").select_columns(
        ["doc_id", "n_chars_actual", "n_words", "punct_ratio", "upper_ratio",
         "stopword_ratio", "mean_word_len"]
    )


def repetition_score(sf_dir: str):
    """Gopher repetition filters (duplicate-line fraction + duplicate-line
    char fraction) — boilerplate detection over the web corpus."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import RepetitionStage

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(RepetitionStage(), batch_format="pyarrow").select_columns(
        ["doc_id", "dup_line_frac", "dup_char_frac"]
    )


def ngram_repetition(sf_dir: str):
    """Gopher word-n-gram repetition signals: heaviest-2-gram char
    fraction + duplicated-5-gram char fraction (boilerplate/spam
    detection — the corpus has no newlines, so the word-level signals
    are the discriminating ones here)."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import (
        NgramRepetitionStage,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(NgramRepetitionStage(), batch_format="pyarrow").select_columns(
        ["doc_id", "top2_char_frac", "dup5_char_frac"]
    )


def corpus_prep(sf_dir: str):
    """Composed training-corpus curation pipeline: token count ->
    n-gram repetition -> quality gate (>= 40 words, top-2-gram fraction
    < 0.05) -> corpus-wide exact dedup keeping the lowest doc_id.  Every
    stage streams; the only shuffle is the dedup's 8-byte-key exchange."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.dedup import exact_dedup
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import (
        NgramRepetitionStage,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(TokenCountStage(), batch_format="pyarrow")
    ds = ds.map_batches(NgramRepetitionStage(), batch_format="pyarrow")
    ds = ds.filter(expr="n_tokens_ws >= 40 and top2_char_frac < 0.05")
    return exact_dedup(ds, "text", "doc_id").select_columns(
        ["doc_id", "n_tokens_ws", "top2_char_frac"]
    )


def _tfidf_apply(batch: pa.Table, df_ref=None, n_docs: int = 0, k: int = 3) -> pa.Table:
    return TfidfTopKStage(df_ref, n_docs=n_docs, k=k)(batch)


def tfidf_topk(sf_dir: str):
    """Top-3 TF-IDF terms per document.  Two streaming passes over the
    corpus: (1) per-batch (doc_id, token, tf) counts -> vocab-sized
    partial-DF combine -> tiny groupby sum (only (token, count) rows
    ever shuffle); (2) the DF table (vocabulary-sized) is broadcast via
    ``ray.put`` into an actor pool that scores and keeps each doc's
    top-3 — no corpus-sized shuffle anywhere.  idf = n_docs/df (no log)
    so every double matches the SQL oracle bit-for-bit."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import (
        TfidfTopKStage,
        doc_token_counts,
    )

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    tf = ds.map_batches(doc_token_counts, batch_format="pyarrow")

    def partial_df(batch: pa.Table) -> pa.Table:
        g = batch.select(["token"]).group_by("token").aggregate([([], "count_all")])
        return g.rename_columns(["token", "pdf"])

    df_ds = (
        tf.map_batches(partial_df, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("pdf", alias_name="df"))
    )
    df_tbl = pa.Table.from_pandas(df_ds.to_pandas())  # vocabulary-sized
    df_ref = ray.put(df_tbl)
    # task-based (not an actor pool): ray.get(df_ref) is plasma-local and
    # zero-copy after the first task on each worker, and tasks skip the
    # actor-pool spin-up cost per query invocation
    return tf.map_batches(
        _tfidf_apply,
        fn_kwargs={"df_ref": df_ref, "n_docs": n_docs, "k": 3},
        batch_format="pyarrow",
    )


def seq_pack(sf_dir: str, bin_tokens: int = 512, bucket: int = 256):
    """Sequence packing for LLM pre-training: assign each document to a
    fixed-token-budget bin by GLOBAL running token count in doc_id
    order — a distributed prefix sum.  Pass A reduces per-batch
    bucket-granular partial sums (tiny shuffle); the driver prefix-sums
    the bucket table (vocabulary of buckets, not docs) and broadcasts
    the exclusive offsets; pass B co-locates each bucket with one
    groupby and finishes the cumsum locally.  No corpus-wide sort, no
    driver-side row loop."""
    import ray
    from ray.data.aggregate import Sum
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import (
        assign_bins_in_bucket,
        bucket_token_sums,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    t = ds.map_batches(TokenCountStage(), batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens_ws"]
    )
    sums = (
        t.map_batches(bucket_token_sums, fn_kwargs={"bucket": bucket}, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("bn", alias_name="bn"))
        .to_pandas()
        .sort_values("bucket")
    )
    buckets = sums["bucket"].to_numpy()
    totals = sums["bn"].to_numpy()
    offsets = np.zeros(int(buckets.max()) + 1 if len(buckets) else 1, np.int64)
    offsets[buckets] = np.cumsum(totals) - totals  # exclusive prefix per bucket
    off_ref = ray.put(offsets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("bucket", pa.array(ids // bucket, pa.int64()))

    def finish(group: pa.Table) -> pa.Table:
        return assign_bins_in_bucket(group, ray.get(off_ref), bin_tokens)

    return (
        t.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(finish, batch_format="pyarrow")
    )


def train_eval_split(sf_dir: str, eval_pct: int = 5):
    """Deterministic content-hash train/eval split: a document lands in
    the same split no matter how the corpus is sharded, re-ordered or
    re-ingested (whole-text polynomial hash mod 2^64, then mod 100 —
    the property that prevents train/eval leakage when the corpus is
    rebuilt).  Embarrassingly parallel; the oracle replays the exact
    hash in DuckDB HUGEINT arithmetic."""

    def assign(batch: pa.Table) -> pa.Table:
        h, offs = rolling_window_hashes(batch["text"], k=1 << 31)
        out = np.zeros(len(offs) - 1, np.uint64)
        out[np.diff(offs) > 0] = h  # empty docs hash to 0
        pct = (out % np.uint64(100)).astype(np.int64)
        split = np.where(pct < eval_pct, "eval", "train")
        ids = batch["doc_id"]
        return pa.table(
            {
                "doc_id": ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids,
                "hash_pct": pa.array(pct, pa.int64()),
                "split": pa.array(split.astype(object), pa.string()),
            }
        )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(assign, batch_format="pyarrow")


def stratified_sample(sf_dir: str, per_group: int = 5):
    """Deterministic stratified sampling: per language, keep the
    ``per_group`` documents with the smallest whole-text content hash
    (ties by doc_id) — a reshard-stable "random" sample per stratum
    (the hash is uniform; sampling by hash order is the standard
    reproducible-sample trick).  One lang-keyed groupby; the hash is
    replayed in DuckDB HUGEINT arithmetic (uint64 and non-negative
    HUGEINT sort identically)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        h, offs = rolling_window_hashes(batch["text"], k=1 << 31)
        out = np.zeros(len(offs) - 1, np.uint64)
        out[np.diff(offs) > 0] = h
        return pa.table(
            {
                "doc_id": batch["doc_id"].combine_chunks()
                if isinstance(batch["doc_id"], pa.ChunkedArray)
                else batch["doc_id"],
                "lang": batch["lang"].combine_chunks()
                if isinstance(batch["lang"], pa.ChunkedArray)
                else batch["lang"],
                "hv": pa.array(out, pa.uint64()),
            }
        )

    def top_per_lang(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("hv", "ascending"), ("doc_id", "ascending")]
        )
        g = group.take(order).slice(0, per_group)
        n = g.num_rows
        return pa.table(
            {
                "lang": g["lang"],
                "doc_id": g["doc_id"],
                "rnk": pa.array(np.arange(1, n + 1), pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(top_per_lang, batch_format="pyarrow")
    )


def domain_temperature_sample(sf_dir: str):
    """Temperature-flattened domain sampling (the multilingual/domain
    rebalancing step of corpus mixing, cf. XLM-R's alpha-sampling): keep
    ``floor(sqrt(n_d))`` docs per source — big domains are downsampled
    sublinearly, tiny ones kept nearly whole.  Two passes: a tiny
    per-source count groupby decides each quota driver-side (broadcast
    via ``ray.put``); pass B keeps each source's quota by content-hash
    order (reshard-stable).  ``floor(sqrt())`` is IEEE-exact on int64
    counts, so the SQL oracle reproduces every quota."""
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        g = batch.select(["source"]).group_by("source").aggregate([([], "count_all")])
        return g.rename_columns(["source", "c"])

    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # domain-cardinality table, tiny
    )
    quota = {
        s: int(np.floor(np.sqrt(c)))
        for s, c in zip(counts["source"], counts["c"].astype(np.int64))
    }
    q_ref = ray.put(quota)

    def add_hash(batch: pa.Table) -> pa.Table:
        h, offs = rolling_window_hashes(batch["text"], k=1 << 31)
        out = np.zeros(len(offs) - 1, np.uint64)
        out[np.diff(offs) > 0] = h
        return pa.table(
            {
                "doc_id": batch["doc_id"].combine_chunks()
                if isinstance(batch["doc_id"], pa.ChunkedArray)
                else batch["doc_id"],
                "source": batch["source"].combine_chunks()
                if isinstance(batch["source"], pa.ChunkedArray)
                else batch["source"],
                "hv": pa.array(out, pa.uint64()),
            }
        )

    def keep_quota(group: pa.Table) -> pa.Table:
        k = ray.get(q_ref).get(group["source"][0].as_py(), 0)
        order = pc.sort_indices(
            group, sort_keys=[("hv", "ascending"), ("doc_id", "ascending")]
        )
        g = group.take(order).slice(0, k)
        return pa.table(
            {
                "source": g["source"],
                "doc_id": g["doc_id"],
                "rnk": pa.array(np.arange(1, g.num_rows + 1), pa.int64()),
            }
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("source")
        .map_groups(keep_quota, batch_format="pyarrow")
    )


def grouped_quantiles(sf_dir: str):
    """EXACT per-language token-count quantiles (p50/p90 per lang): the
    per-stratum variant of ``length_quantiles``.  Per-batch (lang, count)
    value-count partials → a groupby over the per-lang histograms (only
    distinct (lang, length) pairs shuffle) → driver-side cumsum per lang
    over the tiny histogram table."""
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    t = ds.map_batches(TokenCountStage(), batch_format="pyarrow")

    def partial_counts(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["lang", "n_tokens_ws"])
            .group_by(["lang", "n_tokens_ws"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["lang", "v", "c"])

    hist = (
        t.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(["lang", "v"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values(["lang", "v"])
    )
    rows = []
    for lang, grp in hist.groupby("lang", sort=True):
        v = grp["v"].to_numpy(np.int64)
        cum = np.cumsum(grp["c"].to_numpy(np.int64))
        n = int(cum[-1])
        row = {"lang": lang, "n_docs": n}
        for p in (50, 90):
            rank = (p * n + 99) // 100
            row[f"p{p}"] = int(v[np.searchsorted(cum, rank)])
        rows.append(row)
    return pd.DataFrame(rows)


def corpus_shuffle(sf_dir: str, bucket_bits: int = 8):
    """Deterministic global training-order shuffle with CONTIGUOUS ranks:
    order docs by (whole-text content hash, doc_id) — the reshard-stable
    "random" permutation used to fix an LLM data order.  NO corpus-wide
    ``ds.sort``: the hash's top bits give ordered buckets, pass A reduces
    a bucket histogram (the only driver materialization), the exclusive
    prefix offsets broadcast via ``ray.put``, and pass B finishes each
    bucket locally (one groupby, local sort, rank = offset + local idx).
    ``bucket_bits`` scales bucket count to the cluster."""
    import ray
    from ray.data.aggregate import Sum

    shift = np.uint64(64 - bucket_bits)

    def add_hash(batch: pa.Table) -> pa.Table:
        h, offs = rolling_window_hashes(batch["text"], k=1 << 31)
        out = np.zeros(len(offs) - 1, np.uint64)
        out[np.diff(offs) > 0] = h  # empty docs hash to 0
        ids = batch["doc_id"]
        return pa.table(
            {
                "doc_id": ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids,
                "hv": pa.array(out, pa.uint64()),
                "hb": pa.array((out >> shift).astype(np.int64), pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    def partial_counts(batch: pa.Table) -> pa.Table:
        g = batch.select(["hb"]).group_by("hb").aggregate([([], "count_all")])
        return g.rename_columns(["hb", "c"])

    hist = (
        hashed.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("hb")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("hb")
    )
    offsets = np.zeros(1 << bucket_bits, np.int64)
    bs = hist["hb"].to_numpy(np.int64)
    cs = hist["c"].to_numpy(np.int64)
    offsets[bs] = np.cumsum(cs) - cs
    off_ref = ray.put(offsets)

    def rank_bucket(group: pa.Table) -> pa.Table:
        hv = group["hv"].to_numpy(zero_copy_only=False)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, hv))
        off = int(ray.get(off_ref)[int(group["hb"][0].as_py())])
        rank = np.empty(len(order), np.int64)
        rank[order] = off + np.arange(len(order), dtype=np.int64)
        return pa.table(
            {
                "doc_id": group["doc_id"],
                "shuffle_rank": pa.array(rank, pa.int64()),
            }
        )

    return hashed.groupby("hb").map_groups(rank_bucket, batch_format="pyarrow")


def doc_chunk(sf_dir: str, size: int = 32, stride: int = 24):
    """Fixed-token-window chunking with overlap (LLM pre-training prep):
    one row per 32-word window starting every 24 words.  A row-expanding
    ``map_batches`` — each doc's chunks are produced inside its own
    batch, no shuffle, no per-row Python (one Arrow split + numpy window
    arithmetic + one vectorized gather/join per batch)."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import chunk_docs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        chunk_docs, fn_kwargs={"size": size, "stride": stride}, batch_format="pyarrow"
    )


def _contamination_apply(batch: pa.Table, bench_ref=None, n: int = 8) -> pa.Table:
    # NOTE: contamination_counts is imported at module level on purpose —
    # worker-executed runtime `from arcane_...` imports break under a
    # foreign cwd (by-value registration doesn't cover name-based imports)
    keep = (batch["doc_id"].to_numpy(zero_copy_only=False) % 10) != 7
    return contamination_counts(batch.filter(pa.array(keep)), bench_ref=bench_ref, n=n)


def decontaminate(sf_dir: str, n: int = 8):
    """Benchmark decontamination (GPT-3 §C-style n-gram overlap): flag
    every training doc sharing a word-8-gram with the held-out benchmark
    slice (here: doc_id % 10 == 7 stands in for the benchmark corpus).

    Scale shape: the benchmark side is tiny by definition — its distinct
    gram hashes are reduced once and broadcast via ``ray.put`` (sorted
    uint64 array, plasma-local per worker); the corpus side streams
    through one ``searchsorted`` per batch.  No shuffle anywhere."""
    import ray

    from arcane_stream_sqlserver_change_tracking_ray.functions.text import (
        bench_gram_table,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_grams(batch: pa.Table) -> pa.Table:
        keep = (batch["doc_id"].to_numpy(zero_copy_only=False) % 10) == 7
        return bench_gram_table(batch.filter(pa.array(keep)), n=n)

    gh = (
        ds.map_batches(bench_grams, batch_format="pyarrow")
        .to_pandas()["gh"]
        .to_numpy(dtype=np.uint64)
    )
    bench_ref = ray.put(np.unique(gh))
    return ds.map_batches(
        _contamination_apply,
        fn_kwargs={"bench_ref": bench_ref, "n": n},
        batch_format="pyarrow",
    )


def length_quantiles(sf_dir: str):
    """Exact distributed quantiles of the per-doc whitespace token count
    (p25/p50/p75/p90/p99 by the rank rule ``value at row ceil(p*n/100)``
    of the sorted counts).  Shape: per-batch value-count partials →
    groupby over DISTINCT count values (a shuffle of the value histogram,
    not the corpus) → driver-side cumsum over the histogram.  The only
    materialization is the histogram (cardinality = distinct lengths)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    t = ds.map_batches(TokenCountStage(), batch_format="pyarrow")

    def partial_counts(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["n_tokens_ws"])
            .group_by("n_tokens_ws")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["v", "c"])

    hist = (
        t.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("v")
    )
    v = hist["v"].to_numpy(np.int64)
    cum = np.cumsum(hist["c"].to_numpy(np.int64))
    n = int(cum[-1]) if len(cum) else 0
    row: dict[str, int] = {"n_docs": n}
    for p in (25, 50, 75, 90, 99):
        rank = (p * n + 99) // 100
        row[f"p{p}"] = int(v[np.searchsorted(cum, rank)]) if n else 0
    return pd.DataFrame([row])


def url_normalize(sf_dir: str):
    """URL canonicalization over the web corpus — the key-normalization
    step in front of the url-keyed CDC merge (lowercase scheme/host,
    strip www. and default port, drop tracking params + fragment).
    Embarrassingly parallel Arrow re2 kernels; the synthetic messy url
    is built deterministically from (source, doc_id, lang) because the
    test corpus carries no url column."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.web import (
        normalize_urls,
        synth_urls,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "lang"])

    def norm(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("url", synth_urls(batch))
        return normalize_urls(batch).select(
            ["doc_id", "url", "url_norm", "host", "path"]
        )

    return ds.map_batches(norm, batch_format="pyarrow")


def domain_stats(sf_dir: str):
    """Per-domain corpus statistics (docs + chars per registered host):
    the standard crawl-health rollup.  Pre-aggregated inside each batch
    (partial count/sum per host) before the global groupby, so only
    (host, n, chars) rows — domain cardinality, not corpus cardinality —
    ever shuffle."""
    from ray.data.aggregate import Sum

    from arcane_stream_sqlserver_change_tracking_ray.functions.web import (
        normalize_urls,
        synth_urls,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("url", synth_urls(batch))
        t = normalize_urls(batch).select(["host", "n_chars"])
        g = t.group_by("host").aggregate([([], "count_all"), ("n_chars", "sum")])
        return g.rename_columns(["host", "n", "chars"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("n", alias_name="n_docs"), Sum("chars", alias_name="sum_chars"))
    )


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Gap-based session windows over the event stream (the classic
    streaming-window operator): one groupby co-locates each user's
    events, the per-group kernel sorts by (ts, event_id) and cuts a new
    session when the gap exceeds 30 minutes.  The shuffle moves only
    (event_id, user_id, ts) — payload columns are pruned at the read."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import (
        sessionize_user,
    )

    gap_us = gap_minutes * 60 * 1_000_000
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def per_user(group: pa.Table) -> pa.Table:
        return sessionize_user(group, gap_us)

    return ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def session_stats(sf_dir: str, gap_minutes: int = 30):
    """Per-session rollups on top of gap-based sessionization: one
    co-shuffle of the pruned (event_id, ts, user_id) columns, then a
    single vectorized sort + run-length pass per user resolves session
    cuts AND their aggregates (count, span) — sessions never exist as
    intermediate rows."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import session_cuts

    gap_us = gap_minutes * 60 * 1_000_000
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def per_user(group: pa.Table) -> pa.Table:
        g, ts, new = session_cuts(group, gap_us)
        n = len(ts)
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, n])
        ends = np.r_[starts[1:], n] - 1
        return pa.table(
            {
                "user_id": pa.array(
                    np.full(len(starts), g["user_id"][0].as_py(), np.int64)
                ),
                "session_id": pa.array(np.arange(1, len(starts) + 1, dtype=np.int64)),
                "n_events": pa.array(counts.astype(np.int64)),
                "start_ts": pa.array(ts[starts].view("datetime64[us]")),
                "end_ts": pa.array(ts[ends].view("datetime64[us]")),
                "duration_us": pa.array(ts[ends] - ts[starts]),
            }
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def length_percentile_filter(sf_dir: str, lo_p: int = 5, hi_p: int = 95):
    """Length-outlier filtering (the classic webtext drop rule): keep
    docs whose n_chars lies within the corpus's exact [p05, p95].
    Two streaming passes over a 2-column projection: pass 1 builds the
    length HISTOGRAM (per-batch value-count partials, a groupby over
    distinct lengths only), thresholds come from a driver-side cumsum
    over that tiny table; pass 2 filters with the broadcast scalars.
    Same rank rule as length_quantiles (value at row ceil(p*n/100))."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        g = batch.select(["n_chars"]).group_by("n_chars").aggregate([([], "count_all")])
        return g.rename_columns(["v", "c"])

    hist = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("v")
    )
    v = hist["v"].to_numpy(np.int64)
    cum = np.cumsum(hist["c"].to_numpy(np.int64))
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()), "n_chars": pa.array([], pa.int64())})
    lo = int(v[np.searchsorted(cum, (lo_p * n + 99) // 100)])
    hi = int(v[np.searchsorted(cum, (hi_p * n + 99) // 100)])

    def keep(batch: pa.Table) -> pa.Table:
        c = batch["n_chars"]
        return batch.filter(
            pc.and_(
                pc.greater_equal(c, pa.scalar(lo, pa.int64())),
                pc.less_equal(c, pa.scalar(hi, pa.int64())),
            )
        )

    return ds.map_batches(keep, batch_format="pyarrow")


def pii_redact(sf_dir: str):
    """PII scrub (C4/CCNet-style): plant a deterministic contact block
    per document (the corpus itself carries no PII), then mask emails /
    IPv4s / phone-like runs with typed placeholders and count each
    class.  Arrow and DuckDB both run RE2, so the oracle's nested
    regexp_replace reproduces the redacted text byte-for-byte."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import (
        PiiRedactStage,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        aug = pc.binary_join_element_wise(
            batch["text"],
            " contact user",
            pa.array(ids.astype("U"), pa.string()),
            "@example.com or call +1 555 000 ",
            pa.array((ids % 10000).astype("U"), pa.string()),
            " from ",
            pa.array((ids % 256).astype("U"), pa.string()),
            ".0.0.1",
            "",
        )
        return pa.table({"doc_id": batch["doc_id"].combine_chunks(), "text": aug})

    stage = PiiRedactStage()
    return (
        ds.map_batches(augment, batch_format="pyarrow")
        .map_batches(stage, batch_format="pyarrow")
        .select_columns(["doc_id", "n_email", "n_ipv4", "n_phone", "text_redacted"])
    )


def lang_id(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(LangIdStage(), batch_format="pyarrow").select_columns(
        ["doc_id", "lang_pred"]
    )


def doc_fingerprint(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(FingerprintStage(), batch_format="pyarrow").select_columns(
        ["doc_id", "fingerprint"]
    )


def topk_tokens(sf_dir: str):
    """flat_map tokens -> per-batch partial counts (vectorized Arrow
    group_by combiner) -> global groupby sum -> deterministic top-20."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", columns=["text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        return token_count_partials(batch["text"])

    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    return counts.sort(["cnt", "token"], descending=[True, False]).limit(20)