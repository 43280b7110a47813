"""Unit tests for the curation/web kernels added in round 2: chunking,
benchmark decontamination, URL canonicalization, exact quantiles.

Each kernel is checked against a plain-Python reference on planted
inputs (boundary/edge cases the sf-corpora don't exercise), and the
hash path is checked for cross-process stability (a Ray task must
produce the same gram hashes the driver does, or the decontamination
broadcast silently finds nothing)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from arcane_stream_sqlserver_change_tracking_ray.functions.text import (
    chunk_docs,
    contamination_counts,
    word_ngram_hashes,
)
from arcane_stream_sqlserver_change_tracking_ray.functions.web import (
    normalize_urls,
)


def _py_chunks(text: str, size: int, stride: int):
    words = text.split(" ")
    out = []
    st = 0
    while True:
        w = words[st : st + size]
        out.append((st // stride, len(w), " ".join(w)))
        st += stride
        if st >= len(words):
            break
    return out


def test_chunk_docs_boundaries():
    docs = [
        "a b c d e",          # 5 words, size 3 stride 2 -> [0:3],[2:5],[4:5]
        "x",                  # single word -> one chunk
        "",                   # empty doc -> one chunk of one empty word
        " ".join(f"w{i}" for i in range(7)),  # exact multiple boundary
    ]
    batch = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs)})
    got = chunk_docs(batch, size=3, stride=2).to_pylist()
    exp = []
    for i, d in enumerate(docs):
        for idx, n, chunk in _py_chunks(d, 3, 2):
            exp.append({"doc_id": i, "chunk_idx": idx, "n_words": n, "chunk": chunk})
    assert got == exp
    # the empty doc contributes exactly one chunk whose word is ""
    empty = [r for r in got if r["doc_id"] == 2]
    assert empty == [{"doc_id": 2, "chunk_idx": 0, "n_words": 1, "chunk": ""}]


def test_chunk_docs_overlap_covers_every_word():
    rng = np.random.default_rng(7)
    docs = [" ".join(f"t{rng.integers(0, 50)}" for _ in range(int(n)))
            for n in rng.integers(1, 120, size=40)]
    batch = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs)})
    got = chunk_docs(batch, size=32, stride=24).to_pandas()
    for i, d in enumerate(docs):
        rows = got[got.doc_id == i].sort_values("chunk_idx")
        ref = _py_chunks(d, 32, 24)
        assert list(zip(rows.chunk_idx, rows.n_words, rows.chunk)) == ref


def test_contamination_planted_pairs():
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = pa.table({
        "doc_id": pa.array([7, 3, 4, 5], pa.int64()),
        "text": pa.array([
            bench_text,                                          # benchmark doc
            "x y " + bench_text + " z",  # contains benchmark 8-grams
            "totally different words with no overlap here at all present",
            "short doc",                                         # < 8 words
        ]),
    })
    bench_mask = (corpus["doc_id"].to_numpy() % 10) == 7
    h, _ = word_ngram_hashes(corpus.filter(pa.array(bench_mask))["text"], 8)
    bench = np.unique(h)
    rest = corpus.filter(pa.array(~bench_mask))
    got = {r["doc_id"]: (r["n_contaminated"], r["contaminated"])
           for r in contamination_counts(rest, bench_ref=bench, n=8).to_pylist()}
    # doc 3 embeds the full 10-word benchmark text -> its 3 inner 8-grams
    # are exactly the benchmark's 3 distinct 8-grams
    assert got[3] == (3, 1)
    assert got[4] == (0, 0)
    assert got[5] == (0, 0)


def test_gram_hashes_stable_across_ray_tasks():
    import ray

    texts = pa.array(["the quick brown fox jumps over the lazy dog today",
                      "pack my box with five dozen liquor jugs now then"])
    local, _ = word_ngram_hashes(texts, 8)

    @ray.remote
    def remote_hashes():
        t = pa.array(["the quick brown fox jumps over the lazy dog today",
                      "pack my box with five dozen liquor jugs now then"])
        h, _ = word_ngram_hashes(t, 8)
        return h

    remote = ray.get(remote_hashes.remote())
    assert np.array_equal(local, remote)


def test_normalize_urls_corner_cases():
    urls = [
        "HTTPS://WWW.Example.COM:443/A/B?utm_source=x&id=1&ref=z#frag",
        "http://Example.com:80/",           # default http port dropped
        "http://example.com:8080/p",        # non-default port kept
        "https://sub.www.example.com/q",    # only a LEADING www. strips
        "https://example.com",              # empty path -> '/'
        "https://example.com/x?utm_a=1&ref=2",  # all params tracking -> no '?'
    ]
    batch = pa.table({"url": pa.array(urls)})
    out = normalize_urls(batch).to_pylist()
    assert [r["url_norm"] for r in out] == [
        "https://example.com/A/B?id=1",
        "http://example.com/",
        "http://example.com:8080/p",
        "https://sub.www.example.com/q",
        "https://example.com/",
        "https://example.com/x",
    ]
    assert [r["host"] for r in out] == [
        "example.com", "example.com", "example.com",
        "sub.www.example.com", "example.com", "example.com",
    ]
    assert out[0]["path"] == "/A/B" and out[4]["path"] == "/"


def test_length_quantiles_rank_rule():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    got = E.length_quantiles("/root/testdata/sf0.001")
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    counts = np.sort(docs["text"].str.count(r"\S+").to_numpy(np.int64))
    n = len(counts)
    assert got["n_docs"].iloc[0] == n
    for p in (25, 50, 75, 90, 99):
        rank = (p * n + 99) // 100
        assert got[f"p{p}"].iloc[0] == counts[rank - 1], p


def _py_span_dedup(docs, window):
    """Plain-Python reference: corpus-wide first occurrence by (doc, cidx)."""
    chunks = []  # (doc_i, cidx, chunk)
    for i, text in docs:
        words = text.split(" ")
        st = 0
        ci = 0
        while True:
            chunks.append((i, ci, " ".join(words[st : st + window])))
            st += window
            ci += 1
            if st >= len(words):
                break
    first = {}
    for i, ci, ch in sorted(chunks):
        if ch not in first:
            first[ch] = (i, ci)
    out = {}
    for i, text in docs:
        kept, dropped, n = [], 0, 0
        words = text.split(" ")
        st, ci = 0, 0
        while True:
            ch = " ".join(words[st : st + window])
            n += 1
            if first[ch] == (i, ci):
                kept.append(ch)
            else:
                dropped += 1
            st += window
            ci += 1
            if st >= len(words):
                break
        out[i] = (n, dropped, " ".join(kept))
    return out


def test_span_dedup_planted():
    import ray.data

    from arcane_stream_sqlserver_change_tracking_ray.functions.dedup import span_dedup

    boiler = " ".join(f"b{i}" for i in range(4))  # a 4-word chunk (window=4)
    body_a = " ".join(f"a{i}" for i in range(4))
    body_b = " ".join(f"c{i}" for i in range(4))
    docs = [
        (0, boiler + " " + body_a + " " + boiler),   # within-doc repeat
        (1, boiler + " " + body_b),                  # cross-doc repeat of chunk 0
        (2, "tiny"),                                 # shorter than window
        (3, ""),                                     # empty doc
        (4, ""),                                     # duplicate empty doc
        (5, body_b + " tail words here"),            # cross-doc repeat, partial tail
    ]
    tbl = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": pa.array([t for _, t in docs])})
    got = {r["doc_id"]: (r["n_chunks"], r["n_dropped"], r["text_dedup"])
           for r in span_dedup(ray.data.from_arrow(tbl), window=4).take_all()}
    exp = _py_span_dedup(docs, 4)
    assert got == exp
    # the planted facts themselves
    assert got[0] == (3, 1, boiler + " " + body_a)   # second boiler dropped
    assert got[1][1] == 1 and got[1][2] == body_b     # cross-doc boiler dropped
    assert got[3] == (1, 0, "")                       # first empty kept
    assert got[4] == (1, 1, "")                       # duplicate empty dropped


def test_span_dedup_batch_split_invariant():
    import ray.data

    from arcane_stream_sqlserver_change_tracking_ray.functions.dedup import span_dedup

    rng = np.random.default_rng(11)
    base = [" ".join(f"w{rng.integers(0, 30)}" for _ in range(int(n)))
            for n in rng.integers(1, 80, size=60)]
    texts = base + base[:10]  # plant exact dups
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    a = sorted(map(tuple, span_dedup(
        ray.data.from_arrow(tbl), window=8).to_pandas().values.tolist()))
    b = sorted(map(tuple, span_dedup(
        ray.data.from_arrow(tbl).repartition(13), window=8).to_pandas().values.tolist()))
    assert a == b
    exp = _py_span_dedup(list(enumerate(texts)), 8)
    got = {r[0]: (r[1], r[2], r[3]) for r in a}
    assert got == exp


def test_asof_join_tie_and_miss_semantics():
    import ray.data

    from arcane_stream_sqlserver_change_tracking_ray.functions.join import asof_join

    def _ts(vals):
        return pa.array([v * 1_000_000 for v in vals], pa.int64()).cast(
            pa.timestamp("us")
        )

    left = pa.table({
        "event_id": pa.array([100, 101, 102, 103], pa.int64()),
        "user_id": pa.array([1, 1, 2, 3], pa.int64()),
        "ts": _ts([10, 5, 10, 10]),
    })
    right = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        # user 1: two purchases at ts=5 (tie -> max event_id), one later
        "ts": _ts([5, 5, 20, 30]),
        "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
    })
    out = asof_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        key_col="user_id",
        ts_col="ts",
        tie_col="event_id",
        payload_cols=["event_id", "value"],
        num_buckets=4,
    ).to_pandas().set_index("event_id")
    # click@10 for user1: latest purchase <= 10 is the ts=5 tie -> id 2
    assert out.loc[100, "matched_event_id"] == 2 and out.loc[100, "matched_value"] == 2.0
    # click@5 same-ts purchases DO match (backward-inclusive), tie -> id 2
    assert out.loc[101, "matched_event_id"] == 2
    # user2's only purchase is at ts=30 > 10 -> no match
    assert pd.isna(out.loc[102, "matched_event_id"])
    # user3 has no purchases at all -> no match
    assert pd.isna(out.loc[103, "matched_event_id"])


def test_corpus_shuffle_rank_is_total_and_reshard_stable():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    a = E.corpus_shuffle("/root/testdata/sf0.001").to_pandas()
    # a total contiguous permutation
    assert sorted(a.shuffle_rank) == list(range(len(a)))
    # reshard-stable: a second run over the same input is identical
    b = E.corpus_shuffle("/root/testdata/sf0.001", bucket_bits=4).to_pandas()
    am = a.sort_values("doc_id").reset_index(drop=True)
    bm = b.sort_values("doc_id").reset_index(drop=True)
    assert (am.shuffle_rank == bm.shuffle_rank).all()
    # and it is not the identity order (it actually shuffles)
    assert (am.shuffle_rank.to_numpy() != np.arange(len(am))).any()


def test_domain_temperature_sample_quota_rule():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    out = E.domain_temperature_sample("/root/testdata/sf0.001").to_pandas()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    counts = docs.groupby("source").size()
    for src, grp in out.groupby("source"):
        k = int(np.floor(np.sqrt(counts[src])))
        assert len(grp) == k, src                       # exact quota
        assert sorted(grp.rnk) == list(range(1, k + 1))  # dense ranks
        assert grp.doc_id.isin(docs[docs.source == src].doc_id).all()


def test_hopping_window_covers_each_event_twice():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    hop = E.hopping_window("/root/testdata/sf0.001").to_pandas()
    tum = E.windowed_agg("/root/testdata/sf0.001").to_pandas()
    # every event lands in exactly two hopping windows
    assert hop.n.sum() == 2 * tum.n.sum()
    # a hopping window [w, w+2h) = tumbling(w) + tumbling(w+1h)
    t = tum.set_index(["event_type", "w"]).n
    for _, r in hop.sample(50, random_state=0).iterrows():
        expect = t.get((r.event_type, r.w), 0) + t.get(
            (r.event_type, r.w + pd.Timedelta(hours=1)), 0
        )
        assert r.n == expect


def _write_docs(tmp_path, texts):
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["srcT"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_inverted_index_df_exact_postings_capped(tmp_path):
    """70 docs share one token: df stays exact (70) while the posting
    list is capped at the first 64 ids; df-1 tokens are dropped and a
    df-2 token keeps both ids in order."""
    import __ray_entry__ as E

    texts = [f"shared uniq{i}a uniq{i}b" for i in range(70)]
    texts[3] = texts[3] + " twice"
    texts[5] = texts[5] + " twice"
    sf = _write_docs(tmp_path, texts)
    out = E.queries()["inverted_index"](sf).to_pandas().set_index("token")
    assert int(out.loc["shared", "df"]) == 70
    assert out.loc["shared", "postings"] == ",".join(str(i) for i in range(64))
    assert int(out.loc["twice", "df"]) == 2
    assert out.loc["twice", "postings"] == "3,5"
    assert "uniq0a" not in out.index  # min_df=2 filter


def test_dedup_keep_best_longest_wins(tmp_path):
    """Near-dup cluster keeps the LONGEST member; singletons keep
    themselves; exact-duplicate tie breaks to the min doc_id."""
    import __ray_entry__ as E

    base = " ".join(f"w{i}" for i in range(20))
    texts = [
        base,                    # 0: near-dup of 1 (shorter)
        base + " extraword",     # 1: longest in cluster -> winner
        "completely different words " + " ".join(f"q{i}" for i in range(16)),  # 2: singleton
    ]
    sf = _write_docs(tmp_path, texts)
    out = E.queries()["dedup_keep_best"](sf).to_pandas()
    winners = {int(r.cluster_id): int(r.doc_id) for r in out.itertuples()}
    assert winners[0] == 1    # cluster {0,1} labeled min-id 0, keeps doc 1
    assert winners[2] == 2    # singleton
    assert len(out) == 2
