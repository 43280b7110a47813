"""Self-oracle correctness tests for the rows-only training-data
operators: planted-duplicate corpora with brute-force ground truth.

Round-1 verdict: these operators were smoke-tested only (row counts).
Each test here would fail on an off-by-one in shingling, banding,
hashing or verification:

- MinHash+LSH: reported Jaccard values must EQUAL the exact n-gram
  Jaccard (the verification stage is exact); recall of high-similarity
  planted pairs must be total at the banding parameters used.
- SimHash 4x16 banding is a pigeonhole GUARANTEE for hamming <= 3:
  the result must equal the brute-force pair set exactly.
- Fingerprints must be invariant to batch splitting (including the
  sliced-buffer path) and doc order.
- LSH ANN recall is measured against the brute-force top-k.
- The fake multimodal decode must be deterministic and split-invariant.
"""

import numpy as np
import pyarrow as pa
import pytest

from arcane_stream_sqlserver_change_tracking_ray.functions.dedup import (
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    ngram_jaccard_matrix,
    popcount64,
    simhash_dedup_pairs,
    simhash_signatures,
)
from arcane_stream_sqlserver_change_tracking_ray.functions.multimodal import (
    DecodeImageStage,
    FeatureExtractStage,
    FrameSampleStage,
)
from arcane_stream_sqlserver_change_tracking_ray.functions.similarity import (
    brute_force_topk,
    embedding_neardup_pairs,
    lsh_topk,
)
from arcane_stream_sqlserver_change_tracking_ray.functions.text import (
    FingerprintStage,
    rolling_window_hashes,
)


# ---------------------------------------------------------------------------
# planted corpus
# ---------------------------------------------------------------------------
def planted_corpus(n_base=60, n_dups=12, seed=7):
    """Deterministic corpus: *n_base* random 40-word docs plus *n_dups*
    near-duplicates (1-3 word substitutions of base docs).  Returns
    (table, planted_pairs)."""
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:03d}" for i in range(300)], dtype=object)
    texts = [" ".join(rng.choice(vocab, size=40, replace=True)) for _ in range(n_base)]
    pairs = []
    for j in range(n_dups):
        words = texts[j].split()
        k = 1 + j % 3
        for t in rng.choice(len(words), size=k, replace=False):
            words[t] = "z" + words[t]
        texts.append(" ".join(words))
        pairs.append((j, n_base + j))
    tbl = pa.table(
        {"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)), "text": texts}
    )
    return tbl, pairs


def _pairs_set(df):
    return {(int(a), int(b)) for a, b in zip(df["id_a"], df["id_b"])}


@pytest.fixture(scope="module")
def corpus():
    tbl, planted = planted_corpus()
    truth = ngram_jaccard_matrix(tbl["text"], k_shingle=3)  # exact all-pairs
    return tbl, planted, truth


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def test_minhash_verified_jaccard_is_exact(corpus):
    """Every reported pair's jaccard equals the brute-force n-gram
    Jaccard bit-for-bit, and every reported pair clears the threshold:
    the distributed join-by-id verification is exact."""
    import ray.data

    tbl, _, truth = corpus
    ds = ray.data.from_arrow(tbl)
    out = minhash_dedup_pairs(ds, threshold=0.5).to_pandas()
    assert len(out) > 0
    for a, b, j in zip(out["id_a"], out["id_b"], out["jaccard"]):
        assert a < b
        assert j >= 0.5
        assert j == truth[int(a), int(b)]


def test_minhash_recall_of_planted_dups(corpus):
    """All planted pairs with true jaccard >= 0.85 are found at
    threshold 0.8 (detection probability at s=0.85 with 16 bands of 4
    rows is 1 - (1-0.85^4)^16 > 0.9999)."""
    import ray.data

    tbl, planted, truth = corpus
    must_find = {(a, b) for a, b in planted if truth[a, b] >= 0.85}
    assert must_find, "corpus must plant at least one high-sim pair"
    ds = ray.data.from_arrow(tbl)
    found = _pairs_set(minhash_dedup_pairs(ds, threshold=0.8).to_pandas())
    assert must_find <= found
    # and nothing below the threshold sneaks in
    for a, b in found:
        assert truth[a, b] >= 0.8


def test_minhash_no_candidates_no_crash():
    import ray.data

    tbl = pa.table(
        {"doc_id": pa.array([0, 1], pa.int64()),
         "text": ["alpha beta gamma delta epsilon", "one two three four five"]}
    )
    out = minhash_dedup_pairs(ray.data.from_arrow(tbl), threshold=0.8).to_pandas()
    assert len(out) == 0


def test_minhash_band_bucket_cap(caplog):
    """An adversarial bucket (many identical docs) is capped with a
    LOGGED truncation, bounding the O(n²) pair emission."""
    import logging

    import ray.data

    n = 12
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": ["same words repeated here for everyone always forever"] * n,
        }
    )
    with caplog.at_level(logging.WARNING, logger="arcane_ray.dedup"):
        out = (
            minhash_lsh_candidates(ray.data.from_arrow(tbl), max_bucket=5)
            .to_pandas()
        )
    # capped: at most C(5,2)=10 pairs (not C(12,2)=66)
    assert len(out) <= 10


# ---------------------------------------------------------------------------
# SimHash: pigeonhole banding is exact for hamming <= 3
# ---------------------------------------------------------------------------
def test_simhash_equals_bruteforce():
    import ray.data

    # simhash needs CLOSER dups than the minhash corpus (hamming <= 3 of
    # 64 bits is strict): 200-word docs with a single word substituted
    rng = np.random.default_rng(7)
    vocab = np.array([f"w{i:03d}" for i in range(300)], dtype=object)
    texts = [" ".join(rng.choice(vocab, size=200)) for _ in range(30)]
    for j in range(8):
        w = texts[j].split()
        w[j * 3 % len(w)] = "zz" + w[j * 3 % len(w)]
        texts.append(" ".join(w))
    tbl = pa.table(
        {"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)), "text": texts}
    )
    sig = simhash_signatures(tbl["text"], k_shingle=3)
    n = len(sig)
    ia, ib = np.triu_indices(n, k=1)
    ham = popcount64(np.ascontiguousarray(sig[ia] ^ sig[ib]))
    expected = {
        (int(a), int(b), int(h))
        for a, b, h in zip(ia[ham <= 3], ib[ham <= 3], ham[ham <= 3])
    }
    ds = ray.data.from_arrow(tbl)
    out = simhash_dedup_pairs(ds, max_hamming=3).to_pandas()
    got = {
        (int(a), int(b), int(h))
        for a, b, h in zip(out["id_a"], out["id_b"], out["hamming"])
    }
    assert got == expected
    assert expected, "corpus must contain at least one simhash near-dup"


# ---------------------------------------------------------------------------
# fingerprint: split/order invariance incl. the sliced-buffer path
# ---------------------------------------------------------------------------
def _fingerprints(tbl):
    return FingerprintStage()(tbl)["fingerprint"].to_numpy(zero_copy_only=False)


def test_fingerprint_split_invariance(corpus):
    tbl, _, _ = corpus
    whole = _fingerprints(tbl)
    # batch splits (sliced tables -> array offset != 0, text.py fallback)
    parts = [
        _fingerprints(tbl.slice(0, 17)),
        _fingerprints(tbl.slice(17, 30)),
        _fingerprints(tbl.slice(47)),
    ]
    np.testing.assert_array_equal(np.concatenate(parts), whole)


def test_fingerprint_sliced_array_path(corpus):
    """rolling_window_hashes on a SLICED array (buffer offset != 0) must
    equal the same docs' windows from the unsliced run."""
    tbl, _, _ = corpus
    texts = tbl["text"].combine_chunks()
    h_full, offs_full = rolling_window_hashes(texts, k=16)
    sl = texts.slice(5, 20)
    assert sl.offset != 0
    h_sl, offs_sl = rolling_window_hashes(sl, k=16)
    lo, hi = offs_full[5], offs_full[25]
    np.testing.assert_array_equal(h_sl, h_full[lo:hi])
    np.testing.assert_array_equal(offs_sl, offs_full[5:26] - offs_full[5])


def test_fingerprint_order_invariance(corpus):
    """A doc's fingerprint is a pure function of its text — reordering
    the corpus permutes but never changes values."""
    tbl, _, _ = corpus
    perm = np.random.default_rng(3).permutation(tbl.num_rows)
    shuffled = tbl.take(pa.array(perm))
    np.testing.assert_array_equal(_fingerprints(shuffled), _fingerprints(tbl)[perm])


def test_fingerprint_short_docs():
    """Docs shorter than the window get the whole-text hash; empty and
    null-ish docs do not crash and are deterministic."""
    tbl = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()),
         "text": ["tiny", "", "exactly sixteen b"]}
    )
    a = _fingerprints(tbl)
    b = _fingerprints(tbl)
    np.testing.assert_array_equal(a, b)
    assert len(set(a.tolist())) == 3


# ---------------------------------------------------------------------------
# ANN: LSH recall vs brute force
# ---------------------------------------------------------------------------
def _embeddings_table(n=400, d=32, seed=11):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    flat = pa.array(x.reshape(-1))
    offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
    return (
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.ListArray.from_arrays(offsets, flat),
            }
        ),
        x,
    )


def test_lsh_topk_recall_vs_bruteforce():
    import ray.data

    tbl, x = _embeddings_table()
    queries = x[:3].astype(np.float64)
    ds = ray.data.from_arrow(tbl)
    brute = brute_force_topk(ds, queries, k=10).to_pandas()
    lsh = lsh_topk(ds, queries, k=10, planes=8, probe_radius=2).to_pandas()
    recalls = []
    for q in range(3):
        b = set(brute[brute.query_id == q]["vec_id"])
        l = set(lsh[lsh.query_id == q]["vec_id"])
        recalls.append(len(b & l) / len(b))
    # probe radius 2 over 8 planes scans ~37/256 buckets; recall is
    # corpus-dependent but must stay well above random (10/400 = 2.5%)
    assert min(recalls) >= 0.3
    assert sum(recalls) / len(recalls) >= 0.5


def test_lsh_topk_prebucketed_equals_inline():
    """The persisted-index path (bucketize once, search many) returns the
    same result as inline bucket assignment with the same planes/seed."""
    import ray.data

    from arcane_stream_sqlserver_change_tracking_ray.functions.similarity import (
        bucketize_embeddings,
    )

    tbl, x = _embeddings_table(n=200, d=16, seed=9)
    queries = x[:2].astype(np.float64)
    ds = ray.data.from_arrow(tbl)
    inline = (
        lsh_topk(ds, queries, k=5, planes=6, probe_radius=1, seed=3)
        .to_pandas().sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    )
    indexed = bucketize_embeddings(ds, planes=6, seed=3)
    pre = (
        lsh_topk(indexed, queries, k=5, planes=6, probe_radius=1, seed=3)
        .to_pandas().sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(inline, pre)


def test_rademacher_bucketing_exact_and_recall():
    """The oracle-able LSH variant: ±1 planes over fixed-point quantized
    embeddings — buckets must equal an independent integer recompute,
    and recall stays comparable to the gaussian path."""
    import ray.data

    from arcane_stream_sqlserver_change_tracking_ray.functions.similarity import (
        bucket_of_int,
        quantize_embeddings,
        rademacher_planes,
    )

    tbl, x = _embeddings_table()
    pl = rademacher_planes(x.shape[1], 8, 42)
    assert set(np.unique(pl)) == {-1, 1}
    # independent recompute: per-row Python-int dot (no numpy overflow
    # semantics), sign, bit-pack
    q = quantize_embeddings(x)
    expect = []
    for row in q:
        b = 0
        for p in range(8):
            dot = sum(int(v) * int(s) for v, s in zip(row, pl[:, p]))
            if dot > 0:
                b |= 1 << p
        expect.append(b)
    assert bucket_of_int(x, pl).tolist() == expect

    queries = x[:3].astype(np.float64)
    ds = ray.data.from_arrow(tbl)
    brute = brute_force_topk(ds, queries, k=10).to_pandas()
    lsh = lsh_topk(
        ds, queries, k=10, planes=8, probe_radius=2, plane_kind="rademacher"
    ).to_pandas()
    recalls = []
    for qi in range(3):
        b = set(brute[brute.query_id == qi]["vec_id"])
        l = set(lsh[lsh.query_id == qi]["vec_id"])
        recalls.append(len(b & l) / len(b))
    assert min(recalls) >= 0.3


def test_embedding_neardup_planted():
    """Planted near-identical vectors are found with exact cosines."""
    import ray.data

    tbl, x = _embeddings_table(n=80, d=16, seed=5)
    rng = np.random.default_rng(6)
    dup = x[:8] + 0.005 * rng.standard_normal((8, 16)).astype(np.float32)
    n, d = x.shape
    allx = np.concatenate([x, dup])
    flat = pa.array(allx.reshape(-1))
    offsets = pa.array(np.arange(0, (len(allx) + 1) * d, d, dtype=np.int32))
    tbl2 = pa.table(
        {
            "vec_id": pa.array(np.arange(len(allx), dtype=np.int64)),
            "embedding": pa.ListArray.from_arrays(offsets, flat),
        }
    )
    planted = {(i, n + i) for i in range(8)}
    out = embedding_neardup_pairs(
        ray.data.from_arrow(tbl2), threshold=0.99, planes=4
    ).to_pandas()
    found = _pairs_set(out)
    assert planted <= found
    # reported cosines match brute force
    xn = allx / np.linalg.norm(allx, axis=1, keepdims=True)
    for a, b, c in zip(out["id_a"], out["id_b"], out["cosine"]):
        assert c == pytest.approx(round(float(xn[int(a)] @ xn[int(b)]), 6), abs=2e-6)
        assert c >= 0.99


# ---------------------------------------------------------------------------
# multimodal: golden fake-decode values + split invariance
# ---------------------------------------------------------------------------
def _media_table(payloads):
    return pa.table(
        {
            "media_id": pa.array(np.arange(len(payloads), dtype=np.int64)),
            "media": pa.array(payloads, pa.binary()),
        }
    )


def test_multimodal_decode_deterministic_and_split_invariant():
    payloads = [f"payload-{i}".encode() * (i + 1) for i in range(20)]
    tbl = _media_table(payloads)
    stage = DecodeImageStage()
    whole = stage(tbl)
    again = DecodeImageStage()(tbl)
    assert whole.equals(again)
    parts = pa.concat_tables([stage(tbl.slice(0, 7)), stage(tbl.slice(7))])
    for col in ("decoded_h", "decoded_w", "channels", "mean_pixel", "n_bytes"):
        assert parts[col].to_pylist() == whole[col].to_pylist()
    # schema invariants of the fake decoder
    assert whole["n_bytes"].to_pylist() == [len(p) for p in payloads]
    dh = whole["decoded_h"].to_numpy()
    dw = whole["decoded_w"].to_numpy()
    assert ((dh >= 64) & (dh < 512)).all() and ((dw >= 64) & (dw < 512)).all()
    assert set(whole["channels"].to_pylist()) == {3}


def test_multimodal_decode_real_codec_is_gated():
    with pytest.raises(NotImplementedError):
        DecodeImageStage(decoder="real")
    with pytest.raises(NotImplementedError):
        FeatureExtractStage(model="real")


def test_multimodal_features_split_invariant():
    payloads = [f"blob-{i}".encode() for i in range(10)]
    tbl = _media_table(payloads)
    stage = FeatureExtractStage(dim=8)
    whole = stage(tbl)["embedding"].to_pylist()
    parts = (
        stage(tbl.slice(0, 4))["embedding"].to_pylist()
        + stage(tbl.slice(4))["embedding"].to_pylist()
    )
    assert whole == parts
    assert all(len(e) == 8 for e in whole)
    assert all(-1.0 <= v <= 1.0 for e in whole for v in e)


def test_multimodal_frame_sample_expansion():
    payloads = [b"video-a", b"video-b"]
    tbl = _media_table(payloads)
    out = FrameSampleStage(frames=4)(tbl)
    assert out.num_rows == 8
    assert out["frame_no"].to_pylist() == [0, 1, 2, 3] * 2
    # offsets are deterministic and non-decreasing per media row
    offs = out["frame_offset_ms"].to_pylist()
    assert offs[:4] == sorted(offs[:4]) and offs[4:] == sorted(offs[4:])


# ---------------------------------------------------------------------------
# exact n-gram Jaccard similarity join (the SQL-oracle path)
# ---------------------------------------------------------------------------
def test_exact_jaccard_pairs_equals_bruteforce(corpus):
    """The inverted-index join must produce the EXACT brute-force pair
    set with bit-identical jaccard values (no sketches anywhere)."""
    import ray.data

    from arcane_stream_sqlserver_change_tracking_ray.functions.dedup import (
        exact_jaccard_pairs,
    )

    tbl, _, truth = corpus
    thr = 0.3
    out = exact_jaccard_pairs(
        ray.data.from_arrow(tbl), threshold=thr, text_col="text", id_col="doc_id"
    ).to_pandas()
    got = {(int(a), int(b)): float(j) for a, b, j in zip(out["id_a"], out["id_b"], out["jaccard"])}
    n = truth.shape[0]
    want = {
        (i, j): truth[i, j]
        for i in range(n)
        for j in range(i + 1, n)
        if truth[i, j] >= thr
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k]  # bit-exact: same integer counts, same division


def test_exact_jaccard_pairs_batch_split_invariant(corpus):
    """Result must not depend on how the corpus splits into batches."""
    import ray.data

    from arcane_stream_sqlserver_change_tracking_ray.functions.dedup import (
        exact_jaccard_pairs,
    )

    tbl, _, _ = corpus
    a = exact_jaccard_pairs(ray.data.from_arrow(tbl), threshold=0.3).to_pandas()
    b = exact_jaccard_pairs(
        ray.data.from_arrow(tbl).repartition(7), threshold=0.3
    ).to_pandas()
    ka = sorted(zip(a["id_a"], a["id_b"], a["jaccard"]))
    kb = sorted(zip(b["id_a"], b["id_b"], b["jaccard"]))
    assert ka == kb


# ---------------------------------------------------------------------------
# exact embedding cosine near-dup (the SQL-oracle path)
# ---------------------------------------------------------------------------
def test_exact_cosine_pairs_equals_bruteforce():
    import ray.data

    from arcane_stream_sqlserver_change_tracking_ray.functions.similarity import (
        exact_cosine_pairs,
    )

    tbl, x = _embeddings_table(n=300, d=16, seed=5)
    xn = x.astype(np.float64)
    xn /= np.linalg.norm(xn, axis=1, keepdims=True)
    c = xn @ xn.T
    thr = 0.6
    iu = np.triu_indices(len(xn), 1)
    want = {
        (int(i), int(j)) for i, j in zip(iu[0][c[iu] >= thr], iu[1][c[iu] >= thr])
    }
    out = exact_cosine_pairs(
        ray.data.from_arrow(tbl).repartition(5), threshold=thr
    ).to_pandas()
    assert _pairs_set(out) == want
    assert want, "corpus must contain at least one pair above threshold"


def test_exact_jaccard_partitioned_counts_equals_broadcast(corpus):
    """The no-broadcast (hash-join) counts attach must give identical
    pairs and bit-identical jaccard values to the broadcast path."""
    import ray.data

    from arcane_stream_sqlserver_change_tracking_ray.functions.dedup import (
        exact_jaccard_pairs,
    )

    tbl, _, _ = corpus
    a = exact_jaccard_pairs(
        ray.data.from_arrow(tbl), threshold=0.3, counts="broadcast"
    ).to_pandas()
    b = exact_jaccard_pairs(
        ray.data.from_arrow(tbl).repartition(6), threshold=0.3, counts="partitioned"
    ).to_pandas()
    assert sorted(zip(a["id_a"], a["id_b"], a["jaccard"])) == sorted(
        zip(b["id_a"], b["id_b"], b["jaccard"])
    )


def test_ivf_topk_recall_vs_bruteforce():
    import ray.data

    from arcane_stream_sqlserver_change_tracking_ray.functions.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    tbl, x = _embeddings_table(n=400, d=32, seed=11)
    q = x[:3].astype(np.float64)
    ds = ray.data.from_arrow(tbl)
    bf = brute_force_topk(ds, q, k=10).to_pandas()
    ivf = ivf_topk(ds, q, k=10, n_clusters=12, nprobe=4).to_pandas()
    got = set(map(tuple, ivf[["query_id", "vec_id"]].values))
    want = set(map(tuple, bf[["query_id", "vec_id"]].values))
    recall = len(got & want) / len(want)
    assert recall >= 0.8, f"IVF recall {recall} below floor"
    # probing ALL clusters must reproduce brute force exactly
    full = ivf_topk(ds, q, k=10, n_clusters=12, nprobe=12).to_pandas()
    assert set(map(tuple, full[["query_id", "vec_id"]].values)) == want


def test_ann_ivf_entry_contract_exact_recall():
    """Pin the ann_ivf_topk oracle contract: at the entry's tuned
    nprobe=8/16 the IVF result is IDENTICAL to brute force on the
    driver corpus (recall@10 = 1.0), which is what lets the exact
    top-k SQL serve as the hash oracle."""
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    iv = (
        e.ann_ivf_topk(sf)
        .to_pandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    br = (
        e.ann_cosine_topk(sf)
        .to_pandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    assert iv.equals(br), "IVF at nprobe=8 must match brute force exactly"


def test_connected_components_topologies():
    import numpy as np
    from arcane_stream_sqlserver_change_tracking_ray.functions.dedup import (
        connected_components,
    )

    # chain 1-2-3, separate pair (10,11), long path 20-21-22-23-24,
    # star 30-{31,32,33}, edge order scrambled and duplicated
    a = np.array([2, 1, 10, 23, 21, 20, 22, 30, 33, 30, 1], np.int64)
    b = np.array([3, 2, 11, 24, 22, 21, 23, 31, 30, 32, 2], np.int64)
    nodes, lbl = connected_components(a, b)
    got = dict(zip(nodes.tolist(), lbl.tolist()))
    assert got == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20, 23: 20, 24: 20,
        30: 30, 31: 30, 32: 30, 33: 30,
    }


def test_simhash_poly_mode_matches_python_reference():
    """hash_impl='poly' must equal a from-scratch Python recomputation
    (byte polynomial word hash, Horner shingle combine, splitmix64) —
    the definition the DuckDB oracle replays in HUGEINT arithmetic."""
    M = 1 << 64

    def ref_sig(text: str) -> int:
        words = __import__("re").split(r"\s+", text.lower())
        wh = []
        for w in words:
            h = 0
            for b in w.encode():
                h = (h * 1000003 + b) % M
            wh.append(h)
        shingles = []
        for i in range(len(wh) - 2):
            s = ((wh[i] * 1000003 + wh[i + 1]) % M * 1000003 + wh[i + 2]) % M
            s ^= s >> 29
            s = (s * 0xBF58476D1CE4E5B9) % M
            s ^= s >> 32
            shingles.append(s)
        if not shingles:
            return 0
        sig = 0
        for j in range(64):
            cnt = sum((s >> j) & 1 for s in shingles)
            if 2 * cnt > len(shingles):
                sig |= 1 << j
        return sig

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "Mixed CASE Words  with   extra whitespace",
        "tiny doc",  # < 3 words -> signature 0
        "a b c d e f g h i j",
    ]
    sig = simhash_signatures(pa.array(texts), k_shingle=3, hash_impl="poly")
    for t, s in zip(texts, sig):
        assert int(s) == ref_sig(t), t


def test_containment_join_planted_excerpt():
    """A short doc fully contained in a long one must score containment
    1.0 (where its Jaccard is far below threshold) — the excerpt case
    the containment measure exists for; and the partitioned counts path
    must agree with the broadcast path."""
    import ray.data

    from arcane_stream_sqlserver_change_tracking_ray.functions.dedup import (
        exact_jaccard_pairs,
    )

    long = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    excerpt = "beta gamma delta epsilon"  # 2 shingles, both in long
    other = "one two three four five six seven eight nine ten"
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([long, excerpt, other]),
        }
    )
    for counts in ("broadcast", "partitioned"):
        out = exact_jaccard_pairs(
            ray.data.from_arrow(tbl),
            threshold=0.9,
            measure="containment",
            counts=counts,
        ).to_pandas()
        pairs = {
            (int(a), int(b)): float(c)
            for a, b, c in zip(out["id_a"], out["id_b"], out["containment"])
        }
        assert pairs == {(1, 2): 1.0}, (counts, pairs)
    # jaccard at the same threshold finds nothing (the asymmetry)
    j = exact_jaccard_pairs(ray.data.from_arrow(tbl), threshold=0.9).to_pandas()
    assert len(j) == 0


# ---------------------------------------------------------------------------
# distributed connected components (large-star / small-star groupby rounds)
# ---------------------------------------------------------------------------
def test_connected_components_ds_matches_driver():
    """The distributed groupby implementation must produce exactly the
    driver pointer-jumping labels on random graphs (chains, cliques,
    singleton-edge mixes; min-label roots)."""
    import ray.data

    from arcane_stream_sqlserver_change_tracking_ray.functions.dedup import (
        connected_components,
        connected_components_ds,
    )

    rng = np.random.default_rng(7)
    for trial in range(3):
        n = 300
        # random sparse graph + one long chain (stress the round count)
        a = rng.integers(0, n, size=150).astype(np.int64)
        b = rng.integers(0, n, size=150).astype(np.int64)
        chain = np.arange(1000, 1050, dtype=np.int64)
        a = np.r_[a, chain[:-1]]
        b = np.r_[b, chain[1:]]
        keep = a != b
        a, b = a[keep], b[keep]
        nodes, lbl = connected_components(a, b)
        exp = dict(zip(nodes.tolist(), lbl.tolist()))

        pairs = ray.data.from_arrow(
            pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})
        ).repartition(4)
        got = {
            r["node"]: r["label"]
            for r in connected_components_ds(pairs).take_all()
        }
        assert got == exp, f"trial {trial}"


def test_dedup_clusters_distributed_equals_driver():
    """dedup_clusters with the distributed path FORCED must equal the
    driver path on the real documents fixture (verdict r2 #5)."""
    import os

    import __ray_entry__ as E

    sf = os.environ.get("GRAFT_SF_SMALL", "/root/testdata/sf0.001")
    drv = E.dedup_clusters(sf, distributed=False)
    dist = E.dedup_clusters(sf, distributed=True)
    assert drv.num_rows == dist.num_rows > 0
    d1 = dict(zip(drv["doc_id"].to_pylist(), drv["cluster_id"].to_pylist()))
    d2 = dict(zip(dist["doc_id"].to_pylist(), dist["cluster_id"].to_pylist()))
    assert d1 == d2


def test_exact_oracle_twins_refuse_at_scale(monkeypatch):
    """The deliberately-exact oracle twins must REFUSE oversized inputs
    with a pointer at the scale path (verdict r2 #7) instead of silently
    broadcasting/looping."""
    import ray.data

    from arcane_stream_sqlserver_change_tracking_ray.functions import (
        dedup as D,
        similarity as S,
    )

    monkeypatch.setattr(S, "EXACT_PAIRS_MAX_ROWS", 4)
    emb = pa.table(
        {
            "vec_id": pa.array(range(6), pa.int64()),
            "embedding": pa.array([[1.0, 0.0]] * 6, pa.list_(pa.float32())),
        }
    )
    with pytest.raises(ValueError, match="LSH"):
        S.exact_cosine_pairs(ray.data.from_arrow(emb))

    monkeypatch.setattr(D, "JACCARD_MATRIX_MAX_DOCS", 3)
    with pytest.raises(ValueError, match="exact_jaccard_pairs"):
        D.ngram_jaccard_matrix(["a b c d"] * 5)
