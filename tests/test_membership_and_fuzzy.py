"""Bloom-filter membership, semi/anti joins, the vectorized
Levenshtein DP and the blocked fuzzy join, and BM25 retrieval."""

import numpy as np
import pyarrow as pa
import ray.data

from arcane_stream_sqlserver_change_tracking_ray.functions.join import (
    broadcast_semi_join,
    fuzzy_self_join,
    levenshtein_pairs,
    partitioned_equi_join,
)
from arcane_stream_sqlserver_change_tracking_ray.functions.sketch import (
    BLOOM_BITS,
    bloom_build,
    bloom_partial,
    bloom_probe,
)


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------
def _keys_ds(vals):
    return ray.data.from_arrow(pa.table({"k": pa.array(vals, pa.int64())}))


def test_bloom_no_false_negatives_and_bounded_fp():
    member = list(range(0, 2000, 2))  # 1000 even keys
    bits = bloom_build(_keys_ds(member), "k")
    # every member answers True (the Bloom contract)
    got = bloom_probe(bits, pa.array(member, pa.int64()))
    assert got.all()
    # non-members: fp rate for m=8192, k=4, n=1000 is ~ (1-e^{-kn/m})^4 ≈ 2.2%
    non = pa.array(list(range(1, 4001, 2)), pa.int64())
    fp = bloom_probe(bits, non).mean()
    assert fp < 0.10, fp


def test_bloom_partials_merge_by_or():
    """Any batch split ORs to the same filter (the distributed fold)."""
    vals = list(range(500))
    whole = bloom_build(_keys_ds(vals), "k")
    a = bloom_partial(pa.table({"k": pa.array(vals[:200], pa.int64())}), "k")
    b = bloom_partial(pa.table({"k": pa.array(vals[200:], pa.int64())}), "k")
    words = np.zeros(BLOOM_BITS // 64, np.uint64)
    for part in (a, b):
        words |= np.asarray(part["words"][0].as_py(), np.int64).view(np.uint64)
    folded = np.unpackbits(words.view(np.uint8), bitorder="little").astype(bool)
    assert (folded == whole).all()


# ---------------------------------------------------------------------------
# Levenshtein DP + fuzzy join
# ---------------------------------------------------------------------------
def _lev_ref(a: str, b: str) -> int:
    """Plain-Python Wagner–Fischer reference."""
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1])
            )
        prev = cur
    return prev[lb]


def test_levenshtein_pairs_matches_reference():
    pairs = [
        ("", ""), ("", "abc"), ("abc", ""), ("abc", "abc"),
        ("kitten", "sitting"), ("flaw", "lawn"), ("hot rod", "cold rod"),
        ("blue widget", "blue widgets"), ("a", "b"), ("ab", "ba"),
        ("intention", "execution"), ("cold", "hot"),
    ]
    got = levenshtein_pairs([p[0] for p in pairs], [p[1] for p in pairs])
    exp = [_lev_ref(a, b) for a, b in pairs]
    assert list(got) == exp


def test_levenshtein_pairs_counts_code_points_not_bytes():
    """One non-ASCII substitution is ONE edit (ADVICE r2: the old
    utf-8-byte DP counted a 2-byte char swap as 2-4 edits)."""
    pairs = [
        ("café", "cafe"),          # é (2 bytes) vs e -> 1 substitution
        ("über", "uber"),          # ü vs u -> 1
        ("naïve", "naive"),        # ï vs i -> 1
        ("日本語", "日本話"),        # 3-byte CJK substitution -> 1
        ("smörgås", "smorgas"),    # two substitutions -> 2
        ("é", ""),                 # one code point deleted -> 1
    ]
    got = levenshtein_pairs([p[0] for p in pairs], [p[1] for p in pairs])
    exp = [_lev_ref(a, b) for a, b in pairs]  # python str = code points
    assert list(got) == exp == [1, 1, 1, 1, 2, 1]


def test_fuzzy_self_join_planted_pairs():
    """Planted near-identical names across batches: exact pair set,
    global dedup across duplicate rows, blocking respected."""
    names = (
        ["hot rod"] * 3        # duplicates must collapse
        + ["hot rodz"]         # dist 1, same block? blk 'rodz' != 'rod' -> NOT paired
        + ["bot rod"]          # dist 1, same block -> paired
        + ["cold rod"]         # dist 3 vs 'hot rod', 4 vs 'bot rod'
        + ["entirely other"]   # lone block
    )
    ds = ray.data.from_arrow(
        pa.table({"p_name": pa.array(names, pa.string())})
    ).repartition(3)
    got = fuzzy_self_join(ds, "p_name", max_distance=3).take_all()
    pairs = {(r["name_a"], r["name_b"]): r["dist"] for r in got}
    assert pairs == {
        ("bot rod", "hot rod"): 1,
        ("bot rod", "cold rod"): 3,  # b->c, t->l, +d
        ("cold rod", "hot rod"): 3,
    }, pairs


# ---------------------------------------------------------------------------
# semi / anti joins
# ---------------------------------------------------------------------------
def test_broadcast_semi_and_anti_join():
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4, 5], pa.int64()),
                  "v": pa.array(list("abcde"))})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([2, 2, 4, 9], pa.int64())})
    ).repartition(2)
    semi = broadcast_semi_join(left, right, on="k", right_on="rk").take_all()
    assert sorted(r["k"] for r in semi) == [2, 4]
    anti = broadcast_semi_join(left, right, on="k", right_on="rk", anti=True).take_all()
    assert sorted(r["k"] for r in anti) == [1, 3, 5]


def test_broadcast_semi_join_null_keys():
    """NULL keys follow SQL equi-join semantics (ADVICE r2: they used to
    crash np.unique/searchsorted): a NULL probe never matches — semi
    drops it, anti keeps it — and NULL build keys are ignored."""
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, None, 3, None, 5], pa.int64()),
                  "v": pa.array(list("abcde"))})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([1, None, 5, 9], pa.int64())})
    ).repartition(2)
    semi = broadcast_semi_join(left, right, on="k", right_on="rk").take_all()
    assert sorted(r["v"] for r in semi) == ["a", "e"]
    anti = broadcast_semi_join(left, right, on="k", right_on="rk", anti=True).take_all()
    assert sorted(r["v"] for r in anti) == ["b", "c", "d"]


def test_bloom_probe_aligned_with_null_and_empty_probes():
    """Verdicts are positionally aligned with the probe column: null and
    empty-string slots answer False instead of being dropped (ADVICE r2:
    misalignment for callers zipping verdicts onto rows)."""
    bits = bloom_build(_keys_ds([10, 20, 30]), "k")
    probe = pa.array(["10", None, "20", "", "999"], pa.string())
    got = bloom_probe(bits, probe)
    assert len(got) == len(probe)
    assert got[0] and got[2]            # members hit at their own slots
    assert not got[1] and not got[3]    # null / empty -> False, not dropped


def test_partitioned_left_semi_join_no_row_multiplication():
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "v": pa.array(list("abc"))})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([2, 2, 2, 3], pa.int64())})
    )
    out = partitioned_equi_join(left, right, on="k", num_buckets=4,
                                join_type="left semi").take_all()
    assert sorted((r["k"], r["v"]) for r in out) == [(2, "b"), (3, "c")]


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------
def test_bm25_ranks_term_dense_doc_first(tmp_path):
    """A doc saturated with the query terms must outrank a diluted one."""
    import pyarrow.parquet as pq

    import __ray_entry__ as E

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "merge stream vector merge stream vector",
                    "merge padding padding padding padding padding padding",
                    "nothing relevant here at all",
                ]
            ),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([10, 10, 10], pa.int64()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = E.bm25_topk(str(tmp_path))
    ids = out["doc_id"].to_pylist()
    assert ids[0] == 1
    assert 3 not in ids  # zero-score docs never surface
    scores = out["score"].to_pylist()
    assert scores == sorted(scores, reverse=True)
