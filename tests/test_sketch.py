"""Count-min sketch: overestimate bound, mergeability, exactness when
the vocabulary is collision-free at the grid width."""

import collections

import numpy as np
import pyarrow as pa
import ray.data

from arcane_stream_sqlserver_change_tracking_ray.functions.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_estimate,
    cms_partial,
    count_min_sketch,
)


def _docs(texts):
    return ray.data.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))


def test_cms_estimates_bound_and_exact_small_vocab():
    texts = [
        "alpha beta gamma alpha",
        "beta beta delta",
        "ALPHA gamma   gamma",  # lowercased + multi-space tokenization
        "",
    ]
    truth = collections.Counter(
        w for t in texts for w in t.lower().split() if w
    )
    sk = count_min_sketch(_docs(texts))
    assert sk.shape == (CMS_DEPTH, CMS_WIDTH)
    assert sk[0].sum() == sum(truth.values())  # every occurrence counted once per row
    tokens = sorted(truth)
    est = cms_estimate(sk, tokens)
    for tok, e in zip(tokens, est):
        assert e >= truth[tok]
    # 4 distinct tokens in a 4x1024 grid: collisions are (checked) absent,
    # so the estimates are EXACT
    assert list(est) == [truth[t] for t in tokens]


def test_cms_partials_merge():
    """The sketch is a commutative monoid: any batch split sums to the
    same grid (the property the distributed fold relies on)."""
    texts = ["x y z"] * 7 + ["y z z w"] * 5
    whole = count_min_sketch(_docs(texts))
    a = cms_partial(pa.table({"text": pa.array(texts[:3])}))
    b = cms_partial(pa.table({"text": pa.array(texts[3:10])}))
    c = cms_partial(pa.table({"text": pa.array(texts[10:])}))
    folded = np.zeros((CMS_DEPTH, CMS_WIDTH), np.int64)
    for part in (a, b, c):
        folded += np.asarray(part["sketch"][0].as_py(), np.int64).reshape(
            CMS_DEPTH, CMS_WIDTH
        )
    assert (folded == whole).all()


def test_hll_estimate_accuracy_and_merge():
    """Registers merge by max across any batch split; the estimate lands
    within a few standard errors of the exact cardinality."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.sketch import (
        HLL_BUCKETS,
        hll_estimate,
        hll_partial,
        hll_registers,
    )

    n = 20_000
    vals = pa.table({"v": pa.array([f"user-{i}" for i in range(n)], pa.string())})
    regs = hll_registers(ray.data.from_arrow(vals), "v")
    est = hll_estimate(regs)
    assert abs(est - n) / n < 0.1  # 1024 registers -> ~3.25% stderr

    # merge property: two halves max-folded == whole
    a = np.asarray(
        hll_partial(vals.slice(0, n // 2), "v")["regs"][0].as_py(), np.int64
    )
    b = np.asarray(
        hll_partial(vals.slice(n // 2), "v")["regs"][0].as_py(), np.int64
    )
    assert (np.maximum(a, b) == regs).all()
    assert len(regs) == HLL_BUCKETS

    # duplicates never move a register
    dup = pa.table({"v": pa.array(["user-1"] * 500, pa.string())})
    regs_dup = np.asarray(hll_partial(dup, "v")["regs"][0].as_py(), np.int64)
    assert (regs_dup > 0).sum() == 1


def test_kmv_exact_below_k_merge_invariant_and_estimate():
    """KMV: below k the sketch IS the distinct set (estimate exact);
    the fold is split-invariant; above k the estimate lands within
    ~4/sqrt(k) of the truth."""
    import pyarrow as pa
    import ray.data

    from arcane_stream_sqlserver_change_tracking_ray.functions.sketch import (
        KMV_K,
        kmv_estimate,
        kmv_partial,
        kmv_sketch,
    )

    def ds_of(vals, blocks=1):
        d = ray.data.from_arrow(pa.table({"k": pa.array(vals, pa.int64())}))
        return d.repartition(blocks) if blocks > 1 else d

    small = [i % 97 for i in range(500)]  # 97 distinct < k
    mins = kmv_sketch(ds_of(small), "k")
    assert len(mins) == 97
    assert kmv_estimate(mins) == 97.0
    # split-invariance: different block structure, identical sketch
    mins3 = kmv_sketch(ds_of(small, blocks=5), "k")
    assert (mins == mins3).all()
    # manual two-partial fold == whole
    a = kmv_partial(pa.table({"k": pa.array(small[:100], pa.int64())}), "k")
    b = kmv_partial(pa.table({"k": pa.array(small[100:], pa.int64())}), "k")
    folded = np.unique(
        np.concatenate(
            [np.asarray(p["mins"][0].as_py(), np.int64).view(np.uint64) for p in (a, b)]
        )
    )[:KMV_K]
    assert (folded == mins).all()
    # above k: ~6.3% std error; allow 4 sigma
    big = list(range(20_000))
    est = kmv_estimate(kmv_sketch(ds_of(big, blocks=7), "k"))
    assert abs(est - 20_000) / 20_000 < 4 / np.sqrt(KMV_K), est
