"""T1-T5 transform unit tests."""

import pyarrow as pa
import pytest

from arcane_stream_sqlserver_change_tracking_ray.functions import transforms as T
from arcane_stream_sqlserver_change_tracking_ray.types import (
    MERGE_KEY_COL,
    OP_COL,
    VERSION_COL,
)


def test_normalize_name():
    assert T.normalize_name("Order$Total/Price\\EUR") == "ordertotalpriceeur"
    assert T.normalize_name("already_ok") == "already_ok"


def test_normalize_column_names():
    t = pa.table({"Some$Col": [1], "other/col": [2]})
    assert T.normalize_column_names(t).column_names == ["somecol", "othercol"]


@pytest.fixture()
def change_batch():
    return pa.table(
        {
            VERSION_COL: pa.array([1, 2], pa.int64()),
            OP_COL: ["I", "U"],
            MERGE_KEY_COL: ["a", "b"],
            "url": ["a", "b"],
            "text": ["x", "y"],
            "lang": ["en", "de"],
        }
    )


def test_select_include_keeps_essential(change_batch):
    out = T.select_fields(change_batch, "include", ("text",))
    assert set(out.column_names) == {VERSION_COL, OP_COL, MERGE_KEY_COL, "text"}


def test_select_exclude_cannot_drop_essential(change_batch):
    out = T.select_fields(change_batch, "exclude", ("lang", MERGE_KEY_COL))
    # lang dropped; merge key retained despite being excluded (CRD ...:432)
    assert "lang" not in out.column_names
    assert MERGE_KEY_COL in out.column_names


def test_select_all(change_batch):
    assert T.select_fields(change_batch, "all").column_names == change_batch.column_names


def test_unknown_rule(change_batch):
    with pytest.raises(ValueError):
        T.select_fields(change_batch, "nope")


def test_merge_key_single_column():
    t = pa.table({"url": ["u1", "u2"]})
    out = T.synthesize_merge_key(t, ("url",))
    assert out[MERGE_KEY_COL].to_pylist() == ["u1", "u2"]


def test_merge_key_composite():
    t = pa.table({"a": [1, 2], "b": ["x", "y"]})
    out = T.synthesize_merge_key(t, ("a", "b"))
    assert out[MERGE_KEY_COL].to_pylist() == ["1#x", "2#y"]


def test_cast_columns_arcane_names():
    t = pa.table({"n": pa.array([1, 2], pa.int32())})
    out = T.cast_columns(t, {"n": "LongType"})
    assert out["n"].type == pa.int64()


def test_cast_to_schema_adds_nulls_and_orders():
    t = pa.table({"b": [1], "a": ["x"]})
    schema = pa.schema([("a", pa.string()), ("b", pa.int64()), ("c", pa.float64())])
    out = T.cast_to_schema(t, schema)
    assert out.schema == schema
    assert out["c"].null_count == 1


def test_column_summary():
    t = pa.table({"n": [1, 2, None], "b": pa.array([b"x"], pa.binary()).take([0, 0, 0])})
    s = T.column_summary(t, ("n", "b"))
    assert s["n"] == {"min": 1, "max": 2, "null_count": 1, "count": 3}
    assert s["b"]["min"] is None  # binary columns skip min/max


# ---------------------------------------------------------------------------
# html -> text extraction (input_hint per-row invariant)
# ---------------------------------------------------------------------------
def _roundtrip(texts: list[str]) -> list[str]:
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import (
        ExtractTextStage,
        escape_html_text,
    )

    t = pa.table({"text": pa.array(texts, pa.string())})
    esc = escape_html_text(t["text"])
    html = pa.table(
        {
            "html": pa.array(
                [f"<html lang=\"en\"><head><meta content=\"d {i}\"/></head><body><p>".encode()
                 + e.as_py().encode() + b"</p></body></html>"
                 for i, e in enumerate(esc.combine_chunks() if isinstance(esc, pa.ChunkedArray) else esc)],
                pa.binary(),
            )
        }
    )
    out = ExtractTextStage()(html)
    return out["text_extracted"].to_pylist()


def test_extract_text_roundtrip_adversarial():
    texts = [
        "plain words",
        "a < b && b > c",                      # raw markup-ish chars
        "already &amp;lt; escaped",            # double-escape must survive
        'quotes " and \' apostrophes',
        "&lt;p&gt; looks like a tag but is text",
        "",                                    # empty doc
        "trailing ampersand &",
        "x" * 300,                             # long run (pad-like)
    ]
    assert _roundtrip(texts) == texts


def test_extract_text_on_generated_pages():
    """gen.py pages: html = <html><body> + text + x-pad + </body></html>;
    extraction must yield text + pad byte-identically (the invariant the
    100-TB replay relies on)."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import ExtractTextStage
    from arcane_stream_sqlserver_change_tracking_ray.gen import (
        CtLogSpec,
        plan_events,
        render_events,
    )
    import numpy as np

    spec = CtLogSpec(n_keys=50, n_events=400, seed=7)
    keys, ops = plan_events(spec)
    versions = np.arange(1, spec.n_events + 1, dtype=np.int64)
    tbl = render_events(versions, keys, ops, spec)
    out = ExtractTextStage()(tbl)
    texts = tbl["text"].to_pylist()
    extracted = out["text_extracted"].to_pylist()
    n_checked = 0
    for t, e in zip(texts, extracted):
        if t is None:  # delete events carry no payload
            assert e is None
            continue
        assert e.startswith(t)
        assert set(e[len(t):]) <= {"x"}  # deterministic pad only
        n_checked += 1
    assert n_checked > 200


# ---------------------------------------------------------------------------
# Gopher repetition signals
# ---------------------------------------------------------------------------
def _rep(texts: list[str]):
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import RepetitionStage

    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = RepetitionStage()(t)
    return out["dup_line_frac"].to_pylist(), out["dup_char_frac"].to_pylist()


def test_repetition_basic():
    lf, cf = _rep(
        [
            "a\nb\nc",              # all unique
            "nav\nbody\nnav",       # 1 dup line of 3; dup chars 6 of 10
            "x\nx\nx\nx",           # fully repeated
            "single line",          # one line, no dup
            "",                     # empty text = one empty line
        ]
    )
    assert lf == [0.0, 1 / 3, 3 / 4, 0.0, 0.0]
    assert cf == [0.0, 6 / 10, 1.0, 0.0, 0.0]


def test_repetition_sliced_and_split_invariant():
    """Result must not depend on batch slicing (Arrow offset != 0 path)."""
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import RepetitionStage

    texts = [f"l{i % 3}\nl{(i * 7) % 4}\nfooter\nfooter" for i in range(20)]
    t = pa.table({"doc_id": list(range(20)), "text": texts})
    whole = RepetitionStage()(t)
    parts = [RepetitionStage()(t.slice(i, 7)) for i in (0, 7, 14)]
    glued = pa.concat_tables(parts)
    assert whole["dup_line_frac"].to_pylist() == glued["dup_line_frac"].to_pylist()
    assert whole["dup_char_frac"].to_pylist() == glued["dup_char_frac"].to_pylist()


def test_ngram_repetition_known_values():
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import (
        NgramRepetitionStage,
    )

    t = pa.table(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "a b a b a",        # 2-grams: "a b"x2,"b a"x2 -> top 6/12
                "x y z w",          # all unique 2-grams -> 3/9
                "q",                # no 2-grams
                "",                 # empty
                "a a a a a a b c d e f",  # "a a a a a" window repeats x2
            ],
        }
    )
    out = NgramRepetitionStage()(t)
    top2 = out["top2_char_frac"].to_pylist()
    dup5 = out["dup5_char_frac"].to_pylist()
    assert top2[0] == 6 / 12 and top2[1] == 3 / 9 and top2[2] == 0.0 and top2[3] == 0.0
    assert dup5[0] == 0.0 and dup5[1] == 0.0
    # doc 4: 11 words -> 7 5-gram windows, each 9 chars; only the
    # all-'a' window occurs twice (positions 1 and 2)
    assert dup5[4] == 18 / 63


def test_ngram_repetition_slice_invariant():
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import (
        NgramRepetitionStage,
    )

    texts = [" ".join(f"w{(i * j) % 7}" for j in range(30)) for i in range(20)]
    t = pa.table({"doc_id": list(range(20)), "text": texts})
    whole = NgramRepetitionStage()(t)
    glued = pa.concat_tables([NgramRepetitionStage()(t.slice(i, 7)) for i in (0, 7, 14)])
    assert whole["top2_char_frac"].to_pylist() == glued["top2_char_frac"].to_pylist()
    assert whole["dup5_char_frac"].to_pylist() == glued["dup5_char_frac"].to_pylist()


def test_pii_redact_planted():
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import PiiRedactStage

    t = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "mail a.b+c%d@sub.domain.org now",
                "server at 10.0.255.1 port open; also 1.2.3.4.",
                "call +1 (555) 123-4567 or 555 000 1234 x",
                "no pii here at all",
            ],
        }
    )
    out = PiiRedactStage()(t)
    red = out["text_redacted"].to_pylist()
    assert red[0] == "mail <EMAIL> now"
    assert red[1] == "server at <IP> port open; also <IP>."
    assert red[2] == "call <PHONE> or <PHONE> x"
    assert red[3] == "no pii here at all"
    assert out["n_email"].to_pylist() == [1, 0, 0, 0]
    assert out["n_ipv4"].to_pylist() == [0, 2, 0, 0]
    assert out["n_phone"].to_pylist() == [0, 0, 2, 0]


def test_tfidf_topk_known_values():
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import (
        TfidfTopKStage,
        doc_token_counts,
    )

    docs = pa.table({"doc_id": [0, 1, 2], "text": ["a a b", "a c", "c c c"]})
    tf = doc_token_counts(docs)
    # df: a->2 docs, b->1, c->2 ; N=3
    df_tbl = pa.table({"token": ["a", "b", "c"], "df": [2, 1, 2]})
    out = TfidfTopKStage(df_tbl, n_docs=3, k=3)(tf)
    rows = sorted(
        zip(
            out["doc_id"].to_pylist(),
            out["token"].to_pylist(),
            out["tfidf"].to_pylist(),
            out["rnk"].to_pylist(),
        )
    )
    assert rows == [
        (0, "a", 3.0, 1),   # tf 2 * 3/2
        (0, "b", 3.0, 2),   # tf 1 * 3/1 — tie broken token-asc
        (1, "a", 1.5, 1),
        (1, "c", 1.5, 2),
        (2, "c", 4.5, 1),
    ]


def test_seq_pack_bins_known_values():
    import numpy as np
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import (
        assign_bins_in_bucket,
        bucket_token_sums,
    )

    # docs 0..5 with token counts; global cumsum-before = 0,100,600,610,1210,1510
    # -> bins at B=512: 0,0,1,1,2,2
    t = pa.table({"doc_id": [0, 1, 2, 3, 4, 5], "n_tokens_ws": [100, 500, 10, 600, 300, 20]})
    # two buckets of 3 docs (bucket=3): offsets [0, 610]
    parts = [
        bucket_token_sums(t.slice(0, 2), bucket=3),
        bucket_token_sums(t.slice(2, 4), bucket=3),
    ]
    sums = pa.concat_tables(parts).group_by("bucket").aggregate([("bn", "sum")])
    sums = sums.rename_columns(["bucket", "bn"]).sort_by("bucket")
    totals = sums["bn"].to_numpy(zero_copy_only=False)
    offsets = np.cumsum(totals) - totals
    assert offsets.tolist() == [0, 610]
    g0 = t.slice(0, 3).append_column("bucket", pa.array([0, 0, 0], pa.int64()))
    g1 = t.slice(3, 3).append_column("bucket", pa.array([1, 1, 1], pa.int64()))
    out = pa.concat_tables(
        [assign_bins_in_bucket(g, offsets, 512) for g in (g0, g1)]
    )
    assert out["bin_id"].to_pylist() == [0, 0, 1, 1, 2, 2]


def test_sessionize_gaps_and_ties():
    import numpy as np
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import (
        sessionize_user,
    )

    base = np.datetime64("2024-01-01T00:00:00", "us")
    mins = np.array([0, 10, 50, 50, 120], "timedelta64[m]")  # gap>30 at idx 2 and 4
    t = pa.table(
        {
            "event_id": [5, 1, 3, 2, 4],  # arrival order scrambled; tie at t=50min
            "ts": pa.array(base + mins[[4, 0, 1, 2, 3]].astype("timedelta64[us]")),
            "user_id": [7, 7, 7, 7, 7],
        }
    )
    out = sessionize_user(t, gap_us=30 * 60 * 1_000_000)
    # sorted by (ts, event_id): e1@0, e3@10, e2@50, e4@50, e5@120
    assert out["event_id"].to_pylist() == [1, 3, 2, 4, 5]
    assert out["session_id"].to_pylist() == [1, 1, 2, 2, 3]


def test_train_eval_split_resharding_invariant():
    """The same document must land in the same split regardless of how
    the corpus is sharded or ordered (the anti-leakage property)."""
    import numpy as np
    from arcane_stream_sqlserver_change_tracking_ray.functions.text import (
        rolling_window_hashes,
    )

    texts = [f"doc {i} " + "tok " * (i % 17) for i in range(200)]

    def split_of(batch_texts):
        arr = pa.array(batch_texts, pa.string())
        h, offs = rolling_window_hashes(arr, k=1 << 31)
        out = np.zeros(len(offs) - 1, np.uint64)
        out[np.diff(offs) > 0] = h
        return {t: int(v % 100) < 5 for t, v in zip(batch_texts, out)}

    whole = split_of(texts)
    rev = split_of(texts[::-1])
    shards = {}
    for i in range(0, 200, 37):  # ragged shard sizes
        shards.update(split_of(texts[i : i + 37]))
    assert whole == rev == shards
    assert 1 <= sum(whole.values()) <= 30  # ~5% of 200, not degenerate


def test_broadcast_range_join():
    """Interval join: containment, no-match drop, non-overlap contract."""
    import pyarrow as pa
    import pytest
    import ray.data

    from arcane_stream_sqlserver_change_tracking_ray.functions.join import (
        broadcast_range_join,
    )

    bands = pa.table(
        {
            "lo": pa.array([0.0, 10.0, 20.0]),
            "hi": pa.array([10.0, 20.0, 30.0]),
            "band": pa.array(["a", "b", "c"]),
        }
    )
    rows = pa.table({"id": pa.array([1, 2, 3, 4, 5]),
                     "v": pa.array([0.0, 9.999, 10.0, 29.9, 31.0])})
    out = broadcast_range_join(ray.data.from_arrow(rows), bands, on="v")
    got = {r["id"]: r["band"] for r in out.take_all()}
    # boundaries: lo inclusive, hi exclusive; 31.0 matches nothing
    assert got == {1: "a", 2: "a", 3: "b", 4: "c"}

    overlap = pa.table(
        {"lo": pa.array([0.0, 5.0]), "hi": pa.array([10.0, 15.0]),
         "band": pa.array(["x", "y"])}
    )
    with pytest.raises(ValueError, match="non-overlapping"):
        broadcast_range_join(ray.data.from_arrow(rows), overlap, on="v")
