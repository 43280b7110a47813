"""Text-analysis operators for large-scale training-data pipelines.

All kernels are vectorized — Arrow ``pyarrow.compute`` (re2 regexes run
inside Arrow's C++ kernels) or numpy `reduceat` over flattened list
arrays.  No Python loop ever touches a row in the hot path.  Stateful
setup (compiled patterns, stopword tables) happens once per actor in
``__init__`` when used as ``map_batches(Cls, concurrency=N)``.

Operators:
- token counting: whitespace tokens + a BPE-ish regex token count,
- quality scoring: length / word / punctuation / uppercase / stopword
  ratios,
- language id: stopword-profile n-gram heuristic over a fixed set of
  languages,
- document fingerprinting: winnowing-style rolling-hash fingerprint
  (polynomial rolling hash over the whole batch's concatenated bytes,
  per-doc min via ``np.minimum.reduceat`` — one pass, no per-row loop).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from arcane_stream_sqlserver_change_tracking_ray.types import import_polars

# BPE-ish token pattern: letter runs | digit runs | single punctuation
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
WORD_PATTERN = r"\S+"
PUNCT_PATTERN = r"[^\w\s]"
UPPER_PATTERN = r"[A-Z]"

STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "sich"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"),
    "es": ("el", "la", "los", "y", "es", "una", "en", "que", "por", "del"),
    "da": ("og", "det", "er", "til", "en", "den", "af", "ikke", "jeg", "på"),
    "it": ("il", "la", "che", "di", "e", "un", "per", "non", "sono", "con"),
    "pt": ("o", "a", "que", "de", "e", "um", "para", "não", "com", "uma"),
    "nl": ("de", "het", "een", "en", "van", "is", "dat", "niet", "op", "zijn"),
}


def _stopword_regex(words: tuple[str, ...]) -> str:
    return r"(?i)\b(?:" + "|".join(words) + r")\b"


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------
class TokenCountStage:
    """Append ``n_tokens_ws`` (whitespace) and ``n_tokens_bpe`` (BPE-ish
    regex) counts; regex work runs inside Arrow's vectorized re2 kernel."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col]
        ws = pc.count_substring_regex(text, WORD_PATTERN)
        bpe = pc.count_substring_regex(text, BPE_ISH_PATTERN)
        batch = batch.append_column("n_tokens_ws", pc.cast(ws, pa.int64()))
        return batch.append_column("n_tokens_bpe", pc.cast(bpe, pa.int64()))


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------
class QualityScoreStage:
    """Length/punct/upper/stopword ratios + a composite quality score.

    Ratios are rounded to 6 decimals so results hash-compare stably
    against a SQL oracle."""

    def __init__(self, text_col: str = "text", stopwords: tuple[str, ...] | None = None):
        self.text_col = text_col
        self.stop_re = _stopword_regex(stopwords or STOPWORDS["en"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col]
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_words = pc.cast(pc.count_substring_regex(text, WORD_PATTERN), pa.int64())
        n_punct = pc.count_substring_regex(text, PUNCT_PATTERN)
        n_upper = pc.count_substring_regex(text, UPPER_PATTERN)
        n_stop = pc.count_substring_regex(text, self.stop_re)
        denom_c = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
        denom_w = pc.max_element_wise(n_words, pa.scalar(1, pa.int64()))
        punct_ratio = pc.round(pc.divide(pc.cast(n_punct, pa.float64()), pc.cast(denom_c, pa.float64())), 6)
        upper_ratio = pc.round(pc.divide(pc.cast(n_upper, pa.float64()), pc.cast(denom_c, pa.float64())), 6)
        stop_ratio = pc.round(pc.divide(pc.cast(n_stop, pa.float64()), pc.cast(denom_w, pa.float64())), 6)
        mean_word_len = pc.round(
            pc.divide(
                pc.cast(pc.subtract(n_chars, pc.subtract(n_words, 1)), pa.float64()),
                pc.cast(denom_w, pa.float64()),
            ),
            6,
        )
        for name, col in (
            ("n_chars_actual", n_chars),
            ("n_words", n_words),
            ("punct_ratio", punct_ratio),
            ("upper_ratio", upper_ratio),
            ("stopword_ratio", stop_ratio),
            ("mean_word_len", mean_word_len),
        ):
            batch = batch.append_column(name, col)
        return batch


# ---------------------------------------------------------------------------
# language id
# ---------------------------------------------------------------------------
class LangIdStage:
    """Heuristic language id: per language, count hits of its stopword
    profile (one vectorized re2 pass per language), pick the argmax;
    ties break deterministically by language order."""

    def __init__(self, text_col: str = "text", languages: tuple[str, ...] | None = None):
        self.text_col = text_col
        self.languages = tuple(languages or STOPWORDS.keys())
        self.patterns = [_stopword_regex(STOPWORDS[lang]) for lang in self.languages]

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col]
        scores = np.stack(
            [
                pc.count_substring_regex(text, pat).to_numpy(zero_copy_only=False)
                for pat in self.patterns
            ]
        )  # (L, n)
        best = np.argmax(scores, axis=0)  # first max wins: deterministic
        no_hits = scores.max(axis=0) == 0
        langs = np.array(self.languages, dtype=object)[best]
        langs[no_hits] = "und"
        return batch.append_column("lang_pred", pa.array(langs, type=pa.string()))


# ---------------------------------------------------------------------------
# html -> text extraction
# ---------------------------------------------------------------------------
HTML_TAG_PATTERN = r"<[^>]*>"
#: unescape order matters: ``&amp;`` LAST, so a double-escaped sequence
#: like ``&amp;lt;`` round-trips to ``&lt;`` and not ``<``
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


class ExtractTextStage:
    """``html:binary`` -> extracted text (the BASELINE.json ``input_hint``
    per-row invariant: byte-identical extracted text per url).

    Minimal published extraction, fully vectorized: utf8-validate the
    binary payload, strip markup tags with one re2 pass, then unescape
    the five standard HTML entities.  Escape(text) -> wrap-in-tags ->
    extract is an exact identity for every text (escaping removes all
    raw ``<``, so the tag regex can only match real markup), which is
    what the round-trip oracle/pytest assert byte-for-byte.
    """

    def __init__(self, html_col: str = "html", out_col: str = "text_extracted"):
        self.html_col = html_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = pc.cast(batch[self.html_col], pa.string())  # utf8-validating
        s = pc.replace_substring_regex(s, HTML_TAG_PATTERN, "")
        for entity, ch in HTML_ENTITIES:
            s = pc.replace_substring(s, entity, ch)
        return batch.append_column(self.out_col, s)


def escape_html_text(text: pa.Array | pa.ChunkedArray):
    """Escape ``& < >`` (``&`` first — injective, exact inverse of the
    unescape pass in :class:`ExtractTextStage`)."""
    esc = pc.replace_substring(text, "&", "&amp;")
    esc = pc.replace_substring(esc, "<", "&lt;")
    return pc.replace_substring(esc, ">", "&gt;")


# ---------------------------------------------------------------------------
# rolling-hash fingerprint (winnowing-lite)
# ---------------------------------------------------------------------------
_B = np.uint64(1000003)  # odd base -> invertible mod 2^64
_BINV = np.uint64(pow(1000003, -1, 1 << 64))


def rolling_window_hashes(texts: pa.Array | pa.ChunkedArray, k: int = 16):
    """All k-byte rolling hashes for every string, one vectorized pass.

    Returns ``(hashes uint64[n_windows], doc_offsets int64[n_docs+1])``
    where ``hashes[doc_offsets[i]:doc_offsets[i+1]]`` are doc i's
    windows.  Window size is ``min(k, len)``: docs shorter than *k* get
    ONE window covering their whole text (so every non-empty doc has the
    same polynomial-hash definition — SQL-oracle-expressible); empty
    docs get zero windows.

    Math: with prefix transform ``G[j] = sum_{t<j} c[t] * B^{-t}`` the
    window hash ``H(i) = B^{i+w-1} * (G[i+w] - G[i])`` — all mod 2^64
    via natural uint64 wraparound, computed with two cumulative passes.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    buf = texts.cast(pa.binary())
    if isinstance(buf, pa.ChunkedArray):
        buf = buf.combine_chunks()
    if buf.null_count:
        buf = pc.coalesce(buf, pa.scalar(b"", pa.binary()))
    if buf.offset == 0:
        # zero-copy: binary array buffers = [validity, offsets, data]
        offsets = np.frombuffer(buf.buffers()[1], dtype=np.int32, count=len(buf) + 1).astype(np.int64)
        data = np.frombuffer(buf.buffers()[2], dtype=np.uint8, count=int(offsets[-1]))
    else:  # sliced array: fall back to a C-level join
        objs = buf.to_numpy(zero_copy_only=False)
        lens = np.fromiter((len(x) for x in objs), dtype=np.int64, count=len(objs))
        offsets = np.concatenate(([0], np.cumsum(lens)))
        data = np.frombuffer(b"".join(objs), dtype=np.uint8)
    n_total = int(offsets[-1])
    c = data[:n_total].astype(np.uint64)

    with np.errstate(over="ignore"):
        binv_pow = np.concatenate(
            ([np.uint64(1)], np.cumprod(np.full(max(n_total - 1, 0), _BINV, dtype=np.uint64)))
        ) if n_total else np.empty(0, np.uint64)
        g = c * binv_pow
        G = np.concatenate(([np.uint64(0)], np.cumsum(g, dtype=np.uint64)))
        b_pow = np.concatenate(
            ([np.uint64(1)], np.cumprod(np.full(max(n_total - 1, 0), _B, dtype=np.uint64)))
        ) if n_total else np.empty(0, np.uint64)

    doc_lens = np.diff(offsets.astype(np.int64))
    # min(k, len) windows: short non-empty docs contribute ONE whole-text window
    n_windows = np.where(doc_lens == 0, 0, np.maximum(doc_lens - k + 1, 1))
    doc_offsets = np.concatenate(([0], np.cumsum(n_windows)))
    total_w = int(doc_offsets[-1])
    if total_w == 0:
        return np.empty(0, np.uint64), doc_offsets
    # global start index + length of each window
    doc_starts = offsets[:-1].astype(np.int64)
    win_doc = np.repeat(np.arange(len(doc_lens)), n_windows)
    within = np.arange(total_w) - np.repeat(doc_offsets[:-1], n_windows)
    starts = doc_starts[win_doc] + within
    wlen = np.minimum(doc_lens[win_doc], k)
    with np.errstate(over="ignore"):
        h = b_pow[starts + wlen - 1] * (G[starts + wlen] - G[starts])
    return h, doc_offsets


class FingerprintStage:
    """Append ``fingerprint``: the MIN rolling ``min(k, len)``-gram hash
    per document (stored as int64 bit-pattern) — a content-defined
    fingerprint stable under reordering of documents and across runs.
    Short docs hash their whole text (one window); empty docs get 0.
    The whole definition is plain polynomial arithmetic mod 2^64, so a
    SQL oracle can recompute it (see ``oracle_sql()['doc_fingerprint']``)."""

    def __init__(self, text_col: str = "text", k: int = 16):
        self.text_col = text_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col].combine_chunks() if isinstance(
            batch[self.text_col], pa.ChunkedArray
        ) else batch[self.text_col]
        h, doc_offsets = rolling_window_hashes(text, self.k)
        n = batch.num_rows
        out = np.zeros(n, dtype=np.uint64)
        counts = np.diff(doc_offsets)
        has = counts > 0
        if h.size:
            mins = np.minimum.reduceat(h, doc_offsets[:-1][has])
            out[has] = mins
        return batch.append_column(
            "fingerprint", pa.array(out.view(np.int64), type=pa.int64())
        )


# ---------------------------------------------------------------------------
# word tokenization to flattened arrays (shared by dedup kernels)
# ---------------------------------------------------------------------------
def token_count_partials(texts) -> pa.Table:
    """Per-batch (token, cnt) partial counts over whitespace tokens
    (lowercased, empties dropped) — the combiner half of every global
    token count (``topk_tokens``, the count-min probe set); keep ALL
    consumers on this one definition so tokenization can never diverge
    between an operator and its oracle."""
    flat, _ = words_flat(texts)
    t = pa.table({"token": flat})
    g = t.group_by("token").aggregate([("token", "count")])
    g = g.rename_columns(["token", "cnt"])
    return g.filter(pc.not_equal(g["token"], ""))


def words_flat(texts, lowercase: bool = True):
    """Vectorized word tokenization: returns ``(flat_words pa.Array,
    offsets int64[n+1])`` using Arrow's split kernel (list-array
    internals expose the flattened values — no Python loop)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if lowercase:
        texts = pc.utf8_lower(texts)
    lists = pc.split_pattern_regex(texts, r"\s+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, offsets


# ---------------------------------------------------------------------------
# Gopher-style repetition signals (web-corpus quality filtering)
# ---------------------------------------------------------------------------
def _hash_utf8(arr: pa.Array) -> np.ndarray:
    """uint64 content hash over an Arrow string array (polars ahash over
    the Arrow buffers — no Python-object round-trip).  Used only for
    within-batch grouping, never persisted, so it needs no algo pin."""
    pl = import_polars()

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pl.from_arrow(arr).hash(seed=42).to_numpy(allow_copy=True)


class RepetitionStage:
    """Append the two Gopher repetition-filter signals per document:

    - ``dup_line_frac``  = (n_lines - n_distinct_lines) / n_lines
    - ``dup_char_frac``  = bytes in lines occurring >1 time / total line bytes

    (Rae et al. 2021, "Scaling Language Models" §A1.1 — boilerplate-heavy
    pages repeat nav/footer lines; both fractions are standard webtext
    drop signals.)  Fully vectorized: one Arrow split, one lexsort over
    (doc, line-hash), segment folds; ratios are exact integer divisions
    so a SQL oracle reproduces them bit-for-bit."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern(texts, "\n")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        n_lines = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(n_lines)
        doc = np.repeat(np.arange(n, dtype=np.int64), n_lines)
        lh = _hash_utf8(flat)
        lens = pc.binary_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((lh, doc))
        d2, h2, l2 = doc[order], lh[order], lens[order]
        first = np.r_[True, (d2[1:] != d2[:-1]) | (h2[1:] != h2[:-1])] if len(d2) else np.zeros(0, bool)
        grp = np.cumsum(first) - 1 if len(d2) else np.empty(0, np.int64)
        n_grps = int(grp[-1]) + 1 if len(d2) else 0
        grp_count = np.bincount(grp, minlength=n_grps)
        grp_doc = d2[first] if len(d2) else np.empty(0, np.int64)
        grp_len = l2[first] if len(d2) else np.empty(0, np.int64)
        n_distinct = np.bincount(grp_doc, minlength=n).astype(np.int64)
        tot_chars = np.bincount(grp_doc, weights=grp_count * grp_len, minlength=n)
        dup_chars = np.bincount(
            grp_doc, weights=np.where(grp_count > 1, grp_count * grp_len, 0), minlength=n
        )
        with np.errstate(invalid="ignore", divide="ignore"):
            dup_line_frac = np.where(
                n_lines > 0, (n_lines - n_distinct) / np.maximum(n_lines, 1), 0.0
            )
            dup_char_frac = np.where(tot_chars > 0, dup_chars / np.maximum(tot_chars, 1), 0.0)
        batch = batch.append_column("dup_line_frac", pa.array(dup_line_frac, pa.float64()))
        return batch.append_column("dup_char_frac", pa.array(dup_char_frac, pa.float64()))


class NgramRepetitionStage:
    """Word-n-gram repetition signals (Gopher §A1.1, Rae et al. 2021):

    - ``top{N}_char_frac`` — fraction of n-gram characters covered by the
      single heaviest n-gram (count × chars, N = ``top_n``, default 2),
    - ``dup{M}_char_frac`` — fraction of n-gram characters inside n-grams
      occurring more than once (M = ``dup_n``, default 5).

    Deviation from the paper, on purpose: "most frequent n-gram" is
    replaced by argmax of count×chars and overlapping duplicate n-grams
    count characters per occurrence — both make the signal a pure
    integer ratio, deterministic under any traversal order, and exactly
    reproducible by a SQL oracle (DuckDB ``string_split`` +
    ``generate_series`` n-gram join).  Words split on a single space to
    match ``string_split(text, ' ')`` byte-for-byte.

    Vectorized: one Arrow split per batch, uint64 word hashes, an FNV
    fold across n shifted views (no per-row loop), one lexsort per n,
    segment folds via ``bincount`` / ``maximum.at``."""

    _FNV = np.uint64(1099511628211)

    def __init__(self, text_col: str = "text", top_n: int = 2, dup_n: int = 5):
        self.text_col = text_col
        self.top_n = top_n
        self.dup_n = dup_n

    def _fracs(self, wh, wl, cnt, starts, csl, n):
        """(top_frac, dup_frac) float64[n_docs] for word-n-gram size n."""
        ndocs = len(cnt)
        g = np.maximum(cnt - n + 1, 0)
        total = int(g.sum())
        if total == 0:
            z = np.zeros(ndocs, np.float64)
            return z, z
        gdoc = np.repeat(np.arange(ndocs, dtype=np.int64), g)
        gstart = np.r_[0, np.cumsum(g)]
        off = np.repeat(starts[:-1], g) + (np.arange(total) - np.repeat(gstart[:-1], g))
        h = np.zeros(total, np.uint64)
        with np.errstate(over="ignore"):
            for j in range(n):
                h = h * self._FNV + wh[off + j]
        gc = csl[off + n] - csl[off] + (n - 1)  # word bytes + (n-1) separators
        order = np.lexsort((h, gdoc))
        d2, h2, c2 = gdoc[order], h[order], gc[order]
        firsts = np.r_[True, (d2[1:] != d2[:-1]) | (h2[1:] != h2[:-1])]
        grp = np.cumsum(firsts) - 1
        grp_cnt = np.bincount(grp)
        grp_doc = d2[firsts]
        grp_gc = c2[firsts]
        weight = (grp_cnt * grp_gc).astype(np.float64)
        tot = np.bincount(grp_doc, weights=weight, minlength=ndocs)
        top = np.zeros(ndocs, np.float64)
        np.maximum.at(top, grp_doc, weight)
        dup = np.bincount(
            grp_doc, weights=np.where(grp_cnt > 1, weight, 0.0), minlength=ndocs
        )
        with np.errstate(invalid="ignore", divide="ignore"):
            top_frac = np.where(tot > 0, top / np.maximum(tot, 1), 0.0)
            dup_frac = np.where(tot > 0, dup / np.maximum(tot, 1), 0.0)
        return top_frac, dup_frac

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern(texts, " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        cnt = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.r_[0, np.cumsum(cnt)]
        wh = _hash_utf8(flat)
        wl = pc.binary_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        csl = np.r_[0, np.cumsum(wl)]
        top_frac, _ = self._fracs(wh, wl, cnt, starts, csl, self.top_n)
        _, dup_frac = self._fracs(wh, wl, cnt, starts, csl, self.dup_n)
        batch = batch.append_column(
            f"top{self.top_n}_char_frac", pa.array(top_frac, pa.float64())
        )
        return batch.append_column(
            f"dup{self.dup_n}_char_frac", pa.array(dup_frac, pa.float64())
        )


# ---------------------------------------------------------------------------
# PII redaction (C4/CCNet-style pre-training scrub)
# ---------------------------------------------------------------------------
#: applied in ORDER (email before phone so the digits of user42@... are
#: already masked); both Arrow and DuckDB run RE2, so the same pattern
#: strings produce byte-identical redactions in engine and oracle
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d() .-]{6,}\d", "<PHONE>"),
)


class PiiRedactStage:
    """Mask emails / IPv4 addresses / phone-like digit runs with typed
    placeholder tokens and count the redactions per class — the standard
    pre-training privacy scrub (C4 and CCNet both ship a variant).

    All matching/replacing runs inside Arrow's vectorized re2 kernels;
    per-class counts are taken BEFORE replacement so downstream filters
    can drop PII-dense documents cheaply."""

    def __init__(self, text_col: str = "text", out_col: str = "text_redacted"):
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch[self.text_col]
        # count each class on the text AFTER the previous classes were
        # masked (an IPv4 also matches the phone pattern; sequential
        # counting attributes it once, to the more specific class)
        for name, pat, repl in PII_PATTERNS:
            batch = batch.append_column(
                f"n_{name}", pc.cast(pc.count_substring_regex(s, pat), pa.int64())
            )
            s = pc.replace_substring_regex(s, pat, repl)
        return batch.append_column(self.out_col, s)


# ---------------------------------------------------------------------------
# TF-IDF top-k terms (search / indexing analytics)
# ---------------------------------------------------------------------------
def doc_token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, token, tf) rows per batch — each document row lives in
    exactly one batch, so per-batch grouping gives exact per-doc counts
    (one vectorized Arrow split + hash group-by, no Python loop)."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.split_pattern(texts, " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    n_words = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    t = pa.table(
        {
            "doc_id": pa.array(np.repeat(doc_ids, n_words), pa.int64()),
            "token": lists.flatten(),
        }
    )
    g = t.group_by(["doc_id", "token"]).aggregate([([], "count_all")])
    return g.rename_columns(["doc_id", "token", "tf"])


class TfidfTopKStage:
    """Attach ``tfidf = (tf * n_docs) / df`` from a broadcast DF table
    and keep each document's top-``k`` terms (ties break token-asc).

    The DF side is vocabulary-sized (tiny next to the corpus), so it is
    broadcast once via ``ray.put`` and looked up with a vectorized
    ``index_in`` — no shuffle join.  The score is a pure integer ratio:
    idf is ``n_docs/df`` instead of ``ln(n_docs/df)`` precisely so the
    DuckDB oracle reproduces every double bit-for-bit (numpy's SIMD
    ``log`` and libm may differ in the last ulp); the ranking this
    produces is the object under test, not the absolute weights."""

    def __init__(self, df_ref, n_docs: int, k: int = 3):
        import ray

        df_tbl = ray.get(df_ref) if not isinstance(df_ref, pa.Table) else df_ref
        self.df_tokens = df_tbl["token"].combine_chunks()
        self.df_counts = df_tbl["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        self.n_docs = n_docs
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "tfidf": pa.array([], pa.float64()),
                    "rnk": pa.array([], pa.int64()),
                }
            )
        idx = pc.index_in(batch["token"], value_set=self.df_tokens)
        df = self.df_counts[idx.to_numpy(zero_copy_only=False)]
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        score = (tf * self.n_docs) / df  # exact: int64 product, one division
        t = batch.append_column("tfidf", pa.array(score, pa.float64()))
        order = pc.sort_indices(
            t,
            sort_keys=[
                ("doc_id", "ascending"),
                ("tfidf", "descending"),
                ("token", "ascending"),
            ],
        )
        t = t.take(order)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        n = len(d)
        first = np.r_[True, d[1:] != d[:-1]]
        seg_start = np.maximum.accumulate(np.where(first, np.arange(n), 0))
        rank = np.arange(n) - seg_start
        t = t.append_column("rnk", pa.array(rank + 1, pa.int64()))
        return t.filter(pa.array(rank < self.k)).select(
            ["doc_id", "token", "tfidf", "rnk"]
        )


# ---------------------------------------------------------------------------
# sequence packing (distributed prefix sum over token counts)
# ---------------------------------------------------------------------------
def bucket_token_sums(batch: pa.Table, bucket: int) -> pa.Table:
    """(bucket, bn) partial sums per batch — pass A of the distributed
    prefix sum.  Output is bucket-granular (tiny), so the global groupby
    that follows shuffles almost nothing."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    t = pa.table(
        {
            "bucket": pa.array(ids // bucket, pa.int64()),
            "bn": batch["n_tokens_ws"],
        }
    )
    g = t.group_by("bucket").aggregate([("bn", "sum")])
    return g.rename_columns(["bucket", "bn"])


def assign_bins_in_bucket(
    group: pa.Table, offsets: np.ndarray, bin_tokens: int
) -> pa.Table:
    """Pass B: inside one doc_id bucket (co-located by the groupby),
    sort by doc_id, add the bucket's exclusive prefix offset, and assign
    ``bin_id = tokens_before_this_doc // bin_tokens``.  Pure integer
    arithmetic — a SQL window cumsum reproduces it exactly."""
    order = pc.sort_indices(group, sort_keys=[("doc_id", "ascending")])
    g = group.take(order)
    n = g["n_tokens_ws"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = int(g["bucket"][0].as_py())
    cum_before = int(offsets[b]) + np.cumsum(n) - n
    return pa.table(
        {
            "doc_id": g["doc_id"],
            "n_tokens_ws": g["n_tokens_ws"],
            "bin_id": pa.array(cum_before // bin_tokens, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# sessionization (gap-based session windows)
# ---------------------------------------------------------------------------
def session_cuts(group: pa.Table, gap_us: int):
    """THE session-cut rule both sessionization operators and both SQL
    oracles must agree on: sort one user's events by (ts, event_id) and
    start a new session when the gap to the previous event EXCEEDS
    ``gap_us`` (strictly greater — matches the oracle's ``> 1800000000``).
    Returns ``(sorted_group, ts_int64_us, new_session_mask)``."""
    order = pc.sort_indices(
        group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
    )
    g = group.take(order)
    ts = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
    new = np.r_[True, np.diff(ts) > gap_us]
    return g, ts, new


def sessionize_user(group: pa.Table, gap_us: int) -> pa.Table:
    """Assign per-user session ids inside one user's co-located event
    group (vectorized cumsum over the shared ``session_cuts`` rule;
    session ids start at 1 per user, matching the SQL window-cumsum
    oracle exactly)."""
    g, _, new = session_cuts(group, gap_us)
    return pa.table(
        {
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "session_id": pa.array(np.cumsum(new), pa.int64()),
        }
    )

# ---------------------------------------------------------------------------
# word splitting / n-gram hashing / chunking / benchmark decontamination
# ---------------------------------------------------------------------------
_FNV64 = np.uint64(1099511628211)


def split_words(texts):
    """Split on a single space — byte-for-byte ``string_split(text, ' ')``
    (an empty document yields one empty word on both sides).  Returns
    ``(flat_words, counts int64[n_docs], starts int64[n_docs+1])``."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.split_pattern(texts, " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    cnt = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.r_[0, np.cumsum(cnt)]
    return lists.flatten(), cnt, starts


def word_ngram_hashes(texts, n: int):
    """uint64 hashes of every word-``n``-gram, flattened across the batch.

    Returns ``(hashes uint64[total_grams], grams_per_doc int64[n_docs])``.
    Words are 64-bit-hashed (polars ahash, fixed seed — deterministic
    across processes for a pinned polars version, so hashes computed in
    one Ray task compare equal in another) and FNV-folded across the
    ``n`` shifted views: no gram strings are ever materialized and no
    Python loop touches a row.  Collisions (~2^-64 per pair) are
    negligible, so equality of hashes ≡ equality of gram strings and a
    string-grouping SQL oracle reproduces downstream counts exactly."""
    flat, cnt, starts = split_words(texts)
    wh = _hash_utf8(flat)
    g = np.maximum(cnt - n + 1, 0)
    total = int(g.sum())
    if total == 0:
        return np.empty(0, np.uint64), g
    gstart = np.r_[0, np.cumsum(g)]
    off = np.repeat(starts[:-1], g) + (np.arange(total) - np.repeat(gstart[:-1], g))
    h = np.zeros(total, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            h = h * _FNV64 + wh[off + j]
    return h, g


def chunk_docs(
    batch: pa.Table,
    size: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Fixed-token-window chunking for LLM pre-training: split each doc
    into word windows of ``size`` starting every ``stride`` words (the
    ``size - stride`` word overlap preserves context across boundaries).

    Chunk ``i`` of a doc covers words ``[i*stride, min(i*stride+size,
    n_words))``; every doc emits at least one chunk.  Fully vectorized:
    one Arrow split, numpy window-index arithmetic, one ``take`` to
    gather the (overlapping) word windows into a fresh list array, one
    ``binary_join`` to re-assemble chunk text.  Emits (doc_id,
    chunk_idx, n_words, chunk) — one row per chunk, so the stage is a
    row-expanding ``map_batches`` (flat_map semantics without per-row
    Python)."""
    flat, cnt, starts = split_words(batch[text_col])
    n_chunks = (cnt + stride - 1) // stride
    total = int(n_chunks.sum())
    doc_rep = np.repeat(np.arange(len(cnt), dtype=np.int64), n_chunks)
    gs = np.r_[0, np.cumsum(n_chunks)]
    cidx = np.arange(total, dtype=np.int64) - np.repeat(gs[:-1], n_chunks)
    wstart = cidx * stride
    wend = np.minimum(wstart + size, cnt[doc_rep])
    clen = wend - wstart
    abs_start = starts[doc_rep] + wstart
    cs = np.r_[0, np.cumsum(clen)]
    gather = np.repeat(abs_start, clen) + (
        np.arange(int(cs[-1]), dtype=np.int64) - np.repeat(cs[:-1], clen)
    )
    new_flat = flat.take(pa.array(gather, pa.int64()))
    if isinstance(new_flat, pa.ChunkedArray):
        new_flat = new_flat.combine_chunks()
    chunk_lists = pa.LargeListArray.from_arrays(
        pa.array(cs, pa.int64()), pc.cast(new_flat, pa.large_string())
    )
    chunk_text = pc.cast(
        pc.binary_join(chunk_lists, pa.scalar(" ", pa.large_string())), pa.string()
    )
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table(
        {
            id_col: ids.take(pa.array(doc_rep, pa.int64())),
            "chunk_idx": pa.array(cidx, pa.int64()),
            "n_words": pa.array(clen, pa.int64()),
            "chunk": chunk_text,
        }
    )


def bench_gram_table(batch: pa.Table, n: int = 8, text_col: str = "text") -> pa.Table:
    """Distinct word-n-gram hashes of one batch of benchmark docs —
    the tiny side of the decontamination broadcast."""
    h, _ = word_ngram_hashes(batch[text_col], n)
    return pa.table({"gh": pa.array(np.unique(h), pa.uint64())})


def contamination_counts(
    batch: pa.Table,
    bench_ref=None,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Benchmark decontamination scan (GPT-3 §C / PaLM-style n-gram
    overlap): count, per training doc, the word-n-gram occurrences that
    also appear in the held-out benchmark set.

    ``bench_ref`` is a ``ray.put`` ObjectRef of the SORTED uint64
    benchmark gram-hash array — plasma-local and zero-copy on every
    worker after the first task, so the corpus side streams with no
    shuffle.  Membership is one vectorized ``searchsorted`` per batch."""
    import ray

    bench = bench_ref if isinstance(bench_ref, np.ndarray) else ray.get(bench_ref)
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    h, g = word_ngram_hashes(batch[text_col], n)
    nh = np.zeros(len(g), np.int64)
    if len(h) and len(bench):
        doc_rep = np.repeat(np.arange(len(g), dtype=np.int64), g)
        pos = np.searchsorted(bench, h)
        hit = (pos < len(bench)) & (bench[np.minimum(pos, len(bench) - 1)] == h)
        nh = np.bincount(doc_rep[hit], minlength=len(g)).astype(np.int64)
    return pa.table(
        {
            id_col: ids,
            "n_contaminated": pa.array(nh, pa.int64()),
            "contaminated": pa.array((nh > 0).astype(np.int64), pa.int64()),
        }
    )
