"""Text-analysis kernels over Arrow string columns — all vectorized via
pyarrow.compute (RE2) with zero Python-per-row work.

These are the large-scale training-data-pipeline ops: token counting,
quality scoring, language-marker id, document fingerprinting. Counting
is done with RE2 patterns whose semantics an ANSI-SQL oracle reproduces
exactly (DuckDB regexp_* is also RE2), so ratios computed from the same
integers divide to bit-identical doubles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[A-Za-z0-9]+"
# BPE-ish word/number/punct splitter (GPT-2 style, simplified to RE2)
BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+|\s+"

STOPWORDS_EN = ("the", "and", "of", "a", "to", "in", "is", "for")

LANG_MARKERS = [
    # (lang, RE2 marker pattern) — checked in order, most counts wins,
    # ties broken by list order (deterministic; SQL CASE replicates)
    ("en", r"\b(the|and|of)\b"),
    ("de", r"\b(der|die|das|und)\b"),
    ("fr", r"\b(le|la|les|et)\b"),
    ("es", r"\b(el|los|las|y)\b"),
]


def token_count(arr: pa.ChunkedArray, pattern: str = TOKEN_RE) -> pa.Array:
    return pc.count_substring_regex(arr, pattern)


def char_class_counts(arr):
    """(n_alpha, n_digit, n_space, n_punct) int64 arrays."""
    n_alpha = pc.count_substring_regex(arr, r"[A-Za-z]")
    n_digit = pc.count_substring_regex(arr, r"[0-9]")
    n_space = pc.count_substring_regex(arr, r"\s")
    n_len = pc.utf8_length(arr)
    n_punct = pc.subtract(n_len, pc.add(pc.add(n_alpha, n_digit), n_space))
    return n_alpha, n_digit, n_space, n_punct, n_len


def quality_batch(batch: pa.Table, text_col="text", id_col="doc_id") -> pa.Table:
    """Per-doc quality features: all ratios are divisions of identical
    integers => bit-identical to the SQL oracle."""
    arr = batch[text_col]
    n_alpha, n_digit, n_space, n_punct, n_len = char_class_counts(arr)
    n_tok = token_count(arr)
    n_stop = pc.count_substring_regex(arr, r"\b(?:%s)\b" % "|".join(STOPWORDS_EN))
    lenf = pc.cast(n_len, pa.float64())
    tokf = pc.cast(n_tok, pa.float64())
    safe_len = pc.max_element_wise(lenf, pa.scalar(1.0))
    safe_tok = pc.max_element_wise(tokf, pa.scalar(1.0))
    return pa.table({
        id_col: batch[id_col],
        "n_chars_seen": pc.cast(n_len, pa.int64()),
        "n_tokens": pc.cast(n_tok, pa.int64()),
        "n_stopwords": pc.cast(n_stop, pa.int64()),
        "alpha_ratio": pc.divide(pc.cast(n_alpha, pa.float64()), safe_len),
        "digit_ratio": pc.divide(pc.cast(n_digit, pa.float64()), safe_len),
        "punct_ratio": pc.divide(pc.cast(n_punct, pa.float64()), safe_len),
        "stopword_ratio": pc.divide(pc.cast(n_stop, pa.float64()), safe_tok),
        "avg_token_len": pc.divide(pc.cast(n_alpha, pa.float64()), safe_tok),
    })


def lang_id_batch(batch: pa.Table, text_col="text", id_col="doc_id") -> pa.Table:
    """Marker-count language id; deterministic argmax with first-wins
    tie-break — replicated by a SQL CASE over the same counts."""
    arr = batch[text_col]
    counts = [pc.count_substring_regex(arr, pat).to_numpy(zero_copy_only=False)
              for _, pat in LANG_MARKERS]
    mat = np.stack(counts, axis=1)
    best = np.argmax(mat, axis=1)  # first max wins (list order)
    langs = np.array([l for l, _ in LANG_MARKERS])
    pred = langs[best]
    pred = np.where(mat.max(axis=1) > 0, pred, "und")
    out = {id_col: batch[id_col], "pred_lang": pa.array(pred, pa.string())}
    for (l, _), c in zip(LANG_MARKERS, counts):
        out[f"n_{l}"] = pa.array(c, pa.int64())
    return pa.table(out)


_M61 = np.uint64((1 << 61) - 1)
_FP_BASE = np.uint64(1000003)


def _mod61(x: np.ndarray) -> np.ndarray:
    """Reduce values < 2^62 modulo the Mersenne prime 2^61-1."""
    x = (x & _M61) + (x >> np.uint64(61))
    return np.where(x >= _M61, x - _M61, x)


def _mulmod_base61(acc: np.ndarray) -> np.ndarray:
    """acc * 1000003 mod (2^61-1), acc < 2^61, without 128-bit ints:
    split acc into 32-bit halves; the high product's *2^32 is folded
    through 2^61 == 1 (Mersenne)."""
    a_lo = acc & np.uint64(0xFFFFFFFF)
    a_hi = acc >> np.uint64(32)
    p_lo = a_lo * _FP_BASE                    # < 2^52
    p_hi = a_hi * _FP_BASE                    # < 2^49
    z_hi = p_hi >> np.uint64(29)
    z_lo = p_hi & np.uint64((1 << 29) - 1)
    # p_hi * 2^32 = z_hi * 2^61 + z_lo * 2^32  ==  z_hi + z_lo<<32 (mod M)
    total = p_lo + z_hi + (z_lo << np.uint64(32))   # < 2^62
    return _mod61(total)


def _mulmod61(x: np.ndarray, v: int) -> np.ndarray:
    """x * v mod (2^61-1) for x < 2^61 and a scalar v < 2^61, via
    32-bit splitting of x and Mersenne folding of the partial shifts."""
    v = int(v)
    v_lo = np.uint64(v & 0xFFFFFFFF)
    v_hi = np.uint64(v >> 32)
    x_lo = x & np.uint64(0xFFFFFFFF)
    x_hi = x >> np.uint64(32)
    # x*v = x_lo*v_lo + (x_lo*v_hi + x_hi*v_lo)*2^32 + x_hi*v_hi*2^64
    p0 = _mod61(x_lo * v_lo)                        # < 2^64? x_lo,v_lo<2^32 -> <2^64; fold twice
    p0 = _mod61(p0)
    mid = _mod61(_mod61(x_lo * v_hi) + _mod61(x_hi * v_lo))   # < M each
    # mid * 2^32 mod M
    m_hi = mid >> np.uint64(29)
    m_lo = mid & np.uint64((1 << 29) - 1)
    p1 = _mod61(m_hi + (m_lo << np.uint64(32)))
    # x_hi*v_hi < 2^58; *2^64 == *2^3 (mod M, since 2^61==1)
    p2 = _mod61((x_hi * v_hi) << np.uint64(3))
    return _mod61(_mod61(p0 + p1) + p2)


def rolling_fingerprints(texts, window: int = 32) -> np.ndarray:
    """Per-doc min of rolling window polynomial hashes mod 2^61-1.

    Vectorized ACROSS documents: one pass per byte position, all docs
    advanced together with the O(1)-per-position rolling update (same
    op count as the scalar Rabin-Karp, numpy-wide instead of per-doc).
    Whole-doc hash for docs shorter than the window; 0 for empty.
    Caveat: pass count = max doc length in the batch, so a single
    huge outlier document degrades the batch — cap batch doc length
    upstream if corpora carry multi-MB rows."""
    from .dedup import _utf8_buffer

    data, off = _utf8_buffer(texts)
    n = len(off) - 1
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    lens = off[1:] - off[:-1]
    lo, hi = int(off[0]), int(off[-1])
    b = data[lo:hi].astype(np.uint64)
    starts = (off[:-1] - lo).astype(np.int64)
    max_len = int(lens.max()) if n else 0
    MOD = (1 << 61) - 1
    P = pow(1000003, window - 1, MOD)  # BASE^(w-1) for the rolling drop

    h = np.zeros(n, dtype=np.uint64)
    best = np.full(n, np.iinfo(np.uint64).max, dtype=np.uint64)
    last = max(b.size - 1, 0)
    with np.errstate(over="ignore"):
        for t in range(max_len):
            act = t < lens
            idx = np.minimum(starts + t, last)
            inc = b[idx]
            if t >= window:
                # drop the outgoing byte: h -= b[t-w] * BASE^(w-1)
                out = b[np.minimum(starts + (t - window), last)]
                drop = _mulmod61(out, P)
                h2 = _mod61(h + (_M61 - drop))
            else:
                h2 = h
            h2 = _mod61(_mulmod_base61(h2) + inc)
            h = np.where(act, h2, h)
            if t >= window - 1:
                upd = act & (lens > window)
                np.minimum(best, np.where(upd, h, best), out=best)
    return np.where(lens > window, best, np.where(lens > 0, h, 0)).astype(np.uint64)


def fingerprint_batch(batch: pa.Table, text_col="text", id_col="doc_id",
                      window=32) -> pa.Table:
    """Rolling polynomial fingerprint (Rabin-Karp style, mod 2^61-1):
    one fingerprint per document = min of rolling window hashes —
    shift-invariant doc signature. Fully vectorized across the batch
    (Mersenne mulmod passes + segmented min; no per-doc loop)."""
    fps = rolling_fingerprints(batch[text_col], window=window)
    return pa.table({id_col: batch[id_col], "fingerprint": pa.array(fps, pa.uint64())})


def repetition_batch(batch: pa.Table, text_col="text",
                     id_col="doc_id") -> pa.Table:
    """Gopher-style repetition quality signals per document (the web-text
    filtering rules of Rae et al. 2021 §A1.1, public paper): duplicate-line
    fraction (by line count and by characters), most-frequent-word
    fraction and most-frequent-word-2-gram fraction.

    Everything is computed from exploded (doc, token) pairs with pandas
    C-path groupbys inside ONE batch — a document's lines/words never
    leave the UDF invocation, so the stage is an embarrassingly parallel
    map with no shuffle (100-TB shape: per-doc state is bounded by the
    doc itself).

    Exactness vs the SQL oracle: every count is an identical integer on
    both sides (lines = split on chr(10); words = RE2 ``\\S+`` tokens,
    reproduced here as split-on-``\\s+`` minus empties; bigrams = adjacent
    word pairs joined by one space), and every ratio is a single
    int->double division with a greatest(x, 1) guard, so the doubles are
    bit-identical.
    """
    import pandas as pd

    n = batch.num_rows
    out_ids = batch[id_col]

    # ---- lines: string_split(text, chr(10)) semantics
    lines = pc.split_pattern(batch[text_col], "\n")
    lflat = pc.list_flatten(lines)
    lpar = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    lchars = pc.utf8_length(lflat).to_numpy(zero_copy_only=False).astype(np.int64)
    ldf = pd.DataFrame({"d": lpar, "line": lflat.to_pandas(), "c": lchars})
    n_lines = np.zeros(n, np.int64)
    n_distinct_lines = np.zeros(n, np.int64)
    line_chars = np.zeros(n, np.int64)
    distinct_line_chars = np.zeros(n, np.int64)
    if len(ldf):
        lg = ldf.groupby("d")
        s = lg.size()
        n_lines[s.index.to_numpy()] = s.to_numpy()
        u = lg["line"].nunique()
        n_distinct_lines[u.index.to_numpy()] = u.to_numpy()
        t = lg["c"].sum()
        line_chars[t.index.to_numpy()] = t.to_numpy()
        du = ldf.drop_duplicates(["d", "line"]).groupby("d")["c"].sum()
        distinct_line_chars[du.index.to_numpy()] = du.to_numpy()

    # ---- words: RE2 \S+ tokens == split on \s+ runs, empties dropped
    wsplit = pc.split_pattern_regex(batch[text_col], r"\s+")
    wflat = pc.list_flatten(wsplit)
    wpar = pc.list_parent_indices(wsplit).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(pc.utf8_length(wflat), 0).to_numpy(zero_copy_only=False)
    words = wflat.to_pandas().to_numpy()[keep]
    wpar = wpar[keep]
    n_words = np.bincount(wpar, minlength=n).astype(np.int64)
    top_word = np.zeros(n, np.int64)
    if len(words):
        tc = (pd.DataFrame({"d": wpar, "w": words})
              .groupby(["d", "w"]).size().groupby(level=0).max())
        top_word[tc.index.to_numpy()] = tc.to_numpy()

    # ---- word 2-grams: adjacent same-doc pairs, joined by one space
    n_bigrams = np.maximum(n_words - 1, 0)
    top_bigram = np.zeros(n, np.int64)
    if len(words) > 1:
        adj = wpar[1:] == wpar[:-1]
        if adj.any():
            bd = wpar[:-1][adj]
            bg = (pd.Series(words[:-1][adj])
                  .str.cat(pd.Series(words[1:][adj]), sep=" ").to_numpy())
            bc = (pd.DataFrame({"d": bd, "b": bg})
                  .groupby(["d", "b"]).size().groupby(level=0).max())
            top_bigram[bc.index.to_numpy()] = bc.to_numpy()

    n_dup_lines = n_lines - n_distinct_lines

    def frac(num, den):
        return num.astype(np.float64) / np.maximum(den, 1).astype(np.float64)

    return pa.table({
        id_col: out_ids,
        "n_lines": pa.array(n_lines, pa.int64()),
        "n_dup_lines": pa.array(n_dup_lines, pa.int64()),
        "dup_line_frac": pa.array(frac(n_dup_lines, n_lines), pa.float64()),
        "dup_line_char_frac": pa.array(
            frac(line_chars - distinct_line_chars, line_chars), pa.float64()),
        "n_words": pa.array(n_words, pa.int64()),
        "top_word_count": pa.array(top_word, pa.int64()),
        "top_word_frac": pa.array(frac(top_word, n_words), pa.float64()),
        "n_bigrams": pa.array(n_bigrams, pa.int64()),
        "top_bigram_count": pa.array(top_bigram, pa.int64()),
        "top_bigram_frac": pa.array(frac(top_bigram, n_bigrams), pa.float64()),
    })


def _doc_words(batch: pa.Table, text_col: str, id_col: str):
    """(words, word->doc parent index, doc ids) for a batch — the shared
    RE2-``\\S+``-equivalent word stream (split on \\s+, empties dropped,
    order preserved) used by the term/ngram exploders."""
    wsplit = pc.split_pattern_regex(batch[text_col], r"\s+")
    wflat = pc.list_flatten(wsplit)
    wpar = pc.list_parent_indices(wsplit).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(pc.utf8_length(wflat), 0).to_numpy(zero_copy_only=False)
    words = wflat.to_pandas().to_numpy()[keep]
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    return words, wpar[keep], ids


def _doc_ngrams(batch: pa.Table, n: int, text_col: str, id_col: str):
    """Space-joined word n-grams per document: (grams, gram->doc parent
    index, doc ids). A position starts a gram iff all n words share the
    document; grams match the SQL ``ws[k] || ' ' || ... || ws[k+n-1]``
    spelling exactly."""
    words, wpar, ids = _doc_words(batch, text_col, id_col)
    m = words.size - (n - 1)
    if m <= 0:
        return (np.empty(0, dtype=object), np.empty(0, dtype=np.int64), ids)
    valid = wpar[: m] == wpar[n - 1:]
    grams = words[: m]
    for k in range(1, n):
        grams = grams + " "
        grams = grams + words[k: m + k]
    return grams[valid], wpar[: m][valid], ids


def _doc_ngram_positions(batch: pa.Table, n: int, text_col: str,
                         id_col: str):
    """Like _doc_ngrams but also returns each gram's 0-based WORD
    position within its document: (grams, gram->doc parent index,
    positions, doc ids).  Positions are what span-merging dedup
    (ExactSubstr family) needs; gram spelling is identical to
    _doc_ngrams / the SQL ``ws[k] || ' ' || ...``."""
    words, wpar, ids = _doc_words(batch, text_col, id_col)
    m = words.size - (n - 1)
    if m <= 0:
        return (np.empty(0, dtype=object), np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64), ids)
    # word position within doc: arange minus each doc-run's start index
    run_start = np.r_[True, wpar[1:] != wpar[:-1]]
    start_idx = np.maximum.accumulate(
        np.where(run_start, np.arange(wpar.size, dtype=np.int64), 0))
    pos = np.arange(wpar.size, dtype=np.int64) - start_idx
    valid = wpar[: m] == wpar[n - 1:]
    grams = words[: m]
    for k in range(1, n):
        grams = grams + " "
        grams = grams + words[k: m + k]
    return grams[valid], wpar[: m][valid], pos[: m][valid], ids


def merge_dup_spans(d: np.ndarray, p: np.ndarray, n: int) -> "pd.DataFrame":
    """Gaps-and-islands merge of length-``n`` gram hits into maximal
    spans: hits at positions p, p' of the SAME doc merge when
    p' - p <= n (overlapping or contiguous coverage).  Input must be
    sorted by (doc, pos).  Returns per-doc (doc_id, n_spans,
    dup_tokens) where dup_tokens counts covered WORD positions —
    exactly the SQL lag()/running-sum island query."""
    import pandas as pd

    if d.size == 0:
        return pd.DataFrame({"doc_id": np.empty(0, np.int64),
                             "n_spans": np.empty(0, np.int64),
                             "dup_tokens": np.empty(0, np.int64)})
    brk = np.r_[True, (d[1:] != d[:-1]) | (p[1:] - p[:-1] > n)]
    starts = np.flatnonzero(brk)
    ends = np.r_[starts[1:], d.size] - 1
    spans = pd.DataFrame({"doc_id": d[starts].astype(np.int64),
                          "covered": (p[ends] - p[starts] + n)
                          .astype(np.int64)})
    return spans.groupby("doc_id", as_index=False).agg(
        n_spans=("covered", "size"), dup_tokens=("covered", "sum"))


def doc_ngram_freqs(batch: pa.Table, n: int = 3, text_col="text",
                    id_col="doc_id") -> pa.Table:
    """Explode a batch into (doc_id, gram, tf) rows — one row per
    DISTINCT word n-gram per document, tf = number of positions. Docs
    are rows, so counts are globally correct with no shuffle."""
    import pandas as pd

    grams, gpar, ids = _doc_ngrams(batch, n, text_col, id_col)
    g = (pd.DataFrame({"doc_id": ids[gpar], "gram": grams})
         .groupby(["doc_id", "gram"], as_index=False).size())
    return pa.table({
        "doc_id": pa.array(g["doc_id"].to_numpy(np.int64), pa.int64()),
        "gram": pa.array(g["gram"].to_numpy(), pa.string()),
        "tf": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
    })


def dup_ngram_stats_frame(doc_ids: np.ndarray, gpar: np.ndarray,
                          dup_mask: np.ndarray, n_rows: int) -> pa.Table:
    """Per-doc totals from a gram stream: n_ngrams, n_dup_ngrams (gram
    positions whose gram is corpus-duplicated) and the guarded ratio —
    one int->double division, bit-identical to the SQL twin."""
    n_ngrams = np.bincount(gpar, minlength=n_rows).astype(np.int64)
    n_dup = np.bincount(gpar[dup_mask], minlength=n_rows).astype(np.int64)
    frac = n_dup.astype(np.float64) / np.maximum(n_ngrams, 1).astype(np.float64)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "n_ngrams": pa.array(n_ngrams, pa.int64()),
        "n_dup_ngrams": pa.array(n_dup, pa.int64()),
        "dup_ngram_frac": pa.array(frac, pa.float64()),
    })


def doc_term_freqs(batch: pa.Table, text_col="text",
                   id_col="doc_id") -> pa.Table:
    """Explode a batch into (doc_id, term, tf) rows — one row per
    DISTINCT term per document (RE2 ``\\S+`` tokens, exact strings).
    The per-doc counting is one pandas C-path groupby inside the batch;
    a document's terms never straddle batches (docs are rows), so tf is
    globally correct with no shuffle."""
    import pandas as pd

    wsplit = pc.split_pattern_regex(batch[text_col], r"\s+")
    wflat = pc.list_flatten(wsplit)
    wpar = pc.list_parent_indices(wsplit).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(pc.utf8_length(wflat), 0).to_numpy(zero_copy_only=False)
    words = wflat.to_pandas().to_numpy()[keep]
    wpar = wpar[keep]
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    g = (pd.DataFrame({"doc_id": ids[wpar], "term": words})
         .groupby(["doc_id", "term"], as_index=False).size())
    return pa.table({
        "doc_id": pa.array(g["doc_id"].to_numpy(np.int64), pa.int64()),
        "term": pa.array(g["term"].to_numpy(), pa.string()),
        "tf": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
    })


def tfidf_topk_frame(df, n_docs: int, topk: int) -> pa.Table:
    """Rank a (doc_id, term, tf, df) frame by the deterministic tf-idf
    score tf * (N / df) and keep the top-k terms per doc.

    The score is exactly two IEEE f64 ops (divide then multiply) on
    exact integers, so it is bit-identical to the SQL twin — no libm,
    no rounding guard needed; ties break on term ascending (same
    collation both engines for ASCII tokens)."""
    import pandas as pd

    score = df["tf"].to_numpy().astype(np.float64) * (
        float(n_docs) / df["df"].to_numpy().astype(np.float64))
    out = df.assign(score=score).sort_values(
        ["doc_id", "score", "term"], ascending=[True, False, True],
        kind="mergesort")
    out = out.groupby("doc_id").head(topk).copy()
    out["term_rank"] = out.groupby("doc_id").cumcount() + 1
    return pa.table({
        "doc_id": pa.array(out["doc_id"].to_numpy(np.int64), pa.int64()),
        "term_rank": pa.array(out["term_rank"].to_numpy(np.int64), pa.int64()),
        "term": pa.array(out["term"].to_numpy(), pa.string()),
        "tf": pa.array(out["tf"].to_numpy(np.int64), pa.int64()),
        "df": pa.array(out["df"].to_numpy(np.int64), pa.int64()),
        "score": pa.array(out["score"].to_numpy(np.float64), pa.float64()),
    })


def levenshtein_pairs(a, b) -> np.ndarray:
    """Exact Levenshtein (unit-cost edit) distance for each aligned
    pair ``(a[i], b[i])``, vectorized ACROSS the pair axis: the DP
    table is walked once per character position (O(max_len_a x
    max_len_b) iterations), each step an O(n_pairs) vector op — the
    right shape for a fuzzy match over a bounded distinct domain,
    where pair count dwarfs string length.

    Matches DuckDB's ``levenshtein`` (and the classic Wagner-Fischer
    recurrence) exactly; pinned against a scalar reference in
    tests/test_session8_ops.py."""
    n = len(a)
    if n == 0:
        return np.zeros(0, np.int64)
    la = np.array([len(s) for s in a], np.int64)
    lb = np.array([len(s) for s in b], np.int64)
    ma, mb = int(la.max()), int(lb.max())
    # padded char-code matrices; pad = -1 never equals a real char, and
    # cells beyond a pair's true lengths are never read for its result
    A = np.full((n, max(ma, 1)), -1, np.int64)
    B = np.full((n, max(mb, 1)), -1, np.int64)
    for i, s in enumerate(a):
        if s:
            A[i, :len(s)] = np.frombuffer(s.encode("utf-32-le"),
                                          dtype=np.uint32)
    for i, s in enumerate(b):
        if s:
            B[i, :len(s)] = np.frombuffer(s.encode("utf-32-le"),
                                          dtype=np.uint32)
    res = np.where(la == 0, lb, 0).astype(np.int64)
    prev = np.tile(np.arange(mb + 1, dtype=np.int64), (n, 1))
    for i in range(1, ma + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1][:, None]
        sub = prev[:, :-1] + (ai != B)  # substitute (or match)
        dele = prev[:, 1:] + 1          # delete from a
        step = np.minimum(sub, dele)
        # insertion needs a left-to-right scan: cur[j] may use cur[j-1]
        for j in range(1, mb + 1):
            cur[:, j] = np.minimum(step[:, j - 1], cur[:, j - 1] + 1)
        done = la == i
        if done.any():
            res[done] = cur[done, lb[done]]
        prev = cur
    return res


def winnow_selections(texts, k: int = 16, w: int = 8):
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS document-fingerprinting algorithm): over
    each document's k-gram hash sequence slide a w-window and select
    the window's minimum hash, breaking ties by the RIGHTMOST
    position; consecutive windows re-selecting the same position
    collapse to one selection.  Documents with fewer than w grams are
    one whole-doc window (dedup._window_hashes gives every doc >= 1
    gram; short docs carry the degenerate byte-sum gram).  Guarantee
    (the paper's correctness property): any substring match of length
    >= k + w - 1 contributes at least one identical selected
    fingerprint to both documents.

    Vectorized across the batch: one flat k-gram hash pass
    (dedup._window_hashes), one strided sliding-window min +
    rightmost-argmin over the concatenated hash array with per-doc
    boundary masking, one np.unique position dedup — no per-doc
    Python.  Returns (doc_idx, pos, fp, n_grams): per-SELECTION doc
    index / gram position / uint64 fingerprint arrays (sorted by doc,
    then position) plus the per-DOC gram counts."""
    from .dedup import _ranges, _utf8_buffer, _window_hashes

    data, off = _utf8_buffer(texts)
    n = len(off) - 1
    wh, woff = _window_hashes(data, off, k)
    counts = (woff[1:] - woff[:-1]).astype(np.int64)
    if n == 0:
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(0, np.uint64), counts
    picks = []
    long_m = counts >= w
    if long_m.any():
        # windows fully inside one doc: starts i in [woff[d], woff[d+1]-w]
        S = np.lib.stride_tricks.sliding_window_view(wh, w)
        rpos = (w - 1) - np.argmin(S[:, ::-1], axis=1)
        nwin = counts[long_m] - w + 1
        i = np.repeat(woff[:-1][long_m], nwin) + _ranges(nwin)
        picks.append(i + rpos[i])
    short_m = ~long_m
    if short_m.any():
        # one whole-doc window: rightmost position of the per-doc min
        mins = np.minimum.reduceat(wh, woff[:-1])
        doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        is_min = (wh == mins[doc_of]) & short_m[doc_of]
        cand = np.where(is_min, np.arange(wh.size, dtype=np.int64), -1)
        best = np.maximum.reduceat(cand, woff[:-1])
        picks.append(best[short_m])
    sel = np.unique(np.concatenate(picks))
    doc_idx = np.searchsorted(woff, sel, side="right") - 1
    return doc_idx, sel - woff[doc_idx], wh[sel], counts


def cdc_chunk_spans(texts, k: int = 16, bbits: int = 6):
    """Content-defined chunking (the LBFS / rsync / FastCDC family,
    Muthitacharoen et al. SOSP 2001): cut each document after byte
    position p whenever the k-gram hash ENDING at p has its low
    ``bbits`` bits all zero — boundaries depend only on local content,
    so an insertion early in a doc shifts, but does not rewrite, the
    chunking of everything after the next boundary (the property that
    makes chunk-level dedup robust to edits).  Expected chunk length
    ~= 2^bbits bytes (+ the k-gram ramp); no min/max clamp, so the
    definition stays stateless and batch-vectorizable.  Docs shorter
    than k (or with no qualifying gram) are one whole-doc chunk; empty
    docs one empty chunk.

    Returns (data, doc_of, starts, ends, n_docs): the flat uint8
    buffer plus per-CHUNK doc index and [start, end) byte ranges,
    chunks in document order."""
    from .dedup import _ranges, _utf8_buffer, _window_hashes

    data, off = _utf8_buffer(texts)
    n = len(off) - 1
    lens = (off[1:] - off[:-1]).astype(np.int64)
    if n == 0:
        z = np.zeros(0, np.int64)
        return data, z, z, z, 0
    wh, woff = _window_hashes(data, off, k)
    long_m = lens >= k
    mask = np.uint64((1 << bbits) - 1)
    doc_of_gram = np.repeat(np.arange(n, dtype=np.int64),
                            (woff[1:] - woff[:-1]).astype(np.int64))
    # gram i (local) covers bytes [i, i+k); a qualifying gram cuts
    # AFTER its last byte -> local cut position i + k, valid if < len
    local = np.arange(wh.size, dtype=np.int64) - woff[:-1][doc_of_gram]
    cut_m = ((wh & mask) == 0) & long_m[doc_of_gram] \
        & (local + k < lens[doc_of_gram])
    cut_doc = doc_of_gram[cut_m]
    cut_pos = off[:-1][cut_doc] + local[cut_m] + k  # global byte pos
    # per-doc chunk assembly: starts = doc start + cuts; ends = cuts +
    # doc end (cut arrays are already in (doc, position) order)
    n_cuts = np.bincount(cut_doc, minlength=n)
    n_chunks = n_cuts + 1
    coff = np.concatenate([np.zeros(1, np.int64), np.cumsum(n_chunks)])
    total = int(coff[-1])
    starts = np.empty(total, np.int64)
    ends = np.empty(total, np.int64)
    starts[coff[:-1]] = off[:-1]
    ends[coff[1:] - 1] = off[1:]
    if cut_pos.size:
        at = np.repeat(coff[:-1], n_cuts) + _ranges(n_cuts)
        starts[at + 1] = cut_pos
        ends[at] = cut_pos
    doc_of = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
    return data, doc_of, starts, ends, n


# --- Edit-distance candidate blocking (symmetric-delete) -------------------

_DEL1_B = np.uint64(0x100000001B3)  # FNV-1a prime: odd => invertible mod 2^64


def deletion1_keys(strings):
    """Blocking keys for edit-distance <= 1 candidate generation (the
    symmetric-delete / SymSpell family, depth 1): for each string emit
    an int64 key per single-character deletion PLUS one for the string
    itself.  Two distinct strings within Levenshtein distance 1 are
    GUARANTEED to share at least one key (substitution: both delete the
    differing position; insert/delete: the shorter string's identity
    key equals one deletion key of the longer), so grouping by key is
    an exact-superset candidate generator; sharing a key does NOT imply
    distance <= 1 ('ab'/'ba' share deletion 'a'), so candidates require
    exact Levenshtein verification — the same candidates-then-verify
    shape as the MinHash-LSH dedup stack.

    Keys are uint64-wraparound polynomial hashes of the variant strings
    computed by PREFIX/SUFFIX ARITHMETIC over the concatenated
    codepoint buffer — no variant string is ever materialized and no
    per-string Python runs (one vectorized pass over all character
    positions).  Hash collisions only ADD candidates (equal variants
    always hash equal), never lose a true pair.

    Returns ``(keys, owners)`` int64/int64 arrays, deduplicated per
    owner (deleting either of a doubled character yields one key)."""
    n = len(strings)
    if n == 0:
        z = np.zeros(0, np.int64)
        return z, z
    enc = [s.encode("utf-32-le") for s in strings]
    lens = np.fromiter((len(e) >> 2 for e in enc), np.int64, n)
    data = (np.frombuffer(b"".join(enc), dtype=np.uint32).astype(np.uint64)
            + np.uint64(1))  # +1: no zero codes, so '' never aliases 'a\0'
    off = np.zeros(n + 1, np.int64)
    off[1:] = np.cumsum(lens)
    total = int(off[-1])
    # H[k] = hash(data[0:k]); P[k] = B^k   (all uint64 wraparound)
    H = np.zeros(total + 1, np.uint64)
    P = np.ones(total + 1, np.uint64)
    if total:
        P[1:] = np.cumprod(np.full(total, _DEL1_B, np.uint64))
        # H via blocked Horner: H[k] = H[k-1]*B + c_k.  Equivalent
        # closed form: H[k] = sum_{i<k} c_i * B^(k-1-i)
        #            = (sum_{i<k} c_i * B^{-i}) * B^{k-1}  — B odd, so
        # B is invertible mod 2^64 and the scan becomes one cumsum.
        Binv = pow(int(_DEL1_B), -1, 1 << 64)
        Pinv = np.ones(total, np.uint64)
        Pinv[1:] = np.cumprod(np.full(total - 1, np.uint64(Binv),
                                      np.uint64))
        S = np.zeros(total + 1, np.uint64)
        S[1:] = np.cumsum(data * Pinv, dtype=np.uint64)
        H[1:] = S[1:] * P[:total]
    s = np.repeat(off[:-1], lens)          # owner string start, per char
    e = np.repeat(off[1:], lens)           # owner string end, per char
    owners_del = np.repeat(np.arange(n, dtype=np.int64), lens)
    j = np.arange(total, dtype=np.int64)   # deleted position (global)
    # hash of string with data[j] deleted:
    #   prefix  = H[j] - H[s]*P[j-s]
    #   suffix  = H[e] - H[j+1]*P[e-j-1]
    #   variant = prefix * P[e-1-j] + suffix
    pe = P[e - 1 - j]
    del_keys = ((H[j] - H[s] * P[j - s]) * pe
                + (H[e] - H[j + 1] * pe))
    id_keys = H[off[1:]] - H[off[:-1]] * P[lens]
    keys = np.concatenate([del_keys, id_keys]).view(np.int64)
    owners = np.concatenate([owners_del,
                             np.arange(n, dtype=np.int64)])
    # dedup (owner, key): doubled chars yield identical variants
    o = np.lexsort((keys, owners))
    ko, oo = keys[o], owners[o]
    keep = np.empty(len(o), bool)
    keep[:1] = True
    keep[1:] = (oo[1:] != oo[:-1]) | (ko[1:] != ko[:-1])
    return ko[keep], oo[keep]


def key_group_pairs(keys: np.ndarray, owners: np.ndarray):
    """All unordered within-key owner pairs ``(oa, ob)`` with
    ``oa < ob``, deduplicated across keys — the verification feed for
    deletion1_keys blocking.  Pair emission is the shared
    vector.segment_all_pairs core (one Python iteration per distinct
    segment size).  Input rows are (owner, key)-unique per
    deletion1_keys' own dedup, and owners sort ascending within each
    key segment (the lexsort below), so every emitted pair already has
    oa < ob — only the cross-key pair dedup remains."""
    from .vector import segment_all_pairs

    if len(keys) == 0:
        z = np.zeros(0, np.int64)
        return z, z
    o = np.lexsort((owners, keys))
    k = keys[o]
    st = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    ln = np.diff(np.r_[st, len(k)])
    out_a, out_b = segment_all_pairs(owners[o], st, ln)
    if not out_a:
        z = np.zeros(0, np.int64)
        return z, z
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    pk = a * np.int64(int(owners.max()) + 1) + b
    _, first = np.unique(pk, return_index=True)
    return a[first], b[first]
