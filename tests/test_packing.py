"""Sequence packing: span expansion vs scalar, global offsets, e2e."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from proj_ray.functions.packing import (
    doc_window_spans,
    global_token_offsets,
    pack_windows,
)


def _scalar_spans(ids, counts, starts, window):
    rows = []
    for i, n, s in zip(ids, counts, starts):
        if n <= 0:
            continue
        for w in range(s // window, (s + n - 1) // window + 1):
            tok = min(s + n, (w + 1) * window) - max(s, w * window)
            rows.append((w, i, tok))
    return pd.DataFrame(rows, columns=["window_id", "doc_id",
                                       "tok_in_window"])


def test_span_expansion_matches_scalar():
    rng = np.random.default_rng(7)
    n = rng.integers(0, 300, 50).astype(np.int64)
    ids = np.arange(50, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(n)[:-1]])
    t = pa.table({"doc_id": ids, "n_tok": n, "g_start": starts})
    got = doc_window_spans(t, "n_tok", "doc_id", 64)
    want = _scalar_spans(ids.tolist(), n.tolist(), starts.tolist(), 64)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    # every window except possibly the last is exactly full
    per_w = got.groupby("window_id")["tok_in_window"].sum()
    assert (per_w.iloc[:-1] == 64).all()
    assert per_w.sum() == n.sum()


def test_global_offsets_and_pack(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    ids = rng.permutation(200).astype(np.int64)  # unsorted input
    n = rng.integers(1, 90, 200).astype(np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "n_tok": n})).repartition(7)
    out = pack_windows(global_token_offsets(ds, "n_tok", "doc_id"),
                       "n_tok", "doc_id", 50).to_pandas()
    # scalar reference in doc_id order
    order = np.argsort(ids)
    starts = np.concatenate([[0], np.cumsum(n[order])[:-1]])
    want = (_scalar_spans(ids[order].tolist(), n[order].tolist(),
                          starts.tolist(), 50)
            .groupby("window_id", as_index=False)
            .agg(n_docs=("doc_id", "size"), n_tokens=("tok_in_window", "sum"),
                 first_doc=("doc_id", "min")))
    got = out.sort_values("window_id").reset_index(drop=True).astype(
        {c: np.int64 for c in out.columns})
    pd.testing.assert_frame_equal(got, want.astype(
        {c: np.int64 for c in want.columns}))


def test_duplicate_order_key_guard(ray_session):
    """Duplicate order keys must never SILENTLY mis-seed the carry:
    either the straddle detection raises (Ray's range sort split the
    equal keys across blocks) or — when the sort co-located them — the
    emitted offsets are a complete, gap-free exclusive prefix sum."""
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([1] * 64 + [2] * 64, pa.int64()),
                  "n_tok": pa.array([5] * 128, pa.int64())})
    ds = rd.from_arrow(t).repartition(8)
    try:
        out = global_token_offsets(ds, "n_tok", "doc_id").to_pandas()
    except ValueError as e:
        assert "unique" in str(e)
        return
    starts = np.sort(out["g_start"].to_numpy(np.int64))
    assert (starts == np.arange(128, dtype=np.int64) * 5).all()
