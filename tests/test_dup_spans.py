"""dup_span_stats: island-merge kernel vs scalar + forced-path parity."""

import numpy as np
import pandas as pd

from proj_ray.functions.text import merge_dup_spans


def _scalar_spans(d, p, n):
    """Per-doc interval merge, one Python loop (reference)."""
    out = {}
    by_doc = {}
    for di, pi in zip(d, p):
        by_doc.setdefault(di, []).append(pi)
    for di, ps in by_doc.items():
        spans = []
        for pi in sorted(ps):
            if spans and pi - spans[-1][1] <= n:
                spans[-1][1] = pi
            else:
                spans.append([pi, pi])
        out[di] = (len(spans), sum(b - a + n for a, b in spans))
    return out


def test_merge_dup_spans_matches_scalar():
    rng = np.random.default_rng(11)
    d = np.sort(rng.integers(0, 12, 400)).astype(np.int64)
    p = np.concatenate([np.sort(rng.choice(200, size=(d == i).sum(),
                                           replace=False))
                        for i in np.unique(d)]).astype(np.int64)
    got = merge_dup_spans(d, p, 5)
    want = _scalar_spans(d.tolist(), p.tolist(), 5)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        ns, tok = want[r["doc_id"]]
        assert (r["n_spans"], r["dup_tokens"]) == (ns, tok)


def test_forced_path_parity(ray_session):
    from proj_ray.pipelines.queries import dup_span_stats

    sf = "/root/testdata/sf0.001"
    a = (dup_span_stats(sf, path="broadcast").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (dup_span_stats(sf, path="join").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert (a["dup_tokens"] >= a["n_spans"] * 5).all()  # >= N per span
    assert (a["dup_tokens"] <= a["n_words"]).all()
