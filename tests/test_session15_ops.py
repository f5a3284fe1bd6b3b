"""Session-15 operators: CSV container round-trip, Gopher word filters,
DSIR selection, temperature mixture sampling, inverted-index retrieval.
Each pinned against an independent scalar/pure-pandas reference."""

import math
import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ---------------------------------------------------------------------------
# CSV container round-trip: byte identity through RFC-4180 quoting
# ---------------------------------------------------------------------------

TRICKY = [
    "plain words only",
    "comma, separated, values",
    'quoted "inner" text',
    "newline\nin the middle",
    "both, a \"quote\" and\na newline",
    "unicode: café 中文 ☃",
    "trailing comma,",
]


def test_csv_roundtrip_byte_identity(ray_session):
    import ray.data as rd

    from proj_ray.sources.csvio import read_csv_shards, write_csv_stage

    n = len(TRICKY)
    src = pa.table({
        "pid": pa.array(np.arange(n, dtype=np.int64)),
        "url": pa.array([f"https://x.example/{i}" for i in range(n)]),
        "warc_ts": pa.array(
            np.arange(n, dtype=np.int64) * 1000003 + 1577836800000000,
            pa.int64()).cast(pa.timestamp("us")),
        "text": pa.array(TRICKY),
    })
    out = os.path.join(tempfile.gettempdir(), "csvio_test")
    shutil.rmtree(out, ignore_errors=True)
    man = write_csv_stage(rd.from_arrow(src), out).take_all()
    assert sum(r["n_records"] for r in man) == n
    back = (read_csv_shards(out).to_pandas()
            .sort_values("pid").reset_index(drop=True))
    ref = src.to_pandas()
    pd.testing.assert_frame_equal(back[ref.columns.tolist()], ref)
    shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------------------------------
# Gopher word filters: scalar reference over the rule ladder
# ---------------------------------------------------------------------------

def _scalar_gopher(text, stopwords, block, min_words, wlo, whi, min_stop):
    import re

    words = text.split(" ")
    n_words = len(words)
    n_wchars = sum(len(w) for w in words)
    stop_re = re.compile(r"\b(?:" + "|".join(stopwords) + r")\b")
    block_re = re.compile(r"\b(?:" + "|".join(block) + r")\b")
    n_stop = len(stop_re.findall(text))
    n_block = len(block_re.findall(text))
    mean_wlen = n_wchars / n_words
    if n_words < min_words:
        stage = 1
    elif mean_wlen < wlo or mean_wlen > whi:
        stage = 2
    elif n_stop < min_stop:
        stage = 3
    elif n_block > 0:
        stage = 4
    else:
        stage = 0
    return n_words, n_stop, mean_wlen, stage


def test_gopher_word_filters_scalar_parity(ray_session, sf_dir):
    from proj_ray.pipelines.queries import (_GWF_BLOCK, _GWF_MIN_STOP,
                                            _GWF_MIN_WORDS, _GWF_WLEN_HI,
                                            _GWF_WLEN_LO, QUERIES)
    from proj_ray.functions.text import STOPWORDS_EN
    from proj_ray.sources import read_table

    eng = (QUERIES["gopher_word_filters"]["fn"](sf_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    docs = (read_table(sf_dir, "documents", columns=["doc_id", "text"])
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(eng) == len(docs)
    # every rule fires somewhere AND some docs survive (binding check)
    assert set(eng["drop_stage"]) == {0, 1, 2, 3, 4}
    for i in range(0, len(docs), 37):  # scalar spot-checks
        nw, ns, mw, st = _scalar_gopher(
            docs["text"][i], STOPWORDS_EN, _GWF_BLOCK, _GWF_MIN_WORDS,
            _GWF_WLEN_LO, _GWF_WLEN_HI, _GWF_MIN_STOP)
        row = eng.iloc[i]
        assert row["n_words"] == nw and row["n_stop"] == ns
        assert row["mean_wlen"] == mw  # single IEEE division: exact
        assert row["drop_stage"] == st


# ---------------------------------------------------------------------------
# DSIR: independent dict-based scalar reference
# ---------------------------------------------------------------------------

def test_dsir_select_scalar_parity(ray_session, sf_dir):
    from proj_ray.pipelines.queries import _DSIR_THRESH, QUERIES
    from proj_ray.sources import read_table

    docs = (read_table(sf_dir, "documents",
                       columns=["doc_id", "lang", "text"])
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    ct, cr = {}, {}
    for _, r in docs.iterrows():
        for w in r["text"].split(" "):
            cr[w] = cr.get(w, 0) + 1
            if r["lang"] == "en":
                ct[w] = ct.get(w, 0) + 1
    T_t, T_r, V = sum(ct.values()), sum(cr.values()), len(cr)

    eng = (QUERIES["dsir_select"]["fn"](sf_dir)
           .sort_values("doc_id").reset_index(drop=True))
    assert len(eng) == len(docs)
    assert 0 < eng["keep"].sum() < len(eng)  # threshold binds both ways
    for i in range(0, len(docs), 41):
        ws = docs["text"][i].split(" ")
        lam = [math.log((ct.get(w, 0) + 1.0) / (T_t + V))
               - math.log((cr[w] + 1.0) / (T_r + V)) for w in ws]
        want = math.floor((sum(lam) / len(lam)) * 1.0e6 + 0.5) / 1.0e6
        row = eng.iloc[i]
        assert row["n_tokens"] == len(ws)
        assert row["weight"] == pytest.approx(want, abs=2e-6)
        assert row["keep"] == (1 if row["weight"] >= _DSIR_THRESH else 0)


# ---------------------------------------------------------------------------
# Temperature mixture sampling: quota math + smallest-priority membership
# ---------------------------------------------------------------------------

def test_temperature_mixture_scalar_parity(ray_session, sf_dir):
    from proj_ray.pipelines.queries import (_SAMPLE_MOD, _TMS_SCALE,
                                            QUERIES)
    from proj_ray.sources import read_table

    docs = (read_table(sf_dir, "documents", columns=["doc_id", "lang"])
            .to_pandas())
    docs["prio"] = (docs["doc_id"].to_numpy(np.int64)
                    % _SAMPLE_MOD) * 48271 % _SAMPLE_MOD
    want = []
    for lang, g in docs.groupby("lang"):
        k = int(math.floor(_TMS_SCALE * math.sqrt(float(len(g)))))
        sel = g.sort_values(["prio", "doc_id"]).head(k)
        want.append(sel[["doc_id", "lang"]])
    ref = (pd.concat(want).sort_values(["lang", "doc_id"])
           .reset_index(drop=True))
    eng = QUERIES["temperature_mixture_sample"]["fn"](sf_dir)
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), ref, check_dtype=False)
    # the quota binds for at least one language (a real sample, not id)
    assert len(eng) < len(docs)


# ---------------------------------------------------------------------------
# Inverted index: brute-force parity + pruned-read property
# ---------------------------------------------------------------------------

def test_inverted_index_parity_and_pruning(ray_session, sf_dir):
    import ray.data as rd

    from proj_ray.functions.index import (_bucket_files,
                                          build_posting_index,
                                          search_all_terms, word_hash64)
    from proj_ray.sources import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    idx = os.path.join(tempfile.gettempdir(), "postidx_test")
    shutil.rmtree(idx, ignore_errors=True)
    build_posting_index(docs, idx)

    pdf = docs.to_pandas()
    for terms in (["table"], ["table", "window"],
                  ["table", "window", "slow"], ["zznosuchword"]):
        got = search_all_terms(idx, terms)["doc_id"].tolist()
        want = sorted(
            int(r["doc_id"]) for _, r in pdf.iterrows()
            if all(t in r["text"].split(" ") for t in terms))
        assert got == want, terms

    # pruning: a 1-term query must read only that term's bucket
    q = word_hash64(["table"])
    one = _bucket_files(idx, (q % np.uint64(256)).tolist())
    all_b = _bucket_files(idx, range(256))
    assert len(one) < len(all_b)

    # duplicate terms in the query collapse (AND of one distinct term)
    got_dup = search_all_terms(idx, ["table", "table"])["doc_id"].tolist()
    got_one = search_all_terms(idx, ["table"])["doc_id"].tolist()
    assert got_dup == got_one
    shutil.rmtree(idx, ignore_errors=True)


# ---------------------------------------------------------------------------
# Triangle counting: brute-force adjacency-set reference + empty lane
# ---------------------------------------------------------------------------

def test_triangle_count_bruteforce_parity(ray_session):
    from proj_ray.pipelines.queries import (_PAIR_RADIUS_M, _points_ds,
                                            QUERIES)
    from proj_ray.stages.pairjoin import radius_pair_join_stage

    sf = "/root/testdata/sf0.01"
    eng = QUERIES["triangle_count_per_node"]["fn"](sf)
    edges = (radius_pair_join_stage(_points_ds(sf), _PAIR_RADIUS_M)
             .to_pandas())
    adj = {}
    for a, b in zip(edges["pid_a"].to_numpy(np.int64),
                    edges["pid_b"].to_numpy(np.int64)):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    counts = {}
    for a, b in zip(edges["pid_a"].to_numpy(np.int64),
                    edges["pid_b"].to_numpy(np.int64)):
        for c in adj[int(a)] & adj[int(b)]:
            # each triangle hits this loop once per edge (3x); count
            # the third vertex each time -> per-node count is exact
            counts[c] = counts.get(c, 0) + 1
    ref = (pd.DataFrame({"pid": list(counts), "n_tri": list(counts.values())})
           .sort_values("pid").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), ref, check_dtype=False)


def test_triangle_count_empty_graph_lane(ray_session, sf_dir):
    from proj_ray.pipelines.queries import QUERIES

    # sf0.001's 30 km radius graph is triangle-free: the query must
    # return the empty frame through the short-circuit, not crash in
    # the hash join
    out = QUERIES["triangle_count_per_node"]["fn"](sf_dir)
    assert list(out.columns) == ["pid", "n_tri"] and len(out) == 0
