"""BPE merge training: kernel semantics + forced-path parity + golden."""

import numpy as np
import pandas as pd
import pyarrow as pa

from proj_ray.functions.bpe import (
    apply_merge_flat,
    bpe_merges_driver,
    bpe_train,
    pair_count_flat,
    _flatten_vocab,
)


def _scalar_bpe(word_counts, num_merges):
    """The freeze_goldens scalar reference, inlined for unit parity."""
    seqs = {w: tuple(w) for w in word_counts}
    rows = []
    for rank in range(1, num_merges + 1):
        stats = {}
        for w, seq in seqs.items():
            n = word_counts[w]
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                stats[p] = stats.get(p, 0) + n
        if not stats:
            break
        (a, b), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        rows.append((rank, a, b, a + b, cnt))
        new_seqs = {}
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs[w] = tuple(out)
        seqs = new_seqs
    return pd.DataFrame(rows, columns=["rank", "left", "right", "merged",
                                       "pair_count"])


def test_pair_count_includes_overlaps():
    sym, wid, wcount, table = _flatten_vocab(["aaa"], [5])
    l, r, c = pair_count_flat(sym, wid, wcount)
    assert len(l) == 1
    assert table[l[0]] == "a" and table[r[0]] == "a"
    assert c[0] == 10  # two overlapping (a,a) occurrences x count 5


def test_greedy_merge_on_runs():
    # 'aaa' -> ['aa','a']; 'aaaa' -> ['aa','aa']
    for word, want in (("aaa", ["aa", "a"]), ("aaaa", ["aa", "aa"])):
        sym, wid, wcount, table = _flatten_vocab([word], [1])
        new_code = len(table)
        table.append("aa")
        sym2, wid2 = apply_merge_flat(sym, wid, 0, 0, new_code)
        assert [table[s] for s in sym2] == want


def test_driver_matches_scalar_reference():
    words = {"low": 5, "lower": 2, "newest": 6, "widest": 3,
             "aaa": 4, "aab": 4, "banana": 2}
    got = bpe_merges_driver(np.array(list(words)), list(words.values()), 12)
    want = _scalar_bpe(words, 12)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"rank": np.int64,
                                           "pair_count": np.int64}),
        want.astype({"rank": np.int64, "pair_count": np.int64}))


def test_forced_path_parity(ray_session):
    import ray.data as rd

    texts = ["low low lower newest", "newest widest newest aaa",
             "banana aab aaa low", "the quick brown fox", "aaa aaa b"]
    t = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts)})
    ds = rd.from_arrow(t)
    a = bpe_train(ds, num_merges=15, force_path="driver")
    ds2 = rd.from_arrow(t).repartition(3)
    b = bpe_train(ds2, num_merges=15, force_path="distributed")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    # and both match the scalar reference
    wc = {}
    for txt in texts:
        for w in txt.split():
            wc[w] = wc.get(w, 0) + 1
    want = _scalar_bpe(wc, 15)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True),
        want.astype({"rank": np.int64, "pair_count": np.int64}))


def test_encode_min_rank_recheck(ray_session):
    """The encode loop must re-check LOWER ranks after a later-rank
    merge makes a new pair adjacent (GPT-2 semantics): with merges
    rank0=(a,bc) rank1=(b,c), 'abc' -> b+c first (only pair present),
    then (a,bc) becomes adjacent and must fire -> ONE token."""
    import ray.data as rd

    merges = pd.DataFrame({"left": ["a", "b"], "right": ["bc", "c"]})
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["abc"])})
    from proj_ray.functions.bpe import bpe_encode_counts

    out = bpe_encode_counts(rd.from_arrow(t), merges).to_pandas()
    assert out["n_bpe_tokens"].tolist() == [1]
    assert out["n_words"].tolist() == [1]


def test_unicode_whitespace_is_not_a_word_boundary(ray_session):
    """The engine's RE2 \\s+ split is [\\t\\n\\f\\r ] exactly: NBSP /
    NEL / LINE SEPARATOR (Unicode whitespace, common in HTML-extracted
    crawl text) AND the ASCII vertical tab \\x0b stay INSIDE a word.  Pins the convention the golden freezer must share — Python's
    str.split() would split these and diverge."""
    import re

    import ray.data as rd

    texts = ["a\xa0b a\xa0b cc", "x\x85y x\x85y",
             "p\u2028q p\u2028q cc", "m\x0bn m\x0bn dd"]
    t = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts)})
    got = bpe_train(rd.from_arrow(t), num_merges=6, force_path="driver")
    wc = {}
    for txt in texts:
        for w in re.split(r"[\t\n\f\r ]+", txt):  # RE2 \s class: no \v
            if w:
                wc[w] = wc.get(w, 0) + 1
    assert "a\xa0b" in wc and "p\u2028q" in wc and "m\x0bn" in wc
    want = _scalar_bpe(wc, 6)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype({"rank": np.int64, "pair_count": np.int64}))
