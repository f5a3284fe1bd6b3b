"""Round-4 session-11 classic query pack: the remaining TPC-H shapes —
Q6 scalar filter-agg, Q10 returned-item top-k, Q18 grouped HAVING,
Q19 OR-of-ANDs bracket join, Q4 EXISTS semi-join, Q22 global-scalar
anti-join."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _sorted(df, by):
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    return df.sort_values(by).reset_index(drop=True)


def _oracle(qname, tables):
    from proj_ray.pipelines.queries import QUERIES

    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.sql(QUERIES[qname]["sql"]).fetchdf()


def _ints_equal(got, want, cols):
    assert len(got) == len(want)
    for c in cols:
        assert (got[c].to_numpy(np.int64)
                == want[c].to_numpy(np.int64)).all(), c


def test_q6_matches_oracle(ray_session):
    from proj_ray.pipelines.queries import q6_forecast_revenue

    got = q6_forecast_revenue(SF)
    want = _oracle("q6_forecast_revenue", ["lineitem"])
    _ints_equal(got, want, ["revenue_cents2", "n_items"])


def test_q10_matches_oracle(ray_session):
    from proj_ray.pipelines.queries import q10_returned_items

    got = q10_returned_items(SF)
    want = _oracle("q10_returned_items",
                   ["customer", "orders", "lineitem", "nation"])
    _ints_equal(got, want, ["c_custkey", "revenue_cents2"])
    assert list(got["c_name"]) == list(want["c_name"])
    assert list(got["n_name"]) == list(want["n_name"])
    # top-k really is descending by revenue
    rev = got["revenue_cents2"].to_numpy(np.int64)
    assert (rev[:-1] >= rev[1:]).all()


def test_q18_matches_oracle(ray_session):
    from proj_ray.pipelines.queries import q18_large_orders

    got = q18_large_orders(SF)
    want = _oracle("q18_large_orders", ["lineitem", "orders"])
    _ints_equal(got, want,
                ["l_orderkey", "o_custkey", "orderdate_us",
                 "totalprice_cents", "qty_cents_sum"])
    # every surviving order clears the HAVING threshold
    assert (got["qty_cents_sum"].to_numpy(np.int64) > 20_000).all()


def test_q19_matches_oracle(ray_session):
    from proj_ray.pipelines.queries import q19_bracket_revenue

    got = q19_bracket_revenue(SF)
    want = _oracle("q19_bracket_revenue", ["lineitem", "part"])
    _ints_equal(got, want, ["revenue_cents2", "n_items"])


def test_q4_matches_oracle_both_paths(ray_session):
    from proj_ray.pipelines.queries import q4_priority_exists

    want = _sorted(_oracle("q4_priority_exists", ["orders", "lineitem"]),
                   ["o_orderpriority"])
    for path in ("broadcast", "join"):
        got = _sorted(q4_priority_exists(SF, path=path),
                      ["o_orderpriority"])
        assert list(got["o_orderpriority"]) == list(
            want["o_orderpriority"]), path
        _ints_equal(got, want, ["n_orders"])


def test_q22_matches_oracle_both_paths(ray_session):
    from proj_ray.pipelines.queries import q22_idle_balance

    want = _sorted(_oracle("q22_idle_balance", ["customer", "orders"]),
                   ["c_nationkey"])
    for path in ("broadcast", "join"):
        got = _sorted(q22_idle_balance(SF, path=path), ["c_nationkey"])
        _ints_equal(got, want,
                    ["c_nationkey", "n_custs", "sum_bal_cents"])


# ---------------------------------------------------------------------------
# winnowing (MOSS) fingerprints
# ---------------------------------------------------------------------------

def _scalar_winnow(t, k=16, w=8):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from freeze_goldens import ref_winnow_selections

    return ref_winnow_selections(t, k, w)


def test_winnow_kernel_matches_scalar_ref():
    """Batch strided kernel == per-window scalar loop on the sf0.001
    corpus (positions, fingerprints and gram counts)."""
    import pyarrow.parquet as pq
    from proj_ray.functions.text import winnow_selections

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    texts = docs["text"].to_pylist()
    d, pos, fp, n_grams = winnow_selections(texts, 16, 8)
    for i, t in enumerate(texts):
        sels, g = _scalar_winnow(t)
        assert int(n_grams[i]) == g, i
        got = {(int(p), int(v)) for p, v in zip(pos[d == i], fp[d == i])}
        want = {(p, int(v)) for p, v in sels.items()}
        assert got == want, i


def test_winnow_substring_guarantee():
    """The paper's detection property: a shared substring of length
    >= k + w - 1 always yields a shared selected fingerprint."""
    from proj_ray.functions.text import winnow_selections

    core = "The quick brown fox jumps over the lazy dog!"  # 45 >= 16+8-1
    a = "PREFIX-A ::: " + core + " ::: SUFFIX-AAAA"
    b = "totally different lead-in " + core + " and another tail"
    d, _, fp, _ = winnow_selections([a, b], 16, 8)
    assert set(fp[d == 0]) & set(fp[d == 1])


def test_winnow_short_and_empty_docs():
    from proj_ray.functions.text import winnow_selections

    d, pos, fp, n_grams = winnow_selections(["", "ab", "x" * 15], 16, 8)
    # every doc gets exactly one degenerate selection at position 0
    assert list(n_grams) == [1, 1, 1]
    assert list(d) == [0, 1, 2]
    assert list(pos) == [0, 0, 0]


def test_winnow_dup_pairs_both_paths(ray_session):
    from proj_ray.pipelines.queries import winnow_dup_pairs

    got_b = winnow_dup_pairs(SF, path="broadcast")
    got_j = winnow_dup_pairs(SF, path="join")
    for col in ("doc_a", "doc_b", "n_shared"):
        assert (got_b[col].to_numpy(np.int64)
                == got_j[col].to_numpy(np.int64)).all(), col
    # symmetric-pair sanity: a < b, shared count >= threshold
    assert (got_b["doc_a"].to_numpy() < got_b["doc_b"].to_numpy()).all()
    assert (got_b["n_shared"].to_numpy() >= 3).all()


def test_winnow_fingerprints_query(ray_session):
    from proj_ray.pipelines.queries import winnow_fingerprints

    df = winnow_fingerprints(SF)
    assert (df["n_selected"].to_numpy() >= 1).all()
    assert (df["n_selected"].to_numpy()
            <= df["n_grams"].to_numpy()).all()
    # per-doc scalar spot check on the first three docs
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    for _, row in docs.head(3).iterrows():
        sels, g = _scalar_winnow(row["text"])
        mine = df[df["doc_id"] == row["doc_id"]].iloc[0]
        assert int(mine["n_grams"]) == g
        assert int(mine["n_selected"]) == len(sels)


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------

def test_cdc_kernel_matches_scalar_ref():
    """Batch span kernel == scalar substring-materializing reference on
    the sf0.001 corpus (chunk boundaries and contents)."""
    import sys

    import pyarrow.parquet as pq

    sys.path.insert(0, "/root/repo/tools")
    from freeze_goldens import ref_cdc_chunks

    from proj_ray.functions.text import cdc_chunk_spans

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    texts = docs["text"].to_pylist()
    data, d, s, e, n = cdc_chunk_spans(texts)
    for i, t in enumerate(texts):
        want = ref_cdc_chunks(t)
        got = [data[a:b].tobytes() for a, b in zip(s[d == i], e[d == i])]
        assert got == [bytes(c) for c in want], i


def test_cdc_edit_shift_robustness():
    """The CDC property: prepending bytes changes only the chunks up
    to the first boundary — later chunk CONTENTS are preserved."""
    from proj_ray.functions.text import cdc_chunk_spans

    # genuinely varied (non-periodic) content so boundary grams occur
    import hashlib

    base = "".join(hashlib.sha256(str(j).encode()).hexdigest()
                   for j in range(40))
    edited = "INSERTED PREFIX >> " + base
    data, d, s, e, n = cdc_chunk_spans([base, edited])
    c0 = {data[a:b].tobytes() for a, b in zip(s[d == 0], e[d == 0])}
    c1 = {data[a:b].tobytes() for a, b in zip(s[d == 1], e[d == 1])}
    assert len(c0) > 2
    # every chunk of the original except (possibly) its first reappears
    first = data[s[d == 0][0]:e[d == 0][0]].tobytes()
    assert (c0 - {first}) <= c1


def test_cdc_dedup_stats_invariants(ray_session):
    from proj_ray.pipelines.queries import cdc_dedup_stats

    df = cdc_dedup_stats(SF)
    assert int(df["n_distinct"][0]) + int(df["dup_chunks"][0]) \
        == int(df["n_chunks_total"][0])
    assert int(df["dup_bytes"][0]) >= int(df["dup_chunks"][0]) * 0


def test_orders_above_cust_avg_matches_oracle(ray_session):
    from proj_ray.pipelines.queries import orders_above_cust_avg

    got = _sorted(orders_above_cust_avg(SF), ["o_orderpriority"])
    want = _sorted(_oracle("orders_above_cust_avg", ["orders"]),
                   ["o_orderpriority"])
    assert list(got["o_orderpriority"]) == list(want["o_orderpriority"])
    _ints_equal(got, want, ["n_orders", "sum_price_cents"])


# ---------------------------------------------------------------------------
# semi-join pushdown parity (q3/q5/q10/q18 broadcast vs join paths)
# ---------------------------------------------------------------------------

def test_q3_pushdown_parity(ray_session):
    from proj_ray.pipelines.queries import q3_shipping_priority

    b = q3_shipping_priority(SF, path="broadcast")
    j = q3_shipping_priority(SF, path="join")
    for c in ("l_orderkey", "revenue_cents2", "orderdate_us"):
        assert (b[c].to_numpy(np.int64) == j[c].to_numpy(np.int64)).all(), c
    assert list(b["o_orderpriority"]) == list(j["o_orderpriority"])


def test_q5_pushdown_parity(ray_session):
    from proj_ray.pipelines.queries import q5_local_supplier_volume

    b = q5_local_supplier_volume(SF, path="broadcast")
    j = q5_local_supplier_volume(SF, path="join")
    assert list(b["n_name"]) == list(j["n_name"])
    assert (b["revenue_cents2"].to_numpy(np.int64)
            == j["revenue_cents2"].to_numpy(np.int64)).all()


def test_q10_pushdown_parity(ray_session):
    from proj_ray.pipelines.queries import q10_returned_items

    b = q10_returned_items(SF, path="broadcast")
    j = q10_returned_items(SF, path="join")
    for c in ("c_custkey", "revenue_cents2"):
        assert (b[c].to_numpy(np.int64) == j[c].to_numpy(np.int64)).all(), c
    assert list(b["c_name"]) == list(j["c_name"])


def test_q18_pushdown_parity(ray_session):
    from proj_ray.pipelines.queries import q18_large_orders

    b = q18_large_orders(SF, path="broadcast")
    j = q18_large_orders(SF, path="join")
    for c in ("l_orderkey", "o_custkey", "orderdate_us",
              "totalprice_cents", "qty_cents_sum"):
        assert (b[c].to_numpy(np.int64) == j[c].to_numpy(np.int64)).all(), c


def test_sorted_lookup_edges():
    """The shared broadcast-probe helper: empty lookup side must yield
    an all-miss mask with in-range (gatherable) indices; hit-only
    gathers on idx[hit] stay safe even against empty payload arrays."""
    from proj_ray.pipelines.queries import _sorted_lookup

    keys = np.array([], np.int64)
    idx, hit = _sorted_lookup(keys, np.array([3, 7], np.int64))
    assert not hit.any() and idx.tolist() == [0, 0]
    payload = np.array([], np.int64)
    assert payload[idx[hit]].size == 0  # hit-only gather never raises

    keys = np.array([2, 5, 9], np.int64)
    idx, hit = _sorted_lookup(keys, np.array([1, 2, 6, 9, 12], np.int64))
    assert hit.tolist() == [False, True, False, True, False]
    assert (keys[idx[hit]] == np.array([2, 9])).all()
    assert idx.max() <= len(keys) - 1  # clamped even past the end
