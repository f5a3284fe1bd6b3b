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
