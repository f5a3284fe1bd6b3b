"""Round-4 session-6 operators: sessionization, Bloom-prefiltered
semi-join (both dispatch paths), Misra-Gries heavy hitters (sketch
trim forced on, exactness invariants)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _sorted(df, by):
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    return df.sort_values(by).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Bloom filter primitive
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_low_fp():
    from proj_ray.functions.sketch import (bloom_might_contain,
                                           bloom_words_from_keys)

    rng = np.random.default_rng(7)
    present = rng.choice(10**9, 5000, replace=False).astype(np.int64)
    absent = (rng.choice(10**9, 20000, replace=False).astype(np.int64)
              + 10**9)
    words = bloom_words_from_keys(present, 1 << 17, 5)
    assert bloom_might_contain(words, present, 5).all()
    fp = bloom_might_contain(words, absent, 5).mean()
    # 5k keys in 131072 bits, k=5 -> theoretical fp ~ 0.6%
    assert fp < 0.03


def test_bloom_partials_or_merge():
    from proj_ray.functions.sketch import (bloom_might_contain,
                                           bloom_words_from_keys)

    a = np.arange(0, 500, dtype=np.int64)
    b = np.arange(500, 1000, dtype=np.int64)
    merged = (bloom_words_from_keys(a, 1 << 14, 4)
              | bloom_words_from_keys(b, 1 << 14, 4))
    whole = bloom_words_from_keys(np.arange(1000, dtype=np.int64),
                                  1 << 14, 4)
    assert (merged == whole).all()
    assert bloom_might_contain(merged, np.arange(1000, dtype=np.int64),
                               4).all()


def test_bloom_empty_batch():
    from proj_ray.functions.sketch import (bloom_might_contain,
                                           bloom_words_from_keys)

    words = bloom_words_from_keys(np.array([], np.int64), 1 << 10, 3)
    assert words.sum() == 0
    assert bloom_might_contain(words, np.array([], np.int64), 3).size == 0


# ---------------------------------------------------------------------------
# bloom_semi_join: forced paths agree with each other and with DuckDB
# ---------------------------------------------------------------------------

def _bloom_oracle():
    from proj_ray.pipelines.queries import QUERIES

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    out = con.sql(QUERIES["bloom_semi_join"]["sql"]).fetchdf()
    con.close()
    return _sorted(out, ["l_returnflag"])


def test_bloom_semi_join_paths_agree(ray_session):
    from proj_ray.pipelines.queries import bloom_semi_join

    want = _bloom_oracle()
    got_b = _sorted(bloom_semi_join(SF, path="broadcast"), ["l_returnflag"])
    got_j = _sorted(bloom_semi_join(SF, path="join"), ["l_returnflag"])
    pd.testing.assert_frame_equal(got_b, want.astype(got_b.dtypes.to_dict()))
    pd.testing.assert_frame_equal(got_j, want.astype(got_j.dtypes.to_dict()))


def test_bloom_semi_join_tiny_filter_still_exact(ray_session):
    """A deliberately undersized bitmap (high fp rate) must not change
    the result — the exact verify pass owns correctness."""
    from proj_ray.pipelines.queries import bloom_semi_join

    want = _bloom_oracle()
    got = _sorted(bloom_semi_join(SF, n_bits=256, k_hashes=2),
                  ["l_returnflag"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_bloom_semi_join_bad_path(ray_session):
    from proj_ray.pipelines.queries import bloom_semi_join

    with pytest.raises(ValueError):
        bloom_semi_join(SF, path="nope")


# ---------------------------------------------------------------------------
# sessionize_events: invariants + oracle parity at sf0.001
# ---------------------------------------------------------------------------

def test_sessionize_matches_oracle(ray_session):
    from proj_ray.pipelines.queries import QUERIES, sessionize_events

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = _sorted(con.sql(QUERIES["sessionize_events"]["sql"]).fetchdf(),
                   ["user_id", "session_no"])
    con.close()
    got = _sorted(sessionize_events(SF).to_pandas(),
                  ["user_id", "session_no"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_sessionize_invariants(ray_session):
    from proj_ray.pipelines.queries import _SESS_GAP_US, sessionize_events

    df = sessionize_events(SF).to_pandas()
    assert (df["n_events"] >= 1).all()
    assert (df["end_us"] >= df["start_us"]).all()
    # consecutive sessions of one user are separated by > gap
    for _, g in df.groupby("user_id"):
        g = g.sort_values("session_no")
        assert g["session_no"].tolist() == list(range(1, len(g) + 1))
        gaps = g["start_us"].to_numpy()[1:] - g["end_us"].to_numpy()[:-1]
        assert (gaps > _SESS_GAP_US).all()


# ---------------------------------------------------------------------------
# latest_event_per_user / user_top_event_type: oracle parity at sf0.001
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("qname,keys", [
    ("latest_event_per_user", ["user_id"]),
    ("user_top_event_type", ["user_id"]),
])
def test_per_key_reducers_match_oracle(ray_session, qname, keys):
    from proj_ray.pipelines.queries import QUERIES

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = _sorted(con.sql(QUERIES[qname]["sql"]).fetchdf(), keys)
    con.close()
    got = _sorted(QUERIES[qname]["fn"](SF).to_pandas(), keys)
    got = got[want.columns.tolist()]
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


# ---------------------------------------------------------------------------
# misra_gries_topk: forced trim stays exact; matches token_topk
# ---------------------------------------------------------------------------

def test_misra_gries_matches_token_topk(ray_session):
    from proj_ray.pipelines.queries import misra_gries_topk, token_topk

    want = token_topk(SF).reset_index(drop=True)
    got = misra_gries_topk(SF).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


# ---------------------------------------------------------------------------
# traj_simplify_dp: engine DP vs an independent scalar recomputation
# ---------------------------------------------------------------------------

def _scalar_dp(lon, lat, tol2):
    n = len(lon)
    keep = [False] * n
    keep[0] = keep[n - 1] = True

    def rec(i, j):
        if j - i < 2:
            return
        x1, y1, x2, y2 = lon[i], lat[i], lon[j], lat[j]
        dx, dy = x2 - x1, y2 - y1
        den = dx * dx + dy * dy
        best, best_d2 = -1, -1.0
        for p in range(i + 1, j):
            if den == 0.0:
                d2 = ((lon[p] - x1) ** 2 + (lat[p] - y1) ** 2)
            else:
                num = dx * (y1 - lat[p]) - (x1 - lon[p]) * dy
                d2 = (num * num) / den
            if d2 > best_d2:
                best, best_d2 = p, d2
        if best_d2 > tol2:
            keep[best] = True
            rec(i, best)
            rec(best, j)

    rec(0, n - 1)
    return [p for p in range(n) if keep[p]]


def test_traj_simplify_matches_scalar(ray_session):
    import pyarrow.parquet as pq

    from proj_ray.pipelines.queries import _DP_TOL_DEG, traj_simplify_dp

    got = _sorted(traj_simplify_dp(SF).to_pandas(), ["user_id"])

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "user_id", "ts"])
    eid = ev["event_id"].to_numpy().astype(np.int64)
    uid = ev["user_id"].to_numpy().astype(np.int64)
    tu = ev["ts"].cast("int64").to_numpy()
    tol2 = float(_DP_TOL_DEG) ** 2
    rows = []
    for u in np.unique(uid):
        m = uid == u
        pts = sorted(zip(tu[m].tolist(), eid[m].tolist()))
        ids = [e for _, e in pts]
        lon = [float((e * 104729) % 36000 - 18000) / 100.0 for e in ids]
        lat = [float((e * 7919) % 16000 - 8000) / 100.0 for e in ids]
        kept = _scalar_dp(lon, lat, tol2)
        rows.append((int(u), len(ids), len(kept), sum(kept),
                     sum(ids[p] for p in kept)))
    want = pd.DataFrame(rows, columns=["user_id", "n_points", "n_kept",
                                       "kept_idx_sum", "kept_eid_sum"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # the tolerance actually simplifies (drops points) at this sf
    assert got["n_kept"].sum() < got["n_points"].sum()


def test_misra_gries_forced_trim_exact(ray_session):
    """mg_k far below the per-block vocabulary forces sub > 0 trimming
    in every block; the candidate bound + exact pass must still return
    the exact top-20 (or trip the provable-exactness fallback, which is
    also exact)."""
    from proj_ray.pipelines.queries import misra_gries_topk, token_topk

    want = token_topk(SF).reset_index(drop=True)
    got = misra_gries_topk(SF, mg_k=64).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
