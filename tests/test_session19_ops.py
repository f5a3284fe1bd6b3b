"""Round-5 session-19 operators, each pinned against an INDEPENDENT
scalar/single-process implementation (not the engine path, not the
DuckDB oracle): grouped OLS regression, per-user Shannon entropy,
2-D skyline, distributed embedding covariance + PCA projection,
column profiling, Markov transition counts."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- regression

def test_regr_matches_scalar_ols(ray_session):
    from proj_ray.pipelines.queries import linestatus_price_qty_regr

    got = linestatus_price_qty_regr(SF)
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_linestatus", "l_quantity", "l_extendedprice"]
    ).to_pandas()
    for _, row in got.iterrows():
        sub = li[li["l_linestatus"] == row["l_linestatus"]]
        x = sub["l_quantity"].to_numpy(np.float64)
        y = np.floor(sub["l_extendedprice"].to_numpy() * 100.0
                     + 0.5)  # cents
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(row["slope"] - slope) < 1e-6 * abs(slope)
        assert abs(row["intercept"] - intercept) < 1e-6 * abs(intercept)
        assert row["n"] == len(sub)


# ---------------------------------------------------------------- entropy

def test_entropy_matches_scalar(ray_session):
    from proj_ray.pipelines.queries import user_event_entropy

    got = user_event_entropy(SF).set_index("user_id")
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    for uid, sub in ev.groupby("user_id"):
        cnt = sub.groupby("event_type").size().sort_index()
        p = cnt.to_numpy(np.float64) / float(cnt.sum())
        acc = 0.0
        for t in p * np.log(p):  # same left fold, type-ascending
            acc += t
        want = np.floor(-acc * 1.0e6 + 0.5) / 1.0e6
        assert got.loc[uid, "entropy"] == want, uid
        assert got.loc[uid, "n_events"] == len(sub)
    assert len(got) == ev["user_id"].nunique()
    # single-type users must canonicalize to +0.0, not -0.0
    one = got[got["entropy"] == 0.0]
    if len(one):
        assert not np.signbit(one["entropy"].to_numpy()).any()


# ---------------------------------------------------------------- skyline

def test_skyline_matches_bruteforce(ray_session):
    from proj_ray.pipelines.queries import order_skyline

    got = order_skyline(SF)
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    p = np.floor(o["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    d = o["o_orderdate"].astype("int64").to_numpy()
    keep = []
    for i in range(len(o)):
        dom = ((p >= p[i]) & (d >= d[i])
               & ((p > p[i]) | (d > d[i])))
        if not dom.any():
            keep.append(int(o["o_orderkey"].iloc[i]))
    assert sorted(got["o_orderkey"].tolist()) == sorted(keep)


def test_sky_pairs_bruteforce_random():
    from proj_ray.pipelines.queries import _sky_member, _sky_pairs

    rng = np.random.RandomState(7)
    for trial in range(20):
        n = rng.randint(1, 60)
        p = rng.randint(0, 8, n).astype(np.int64)
        d = rng.randint(0, 8, n).astype(np.int64)  # many exact ties
        fp, fd = _sky_pairs(p, d)
        m = _sky_member(p, d, fp, fd)
        for i in range(n):
            dom = ((p >= p[i]) & (d >= d[i])
                   & ((p > p[i]) | (d > d[i])))
            assert m[i] == (not dom.any()), (trial, i)


def test_skyline_associative_under_splits():
    """Local-frontier-then-merge must equal the single-pass frontier
    for ANY block split (the distributed path's correctness lemma)."""
    from proj_ray.pipelines.queries import _sky_member, _sky_pairs

    rng = np.random.RandomState(11)
    p = rng.randint(0, 1000, 500).astype(np.int64)
    d = rng.randint(0, 1000, 500).astype(np.int64)
    fp, fd = _sky_pairs(p, d)
    want = set(zip(fp.tolist(), fd.tolist()))
    for nsplit in (2, 3, 7):
        parts = np.array_split(np.arange(500), nsplit)
        cp, cd = [], []
        for idx in parts:
            lp, ld = _sky_pairs(p[idx], d[idx])
            mloc = _sky_member(p[idx], d[idx], lp, ld)
            cp.append(p[idx][mloc])
            cd.append(d[idx][mloc])
        gp, gd = _sky_pairs(np.concatenate(cp), np.concatenate(cd))
        assert set(zip(gp.tolist(), gd.tolist())) == want, nsplit


# ------------------------------------------------------------- covariance

def test_embedding_covariance_matches_numpy_exact(ray_session):
    from proj_ray.pipelines.queries import embedding_covariance

    got = embedding_covariance(SF)
    M = np.stack(pq.read_table(f"{SF}/embeddings.parquet")
                 .to_pandas()["embedding"].to_numpy())
    Q = np.floor(M.astype(np.float64) * 10000.0 + 0.5).astype(np.int64)
    n = np.float64(Q.shape[0])
    G = Q.T @ Q
    s = Q.sum(axis=0)
    iu, ju = np.triu_indices(Q.shape[1])
    want_sij = G[iu, ju]
    want_cov = ((n * want_sij.astype(np.float64)
                 - s[iu].astype(np.float64) * s[ju].astype(np.float64))
                / (n * n)) / 1.0e8
    g = got.sort_values(["i", "j"]).reset_index(drop=True)
    assert np.array_equal(g["i"].to_numpy(), iu + 1)
    assert np.array_equal(g["j"].to_numpy(), ju + 1)
    assert np.array_equal(g["sij"].to_numpy(), want_sij)
    assert np.array_equal(g["cov"].to_numpy(), want_cov)  # bitwise


def test_pca_project_matches_single_process(ray_session):
    from proj_ray.pipelines.queries import (embedding_pca_project,
                                            pca_components)

    got = embedding_pca_project(SF).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    df = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    Q = np.floor(M * 10000.0 + 0.5)
    mu = Q.mean(axis=0)
    cov = (Q - mu).T @ (Q - mu) / Q.shape[0]
    V = pca_components(cov, 2)
    want = ((Q - mu) @ V) / 1.0e4
    order = np.argsort(df["vec_id"].to_numpy())
    want = want[order]
    gotf = got[["pc1_micro", "pc2_micro"]].to_numpy() / 1.0e6
    # the engine's ordered fold vs BLAS matmul -> 1e-6-grid tolerance;
    # the sign convention must agree exactly (no abs() here)
    assert np.allclose(gotf, want, rtol=0, atol=2e-6)
    # projection variance must equal the top eigenvalues
    w = np.linalg.eigvalsh(cov)[::-1][:2] / 1.0e8
    assert np.allclose(gotf.var(axis=0), w, rtol=1e-4)
    # determinism across runs (block-split invariance): re-run bitwise
    again = embedding_pca_project(SF).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    assert np.array_equal(
        got[["pc1_micro", "pc2_micro"]].to_numpy(),
        again[["pc1_micro", "pc2_micro"]].to_numpy())


def test_pca_components_sign_deterministic():
    from proj_ray.pipelines.queries import pca_components

    rng = np.random.RandomState(3)
    A = rng.randn(10, 10)
    cov = A @ A.T
    V1 = pca_components(cov, 3)
    V2 = pca_components(cov.copy(), 3)
    assert np.array_equal(V1, V2)
    assert (V1[np.argmax(np.abs(V1), axis=0),
               np.arange(3)] > 0).all()


# ---------------------------------------------------------------- profile

def test_orders_profile_matches_pandas(ray_session):
    from proj_ray.pipelines.queries import _PROFILE_COLS, orders_profile

    got = orders_profile(SF).set_index("column_name")
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=list(_PROFILE_COLS)).to_pandas()
    for c in _PROFILE_COLS:
        assert got.loc[c, "n"] == len(o)
        assert got.loc[c, "n_null"] == int(o[c].isna().sum())
        assert got.loc[c, "n_distinct"] == o[c].nunique(), c
        if c in ("o_orderkey", "o_custkey"):
            enc = o[c].to_numpy(np.int64)
        elif c == "o_totalprice":
            enc = np.floor(o[c].to_numpy() * 100.0 + 0.5).astype(np.int64)
        elif c == "o_orderdate":
            enc = o[c].astype("int64").to_numpy()
        else:
            enc = o[c].str.len().to_numpy().astype(np.int64)
        assert got.loc[c, "min_enc"] == enc.min(), c
        assert got.loc[c, "max_enc"] == enc.max(), c


# ------------------------------------------------------------ transitions

def test_transitions_match_scalar(ray_session):
    from proj_ray.pipelines.queries import event_transition_counts

    got = event_transition_counts(SF)
    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"]).to_pandas()
    want: dict = {}
    for _, sub in ev.groupby("user_id"):
        t = sub.sort_values(["ts", "event_id"])["event_type"].tolist()
        for a, b in zip(t, t[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    gd = {(r.prev_type, r.next_type): r.n for r in got.itertuples()}
    assert gd == want


# ---------------------------------------------------------------- spearman

def test_spearman_matches_pandas_rank(ray_session):
    from proj_ray.pipelines.queries import spearman_qty_discount

    got = spearman_qty_discount(SF)
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_quantity", "l_discount"]).to_pandas()
    x = li["l_quantity"].astype(np.int64)
    y = np.floor(li["l_discount"] * 100.0 + 0.5).astype(np.int64)
    rx = pd.Series(x).rank(method="average")
    ry = pd.Series(y).rank(method="average")
    want = np.corrcoef(rx, ry)[0, 1]
    assert got["n"].iloc[0] == len(li)
    assert abs(got["spearman_rho"].iloc[0] - want) < 1e-12


# --------------------------------------------------------- weighted median

def test_weighted_median_matches_bruteforce(ray_session):
    from proj_ray.pipelines.queries import returnflag_weighted_median

    got = returnflag_weighted_median(SF).set_index("l_returnflag")
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    ).to_pandas()
    li["v"] = np.floor(li["l_extendedprice"] * 100.0 + 0.5).astype(np.int64)
    li["w"] = li["l_quantity"].astype(np.int64)
    for f, grp in li.groupby("l_returnflag"):
        grp = grp.sort_values("v")
        tw = int(grp["w"].sum())
        cums = grp["w"].cumsum().to_numpy()
        want = int(grp["v"].to_numpy()[np.flatnonzero(2 * cums >= tw)[0]])
        assert got.loc[f, "wmedian_cents"] == want, f
        assert got.loc[f, "total_weight"] == tw, f


# --------------------------------------------------------------- drift ops

def test_chi2_matches_scalar(ray_session):
    from proj_ray.pipelines.queries import event_dow_chi2

    got = event_dow_chi2(SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type"]).to_pandas()
    d = (ev["ts"].astype("int64").to_numpy() // 86_400_000_000) % 7
    ct = pd.crosstab(ev["event_type"], d).to_numpy().astype(np.float64)
    n = ct.sum()
    # alternative formulation: chi2 = n * (sum o^2/(rs*cs) - 1)
    rs, cs = ct.sum(axis=1), ct.sum(axis=0)
    want = n * ((ct ** 2 / np.outer(rs, cs)).sum() - 1.0)
    assert abs(got["chi2"].iloc[0] - want) < 1e-5
    assert got["dof"].iloc[0] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert got["n"].iloc[0] == int(n)


def test_jsd_matches_scalar_and_bounds(ray_session):
    from proj_ray.pipelines.queries import weekpart_type_jsd

    got = weekpart_type_jsd(SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type"]).to_pandas()
    d = (ev["ts"].astype("int64").to_numpy() // 86_400_000_000) % 7
    a = ev.loc[d < 5, "event_type"].value_counts()
    b = ev.loc[d >= 5, "event_type"].value_counts()
    types = sorted(set(a.index) | set(b.index))
    p = np.array([a.get(t, 0) for t in types], np.float64) / a.sum()
    q = np.array([b.get(t, 0) for t in types], np.float64) / b.sum()
    m = 0.5 * (p + q)
    want = 0.0
    for i in range(len(types)):
        if p[i] > 0:
            want += 0.5 * p[i] * np.log(p[i] / m[i])
        if q[i] > 0:
            want += 0.5 * q[i] * np.log(q[i] / m[i])
    assert abs(got["jsd"].iloc[0] - want) < 1e-5
    assert 0.0 <= got["jsd"].iloc[0] <= np.log(2.0)
    assert got["na"].iloc[0] == int(a.sum())
    assert got["nb"].iloc[0] == int(b.sum())


def test_ks_matches_scalar(ray_session):
    from proj_ray.pipelines.queries import click_view_ks

    got = click_view_ks(SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    x = np.sort(np.floor(
        ev.loc[ev["event_type"] == "click", "value"].to_numpy() * 100.0
        + 0.5).astype(np.int64))
    y = np.sort(np.floor(
        ev.loc[ev["event_type"] == "view", "value"].to_numpy() * 100.0
        + 0.5).astype(np.int64))
    grid = np.unique(np.concatenate([x, y]))
    f1 = np.searchsorted(x, grid, side="right")
    f2 = np.searchsorted(y, grid, side="right")
    num = int(np.abs(f1 * len(y) - f2 * len(x)).max())
    assert got["ks_num"].iloc[0] == num
    assert got["n1"].iloc[0] == len(x)
    assert got["n2"].iloc[0] == len(y)
    assert got["ks_d"].iloc[0] == num / (len(x) * len(y))


# ------------------------------------------------------------ kaplan-meier

def test_survival_matches_scalar_km(ray_session):
    from proj_ray.pipelines.queries import signup_purchase_survival

    got = signup_purchase_survival(SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_type"]).to_pandas()
    tu = ev["ts"].astype("int64")
    end = int(tu.max())
    su, pu = {}, {}
    for uid, t, k in zip(ev["user_id"], tu, ev["event_type"]):
        if k == "signup":
            su[uid] = min(su.get(uid, t), t)
        elif k == "purchase":
            pu[uid] = min(pu.get(uid, t), t)
    durs = []
    for uid, s in su.items():
        p = pu.get(uid)
        if p is not None and p < s:
            continue  # excluded rule
        if p is None:
            durs.append(((end - s) // 86_400_000_000, 0))
        else:
            durs.append(((p - s) // 86_400_000_000, 1))
    days = sorted({t for t, _ in durs})
    n_at = {t: sum(1 for u, _ in durs if u >= t) for t in days}
    d_at = {t: sum(1 for u, e in durs if u == t and e == 1) for t in days}
    S, rows = 1.0, []
    for t in days:
        S *= 1.0 - d_at[t] / n_at[t]
        if d_at[t] > 0:
            rows.append((t, d_at[t], n_at[t], S))
    assert len(got) == len(rows)
    for (t, d, n, S), (_, r) in zip(rows, got.iterrows()):
        assert r["day"] == t and r["d"] == d and r["n_risk"] == n
        assert abs(r["survival"] - S) < 2e-6
    # survival is non-increasing and in (0, 1]
    sv = got["survival"].to_numpy()
    assert (np.diff(sv) <= 0).all() and sv[0] <= 1.0 and (sv >= 0).all()
