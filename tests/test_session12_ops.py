"""Round-5 session-12 scale-hardening pack: the three r4 scale-weak
operators de-weakened (VERDICT r4 asks #1-#3) plus the codec adapter
and the jsonl float round-trip fix.

- brand_edit_pairs: deletion-neighborhood blocking replaces the V^2
  triu enumeration; driver/distributed/all-pairs parity.
- semdedup_keep: oversized cells split via capped_bucket_pairs;
  forced-split parity against a driver recomputation of the same
  capped rule.
- skew_split_join: Misra-Gries bounded hot-key detection; forced-path
  parity against the exact-count path.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(qname, tables, sf=SF):
    from proj_ray.pipelines.queries import QUERIES

    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con.sql(QUERIES[qname]["sql"]).fetchdf()


# --- deletion-neighborhood blocking ----------------------------------------


def test_deletion1_keys_exact_superset():
    """Every true distance<=1 pair over a random vocabulary shares a
    blocking key (the symmetric-delete guarantee); verification over
    candidates reproduces the brute-force all-pairs result exactly."""
    from proj_ray.functions.text import (deletion1_keys, key_group_pairs,
                                         levenshtein_pairs)

    rng = np.random.default_rng(12)
    alph = list("abcd")
    strs = np.array(sorted({"".join(rng.choice(alph, rng.integers(0, 7)))
                            for _ in range(500)}))
    V = len(strs)
    ia, ib = np.triu_indices(V, k=1)
    dist = levenshtein_pairs(list(strs[ia]), list(strs[ib]))
    true = set(zip(ia[dist <= 1].tolist(), ib[dist <= 1].tolist()))

    keys, owners = deletion1_keys(list(strs))
    ca, cb = key_group_pairs(keys, owners)
    cand = set(zip(ca.tolist(), cb.tolist()))
    assert true <= cand, "blocking lost a true pair"
    # candidate volume is near-linear, not quadratic
    assert len(cand) < len(ia) // 4
    d2 = levenshtein_pairs(list(strs[ca]), list(strs[cb]))
    got = set(zip(ca[d2 <= 1].tolist(), cb[d2 <= 1].tolist()))
    assert got == true


def test_deletion1_keys_empty_and_short():
    from proj_ray.functions.text import deletion1_keys, key_group_pairs

    k, o = deletion1_keys([])
    assert len(k) == 0
    ca, cb = key_group_pairs(k, o)
    assert len(ca) == 0
    # '' and single chars: '' is within distance 1 of every 1-char str
    k, o = deletion1_keys(["", "a", "b", "ab"])
    ca, cb = key_group_pairs(k, o)
    pairs = set(zip(ca.tolist(), cb.tolist()))
    assert (0, 1) in pairs and (0, 2) in pairs  # ''~'a', ''~'b'
    assert (1, 3) in pairs and (2, 3) in pairs  # 'a'~'ab', 'b'~'ab'


def test_brand_edit_pairs_paths_match_oracle(ray_session):
    from proj_ray.pipelines.queries import brand_edit_pairs

    want = _oracle("brand_edit_pairs", ["part"])
    drv = brand_edit_pairs(SF)
    dist = brand_edit_pairs(SF, path="distributed")
    for got in (drv, dist):
        got = got.reset_index(drop=True)
        assert len(got) == len(want)
        assert (got["brand_a"].to_numpy() == want["brand_a"].to_numpy()).all()
        assert (got["brand_b"].to_numpy() == want["brand_b"].to_numpy()).all()
        assert (got["dist"].to_numpy(np.int64)
                == want["dist"].to_numpy(np.int64)).all()


# --- semdedup capped-cell split ---------------------------------------------


def _semdedup_driver_capped(sf, cap):
    """Independent driver recomputation of the capped SemDeDup rule:
    same centroids, same assignment, same capped candidate pairs, same
    dimension-ordered cosines — but all in one flat pass, no Ray."""
    from proj_ray.functions.vector import (capped_bucket_pairs,
                                           cosine_pairs_f64,
                                           hyperplane_signatures_f64,
                                           ivf_assign, kmeans_cosine)
    from proj_ray.pipelines.queries import (_SEM_EXT_LEVELS, _SEM_NCELLS,
                                            _SEM_TAU, _sem_ext_planes)

    con = duckdb.connect()
    sv = con.sql(f"SELECT embedding FROM '{sf}/embeddings.parquet' "
                 f"WHERE vec_id % 7 = 0 ORDER BY vec_id LIMIT 1024").fetchall()
    full = con.sql(f"SELECT vec_id, embedding FROM "
                   f"'{sf}/embeddings.parquet' ORDER BY vec_id").fetchall()
    con.close()
    S = np.array([list(r[0]) for r in sv], dtype=np.float32)
    C = kmeans_cosine(S, _SEM_NCELLS)
    vid = np.array([r[0] for r in full], dtype=np.int64)
    M = np.array([list(r[1]) for r in full], dtype=np.float32)
    cell = ivf_assign(M, C)
    kept = np.ones(len(vid), np.int64)
    for c in np.unique(cell):
        rows = np.flatnonzero(cell == c)  # vid-ascending already
        X = M[rows]
        m = len(rows)
        ext_cache = {}

        def get_ext(level, rr, X=X, ext_cache=ext_cache):
            if level not in ext_cache:
                ext_cache[level] = hyperplane_signatures_f64(
                    X, _sem_ext_planes(level))
            return ext_cache[level][rr]

        ia, ib = capped_bucket_pairs(np.arange(m, dtype=np.int64),
                                     np.zeros(m, np.int64),
                                     get_ext, _SEM_EXT_LEVELS, cap)
        if len(ia):
            cos = cosine_pairs_f64(X[ia], X[ib])
            kept[rows[ib[cos >= _SEM_TAU]]] = 0
    return pd.DataFrame({"vec_id": vid, "cell": cell.astype(np.int64),
                         "kept": kept}).sort_values("vec_id") \
        .reset_index(drop=True)


@pytest.mark.parametrize("cap", [4, 32])
def test_semdedup_forced_split_parity(ray_session, cap):
    """Forcing a tiny cap exercises the recursive extension-signature
    split; the distributed map_groups result must equal an independent
    flat driver recomputation of the identical capped rule."""
    from proj_ray.pipelines.queries import semdedup_keep

    got = semdedup_keep(SF, cap=cap).reset_index(drop=True)
    want = _semdedup_driver_capped(SF, cap)
    assert (got["vec_id"].to_numpy(np.int64)
            == want["vec_id"].to_numpy(np.int64)).all()
    assert (got["cell"].to_numpy(np.int64)
            == want["cell"].to_numpy(np.int64)).all()
    assert (got["kept"].to_numpy(np.int64)
            == want["kept"].to_numpy(np.int64)).all()


def test_semdedup_capped_is_keep_superset(ray_session):
    """Capping only removes comparisons, so it can only KEEP more."""
    from proj_ray.pipelines.queries import semdedup_keep

    full = semdedup_keep(SF, cap=1 << 30)
    capped = semdedup_keep(SF, cap=8)
    m = full.merge(capped, on="vec_id", suffixes=("_f", "_c"))
    assert (m["kept_c"].to_numpy() >= m["kept_f"].to_numpy()).all()


# --- skew join bounded hot-key detection ------------------------------------


def test_skew_split_join_mg_detection_parity(ray_session):
    """Forcing the Misra-Gries detection path (threshold 0) must yield
    the identical join output as the exact-count path — the hot set is
    routing, not semantics."""
    from proj_ray.pipelines.queries import skew_split_join

    exact = skew_split_join(SF).reset_index(drop=True)
    mg = skew_split_join(SF, detect_rows_threshold=0).reset_index(drop=True)
    for c in ("event_id", "user_id", "acctbal_cents"):
        assert (exact[c].to_numpy(np.int64) == mg[c].to_numpy(np.int64)).all()


def test_hot_keys_mg_bounded_and_exact_census(ray_session):
    """With no trimming (D == 0) the MG summary is an exact census and
    cold_exists is exact; with tiny mg_k, trimming forces
    cold_exists=True via the pigeonhole argument."""
    import ray.data as rd

    from proj_ray.pipelines.queries import _hot_keys_mg

    uid = np.r_[np.repeat(7, 100), np.arange(50)].astype(np.int64)
    ds = rd.from_arrow(pa.table({"user_id": pa.array(uid, pa.int64()),
                                 "event_id": pa.array(
                                     np.arange(len(uid)), pa.int64())}))
    hot, cold = _hot_keys_mg(ds, hot_k=1, mg_k=4096)
    assert list(hot) == [7]
    assert cold
    # all keys hot, exact census => no cold side
    hot, cold = _hot_keys_mg(ds, hot_k=64, mg_k=4096)
    assert len(hot) == 50 and not cold  # 50 distinct keys (7 repeats)
    # forced trimming: mg_k smaller than per-block distinct keys
    hot, cold = _hot_keys_mg(ds, hot_k=1, mg_k=4)
    assert 7 in set(hot.tolist())
    assert cold


# --- codec adapter & jsonl precision ----------------------------------------


def test_decode_stage_adapter_schema():
    """Fake path always runs; the real path runs when PIL is present
    (not in this container) — both must emit the identical schema."""
    from proj_ray.stages.multimodal import DecodeStage, _pil_image

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([b"abcdefgh" * 4, None], pa.binary()),
                  "media_type": pa.array(["image/png"] * 2, pa.string())})
    fake = DecodeStage(deterministic_fake=True)(t)
    assert fake.column_names == ["doc_id", "media_type",
                                 "payload_bytes", "features"]
    assert fake["features"].type == pa.list_(pa.float32(), 8)
    if _pil_image() is None:
        with pytest.raises(NotImplementedError):
            DecodeStage(deterministic_fake=False)
    else:  # pragma: no cover - PIL not in this container
        real = DecodeStage(deterministic_fake=False)(t)
        assert real.schema == fake.schema


def test_jsonl_float64_roundtrip(ray_session, tmp_path):
    """The jsonl sink must round-trip float64 bit-exactly — polars'
    write_ndjson (shortest-exact repr) closes the advice-r4 gap where
    pandas to_json's 15-digit cap lost the last ulp on values like
    1/3."""
    import ray.data as rd

    from proj_ray.sources.jsonl import read_jsonl, write_jsonl_stage

    vals = np.array([1.0 / 3.0, 1e-17, 123456789.123456789, -np.pi],
                    dtype=np.float64)
    t = pa.table({"pid": pa.array(np.arange(4), pa.int64()),
                  "x": pa.array(vals, pa.float64())})
    out = str(tmp_path / "jl")
    write_jsonl_stage(rd.from_arrow(t), out, id_col="pid",
                      ts_cols=()).materialize()
    back = read_jsonl(out, ts_cols=()).to_pandas().sort_values("pid")
    got = back["x"].to_numpy(np.float64)
    assert np.array_equal(got, vals), (got, vals)


# --- leakage-controlled split -----------------------------------------------


def test_split_by_domain_matches_oracle(ray_session):
    from proj_ray.pipelines.queries import split_by_domain

    got = split_by_domain(SF).reset_index(drop=True)
    want = _oracle("split_by_domain", ["documents"])
    assert list(got["split"]) == list(want["split"])
    for c in ("n_docs", "n_domains", "sum_chars"):
        assert (got[c].to_numpy(np.int64)
                == want[c].to_numpy(np.int64)).all(), c
    # leakage control: a domain appears in exactly one split
    assert int(got["n_domains"].sum()) == 50
    assert int(got["n_docs"].sum()) == 500  # sf0.001 documents rows
