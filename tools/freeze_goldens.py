#!/usr/bin/env python
"""Freeze regression-golden tables for deterministic non-SQL queries.

The driver's correctness gate compares queries() against oracle_sql()
at sf=0.01.  Four queries compute deterministic values that ANSI SQL
cannot express (rolling-hash fingerprint, simhash, Karney geodesics,
the stubbed multimodal decode).  This tool materializes their expected
outputs on /root/testdata/sf0.01 into parquet goldens under
proj_ray/data/goldens/, which the oracle SQL then reads via
``SELECT ... FROM read_parquet(...)`` — turning the rows-only checks
into value checks.

Independence: doc_fingerprint and simhash_docs goldens are computed
here with SLOW SCALAR reference implementations (per-doc / per-byte
Python, the round-1 definitions) — independent of the vectorized
engine kernels they verify.  geod_inverse_ellipsoidal and
multimodal_features goldens are engine snapshots (regression goldens;
the Karney kernel is independently validated against published values
in tests/test_karney.py).

Regenerate only if the driver's testdata generation changes:
    python tools/freeze_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.01"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "proj_ray", "data", "goldens")

_M = np.uint64(0xFFFFFFFFFFFFFFFF)


# --- scalar reference implementations (round-1 per-doc definitions) -------

def mix64_s(x):
    x = np.uint64(x)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & _M
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M
        return x ^ (x >> np.uint64(31))


def ref_fingerprint(t, window=32):
    MOD = (1 << 61) - 1
    BASE = 1000003
    b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
    if b.size == 0:
        return 0
    if b.size <= window:
        h = 0
        for v in b:
            h = (h * BASE + int(v)) % MOD
        return h
    powers = pow(BASE, window - 1, MOD)
    h = 0
    for v in b[:window]:
        h = (h * BASE + int(v)) % MOD
    best = h
    for j in range(window, b.size):
        h = ((h - int(b[j - window]) * powers) * BASE + int(b[j])) % MOD
        best = min(best, h)
    return best


def ref_shingles(t, k):
    b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if b.size < k:
        return np.array([mix64_s(b.sum() if b.size else 0)], dtype=np.uint64)
    with np.errstate(over="ignore"):
        n = b.size - k + 1
        acc = np.zeros(n, dtype=np.uint64)
        BASE = np.uint64(1099511628211)
        for j in range(k):
            acc = (acc * BASE + b[j:j + n]) & _M
    return np.array([mix64_s(v) for v in acc], dtype=np.uint64)


def ref_simhash(t, k=4):
    sh = ref_shingles(t, k)
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    votes = bits.astype(np.int64).sum(axis=0) * 2 - sh.size
    out = np.uint64(0)
    for i in np.flatnonzero(votes > 0):
        out |= np.uint64(1) << np.uint64(i)
    return out


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "text"])
    ids = docs["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = docs["text"].to_pylist()
    print(f"{len(texts)} documents from {SF_DIR}")

    # doc_fingerprint (scalar reference)
    fps = np.array([ref_fingerprint(t) for t in texts], dtype=np.uint64)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "fingerprint": pa.array([str(v) for v in fps], pa.string())})
    pq.write_table(t, os.path.join(OUT_DIR, "doc_fingerprint_sf001.parquet"))
    print("doc_fingerprint golden written")

    # simhash_docs (scalar reference)
    sh = [str(ref_simhash(t)) for t in texts]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "simhash": pa.array(sh, pa.string())})
    pq.write_table(t, os.path.join(OUT_DIR, "simhash_docs_sf001.parquet"))
    print("simhash_docs golden written")

    # engine snapshots: geod + multimodal
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from proj_ray.pipelines.queries import QUERIES

    for name, fname in [("geod_inverse_ellipsoidal", "geod_inverse_sf001.parquet"),
                        ("multimodal_features", "multimodal_sf001.parquet"),
                        ("grid_shift_real", "grid_shift_real_sf001.parquet"),
                        ("minhash_verified_pairs",
                         "minhash_verified_pairs_sf001.parquet"),
                        ("minhash_lsh_candidates",
                         "minhash_lsh_candidates_sf001.parquet"),
                        ("minhash_dedup_clusters",
                         "minhash_dedup_clusters_sf001.parquet"),
                        ("ann_cosine_topk", "ann_cosine_topk_sf001.parquet"),
                        ("ann_lsh_buckets", "ann_lsh_buckets_sf001.parquet"),
                        ("ann_ivf_topk", "ann_ivf_topk_sf001.parquet")]:
        import pandas as pd

        res = QUERIES[name]["fn"](SF_DIR)
        if isinstance(res, pa.Table):
            tbl = res
        elif isinstance(res, pd.DataFrame):
            tbl = pa.Table.from_pandas(res, preserve_index=False)
        else:
            tbl = pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
        pq.write_table(tbl, os.path.join(OUT_DIR, fname))
        print(f"{name} golden written ({tbl.num_rows} rows)")
    ray.shutdown()


if __name__ == "__main__":
    main()
