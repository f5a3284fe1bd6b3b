"""Deduplication kernels: exact content hash, MinHash+LSH, SimHash,
n-gram Jaccard — the mergeable-sketch shapes a 100 TB dedup needs.

Scale plan (per ray_guide 'Aggregation at scale'):
- exact:   hash per batch (vectorized) -> groupby(hash) -> keep first.
  The shuffle moves (hash, id) pairs, never the text.
- minhash: shingle->minhash signature per batch -> explode to
  (band_id, band_hash, id) rows -> groupby bands -> candidate pairs ->
  verify Jaccard on the candidate set only.
All hashing is our own deterministic 64-bit mixing (splitmix64-style
finalizer) so results are reproducible across engines/workers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_M = np.uint64(0xFFFFFFFFFFFFFFFF)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — deterministic vectorized 64-bit mixer."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & _M
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M
        return x ^ (x >> np.uint64(31))


def text_hash64(texts) -> np.ndarray:
    """Content hash: polynomial hash of utf-8 bytes mod 2^64 (uint64
    wraparound), mixed with the length, finalized by mix64. Fully
    vectorized per doc ((bytes * powers).sum()); the powers table is
    computed once per batch for the longest doc and sliced.
    Content-exact: equal strings <=> equal hashes (collisions ~2^-64)."""
    n = len(texts)
    out = np.empty(n, dtype=np.uint64)
    encoded = [(t or "").encode("utf-8") for t in texts]
    max_len = max((len(b) for b in encoded), default=0)
    BASE = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        # powers[i] = BASE^i mod 2^64, highest power first when sliced
        powers = np.ones(max(max_len, 1), dtype=np.uint64)
        if max_len > 1:
            powers[1:] = BASE
            powers = np.cumprod(powers)  # wraps mod 2^64 in C
        for i, raw in enumerate(encoded):
            b = np.frombuffer(raw, dtype=np.uint8).astype(np.uint64)
            if b.size == 0:
                out[i] = np.uint64(0xCBF29CE484222325)
                continue
            out[i] = (b * powers[: b.size][::-1]).sum() ^ (np.uint64(b.size) * BASE)
    return mix64(out)


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Character k-shingle hashes of one document (uint64), vectorized:
    polynomial rolling hash over a sliding byte window."""
    b = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if b.size < k:
        return mix64(np.array([b.sum() if b.size else 0], dtype=np.uint64))
    with np.errstate(over="ignore"):
        # stacked sliding windows as a (n-k+1, k) strided view, then a
        # vectorized polynomial combine per column
        n = b.size - k + 1
        acc = np.zeros(n, dtype=np.uint64)
        BASE = np.uint64(1099511628211)
        for j in range(k):
            acc = (acc * BASE + b[j:j + n]) & _M
        return mix64(acc)


def minhash_signature(text: str, num_perm: int = 64, k: int = 5) -> np.ndarray:
    """MinHash signature: min over shingles of num_perm universal
    hashes h_i(x) = mix64(x ^ seed_i). Mergeable: min of mins."""
    sh = shingle_hashes(text, k)
    seeds = mix64(np.arange(1, num_perm + 1, dtype=np.uint64))
    # (S, P) xor then mix -> min over S
    with np.errstate(over="ignore"):
        m = mix64(sh[:, None] ^ seeds[None, :])
    return m.min(axis=0)


def lsh_band_hashes(sig: np.ndarray, bands: int = 16) -> np.ndarray:
    """Split a signature into bands and hash each band to one uint64."""
    rows = sig.shape[-1] // bands
    s = sig[: bands * rows].reshape(bands, rows)
    with np.errstate(over="ignore"):
        acc = np.zeros(bands, dtype=np.uint64)
        for j in range(rows):
            acc = (acc * np.uint64(0x100000001B3) + s[:, j]) & _M
    return mix64(acc)


def simhash64(text: str, k: int = 4) -> np.uint64:
    """SimHash over character k-shingles: sign-sum of shingle-hash bits."""
    sh = shingle_hashes(text, k)
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    votes = bits.astype(np.int64).sum(axis=0) * 2 - sh.size
    out = np.uint64(0)
    for i in np.flatnonzero(votes > 0):
        out |= np.uint64(1) << np.uint64(i)
    return out


def jaccard_ngrams(a: str, b: str, k: int = 5) -> float:
    """Exact k-shingle Jaccard (the LSH candidate verifier)."""
    sa = set(shingle_hashes(a, k).tolist())
    sb = set(shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


# ---------------------------------------------------------------------------
# batch-level wrappers (map_batches bodies)
# ---------------------------------------------------------------------------

def add_text_hash(batch: pa.Table, text_col="text", out="text_hash") -> pa.Table:
    h = text_hash64(batch[text_col].to_pylist())
    return batch.append_column(out, pa.array(h.astype(np.int64), pa.int64()))


def minhash_bands_batch(batch: pa.Table, text_col="text", id_col="doc_id",
                        num_perm=64, bands=16, k=5) -> pa.Table:
    """Explode each doc into (band_id, band_hash, id) rows — the LSH
    bucketing shuffle input."""
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    texts = batch[text_col].to_pylist()
    out_band, out_hash, out_id = [], [], []
    for i, t in enumerate(texts):
        sig = minhash_signature(t, num_perm=num_perm, k=k)
        bh = lsh_band_hashes(sig, bands=bands)
        out_band.append(np.arange(bands, dtype=np.int64))
        out_hash.append(bh.astype(np.int64))
        out_id.append(np.full(bands, ids[i], dtype=np.int64))
    return pa.table({
        "band_id": pa.array(np.concatenate(out_band), pa.int64()),
        "band_hash": pa.array(np.concatenate(out_hash), pa.int64()),
        id_col: pa.array(np.concatenate(out_id), pa.int64()),
    })


# ---------------------------------------------------------------------------
# Connected components over a duplicate-candidate edge list: min-label
# propagation.  Edges come from exact-hash groups, LSH buckets, or any
# pairwise candidate generator; components give dedup cluster ids
# (cluster = min member id).
#
# Scale shape: the edge list of a dedup run is sub-linear in the corpus
# (only near-duplicate pairs survive banding), so each round is a
# groupby over edges + a groupby over labels — two key-hash shuffles of
# SMALL tables, never of the corpus itself.  Rounds needed = graph
# diameter; dedup graphs are star-like (1-3 rounds).  The corpus join
# happens ONCE at the end, against the broadcast/shuffled label table.


def cc_min_label(edges, max_rounds: int = 10):
    """Connected components by min-label propagation.

    ``edges`` is a Ray Dataset with int64 columns ``src``/``dst`` (or a
    pyarrow Table / pandas DataFrame for driver-side use).  Returns a
    pandas DataFrame (node, label) where label = min node id reachable —
    the component representative.

    Each round: every node's tentative label flows across every edge in
    both directions; a groupby-min collapses to the per-node minimum.
    Converged when no label changed (checked via per-round sum, exact
    on int64)."""
    import pandas as pd

    if hasattr(edges, "to_pandas"):
        df = edges.to_pandas()
    else:
        df = pd.DataFrame(edges)
    if df.empty:  # no duplicate pairs at all -> no labeled nodes
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "label": pd.Series(dtype="int64")})
    src = df["src"].to_numpy(dtype=np.int64)
    dst = df["dst"].to_numpy(dtype=np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    label = pd.Series(nodes, index=nodes)  # start: own id
    for _ in range(max_rounds):
        # candidate labels crossing each edge, both directions
        cand = pd.DataFrame({
            "node": np.concatenate([src, dst, nodes]),
            "lab": np.concatenate([label.loc[dst].to_numpy(),
                                   label.loc[src].to_numpy(),
                                   label.to_numpy()]),
        })
        new = cand.groupby("node")["lab"].min()
        if (new.to_numpy() == label.loc[new.index].to_numpy()).all():
            label = new
            break
        label = new
    out = label.reset_index()
    out.columns = ["node", "label"]
    return out


def exact_dup_edges(ds, id_col="doc_id", hash_col="text_hash"):
    """Star edges (member -> group-min id) per equal-hash group:
    map_batches partial min per hash, tiny groupby-min, then a second
    pass emits (id, group_min) pairs.  Returns a Ray Dataset of
    src/dst int64 edges (only for groups of size >= 2)."""
    import pandas as pd

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy(dtype=np.int64))
        if len(ids) < 2:
            return pd.DataFrame({"src": pd.Series(dtype="int64"),
                                 "dst": pd.Series(dtype="int64")})
        return pd.DataFrame({"src": ids[1:], "dst": ids[0]})

    return ds.groupby(hash_col).map_groups(per_group, batch_format="pandas")
