"""Similarity search over embedding columns (list<float>).

- brute-force cosine top-k: per-batch (B, D) @ (D, Q) matmul against a
  broadcast query matrix + local top-k, merged in a tiny final reduce
  (same broadcast-partial-topk shape as stages.knn_stage — no shuffle).
- LSH-bucketed variant (the 100 TB path): random-hyperplane signatures
  bucket vectors; only same-bucket candidates are scored. The
  hyperplane matrix is deterministic (seeded) and broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def batch_matrix(batch: pa.Table, vec_col="embedding") -> np.ndarray:
    """Zero-copy-ish (N, D) float32 from a fixed-length list column."""
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float32, copy=False)
    n = len(col)
    return flat.reshape(n, -1)


def cosine_topk_partial(batch: pa.Table, Q: np.ndarray, k: int,
                        id_col="vec_id", vec_col="embedding") -> pa.Table:
    """Local top-k rows per query for one batch; Q is (nq, D) pre-normalized."""
    M = batch_matrix(batch, vec_col)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    norms = np.linalg.norm(M, axis=1)
    norms = np.where(norms == 0, 1.0, norms)
    sims = (M @ Q.T) / norms[:, None]  # (N, nq)
    out_q, out_id, out_s = [], [], []
    kk = min(k, M.shape[0])
    for j in range(Q.shape[0]):
        s = sims[:, j]
        part = np.lexsort((ids, -s))[:kk]
        out_q.append(np.full(kk, j, dtype=np.int64))
        out_id.append(ids[part])
        out_s.append(s[part].astype(np.float64))
    return pa.table({
        "qj": pa.array(np.concatenate(out_q), pa.int64()),
        "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
        "sim": pa.array(np.concatenate(out_s), pa.float64()),
    })


def ann_cosine_topk(ds, queries: np.ndarray, k=10, id_col="vec_id",
                    vec_col="embedding", batch_size=None) -> pa.Table:
    """Exact brute-force cosine top-k (the baseline the ANN variants are
    judged against). Returns (qid, vec_id, rank, sim)."""
    Qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
    Qn = Qn.astype(np.float32)

    def part(b):
        return cosine_topk_partial(b, Qn, k, id_col=id_col, vec_col=vec_col)

    cand = ds.map_batches(part, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)
    chunks = list(cand.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    schema = pa.schema([("qj", pa.int64()), ("vec_id", pa.int64()), ("sim", pa.float64())])
    tb = pa.concat_tables(chunks) if chunks else schema.empty_table()
    qj = tb["qj"].to_numpy()
    ids = tb["vec_id"].to_numpy()
    sims = tb["sim"].to_numpy()
    rows = {"qid": [], "vec_id": [], "rank": [], "sim": []}
    for j in range(queries.shape[0]):
        m = qj == j
        order = np.lexsort((ids[m], -sims[m]))[:k]
        rows["qid"].extend([j] * len(order))
        rows["vec_id"].extend(ids[m][order].tolist())
        rows["rank"].extend(range(1, len(order) + 1))
        rows["sim"].extend(sims[m][order].tolist())
    return pa.table({k2: pa.array(v) for k2, v in rows.items()})


def hyperplane_signatures(M: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """LSH bucket ids: sign bits against ``planes`` (nbits, D) -> uint64."""
    bits = (M @ planes.T) > 0  # (N, nbits)
    weights = (1 << np.arange(bits.shape[1], dtype=np.int64))
    return (bits.astype(np.int64) * weights[None, :]).sum(axis=1)


def make_planes(dim: int, nbits: int = 12, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((nbits, dim)).astype(np.float32)
