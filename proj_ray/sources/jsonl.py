"""JSONL source/sink — the lingua-franca container for LLM training
data (one JSON object per line; what most public corpus releases and
curation tools exchange).

Scale notes (same contract as sources/warc.py):
- WRITER: a ``map_batches`` stage — each task serializes its batch
  with polars' Rust ``write_ndjson`` (shortest-exact float repr, so
  float64 round-trips bitwise) into ONE shard named by the
  batch's minimum record id (ids are disjoint across blocks, so names
  never collide; tmp-file + atomic rename makes re-runs idempotent
  GIVEN IDENTICAL BLOCK BOUNDARIES — a re-run whose blocks split
  differently leaves stale differently-named shards behind, so callers
  must clear or validate the output dir first, as the round-trip
  queries do).
- READER: ``ray.data.read_json`` — one Arrow-JSON read task per shard
  file; a 100-TB corpus of many .jsonl shards parallelizes for free.
- Timestamps travel as int64 epoch-microseconds (a JSON number):
  ISO strings would round-trip through Arrow's type inference
  ambiguously; integers round-trip bit-exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def write_jsonl_stage(ds, out_dir: str, id_col: str = "pid",
                      ts_cols: tuple = ("warc_ts",)):
    """Sink stage: one .jsonl shard per batch, named by the batch's min
    id.  Timestamp columns serialize as int64 epoch-us.  Returns a
    manifest Dataset (path, n_records); consuming it drives the write."""
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64())})
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        for c in ts_cols:
            if c in batch.column_names:
                i = batch.column_names.index(c)
                batch = batch.set_column(i, c, batch[c].cast(pa.int64()))
        path = os.path.join(out_dir, "part-%016d.jsonl" % int(ids.min()))
        tmp = path + ".tmp"
        # polars' NDJSON writer (Rust ryu): floats serialize as their
        # SHORTEST EXACT representation, so float64 columns round-trip
        # bit-identically through Arrow's JSON reader — pandas to_json
        # caps double_precision at 15 digits, which loses the last ulp
        # on values like 1/3 (r4 advice item)
        import polars as pl

        pl.from_arrow(batch).write_ndjson(tmp)
        os.replace(tmp, path)  # atomic publish: idempotent re-runs
        return pa.table({"path": pa.array([path]),
                         "n_records": pa.array([batch.num_rows], pa.int64())})

    return ds.map_batches(write_shard, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)


def read_jsonl(paths, ts_cols: tuple = ("warc_ts",), **kwargs):
    """ray.data entry: Dataset from .jsonl shards; int64 epoch-us
    columns named in ``ts_cols`` cast back to timestamp[us]."""
    import ray.data as rd

    ds = rd.read_json(paths, file_extensions=["jsonl"], **kwargs)

    def back(t: pa.Table) -> pa.Table:
        for c in ts_cols:
            if c in t.column_names:
                i = t.column_names.index(c)
                t = t.set_column(i, c, t[c].cast(pa.timestamp("us")))
        return t

    return ds.map_batches(back, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
