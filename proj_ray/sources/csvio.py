"""CSV source/sink — the third text container beside WARC and JSONL
(what spreadsheet-era corpus drops and many labeling tools exchange).

Scale notes (same contract as sources/warc.py and sources/jsonl.py):
- WRITER: a ``map_batches`` stage — each task serializes its batch with
  ``pyarrow.csv.write_csv`` (RFC-4180 quoting, so embedded commas,
  quotes and newlines round-trip) into ONE shard named by the batch's
  minimum record id (ids are disjoint across blocks, so names never
  collide; tmp-file + atomic rename makes re-runs idempotent GIVEN
  IDENTICAL BLOCK BOUNDARIES — a re-run whose blocks split differently
  leaves stale differently-named shards behind, so callers must clear
  or validate the output dir first, as the round-trip queries do).
- READER: ``ray.data.read_csv`` — one Arrow-CSV read task per shard
  file; a 100-TB corpus of many .csv shards parallelizes for free.
- Timestamps travel as int64 epoch-microseconds: CSV carries no types,
  and Arrow's inference would re-read an ISO string ambiguously;
  integers round-trip bit-exactly.  Empty strings are preserved (the
  reader is configured with strings_can_be_null=False, Arrow's
  default), so text columns round-trip byte-identically.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.csv as pacsv


def write_csv_stage(ds, out_dir: str, id_col: str = "pid",
                    ts_cols: tuple = ("warc_ts",)):
    """Sink stage: one .csv shard per batch, named by the batch's min
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
        path = os.path.join(out_dir, "part-%016d.csv" % int(ids.min()))
        tmp = path + ".tmp"
        pacsv.write_csv(batch, tmp)
        os.replace(tmp, path)  # atomic publish
        return pa.table({"path": pa.array([path]),
                         "n_records": pa.array([batch.num_rows], pa.int64())})

    return ds.map_batches(write_shard, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)


def read_csv_shards(paths, ts_cols: tuple = ("warc_ts",), **kwargs):
    """ray.data entry: Dataset from .csv shards; int64 epoch-us columns
    named in ``ts_cols`` cast back to timestamp[us]."""
    import ray.data as rd

    ds = rd.read_csv(paths, file_extensions=["csv"], **kwargs)

    def back(t: pa.Table) -> pa.Table:
        for c in ts_cols:
            if c in t.column_names:
                i = t.column_names.index(c)
                t = t.set_column(i, c, t[c].cast(pa.int64())
                                 .cast(pa.timestamp("us")))
        return t

    return ds.map_batches(back, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
