"""Global per-key ordinals (ROW_NUMBER) over a distributed sort — the
primitive under the SQL rank-function family (ROW_NUMBER / NTILE /
PERCENT_RANK), which the reference engine has no counterpart for (it is
a pure streaming map, SURVEY §2.8); this is one of the wide additions a
training-data pipeline needs (e.g. quantile-bucket stratification).

Distributed shape (the watermark-filter pattern, stages/watermark.py —
no sequential driver scan over rows):

1. one range shuffle: ``sort(key, *order_cols, unique_col)`` — blocks
   come out globally ordered, rows ordered within blocks, and the
   trailing unique column makes the order TOTAL;
2. pass 1: per-block partials — the block's first-row sort tuple (its
   identity: rows are distinct under a total order, so first rows of
   distinct blocks differ) plus per-key row counts inside the block —
   one tiny frame of O(#keys-in-block) rows per BLOCK to the driver;
3. driver: order the block partials by the typed first-row tuple,
   running per-key prefix counts -> each block's per-key starting
   ordinal, broadcast as a dict keyed by the first-row tuple
   (O(#blocks x #keys-per-block) state, never corpus-proportional);
4. pass 2: per block, rows of one key are contiguous (sorted), so the
   0-based global ordinal is ``carry[key] + arange(run_length)`` —
   fully vectorized, streams one output row per input row.

Wall-clock: one sort + two linear passes, identical to the watermark
filter; per-key totals come out of the same pass-1 reduction for free
(NTILE and PERCENT_RANK need them).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _first_tuple(t: pa.Table, sort_cols) -> tuple:
    return tuple(t[c][0].as_py() for c in sort_cols)


def append_global_ordinals(ds, key_col: str, order_cols: list[str],
                           unique_col: str):
    """Return ``(ordered_ds, totals)``: ``ordered_ds`` is ``ds`` sorted
    by ``(key_col, *order_cols, unique_col)`` with an int64 ``ordinal``
    column appended — the 0-based global position of the row within its
    key partition under that order — and ``totals`` is a dict
    ``{key: n_rows}`` of per-key row counts.

    ``unique_col`` must be unique across rows (it makes the sort a
    total order, which is what makes the block identity sound — and is
    exactly SQL's determinism requirement for ROW_NUMBER/NTILE)."""
    sort_cols = [key_col] + list(order_cols) + [unique_col]
    ordered = ds.sort(sort_cols).materialize()

    def partial(t: pa.Table) -> pa.Table:
        cols: dict = {f"f{i}": [] for i in range(len(sort_cols))}
        cols["key"] = []
        cols["n"] = []
        if t.num_rows:
            keys = t[key_col].to_numpy(zero_copy_only=False)
            # within a sorted block the key runs appear in sorted
            # order, matching np.unique's sorted output
            uniq, counts = np.unique(keys, return_counts=True)
            first = _first_tuple(t, sort_cols)
            for i, v in enumerate(first):
                cols[f"f{i}"] = [v] * len(uniq)
            cols["key"] = list(uniq)
            cols["n"] = counts.astype(np.int64)
        out = {c: cols[c] for c in cols}
        return pa.Table.from_pydict(out) if t.num_rows else pa.table({
            "key": pa.array([], t[key_col].type),
            "n": pa.array([], pa.int64()),
            **{f"f{i}": pa.array([], t[c].type)
               for i, c in enumerate(sort_cols)}})

    parts = (ordered.map_batches(partial, batch_format="pyarrow",
                                 batch_size=None, zero_copy_batch=True)
             .to_pandas())
    if parts.empty:
        return ordered, {}
    fcols = [f"f{i}" for i in range(len(sort_cols))]
    # typed lexicographic order of blocks = global block order
    parts = parts.sort_values(fcols, kind="mergesort")

    running: dict = {}
    carry: dict = {}
    for blk_id, grp in parts.groupby(fcols, sort=False):
        key = blk_id if isinstance(blk_id, tuple) else (blk_id,)
        carry[key] = {k: running.get(k, 0) for k in grp["key"].tolist()}
        for k, n in zip(grp["key"], grp["n"]):
            running[k] = running.get(k, 0) + int(n)
    totals = dict(running)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("ordinal", pa.array([], pa.int64()))
        keys = t[key_col].to_numpy(zero_copy_only=False)
        starts = carry[_first_tuple(t, sort_cols)]
        # contiguous key runs under the global sort
        n = len(keys)
        change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
        bounds = np.concatenate([[0], change, [n]])
        out = np.empty(n, np.int64)
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            out[lo:hi] = starts[keys[lo]] + np.arange(hi - lo)
        return t.append_column("ordinal", pa.array(out, pa.int64()))

    return (ordered.map_batches(assign, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True),
            totals)


def ntile_of(ordinals: np.ndarray, n: int, tiles: int) -> np.ndarray:
    """SQL NTILE: split n ordered rows into ``tiles`` groups whose sizes
    differ by at most one, the larger groups first.  ``ordinals`` are
    0-based global positions; returns 1-based tile numbers (int64)."""
    q, rem = divmod(int(n), int(tiles))
    boundary = rem * (q + 1)
    r = ordinals.astype(np.int64)
    big = r // (q + 1)  # valid where r < boundary
    small = rem + (r - boundary) // max(q, 1)  # valid where r >= boundary
    return np.where(r < boundary, big, small) + 1
