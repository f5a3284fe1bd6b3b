"""Event-time watermark filter — the streaming-engine late-data
semantic expressed Ray-Data-first.

An event arriving in ``arrival`` order is LATE when its event time is
older than the watermark at its arrival, where the watermark is the
running maximum event time over all STRICTLY PRIOR arrivals minus an
allowed delay.  (The reference engine is strictly record-ordered with
no windows — SURVEY §2.8; this is one of the streaming additions a
training-data pipeline needs for event logs.)

Distributed shape (no sequential driver scan over rows):
1. sort by the arrival key (one range shuffle; blocks come out
   globally ordered, rows ordered within blocks),
2. pass 1: per-block partials (min arrival key, max event ts) — one
   tiny row per BLOCK to the driver,
3. driver: prefix-max over the ~#blocks partials -> per-block carry-in
   watermark, broadcast as a dict keyed by the block's first arrival
   key (unique under the global sort),
4. pass 2: per-block vectorized running max seeded with the carry-in;
   late rows dropped (or flagged).

Wall-clock is one sort + two linear passes; driver state is O(#blocks).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_NEG_INF = np.iinfo(np.int64).min


def watermark_filter(ds, ts_col: str, arrival_col: str, delay_us: int,
                     keep_col: str | None = None):
    """Return ``ds`` sorted by ``arrival_col`` with late rows dropped
    (or, when ``keep_col`` is given, all rows kept and a boolean
    on-time flag appended).  ``ts_col`` must be int64 epoch-us (cast
    timestamps upstream).

    ``arrival_col`` values must be UNIQUE: the per-block carry is keyed
    by each block's first arrival value, so a duplicate key straddling
    a block boundary would seed the wrong watermark — that case is
    detected from the block partials and raises instead of silently
    misclassifying rows."""
    ordered = ds.sort(arrival_col).materialize()

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # sort can emit empty partitions
            return pa.table({"blk_min_arr": pa.array([], pa.int64()),
                             "blk_max_arr": pa.array([], pa.int64()),
                             "blk_max_ts": pa.array([], pa.int64())})
        arr = t[arrival_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "blk_min_arr": pa.array([int(arr.min())], pa.int64()),
            "blk_max_arr": pa.array([int(arr.max())], pa.int64()),
            "blk_max_ts": pa.array([int(ts.max())], pa.int64()),
        })

    parts = (ordered.map_batches(partial, batch_format="pyarrow",
                                 batch_size=None)
             .to_pandas().sort_values("blk_min_arr"))
    mins = parts["blk_min_arr"].to_numpy(np.int64)
    maxs_arr = parts["blk_max_arr"].to_numpy(np.int64)
    if len(mins) > 1 and (mins[1:] <= maxs_arr[:-1]).any():
        raise ValueError(
            f"watermark_filter: duplicate {arrival_col!r} values straddle "
            f"a block boundary; the arrival key must be unique")
    maxes = parts["blk_max_ts"].to_numpy(np.int64)
    carry = np.concatenate([[_NEG_INF],
                            np.maximum.accumulate(maxes)[:-1]])
    carry_map = dict(zip(parts["blk_min_arr"].to_numpy(np.int64).tolist(),
                         carry.tolist()))

    def late_filter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty block: keep the output schema stable
            if keep_col is not None:
                return t.append_column(keep_col, pa.array([], pa.bool_()))
            return t
        arr = t[arrival_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        try:
            seed = carry_map[int(arr.min())]
        except KeyError:
            # pass-2 batches must be exactly the pass-1 blocks (batch_size
            # =None over the same materialized dataset); a re-blocking
            # between the passes breaks the carry seeding
            raise KeyError(
                f"watermark_filter: pass-2 batch starting at "
                f"{arrival_col}={int(arr.min())} is not a pass-1 block "
                f"boundary; the two passes must see identical blocks "
                f"(batch_size=None over the same materialized dataset)")
        # watermark BEFORE each row: running max over strictly prior
        prior = np.maximum.accumulate(
            np.concatenate([[seed], ts[:-1]]))
        on_time = (prior == _NEG_INF) | (ts >= prior - np.int64(delay_us))
        if keep_col is not None:
            return t.append_column(keep_col, pa.array(on_time))
        return t.filter(pa.array(on_time))

    return ordered.map_batches(late_filter, batch_format="pyarrow",
                               batch_size=None)
