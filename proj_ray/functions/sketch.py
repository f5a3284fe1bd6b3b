"""Mergeable sketches for holistic aggregates at scale.

Exact holistic aggregates (quantiles) need every value of a group in
one place — fine at small scale (`segment_acctbal_median` shuffles
each group to one map_groups task), unworkable at 100 TB.  The scale
path is a MERGEABLE sketch: map_batches emits one partial per batch,
partials add elementwise (associative + commutative, so Ray can tree-
reduce them), and a tiny final merge answers the quantile with bounded
error.  ``HistogramSketch`` is the fixed-bin variant: error is bounded
by the bin width ((hi-lo)/nbins), merge is exact (counts add)."""

from __future__ import annotations

import numpy as np


class HistogramSketch:
    """Fixed-range binned quantile sketch.

    Counts per bin over [lo, hi); values outside clamp to the edge
    bins, preserving totals so quantile ranks stay exact even when the
    declared range is too tight (the estimate then saturates at the
    range edge — widen the range, not the code)."""

    def __init__(self, lo: float, hi: float, nbins: int = 4096,
                 counts: np.ndarray | None = None):
        if not hi > lo:
            raise ValueError("HistogramSketch needs hi > lo")
        self.lo = float(lo)
        self.hi = float(hi)
        self.nbins = int(nbins)
        self.counts = (np.zeros(self.nbins, dtype=np.int64)
                       if counts is None else counts.astype(np.int64))

    def add(self, values: np.ndarray) -> "HistogramSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        idx = ((v - self.lo) / (self.hi - self.lo) * self.nbins).astype(np.int64)
        idx = np.clip(idx, 0, self.nbins - 1)
        self.counts += np.bincount(idx, minlength=self.nbins)
        return self

    def merge(self, other: "HistogramSketch") -> "HistogramSketch":
        assert (self.lo, self.hi, self.nbins) == (other.lo, other.hi, other.nbins)
        return HistogramSketch(self.lo, self.hi, self.nbins,
                               self.counts + other.counts)

    @property
    def n(self) -> int:
        return int(self.counts.sum())

    def quantile(self, q: float) -> float:
        """Linear interpolation inside the containing bin; max error is
        one bin width."""
        n = self.n
        if n == 0:
            return float("nan")
        rank = q * (n - 1)
        cum = np.cumsum(self.counts)
        b = int(np.searchsorted(cum, rank, side="right"))
        b = min(b, self.nbins - 1)
        prev = cum[b - 1] if b > 0 else 0
        in_bin = self.counts[b]
        frac = ((rank - prev) / in_bin) if in_bin > 0 else 0.5
        width = (self.hi - self.lo) / self.nbins
        return self.lo + (b + frac) * width


def ds_group_quantiles(ds, key_col: str, val_col: str, q: float,
                       lo: float, hi: float, nbins: int = 4096):
    """Distributed approximate per-group quantile: map_batches partial
    sketches -> driver merge per key -> quantile.  One pass, no
    holistic shuffle; partials are (nbins) int64 vectors per key per
    batch, tree-reducible.  Returns {key: quantile_estimate}."""
    import pyarrow as pa

    def partial(t: pa.Table):
        keys = t[key_col].to_pylist()
        vals = np.asarray(t[val_col].to_numpy(zero_copy_only=False), dtype=np.float64)
        out_k, out_c = [], []
        import pandas as pd

        for k, g in pd.DataFrame({"k": keys, "v": vals}).groupby("k"):
            sk = HistogramSketch(lo, hi, nbins).add(g["v"].to_numpy())
            out_k.append(k)
            out_c.append(sk.counts)
        return pa.table({"key": pa.array(out_k),
                         "counts": pa.array([c.tolist() for c in out_c],
                                            pa.list_(pa.int64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    merged: dict = {}
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        ks = b["key"].to_pylist()
        cs = b["counts"].to_pylist()
        for k, c in zip(ks, cs):
            sk = HistogramSketch(lo, hi, nbins, np.asarray(c, dtype=np.int64))
            merged[k] = merged[k].merge(sk) if k in merged else sk
    return {k: sk.quantile(q) for k, sk in merged.items()}
