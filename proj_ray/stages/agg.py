"""Pre-aggregation helpers: combine inside map_batches BEFORE the
groupby so the all-to-all shuffle moves one row per (key, batch)
instead of every input row (SURVEY.md §2.6, ray_guide 'Aggregation at
scale'). Optional key salting spreads pathological hot keys."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def partial_group_sums(ds, key_cols, sum_cols, count_col="n", batch_size=None,
                       salt_mod=None):
    """Stage 1: per-batch groupby-sum (vectorized pandas) emitting
    partials; stage 2: Ray groupby over the partials. Returns a Dataset
    with key_cols + summed sum_cols + count_col.

    ``salt_mod``: when set, batches add ``_salt = row_index %% salt_mod``
    to the partial key, splitting a hot key's rows across salt_mod
    partial rows per batch; the final groupby drops the salt. (With
    per-batch partials the partial row count is already bounded by
    #keys x #batches; salting matters when single batches are dominated
    by one key and the per-batch combine itself is the bottleneck.)
    """
    key_cols = list(key_cols)
    sum_cols = list(sum_cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if salt_mod:
            df = df.assign(_salt=np.arange(len(df)) % salt_mod)
        keys = key_cols + (["_salt"] if salt_mod else [])
        g = df.groupby(keys, as_index=False, sort=False)[sum_cols].sum()
        cnt = df.groupby(keys, as_index=False, sort=False).size().rename(
            columns={"size": count_col})
        out = g.merge(cnt, on=keys)
        if salt_mod:
            out = out.drop(columns=["_salt"])
        return out

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
    from ray.data.aggregate import Sum

    aggs = [Sum(c, alias_name=c) for c in sum_cols] + [Sum(count_col, alias_name=count_col)]
    return partials.groupby(key_cols).aggregate(*aggs)


def combine_partials(partials, key_cols, agg_spec,
                     driver_threshold: int = 2_000_000,
                     path: str | None = None) -> pd.DataFrame:
    """Size-dispatched FINAL combine of a pre-reduced partial stream.

    ``partials`` is a Dataset whose blocks each hold at most
    key-cardinality rows (the output of a per-batch combine), so its
    total row count is #blocks x cardinality — bounded, but NOT
    constant: at ~10^6 blocks a low-cardinality pipeline still
    approaches 10^9 partial rows, too many to concat on the driver.

    - driver path (partial count <= ``driver_threshold``): concat
      ``iter_batches`` + one pandas groupby — skips the distributed
      groupby's fixed multi-second shuffle latency (the right branch
      for bench-scale runs);
    - distributed path: ``groupby(keys).aggregate`` — the 100 TB
      branch; only the final key-cardinality-bounded result reaches
      the driver.

    ``agg_spec``: {col: 'sum' | 'min' | 'max'}.  ``path`` forces
    'driver' or 'distributed' (parity tests).  Returns a pandas frame
    (unsorted; callers order it)."""
    key_cols = list(key_cols)
    mat = partials.materialize()
    if path is None:
        path = "driver" if mat.count() <= driver_threshold else "distributed"
    elif path not in ("driver", "distributed"):
        raise ValueError(f"combine_partials: unknown path {path!r}")

    if path == "driver":
        chunks = list(mat.iter_batches(batch_size=None, batch_format="pandas"))
        if not chunks:
            return pd.DataFrame(columns=key_cols + list(agg_spec))
        allp = pd.concat(chunks, ignore_index=True)
        return allp.groupby(key_cols, as_index=False).agg(
            **{c: (c, op) for c, op in agg_spec.items()})

    from ray.data.aggregate import Max, Min, Sum

    _AGG = {"sum": Sum, "min": Min, "max": Max}
    aggs = [_AGG[op](c, alias_name=c) for c, op in agg_spec.items()]
    out = mat.groupby(key_cols).aggregate(*aggs).to_pandas()
    return out[key_cols + list(agg_spec)]
