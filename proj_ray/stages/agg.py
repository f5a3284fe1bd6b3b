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
