"""Schema-stable distributed hash join.

Ray's builtin ``Dataset.join`` (2.49.2) builds each hash partition's
side with an ``ArrowBlockBuilder``; a partition that receives ZERO
blocks from one side builds an empty, SCHEMA-LESS table, and the
pyarrow join then fails with ``ArrowInvalid: No match ... for key field
reference`` — so any join whose side is sparse enough to leave a hash
partition empty (small dimension slices, highly selective filters)
crashes.  The engine's own queries hit this the moment a parity test
forces the distributed path on sf0.001 inputs (7-row sides).

``bucket_hash_join`` is the engine's structural fix, built from the
same coarse-bucket shuffle that ``bucket_aggregate`` uses engine-wide
(stages/agg.py): both sides are tagged with the SAME deterministic
bucket id computed from the join-key VALUES, unioned under an explicit
shared Arrow schema (so no partition can lose it), and each bucket
merges with one vectorized pandas merge.  Cost is identical to a hash
join — one all-to-all shuffle keyed by a bounded bucket domain; bucket
count scales with the cluster, independent of key cardinality.

Reference anchor: the join surface itself mirrors the PIP/catalog join
semantics of /root/reference/src/pj_apply_gridshift.c:73-128 (first
matching grid per point) generalized to relational equi-joins; the
implementation is Ray-Data-native and has no C counterpart.

Semantics: INNER equi-join on non-null keys (callers guarantee non-null
join keys, as every engine query does; pandas' NaN==NaN merge quirk is
therefore unreachable).

Consumer caveat (pinned by tests/test_session18_ops.py::
test_bucket_hash_join_multi_key_and_chained): project the OUTPUT
with a ``map_batches`` frame slice, NOT ``select_columns`` — Ray
2.49.2's Project pushdown re-plans through this operator's
union+sort lineage when the result feeds another shuffle and misplaces
the projection below the tag UDFs (KeyError on a pruned column), even
after ``materialize()``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _key_bucket(df: pd.DataFrame, on: list[str], num_buckets: int,
                key_dtypes: list):
    """Deterministic bucket id from the key VALUES: both sides must
    hash identically, so the key frame is renamed to positional names
    AND cast to the LEFT side's key dtypes before hashing —
    pd.util.hash_pandas_object keys on both column name and dtype
    (int64 1 and float64 1.0 hash differently), so without the cast a
    dtype-drifted side would silently bucket equal keys apart."""
    kf = df[list(on)].copy()
    kf.columns = [f"_k{i}" for i in range(len(on))]
    for c, dt in zip(kf.columns, key_dtypes):
        if dt is not None and kf[c].dtype != dt:
            kf[c] = kf[c].astype(dt)
    h = pd.util.hash_pandas_object(kf, index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int64)


def bucket_hash_join(left, right, left_on, right_on=None,
                     num_buckets: int = 64, how: str = "inner"):
    """Distributed equi-join: Dataset x Dataset -> Dataset.

    ``left_on`` / ``right_on`` are column-name lists (``right_on``
    defaults to ``left_on``).  ``how``:

    - ``inner`` (default) / ``left_outer``: output is all left columns
      then all right columns except its join keys (matching
      ``Dataset.join``'s output minus the duplicated key); left_outer
      emits unmatched left rows with null right payload (numeric
      payload columns therefore come back Arrow-nullable — consumers
      converting to pandas see NaN-floated ints, the standard pandas
      representation).
    - ``left_semi`` / ``left_anti``: output is the left columns only —
      left rows with at least one / no right match.  These replace the
      broadcast ``np.isin`` idiom when the key side outgrows a
      broadcast, with none of Ray ``Dataset.join``'s sparse-side
      crashes.

    Rows with null keys never match (callers pass non-null keys).
    """
    left_on = [left_on] if isinstance(left_on, str) else list(left_on)
    right_on = (left_on if right_on is None
                else ([right_on] if isinstance(right_on, str)
                      else list(right_on)))
    assert len(left_on) == len(right_on)
    if how not in ("inner", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"bucket_hash_join: unknown how {how!r}")

    def arrow_schema(ds) -> pa.Schema:
        """Normalize Dataset.schema() to a pyarrow schema: Arrow-block
        datasets carry one already; pandas-block datasets report numpy
        dtypes (object == string for engine callers)."""
        s = ds.schema()
        base = getattr(s, "base_schema", None)
        if isinstance(base, pa.Schema):
            return base
        fields = []
        for n, t in zip(s.names, s.types):
            if isinstance(t, pa.DataType):
                fields.append(pa.field(n, t))
            else:
                t = np.dtype(t)
                fields.append(pa.field(
                    n, pa.string() if t == np.dtype(object)
                    else pa.from_numpy_dtype(t)))
        return pa.schema(fields)

    lschema = arrow_schema(left)
    rschema = arrow_schema(right)
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    overlap = (set(lcols) & set(rcols)) - \
        {r for l, r in zip(left_on, right_on) if l == r}
    assert not overlap, f"bucket_hash_join: column collision {overlap}"

    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    rpayload = [c for c in rcols if c not in right_on]
    # the union schema: _seq tag + bucket + every column of both sides
    fields = ([pa.field("_seq", pa.int8()), pa.field("_bkt", pa.int64())]
              + [pa.field(c, ltypes[c]) for c in lcols]
              + [pa.field(c, rtypes[c]) for c in rpayload])
    union_schema = pa.schema(fields)

    # both sides hash their keys AS the left side's pandas dtypes, so a
    # dtype-drifted side (int64 vs float64) still buckets equal values
    # together; the union cast below makes the merge see them equal too
    key_dtypes = [ltypes[c].to_pandas_dtype()
                  if (pa.types.is_integer(ltypes[c])
                      or pa.types.is_floating(ltypes[c])) else None
                  for c in left_on]

    def tag(seq: int, on: list[str]):
        def fn(df: pd.DataFrame) -> pa.Table:
            bkt = _key_bucket(df, on, num_buckets, key_dtypes)
            n = len(df)
            arrays = [pa.array(np.full(n, seq, np.int8), pa.int8()),
                      pa.array(bkt, pa.int64())]
            for f in union_schema:
                if f.name in ("_seq", "_bkt"):
                    continue
                src = None
                if seq == 0 and f.name in lcols:
                    src = df[f.name]
                elif seq == 1:
                    if f.name in rpayload:
                        src = df[f.name]
                    elif f.name in lcols:
                        # right key rides in the LEFT key's slot so the
                        # in-bucket merge is a single-frame equality
                        i = left_on.index(f.name) if f.name in left_on \
                            else -1
                        if i >= 0:
                            src = df[right_on[i]]
                if src is None:
                    # the other side's slot: NEVER read post-merge, but
                    # it must survive the shuffle's pandas round-trip
                    # losslessly — typed nulls would turn int64 into
                    # float64 (NaN) and corrupt ids > 2^53, so fill
                    # numeric/bool slots with zeros of the exact dtype
                    if (pa.types.is_integer(f.type)
                            or pa.types.is_floating(f.type)
                            or pa.types.is_boolean(f.type)):
                        arrays.append(pa.array(
                            np.zeros(n, f.type.to_pandas_dtype()),
                            f.type))
                    else:
                        arrays.append(pa.nulls(n, f.type))
                else:
                    arrays.append(pa.Array.from_pandas(src, type=f.type))
            return pa.Table.from_arrays(arrays, schema=union_schema)
        return fn

    tagged = (left.map_batches(tag(0, left_on), batch_format="pandas",
                               batch_size=None)
              .union(right.map_batches(tag(1, right_on),
                                       batch_format="pandas",
                                       batch_size=None)))

    keep_payload = how in ("inner", "left_outer")
    out_cols = lcols + rpayload if keep_payload else lcols
    # pin the output schema explicitly: from_pandas re-INFERENCE would
    # type an all-null bucket's string column as `null` and hand
    # downstream consumers mixed block schemas — the same failure class
    # this operator exists to fix
    out_schema = pa.schema(
        [pa.field(c, ltypes[c]) for c in lcols]
        + ([pa.field(c, rtypes[c]) for c in rpayload]
           if keep_payload else []))
    rks = [f"_rk{i}" for i in range(len(left_on))]

    def merge(t: pa.Table) -> pa.Table:
        seq = t["_seq"].to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(seq == 0)).select(lcols)
        rt = t.filter(pa.array(seq == 1)).select(
            [c for c in left_on] + rpayload)
        if lt.num_rows == 0:
            return t.select(out_cols).slice(0, 0)
        if rt.num_rows == 0:
            if how == "left_anti":
                return lt  # no matches possible: every left row survives
            if how == "left_outer":
                ldf = lt.to_pandas()
                for c in rpayload:
                    ldf[c] = None
                return pa.Table.from_pandas(
                    ldf[out_cols], schema=out_schema,
                    preserve_index=False)
            return t.select(out_cols).slice(0, 0)  # inner / left_semi
        ldf = lt.to_pandas()
        rdf = rt.to_pandas()
        rdf.columns = rks + rpayload
        if how in ("left_semi", "left_anti"):
            probe = ldf[left_on].merge(
                rdf[rks].drop_duplicates(), left_on=left_on,
                right_on=rks, how="left", indicator=True)
            hit = (probe["_merge"].to_numpy() == "both")
            out = ldf[hit] if how == "left_semi" else ldf[~hit]
        else:
            out = ldf.merge(rdf, left_on=left_on, right_on=rks,
                            how=("left" if how == "left_outer"
                                 else "inner"))
        return pa.Table.from_pandas(out[out_cols], schema=out_schema,
                                    preserve_index=False)

    return (tagged.groupby("_bkt")
            .map_groups(merge, batch_format="pyarrow"))
