"""S2 cell-assignment stage: 64-bit Hilbert cell ids appended per batch
(kernel: proj_ray.kernels.s2cell).  Stateless pure arithmetic — task
pool, zero-copy Arrow in/out.  Ids are emitted as the int64 bit-pattern
view of the standard uint64 id (faces 4-5 read negative; all downstream
coarsening/range arithmetic is two's-complement-safe on either view),
so Arrow/Parquet/DuckDB carry them without an unsigned extension type.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.s2cell import cell_id_from_lonlat


def s2_stage(ds, level: int, lon_col="lon", lat_col="lat", out="cell_id",
             batch_size=None):
    def fn(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(
            np.float64, copy=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(
            np.float64, copy=False)
        ids = cell_id_from_lonlat(lon, lat, level).view(np.int64)
        return batch.append_column(out, pa.array(ids, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


def s2_shard_write(ds, out_dir: str, shard_level: int,
                   lon_col="lon", lat_col="lat") -> None:
    """Write a Hilbert-range-sharded layout: one parquet partition per
    level-``shard_level`` S2 cell (hive dir ``s2_shard=<int64>``).
    Because S2 ids are Hilbert-ordered, each shard is a CONTIGUOUS id
    range holding spatially-adjacent rows — the locality-preserving
    100-TB layout: a spatial query prunes whole shards by range
    intersection, and a failed build re-runs only missing shard
    directories (same resumable contract as vector.ivf_build_index)."""
    import os

    from ..kernels.s2cell import cell_id_from_lonlat, id_at_level

    def assign(t: pa.Table) -> pa.Table:
        lon = t[lon_col].to_numpy(zero_copy_only=False).astype(
            np.float64, copy=False)
        lat = t[lat_col].to_numpy(zero_copy_only=False).astype(
            np.float64, copy=False)
        leaf = cell_id_from_lonlat(lon, lat)
        shard = id_at_level(leaf, shard_level).view(np.int64)
        return t.append_column("s2_shard", pa.array(shard, pa.int64()))

    os.makedirs(out_dir, exist_ok=True)
    (ds.map_batches(assign, batch_format="pyarrow", batch_size=None,
                    zero_copy_batch=True)
     .write_parquet(out_dir, partition_cols=["s2_shard"]))


def s2_shard_bbox_read(index_dir: str, lon0, lon1, lat0, lat1,
                       shard_level: int):
    """Read ONLY the shards a bbox can touch: ``bbox_covering`` (an
    exact superset — no shard ever missed; tests/test_s2cell.py pins
    the no-miss property) at the shard level, then ``read_parquet``
    over just those partition dirs.  The unrelated corpus share never
    leaves storage.  Returns the dataset plus
    (shards_read, shards_total) for pruning evidence."""
    import os

    import ray.data as rd

    from ..kernels.s2cell import bbox_covering

    cover = bbox_covering(lon0, lon1, lat0, lat1, shard_level)
    shards = {int(v) for v in cover.view(np.int64)}
    return _read_shards(index_dir, shards)


def s2_shard_boxes_read(index_dir: str, boxes, shard_level: int):
    """Multi-box variant of ``s2_shard_bbox_read`` for queries whose
    exact-superset region wraps the anti-meridian (two disjoint lon
    intervals): the shard sets of all boxes are UNIONED before the
    read, so a shard touched by several boxes is read exactly once —
    no duplicate candidate rows."""
    from ..kernels.s2cell import bbox_covering

    shards = set()
    for lon0, lon1, lat0, lat1 in boxes:
        cover = bbox_covering(lon0, lon1, lat0, lat1, shard_level)
        shards.update(int(v) for v in cover.view(np.int64))
    return _read_shards(index_dir, shards)


def _read_shards(index_dir: str, shards):
    import os

    import ray.data as rd

    all_dirs = sorted(d for d in os.listdir(index_dir)
                      if d.startswith("s2_shard="))
    hit = [d for d in all_dirs if int(d.split("=", 1)[1]) in shards]
    files = []
    for d in hit:
        p = os.path.join(index_dir, d)
        files.extend(os.path.join(p, f) for f in sorted(os.listdir(p))
                     if f.endswith(".parquet"))
    if not files:
        return None, (0, len(all_dirs))
    return rd.read_parquet(files), (len(hit), len(all_dirs))
