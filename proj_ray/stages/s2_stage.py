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
