"""Point-in-polygon join stage.

The polygon side is small relative to the point stream (countries /
admin regions / AOIs), so the scalable plan is a BROADCAST spatial
join: polygons are bucketed by covering tile cell once on the driver,
the bucket index rides to each actor in ``__init__`` (via ``ray.put``
object-store reference — one copy per node, zero per-batch shipping),
and each batch probes only the buckets its points' cells hit. No
shuffle of the point stream at all.

For polygon sets too large to broadcast, co-partition instead:
``groupby(cell)`` both sides and PIP per group (see
pipelines.flagship notes); the kernel is identical.

Join semantics: ALL containing polygons (overlaps => multiple rows),
matching the SQL even-odd oracle exactly (north rule: exact rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.pip import Polygon, pip_join_all
from ..kernels.tiling import cell_id as cell_id_of, cell_xy


def make_polygons(poly_defs):
    """[(polygon_id, [(lon, lat), ...]), ...] -> list[Polygon]."""
    return [Polygon(pid, ring) for pid, ring in poly_defs]


def bucket_polygons(polygons, zoom: int):
    """cell -> [poly_index] covering-bucket index (bbox cover; the
    exact test runs per point, so over-cover is harmless)."""
    buckets: dict = {}
    n = 1 << zoom
    for k, p in enumerate(polygons):
        x0, y0, x1, y1 = p.bbox
        y0c = max(min(y0, 85.0), -85.0)
        y1c = max(min(y1, 85.0), -85.0)
        txa, tya = _tile_of(x0, y1c, zoom)  # upper-left
        txb, tyb = _tile_of(x1, y0c, zoom)  # lower-right
        for ty in range(max(0, tya), min(n - 1, tyb) + 1):
            for tx in range(max(0, txa), min(n - 1, txb) + 1):
                buckets.setdefault((ty << zoom) | tx, []).append(k)
    return buckets


def _tile_of(lon, lat, zoom):
    tx, ty = cell_xy(np.array([lon]), np.array([lat]), zoom)
    return int(tx[0]), int(ty[0])


class PIPJoinActor:
    """Actor-pool PIP join: polygon buckets built once per actor.

    Emits one output row per (point, containing polygon):
    carries ``id_cols`` through + a ``polygon_id`` column.
    """

    def __init__(self, poly_defs, zoom=7, lon_col="lon", lat_col="lat",
                 id_cols=("pid",), keep_unmatched=False):
        self.polygons = make_polygons(poly_defs)
        self.zoom = zoom
        self.buckets = bucket_polygons(self.polygons, zoom)
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.id_cols = id_cols
        self.keep_unmatched = keep_unmatched

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        cells = cell_id_of(lon, lat, self.zoom)
        # probe buckets: points grouped by cell, each cell tests only its
        # candidate polygons (vectorized per polygon over the cell's points)
        pt_idx_out = []
        poly_out = []
        order = np.argsort(cells, kind="stable")
        sorted_cells = cells[order]
        bounds = np.flatnonzero(np.diff(sorted_cells)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(sorted_cells)]])
        for s, e in zip(starts, ends):
            cell = sorted_cells[s]
            cand = self.buckets.get(int(cell))
            if not cand:
                continue
            ids = order[s:e]
            sub_polys = [self.polygons[k] for k in cand]
            pts, pls = pip_join_all(sub_polys, lon[ids], lat[ids])
            if pts.size:
                pt_idx_out.append(ids[pts])
                poly_out.append(np.array([sub_polys[k].polygon_id for k in pls], dtype=object))
        if pt_idx_out:
            pt_idx = np.concatenate(pt_idx_out)
            poly_ids = np.concatenate(poly_out)
        else:
            pt_idx = np.empty(0, dtype=np.int64)
            poly_ids = np.empty(0, dtype=object)
        cols = {c: batch[c].take(pa.array(pt_idx, pa.int64()))
                for c in self.id_cols if c in batch.column_names}
        cols["polygon_id"] = pa.array(poly_ids.astype(str) if poly_ids.size else [],
                                      pa.string())
        return pa.table(cols)
