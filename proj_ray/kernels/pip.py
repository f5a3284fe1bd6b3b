"""Vectorized point-in-polygon by even-odd ray casting.

Kernel semantics precedented by the reference's ``pnpoly`` crossing test
(src/PJ_healpix.c:103-138): a point is inside iff a ray to +x crosses an
odd number of edges; boundary convention follows from the strict
``>`` / ``<`` comparisons exactly as in the classic algorithm, so an
independent SQL oracle evaluating the same comparisons matches
row-for-row (north rule: exact join rows).

Polygons are preprocessed into flat edge arrays + bbox for a cheap
vectorized prefilter; at scale the polygon set is cell-bucketed and the
buckets live in an actor pool (see proj_ray.stages.pip_stage).
"""

from __future__ import annotations

import numpy as np


class Polygon:
    """A single ring polygon. ``ring`` = [(lon, lat), ...]; the closing
    edge last->first is implicit (pnpoly's j = nvert-1 start)."""

    def __init__(self, polygon_id: str, ring):
        self.polygon_id = str(polygon_id)
        v = np.asarray(ring, dtype=np.float64)
        assert v.ndim == 2 and v.shape[1] == 2 and v.shape[0] >= 3
        self.vx = v[:, 0]
        self.vy = v[:, 1]
        self.bbox = (self.vx.min(), self.vy.min(), self.vx.max(), self.vy.max())

    def contains(self, px, py):
        """Vectorized even-odd test, replicating pnpoly comparisons:
        for each edge (i, j): if ((vy[i] > py) != (vy[j] > py)) and
        (px < (vx[j]-vx[i]) * (py-vy[i]) / (vy[j]-vy[i]) + vx[i]) -> toggle."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        x0, y0, x1, y1 = self.bbox
        cand = (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
        inside = np.zeros(px.shape, dtype=bool)
        if not np.any(cand):
            return inside
        pxc = px[cand]
        pyc = py[cand]
        acc = np.zeros(pxc.shape, dtype=bool)
        vx, vy = self.vx, self.vy
        jj = len(vx) - 1
        for i in range(len(vx)):
            yi, yj = vy[i], vy[jj]
            xi, xj = vx[i], vx[jj]
            straddle = (yi > pyc) != (yj > pyc)
            if np.any(straddle):
                with np.errstate(divide="ignore", invalid="ignore"):
                    xint = (xj - xi) * (pyc - yi) / (yj - yi) + xi
                acc ^= straddle & (pxc < xint)
            jj = i
        inside[cand] = acc
        return inside


def pip_join(polygons, px, py):
    """First-match PIP join: for each point the FIRST polygon (in list
    order) containing it — mirroring the reference's ordered first-match
    grid scan (src/pj_apply_gridshift.c:143-188). Returns an int array of
    polygon indices, -1 where no polygon contains the point."""
    px = np.asarray(px, dtype=np.float64)
    out = np.full(px.shape, -1, dtype=np.int64)
    todo = np.ones(px.shape, dtype=bool)
    py = np.asarray(py, dtype=np.float64)
    for k, poly in enumerate(polygons):
        if not np.any(todo):
            break
        idx = np.flatnonzero(todo)
        hit = poly.contains(px[idx], py[idx])
        hit_idx = idx[hit]
        out[hit_idx] = k
        todo[hit_idx] = False
    return out


def pip_join_all(polygons, px, py):
    """All-matches PIP join: list of (point_index, polygon_index) pairs
    for every containing polygon (overlapping polygons produce multiple
    rows). Returns (point_idx_array, poly_idx_array)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    pts = []
    pls = []
    for k, poly in enumerate(polygons):
        hit = poly.contains(px, py)
        idx = np.flatnonzero(hit)
        if idx.size:
            pts.append(idx)
            pls.append(np.full(idx.shape, k, dtype=np.int64))
    if not pts:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    return np.concatenate(pts), np.concatenate(pls)
