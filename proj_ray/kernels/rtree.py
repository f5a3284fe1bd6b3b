"""STR-packed R-tree over item bounding boxes.

Bulk-loaded with the Sort-Tile-Recursive packing of Leutenegger, Lopez
& Edgington (ICDE 1997): items are sorted by bbox center x, tiled into
vertical slabs of ~sqrt(n/fanout) nodes each, sorted by center y within
a slab, and grouped into nodes of ``fanout`` consecutive entries; the
same packing repeats level by level up to a single root.

The tree serves the north-star PIP plan — "ray-casting against
cell-bucketed polygon R-tree shards held in actor pools": each S2
bucket of polygons (stages.pip_stage.bucket_polygons_s2) becomes a
shard with its own packed tree, built once per actor in ``__init__``
and probed per batch.  The reference engine has no spatial index (its
pnpoly at src/PJ_healpix.c:103-138 is a scalar point test); the index
layer is the from-scratch scale addition, and its candidate set is an
exact superset of the true containment set (bbox cover), so the exact
even-odd test downstream keeps join rows identical to the unindexed
plan — which is what the shared SQL oracle gates.

Everything is vectorized: the batch descent keeps a frontier of
(point, node) pairs as flat int arrays and expands children with
repeat/cumsum arithmetic — no per-node Python recursion in the hot
path.
"""

from __future__ import annotations

import math

import numpy as np


def _pack_order(cx, cy, fanout: int) -> np.ndarray:
    """STR ordering: x-sort -> vertical slabs of slab_cap entries ->
    y-sort within each slab. Returns the permutation to apply."""
    n = cx.shape[0]
    n_nodes = -(-n // fanout)
    n_slabs = max(1, math.isqrt(n_nodes) + (math.isqrt(n_nodes) ** 2 < n_nodes))
    slab_cap = max(1, -(-n // n_slabs))
    ox = np.argsort(cx, kind="stable")
    slab = np.arange(n) // slab_cap
    # lexsort: primary key last -> sort by slab, then center y (stable on
    # the x order for ties, so packing is fully deterministic)
    sub = np.lexsort((cy[ox], slab))
    return ox[sub]


def _expand(pt, starts, lens):
    """Expand (pair i -> children starts[i] .. starts[i]+lens[i]) into
    flat (point, child) arrays."""
    rep_pt = np.repeat(pt, lens)
    base = np.repeat(starts, lens)
    csum = np.cumsum(lens)
    inc = np.arange(int(csum[-1]) if lens.size else 0, dtype=np.int64) \
        - np.repeat(csum - lens, lens)
    return rep_pt, base + inc


class STRtree:
    """Packed R-tree over ``boxes`` = (n, 4) float64 [x0, y0, x1, y1].

    ``query_points(px, py)`` returns every (point_index, item_index)
    pair whose item bbox contains the point (closed bounds, matching
    the ``>= / <=`` bbox prefilter in kernels.pip.Polygon.contains).
    """

    def __init__(self, boxes, fanout: int = 8):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        if fanout < 2:
            raise ValueError("fanout must be >= 2")
        self.fanout = int(fanout)
        self.n_items = boxes.shape[0]
        self.levels: list[dict] = []
        if self.n_items == 0:
            self.item_order = np.empty(0, dtype=np.int64)
            self._it = np.empty((0, 4), dtype=np.float64)
            return
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        self.item_order = _pack_order(cx, cy, self.fanout)
        self._it = boxes[self.item_order]

        cur = self._it  # current child-level bboxes, already packed
        while True:
            m = cur.shape[0]
            nn = -(-m // self.fanout)
            start = (np.arange(nn, dtype=np.int64) * self.fanout)
            end = np.minimum(start + self.fanout, m)
            lvl = {
                "x0": np.minimum.reduceat(cur[:, 0], start),
                "y0": np.minimum.reduceat(cur[:, 1], start),
                "x1": np.maximum.reduceat(cur[:, 2], start),
                "y1": np.maximum.reduceat(cur[:, 3], start),
                "start": start,
                "len": end - start,
            }
            if nn == 1:
                self.levels.append(lvl)
                break
            # pack this level's nodes before the parent groups them; the
            # permutation must also reorder the level's child ranges AND
            # the child-level arrays those ranges index into stay fixed,
            # so each node record travels with its own (start, len)
            ncx = (lvl["x0"] + lvl["x1"]) * 0.5
            ncy = (lvl["y0"] + lvl["y1"]) * 0.5
            perm = _pack_order(ncx, ncy, self.fanout)
            for k in ("x0", "y0", "x1", "y1", "start", "len"):
                lvl[k] = lvl[k][perm]
            self.levels.append(lvl)
            cur = np.stack([lvl["x0"], lvl["y0"], lvl["x1"], lvl["y1"]], axis=1)

    def query_points(self, px, py):
        """All (point_index, item_index) pairs with point inside the
        item's closed bbox; vectorized frontier descent."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        if self.n_items == 0 or px.size == 0:
            return empty
        pt = np.arange(px.size, dtype=np.int64)
        node = np.zeros(px.size, dtype=np.int64)  # single root
        for lvl in reversed(self.levels):
            keep = ((px[pt] >= lvl["x0"][node]) & (px[pt] <= lvl["x1"][node])
                    & (py[pt] >= lvl["y0"][node]) & (py[pt] <= lvl["y1"][node]))
            pt, node = pt[keep], node[keep]
            if pt.size == 0:
                return empty
            pt, node = _expand(pt, lvl["start"][node], lvl["len"][node])
        # node now indexes packed items; final exact bbox test
        keep = ((px[pt] >= self._it[node, 0]) & (px[pt] <= self._it[node, 2])
                & (py[pt] >= self._it[node, 1]) & (py[pt] <= self._it[node, 3]))
        return pt[keep], self.item_order[node[keep]]
