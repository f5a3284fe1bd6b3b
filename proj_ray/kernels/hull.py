"""Planar convex hull (Andrew monotone chain, CCW).

The per-cluster hull primitive for the spatial surface: O(m log m)
in the cluster size m, sequential within a cluster (hulls are
inherently order-dependent) but clusters distribute freely.  The
reference has no hull operator; this extends the PIP/cluster family
(SURVEY §2 spatial part) with the standard computational-geometry
companion.  Collinear boundary points are EXCLUDED (strict turns
only), matching the independent Jarvis-march golden generator
(tools/freeze_goldens.py), and the cross products are the same
double-precision expression on both paths so lattice-aligned inputs
(coords on a 0.01-degree grid) classify identically."""

from __future__ import annotations

import numpy as np


def _cross(ox, oy, ax, ay, bx, by):
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def convex_hull_ccw(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Hull vertices of the DISTINCT points (x, y), counterclockwise,
    starting at the lexicographically smallest (x, y) vertex.  Returns
    an (h, 2) float64 array; inputs with < 3 distinct points return
    them as-is (sorted).  Collinear mid-points are dropped."""
    pts = np.unique(np.stack([np.asarray(x, np.float64),
                              np.asarray(y, np.float64)], axis=1), axis=0)
    m = len(pts)
    if m < 3:
        return pts

    def chain(seq):
        out = []
        for px, py in seq:
            while len(out) >= 2 and _cross(out[-2][0], out[-2][1],
                                           out[-1][0], out[-1][1],
                                           px, py) <= 0.0:
                out.pop()
            out.append((px, py))
        return out

    lower = chain(pts)
    upper = chain(pts[::-1])
    hull = lower[:-1] + upper[:-1]
    return np.asarray(hull, np.float64)
