"""Chebyshev surrogate for projections (the reference's ``proj -T``
feature: fit a 2-D Chebyshev series to a projection over a region, then
evaluate it cheaply — src/gen_cheb.c, src/mk_cheby.c:35-177,
src/bchgen.c sampling, src/biveval.c evaluation).

Role at scale (SURVEY.md §2.5): a per-region fitted approximation is a
tiny broadcastable object (two coefficient matrices) that replaces the
full projection kernel in hot loops when reduced accuracy is
acceptable — the evaluation is two Clenshaw sums per point.

Implementation: tensor Chebyshev interpolation — sample the target
function on a Chebyshev-Gauss node grid over the region (bchgen's
sampling), compute coefficients by the discrete cosine transform
identity, truncate below ``tol`` (mk_cheby's eps cleanup), and evaluate
with numpy's 2-D Clenshaw (biveval equivalent).
"""

from __future__ import annotations

import numpy as np
from numpy.polynomial import chebyshev as _cheb


def _nodes(n):
    """Chebyshev-Gauss nodes on [-1, 1] (bchgen sampling points)."""
    k = np.arange(n)
    return np.cos(np.pi * (k + 0.5) / n)


class ChebyshevSurrogate:
    """2-D Chebyshev approximation of ``f(lon, lat) -> (x, y)`` over
    ``region = (lon_min, lon_max, lat_min, lat_max)`` (degrees)."""

    def __init__(self, cx, cy, region):
        self.cx = cx
        self.cy = cy
        self.region = tuple(float(v) for v in region)

    @classmethod
    def fit(cls, f, region, deg=(12, 12), tol=0.0):
        lon_min, lon_max, lat_min, lat_max = region
        nu, nv = deg[0] + 1, deg[1] + 1
        u = _nodes(nu)
        v = _nodes(nv)
        lon = (u + 1.0) * 0.5 * (lon_max - lon_min) + lon_min
        lat = (v + 1.0) * 0.5 * (lat_max - lat_min) + lat_min
        LO, LA = np.meshgrid(lon, lat, indexing="ij")
        fx, fy = f(LO.reshape(-1), LA.reshape(-1))
        FX = np.asarray(fx).reshape(nu, nv)
        FY = np.asarray(fy).reshape(nu, nv)

        # DCT-II style coefficient extraction at Gauss nodes:
        # c[j] = (2/n) * sum_k f(x_k) T_j(x_k), halved for j=0
        Tu = np.cos(np.pi * np.outer(np.arange(nu), (np.arange(nu) + 0.5)) / nu)
        Tv = np.cos(np.pi * np.outer(np.arange(nv), (np.arange(nv) + 0.5)) / nv)

        def coeffs(F):
            C = (2.0 / nu) * Tu @ F @ Tv.T * (2.0 / nv)
            C[0, :] *= 0.5
            C[:, 0] *= 0.5
            if tol > 0.0:  # mk_cheby eps truncation
                C = np.where(np.abs(C) < tol, 0.0, C)
            return C

        return cls(coeffs(FX), coeffs(FY), region)

    def _uv(self, lon, lat):
        lon_min, lon_max, lat_min, lat_max = self.region
        u = 2.0 * (np.asarray(lon, dtype=np.float64) - lon_min) / (lon_max - lon_min) - 1.0
        v = 2.0 * (np.asarray(lat, dtype=np.float64) - lat_min) / (lat_max - lat_min) - 1.0
        return u, v

    def __call__(self, lon, lat):
        """Evaluate the surrogate (2-D Clenshaw; biveval equivalent)."""
        u, v = self._uv(lon, lat)
        x = _cheb.chebval2d(u, v, self.cx)
        y = _cheb.chebval2d(u, v, self.cy)
        return x, y

    def max_error(self, f, n=50):
        """Max abs deviation vs the exact function on a probe grid."""
        lon_min, lon_max, lat_min, lat_max = self.region
        lon = np.linspace(lon_min, lon_max, n)
        lat = np.linspace(lat_min, lat_max, n)
        LO, LA = np.meshgrid(lon, lat, indexing="ij")
        ex, ey = f(LO.reshape(-1), LA.reshape(-1))
        ax, ay = self(LO.reshape(-1), LA.reshape(-1))
        return max(np.abs(ax - ex).max(), np.abs(ay - ey).max())


def fit_transform_surrogate(src_def, dst_def, region, deg=(12, 12), tol=0.0):
    """gen_cheb equivalent: fit the full Transform over a region."""
    from ..transform import make_transform

    t = make_transform(src_def, dst_def)

    def f(lon, lat):
        x, y, _ = t(lon, lat)
        return x, y

    return ChebyshevSurrogate.fit(f, region, deg=deg, tol=tol)
