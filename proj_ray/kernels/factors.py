"""Projection scale-factor analysis (the reference's ``-S``/``-V``
feature): numeric 4-point derivatives + scale factors h, k, areal s,
convergence, Tissot axes a/b, angular distortion omega.

Replicates ``pj_factors`` (src/pj_factors.c:17-86) and ``pj_deriv``
(src/pj_deriv.c) vectorized: the derivative uses the same 4-corner
stencil with step h (default 1e-5 rad) on the RAW projection function
(no false easting / a-scaling), and the ellipsoidal corrections match
the reference term for term.
"""

from __future__ import annotations

import numpy as np

from .common import HALFPI, adjlon, aasin

DEFAULT_H = 1e-5

# analytic-factor flags (src/projects.h:214-217)
IS_ANAL_XL_YL = 0o1
IS_ANAL_XP_YP = 0o2
IS_ANAL_HK = 0o4
IS_ANAL_CONV = 0o10


def factors(P, lon_deg, lat_deg, h: float = DEFAULT_H, radians=False):
    """Vectorized pj_factors. Returns dict of arrays:
    h, k (meridional/parallel scale), s (areal), conv (convergence,
    radians), omega (max angular distortion), a, b (Tissot axes),
    thetap. Invalid lanes are NaN.  Pass ``radians=True`` when the
    inputs are already radians (the CLI's dmstor output) — pj_factors
    takes radians, and a deg round-trip perturbs the last ulp."""
    if radians:
        lam = np.asarray(lon_deg, dtype=np.float64).copy()
        phi = np.asarray(lat_deg, dtype=np.float64).copy()
    else:
        lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
        phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    bad = (np.abs(phi) - HALFPI > 1e-12) | (np.abs(lam) > 10.0)

    if h < 1e-12:
        h = DEFAULT_H
    # pole adjust (pj_factors.c:25-27)
    phi = np.where(np.abs(phi) > (HALFPI - h),
                   np.where(phi < 0.0, -HALFPI + h, HALFPI - h), phi)
    if P.geoc:
        inner = np.abs(phi) <= (HALFPI - h)
        phi = np.where(inner, np.arctan(P.rone_es * np.tan(phi)), phi)
    lam = lam - P.lam0
    if not P.over:
        lam = adjlon(lam)

    # analytic specials (P->spc, pj_factors.c:32-33): lcc and eqdc
    # attach a vectorized SPECIAL(fac) in their setup
    spc = getattr(P, "spc", None)
    sp = spc(lam, phi) if spc is not None else None
    code = sp["code"] if sp is not None else 0

    # 4-corner stencil (pj_deriv.c) on the raw fwd; bad lanes produce
    # inf/nan silently (masked below) — no warnings
    with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
        x_pp, y_pp = P.fwd(lam + h, phi + h)
        x_pm, y_pm = P.fwd(lam + h, phi - h)
        x_mm, y_mm = P.fwd(lam - h, phi - h)
        x_mp, y_mp = P.fwd(lam - h, phi + h)
    h4 = 4.0 * h
    # pj_deriv.c sign convention: x_l = +dx/dlam, y_p = +dy/dphi, but
    # x_p = -dx/dphi and y_l = -dy/dlam (the corner-accumulation signs
    # at pj_deriv.c:14-27).  conv and the areal determinant below
    # consume exactly this convention.
    with np.errstate(invalid="ignore", over="ignore"):
        x_l = (x_pp + x_pm - x_mm - x_mp) / h4
        y_l = (-y_pp - y_pm + y_mm + y_mp) / h4
        x_p = (-x_pp + x_pm + x_mm - x_mp) / h4
        y_p = (y_pp - y_pm - y_mm + y_mp) / h4
    bad = bad | ~np.isfinite(x_l) | ~np.isfinite(y_p)
    x_l = np.where(bad, 0.0, x_l)
    y_l = np.where(bad, 0.0, y_l)
    x_p = np.where(bad, 0.0, x_p)
    y_p = np.where(bad, 1.0, y_p)

    cosphi = np.cos(phi)
    if code & IS_ANAL_HK:
        # h/k analytic (pj_factors.c:47,58-63): take the spc values and
        # compute only r — NO ellipsoidal correction into h/k
        fh, fk = sp["h"], sp["k"]
        if P.es:
            r = np.sin(phi)
            r = 1.0 - P.es * r * r
            r = r * r / P.one_es
        else:
            r = 1.0
    else:
        fh = np.hypot(x_p, y_p)
        fk = np.hypot(x_l, y_l) / cosphi
        if P.es:
            t = np.sin(phi)
            t = 1.0 - P.es * t * t
            n = np.sqrt(t)
            fh = fh * (t * n / P.one_es)
            fk = fk * n
            r = t * t / P.one_es
        else:
            r = 1.0
    conv = sp["conv"] if code & IS_ANAL_CONV else -np.arctan2(y_l, x_l)
    s = (y_p * x_l - x_p * y_l) * r / cosphi

    def _aasin(v):
        # the C aasin (src/aasincos.c:7-17) returns +-HALFPI for any
        # |v| >= 1 (errno beyond ONE_TOL is IGNORED by pj_factors'
        # callers) — conformal points put s/(h*k) a few 1e-12 above 1
        return np.where(np.abs(v) >= 1.0,
                        np.where(v < 0.0, -HALFPI, HALFPI),
                        np.arcsin(np.clip(v, -1.0, 1.0)))

    with np.errstate(invalid="ignore", divide="ignore"):
        thetap = _aasin(s / (fh * fk))
    t2 = fk * fk + fh * fh
    a = np.sqrt(np.maximum(t2 + 2.0 * s, 0.0))
    tmb = t2 - 2.0 * s
    tmb = np.where(tmb <= 0.0, 0.0, np.sqrt(np.maximum(tmb, 0.0)))
    b = 0.5 * (a - tmb)
    a = 0.5 * (a + tmb)
    with np.errstate(invalid="ignore", divide="ignore"):
        omega = 2.0 * _aasin((a - b) / (a + b))

    def mask(v):
        return np.where(bad, np.nan, v)

    return {"h": mask(fh), "k": mask(fk), "s": mask(s), "conv": mask(conv),
            "omega": mask(omega), "a": mask(a), "b": mask(b),
            "thetap": mask(thetap), "code": code, "ok": ~bad}
