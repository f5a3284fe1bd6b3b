"""Scalar (one-point-at-a-time) reference implementations used to
freeze golden tables INDEPENDENTLY of the vectorized engine kernels.

Two families:

- ``karney_inverse_scalar``: per-point Karney (2013) geodesic inverse
  with plain Python control flow — every branch (meridian, equatorial,
  short-line, astroid start, Newton-with-bracketing) is an actual
  ``if``/``while`` per point, not a lane mask.  Validated against the
  paper's published values in tests/test_scalar_ref.py; the vectorized
  kernel (proj_ray/kernels/karney.py) must agree with it bit-for-bit,
  which checks precisely the masked-iteration bookkeeping where
  vectorization bugs would hide.

- ``read_ntv2_scalar`` / ``ntv2_transform_scalar``: a from-the-spec
  NTv2 (.gsb) reader (struct.unpack, per-field) plus per-point
  first-match subgrid selection, bilinear interpolation (nad_intr
  semantics, src/nad_intr.c:5-62) and the fixed-point inverse
  (src/nad_cvt.c:17-56: MAX_TRY 9, TOL 1e-12, first-order fallback at
  grid edges) — independent of proj_ray/sources/grids.py and
  proj_ray/kernels/grid.py.

The formulas intentionally mirror the published algorithms (they are
the algorithms); the INDEPENDENCE is the execution path: scalar
control flow vs masked vectorized lanes.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Scalar Karney inverse (Karney 2013; same published algorithm as the
# reference's src/geodesic.c geod_geninverse:598-942)
# ---------------------------------------------------------------------------

_DEG = np.pi / 180.0
_TINY = float(np.sqrt(np.finfo(np.float64).tiny))
_TOL0 = float(np.finfo(np.float64).eps)
_TOL1 = 200.0 * _TOL0
_TOL2 = float(np.sqrt(_TOL0))
_TOLB = _TOL0 * _TOL2
_XTHRESH = 1000.0 * _TOL2
_MAXIT1 = 20
_MAXIT2 = _MAXIT1 + 53 + 10


def _ang_normalize(x):
    return x - 360.0 if x >= 180.0 else (x + 360.0 if x < -180.0 else x)


def _ang_diff(x, y):
    s = -x + y
    up = s - y
    vpp = s - up
    up = up - (-x)
    vpp = vpp - y
    t = -(up + vpp)
    d = s
    if (d - 180.0) + t > 0.0:
        d = d - 360.0
    elif (d + 180.0) + t <= 0.0:
        d = d + 360.0
    return d + t


def _ang_round(x):
    z = 1.0 / 16.0
    y = abs(x)
    if y < z:
        y = z - (z - y)
    return 0.0 - y if x < 0.0 else y


def _norm2(s, c):
    r = np.hypot(s, c)
    return s / r, c / r


def _a1m1(eps):
    e2 = eps * eps
    t = e2 * (e2 * (e2 + 4.0) + 64.0) / 256.0
    return (t + eps) / (1.0 - eps)


def _c1(eps):
    e2 = eps * eps
    d = eps
    c1 = d * (e2 * (6.0 - e2) - 16.0) / 32.0
    d = d * eps
    c2 = d * (e2 * (64.0 - 9.0 * e2) - 128.0) / 2048.0
    d = d * eps
    c3 = d * (9.0 * e2 - 16.0) / 768.0
    d = d * eps
    c4 = d * (3.0 * e2 - 5.0) / 512.0
    d = d * eps
    c5 = d * -7.0 / 1280.0
    d = d * eps
    c6 = d * -7.0 / 2048.0
    return [0.0, c1, c2, c3, c4, c5, c6]


def _a2m1(eps):
    e2 = eps * eps
    t = e2 * (e2 * (25.0 * e2 + 36.0) + 64.0) / 256.0
    return t * (1.0 - eps) - eps


def _c2(eps):
    e2 = eps * eps
    d = eps
    c1 = d * (e2 * (e2 + 2.0) + 16.0) / 32.0
    d = d * eps
    c2 = d * (e2 * (35.0 * e2 + 64.0) + 384.0) / 2048.0
    d = d * eps
    c3 = d * (15.0 * e2 + 80.0) / 768.0
    d = d * eps
    c4 = d * (7.0 * e2 + 35.0) / 512.0
    d = d * eps
    c5 = d * 63.0 / 1280.0
    d = d * eps
    c6 = d * 77.0 / 2048.0
    return [0.0, c1, c2, c3, c4, c5, c6]


def _a3x(n):
    return [
        -3.0 / 128.0,
        (-2.0 * n - 3.0) / 64.0,
        (n * (-n - 3.0) - 1.0) / 16.0,
        (n * (3.0 * n - 1.0) - 2.0) / 8.0,
        (n - 1.0) / 2.0,
        1.0,
    ]


def _a3f(a3x, eps):
    y = a3x[0]
    for c in a3x[1:]:
        y = y * eps + c
    return y


def _c3x(n):
    return [
        [3.0 / 128.0, (2.0 * n + 5.0) / 128.0,
         (n * (3.0 - n) + 3.0) / 64.0, (1.0 - n * n) / 8.0,
         (1.0 - n) / 4.0],
        [5.0 / 256.0, (n + 3.0) / 128.0,
         (n * (-3.0 * n - 2.0) + 3.0) / 64.0,
         (n * (n - 3.0) + 2.0) / 32.0],
        [7.0 / 512.0, (9.0 - 10.0 * n) / 384.0,
         (n * (5.0 * n - 9.0) + 5.0) / 192.0],
        [7.0 / 512.0, (7.0 - 14.0 * n) / 512.0],
        [21.0 / 2560.0],
    ]


def _c3f(c3x, eps):
    out = [0.0]
    mult = 1.0
    for coeffs in c3x:
        mult = mult * eps
        y = coeffs[0]
        for c in coeffs[1:]:
            y = y * eps + c
        out.append(mult * y)
    return out


def _sincos_series(sinp, sinx, cosx, c):
    n = len(c) - (1 if sinp else 0)
    ar = 2.0 * (cosx - sinx) * (cosx + sinx)
    k = n + (1 if sinp else 0)
    if n & 1:
        k -= 1
        y0 = c[k]
    else:
        y0 = 0.0
    y1 = 0.0
    for _ in range(n // 2):
        k -= 1
        y1 = ar * y0 - y1 + c[k]
        k -= 1
        y0 = ar * y1 - y0 + c[k]
    return 2.0 * sinx * cosx * y0 if sinp else cosx * (y0 - y1)


def _c4x_s(n):
    """C4 coefficient polynomials in n (C4coeff, geodesic.c:1379-1427)."""
    def pv(*p):
        den = p[-1]
        y = float(p[0])
        for q in p[1:-1]:
            y = y * n + q
        return y / den

    return [
        pv(97, 15015), pv(1088, 156, 45045), pv(-224, -4784, 1573, 45045),
        pv(-10656, 14144, -4576, -858, 45045),
        pv(64, 624, -4576, 6864, -3003, 15015),
        pv(100, 208, 572, 3432, -12012, 30030, 45045),
        pv(1, 9009), pv(-2944, 468, 135135), pv(5792, 1040, -1287, 135135),
        pv(5952, -11648, 9152, -2574, 135135),
        pv(-64, -624, 4576, -6864, 3003, 135135),
        pv(8, 10725), pv(1856, -936, 225225),
        pv(-8448, 4992, -1144, 225225),
        pv(-1440, 4160, -4576, 1716, 225225),
        pv(-136, 63063), pv(1024, -208, 105105),
        pv(3584, -3328, 1144, 315315),
        pv(-128, 135135), pv(-2560, 832, 405405), pv(128, 99099),
    ]


def _c4f_s(c4x, eps):
    out = []
    o = 0
    mult = 1.0
    for l in range(6):
        m = 6 - l - 1
        y = c4x[o]
        for kk in range(1, m + 1):
            y = y * eps + c4x[o + kk]
        out.append(mult * y)
        o += m + 1
        mult = mult * eps
    return out


class _GeodS:
    def __init__(self, a, f):
        self.a = float(a)
        self.f = float(f)
        self.f1 = 1.0 - self.f
        self.e2 = self.f * (2.0 - self.f)
        self.ep2 = self.e2 / (self.f1 * self.f1)
        self.n = self.f / (2.0 - self.f)
        self.b = self.a * self.f1
        if self.e2 == 0.0:
            m = 1.0
        elif self.e2 > 0.0:
            m = float(np.arctanh(np.sqrt(self.e2))) / np.sqrt(self.e2)
        else:
            m = float(np.arctan(np.sqrt(-self.e2))) / np.sqrt(-self.e2)
        self.c2 = (self.a * self.a + self.b * self.b * m) / 2.0
        self.etol2 = 0.1 * _TOL2 / np.sqrt(
            max(0.001, abs(self.f)) * min(1.0, 1.0 - self.f / 2.0) / 2.0)
        self.a3x = _a3x(self.n)
        self.c3x = _c3x(self.n)
        self.c4x = _c4x_s(self.n)


def _lengths(g, eps, sig12, ssig1, csig1, dn1, ssig2, csig2, dn2,
             cbet1, cbet2):
    c1a = _c1(eps)
    c2a = _c2(eps)
    a1m1 = _a1m1(eps)
    ab1 = (1.0 + a1m1) * (_sincos_series(True, ssig2, csig2, c1a)
                          - _sincos_series(True, ssig1, csig1, c1a))
    a2m1 = _a2m1(eps)
    ab2 = (1.0 + a2m1) * (_sincos_series(True, ssig2, csig2, c2a)
                          - _sincos_series(True, ssig1, csig1, c2a))
    m0 = a1m1 - a2m1
    j12 = m0 * sig12 + (ab1 - ab2)
    m12b = dn2 * (csig1 * ssig2) - dn1 * (ssig1 * csig2) - csig1 * csig2 * j12
    s12b = (1.0 + a1m1) * sig12 + ab1
    return s12b, m12b, m0


def _astroid(x, y):
    p = x * x
    q = y * y
    r = (p + q - 1.0) / 6.0
    if q == 0.0 and r <= 0.0:
        return 0.0
    S = p * q / 4.0
    r2 = r * r
    r3 = r * r2
    disc = S * (S + 2.0 * r3)
    if disc >= 0.0:
        T3 = S + r3
        T3 = T3 + (-np.sqrt(abs(disc)) if T3 < 0.0 else np.sqrt(abs(disc)))
        T = np.cbrt(T3)
        u = r + T + (r2 / T if T != 0.0 else 0.0)
    else:
        ang = np.arctan2(np.sqrt(abs(disc)), -(S + r3))
        u = r + 2.0 * r * np.cos(ang / 3.0)
    v = np.sqrt(u * u + q)
    uv = q / (v - u if v - u != 0.0 else _TINY) if u < 0.0 else u + v
    w = (uv - q) / (2.0 * v)
    return uv / (np.sqrt(uv + w * w) + w)


def _inverse_start(g, sbet1, cbet1, dn1, sbet2, cbet2, dn2, lam12):
    sig12 = -1.0
    salp2 = calp2 = 0.0
    sbet12 = sbet2 * cbet1 - cbet2 * sbet1
    cbet12 = cbet2 * cbet1 + sbet2 * sbet1
    sbet12a = sbet2 * cbet1 + cbet2 * sbet1

    shortline = (cbet12 >= 0.0) and (sbet12 < 0.5) and (cbet2 * lam12 < 0.5)
    sbetm2 = (sbet1 + sbet2) ** 2
    sbetm2 = sbetm2 / (sbetm2 + (cbet1 + cbet2) ** 2)
    dnm = np.sqrt(1.0 + g.ep2 * sbetm2)
    omg12 = lam12 / (g.f1 * dnm) if shortline else lam12
    somg12 = np.sin(omg12)
    comg12 = np.cos(omg12)

    salp1 = cbet2 * somg12
    if comg12 >= 0.0:
        calp1 = sbet12 + cbet2 * sbet1 * somg12 * somg12 / (1.0 + comg12)
    else:
        calp1 = sbet12a - cbet2 * sbet1 * somg12 * somg12 / (1.0 - comg12)
    ssig12 = np.hypot(salp1, calp1)
    csig12 = sbet1 * sbet2 + cbet1 * cbet2 * comg12

    if shortline and ssig12 < g.etol2:
        s2 = cbet1 * somg12
        c2_ = sbet12 - cbet1 * sbet2 * (
            somg12 * somg12 / (1.0 + comg12) if comg12 >= 0.0
            else 1.0 - comg12)
        salp2, calp2 = _norm2(s2, c2_)
        sig12 = np.arctan2(ssig12, csig12)
    elif not (abs(g.n) > 0.1 or csig12 >= 0.0
              or ssig12 >= 6.0 * abs(g.n) * np.pi * cbet1 * cbet1):
        # near-antipodal: astroid starting guess
        if g.f >= 0:
            k2 = sbet1 * sbet1 * g.ep2
            eps = k2 / (2.0 * (1.0 + np.sqrt(1.0 + k2)) + k2)
            lamscale = g.f * cbet1 * _a3f(g.a3x, eps) * np.pi
            betscale = lamscale * cbet1
            x = (lam12 - np.pi) / (lamscale if lamscale != 0.0 else _TINY)
            y = sbet12a / (betscale if betscale != 0.0 else _TINY)
        else:
            cbet12a = cbet2 * cbet1 - sbet2 * sbet1
            bet12a = np.arctan2(sbet12a, cbet12a)
            _, m12b, m0 = _lengths(g, g.n, np.pi + bet12a,
                                   sbet1, -cbet1, dn1, sbet2, cbet2, dn2,
                                   cbet1, cbet2)
            x = -1.0 + m12b / (cbet1 * cbet2 * m0 * np.pi)
            betscale = (sbet12a / x if x < -0.01
                        else -g.f * cbet1 * cbet1 * np.pi)
            lamscale = betscale / cbet1
            y = (lam12 - np.pi) / lamscale

        if (y > -_TOL1) and (x > -1.0 - _XTHRESH):
            if g.f >= 0:
                salp1 = min(1.0, -x)
                calp1 = -np.sqrt(max(0.0, 1.0 - salp1 * salp1))
            else:
                calp1 = max(0.0 if x > -_TOL1 else -1.0, x)
                salp1 = np.sqrt(max(0.0, 1.0 - calp1 * calp1))
        else:
            k = _astroid(x, y)
            omg12a = lamscale * (
                -x * k / (1.0 + k) if g.f >= 0
                else -y * (1.0 + k) / (k if k != 0.0 else _TINY))
            somg12a = np.sin(omg12a)
            comg12a = -np.cos(omg12a)
            salp1 = cbet2 * somg12a
            calp1 = sbet12a - cbet2 * sbet1 * somg12a * somg12a / (
                1.0 - comg12a)

    if not (salp1 > 0.0):
        salp1, calp1 = 1.0, 0.0
    else:
        salp1, calp1 = _norm2(salp1, calp1)
    return sig12, salp1, calp1, salp2, calp2, dnm


def _lambda12(g, sbet1, cbet1, dn1, sbet2, cbet2, dn2, salp1, calp1, diffp):
    if sbet1 == 0.0 and calp1 == 0.0:
        calp1 = -_TINY
    salp0 = salp1 * cbet1
    calp0 = np.hypot(calp1, salp1 * sbet1)

    ssig1 = sbet1
    somg1 = salp0 * sbet1
    csig1 = comg1 = calp1 * cbet1
    ssig1, csig1 = _norm2(ssig1, csig1)

    salp2 = salp0 / cbet2 if cbet2 != cbet1 else salp1
    if cbet2 != cbet1 or abs(sbet2) != -sbet1:
        calp2 = np.sqrt(max(0.0, (calp1 * cbet1) ** 2 + (
            (cbet2 - cbet1) * (cbet1 + cbet2) if cbet1 < -sbet1
            else (sbet1 - sbet2) * (sbet1 + sbet2)))) / cbet2
    else:
        calp2 = abs(calp1)
    ssig2 = sbet2
    somg2 = salp0 * sbet2
    csig2 = comg2 = calp2 * cbet2
    ssig2, csig2 = _norm2(ssig2, csig2)

    sig12 = np.arctan2(max(csig1 * ssig2 - ssig1 * csig2, 0.0),
                       csig1 * csig2 + ssig1 * ssig2)
    omg12 = np.arctan2(max(comg1 * somg2 - somg1 * comg2, 0.0),
                       comg1 * comg2 + somg1 * somg2)
    k2 = calp0 * calp0 * g.ep2
    eps = k2 / (2.0 * (1.0 + np.sqrt(1.0 + k2)) + k2)
    c3a = _c3f(g.c3x, eps)
    b312 = (_sincos_series(True, ssig2, csig2, c3a)
            - _sincos_series(True, ssig1, csig1, c3a))
    h0 = -g.f * _a3f(g.a3x, eps)
    domg12 = salp0 * h0 * (sig12 + b312)
    lam12 = omg12 + domg12

    dlam12 = None
    if diffp:
        _, m12b, _ = _lengths(g, eps, sig12, ssig1, csig1, dn1,
                              ssig2, csig2, dn2, cbet1, cbet2)
        if calp2 == 0.0:
            dlam12 = -2.0 * g.f1 * dn1 / (sbet1 if sbet1 != 0.0 else _TINY)
        else:
            dlam12 = m12b * g.f1 / (calp2 * cbet2)
    return (lam12, salp2, calp2, sig12, ssig1, csig1, ssig2, csig2,
            eps, domg12, dlam12)


def karney_inverse_scalar(lon1, lat1, lon2, lat2,
                          a=6378137.0, f=1.0 / 298.257223563,
                          with_area=False):
    """One-point Karney inverse.  Returns (s12_m, azi1_deg, azi2_deg),
    plus the geodesic area term S12_m2 (geodesic.c:849-906) as a
    fourth element when ``with_area``."""
    g = _GeodS(a, f)
    lon12 = _ang_round(_ang_diff(_ang_normalize(float(lon1)),
                                 _ang_normalize(float(lon2))))
    lonsign = 1.0 if lon12 >= 0.0 else -1.0
    lon12 = lon12 * lonsign
    lat1 = _ang_round(float(lat1))
    lat2 = _ang_round(float(lat2))

    swapp = 1.0 if abs(lat1) >= abs(lat2) else -1.0
    if swapp < 0:
        lat1, lat2 = lat2, lat1
        lonsign = -lonsign
    latsign = 1.0 if lat1 < 0.0 else -1.0
    lat1 = lat1 * latsign
    lat2 = lat2 * latsign

    phi = lat1 * _DEG
    sbet1 = g.f1 * np.sin(phi)
    cbet1 = _TINY if lat1 == -90.0 else np.cos(phi)
    sbet1, cbet1 = _norm2(sbet1, cbet1)
    phi = lat2 * _DEG
    sbet2 = g.f1 * np.sin(phi)
    cbet2 = _TINY if abs(lat2) == 90.0 else np.cos(phi)
    sbet2, cbet2 = _norm2(sbet2, cbet2)

    if cbet1 < -sbet1:
        if cbet2 == cbet1:
            sbet2 = sbet1 if sbet2 < 0.0 else -sbet1
    else:
        if abs(sbet2) == -sbet1:
            cbet2 = cbet1

    dn1 = np.sqrt(1.0 + g.ep2 * sbet1 * sbet1)
    dn2 = np.sqrt(1.0 + g.ep2 * sbet2 * sbet2)

    lam12 = lon12 * _DEG
    slam12 = 0.0 if lon12 == 180.0 else np.sin(lam12)
    clam12 = np.cos(lam12)

    s12 = sig12 = 0.0
    salp1 = calp1 = salp2 = calp2 = 0.0
    omg12 = 0.0
    meridian_ok = False
    solved = False

    if lat1 == -90.0 or slam12 == 0.0:
        # meridian (or could-be-meridian) case
        salp1, calp1 = slam12, clam12
        salp2, calp2 = 0.0, 1.0
        ssig1 = sbet1
        csig1 = calp1 * cbet1
        ssig2 = sbet2
        csig2 = calp2 * cbet2
        sig12 = np.arctan2(max(csig1 * ssig2 - ssig1 * csig2, 0.0),
                           csig1 * csig2 + ssig1 * ssig2)
        s12b, m12b, _ = _lengths(g, g.n, sig12, ssig1, csig1, dn1,
                                 ssig2, csig2, dn2, cbet1, cbet2)
        if sig12 < 1.0 or m12b >= 0.0:
            s12 = s12b * g.b
            solved = True
            meridian_ok = True

    if not solved and sbet1 == 0.0 and (g.f <= 0.0
                                        or lam12 <= np.pi - g.f * np.pi):
        # equatorial
        salp1 = salp2 = 1.0
        calp1 = calp2 = 0.0
        s12 = g.a * lam12
        sig12 = lam12 / g.f1
        omg12 = lam12 / g.f1
        solved = True

    if not solved:
        sig12, salp1, calp1, salp2, calp2, dnm = _inverse_start(
            g, sbet1, cbet1, dn1, sbet2, cbet2, dn2, lam12)
        if sig12 >= 0.0:
            # short-line shortcut
            s12 = sig12 * g.b * dnm
            omg12 = lam12 / (g.f1 * dnm)
        else:
            # Newton with bracketing
            salp1a, calp1a = _TINY, 1.0
            salp1b, calp1b = _TINY, -1.0
            tripn = tripb = False
            Rsalp2 = Rcalp2 = Rsig12 = 0.0
            Rssig1 = Rcsig1 = Rssig2 = Rcsig2 = Reps = Rdomg12 = 0.0
            for numit in range(_MAXIT2):
                (v, sa2, ca2, sg12, ss1, cs1, ss2, cs2, eps, _domg12,
                 dv) = _lambda12(g, sbet1, cbet1, dn1, sbet2, cbet2, dn2,
                                 salp1, calp1, True)
                v = v - lam12
                Rsalp2, Rcalp2, Rsig12 = sa2, ca2, sg12
                Rssig1, Rcsig1, Rssig2, Rcsig2, Reps = ss1, cs1, ss2, cs2, eps
                Rdomg12 = _domg12
                if tripb or not (abs(v) >= (8.0 if tripn else 2.0) * _TOL0):
                    break
                late = numit > _MAXIT1
                if v > 0.0 and (late or calp1 / salp1 > calp1b / salp1b):
                    salp1b, calp1b = salp1, calp1
                elif v < 0.0 and (late or calp1 / salp1 < calp1a / salp1a):
                    salp1a, calp1a = salp1, calp1
                did_newton = False
                if numit < _MAXIT1 and dv > 0.0:
                    dalp1 = -v / dv
                    sdalp1 = np.sin(dalp1)
                    cdalp1 = np.cos(dalp1)
                    nsalp1 = salp1 * cdalp1 + calp1 * sdalp1
                    if nsalp1 > 0.0 and abs(dalp1) < np.pi:
                        ncalp1 = calp1 * cdalp1 - salp1 * sdalp1
                        salp1, calp1 = _norm2(nsalp1, ncalp1)
                        tripn = abs(v) <= 16.0 * _TOL0
                        did_newton = True
                if not did_newton:
                    salp1, calp1 = _norm2((salp1a + salp1b) / 2.0,
                                          (calp1a + calp1b) / 2.0)
                    tripn = False
                    tripb = (abs(salp1a - salp1) + (calp1a - calp1) < _TOLB
                             or abs(salp1 - salp1b)
                             + (calp1 - calp1b) < _TOLB)
            salp2, calp2 = Rsalp2, Rcalp2
            s12b, _m12b, _ = _lengths(g, Reps, Rsig12, Rssig1, Rcsig1, dn1,
                                      Rssig2, Rcsig2, dn2, cbet1, cbet2)
            s12 = s12b * g.b
            omg12 = lam12 - Rdomg12

    S12 = 0.0
    if with_area:
        salp0 = salp1 * cbet1
        calp0 = np.hypot(calp1, salp1 * sbet1)
        if calp0 != 0.0 and salp0 != 0.0:
            ssig1, csig1 = _norm2(sbet1, calp1 * cbet1)
            ssig2, csig2 = _norm2(sbet2, calp2 * cbet2)
            k2 = calp0 * calp0 * g.ep2
            eps = k2 / (2.0 * (1.0 + np.sqrt(1.0 + k2)) + k2)
            a4 = (g.a * g.a) * calp0 * salp0 * g.e2
            c4a = _c4f_s(g.c4x, eps)
            b41 = _sincos_series(False, ssig1, csig1, c4a)
            b42 = _sincos_series(False, ssig2, csig2, c4a)
            S12 = a4 * (b42 - b41)
        if (not meridian_ok and omg12 < 0.75 * np.pi
                and sbet2 - sbet1 < 1.75):
            somg12 = np.sin(omg12)
            domg12_ = 1.0 + np.cos(omg12)
            dbet1 = 1.0 + cbet1
            dbet2 = 1.0 + cbet2
            alp12 = 2.0 * np.arctan2(
                somg12 * (sbet1 * dbet2 + sbet2 * dbet1),
                domg12_ * (sbet1 * sbet2 + dbet1 * dbet2))
        else:
            salp12 = salp2 * calp1 - calp2 * salp1
            calp12 = calp2 * calp1 + salp2 * salp1
            if salp12 == 0.0 and calp12 < 0.0:
                salp12 = _TINY * calp1
                calp12 = -1.0
            alp12 = np.arctan2(salp12, calp12)
        S12 = S12 + g.c2 * alp12
        S12 = S12 * (swapp * lonsign * latsign)
        S12 = S12 + 0.0

    if swapp < 0:
        salp1, salp2 = salp2, salp1
        calp1, calp2 = calp2, calp1
    salp1 = salp1 * swapp * lonsign
    calp1 = calp1 * swapp * latsign
    salp2 = salp2 * swapp * lonsign
    calp2 = calp2 * swapp * latsign

    azi1 = 0.0 - np.arctan2(-salp1, calp1) / _DEG
    azi2 = 0.0 - np.arctan2(-salp2, calp2) / _DEG
    if with_area:
        return float(0.0 + s12), float(azi1), float(azi2), float(S12)
    return float(0.0 + s12), float(azi1), float(azi2)


def transit_scalar(lon1, lon2):
    """transit (geodesic.c:1609-1619), scalar."""
    l1 = float(_ang_normalize(float(np.fmod(lon1, 360.0))))
    l2 = float(_ang_normalize(float(np.fmod(lon2, 360.0))))
    lon12 = float(_ang_diff(l1, l2))
    if l1 < 0.0 and l2 >= 0.0 and lon12 > 0.0:
        return 1
    if l2 < 0.0 and l1 >= 0.0 and lon12 < 0.0:
        return -1
    return 0


def polygon_area_scalar(lons, lats, a=6378137.0, f=1.0 / 298.257223563):
    """Scalar geod_polygon_compute(reverse=FALSE, sign=TRUE): per-edge
    scalar inverse + fsum, crossings-parity pole correction, area
    reduced into (-area0/2, area0/2].  Returns (perimeter_m, area_m2)."""
    import math

    n = len(lons)
    s_parts, a_parts = [], []
    crossings = 0
    for i in range(n):
        j = (i + 1) % n
        s12, _a1, _a2, S12 = karney_inverse_scalar(
            lons[i], lats[i], lons[j], lats[j], a, f, with_area=True)
        s_parts.append(s12)
        a_parts.append(S12)
        crossings += transit_scalar(lons[i], lons[j])
    g = _GeodS(a, f)
    area0 = 4.0 * np.pi * g.c2
    t = math.fsum(a_parts)
    if crossings & 1:
        t += (0.5 if t < 0.0 else -0.5) * area0
    t = -t
    if t > area0 / 2.0:
        t -= area0
    elif t <= -area0 / 2.0:
        t += area0
    return math.fsum(s_parts), t


# ---------------------------------------------------------------------------
# Scalar NTv2 reader + per-point grid shift (from the NTv2 format spec /
# src/pj_gridinfo.c:424-621 field layout; values arc-seconds, W-positive
# longitudes, E->W row order)
# ---------------------------------------------------------------------------

_PI = 3.14159265358979323846
_TWOPI = 6.2831853071795864769
_SPI = 3.14159265359  # truncated fast-path PI of src/adjlon.c
_DEG_TO_RAD = 0.0174532925199432958
_RAD_TO_DEG = 57.29577951308232
_SEC2RAD = _DEG_TO_RAD / 3600.0


def _adjlon_s(lon):
    if abs(lon) <= _SPI:
        return lon
    lon = lon + _PI
    lon = lon - _TWOPI * np.floor(lon / _TWOPI)
    return lon - _PI


class _SubGrid:
    """One NTv2 subgrid: extents/deltas in radians, values float32
    radians, shape (nphi, nlam, 2) with [..., 0]=d_lam, [..., 1]=d_phi,
    column 0 = westmost-…  wait — columns ordered E->W flipped to W->E
    ascending lam like the engine's convention (lam = ll_lam + i*dlam)."""

    def __init__(self, name, parent, ll, delta, lim, vals):
        self.name = name
        self.parent = parent
        self.ll = ll          # (lam, phi) radians
        self.delta = delta    # (dlam, dphi) radians
        self.lim = lim        # (nlam, nphi)
        self.vals = vals      # (nphi, nlam, 2) float32 radians
        self.children = []

    def epsilon(self):
        return (abs(self.delta[1]) + abs(self.delta[0])) / 10000.0

    def contains(self, lam, phi):
        eps = self.epsilon()
        ll_lam, ll_phi = self.ll
        dl, dp = self.delta
        nl, npq = self.lim
        return not (ll_phi - eps > phi or ll_lam - eps > lam
                    or ll_phi + (npq - 1) * dp + eps < phi
                    or ll_lam + (nl - 1) * dl + eps < lam)


def read_ntv2_scalar(path):
    """Field-by-field scalar .gsb reader; returns top-level subgrid list
    with children attached (file order preserved)."""
    with open(path, "rb") as fh:
        header = fh.read(11 * 16)
        if header[:8] != b"NUM_OREC":
            raise ValueError(f"{path}: not an NTv2 file")
        num_subfiles = struct.unpack_from("<i", header, 8 + 32)[0]
        grids = []
        for _ in range(num_subfiles):
            sub = fh.read(11 * 16)
            if sub[:8] != b"SUB_NAME":
                raise ValueError(f"{path}: bad subfile header")
            name = sub[8:16].decode().strip()
            parent = sub[24:32].decode().strip()

            def fld(k):
                return struct.unpack_from("<d", sub, 8 + 16 * k)[0]

            s_lat, n_lat = fld(4), fld(5)
            e_long, w_long = fld(6), fld(7)
            lat_inc, long_inc = fld(8), fld(9)
            gs_count = struct.unpack_from("<i", sub, 8 + 16 * 10)[0]
            # W-positive seconds -> E-positive: ll = -w_long
            nlam = int(abs((-e_long) - (-w_long)) / long_inc + 0.5) + 1
            nphi = int(abs(n_lat - s_lat) / lat_inc + 0.5) + 1
            if gs_count != nlam * nphi:
                raise ValueError(f"{path}: GS_COUNT mismatch")
            vals = np.empty((nphi, nlam, 2), dtype=np.float32)
            raw = fh.read(gs_count * 16)
            # records run W->E within a row ... i.e. DEscending E-long;
            # we store ascending lam, so column index flips
            recs = struct.iter_unpack("<ffff", raw)
            # arc-sec -> radians with a DOUBLE intermediate stored to
            # float32 (ONE rounding) — exactly the reference's
            # `cvs->phi = *diff_seconds * ((PI/180.0)/3600.0)`
            # (pj_gridinfo.c:328-330; float promoted to double, double
            # multiply, float store)
            for j in range(nphi):
                for i in range(nlam):
                    phi_sec, lam_sec, _a1, _a2 = next(recs)
                    col = nlam - 1 - i
                    vals[j, col, 1] = np.float32(
                        np.float64(phi_sec) * _SEC2RAD)
                    vals[j, col, 0] = np.float32(
                        np.float64(lam_sec) * _SEC2RAD)
            g = _SubGrid(name, parent,
                         ((-w_long) * _SEC2RAD, s_lat * _SEC2RAD),
                         (long_inc * _SEC2RAD, lat_inc * _SEC2RAD),
                         (nlam, nphi), vals)
            grids.append(g)
    by_name = {g.name: g for g in grids}
    top = []
    for g in grids:
        if g.parent == "NONE" or g.parent not in by_name:
            top.append(g)
        else:
            by_name[g.parent].children.append(g)
    return top


def _nad_intr_s(t_lam, t_phi, grid):
    """Scalar nad_intr (src/nad_intr.c:5-62).  Offsets from grid ll in
    radians; returns (d_lam, d_phi) or (inf, inf) outside."""
    dl, dp = grid.delta
    nlam, nphi = grid.lim
    tl = t_lam / dl
    tp = t_phi / dp
    il = np.floor(tl)
    ip = np.floor(tp)
    fl = tl - il
    fp = tp - ip
    if il == -1 and fl > 0.99999999999:
        il, fl = il + 1, 0.0
    if il + 1 == nlam and fl < 1e-11:
        il, fl = il - 1, 1.0
    if ip == -1 and fp > 0.99999999999:
        ip, fp = ip + 1, 0.0
    if ip + 1 == nphi and fp < 1e-11:
        ip, fp = ip - 1, 1.0
    if not (il >= 0 and il + 1 < nlam and ip >= 0 and ip + 1 < nphi
            and np.isfinite(tl) and np.isfinite(tp)):
        return np.inf, np.inf
    i, j = int(il), int(ip)
    v = grid.vals
    f00 = v[j, i]
    f10 = v[j, i + 1]
    f01 = v[j + 1, i]
    f11 = v[j + 1, i + 1]
    m11 = fl * fp
    m10 = fl * (1.0 - fp)
    m01 = (1.0 - fl) * fp
    m00 = (1.0 - fl) * (1.0 - fp)
    d_lam = m00 * f00[0] + m10 * f10[0] + m01 * f01[0] + m11 * f11[0]
    d_phi = m00 * f00[1] + m10 * f10[1] + m01 * f01[1] + m11 * f11[1]
    return d_lam, d_phi


def _nad_cvt_s(lam, phi, grid, inverse):
    """Scalar nad_cvt (src/nad_cvt.c:6-68): forward shift or MAX_TRY-9
    fixed-point inverse with first-order edge fallback."""
    ll_lam, ll_phi = grid.ll
    tb_lam = lam - ll_lam
    tb_phi = phi - ll_phi
    tb_lam = _adjlon_s(tb_lam - _PI) + _PI
    t_lam, t_phi = _nad_intr_s(tb_lam, tb_phi, grid)
    if not np.isfinite(t_lam):
        return np.inf, np.inf
    if not inverse:
        return lam - t_lam, phi + t_phi
    # fixed-point inverse
    t_lam = tb_lam + t_lam
    t_phi = tb_phi - t_phi
    i = 9  # MAX_TRY
    while True:
        dl, dp = _nad_intr_s(t_lam, t_phi, grid)
        if not np.isfinite(dl):
            break  # grid edge: keep first-order approximation
        dif_lam = t_lam - dl - tb_lam
        dif_phi = t_phi + dp - tb_phi
        t_lam = t_lam - dif_lam
        t_phi = t_phi - dif_phi
        cont = i > 0 and abs(dif_lam) > 1e-12 and abs(dif_phi) > 1e-12
        i -= 1
        if not cont:
            if i < 0:
                return np.inf, np.inf  # diverged
            break
    return _adjlon_s(t_lam + ll_lam), t_phi + ll_phi


def _descend_s(grid, lam, phi):
    for child in grid.children:
        if child.contains(lam, phi):
            return _descend_s(child, lam, phi)
    return grid


def ntv2_transform_scalar(grids, lon_deg, lat_deg, inverse=False):
    """Per-point latlong->latlong datum shift through an NTv2 grid set:
    degrees -> radians -> ordered first-match apply (with subgrid
    descent) -> degrees.  Points with no coverage pass through
    unshifted (pj_apply_gridshift.c ~236 non-severe fallback)."""
    out_lon = np.empty(len(lon_deg), dtype=np.float64)
    out_lat = np.empty(len(lat_deg), dtype=np.float64)
    for idx in range(len(lon_deg)):
        lam = float(lon_deg[idx]) * _DEG_TO_RAD
        phi = float(lat_deg[idx]) * _DEG_TO_RAD
        o_lam, o_phi = lam, phi
        for g in grids:
            if not g.contains(lam, phi):
                continue
            gg = _descend_s(g, lam, phi)
            nl, np_ = _nad_cvt_s(lam, phi, gg, inverse)
            if np.isfinite(nl):
                o_lam, o_phi = nl, np_
                break
            # shift failed inside this grid: later grids may still
            # apply (pj_apply_gridshift.c first-match-SUCCESS order)
        out_lon[idx] = o_lam * _RAD_TO_DEG
        out_lat[idx] = o_phi * _RAD_TO_DEG
    return out_lon, out_lat


# ---------------------------------------------------------------------------
# Scalar S2 cell ids (published S2 geometry scheme; independent
# per-point Python-int port of the construction the vectorized
# proj_ray/kernels/s2cell.py implements with uint64 lanes)
# ---------------------------------------------------------------------------

import math as _math

_S2_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_S2_POS_TO_ORIENT = (1, 0, 0, 3)
_S2_IJ_TO_POS = tuple(
    tuple(row.index(ij) for ij in range(4)) for row in _S2_POS_TO_IJ)
_S2_MAX = 30


def s2_cell_id_scalar(lon_deg, lat_deg, level=_S2_MAX):
    """One lon/lat (degrees) -> S2 cell id at ``level`` as a Python int
    (uint64 value).  math.* libm trig; every step a plain Python-int
    statement, so vectorized lane/dtype bugs cannot be shared."""
    lon = float(lon_deg) * (_math.pi / 180.0)
    lat = float(lat_deg) * (_math.pi / 180.0)
    cl = _math.cos(lat)
    x, y, z = cl * _math.cos(lon), cl * _math.sin(lon), _math.sin(lat)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay:
        axis = 0 if ax >= az else 2
    else:
        axis = 1 if ay >= az else 2
    major = (x, y, z)[axis]
    face = axis if major >= 0 else axis + 3
    if face == 0:
        u, v = y / x, z / x
    elif face == 1:
        u, v = -x / y, z / y
    elif face == 2:
        u, v = -x / z, -y / z
    elif face == 3:
        u, v = z / x, y / x
    elif face == 4:
        u, v = z / y, -x / y
    else:
        u, v = -y / z, -x / z

    def st(c):
        return (0.5 * _math.sqrt(1.0 + 3.0 * c) if c >= 0.0
                else 1.0 - 0.5 * _math.sqrt(1.0 - 3.0 * c))

    def ij(s):
        return min(max(int(_math.floor(s * (1 << _S2_MAX))), 0),
                   (1 << _S2_MAX) - 1)

    i, j = ij(st(u)), ij(st(v))
    orient = face & 1
    pos = 0
    for k in range(_S2_MAX - 1, -1, -1):
        q = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        child = _S2_IJ_TO_POS[orient][q]
        pos = (pos << 2) | child
        orient ^= _S2_POS_TO_ORIENT[child]
    cid = (face << 61) | (pos << 1) | 1
    if level < _S2_MAX:
        lsb = 1 << (2 * (_S2_MAX - level))
        cid = (cid & ~(2 * lsb - 1)) | lsb
    return cid


def s2_center_scalar(cid):
    """Center lon/lat (degrees) of one cell id (published GetCenterSiTi
    delta rule), Python-int decode."""
    face = cid >> 61
    orient = face & 1
    i = j = 0
    for r in range(_S2_MAX):
        child = (cid >> (59 - 2 * r)) & 3
        q = _S2_POS_TO_IJ[orient][child]
        i = (i << 1) | (q >> 1)
        j = (j << 1) | (q & 1)
        orient ^= _S2_POS_TO_ORIENT[child]
    if cid & 1:
        delta = 1
    else:
        delta = 2 if ((i ^ (cid >> 2)) & 1) else 0
    si, ti = 2 * i + delta, 2 * j + delta
    s = si / float(1 << (_S2_MAX + 1))
    t = ti / float(1 << (_S2_MAX + 1))

    def uv(c):
        return ((1.0 / 3.0) * (4.0 * c * c - 1.0) if c >= 0.5
                else (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - c) * (1.0 - c)))

    u, v = uv(s), uv(t)
    xyz = ((1.0, u, v), (-u, 1.0, v), (-u, -v, 1.0),
           (-1.0, -v, -u), (v, -1.0, -u), (v, u, -1.0))[face]
    x, y, z = xyz
    lon = _math.degrees(_math.atan2(y, x))
    lat = _math.degrees(_math.atan2(z, _math.hypot(x, y)))
    return lon, lat
