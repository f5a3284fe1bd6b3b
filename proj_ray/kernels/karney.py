"""Vectorized Karney geodesics (direct + inverse), order-6 series.

Implements the algorithms of C.F.F. Karney, "Algorithms for geodesics",
J. Geodesy 87, 43-55 (2013) — the same published algorithm the
reference embeds as ``src/geodesic.c`` (geod_geninverse:598-942,
geod_gendirect:566-588, series: 1380-1607).  Exact everywhere on the
ellipsoid, including antipodal and near-antipodal pairs where Vincenty
fails to converge; accuracy ~15 nm on WGS84.

The implementation is masked-vectorized NumPy over lanes of point
pairs: the per-case branches of the C code (meridional / equatorial /
short-line / Newton) become boolean masks, and the Newton iteration on
alp1 runs on the shrinking active subset with per-lane bracketing
state, in the same style as every other iterative kernel in this
package.  Series coefficient tables are the published order-6
expansions (numeric parity with geodesic.c:1380-1607 is intentional —
they are math constants of the algorithm, not code).
"""

from __future__ import annotations

import numpy as np

_DEG = np.pi / 180.0
_TINY = np.sqrt(np.finfo(np.float64).tiny)
_TOL0 = np.finfo(np.float64).eps
_TOL1 = 200.0 * _TOL0
_TOL2 = np.sqrt(_TOL0)
_TOLB = _TOL0 * _TOL2
_XTHRESH = 1000.0 * _TOL2
_MAXIT1 = 20
_MAXIT2 = _MAXIT1 + 53 + 10


# ---------------------------------------------------------------------------
# angle helpers (exact-rounding semantics of geodesic.c:163-183)
# ---------------------------------------------------------------------------

def _ang_normalize(x):
    return np.where(x >= 180.0, x - 360.0, np.where(x < -180.0, x + 360.0, x))


def _ang_normalize2(x):
    return _ang_normalize(np.fmod(x, 360.0))


def _sum_err(u, v):
    """Error-free two-sum: u + v = s + t exactly."""
    s = u + v
    up = s - v
    vpp = s - up
    up = up - u
    vpp = vpp - v
    return s, -(up + vpp)


def _ang_diff(x, y):
    """y - x, reduced to [-180, 180], with the error term folded in."""
    d, t = _sum_err(-x, y)
    d = np.where((d - 180.0) + t > 0.0, d - 360.0,
                 np.where((d + 180.0) + t <= 0.0, d + 360.0, d))
    return d + t


def _ang_round(x):
    """Round tiny values so that they are converted to 0 consistently
    (snaps |x| < 1/16 deg through the 1/16 representation)."""
    z = 1.0 / 16.0
    y = np.abs(x)
    y = np.where(y < z, z - (z - y), y)
    return np.where(x < 0.0, 0.0 - y, y)


def _norm2(s, c):
    r = np.hypot(s, c)
    return s / r, c / r


# ---------------------------------------------------------------------------
# order-6 series coefficients (Karney 2013 eqs. 17, 18, 21, 24, 25;
# tables mirror geodesic.c A1m1f/C1f/C1pf/A2m1f/C2f/A3coeff/C3coeff)
# ---------------------------------------------------------------------------

def _a1m1(eps):
    e2 = eps * eps
    t = e2 * (e2 * (e2 + 4.0) + 64.0) / 256.0
    return (t + eps) / (1.0 - eps)


def _c1(eps):
    """Stack [c0(unused), c1..c6] for the B1 sin-series."""
    e2 = eps * eps
    z = np.zeros_like(eps)
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
    return [z, c1, c2, c3, c4, c5, c6]


def _c1p(eps):
    """Stack for the reverted series B1' (direct problem)."""
    e2 = eps * eps
    z = np.zeros_like(eps)
    d = eps
    c1 = d * (e2 * (205.0 * e2 - 432.0) + 768.0) / 1536.0
    d = d * eps
    c2 = d * (e2 * (4005.0 * e2 - 4736.0) + 3840.0) / 12288.0
    d = d * eps
    c3 = d * (116.0 - 225.0 * e2) / 384.0
    d = d * eps
    c4 = d * (2695.0 - 7173.0 * e2) / 7680.0
    d = d * eps
    c5 = d * 3467.0 / 7680.0
    d = d * eps
    c6 = d * 38081.0 / 61440.0
    return [z, c1, c2, c3, c4, c5, c6]


def _a2m1(eps):
    e2 = eps * eps
    t = e2 * (e2 * (25.0 * e2 + 36.0) + 64.0) / 256.0
    return t * (1.0 - eps) - eps


def _c2(eps):
    e2 = eps * eps
    z = np.zeros_like(eps)
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
    return [z, c1, c2, c3, c4, c5, c6]


def _a3x(n):
    """A3 polynomial coefficients (highest power of eps first)."""
    return [
        -3.0 / 128.0,
        (-2.0 * n - 3.0) / 64.0,
        (n * (-n - 3.0) - 1.0) / 16.0,
        (n * (3.0 * n - 1.0) - 2.0) / 8.0,
        (n - 1.0) / 2.0,
        1.0,
    ]


def _a3f(a3x, eps):
    y = np.full_like(eps, a3x[0])
    for c in a3x[1:]:
        y = y * eps + c
    return y


def _c3x(n):
    """C3 coefficient table: per l=1..5 a list of eps-polynomial
    coefficients (highest power first), each a polynomial in n."""
    return [
        # C3[1]: coeffs of eps^5..eps^1
        [3.0 / 128.0, (2.0 * n + 5.0) / 128.0,
         (n * (3.0 - n) + 3.0) / 64.0, (1.0 - n * n) / 8.0,
         (1.0 - n) / 4.0],
        # C3[2]
        [5.0 / 256.0, (n + 3.0) / 128.0,
         (n * (-3.0 * n - 2.0) + 3.0) / 64.0,
         (n * (n - 3.0) + 2.0) / 32.0],
        # C3[3]
        [7.0 / 512.0, (9.0 - 10.0 * n) / 384.0,
         (n * (5.0 * n - 9.0) + 5.0) / 192.0],
        # C3[4]
        [7.0 / 512.0, (7.0 - 14.0 * n) / 512.0],
        # C3[5]
        [21.0 / 2560.0],
    ]


def _c3f(c3x, eps):
    """Evaluate C3[1..5](eps): c[l] = eps^l * polyval(c3x[l-1], eps)."""
    z = np.zeros_like(eps)
    out = [z]
    mult = np.ones_like(eps)
    for coeffs in c3x:
        mult = mult * eps
        y = np.full_like(eps, coeffs[0])
        for c in coeffs[1:]:
            y = y * eps + c
        out.append(mult * y)
    return out


def _sincos_series(sinp: bool, sinx, cosx, c):
    """Clenshaw sum of c[l]*sin(2l x) (sinp) or c[l]*cos((2l+1) x);
    c is a stack [c0, c1, ...] of per-lane arrays (c0 unused for sin).
    Mirrors geodesic.c:950-970."""
    n = len(c) - (1 if sinp else 0)
    ar = 2.0 * (cosx - sinx) * (cosx + sinx)
    k = n + (1 if sinp else 0)
    if n & 1:
        k -= 1
        y0 = c[k]
    else:
        y0 = np.zeros_like(sinx)
    y1 = np.zeros_like(sinx)
    for _ in range(n // 2):
        k -= 1
        y1 = ar * y0 - y1 + c[k]
        k -= 1
        y0 = ar * y1 - y0 + c[k]
    return 2.0 * sinx * cosx * y0 if sinp else cosx * (y0 - y1)


# ---------------------------------------------------------------------------
# ellipsoid parameter bundle
# ---------------------------------------------------------------------------

def _c4x(n):
    """The 21 C4 coefficient polynomials in n (C4coeff,
    geodesic.c:1379-1427; order nC4 = 6), flattened in the C layout:
    l = 0..5, eps power j descending from 5 to l."""
    def pv(*p):
        den = p[-1]
        y = float(p[0])
        for q in p[1:-1]:
            y = y * n + q
        return y / den

    return [
        pv(97, 15015),
        pv(1088, 156, 45045),
        pv(-224, -4784, 1573, 45045),
        pv(-10656, 14144, -4576, -858, 45045),
        pv(64, 624, -4576, 6864, -3003, 15015),
        pv(100, 208, 572, 3432, -12012, 30030, 45045),
        pv(1, 9009),
        pv(-2944, 468, 135135),
        pv(5792, 1040, -1287, 135135),
        pv(5952, -11648, 9152, -2574, 135135),
        pv(-64, -624, 4576, -6864, 3003, 135135),
        pv(8, 10725),
        pv(1856, -936, 225225),
        pv(-8448, 4992, -1144, 225225),
        pv(-1440, 4160, -4576, 1716, 225225),
        pv(-136, 63063),
        pv(1024, -208, 105105),
        pv(3584, -3328, 1144, 315315),
        pv(-128, 135135),
        pv(-2560, 832, 405405),
        pv(128, 99099),
    ]


def _c4f(c4x, eps):
    """C4 series coefficients at eps (C4f, geodesic.c:1366-1377):
    c[l] = eps^l * polyval_{m = 5-l}(C4x[o:], eps)."""
    out = []
    o = 0
    mult = np.ones_like(eps)
    for l in range(6):
        m = 6 - l - 1
        y = np.full_like(eps, c4x[o])
        for kk in range(1, m + 1):
            y = y * eps + c4x[o + kk]
        out.append(mult * y)
        o += m + 1
        mult = mult * eps
    return out


class _Geod:
    """Per-ellipsoid constants (geod_init, geodesic.c:240-268)."""

    def __init__(self, a: float, f: float):
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
        # authalic radius squared
        self.c2 = (self.a * self.a + self.b * self.b * m) / 2.0
        self.etol2 = 0.1 * _TOL2 / np.sqrt(
            max(0.001, abs(self.f)) * min(1.0, 1.0 - self.f / 2.0) / 2.0)
        self.a3x = _a3x(self.n)
        self.c3x = _c3x(self.n)
        self.c4x = _c4x(self.n)


_GEOD_CACHE: dict = {}


def _geod(a: float, f: float) -> _Geod:
    key = (float(a), float(f))
    g = _GEOD_CACHE.get(key)
    if g is None:
        g = _GEOD_CACHE[key] = _Geod(a, f)
    return g


# ---------------------------------------------------------------------------
# Lengths / Astroid / InverseStart / Lambda12 (vectorized)
# ---------------------------------------------------------------------------

def _lengths(g, eps, sig12, ssig1, csig1, dn1, ssig2, csig2, dn2,
             cbet1, cbet2):
    """(s12b, m12b, m0) — distance/b, reduced length/b, secular coeff
    (geodesic.c:972-1015, scalep=FALSE)."""
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
    """Positive root k of k^4 + 2k^3 - (x^2+y^2-1)k^2 - 2y^2 k - y^2 = 0
    (geodesic.c:1017-1067), vectorized."""
    p = x * x
    q = y * y
    r = (p + q - 1.0) / 6.0
    k = np.zeros_like(x)
    general = ~((q == 0.0) & (r <= 0.0))
    if not np.any(general):
        return k
    S = p * q / 4.0
    r2 = r * r
    r3 = r * r2
    disc = S * (S + 2.0 * r3)
    u = r.copy()
    pos = disc >= 0.0
    with np.errstate(invalid="ignore", divide="ignore"):
        # disc >= 0: real cube root, pick sign to avoid cancellation
        T3 = S + r3
        T3 = T3 + np.where(T3 < 0.0, -np.sqrt(np.abs(disc)),
                           np.sqrt(np.abs(disc)))
        T = np.cbrt(T3)
        u_pos = r + T + np.where(T != 0.0, r2 / np.where(T == 0.0, 1.0, T), 0.0)
        # disc < 0 (implies r < 0): principal-angle form, result real
        ang = np.arctan2(np.sqrt(np.abs(disc)), -(S + r3))
        u_neg = r + 2.0 * r * np.cos(ang / 3.0)
        u = np.where(pos, u_pos, u_neg)
        v = np.sqrt(u * u + q)
        uv = np.where(u < 0.0, q / np.where(v - u == 0.0, _TINY, v - u), u + v)
        w = (uv - q) / (2.0 * v)
        k_gen = uv / (np.sqrt(uv + w * w) + w)
    return np.where(general, k_gen, 0.0)


def _inverse_start(g, sbet1, cbet1, dn1, sbet2, cbet2, dn2, lam12):
    """Starting point for Newton's method (geodesic.c:1069-1247).
    Returns (sig12, salp1, calp1, salp2, calp2, dnm); sig12 >= 0 marks
    the short-line lanes solved outright."""
    sig12 = np.full_like(lam12, -1.0)
    sbet12 = sbet2 * cbet1 - cbet2 * sbet1
    cbet12 = cbet2 * cbet1 + sbet2 * sbet1
    sbet12a = sbet2 * cbet1 + cbet2 * sbet1

    shortline = (cbet12 >= 0.0) & (sbet12 < 0.5) & (cbet2 * lam12 < 0.5)
    sbetm2 = (sbet1 + sbet2) ** 2
    sbetm2 = sbetm2 / (sbetm2 + (cbet1 + cbet2) ** 2)
    dnm = np.sqrt(1.0 + g.ep2 * sbetm2)
    omg12 = np.where(shortline, lam12 / (g.f1 * dnm), lam12)
    somg12 = np.sin(omg12)
    comg12 = np.cos(omg12)

    salp1 = cbet2 * somg12
    with np.errstate(divide="ignore", invalid="ignore"):
        calp1 = np.where(
            comg12 >= 0.0,
            sbet12 + cbet2 * sbet1 * somg12 * somg12 / (1.0 + comg12),
            sbet12a - cbet2 * sbet1 * somg12 * somg12 / (1.0 - comg12))
    ssig12 = np.hypot(salp1, calp1)
    csig12 = sbet1 * sbet2 + cbet1 * cbet2 * comg12

    really_short = shortline & (ssig12 < g.etol2)
    salp2 = np.zeros_like(lam12)
    calp2 = np.zeros_like(lam12)
    if np.any(really_short):
        with np.errstate(divide="ignore", invalid="ignore"):
            s2 = cbet1 * somg12
            c2_ = sbet12 - cbet1 * sbet2 * np.where(
                comg12 >= 0.0, somg12 * somg12 / (1.0 + comg12), 1.0 - comg12)
        s2n, c2n = _norm2(s2, c2_)
        salp2 = np.where(really_short, s2n, salp2)
        calp2 = np.where(really_short, c2n, calp2)
        sig12 = np.where(really_short, np.arctan2(ssig12, csig12), sig12)

    # lanes needing the astroid starting guess (near antipodal)
    astro = (~really_short) & ~(
        (abs(g.n) > 0.1) | (csig12 >= 0.0)
        | (ssig12 >= 6.0 * abs(g.n) * np.pi * cbet1 * cbet1))
    if np.any(astro):
        if g.f >= 0:  # oblate: x = dlong, y = dlat
            k2 = sbet1 * sbet1 * g.ep2
            eps = k2 / (2.0 * (1.0 + np.sqrt(1.0 + k2)) + k2)
            lamscale = g.f * cbet1 * _a3f(g.a3x, eps) * np.pi
            betscale = lamscale * cbet1
            x = (lam12 - np.pi) / np.where(lamscale == 0.0, _TINY, lamscale)
            y = sbet12a / np.where(betscale == 0.0, _TINY, betscale)
        else:  # prolate: x = dlat, y = dlong
            cbet12a = cbet2 * cbet1 - sbet2 * sbet1
            bet12a = np.arctan2(sbet12a, cbet12a)
            _, m12b, m0 = _lengths(
                g, np.full_like(lam12, g.n), np.pi + bet12a,
                sbet1, -cbet1, dn1, sbet2, cbet2, dn2, cbet1, cbet2)
            x = -1.0 + m12b / (cbet1 * cbet2 * m0 * np.pi)
            betscale = np.where(x < -0.01, sbet12a / x,
                                -g.f * cbet1 * cbet1 * np.pi)
            lamscale = betscale / cbet1
            y = (lam12 - np.pi) / lamscale

        strip = (y > -_TOL1) & (x > -1.0 - _XTHRESH)
        if g.f >= 0:
            salp1_strip = np.minimum(1.0, -x)
            calp1_strip = -np.sqrt(np.maximum(0.0, 1.0 - salp1_strip ** 2))
        else:
            calp1_strip = np.maximum(np.where(x > -_TOL1, 0.0, -1.0), x)
            salp1_strip = np.sqrt(np.maximum(0.0, 1.0 - calp1_strip ** 2))

        k = _astroid(x, y)
        omg12a = lamscale * np.where(g.f >= 0, -x * k / (1.0 + k),
                                     -y * (1.0 + k) / np.where(k == 0.0, _TINY, k))
        somg12a = np.sin(omg12a)
        comg12a = -np.cos(omg12a)
        salp1_astro = cbet2 * somg12a
        with np.errstate(divide="ignore", invalid="ignore"):
            calp1_astro = sbet12a - cbet2 * sbet1 * somg12a * somg12a / (
                1.0 - comg12a)

        salp1 = np.where(astro, np.where(strip, salp1_strip, salp1_astro), salp1)
        calp1 = np.where(astro, np.where(strip, calp1_strip, calp1_astro), calp1)

    # sanity: salp1 must be > 0 (NaNs pass through)
    bad = ~(salp1 > 0.0)
    salp1 = np.where(bad, 1.0, salp1)
    calp1 = np.where(bad, 0.0, calp1)
    sn, cn = _norm2(salp1, calp1)
    salp1 = np.where(bad, 1.0, sn)
    calp1 = np.where(bad, 0.0, cn)
    return sig12, salp1, calp1, salp2, calp2, dnm


def _lambda12(g, sbet1, cbet1, dn1, sbet2, cbet2, dn2, salp1, calp1,
              diffp: bool):
    """lam12(alp1) and its derivative (geodesic.c:1249-1346).
    Returns (lam12, salp2, calp2, sig12, ssig1, csig1, ssig2, csig2,
    eps, domg12, dlam12)."""
    calp1 = np.where((sbet1 == 0.0) & (calp1 == 0.0), -_TINY, calp1)
    salp0 = salp1 * cbet1
    calp0 = np.hypot(calp1, salp1 * sbet1)

    ssig1 = sbet1
    somg1 = salp0 * sbet1
    csig1 = comg1 = calp1 * cbet1
    ssig1, csig1 = _norm2(ssig1, csig1)

    with np.errstate(divide="ignore", invalid="ignore"):
        salp2 = np.where(cbet2 != cbet1, salp0 / cbet2, salp1)
        calp2 = np.where(
            (cbet2 != cbet1) | (np.abs(sbet2) != -sbet1),
            np.sqrt(np.maximum(0.0, (calp1 * cbet1) ** 2 + np.where(
                cbet1 < -sbet1,
                (cbet2 - cbet1) * (cbet1 + cbet2),
                (sbet1 - sbet2) * (sbet1 + sbet2)))) / cbet2,
            np.abs(calp1))
    ssig2 = sbet2
    somg2 = salp0 * sbet2
    csig2 = comg2 = calp2 * cbet2
    ssig2, csig2 = _norm2(ssig2, csig2)

    sig12 = np.arctan2(np.maximum(csig1 * ssig2 - ssig1 * csig2, 0.0),
                       csig1 * csig2 + ssig1 * ssig2)
    omg12 = np.arctan2(np.maximum(comg1 * somg2 - somg1 * comg2, 0.0),
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
        with np.errstate(divide="ignore", invalid="ignore"):
            dlam12 = np.where(
                calp2 == 0.0,
                -2.0 * g.f1 * dn1 / np.where(sbet1 == 0.0, _TINY, sbet1),
                m12b * g.f1 / (calp2 * cbet2))
    return (lam12, salp2, calp2, sig12, ssig1, csig1, ssig2, csig2,
            eps, domg12, dlam12)


# ---------------------------------------------------------------------------
# public: inverse problem
# ---------------------------------------------------------------------------

def geod_inverse_karney(lon1, lat1, lon2, lat2, a: float, f: float,
                        with_area: bool = False):
    """Vectorized Karney inverse (geodesic.c geod_geninverse:598-942).
    Degrees in; returns (s12_m, azi1_deg, azi2_deg, a12_deg), plus the
    geodesic area term S12_m2 (the GEOD_AREA output,
    geodesic.c:849-906) as a fifth element when ``with_area``."""
    g = _geod(a, f)
    lat1 = np.atleast_1d(np.asarray(lat1, dtype=np.float64)).copy()
    lat2 = np.atleast_1d(np.asarray(lat2, dtype=np.float64)).copy()
    lon1 = np.atleast_1d(np.asarray(lon1, dtype=np.float64))
    lon2 = np.atleast_1d(np.asarray(lon2, dtype=np.float64))
    N = lat1.shape[0]

    lon12 = _ang_round(_ang_diff(_ang_normalize(lon1), _ang_normalize(lon2)))
    lonsign = np.where(lon12 >= 0.0, 1.0, -1.0)
    lon12 = lon12 * lonsign
    lat1 = _ang_round(lat1)
    lat2 = _ang_round(lat2)

    swapp = np.where(np.abs(lat1) >= np.abs(lat2), 1.0, -1.0)
    do_swap = swapp < 0
    lat1_, lat2_ = lat1.copy(), lat2.copy()
    lat1_[do_swap], lat2_[do_swap] = lat2[do_swap], lat1[do_swap]
    lonsign = np.where(do_swap, -lonsign, lonsign)
    lat1, lat2 = lat1_, lat2_
    latsign = np.where(lat1 < 0.0, 1.0, -1.0)
    lat1 = lat1 * latsign
    lat2 = lat2 * latsign
    # canonical: 0 <= lon12 <= 180, -90 <= lat1 <= 0, lat1 <= lat2 <= -lat1

    phi = lat1 * _DEG
    sbet1 = g.f1 * np.sin(phi)
    cbet1 = np.where(lat1 == -90.0, _TINY, np.cos(phi))
    sbet1, cbet1 = _norm2(sbet1, cbet1)
    phi = lat2 * _DEG
    sbet2 = g.f1 * np.sin(phi)
    cbet2 = np.where(np.abs(lat2) == 90.0, _TINY, np.cos(phi))
    sbet2, cbet2 = _norm2(sbet2, cbet2)

    # enforce bet2 = +/- bet1 exactly when they nearly coincide
    close = cbet1 < -sbet1
    eqc = close & (cbet2 == cbet1)
    sbet2 = np.where(eqc, np.where(sbet2 < 0.0, sbet1, -sbet1), sbet2)
    eqc2 = (~close) & (np.abs(sbet2) == -sbet1)
    cbet2 = np.where(eqc2, cbet1, cbet2)

    dn1 = np.sqrt(1.0 + g.ep2 * sbet1 * sbet1)
    dn2 = np.sqrt(1.0 + g.ep2 * sbet2 * sbet2)

    lam12 = lon12 * _DEG
    slam12 = np.where(lon12 == 180.0, 0.0, np.sin(lam12))
    clam12 = np.cos(lam12)

    s12 = np.zeros(N)
    m12x = np.zeros(N)
    sig12 = np.zeros(N)
    a12 = np.zeros(N)
    salp1 = np.zeros(N)
    calp1 = np.zeros(N)
    salp2 = np.zeros(N)
    calp2 = np.zeros(N)
    omg12 = np.zeros(N)

    meridian = (lat1 == -90.0) | (slam12 == 0.0)
    if np.any(meridian):
        i = np.flatnonzero(meridian)
        ca1 = clam12[i]
        sa1 = slam12[i]
        ca2 = np.ones_like(ca1)
        sa2 = np.zeros_like(ca1)
        ssig1 = sbet1[i]
        csig1 = ca1 * cbet1[i]
        ssig2 = sbet2[i]
        csig2 = ca2 * cbet2[i]
        sg12 = np.arctan2(np.maximum(csig1 * ssig2 - ssig1 * csig2, 0.0),
                          csig1 * csig2 + ssig1 * ssig2)
        s12b, m12b, _ = _lengths(g, np.full_like(sg12, g.n), sg12,
                                 ssig1, csig1, dn1[i], ssig2, csig2, dn2[i],
                                 cbet1[i], cbet2[i])
        ok = (sg12 < 1.0) | (m12b >= 0.0)
        salp1[i] = sa1
        calp1[i] = ca1
        salp2[i] = sa2
        calp2[i] = ca2
        s12[i] = np.where(ok, s12b * g.b, s12[i])
        m12x[i] = np.where(ok, m12b * g.b, m12x[i])
        sig12[i] = sg12
        a12[i] = np.where(ok, sg12 / _DEG, a12[i])
        # prolate near-antipodal meridional: fall through to Newton
        meridian[i] = ok

    equatorial = (~meridian) & (sbet1 == 0.0) & (
        (g.f <= 0.0) | (lam12 <= np.pi - g.f * np.pi))
    if np.any(equatorial):
        i = np.flatnonzero(equatorial)
        salp1[i] = 1.0
        calp1[i] = 0.0
        salp2[i] = 1.0
        calp2[i] = 0.0
        s12[i] = g.a * lam12[i]
        sig12[i] = lam12[i] / g.f1
        omg12[i] = lam12[i] / g.f1
        a12[i] = lon12[i] / g.f1

    rest = ~(meridian | equatorial)
    if np.any(rest):
        i = np.flatnonzero(rest)
        sg12, sa1, ca1, sa2, ca2, dnm = _inverse_start(
            g, sbet1[i], cbet1[i], dn1[i], sbet2[i], cbet2[i], dn2[i],
            lam12[i])
        shortcut = sg12 >= 0.0
        if np.any(shortcut):
            j = i[shortcut]
            sgj = sg12[shortcut]
            dnmj = dnm[shortcut]
            s12[j] = sgj * g.b * dnmj
            m12x[j] = dnmj * dnmj * g.b * np.sin(sgj / dnmj)
            sig12[j] = sgj
            a12[j] = sgj / _DEG
            omg12[j] = lam12[j] / (g.f1 * dnmj)
            salp1[j] = sa1[shortcut]
            calp1[j] = ca1[shortcut]
            salp2[j] = sa2[shortcut]
            calp2[j] = ca2[shortcut]
        newton = ~shortcut
        if np.any(newton):
            j = i[newton]
            _newton_inverse(g, j, sbet1, cbet1, dn1, sbet2, cbet2, dn2,
                            lam12, sa1[newton], ca1[newton],
                            s12, m12x, sig12, a12, salp1, calp1, salp2, calp2,
                            omg12)

    S12 = None
    if with_area:
        # GEOD_AREA block (geodesic.c:849-906), in the CANONICAL frame
        # (before the azimuth un-swap below), then sign-restored
        salp0 = salp1 * cbet1
        calp0 = np.hypot(calp1, salp1 * sbet1)
        S12 = np.zeros(N)
        nz = np.flatnonzero((calp0 != 0.0) & (salp0 != 0.0))
        if nz.size:
            ssig1, csig1 = _norm2(sbet1[nz], calp1[nz] * cbet1[nz])
            ssig2, csig2 = _norm2(sbet2[nz], calp2[nz] * cbet2[nz])
            k2 = calp0[nz] * calp0[nz] * g.ep2
            eps = k2 / (2.0 * (1.0 + np.sqrt(1.0 + k2)) + k2)
            a4 = (g.a * g.a) * calp0[nz] * salp0[nz] * g.e2
            c4a = _c4f(g.c4x, eps)
            b41 = _sincos_series(False, ssig1, csig1, c4a)
            b42 = _sincos_series(False, ssig2, csig2, c4a)
            S12[nz] = a4 * (b42 - b41)
        use_tan = ((~meridian) & (omg12 < 0.75 * np.pi)
                   & (sbet2 - sbet1 < 1.75))
        somg12 = np.sin(omg12)
        domg12_ = 1.0 + np.cos(omg12)
        dbet1 = 1.0 + cbet1
        dbet2 = 1.0 + cbet2
        alp12_t = 2.0 * np.arctan2(
            somg12 * (sbet1 * dbet2 + sbet2 * dbet1),
            domg12_ * (sbet1 * sbet2 + dbet1 * dbet2))
        salp12 = salp2 * calp1 - calp2 * salp1
        calp12 = calp2 * calp1 + salp2 * salp1
        deg = (salp12 == 0.0) & (calp12 < 0.0)
        salp12 = np.where(deg, _TINY * calp1, salp12)
        calp12 = np.where(deg, -1.0, calp12)
        alp12 = np.where(use_tan, alp12_t, np.arctan2(salp12, calp12))
        S12 = S12 + g.c2 * alp12
        S12 = S12 * (swapp * lonsign * latsign)
        S12 = S12 + 0.0

    # un-canonicalize azimuth vectors
    sw = do_swap
    t = salp1[sw].copy()
    salp1[sw] = salp2[sw]
    salp2[sw] = t
    t = calp1[sw].copy()
    calp1[sw] = calp2[sw]
    calp2[sw] = t
    salp1 = salp1 * swapp * lonsign
    calp1 = calp1 * swapp * latsign
    salp2 = salp2 * swapp * lonsign
    calp2 = calp2 * swapp * latsign

    azi1 = 0.0 - np.arctan2(-salp1, calp1) / _DEG
    azi2 = 0.0 - np.arctan2(-salp2, calp2) / _DEG
    if with_area:
        return 0.0 + s12, azi1, azi2, a12, S12
    return 0.0 + s12, azi1, azi2, a12


def _newton_inverse(g, j, sbet1, cbet1, dn1, sbet2, cbet2, dn2, lam12,
                    salp1_0, calp1_0, s12, m12x, sig12, a12,
                    salp1_out, calp1_out, salp2_out, calp2_out,
                    omg12_out=None):
    """Newton's method on alp1 with per-lane bracketing
    (geodesic.c:766-840), over the lanes indexed by j."""
    n = j.shape[0]
    sb1, cb1, d1 = sbet1[j], cbet1[j], dn1[j]
    sb2, cb2, d2 = sbet2[j], cbet2[j], dn2[j]
    lm12 = lam12[j]
    salp1 = salp1_0.copy()
    calp1 = calp1_0.copy()
    salp1a = np.full(n, _TINY)
    calp1a = np.ones(n)
    salp1b = np.full(n, _TINY)
    calp1b = np.full(n, -1.0)
    tripn = np.zeros(n, dtype=bool)
    tripb = np.zeros(n, dtype=bool)
    active = np.ones(n, dtype=bool)

    # converged-state accumulators
    Rsalp2 = np.zeros(n)
    Rcalp2 = np.zeros(n)
    Rsig12 = np.zeros(n)
    Rssig1 = np.zeros(n)
    Rcsig1 = np.zeros(n)
    Rssig2 = np.zeros(n)
    Rcsig2 = np.zeros(n)
    Reps = np.zeros(n)
    Rdomg12 = np.zeros(n)

    for numit in range(_MAXIT2):
        if not np.any(active):
            break
        k = np.flatnonzero(active)
        (v, sa2, ca2, sg12, ss1, cs1, ss2, cs2, eps, domg12,
         dv) = _lambda12(g, sb1[k], cb1[k], d1[k], sb2[k], cb2[k], d2[k],
                         salp1[k], calp1[k], True)
        v = v - lm12[k]
        # store the latest evaluation for every lane
        Rsalp2[k] = sa2
        Rcalp2[k] = ca2
        Rsig12[k] = sg12
        Rssig1[k] = ss1
        Rcsig1[k] = cs1
        Rssig2[k] = ss2
        Rcsig2[k] = cs2
        Reps[k] = eps
        Rdomg12[k] = domg12

        done = tripb[k] | ~(np.abs(v) >= np.where(tripn[k], 8.0, 2.0) * _TOL0)
        active[k[done]] = False
        k = k[~done]
        if k.size == 0:
            break
        v = v[~done]
        dv = dv[~done]
        late = numit > _MAXIT1
        with np.errstate(divide="ignore", invalid="ignore"):
            upd_b = (v > 0.0) & (late | (calp1[k] / salp1[k]
                                         > calp1b[k] / salp1b[k]))
            upd_a = (v < 0.0) & ~upd_b & (late | (calp1[k] / salp1[k]
                                                  < calp1a[k] / salp1a[k]))
        salp1b[k[upd_b]] = salp1[k[upd_b]]
        calp1b[k[upd_b]] = calp1[k[upd_b]]
        salp1a[k[upd_a]] = salp1[k[upd_a]]
        calp1a[k[upd_a]] = calp1[k[upd_a]]

        newton_ok = np.zeros(k.shape[0], dtype=bool)
        if numit < _MAXIT1:
            with np.errstate(divide="ignore", invalid="ignore"):
                dalp1 = -v / dv
            sdalp1 = np.sin(dalp1)
            cdalp1 = np.cos(dalp1)
            nsalp1 = salp1[k] * cdalp1 + calp1[k] * sdalp1
            newton_ok = (dv > 0.0) & (nsalp1 > 0.0) & (np.abs(dalp1) < np.pi)
            kn = k[newton_ok]
            ncalp1 = calp1[kn] * cdalp1[newton_ok] - salp1[kn] * sdalp1[newton_ok]
            sn, cn = _norm2(nsalp1[newton_ok], ncalp1)
            salp1[kn] = sn
            calp1[kn] = cn
            tripn[kn] = np.abs(v[newton_ok]) <= 16.0 * _TOL0

        bisect = ~newton_ok
        kb = k[bisect]
        if kb.size:
            sn, cn = _norm2((salp1a[kb] + salp1b[kb]) / 2.0,
                            (calp1a[kb] + calp1b[kb]) / 2.0)
            salp1[kb] = sn
            calp1[kb] = cn
            tripn[kb] = False
            tripb[kb] = ((np.abs(salp1a[kb] - salp1[kb])
                          + (calp1a[kb] - calp1[kb]) < _TOLB)
                         | (np.abs(salp1[kb] - salp1b[kb])
                            + (calp1[kb] - calp1b[kb]) < _TOLB))

    s12b, m12b, _ = _lengths(g, Reps, Rsig12, Rssig1, Rcsig1, d1,
                             Rssig2, Rcsig2, d2, cb1, cb2)
    s12[j] = s12b * g.b
    m12x[j] = m12b * g.b
    sig12[j] = Rsig12
    a12[j] = Rsig12 / _DEG
    salp1_out[j] = salp1
    calp1_out[j] = calp1
    salp2_out[j] = Rsalp2
    calp2_out[j] = Rcalp2
    if omg12_out is not None:
        # geodesic.c:840: omg12 = lam12 - <Lambda12's omega output>
        omg12_out[j] = lm12 - Rdomg12


# ---------------------------------------------------------------------------
# public: direct problem
# ---------------------------------------------------------------------------

def geod_direct_karney(lon1, lat1, azi1, s12, a: float, f: float):
    """Vectorized Karney direct (geod_lineinit + geod_genposition,
    geodesic.c:270-559).  Degrees/meters in; returns (lon2, lat2,
    azi2_deg)."""
    g = _geod(a, f)
    lat1 = np.atleast_1d(np.asarray(lat1, dtype=np.float64))
    lon1 = np.atleast_1d(np.asarray(lon1, dtype=np.float64))
    azi1 = np.atleast_1d(np.asarray(azi1, dtype=np.float64))
    s12 = np.atleast_1d(np.asarray(s12, dtype=np.float64))

    azi1n = _ang_round(_ang_normalize(azi1))
    alp1 = azi1n * _DEG
    salp1 = np.where(azi1n == -180.0, 0.0, np.sin(alp1))
    calp1 = np.where(np.abs(azi1n) == 90.0, 0.0, np.cos(alp1))
    phi = lat1 * _DEG
    sbet1 = g.f1 * np.sin(phi)
    cbet1 = np.where(np.abs(lat1) == 90.0, _TINY, np.cos(phi))
    sbet1, cbet1 = _norm2(sbet1, cbet1)
    dn1 = np.sqrt(1.0 + g.ep2 * sbet1 * sbet1)

    salp0 = salp1 * cbet1
    calp0 = np.hypot(calp1, salp1 * sbet1)
    ssig1 = sbet1
    somg1 = salp0 * sbet1
    csig1 = comg1 = np.where((sbet1 != 0.0) | (calp1 != 0.0),
                             cbet1 * calp1, 1.0)
    ssig1, csig1 = _norm2(ssig1, csig1)

    k2 = calp0 * calp0 * g.ep2
    eps = k2 / (2.0 * (1.0 + np.sqrt(1.0 + k2)) + k2)
    a1m1 = _a1m1(eps)
    c1a = _c1(eps)
    b11 = _sincos_series(True, ssig1, csig1, c1a)
    s_, c_ = np.sin(b11), np.cos(b11)
    stau1 = ssig1 * c_ + csig1 * s_
    ctau1 = csig1 * c_ - ssig1 * s_
    c1pa = _c1p(eps)
    c3a = _c3f(g.c3x, eps)
    a3c = -g.f * salp0 * _a3f(g.a3x, eps)
    b31 = _sincos_series(True, ssig1, csig1, c3a)

    tau12 = s12 / (g.b * (1.0 + a1m1))
    s_, c_ = np.sin(tau12), np.cos(tau12)
    b12 = -_sincos_series(True, stau1 * c_ + ctau1 * s_,
                          ctau1 * c_ - stau1 * s_, c1pa)
    sig12 = tau12 - (b12 - b11)
    ssig12 = np.sin(sig12)
    csig12 = np.cos(sig12)
    if abs(g.f) > 0.01:
        # one Newton step to fix the reverted series (geodesic.c:407-438)
        ssig2 = ssig1 * csig12 + csig1 * ssig12
        csig2 = csig1 * csig12 - ssig1 * ssig12
        b12 = _sincos_series(True, ssig2, csig2, c1a)
        serr = (1.0 + a1m1) * (sig12 + (b12 - b11)) - s12 / g.b
        sig12 = sig12 - serr / np.sqrt(1.0 + k2 * ssig2 * ssig2)
        ssig12 = np.sin(sig12)
        csig12 = np.cos(sig12)

    ssig2 = ssig1 * csig12 + csig1 * ssig12
    csig2 = csig1 * csig12 - ssig1 * ssig12
    sbet2 = calp0 * ssig2
    cbet2 = np.hypot(salp0, calp0 * csig2)
    deg_pole = cbet2 == 0.0
    cbet2 = np.where(deg_pole, _TINY, cbet2)
    csig2 = np.where(deg_pole, _TINY, csig2)
    salp2 = salp0
    calp2 = calp0 * csig2

    somg2 = salp0 * ssig2
    comg2 = csig2
    omg12 = np.arctan2(somg2 * comg1 - comg2 * somg1,
                       comg2 * comg1 + somg2 * somg1)
    lam12 = omg12 + a3c * (
        sig12 + (_sincos_series(True, ssig2, csig2, c3a) - b31))
    lon12 = lam12 / _DEG
    lon2 = _ang_normalize(_ang_normalize(lon1) + _ang_normalize2(lon12))
    lat2 = np.arctan2(sbet2, g.f1 * cbet2) / _DEG
    azi2 = 0.0 - np.arctan2(-salp2, calp2) / _DEG
    return lon2, lat2, azi2


# ---------------------------------------------------------------------------
# public: polygon perimeter + area (geod_polygon_*, geodesic.c:1609-1745)
# ---------------------------------------------------------------------------

def _transit(lon1, lon2):
    """+-1 when the edge crosses the prime meridian east/westward
    (transit, geodesic.c:1609-1619)."""
    l1 = _ang_normalize2(np.asarray(lon1, dtype=np.float64))
    l2 = _ang_normalize2(np.asarray(lon2, dtype=np.float64))
    lon12 = _ang_diff(l1, l2)
    return np.where((l1 < 0.0) & (l2 >= 0.0) & (lon12 > 0.0), 1,
                    np.where((l2 < 0.0) & (l1 >= 0.0) & (lon12 < 0.0),
                             -1, 0)).astype(np.int64)


def geod_polygon_area(lons, lats, a: float, f: float):
    """Perimeter (m) and area (m^2) of ONE closed ring, replicating
    geod_polygon_init/addpoint/compute(reverse=FALSE, sign=TRUE):
    counter-clockwise positive, area reduced into (-area0/2, area0/2]
    with the pole-encirclement (crossings-parity) correction.
    Vertices arrive UNclosed; the closing edge is added here.  Sums use
    math.fsum (exactly rounded — at least as accurate as the C's
    two-float Neumaier accumulator, and order-free, which is what lets
    the vectorized engine and the scalar golden agree bit-for-bit).
    Returns (perimeter_m, area_m2, n_vertices)."""
    import math

    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    lon2 = np.roll(lons, -1)
    lat2 = np.roll(lats, -1)
    s12, _azi1, _azi2, _a12, S12 = geod_inverse_karney(
        lons, lats, lon2, lat2, a, f, with_area=True)
    crossings = int(_transit(lons, lon2).sum())
    perimeter = math.fsum(s12.tolist())
    t = math.fsum(S12.tolist())
    g = _geod(a, f)
    area0 = 4.0 * np.pi * g.c2
    if crossings & 1:
        t += (0.5 if t < 0.0 else -0.5) * area0
    t = -t  # clockwise accumulation -> counter-clockwise convention
    if t > area0 / 2.0:
        t -= area0
    elif t <= -area0 / 2.0:
        t += area0
    return perimeter, t, int(lons.size)


def geod_polygon_area_many(lons, lats, bounds, a: float, f: float):
    """Batched geod_polygon_area over MANY closed rings stored
    contiguously: ring r occupies vertices [bounds[r], bounds[r+1]).
    ONE vectorized geod_inverse_karney call covers every edge of every
    ring (the per-call fixed overhead of the masked-iteration kernel is
    what dominates a ring-at-a-time loop); the per-ring fsum /
    crossings-parity / quadrant normalization are identical to the
    single-ring function, and the per-edge results are too (the kernel
    is elementwise: each lane converges independently), so outputs are
    bit-identical to calling geod_polygon_area per ring.
    Returns (perimeters, areas, n_vertices) arrays of len(bounds)-1."""
    import math

    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    bounds = np.asarray(bounds, dtype=np.int64)
    n = lons.size
    # within-ring roll: successor vertex, wrapping to the ring start
    idx2 = np.arange(1, n + 1, dtype=np.int64)
    starts = bounds[:-1]
    ends = bounds[1:]
    idx2[ends - 1] = starts
    lon2 = lons[idx2]
    lat2 = lats[idx2]
    s12, _azi1, _azi2, _a12, S12 = geod_inverse_karney(
        lons, lats, lon2, lat2, a, f, with_area=True)
    trans = _transit(lons, lon2)
    g = _geod(a, f)
    area0 = 4.0 * np.pi * g.c2
    nr = len(starts)
    perims = np.empty(nr, np.float64)
    areas = np.empty(nr, np.float64)
    nv = (ends - starts).astype(np.int64)
    for r in range(nr):
        lo, hi = int(starts[r]), int(ends[r])
        perims[r] = math.fsum(s12[lo:hi].tolist())
        t = math.fsum(S12[lo:hi].tolist())
        if int(trans[lo:hi].sum()) & 1:
            t += (0.5 if t < 0.0 else -0.5) * area0
        t = -t
        if t > area0 / 2.0:
            t -= area0
        elif t <= -area0 / 2.0:
            t += area0
        areas[r] = t
    return perims, areas, nv
