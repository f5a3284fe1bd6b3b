"""Scalar-oracle pins for the conditioning-bounded registry heads.

The full-registry differential sweep (tools/validate_against_reference)
carries documented cm-level bounds for ocea / vandg / vandg2-4 / loxim
because sub-ulp libm differences between any two correct BUILDS are
amplified by those projections' op chains.  These tests pin the
ENGINE against scalar transliterations of the reference C (same op
order, math.* vs numpy) at far tighter bounds, so the wide sweep
bounds can't silently hide an op-order or constant regression:

- ocea: the replicated a-in-rok/rtk quirk (PJ_ocea.c:41-42 bakes P->a
  into the projection though the generic wrapper scales by a again)
  is pinned by BOTH a few-ulp relative bound and an output-magnitude
  assertion (~a^2 = 1e14 m) — dropping the quirk would be a ~6.4e6x
  change, not a widened tolerance.
- vandg / vandg2 / vandg3: byte-level op-order transliteration
  (PJ_vandg.c:12-43, PJ_vandg2.c:9-35), sub-print-precision bound
  even inside the conditioned near-central-meridian region (engine
  and scalar share the op order; only cross-build libm noise needs
  the cm bound).
- loxim: PJ_loxim.c:9-20 incl. both EPS branches; the log(tan/tan1)
  amplification near lat_1 is bounded at 1e-2 m, elsewhere 1e-5 m.
"""

import math

import numpy as np

from proj_ray.transform import make_transform

D2R = 0.0174532925199432958
R = 6370997.0
HALFPI = math.pi / 2
TWOPI = 6.2831853071795864769


def _adjlon(l):
    if abs(l) <= math.pi:
        return l
    l += math.pi
    l -= TWOPI * math.floor(l / TWOPI)
    return l - math.pi


def test_ocea_matches_scalar_reference_and_a_in_rok_quirk():
    k0 = 1.0
    phi_1, phi_2 = 30 * D2R, 50 * D2R
    lam_1, lam_2 = -10 * D2R, 20 * D2R
    singam = math.atan2(
        math.cos(phi_1) * math.sin(phi_2) * math.cos(lam_1)
        - math.sin(phi_1) * math.cos(phi_2) * math.cos(lam_2),
        math.sin(phi_1) * math.cos(phi_2) * math.sin(lam_2)
        - math.cos(phi_1) * math.sin(phi_2) * math.sin(lam_1))
    ang = math.atan(-math.cos(singam - lam_1) / math.tan(phi_1))
    lam0 = singam + HALFPI
    cosphi, sinphi = math.cos(ang), math.sin(ang)
    rok, rtk = R / k0, R * k0  # P->a baked in (the quirk)

    def sfwd(lon, lat):
        lam = _adjlon(lon * D2R - lam0)
        phi = lat * D2R
        yv = math.sin(lam)
        t = math.cos(lam)
        x = math.atan((math.tan(phi) * cosphi + sinphi * yv) / t)
        if t < 0.0:
            x += math.pi
        x *= rtk
        y = rok * (sinphi * math.sin(phi) - cosphi * math.cos(phi) * yv)
        return R * x, R * y  # generic wrapper scales by a AGAIN

    fwd = make_transform(
        "+proj=latlong +R=6370997",
        "+proj=ocea +lat_1=30 +lon_1=-10 +lat_2=50 +lon_2=20 +R=6370997")
    rng = np.random.default_rng(5)
    lon = rng.uniform(-179, 179, 400)
    lat = rng.uniform(-85, 85, 400)
    x, y, _ = fwd(lon.copy(), lat.copy())
    exp = np.array([sfwd(a, b) for a, b in zip(lon, lat)])
    rel = np.abs(np.column_stack([x, y]) - exp) / np.maximum(np.abs(exp), 1.0)
    assert np.max(rel) < 1e-13          # few-ulp agreement
    assert np.max(np.abs(x)) > 1e13     # a^2-scale output = quirk present


def test_ocea_alpha_branch_matches_scalar_reference():
    alpha, lonz = 30 * D2R, 45 * D2R
    phi_0 = 0.0
    # the C's abused variable names, op for op (PJ_ocea.c:46-49):
    # atan of -cos/( -sin(0)*sin(alpha) ) divides by -0.0 -> -inf ->
    # atan(-inf) = -pi/2
    with np.errstate(divide="ignore"):
        singam = math.atan(np.float64(-math.cos(alpha))
                           / np.float64(-math.sin(phi_0) * math.sin(alpha))) \
            + lonz
    ang = math.asin(math.cos(phi_0) * math.sin(alpha))
    lam0 = singam + HALFPI
    cosphi, sinphi = math.cos(ang), math.sin(ang)
    rok, rtk = R, R

    def sfwd(lon, lat):
        lam = _adjlon(lon * D2R - lam0)
        phi = lat * D2R
        yv = math.sin(lam)
        t = math.cos(lam)
        x = math.atan((math.tan(phi) * cosphi + sinphi * yv) / t)
        if t < 0.0:
            x += math.pi
        return R * x * rtk, R * rok * (sinphi * math.sin(phi)
                                       - cosphi * math.cos(phi) * yv)

    fwd = make_transform("+proj=latlong +R=6370997",
                         "+proj=ocea +alpha=30 +lonc=45 +R=6370997")
    rng = np.random.default_rng(6)
    lon = rng.uniform(-179, 179, 300)
    lat = rng.uniform(-85, 85, 300)
    x, y, _ = fwd(lon.copy(), lat.copy())
    exp = np.array([sfwd(a, b) for a, b in zip(lon, lat)])
    rel = np.abs(np.column_stack([x, y]) - exp) / np.maximum(np.abs(exp), 1.0)
    # the cos(lam)->0 seam amplifies a 1-ulp tan/atan difference a bit
    # further than the lat_1/lat_2 branch; still 6+ orders tighter
    # than what dropping the a-in-rok quirk would produce
    assert np.max(rel) < 1e-12


def _vandg_sfwd(lon, lat):
    TOL = 1e-10
    lam = _adjlon(lon * D2R)
    phi = lat * D2R
    p2 = abs(phi / HALFPI)
    if (p2 - TOL) > 1.0:
        return math.inf, math.inf
    if p2 > 1.0:
        p2 = 1.0
    if abs(phi) <= TOL:
        x, y = lam, 0.0
    elif abs(lam) <= TOL or abs(p2 - 1.0) < TOL:
        x = 0.0
        y = math.pi * math.tan(0.5 * math.asin(p2))
        if phi < 0.0:
            y = -y
    else:
        al = 0.5 * abs(math.pi / lam - lam / math.pi)
        al2 = al * al
        g = math.sqrt(1.0 - p2 * p2)
        g = g / (p2 + g - 1.0)
        g2 = g * g
        p2 = g * (2.0 / p2 - 1.0)
        p2 = p2 * p2
        x = g - p2
        gg = p2 + al2
        x = math.pi * (al * x + math.sqrt(al2 * x * x - gg * (g2 - p2))) / gg
        if lam < 0.0:
            x = -x
        y = abs(x / math.pi)
        y = 1.0 - y * (y + 2.0 * al)
        if y < -TOL:
            return math.inf, math.inf
        y = 0.0 if y < 0.0 else math.sqrt(y) * (-math.pi if phi < 0.0
                                                else math.pi)
    return R * x, R * y


def test_vandg_matches_scalar_reference():
    fwd = make_transform("+proj=latlong +R=6370997", "+proj=vandg +R=6370997")
    rng = np.random.default_rng(7)
    # includes the conditioned near-central-meridian band: engine and
    # scalar share the op order, so they agree at print precision even
    # where two different-libm BUILDS drift to cm (the sweep bound)
    lon = np.concatenate([rng.uniform(-179, 179, 400),
                          rng.uniform(-1, 1, 400)])
    lat = rng.uniform(-85, 85, 800)
    x, y, _ = fwd(lon.copy(), lat.copy())
    exp = np.array([_vandg_sfwd(a, b) for a, b in zip(lon, lat)])
    assert np.max(np.abs(np.column_stack([x, y]) - exp)) < 1e-6


def _vandg23_sfwd(lon, lat, vdg3):
    TOL = 1e-10
    TWORPI = 0.63661977236758134308
    lam = _adjlon(lon * D2R)
    phi = lat * D2R
    bt = abs(TWORPI * phi)
    ct = 1.0 - bt * bt
    ct = 0.0 if ct < 0.0 else math.sqrt(ct)
    if abs(lam) < TOL:
        x = 0.0
        y = math.pi * (-bt if phi < 0.0 else bt) / (1.0 + ct)
    else:
        at = 0.5 * abs(math.pi / lam - lam / math.pi)
        if vdg3:
            x1 = bt / (1.0 + ct)
            x = math.pi * (math.sqrt(at * at + 1.0 - x1 * x1) - at)
            y = math.pi * x1
        else:
            x1 = (ct * math.sqrt(1.0 + at * at) - at * ct * ct) / \
                (1.0 + at * at * bt * bt)
            x = math.pi * x1
            y = math.pi * math.sqrt(1.0 - x1 * (x1 + 2.0 * at) + TOL)
        if lam < 0.0:
            x = -x
        if phi < 0.0:
            y = -y
    return R * x, R * y


def test_vandg2_vandg3_match_scalar_reference():
    rng = np.random.default_rng(8)
    lon = np.concatenate([rng.uniform(-179, 179, 300),
                          rng.uniform(-1, 1, 300)])
    lat = rng.uniform(-85, 85, 600)
    for name, vdg3 in (("vandg2", False), ("vandg3", True)):
        fwd = make_transform("+proj=latlong +R=6370997",
                             f"+proj={name} +R=6370997")
        x, y, _ = fwd(lon.copy(), lat.copy())
        exp = np.array([_vandg23_sfwd(a, b, vdg3) for a, b in zip(lon, lat)])
        assert np.max(np.abs(np.column_stack([x, y]) - exp)) < 1e-6, name


def test_loxim_matches_scalar_reference():
    EPS = 1e-8
    FORTPI = math.pi / 4
    phi1 = 40 * D2R
    cosphi1 = math.cos(phi1)
    tanphi1 = math.tan(FORTPI + 0.5 * phi1)

    def sfwd(lon, lat):
        lam = _adjlon(lon * D2R)
        phi = lat * D2R
        y = phi - phi1
        if abs(y) < EPS:
            x = lam * cosphi1
        else:
            x = FORTPI + 0.5 * phi
            if abs(x) < EPS or abs(abs(x) - HALFPI) < EPS:
                x = 0.0
            else:
                x = lam * y / math.log(math.tan(x) / tanphi1)
        return R * x, R * y

    fwd = make_transform("+proj=latlong +R=6370997",
                         "+proj=loxim +lat_1=40 +R=6370997")
    rng = np.random.default_rng(9)
    lon = rng.uniform(-179, 179, 400)
    lat = rng.uniform(-85, 85, 400)
    x, y, _ = fwd(lon.copy(), lat.copy())
    exp = np.array([sfwd(a, b) for a, b in zip(lon, lat)])
    assert np.max(np.abs(np.column_stack([x, y]) - exp)) < 1e-5
    # the log(tan/tan1)->0 amplification band around lat_1: 1-ulp libm
    # noise scales to ~5e-5 m between op-identical implementations
    # (the cross-build sweep bound stays at 1e-2 m)
    lat = 40 + rng.uniform(-0.5, 0.5, 400)
    x, y, _ = fwd(lon.copy(), lat.copy())
    exp = np.array([sfwd(a, b) for a, b in zip(lon, lat)])
    assert np.max(np.abs(np.column_stack([x, y]) - exp)) < 1e-2
    # the |phi-phi1| < EPS branch: x = lam*cos(phi1).  phi - phi1 is
    # +-1 ulp here (the engine's phi1 comes through dmstor, the input
    # through DEG_TO_RAD), so y is R*ulp ~ 1e-9 m, not exactly 0.
    lat = np.full(5, 40.0)
    lon5 = np.array([-170.0, -10.0, 0.0, 10.0, 170.0])
    x, y, _ = fwd(lon5.copy(), lat.copy())
    assert np.max(np.abs(y)) < 1e-6
    np.testing.assert_allclose(
        x, [R * _adjlon(v * D2R) * cosphi1 for v in lon5], atol=1e-6)


def test_vandg4_matches_scalar_reference():
    """PJ_vandg4.c s_forward, op for op (incl. the (|lam|-HALFPI)<0
    sign test on RADIANS and the 1/dt pole amplification)."""
    TOL = 1e-10
    TWORPI = 0.63661977236758134308

    def sfwd(lon, lat):
        lam = _adjlon(lon * D2R)
        phi = lat * D2R
        if abs(phi) < TOL:
            x, y = lam, 0.0
        elif abs(lam) < TOL or abs(abs(phi) - HALFPI) < TOL:
            x, y = 0.0, phi
        else:
            bt = abs(TWORPI * phi)
            bt2 = bt * bt
            ct = 0.5 * (bt * (8.0 - bt * (2.0 + bt2)) - 5.0) / \
                (bt2 * (bt - 1.0))
            ct2 = ct * ct
            dt = TWORPI * lam
            dt = dt + 1.0 / dt
            dt = math.sqrt(dt * dt - 4.0)
            if (abs(lam) - HALFPI) < 0.0:
                dt = -dt
            dt2 = dt * dt
            x1 = bt + ct
            x1 *= x1
            t = bt + 3.0 * ct
            ft = x1 * (bt2 + ct2 * dt2 - 1.0) + (1.0 - bt2) * (
                bt2 * (t * t + 4.0 * ct2) +
                ct2 * (12.0 * bt * ct + 4.0 * ct2))
            x1 = (dt * (x1 + ct2 - 1.0) + 2.0 * math.sqrt(ft)) / \
                (4.0 * x1 + dt2)
            x = HALFPI * x1
            y = HALFPI * math.sqrt(1.0 + dt * abs(x1) - x1 * x1)
            if lam < 0.0:
                x = -x
            if phi < 0.0:
                y = -y
        return R * x, R * y

    fwd = make_transform("+proj=latlong +R=6370997",
                         "+proj=vandg4 +R=6370997")
    rng = np.random.default_rng(11)
    lon = np.concatenate([rng.uniform(-179, 179, 300),
                          rng.uniform(-1, 1, 300)])
    lat = rng.uniform(-80, 80, 600)
    x, y, _ = fwd(lon.copy(), lat.copy())
    exp = np.array([sfwd(a, b) for a, b in zip(lon, lat)])
    both = np.isfinite(x) & np.isfinite(exp[:, 0])
    assert (np.isfinite(x) == np.isfinite(exp[:, 0])).all()
    d = np.abs(np.column_stack([x, y])[both] - exp[both])
    assert np.max(d) < 1e-5
