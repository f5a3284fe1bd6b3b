"""Roundtrip + property tests for projection wave 2 (equal-area,
azimuthal, pseudocylindrical families)."""

import numpy as np
import pytest

from proj_ray.transform import make_transform

WGS = "+proj=latlong +datum=WGS84"

# (proj def, lon domain half-width deg, roundtrip atol deg)
CASES = [
    ("+proj=aea +lat_1=29.5 +lat_2=45.5 +lon_0=-96 +datum=WGS84", 170, 1e-9),
    ("+proj=aea +lat_1=29.5 +lat_2=45.5 +ellps=sphere", 170, 1e-9),
    ("+proj=leac +lat_1=45 +datum=WGS84", 170, 1e-9),
    ("+proj=laea +lat_0=52 +lon_0=10 +datum=WGS84", 170, 1e-7),
    ("+proj=laea +lat_0=90 +datum=WGS84", 170, 1e-7),
    ("+proj=laea +lat_0=-90 +datum=WGS84", 170, 1e-7),
    ("+proj=laea +lat_0=0 +ellps=sphere", 170, 1e-9),
    ("+proj=laea +lat_0=40 +ellps=sphere", 170, 1e-9),
    ("+proj=aeqd +lat_0=90 +datum=WGS84", 170, 1e-9),
    ("+proj=aeqd +lat_0=-90 +datum=WGS84", 170, 1e-9),
    ("+proj=aeqd +lat_0=40 +lon_0=-100 +ellps=sphere", 170, 1e-9),
    ("+proj=aeqd +lat_0=40 +lon_0=-100 +datum=WGS84", 170, 1e-6),
    ("+proj=cea +datum=WGS84", 170, 1e-7),
    ("+proj=cea +ellps=sphere +lat_ts=30", 170, 1e-9),
    ("+proj=moll +ellps=sphere", 170, 1e-9),
    ("+proj=wag4 +ellps=sphere", 170, 1e-9),
    ("+proj=wag5 +ellps=sphere", 170, 1e-9),
    ("+proj=sinu +datum=WGS84", 170, 1e-9),
    ("+proj=sinu +ellps=sphere", 170, 1e-9),
    ("+proj=eck6 +ellps=sphere", 170, 1e-9),
    ("+proj=mbtfps +ellps=sphere", 170, 1e-9),
    ("+proj=gn_sinu +m=2 +n=3 +ellps=sphere", 170, 1e-9),
    ("+proj=mill +ellps=sphere", 170, 1e-9),
    # gnom/ortho: valid hemisphere only => narrow domain around center
    ("+proj=gnom +lat_0=40 +ellps=sphere", 35, 1e-9),
    ("+proj=ortho +lat_0=40 +ellps=sphere", 35, 1e-7),
    ("+proj=cass +lat_0=10 +datum=WGS84", 3, 1e-4),  # series: near-CM only
    ("+proj=cass +lat_0=10 +ellps=sphere", 170, 1e-9),
    ("+proj=stere +lat_0=-90 +lat_ts=-71 +datum=WGS84", 170, 1e-9),
    ("+proj=ups +datum=WGS84", 170, 1e-9),
]


@pytest.mark.parametrize("proj,dom,atol", CASES,
                         ids=[c[0].split()[0][6:] + str(i) for i, c in enumerate(CASES)])
def test_roundtrip_wave2(proj, dom, atol):
    rng = np.random.default_rng(11)
    n = 150
    lon0 = 0.0
    for tok in proj.split():
        if tok.startswith("+lon_0="):
            lon0 = float(tok.split("=")[1])
    lon = lon0 + rng.uniform(-dom, dom, n)
    lon = (lon + 180) % 360 - 180
    if "+proj=ups" in proj or "lat_0=90" in proj:
        lat = rng.uniform(60, 89, n)
    elif "lat_0=-90" in proj or "lat_ts=-71" in proj:
        lat = rng.uniform(-89, -60, n)
    elif "gnom" in proj or "ortho" in proj:
        lat = rng.uniform(10, 70, n)
    else:
        lat = rng.uniform(-80, 80, n)
    fwd = make_transform(WGS, proj)
    inv = make_transform(proj, WGS)
    x, y, _ = fwd(lon, lat)
    lo, la, _ = inv(x, y)
    ok = np.isfinite(lo) & np.isfinite(la)
    assert ok.mean() > 0.9, proj
    np.testing.assert_allclose(lo[ok], lon[ok], rtol=0, atol=atol, err_msg=proj)
    np.testing.assert_allclose(la[ok], lat[ok], rtol=0, atol=atol, err_msg=proj)


def test_equal_area_property():
    """aea/laea/cea/moll/sinu preserve area: the Jacobian determinant of
    the normalized (unit-sphere/ellipsoid) map ~ cos(phi) scaled."""
    # numerical check on cea spherical: dy/dphi * dx/dlam == cos(phi)
    t = make_transform(WGS, "+proj=cea +ellps=sphere")
    lat = np.array([10.0, 30.0, 55.0])
    eps = 1e-6
    x1, y1, _ = t(np.zeros(3), lat)
    x2, y2, _ = t(np.zeros(3), lat + eps)
    x3, y3, _ = t(np.full(3, eps), lat)
    R = 6370997.0
    dphi = np.radians(eps)
    dlam = np.radians(eps)
    jac = ((y2 - y1) / (R * dphi)) * ((x3 - x1) / (R * dlam))
    np.testing.assert_allclose(jac, np.cos(np.radians(lat)), rtol=1e-4)


def test_aeqd_polar_distance_property():
    """Polar aeqd: radial distance = meridional arc length (equidistant)."""
    t = make_transform(WGS, "+proj=aeqd +lat_0=90 +datum=WGS84")
    x, y, _ = t(np.array([0.0]), np.array([80.0]))
    from proj_ray.kernels.common import enfn, mlfn, HALFPI

    es = 0.0066943799901413165
    en = enfn(es)
    arc = (mlfn(np.float64(HALFPI), 1.0, 0.0, en)
           - mlfn(np.radians(80.0), np.sin(np.radians(80.0)), np.cos(np.radians(80.0)), en))
    np.testing.assert_allclose(np.hypot(x, y), 6378137.0 * arc, rtol=1e-12)


WAVE3 = [
    ("+proj=sterea +lat_0=52 +lon_0=5 +ellps=bessel", 170, 1e-9),
    ("+proj=eqdc +lat_1=40 +lat_2=60 +datum=WGS84", 170, 1e-9),
    ("+proj=eqdc +lat_1=40 +lat_2=60 +ellps=sphere", 170, 1e-9),
    ("+proj=robin +ellps=sphere", 170, 2e-5),  # table spline: reference-level wiggle
    ("+proj=eck4 +ellps=sphere", 170, 1e-7),
    ("+proj=gall +ellps=sphere", 170, 1e-9),
    ("+proj=hammer +ellps=sphere", 170, 1e-9),
    ("+proj=wink1 +ellps=sphere", 170, 1e-9),
    ("+proj=eck5 +ellps=sphere", 170, 1e-9),
]


@pytest.mark.parametrize("proj,dom,atol", WAVE3,
                         ids=[c[0].split()[0][6:] + "w3" + str(i) for i, c in enumerate(WAVE3)])
def test_roundtrip_wave3(proj, dom, atol):
    rng = np.random.default_rng(21)
    n = 120
    lon = rng.uniform(-dom, dom, n)
    lat = rng.uniform(-80, 80, n)
    fwd = make_transform(WGS, proj)
    inv = make_transform(proj, WGS)
    x, y, _ = fwd(lon, lat)
    lo, la, _ = inv(x, y)
    ok = np.isfinite(lo) & np.isfinite(la)
    assert ok.mean() > 0.9, proj
    np.testing.assert_allclose(lo[ok], lon[ok], rtol=0, atol=atol, err_msg=proj)
    np.testing.assert_allclose(la[ok], lat[ok], rtol=0, atol=atol, err_msg=proj)


def test_robin_reference_golden():
    """tv_out.dist robin rows (float32 coefficient parity)."""
    t = make_transform(WGS, "+proj=robin +datum=WGS84")
    x, y, _ = t(np.array([-30.0, -35.0, 20.0]), np.array([40.0, 45.0, 40.0]))
    np.testing.assert_allclose(np.round(x, 2), [-2612095.95, -2963455.42, 1741397.30])
    np.testing.assert_allclose(np.round(y, 2), [4276351.58, 4805073.65, 4276351.58])


def test_sterea_rd_new_origin():
    """RD New (EPSG:28992-style sterea) maps its origin to the false origin."""
    t = make_transform(WGS, "+proj=sterea +lat_0=52.15616055555555 "
                       "+lon_0=5.38763888888889 +k=0.9999079 +x_0=155000 "
                       "+y_0=463000 +ellps=bessel")
    x, y, _ = t(np.array([5.38763888888889]), np.array([52.15616055555555]))
    np.testing.assert_allclose([x[0], y[0]], [155000.0, 463000.0], atol=1e-6)


WAVE4 = [
    ("+proj=omerc +lat_0=4 +lonc=115 +alpha=53.3 +k_0=0.99984 +datum=WGS84", 30, 1e-7),
    ("+proj=omerc +lat_0=45 +lon_1=-80 +lat_1=40 +lon_2=-60 +lat_2=50 +datum=WGS84", 30, 1e-7),
    ("+proj=omerc +lat_0=4 +lonc=115 +alpha=53.3 +no_off +datum=WGS84", 30, 1e-7),
    ("+proj=omerc +lat_0=4 +lonc=115 +gamma=53.1 +alpha=53.3 +no_rot +datum=WGS84", 30, 1e-7),
    ("+proj=poly +datum=WGS84", 30, 1e-9),
    ("+proj=poly +ellps=sphere", 30, 1e-9),
    # bonne southern lat_1 inverse is broken in the reference era too —
    # only the northern forms are round-trippable
    ("+proj=bonne +lat_1=45 +datum=WGS84", 30, 1e-9),
    ("+proj=bonne +lat_1=45 +ellps=sphere", 30, 1e-9),
    ("+proj=bonne +lat_1=90 +ellps=sphere", 30, 1e-9),
]


@pytest.mark.parametrize("proj,dom,atol", WAVE4,
                         ids=[c[0].split()[0][6:] + "w4" + str(i) for i, c in enumerate(WAVE4)])
def test_roundtrip_wave4(proj, dom, atol):
    rng = np.random.default_rng(31)
    n = 100
    lon = rng.uniform(-dom, dom, n)
    lat = rng.uniform(-60, 60, n)
    fwd = make_transform(WGS, proj)
    inv = make_transform(proj, WGS)
    x, y, _ = fwd(lon, lat)
    lo, la, _ = inv(x, y)
    ok = np.isfinite(lo) & np.isfinite(la)
    assert ok.mean() > 0.9, proj
    np.testing.assert_allclose(lo[ok], lon[ok], rtol=0, atol=atol, err_msg=proj)
    np.testing.assert_allclose(la[ok], lat[ok], rtol=0, atol=atol, err_msg=proj)


def test_omerc_rso_borneo_golden():
    """tv_out.dist RSO Borneo: 116d2'11.12630 5d54'19.90183 ->
    704570.40 653979.68 (ticket 62 regression)."""
    from proj_ray.crs import dmstor
    from proj_ray.kernels.common import RAD_TO_DEG

    rso = ("+proj=omerc +a=6377298.556 +rf=300.8017 +lat_0=4 +lonc=115 "
           "+alpha=53d18'56.9537 +gamma=53d7'48.3685 +k_0=0.99984 "
           "+x_0=590476.87 +y_0=442857.65")
    t = make_transform("+proj=latlong +a=6377298.556 +rf=300.8017", rso)
    lon = np.array([dmstor("116d2'11.12630") * RAD_TO_DEG])
    lat = np.array([dmstor("5d54'19.90183") * RAD_TO_DEG])
    x, y, _ = t(lon, lat)
    np.testing.assert_allclose([round(x[0], 2), round(y[0], 2)],
                               [704570.40, 653979.68])


WAVE5 = [
    ("+proj=krovak +ellps=bessel", None, 1e-9),
    ("+proj=eck1 +ellps=sphere", 170, 1e-9),
    ("+proj=eck2 +ellps=sphere", 170, 1e-9),
    ("+proj=eck3 +ellps=sphere", 170, 1e-9),
    ("+proj=kav7 +ellps=sphere", 170, 1e-9),
    ("+proj=wag6 +ellps=sphere", 170, 1e-9),
    ("+proj=putp1 +ellps=sphere", 170, 1e-9),
    ("+proj=collg +ellps=sphere", 170, 1e-9),
    ("+proj=fouc_s +ellps=sphere", 170, 1e-9),
    ("+proj=fouc_s +n=0.5 +ellps=sphere", 170, 1e-9),
    ("+proj=nell +ellps=sphere", 170, 1e-9),
]


@pytest.mark.parametrize("proj,dom,atol", WAVE5,
                         ids=[c[0].split()[0][6:] + "w5" + str(i) for i, c in enumerate(WAVE5)])
def test_roundtrip_wave5(proj, dom, atol):
    rng = np.random.default_rng(41)
    if "krovak" in proj:
        lon = rng.uniform(12, 19, 80)   # S-JTSK domain
        lat = rng.uniform(48, 51, 80)
    else:
        lon = rng.uniform(-dom, dom, 80)
        lat = rng.uniform(-80, 80, 80)
    fwd = make_transform(WGS, proj)
    inv = make_transform(proj, WGS)
    x, y, _ = fwd(lon, lat)
    lo, la, _ = inv(x, y)
    ok = np.isfinite(lo) & np.isfinite(la)
    assert ok.mean() > 0.9, proj
    np.testing.assert_allclose(lo[ok], lon[ok], rtol=0, atol=atol, err_msg=proj)
    np.testing.assert_allclose(la[ok], lat[ok], rtol=0, atol=atol, err_msg=proj)


def test_krovak_sjtsk_prague():
    """S-JTSK: Prague is ~(-742950, -1042797) in the standard
    negative-axes convention; +czech flips signs."""
    t = make_transform(WGS, "+proj=krovak +ellps=bessel")
    x, y, _ = t(np.array([14.42]), np.array([50.09]))
    assert -744000 < x[0] < -742000 and -1044000 < y[0] < -1042000
    tc = make_transform(WGS, "+proj=krovak +czech +ellps=bessel")
    xc, yc, _ = tc(np.array([14.42]), np.array([50.09]))
    np.testing.assert_allclose([xc[0], yc[0]], [-x[0], -y[0]], rtol=1e-12)


def test_ob_tran_composition():
    """ob_tran wraps any registered projection in an oblique rotation —
    the reference's operator-composition-in-config precedent
    (src/PJ_ob_tran.c:71-145)."""
    rng = np.random.default_rng(51)
    lon = rng.uniform(-170, 170, 80)
    lat = rng.uniform(-75, 75, 80)
    sph = "+proj=latlong +ellps=sphere"
    for proj in [
        "+proj=ob_tran +o_proj=moll +o_lat_p=45 +o_lon_p=-90 +ellps=sphere",
        "+proj=ob_tran +o_proj=mill +o_lon_1=-10 +o_lat_1=30 +o_lon_2=60 +o_lat_2=50 +ellps=sphere",
        "+proj=ob_tran +o_proj=merc +o_alpha=40 +o_lon_c=0 +o_lat_c=30 +ellps=sphere",
        # near-zero pole latitude selects the transverse branch
        "+proj=ob_tran +o_proj=eqc +o_lat_p=0.00000001 +o_lon_p=90 +ellps=sphere",
    ]:
        fwd = make_transform(sph, proj)
        inv = make_transform(proj, sph)
        x, y, _ = fwd(lon, lat)
        lo, la, _ = inv(x, y)
        ok = np.isfinite(lo)
        assert ok.mean() > 0.8, proj
        dl = (lo[ok] - lon[ok] + 180) % 360 - 180
        assert np.abs(dl).max() < 1e-6, proj
        np.testing.assert_allclose(la[ok], lat[ok], atol=1e-6, err_msg=proj)


def test_healpix_reference_goldens():
    """tv_out.dist healpix stanzas: sphere + ellipsoid forward values,
    the quirky -90.10072 inverse, and the dmstor-constant-dependent
    -180/90 pole value (reproduced only through the text-parse path)."""
    from proj_ray.crs import dmstor
    from proj_ray.kernels.common import RAD_TO_DEG

    t = make_transform("+proj=latlong +a=1 +lon_0=0", "+proj=healpix +a=1 +lon_0=0")
    x, y, _ = t(np.array([0.0, -90.0]), np.array([41.81031, 0.0]))
    np.testing.assert_allclose(np.round(x, 5), [0.0, -1.57080])
    np.testing.assert_allclose(np.round(y, 5), [0.78540, 0.0])

    te = make_transform("+proj=latlong +a=1 +lon_0=0 +ellps=WGS84",
                        "+proj=healpix +a=1 +lon_0=0 +ellps=WGS84")
    xe, ye, _ = te(np.array([0.0, -90.0]), np.array([41.937853904844985, 0.0]))
    np.testing.assert_allclose(np.round(xe, 5), [0.0, -1.56904])
    np.testing.assert_allclose(np.round(ye, 5), [0.78452, 0.0])

    ti = make_transform("+proj=healpix +a=1 +lon_0=0 +ellps=WGS84",
                        "+proj=latlong +a=1 +lon_0=0 +ellps=WGS84")
    lo, la, _ = ti(np.array([-1.5707963267948966]), np.array([0.0]))
    np.testing.assert_allclose(round(lo[0], 5), -90.10072)

    t5 = make_transform("+proj=latlong +R=5", "+proj=healpix +R=5")
    lam_text = dmstor("-180") * RAD_TO_DEG
    xp, yp, _ = t5(np.array([lam_text]), np.array([90.0]))
    np.testing.assert_allclose([round(xp[0], 5), round(yp[0], 5)],
                               [-19.63495, 7.85398])


def test_healpix_rhealpix_roundtrips():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-179, 179, 200)
    lat = rng.uniform(-89, 89, 200)
    for proj, base in [
        ("+proj=healpix +ellps=sphere", "+proj=latlong +ellps=sphere"),
        ("+proj=healpix +datum=WGS84", WGS),
        ("+proj=rhealpix +north_square=1 +south_square=2 +ellps=sphere",
         "+proj=latlong +ellps=sphere"),
        ("+proj=rhealpix +north_square=0 +south_square=0 +datum=WGS84", WGS),
    ]:
        fwd = make_transform(base, proj)
        inv = make_transform(proj, base)
        x, y, _ = fwd(lon, lat)
        lo, la, _ = inv(x, y)
        ok = np.isfinite(lo)
        assert ok.mean() > 0.97, proj
        atol = 1e-7 if "WGS84" in proj else 1e-9
        np.testing.assert_allclose(lo[ok], lon[ok], atol=atol, err_msg=proj)
        np.testing.assert_allclose(la[ok], lat[ok], atol=atol, err_msg=proj)


def test_default_ellps_suppression():
    """+a alone means a sphere: the general ellps=WGS84 default is
    suppressed when earth-model params are present (pj_init.c:188-201)."""
    from proj_ray.crs import CRS

    assert CRS("+proj=merc +a=1").es == 0.0
    assert CRS("+proj=merc +a=6378137 +rf=298.257223563").es != 0.0
    assert CRS("+proj=merc").es != 0.0  # default WGS84 ellipsoid applies


WAVE7_RT = [
    "+proj=kav5", "+proj=qua_aut", "+proj=mbt_s", "+proj=fouc", "+proj=vandg",
    "+proj=aitoff", "+proj=wintri", "+proj=wag2", "+proj=wag3 +lat_ts=30",
    "+proj=crast", "+proj=fahey", "+proj=hatano", "+proj=loxim +lat_1=40",
    "+proj=nell_h", "+proj=mbt_fps", "+proj=mbtfpp", "+proj=mbtfpq",
    "+proj=natearth", "+proj=urmfps +n=0.9", "+proj=wag1", "+proj=tcea +lat_0=0",
]
WAVE7_FWD_ONLY = [
    "+proj=boggs", "+proj=august", "+proj=denoy", "+proj=gins8",
    "+proj=larr", "+proj=lask", "+proj=tcc",
    "+proj=urm5 +n=0.8 +q=0.3 +alpha=20", "+proj=wink2",
]


@pytest.mark.parametrize("proj", WAVE7_RT,
                         ids=[p.split()[0][6:] for p in WAVE7_RT])
def test_roundtrip_wave7(proj):
    sph = "+proj=latlong +ellps=sphere"
    rng = np.random.default_rng(12)
    lon = rng.uniform(-170, 170, 100)
    lat = rng.uniform(-80, 80, 100)
    full = proj + " +ellps=sphere"
    fwd = make_transform(sph, full)
    inv = make_transform(full, sph)
    x, y, _ = fwd(lon, lat)
    lo, la, _ = inv(x, y)
    ok = np.isfinite(lo)
    assert ok.mean() > 0.9, proj
    tol = 1e-5 if proj.split()[0][6:] in ("vandg", "aitoff", "wintri") else 1e-7
    np.testing.assert_allclose(lo[ok], lon[ok], atol=tol, err_msg=proj)
    np.testing.assert_allclose(la[ok], lat[ok], atol=tol, err_msg=proj)


@pytest.mark.parametrize("proj", WAVE7_FWD_ONLY,
                         ids=[p.split()[0][6:] for p in WAVE7_FWD_ONLY])
def test_forward_only_wave7(proj):
    """fwd-only heads (the reference has inv=0 too): finite forward,
    inf-sentinel inverse."""
    sph = "+proj=latlong +ellps=sphere"
    fwd = make_transform(sph, proj + " +ellps=sphere")
    x, y, _ = fwd(np.array([30.0]), np.array([40.0]))
    assert np.isfinite(x[0]) and np.isfinite(y[0])
    inv = make_transform(proj + " +ellps=sphere", sph)
    lo, la, _ = inv(x, y)
    assert np.isinf(lo[0]) and np.isinf(la[0])


def test_kav5_reference_golden():
    """tv_out.dist sts stanza: kav5 (4.897, 52.371) -> 383646.09 5997047.89."""
    t = make_transform("+proj=latlong +ellps=WGS84", "+proj=kav5 +ellps=WGS84 +units=m")
    x, y, _ = t(np.array([4.897]), np.array([52.371]))
    np.testing.assert_allclose([round(x[0], 2), round(y[0], 2)],
                               [383646.09, 5997047.89])


def test_wave8_geos_tpeqd_nzmg():
    sph = "+proj=latlong +ellps=sphere"
    rng = np.random.default_rng(14)
    # geos: visible disc roundtrip (sph + ell, both sweep axes)
    for proj, base in [("+proj=geos +h=35785831 +datum=WGS84", WGS),
                       ("+proj=geos +h=35785831 +sweep=x +ellps=sphere", sph)]:
        lon = rng.uniform(-55, 55, 80)
        lat = rng.uniform(-55, 55, 80)
        fwd = make_transform(base, proj)
        inv = make_transform(proj, base)
        x, y, _ = fwd(lon, lat)
        lo, la, _ = inv(x, y)
        ok = np.isfinite(lo)
        assert ok.mean() > 0.8
        np.testing.assert_allclose(lo[ok], lon[ok], atol=1e-9, err_msg=proj)
        np.testing.assert_allclose(la[ok], lat[ok], atol=1e-9, err_msg=proj)
    # tpeqd
    lon = rng.uniform(-170, 170, 80)
    lat = rng.uniform(-80, 80, 80)
    proj = "+proj=tpeqd +lat_1=30 +lon_1=-10 +lat_2=50 +lon_2=20 +ellps=sphere"
    fwd = make_transform(sph, proj)
    inv = make_transform(proj, sph)
    x, y, _ = fwd(lon, lat)
    lo, la, _ = inv(x, y)
    ok = np.isfinite(lo)
    np.testing.assert_allclose(lo[ok], lon[ok], atol=1e-9)
    np.testing.assert_allclose(la[ok], lat[ok], atol=1e-9)
    # nzmg: the fixed origin maps to the false origin, NZ-domain roundtrip
    t = make_transform("+proj=latlong +ellps=intl", "+proj=nzmg")
    ti = make_transform("+proj=nzmg", "+proj=latlong +ellps=intl")
    x, y, _ = t(np.array([173.0]), np.array([-41.0]))
    np.testing.assert_allclose([x[0], y[0]], [2510000.0, 6023150.0], atol=1e-5)
    lon = rng.uniform(166, 179, 50)
    lat = rng.uniform(-47, -34, 50)
    x, y, _ = t(lon, lat)
    lo, la, _ = ti(x, y)
    np.testing.assert_allclose(lo, lon, atol=1e-8)
    np.testing.assert_allclose(la, lat, atol=1e-8)


WAVE9_RT = [
    ("+proj=cc", 170),
    ("+proj=nsper +h=5000000 +lat_0=40", 35),
    ("+proj=tpers +h=5000000 +lat_0=40 +tilt=10 +azi=30", 35),
    ("+proj=oea +m=1.5 +n=2 +lat_0=40 +theta=20", 80),  # <120 deg from center
    ("+proj=putp2", 170), ("+proj=putp3", 170), ("+proj=putp3p", 170),
    ("+proj=putp4p", 170), ("+proj=weren", 170), ("+proj=putp5", 170),
    ("+proj=putp5p", 170), ("+proj=putp6", 170), ("+proj=putp6p", 170),
]
WAVE9_FWD = ["+proj=lagrng +W=2 +lat_1=0", "+proj=wag7", "+proj=vandg2",
             "+proj=vandg3", "+proj=vandg4", "+proj=apian", "+proj=ortel",
             "+proj=bacon"]


@pytest.mark.parametrize("proj,dom", WAVE9_RT,
                         ids=[p[0].split()[0][6:] for p in WAVE9_RT])
def test_roundtrip_wave9(proj, dom):
    sph = "+proj=latlong +ellps=sphere"
    rng = np.random.default_rng(19)
    lon = rng.uniform(-dom, dom, 100)
    if "nsper" in proj or "tpers" in proj or "oea" in proj:
        lat = rng.uniform(10, 70, 100)
    else:
        lat = rng.uniform(-80, 80, 100)
    full = proj + " +ellps=sphere"
    fwd = make_transform(sph, full)
    inv = make_transform(full, sph)
    x, y, _ = fwd(lon, lat)
    lo, la, _ = inv(x, y)
    ok = np.isfinite(lo)
    assert ok.mean() > 0.7, proj
    np.testing.assert_allclose(lo[ok], lon[ok], atol=1e-6, err_msg=proj)
    np.testing.assert_allclose(la[ok], lat[ok], atol=1e-6, err_msg=proj)


@pytest.mark.parametrize("proj", WAVE9_FWD, ids=[p.split()[0][6:] for p in WAVE9_FWD])
def test_forward_only_wave9(proj):
    fwd = make_transform("+proj=latlong +ellps=sphere", proj + " +ellps=sphere")
    x, y, _ = fwd(np.array([30.0, -100.0]), np.array([40.0, -20.0]))
    assert np.isfinite(x).all() and np.isfinite(y).all()


def test_wave10_conics_somerc_goode_ocea():
    sph = "+proj=latlong +ellps=sphere"
    rng = np.random.default_rng(23)
    lon = rng.uniform(-170, 170, 100)
    lat_n = rng.uniform(5, 80, 100)
    lat_all = rng.uniform(-80, 80, 100)
    for proj in ["+proj=euler +lat_1=30 +lat_2=60", "+proj=murd1 +lat_1=30 +lat_2=60",
                 "+proj=murd2 +lat_1=30 +lat_2=60", "+proj=murd3 +lat_1=30 +lat_2=60",
                 "+proj=pconic +lat_1=30 +lat_2=60 +lat_0=45",
                 "+proj=tissot +lat_1=30 +lat_2=60", "+proj=vitk1 +lat_1=30 +lat_2=60",
                 "+proj=ocea +lat_1=30 +lon_1=-10 +lat_2=50 +lon_2=20", "+proj=goode"]:
        full = proj + " +ellps=sphere"
        fwd = make_transform(sph, full)
        inv = make_transform(full, sph)
        la = lat_all if ("ocea" in proj or "goode" in proj) else lat_n
        x, y, _ = fwd(lon, la)
        lo, lb, _ = inv(x, y)
        ok = np.isfinite(lo)
        assert ok.mean() > 0.9, proj
        np.testing.assert_allclose(lo[ok], lon[ok], atol=1e-6, err_msg=proj)
        np.testing.assert_allclose(lb[ok], la[ok], atol=1e-6, err_msg=proj)


def test_somerc_ch1903_bern():
    """CH1903: the Bern origin maps to the (600000, 200000) false origin."""
    defn = ("+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333 "
            "+k_0=1 +x_0=600000 +y_0=200000 +ellps=bessel")
    t = make_transform("+proj=latlong +ellps=bessel", defn)
    x, y, _ = t(np.array([7.439583333333333]), np.array([46.95240555555556]))
    np.testing.assert_allclose([x[0], y[0]], [600000.0, 200000.0], atol=1e-6)
    ti = make_transform(defn, "+proj=latlong +ellps=bessel")
    lo, la, _ = ti(np.array([642617.53]), np.array([205442.81]))
    np.testing.assert_allclose([lo[0], la[0]], [8.0, 47.0], atol=1e-6)


def test_mod_ster_family():
    """Modified stereographics (Snyder & Linck complex polynomials).
    Note: gs48's center is -39 deg in this reference snapshot (a
    historical sign bug, replicated) so its domain is mirrored."""
    rng = np.random.default_rng(29)
    cases = [
        ("+proj=mil_os", "sphere", (0, 40, 0, 40)),
        ("+proj=lee_os", "sphere", (-175, -155, -30, 10)),
        ("+proj=gs48 +ellps=sphere", "sphere", (-110, -80, -50, -25)),
        ("+proj=alsk +ellps=clrk66", "clrk66", (-165, -140, 55, 70)),
        ("+proj=alsk +ellps=sphere", "sphere", (-165, -140, 55, 70)),
        ("+proj=gs50 +ellps=clrk66", "clrk66", (-160, -100, 30, 60)),
        ("+proj=gs50 +ellps=sphere", "sphere", (-160, -100, 30, 60)),
    ]
    for proj, ell, (lo1, lo2, la1, la2) in cases:
        base = f"+proj=latlong +ellps={ell}"
        fwd = make_transform(base, proj)
        inv = make_transform(proj, base)
        lon = rng.uniform(lo1, lo2, 60)
        lat = rng.uniform(la1, la2, 60)
        x, y, _ = fwd(lon, lat)
        lo, la, _ = inv(x, y)
        ok = np.isfinite(lo)
        assert ok.mean() > 0.9, proj
        np.testing.assert_allclose(lo[ok], lon[ok], atol=1e-7, err_msg=proj)
        np.testing.assert_allclose(la[ok], lat[ok], atol=1e-7, err_msg=proj)


def test_wave11_igh_lcca_gstmerc_fwdonly():
    sph = "+proj=latlong +ellps=sphere"
    rng = np.random.default_rng(33)
    # igh: 12-lobe interrupted homolosine, global roundtrip
    lon = rng.uniform(-179, 179, 200)
    lat = rng.uniform(-85, 85, 200)
    fwd = make_transform(sph, "+proj=igh +ellps=sphere")
    inv = make_transform("+proj=igh +ellps=sphere", sph)
    x, y, _ = fwd(lon, lat)
    lo, la, _ = inv(x, y)
    ok = np.isfinite(lo)
    assert ok.mean() > 0.98
    np.testing.assert_allclose(lo[ok], lon[ok], atol=1e-9)
    np.testing.assert_allclose(la[ok], lat[ok], atol=1e-9)
    # lcca / gstmerc
    for proj, base, lo0, (la1, la2) in [
        ("+proj=lcca +lat_0=46 +datum=WGS84", WGS, 0.0, (30, 60)),
        ("+proj=gstmerc +lat_0=-21.11 +lon_0=55.53 +k_0=1 +ellps=intl",
         "+proj=latlong +ellps=intl", 55.53, (-40, 0)),
    ]:
        f2 = make_transform(base, proj)
        i2 = make_transform(proj, base)
        lon2 = rng.uniform(-20, 20, 80) + lo0
        lat2 = rng.uniform(la1, la2, 80)
        x, y, _ = f2(lon2, lat2)
        b1, b2, _ = i2(x, y)
        ok = np.isfinite(b1)
        assert ok.mean() > 0.9, proj
        np.testing.assert_allclose(b1[ok], lon2[ok], atol=1e-7, err_msg=proj)
        np.testing.assert_allclose(b2[ok], lat2[ok], atol=1e-7, err_msg=proj)
    # fwd-only heads produce finite output
    for proj in ["+proj=airy +lat_0=40", "+proj=airy +lat_0=90 +lat_b=60",
                 "+proj=rpoly +lat_ts=30", "+proj=rpoly", "+proj=nicol"]:
        f3 = make_transform(sph, proj + " +ellps=sphere")
        x, y, _ = f3(np.array([30.0, -60.0, 0.1]), np.array([40.0, 20.0, 0.1]))
        assert np.isfinite(x).all() and np.isfinite(y).all(), proj


def test_wave12_qsc_calcofi():
    rng = np.random.default_rng(37)
    # qsc: every cube face, sphere + ellipsoid
    for proj, lon_c, lat_c in [("+proj=qsc +lon_0=0 +lat_0=0", 0, 0),
                               ("+proj=qsc +lon_0=90 +lat_0=0", 90, 0),
                               ("+proj=qsc +lon_0=180 +lat_0=0", 180, 0),
                               ("+proj=qsc +lon_0=-90 +lat_0=0", -90, 0),
                               ("+proj=qsc +lat_0=90", 0, 90),
                               ("+proj=qsc +lat_0=-90", 0, -90)]:
        for ell in ("+ellps=sphere", "+ellps=WGS84"):
            base = "+proj=latlong " + ell
            full = proj + " " + ell
            fwd = make_transform(base, full)
            inv = make_transform(full, base)
            if lat_c == 0:
                lon = (lon_c + rng.uniform(-40, 40, 60) + 180) % 360 - 180
                lat = rng.uniform(-40, 40, 60)
            else:
                lon = rng.uniform(-179, 179, 60)
                lat = lat_c + rng.uniform(-40, -5, 60) * (1 if lat_c > 0 else -1)
            x, y, _ = fwd(lon, lat)
            b1, b2, _ = inv(x, y)
            ok = np.isfinite(b1)
            assert ok.mean() > 0.9, full
            dl = (b1[ok] - lon[ok] + 180) % 360 - 180
            assert np.abs(dl).max() < 1e-7, full
            np.testing.assert_allclose(b2[ok], lat[ok], atol=1e-7, err_msg=full)
    # calcofi line/station roundtrip
    for ell in ("+ellps=clrk66", "+ellps=sphere"):
        f2 = make_transform("+proj=latlong " + ell, "+proj=calcofi " + ell)
        i2 = make_transform("+proj=calcofi " + ell, "+proj=latlong " + ell)
        lon = rng.uniform(-130, -110, 50)
        lat = rng.uniform(25, 40, 50)
        x, y, _ = f2(lon, lat)
        b1, b2, _ = i2(x, y)
        np.testing.assert_allclose(b1, lon, atol=1e-6)
        np.testing.assert_allclose(b2, lat, atol=1e-6)


def test_bipc_matches_scalar_reference():
    """bipc vs a scalar transliteration of the reference C (PJ_bipc.c):
    bit-level parity including the domain errors and the known
    inter-cone-seam roundtrip quirk (present in the reference too)."""
    import math

    lamB = -0.34894976726250681539
    n = 0.63055844881274687180
    F = 1.89724742567461030582
    Azab, Azba = 0.81650043674686363166, 1.82261843856185925133
    T, rhoc = 1.27246578267089012270, 1.20709121521568721927
    C45, S45 = 0.70710678118654752469, 0.70710678118654752410
    C20, S20 = 0.93969262078590838411, -0.34202014332566873287
    R110, R104 = 1.91986217719376253360, 1.81514242207410275904

    def sfwd(lam, phi):
        cphi, sphi = math.cos(phi), math.sin(phi)
        sd = lamB - lam
        cdlam, sdlam = math.cos(sd), math.sin(sd)
        tphi = sphi / cphi
        Az = math.atan2(sdlam, C45 * (tphi - cdlam))
        tag = Az > Azba
        if tag:
            sd = lam + R110
            cdlam, sdlam = math.cos(sd), math.sin(sd)
            z = S20 * sphi + C20 * cphi * cdlam
            if abs(z) > 1.000000001:
                return math.inf, math.inf
            z = math.acos(max(-1, min(1, z)))
            Az = math.atan2(sdlam, C20 * tphi - S20 * cdlam)
            Av, y = Azab, rhoc
        else:
            z = S45 * (sphi + cphi * cdlam)
            if abs(z) > 1.000000001:
                return math.inf, math.inf
            z = math.acos(max(-1, min(1, z)))
            Av, y = Azba, -rhoc
        if z < 0:
            return math.inf, math.inf
        t = math.tan(0.5 * z) ** n
        r = F * t
        al = 0.5 * (R104 - z)
        if al < 0:
            return math.inf, math.inf
        al = (t + al ** n) / T
        if abs(al) > 1.000000001:
            return math.inf, math.inf
        al = math.acos(max(-1, min(1, al)))
        t = n * (Av - Az)
        if abs(t) < al:
            r /= math.cos(al + (t if tag else -t))
        return r * math.sin(t), y + (-r if tag else r) * math.cos(t)

    R = 6370997.0
    fwd = make_transform("+proj=latlong +ellps=sphere", "+proj=bipc +ellps=sphere")
    rng = np.random.default_rng(41)
    lon = rng.uniform(-170, -30, 300)
    lat = rng.uniform(-55, 70, 300)
    x, y, _ = fwd(lon, lat)
    d2r = 0.0174532925199432958
    exp = np.array([sfwd(lo * d2r, la * d2r) for lo, la in zip(lon, lat)])
    ex, ey = exp[:, 0] * R, exp[:, 1] * R
    both_inf = ~np.isfinite(x) & ~np.isfinite(ex)
    with np.errstate(invalid="ignore"):
        match = both_inf | ((np.abs(x - ex) < 1e-6) & (np.abs(y - ey) < 1e-6))
    assert match.all()


def test_wave14_chamb_labrd():
    sph = "+proj=latlong +ellps=sphere"
    # chamb: control points land on their fixed plane positions,
    # symmetric for the symmetric control triangle
    ch = ("+proj=chamb +lat_1=22 +lon_1=0 +lat_2=22 +lon_2=45 "
          "+lat_3=-22 +lon_3=22.5 +ellps=sphere")
    fwd = make_transform(sph, ch)
    x, y, _ = fwd(np.array([0.0, 45.0, 10.0]), np.array([22.0, 22.0, 20.0]))
    np.testing.assert_allclose(x[0], -x[1], rtol=1e-12)  # symmetric ctl pts
    np.testing.assert_allclose(y[0], y[1], rtol=1e-12)
    assert np.isfinite(x[2]) and np.isfinite(y[2])
    # labrd (Madagascar): origin -> false origin; regional roundtrip to
    # the reference's truncated-series precision
    lb = ("+proj=labrd +lat_0=-18.9 +lon_0=46.437229166666666 +azi=18.9 "
          "+k_0=0.9995 +x_0=400000 +y_0=800000 +ellps=intl")
    f2 = make_transform("+proj=latlong +ellps=intl", lb)
    i2 = make_transform(lb, "+proj=latlong +ellps=intl")
    x, y, _ = f2(np.array([46.437229166666666]), np.array([-18.9]))
    np.testing.assert_allclose([x[0], y[0]], [400000.0, 800000.0], atol=1e-5)
    rng = np.random.default_rng(43)
    lon = rng.uniform(43, 50, 60)
    lat = rng.uniform(-26, -12, 60)
    x, y, _ = f2(lon, lat)
    b1, b2, _ = i2(x, y)
    np.testing.assert_allclose(b1, lon, atol=1e-6)
    np.testing.assert_allclose(b2, lat, atol=1e-6)


def test_lsat_som_roundtrip():
    """Space Oblique Mercator for LANDSAT: roundtrip at the reference's
    iteration tolerance (TOL 1e-7) over the path-22 swath."""
    wgs = "+proj=latlong +ellps=clrk66"
    ls = "+proj=lsat +lsat=2 +path=22 +ellps=clrk66"
    fwd = make_transform(wgs, ls)
    inv = make_transform(ls, wgs)
    rng = np.random.default_rng(47)
    lon = rng.uniform(-115, -70, 100)
    lat = rng.uniform(25, 48, 100)
    x, y, _ = fwd(lon, lat)
    b1, b2, _ = inv(x, y)
    ok = np.isfinite(b1)
    assert ok.mean() > 0.95
    np.testing.assert_allclose(b1[ok], lon[ok], atol=1e-5)
    np.testing.assert_allclose(b2[ok], lat[ok], atol=1e-5)


def test_imw_p_roundtrip():
    """IMW modified polyconic: iterative 2-D inverse at the reference's
    1e-10 plane tolerance."""
    wgs = "+proj=latlong +ellps=intl"
    iw = "+proj=imw_p +lat_1=30 +lat_2=40 +lon_0=10 +ellps=intl"
    fwd = make_transform(wgs, iw)
    inv = make_transform(iw, wgs)
    rng = np.random.default_rng(53)
    lon = rng.uniform(4, 16, 80)
    lat = rng.uniform(28, 42, 80)
    x, y, _ = fwd(lon, lat)
    b1, b2, _ = inv(x, y)
    ok = np.isfinite(b1)
    assert ok.mean() > 0.95
    np.testing.assert_allclose(b1[ok], lon[ok], atol=1e-8)
    np.testing.assert_allclose(b2[ok], lat[ok], atol=1e-8)


def test_reference_init_inconsistencies_pinned():
    """Faithful reference quirks (values from the built 4.9.1 binary):
    entry-time a/es overrides leave pj_init's ra stale (krovak,
    mod_ster invert through the USER-ellipse ra), sphere-mode
    mod_ster keeps the user's e in the chi computation, and aeqd
    +guam uses the Guam elliptical series."""
    import numpy as np

    from proj_ray.crs import CRS
    from proj_ray.kernels.projections import generic_fwd, generic_inv

    D2R = np.pi / 180.0
    # krovak -I +ellps=WGS84: stale ra = 1/6378137 while a = Bessel
    P = CRS("+proj=krovak +ellps=WGS84")
    lam, phi = generic_inv(P, np.array([500000.0]), np.array([1000000.0]))
    np.testing.assert_allclose([lam[0] / D2R, phi[0] / D2R],
                               [35.532096288, 68.491102299], atol=2e-8)
    # gs48 fwd +ellps=WGS84: es zeroed but e kept -> conformal chi
    P = CRS("+proj=gs48 +ellps=WGS84")
    x, y = generic_fwd(P, np.array([-100.0 * D2R]), np.array([40.0 * D2R]))
    np.testing.assert_allclose([x[0], y[0]],
                               [-2368594.605416, 17368986.383100], atol=2e-3)
    # aeqd +guam elliptical series (binary: 135.271583843 -272.847717596)
    P = CRS("+proj=aeqd +guam +lat_0=13.4724663527 +lon_0=144.7487507055"
            " +ellps=clrk66")
    x, y = generic_fwd(P, np.array([144.75 * D2R]), np.array([13.47 * D2R]))
    np.testing.assert_allclose([x[0], y[0]],
                               [135.271583843, -272.847717596], atol=2e-6)
