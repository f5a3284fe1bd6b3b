"""Golden-corpus conformance tests: transcribed from the reference's
shell+diff harness (nad/testvarious -> nad/tv_out.dist). Tolerances come
from the goldens' printed precision: DMS seconds at 3 decimals
(~2.8e-7 deg) and projected meters at 2 decimals.
"""

import numpy as np
import pytest

from proj_ray.crs import CRS, dmstor
from proj_ray.transform import make_transform


def dms(d, m=0.0, s=0.0, sign=1):
    return sign * (d + m / 60.0 + s / 3600.0)


# (src, dst, [(in_x, in_y, in_z, exp_x, exp_y, exp_z)], tol_xy, tol_z)
GOLDEN = [
    # tv_out.dist:10-11 — 3-param to 3-param on same ellipsoid
    ("+proj=latlong +ellps=bessel +towgs84=5,0,0",
     "+proj=latlong +ellps=bessel +towgs84=1,0,0",
     [(0.0, 0.0, 0.0, 0.0, 0.0, 4.0),
      (-79.0, 45.0, 0.0, dms(78, 59, 59.821, -1), dms(44, 59, 59.983), 0.540)],
     1e-6, 5e-4),
    # tv_out.dist:14-15 — towgs84 to raw ellps => datum step skipped
    ("+proj=latlong +ellps=bessel +towgs84=5,0,0",
     "+proj=latlong +ellps=bessel",
     [(0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      (-79.0, 45.0, 0.0, -79.0, 45.0, 0.0)],
     1e-9, 1e-9),
    # tv_out.dist:18-19 — prime meridian
    ("+proj=latlong +datum=WGS84 +pm=greenwich",
     "+proj=latlong +datum=WGS84 +pm=1",
     [(0.0, 0.0, 0.0, -1.0, 0.0, 0.0),
      (-79.0, 45.0, 0.0, -80.0, 45.0, 0.0)],
     1e-9, 1e-9),
    # tv_out.dist:21-28 — lon_wrap=180
    ("+proj=latlong +datum=WGS84",
     "+proj=latlong +datum=WGS84 +lon_wrap=180",
     [(-1.0, 10.0, 0.0, 359.0, 10.0, 0.0),
      (0.0, 10.0, 0.0, 360.0, 10.0, 0.0),
      (1.0, 45.0, 0.0, 1.0, 45.0, 0.0),
      (179.0, 45.0, 0.0, 179.0, 45.0, 0.0),
      (181.0, 45.0, 0.0, 181.0, 45.0, 0.0),
      (350.0, 45.0, 0.0, 350.0, 45.0, 0.0),
      (370.0, 45.0, 0.0, 10.0, 45.0, 0.0)],
     1e-9, 1e-9),
    # tv_out.dist:31 — pm inside a projection (utm zone 11, pm=3 -> pm=1w)
    ("+proj=utm +zone=11 +datum=WGS84 +pm=3",
     "+proj=latlong +datum=WGS84 +pm=1w",
     [(500000.0, 3000000.0, 0.0, -113.0, dms(27, 7, 20.891), 0.0)],
     1e-6, 5e-4),
    # tv_out.dist:34-37 — geocentric generation
    ("+proj=latlong +datum=WGS84",
     "+proj=geocent +datum=WGS84",
     [(-79.0, 45.0, 0.0, 861996.98, -4434590.01, 4487348.41),
      (dms(0, 0, 0.001, -1), dms(0, 0, 0.001), 10.0, 6378147.00, -0.03, 0.03)],
     0.011, 0.011),
    # tv_out.dist:40-43 — geocentric consumption
    ("+proj=geocent +datum=WGS84",
     "+proj=latlong +datum=WGS84",
     [(861996.98, -4434590.01, 4487348.41, -79.0, 45.0, 0.001)],
     1e-6, 2e-3),
    # tv_out.dist:46 — stere polar with lat_ts
    ("+proj=latlong +datum=WGS84",
     "+proj=stere +lat_0=90 +lon_0=0 +lat_ts=70 +datum=WGS84",
     [(105.0, 40.0, 0.0, 5577808.93, 1494569.40, 0.0)],
     0.011, 1e-3),
    # tv_out.dist:49 — stere oblique without lat_ts
    ("+proj=latlong +datum=WGS84",
     "+proj=stere +lat_0=40 +lon_0=10 +datum=WGS84",
     [(20.0, 45.0, 0.0, 789468.08, 602385.33, 0.0)],
     0.011, 1e-3),
    # tv_out.dist:60-64 — etmerc forward (file runs etmerc->latlong)
    ("+proj=etmerc +k=0.998 +lon_0=-20 +datum=WGS84 +x_0=10000 +y_0=20000",
     "+proj=latlong +datum=WGS84",
     [(10000.0, 20000.0, 0.0, -20.0, 0.0, 0.0),
      (500000.0, 2000000.0, 0.0, dms(15, 22, 16.108, -1), dms(17, 52, 53.478), 0.0),
      (1000000.0, 2000000.0, 0.0, dms(10, 40, 55.532, -1), dms(17, 42, 48.526), 0.0),
      (2000000.0, 2000000.0, 0.0, dms(1, 32, 21.33, -1), dms(17, 3, 47.233), 0.0),
      (4000000.0, 2000000.0, 0.0, dms(15, 4, 42.357), dms(14, 48, 56.372), 0.0)],
     1e-6, 1e-6),
    # tv_out.dist:67-71 — etmerc inverse
    ("+proj=latlong +datum=WGS84",
     "+proj=etmerc +k=0.998 +lon_0=-20 +datum=WGS84 +x_0=10000 +y_0=20000",
     [(0.0, 0.0, 0.0, 2278817.00, 20000.00, 0.0),
      (dms(15, 22, 16.108, -1), dms(17, 52, 53.478), 0.0, 499999.99, 2000000.01, 0.0),
      (dms(1, 32, 21.33, -1), dms(17, 3, 47.233), 0.0, 2000000.00, 1999999.99, 0.0)],
     0.011, 1e-3),
    # tv_out.dist:74-78 — tmerc (series) forward
    ("+proj=tmerc +k=0.998 +lon_0=-20 +datum=WGS84 +x_0=10000 +y_0=20000",
     "+proj=latlong +datum=WGS84",
     [(10000.0, 20000.0, 0.0, -20.0, 0.0, 0.0),
      (500000.0, 2000000.0, 0.0, dms(15, 22, 16.108, -1), dms(17, 52, 53.478), 0.0),
      (2000000.0, 2000000.0, 0.0, dms(1, 32, 21.399, -1), dms(17, 3, 47.244), 0.0),
      (4000000.0, 2000000.0, 0.0, dms(15, 4, 6.539), dms(14, 49, 7.331), 0.0)],
     1e-6, 1e-6),
    # tv_out.dist:81-85 — tmerc inverse
    ("+proj=latlong +datum=WGS84",
     "+proj=tmerc +k=0.998 +lon_0=-20 +datum=WGS84 +x_0=10000 +y_0=20000",
     [(0.0, 0.0, 0.0, 2278812.96, 20000.00, 0.0),
      (dms(15, 22, 16.108, -1), dms(17, 52, 53.478), 0.0, 499999.99, 2000000.01, 0.0)],
     0.011, 1e-3),
]


@pytest.mark.parametrize("case", GOLDEN, ids=[f"g{i}" for i in range(len(GOLDEN))])
def test_golden_case(case):
    src, dst, rows, tol_xy, tol_z = case
    t = make_transform(src, dst)
    xs = np.array([r[0] for r in rows])
    ys = np.array([r[1] for r in rows])
    zs = np.array([r[2] for r in rows])
    ox, oy, oz = t(xs, ys, zs)
    for i, r in enumerate(rows):
        assert abs(ox[i] - r[3]) <= tol_xy, (r, ox[i], oy[i], oz[i])
        assert abs(oy[i] - r[4]) <= tol_xy, (r, ox[i], oy[i], oz[i])
        assert abs(oz[i] - r[5]) <= tol_z, (r, ox[i], oy[i], oz[i])


def test_webmercator_epsg3857():
    """EPSG:3857 (= spherical merc +a=+b=6378137, nad/epsg:4624): the
    well-known closed form R*radians(lon)."""
    t = make_transform("+init=epsg:4326", "+init=epsg:3857")
    lon = np.array([0.0, -122.3321, 180.0, 2.2945])
    lat = np.array([0.0, 47.6062, 0.0, 48.8584])
    x, y, _ = t(lon, lat)
    R = 6378137.0
    np.testing.assert_allclose(x, R * np.radians(lon), rtol=0, atol=1e-6)
    np.testing.assert_allclose(
        y, R * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2)), rtol=0, atol=1e-6)


def test_roundtrips():
    """fwd o inv ~ id for each projection family (cs2cs round-trip usage)."""
    rng = np.random.default_rng(42)
    lon = rng.uniform(-170, 170, 200)
    lat = rng.uniform(-80, 80, 200)
    wgs = "+proj=latlong +datum=WGS84"
    for proj in [
        "+proj=merc +datum=WGS84",
        "+init=epsg:3857",
        "+proj=tmerc +lon_0=0 +datum=WGS84",
        "+proj=etmerc +lon_0=0 +datum=WGS84",
        "+proj=lcc +lat_1=33 +lat_2=45 +lon_0=-100 +datum=WGS84",
        "+proj=stere +lat_0=90 +lat_ts=70 +datum=WGS84",
        "+proj=eqc +datum=WGS84",
        "+proj=geocent +datum=WGS84",
    ]:
        fwd = make_transform(wgs, proj)
        inv = make_transform(proj, wgs)
        if "+proj=tmerc" in proj:
            m = np.abs(lon) < 10  # Snyder-series accuracy domain
        elif "etmerc" in proj:
            m = np.abs(lon) < 60
        else:
            m = np.ones_like(lon, dtype=bool)
        x, y, z = fwd(lon[m], lat[m], np.zeros(m.sum()))
        lo, la, _ = inv(x, y, z)
        ok = np.isfinite(lo)
        assert ok.mean() > 0.97, proj
        # Snyder-series tmerc fwd/inv are truncated expansions, not exact
        # mutual inverses (~1e-7 deg, visible in the reference's own
        # goldens tv_out.dist tmerc-inverse rows); others are 1e-9-exact.
        atol = 1e-6 if "+proj=tmerc" in proj else 1e-9
        np.testing.assert_allclose(lo[ok], lon[m][ok], rtol=0, atol=atol, err_msg=proj)
        np.testing.assert_allclose(la[ok], lat[m][ok], rtol=0, atol=atol, err_msg=proj)


def test_helmert_7param_datum():
    """potsdam 7-param datum from the built-in registry (pj_datums.c:52)."""
    t = make_transform("+proj=latlong +datum=potsdam", "+proj=latlong +datum=WGS84")
    x, y, z = t(np.array([13.4]), np.array([52.5]), np.array([0.0]))
    # potsdam->WGS84 shift in Berlin is ~ +0.0012 deg lon, -0.0017 deg lat
    assert abs(x[0] - 13.4) < 0.01 and abs(x[0] - 13.4) > 1e-4
    assert abs(y[0] - 52.5) < 0.01 and abs(y[0] - 52.5) > 1e-4
    # and back
    tb = make_transform("+proj=latlong +datum=WGS84", "+proj=latlong +datum=potsdam")
    lo, la, _ = tb(x, y, z)
    np.testing.assert_allclose(lo, 13.4, atol=1e-9)
    np.testing.assert_allclose(la, 52.5, atol=1e-9)


def test_error_sentinel_flow():
    """Out-of-domain points become inf and do NOT poison neighbours
    (HUGE_VAL semantics, src/pj_fwd.c:12-14, src/pj_transform.c:175-192)."""
    t = make_transform("+proj=latlong +datum=WGS84", "+proj=merc +datum=WGS84")
    x, y, _ = t(np.array([10.0, 0.0, 20.0]), np.array([45.0, 90.0, 50.0]))
    assert np.isinf(x[1]) and np.isinf(y[1])
    assert np.isfinite(x[0]) and np.isfinite(x[2])


def test_axis_and_units():
    """+axis swap and +units conversion (pj_adjust_axis + to_meter)."""
    # neu axis: outputs (northing, easting)
    t_enu = make_transform("+proj=latlong +datum=WGS84",
                           "+proj=merc +datum=WGS84")
    t_neu = make_transform("+proj=latlong +datum=WGS84",
                           "+proj=merc +datum=WGS84 +axis=neu")
    x0, y0, _ = t_enu(np.array([10.0]), np.array([45.0]))
    x1, y1, _ = t_neu(np.array([10.0]), np.array([45.0]))
    assert x1[0] == y0[0] and y1[0] == x0[0]
    # km units
    t_km = make_transform("+proj=latlong +datum=WGS84",
                          "+proj=merc +datum=WGS84 +units=km")
    xk, yk, _ = t_km(np.array([10.0]), np.array([45.0]))
    np.testing.assert_allclose(xk[0] * 1000.0, x0[0], rtol=1e-12)


def test_dmstor():
    """DMS grammar (src/dmstor.c:18-113)."""
    from proj_ray.kernels.common import DMS_DEG, DMS_MIN, DMS_SEC

    assert dmstor("79d58'00.000\"W") == -(79 * DMS_DEG + 58 * DMS_MIN)
    assert dmstor("45") == 45 * DMS_DEG
    assert dmstor("-12.5") == -12.5 * DMS_DEG
    assert dmstor("1d30'S") == -(1 * DMS_DEG + 30 * DMS_MIN)
    assert dmstor("0dE") == 0.0
    assert abs(dmstor("2d20'14.025\"E") - (2 * DMS_DEG + 20 * DMS_MIN + 14.025 * DMS_SEC)) < 1e-18
    assert dmstor("1.5r") == 1.5  # radian suffix


def test_crs_first_wins_and_init():
    """First-wins param merge + init expansion (pj_init.c:188-201)."""
    from proj_ray.kernels.common import DMS_DEG
    from proj_ray.kernels.common import msfn

    c = CRS("+proj=merc +lat_ts=10 +lat_ts=50 +datum=WGS84")
    phits = 10 * DMS_DEG
    expect = float(msfn(np.sin(phits), np.cos(phits), c.es))
    assert abs(c.k0 - expect) < 1e-15  # first lat_ts wins
    c2 = CRS("+init=epsg:3857 +units=km")  # explicit arg beats init body
    assert c2.to_meter == 1000.0
    c3 = CRS("+proj=latlong")  # general default ellps=WGS84
    assert c3.a == 6378137.0
