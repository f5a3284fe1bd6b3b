#!/usr/bin/env python
"""Differential validation against the REAL reference binaries.

Builds the reference from source (/root/reference, out-of-tree in
/tmp/proj_build — gcc/make are in the container) and compares this
engine's outputs against the actual `cs2cs` / `proj` / `geod`
executables on deterministic random inputs, far beyond the transcribed
.dist golden corpora:

- WGS84 -> EPSG:3857 (spherical mercator, @null datum branch)
- WGS84 -> UTM 33N (tmerc series) via `proj`
- WGS84 -> LCC 2SP France
- NAD27 (clrk66) -> NAD83 through the real ntv1_can.dat
- WGS84 <-> NTF through the real ntf_r93.gsb (fwd + iterative inverse)
- geodesic inverse distances via `geod`

Tolerances are printed-precision ulp allowances (the C and numpy use
different libm implementations for ln/tan/pow; agreement is asserted
to ~1e-6 m / 1e-11 deg, far inside the reference's own documented
accuracy).  Run: python tools/validate_against_reference.py
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference"
BUILD = "/tmp/proj_build"
ENV = dict(os.environ, PROJ_LIB=os.path.join(REF, "nad"))


def ensure_built():
    cs2cs = os.path.join(BUILD, "src", "cs2cs")
    if os.path.exists(cs2cs):
        return
    os.makedirs(BUILD, exist_ok=True)
    subprocess.run([os.path.join(REF, "configure")], cwd=BUILD, check=True,
                   capture_output=True)
    subprocess.run(["make", "-j8", "-C", "src", "cs2cs", "proj", "geod"],
                   cwd=BUILD, check=True, capture_output=True)


def run_ref(exe, args, lines):
    p = subprocess.run([os.path.join(BUILD, "src", exe)] + args,
                       input="\n".join(lines) + "\n", text=True,
                       capture_output=True, env=ENV, check=True)
    return p.stdout.splitlines()


def fmt_lines(*cols, prec=9):
    """Format input text AND return the quantized values both engines
    actually consume (the reference parses the printed decimals, so our
    side must too — otherwise the comparison measures input
    quantization, ~1e-9 deg = ~1e-4 m, not engine agreement)."""
    lines = [" ".join(f"{v:.{prec}f}" for v in row) for row in zip(*cols)]
    q = [np.array([float(ln.split()[k]) for ln in lines])
         for k in range(len(cols))]
    return lines, q


def parse_xy(lines):
    out = np.empty((len(lines), 2))
    for i, ln in enumerate(lines):
        toks = ln.split()
        out[i] = (float(toks[0]), float(toks[1]))
    return out


def check(name, got, want, tol):
    d = np.max(np.abs(got - want))
    status = "OK " if d <= tol else "FAIL"
    print(f"[{status}] {name}: n={len(got)} max|diff|={d:.3e} (tol {tol:g})")
    return d <= tol


def main():
    ensure_built()
    os.environ["PROJ_LIB"] = ENV["PROJ_LIB"]  # grid resolution, both sides
    from proj_ray.transform import make_transform

    rng = np.random.default_rng(20260817)
    n = 50000
    ok = True

    # --- WGS84 -> EPSG:3857 -------------------------------------------
    lon = rng.uniform(-179.9, 179.9, n)
    lat = rng.uniform(-85.0, 85.0, n)
    lines, (lon, lat) = fmt_lines(lon, lat)
    ref = parse_xy(run_ref("cs2cs", ["+init=epsg:4326", "+to",
                                     "+init=epsg:3857", "-f", "%.6f"], lines))
    t = make_transform("+init=epsg:4326", "+init=epsg:3857")
    x, y, _ = t(lon.copy(), lat.copy())
    ok &= check("webmerc fwd (cs2cs)", np.column_stack([x, y]), ref, 2e-6)

    # --- WGS84 -> UTM 33N (proj) --------------------------------------
    lon33 = rng.uniform(9.0, 15.0, n)
    lat33 = rng.uniform(-80.0, 84.0, n)
    lines, (lon33, lat33) = fmt_lines(lon33, lat33)
    ref = parse_xy(run_ref("proj", ["+proj=utm", "+zone=33",
                                    "+ellps=WGS84", "-f", "%.6f"], lines))
    t = make_transform("+proj=latlong +ellps=WGS84",
                       "+proj=utm +zone=33 +ellps=WGS84")
    x, y, _ = t(lon33.copy(), lat33.copy())
    ok &= check("utm33 fwd (proj)", np.column_stack([x, y]), ref, 2e-6)

    # --- WGS84 -> LCC France ------------------------------------------
    LCC = ("+proj=lcc +lat_1=44 +lat_2=49 +lat_0=46.5 +lon_0=3 "
           "+x_0=700000 +y_0=6600000 +ellps=WGS84")
    lonf = rng.uniform(-5.0, 10.0, n)
    latf = rng.uniform(41.0, 52.0, n)
    lines, (lonf, latf) = fmt_lines(lonf, latf)
    ref = parse_xy(run_ref("proj", LCC.split() + ["-f", "%.6f"], lines))
    t = make_transform("+proj=latlong +ellps=WGS84", LCC)
    x, y, _ = t(lonf.copy(), latf.copy())
    ok &= check("lcc fwd (proj)", np.column_stack([x, y]), ref, 2e-6)

    # --- NAD27 -> NAD83 through ntv1_can.dat --------------------------
    lonc = rng.uniform(-140.0, -60.0, 20000)
    latc = rng.uniform(42.0, 82.0, 20000)
    lines, (lonc, latc) = fmt_lines(lonc, latc)
    ref = parse_xy(run_ref("cs2cs", ["+proj=latlong", "+ellps=clrk66",
                                     "+nadgrids=ntv1_can.dat,@conus",
                                     "+to", "+proj=latlong", "+datum=NAD83",
                                     "-f", "%.12f"], lines))
    t = make_transform("+proj=latlong +ellps=clrk66 "
                       "+nadgrids=ntv1_can.dat,@conus",
                       "+proj=latlong +datum=NAD83")
    x, y, _ = t(lonc.copy(), latc.copy())
    ok &= check("ntv1 grid shift (cs2cs)", np.column_stack([x, y]), ref,
                1e-11)

    # --- WGS84 <-> NTF via ntf_r93.gsb (fwd + inverse) ----------------
    lonn = rng.uniform(-4.0, 7.9, 20000)
    latn = rng.uniform(42.5, 50.9, 20000)
    lines, (lonn, latn) = fmt_lines(lonn, latn)
    ref = parse_xy(run_ref("cs2cs", ["+proj=latlong", "+ellps=WGS84",
                                     "+nadgrids=ntf_r93.gsb",
                                     "+to", "+proj=latlong", "+datum=WGS84",
                                     "-f", "%.12f"], lines))
    t = make_transform("+proj=latlong +ellps=WGS84 +nadgrids=ntf_r93.gsb",
                       "+proj=latlong +datum=WGS84")
    x, y, _ = t(lonn.copy(), latn.copy())
    ok &= check("ntv2 fwd (cs2cs)", np.column_stack([x, y]), ref, 1e-11)

    ref = parse_xy(run_ref("cs2cs", ["+proj=latlong", "+datum=WGS84",
                                     "+to", "+proj=latlong", "+ellps=WGS84",
                                     "+nadgrids=ntf_r93.gsb",
                                     "-f", "%.12f"], lines))
    t = make_transform("+proj=latlong +datum=WGS84",
                       "+proj=latlong +ellps=WGS84 +nadgrids=ntf_r93.gsb")
    x, y, _ = t(lonn.copy(), latn.copy())
    ok &= check("ntv2 inverse (cs2cs)", np.column_stack([x, y]), ref, 1e-11)

    # --- geodesic inverse (geod) --------------------------------------
    g1 = rng.uniform(-80.0, 80.0, 20000)
    g2 = rng.uniform(-179.0, 179.0, 20000)
    g3 = rng.uniform(-80.0, 80.0, 20000)
    g4 = rng.uniform(-179.0, 179.0, 20000)
    lines, (g1, g2, g3, g4) = fmt_lines(g1, g2, g3, g4)
    # -F sets the DISTANCE format (osform, geod.c:172-175); -f is angles
    out = run_ref("geod", ["+ellps=WGS84", "-I", "-F", "%.9f"], lines)
    ref_s = np.array([float(ln.split()[2]) for ln in out])
    from proj_ray.kernels.geodesic import geod_inverse

    s12, _, _, okm = geod_inverse(g2, g1, g4, g3)
    assert okm.all()
    ok &= check("geod inverse distance", s12, ref_s, 1e-6)

    print("ALL OK" if ok else "MISMATCHES FOUND")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
