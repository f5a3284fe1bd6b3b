"""Command-line equivalents of the reference's ``cs2cs``, ``proj`` and
``geod`` filters: line-at-a-time text streaming with the same grammar —
DMS or decimal fields (src/dmstor.c), '#'-prefixed passthrough lines
(src/proj.c:78-82), trailing-z + rest-of-line echo (src/cs2cs.c:97,156),
'*' error sentinel output (src/proj.c:115-148), '+to' argument split
(src/cs2cs.c:296-316).

Usage:
    python -m proj_ray.cs2cs +proj=latlong +datum=NAD27 +to +proj=utm +zone=11 +datum=WGS84 [-E] [-f fmt] < pts.txt
    python -m proj_ray.proj  +proj=merc +datum=WGS84 [-I] [-f fmt] < pts.txt
    python -m proj_ray.geod  +ellps=WGS84 [-I] < pairs.txt

Lines are micro-batched (default 8192) through the same vectorized
kernels the Dataset pipeline uses — the CLI is a thin text boundary,
not a second engine.
"""

from __future__ import annotations

import sys

import numpy as np

from .crs import dmstor, rtodms
from .kernels.common import DEG_TO_RAD, RAD_TO_DEG
from .transform import Transform, make_transform


def _split_args(argv):
    """flags (-X [val]) + '+' defs, split at '+to' (cs2cs.c:296-316)."""
    flags = {}
    from_def = []
    to_def = []
    cur = from_def
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "+to":
            cur = to_def
        elif a.startswith("+"):
            cur.append(a)
        elif a.startswith("-"):
            if a in ("-f", "-b"):  # flags with value
                flags[a] = argv[i + 1]
                i += 1
            elif a.startswith("-w") and a[2:].isdigit():
                # -w<n>: DMS seconds precision (proj.c/cs2cs.c -w)
                flags["-w"] = int(a[2:])
            else:
                flags[a] = True
        i += 1
    return flags, " ".join(from_def), " ".join(to_def)


def _parse_coord(tok: str) -> float:
    try:
        return dmstor(tok)
    except (ValueError, IndexError):
        return float("nan")


def _fmt(v: float, fmt: str | None, as_dms: bool, pos: str, neg: str,
         prec: int = 3) -> str:
    if not np.isfinite(v):
        return "*"
    if fmt:
        return fmt % v
    if as_dms:
        return rtodms(v, pos, neg, prec)
    return "%.2f" % v


def _process_proj_lines(lines, transform: Transform, flags):
    """proj.c-style line processing (src/proj.c:60-150): consume exactly
    two coordinate fields, echo ONLY the consumed text under -E, print
    x TAB y (no z — proj is 2-D), then the unconsumed remainder verbatim
    (which is how test27/test83 carry expected values + labels through).
    Unprojectable input emits the "*\\t*" oterr sentinel (proj.c:43)."""
    import re

    echo = "-E" in flags
    fmt = flags.get("-f")
    rev_in = "-r" in flags
    rev_out = "-s" in flags
    src_ll = transform.src.is_latlong
    dst_ll = transform.dst.is_latlong
    two_fields = re.compile(r"\s*\S+\s+\S+")

    batch, tails, consumed = [], [], []

    def flush():
        if not batch:
            return
        arr = np.asarray(batch, dtype=np.float64)
        x, y, _z = transform(arr[:, 0], arr[:, 1], arr[:, 2])
        for i in range(len(batch)):
            if not (np.isfinite(x[i]) and np.isfinite(y[i])):
                body = "*\t*"
            elif dst_ll and fmt is None:
                prec = flags.get("-w", 3)
                ox = rtodms(x[i] * DEG_TO_RAD, "E", "W", prec)
                oy = rtodms(y[i] * DEG_TO_RAD, "N", "S", prec)
                body = f"{oy}\t{ox}" if rev_out else f"{ox}\t{oy}"
            else:
                f = fmt or "%.2f"
                ox, oy = f % x[i], f % y[i]
                body = f"{oy}\t{ox}" if rev_out else f"{ox}\t{oy}"
            pre = consumed[i] + "\t" if echo else ""
            yield pre + body + tails[i]
        batch.clear()
        tails.clear()
        consumed.clear()

    for line in lines:
        line = line.rstrip("\n")
        if not line or line.lstrip().startswith("#"):
            yield from flush()
            yield line
            continue
        m = two_fields.match(line)
        if m is None:
            yield from flush()
            yield line
            continue
        toks = m.group(0).split()
        t1, t2 = toks[0], toks[1]
        if rev_in:
            t1, t2 = t2, t1
        if src_ll:
            x = _parse_coord(t1) * RAD_TO_DEG
            y = _parse_coord(t2) * RAD_TO_DEG
        else:
            try:
                x = float(t1)
                y = float(t2)
            except ValueError:
                x = y = float("nan")
        batch.append((x, y, 0.0))
        consumed.append(m.group(0))
        tails.append(line[m.end():])
        if len(batch) >= 8192:
            yield from flush()
    yield from flush()


def _process_lines(lines, transform: Transform, flags):
    """Yield output lines. Input coords for latlong CRS are DMS/decimal
    degrees (dmstor); projected input is plain floats."""
    echo = "-E" in flags
    fmt = flags.get("-f")
    rev_in = "-r" in flags
    rev_out = "-s" in flags
    src_ll = transform.src.is_latlong
    dst_ll = transform.dst.is_latlong

    batch, tails, raw = [], [], []
    for line in lines:
        line = line.rstrip("\n")
        if not line or line.lstrip().startswith("#"):
            yield from _flush(batch, tails, raw, transform, flags, echo, fmt,
                              rev_out, dst_ll)
            batch, tails, raw = [], [], []
            yield line
            continue
        parts = line.split(None, 2)
        if len(parts) < 2:
            yield line
            continue
        t1, t2 = parts[0], parts[1]
        rest = parts[2] if len(parts) > 2 else ""
        # optional z as the first token of the rest
        z = 0.0
        if rest:
            ztoks = rest.split(None, 1)
            try:
                z = float(ztoks[0])
                rest = ztoks[1] if len(ztoks) > 1 else ""
            except ValueError:
                pass
        if rev_in:
            t1, t2 = t2, t1
        if src_ll:
            x = _parse_coord(t1) * (1.0 / 1.0)
            y = _parse_coord(t2)
            # dmstor returns radians; the Transform expects degrees when
            # degrees=True — convert (cs2cs parses straight to radians)
            x *= RAD_TO_DEG
            y *= RAD_TO_DEG
        else:
            try:
                x = float(t1)
                y = float(t2)
            except ValueError:
                x = y = float("nan")
        batch.append((x, y, z))
        tails.append(rest)
        raw.append(line)
        if len(batch) >= 8192:
            yield from _flush(batch, tails, raw, transform, flags, echo, fmt,
                              rev_out, dst_ll)
            batch, tails, raw = [], [], []
    yield from _flush(batch, tails, raw, transform, flags, echo, fmt,
                      rev_out, dst_ll)


def _flush(batch, tails, raw, transform, flags, echo, fmt, rev_out, dst_ll):
    if not batch:
        return
    arr = np.asarray(batch, dtype=np.float64)
    x, y, z = transform(arr[:, 0], arr[:, 1], arr[:, 2])
    for i in range(len(batch)):
        if dst_ll:
            prec = flags.get("-w", 3)
            ox = _fmt(x[i] * DEG_TO_RAD, fmt, fmt is None, "E", "W", prec)
            oy = _fmt(y[i] * DEG_TO_RAD, fmt, fmt is None, "N", "S", prec)
            if fmt:
                ox = _fmt(x[i], fmt, False, "", "")
                oy = _fmt(y[i], fmt, False, "", "")
        else:
            ox = _fmt(x[i], fmt, False, "", "")
            oy = _fmt(y[i], fmt, False, "", "")
        if rev_out:
            ox, oy = oy, ox
        zs = ((fmt or "%.3f") % z[i]) if np.isfinite(z[i]) else "*"
        out = f"{ox}\t{oy} {zs}"
        if tails[i]:
            out += " " + tails[i]
        if echo:
            out = raw[i] + "\t" + out
        yield out



def _init_failure(prog, exc, stderr=None):
    """Reference-style init diagnostic (proj.c/cs2cs.c emess usage):
    <prog>: projection initialization failure\ncause: <pj_strerrno>."""
    from .errors import errno_from_exception, pj_strerrno

    stderr = stderr or sys.stderr
    code = errno_from_exception(exc)
    cause = pj_strerrno(code) if code is not None else str(exc)
    print(f"{prog}: projection initialization failure", file=stderr)
    print(f"cause: {cause}", file=stderr)
    return 1


def cs2cs_main(argv=None, stdin=None, stdout=None):
    argv = sys.argv[1:] if argv is None else argv
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    flags, from_def, to_def = _split_args(argv)
    if not to_def:
        # no +to: destination = base geographic CRS of source
        # (pj_latlong_from_proj semantics, src/cs2cs.c:357-369)
        to_def = _latlong_from(from_def)
    try:
        t = make_transform(from_def, to_def)
    except (ValueError, FileNotFoundError) as exc:
        return _init_failure("cs2cs", exc)
    for out in _process_lines(stdin, t, flags):
        print(out, file=stdout)
    return 0


def _latlong_from(defn: str) -> str:
    """Derive the underlying geographic CRS (pj_latlong_from_proj,
    src/pj_utils.c:118-173): keep datum/ellps/towgs84/nadgrids/pm."""
    keep = ("datum", "ellps", "a", "b", "rf", "es", "e", "towgs84",
            "nadgrids", "pm", "R")
    toks = ["+proj=latlong"]
    for tok in defn.split():
        t = tok.lstrip("+")
        k = t.split("=", 1)[0]
        if k in keep:
            toks.append("+" + t)
    return " ".join(toks)


def proj_main(argv=None, stdin=None, stdout=None):
    argv = sys.argv[1:] if argv is None else argv
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    flags, defn, _ = _split_args(argv)
    ll = _latlong_from(defn)
    try:
        if "-I" in flags:
            t = make_transform(defn, ll)
        else:
            t = make_transform(ll, defn)
    except (ValueError, FileNotFoundError) as exc:
        return _init_failure("proj", exc)
    for out in _process_proj_lines(stdin, t, flags):
        print(out, file=stdout)
    return 0


def geod_main(argv=None, stdin=None, stdout=None):
    """geod: inverse problem per line 'lat1 lon1 lat2 lon2' ->
    'azi1 azi2 s12' (src/geod.c:58-121)."""
    argv = sys.argv[1:] if argv is None else argv
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    flags, defn, _ = _split_args(argv)
    from .crs import CRS
    from .kernels.geodesic import geod_inverse

    try:
        crs = CRS(defn if "proj=" in defn else defn + " +proj=latlong")
    except (ValueError, FileNotFoundError) as exc:
        return _init_failure("geod", exc)
    a = crs.a
    f = crs.es / (1 + (1 - crs.es) ** 0.5) if crs.es else 0.0
    fmt = flags.get("-f", "%.3f")
    for line in stdin:
        line = line.rstrip("\n")
        if not line or line.lstrip().startswith("#"):
            print(line, file=stdout)
            continue
        toks = line.split()
        if len(toks) < 4:
            print(line, file=stdout)
            continue
        lat1, lon1, lat2, lon2 = (np.degrees(_parse_coord(tk)) for tk in toks[:4])
        s12, azi1, azi2, _ok = geod_inverse(
            np.array([lon1]), np.array([lat1]), np.array([lon2]), np.array([lat2]),
            a=a, f=f)
        print(f"{rtodms(np.radians(azi1[0]))}\t{rtodms(np.radians(azi2[0]))}\t"
              f"{fmt % s12[0]}", file=stdout)
    return 0
