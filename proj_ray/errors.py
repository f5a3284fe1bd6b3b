"""Error catalog: pj_errno codes -> messages (src/pj_strerrno.c).

Library code raises ValueError/FileNotFoundError whose text carries the
reference's negative code as ``(-NN)``; the CLIs translate that to the
reference's ``projection initialization failure`` diagnostic.
"""

from __future__ import annotations

import re

PJ_ERR_LIST = {
    -1: "no arguments in initialization list",
    -2: "no options found in 'init' file",
    -3: "no colon in init= string",
    -4: "projection not named",
    -5: "unknown projection id",
    -6: "effective eccentricity = 1.",
    -7: "unknown unit conversion id",
    -8: "invalid boolean param argument",
    -9: "unknown elliptical parameter name",
    -10: "reciprocal flattening (1/f) = 0",
    -11: "|radius reference latitude| > 90",
    -12: "squared eccentricity < 0",
    -13: "major axis or radius = 0 or not given",
    -14: "latitude or longitude exceeded limits",
    -15: "invalid x or y",
    -16: "improperly formed DMS value",
    -17: "non-convergent inverse meridional dist",
    -18: "non-convergent inverse phi2",
    -19: "acos/asin: |arg| >1.+1e-14",
    -20: "tolerance condition error",
    -21: "conic lat_1 = -lat_2",
    -22: "lat_1 >= 90",
    -23: "lat_1 = 0",
    -24: "lat_ts >= 90",
    -25: "no distance between control points",
    -26: "projection not selected to be rotated",
    -27: "W <= 0 or M <= 0",
    -28: "lsat not in 1-5 range",
    -29: "path not in range",
    -30: "h <= 0",
    -31: "k <= 0",
    -32: "lat_0 = 0 or 90 or alpha = 90",
    -33: "lat_1=lat_2 or lat_1=0 or lat_2=90",
    -34: "elliptical usage required",
    -35: "invalid UTM zone number",
    -36: "arg(s) out of range for Tcheby eval",
    -37: "failed to find projection to be rotated",
    -38: "failed to load datum shift file",
    -39: "both n & m must be spec'd and > 0",
    -40: "n <= 0, n > 1 or not specified",
    -41: "lat_1 or lat_2 not specified",
    -42: "|lat_1| == |lat_2|",
    -43: "lat_0 is pi/2 from mean lat",
    -44: "unparseable coordinate system definition",
    -45: "geocentric transformation missing z or ellps",
    -46: "unknown prime meridian conversion id",
    -47: "illegal axis orientation combination",
    -48: "point not within available datum shift grids",
    -49: "invalid sweep axis, choose x or y",
}

# trailing (-NN) or (NN) code; the reference has two setups
# (PJ_lcca.c:57-58) that pass POSITIVE codes to E_ERROR
_CODE_RE = re.compile(r"\((-?\d+)\)")


def pj_strerrno(err: int) -> str:
    """src/pj_strerrno.c: message for a pj_errno code.  Positive codes
    are system errnos; this build has no NLS message list, so the C
    prints 'no system list, errno: %d\\n' — trailing newline included
    (the note buffer keeps it, visible as a blank line in emess
    output)."""
    if err > 0:
        return f"no system list, errno: {err}\n"
    if err in PJ_ERR_LIST:
        return PJ_ERR_LIST[err]
    return f"invalid projection system error ({err})"


def errno_from_exception(exc: BaseException) -> int | None:
    """Extract the ``(-NN)`` code our init errors carry in their text."""
    m = _CODE_RE.search(str(exc))
    return int(m.group(1)) if m else None
