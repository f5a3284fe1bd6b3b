"""Datum shift grids: model + vectorized bilinear interpolation + apply.

Replicates:
- ``CTABLE`` model (src/projects.h:344-369): regular lat/lon raster of
  float32 (d_lam, d_phi) radian pairs, lower-left origin ``ll``, cell
  size ``del``, dims ``lim``; NTv2-style child subgrids as a tree.
- ``nad_intr`` bilinear interpolation with edge snapping
  (src/nad_intr.c:5-62)
- ``nad_cvt`` forward shift + fixed-point inverse (<=9 retries,
  TOL 1e-12, first-order fallback at grid edge) (src/nad_cvt.c:6-68)
- ``pj_apply_gridshift_3`` ordered first-match multi-grid apply with
  epsilon-inflated bboxes and child-subgrid descent
  (src/pj_apply_gridshift.c:116-254); unmatched points pass through
  unshifted (the reference's non-severe fallback, line ~236).
- the ``@null`` no-op world grid (src/pj_gridlist.c:109-151) and
  ``@optional`` missing-grid semantics (src/pj_gridlist.c:185-190).

Grids are small (<< 1 GB); at scale they are broadcast once per worker
(``ray.put`` / actor ``__init__``), never reloaded per batch.
"""

from __future__ import annotations

import struct

import numpy as np

from .common import HUGE, PI, adjlon


class ShiftGrid:
    """In-memory CTABLE-equivalent. ``cvs[j, i] = (d_lam, d_phi)`` radians
    at node (phi = ll_phi + j*del_phi, lam = ll_lam + i*del_lam)."""

    def __init__(self, grid_id, ll, delta, lim, cvs, children=None):
        self.id = str(grid_id)
        self.ll = (float(ll[0]), float(ll[1]))          # (lam, phi) radians
        self.delta = (float(delta[0]), float(delta[1]))  # (dlam, dphi) radians
        self.lim = (int(lim[0]), int(lim[1]))            # (nlam, nphi)
        cvs = np.asarray(cvs, dtype=np.float32)
        assert cvs.shape == (self.lim[1], self.lim[0], 2), cvs.shape
        self.cvs = cvs
        self.children = list(children or [])

    @property
    def epsilon(self):
        # src/pj_apply_gridshift.c:150
        return (abs(self.delta[1]) + abs(self.delta[0])) / 10000.0

    def contains(self, lam, phi):
        """epsilon-inflated bbox test (src/pj_apply_gridshift.c:152-159)."""
        eps = self.epsilon
        ll_lam, ll_phi = self.ll
        dl, dp = self.delta
        nl, npq = self.lim
        return ~(
            (ll_phi - eps > phi)
            | (ll_lam - eps > lam)
            | (ll_phi + (npq - 1) * dp + eps < phi)
            | (ll_lam + (nl - 1) * dl + eps < lam)
        )

    @property
    def is_zero(self):
        """True when every shift value is zero (the '@null' grid and
        synthetic zero grids) — nad_cvt then short-circuits to the
        bit-identical zero-shift op chain.  Cached after one scan."""
        z = self.__dict__.get("_is_zero")
        if z is None:
            z = not self.cvs.any()
            self.__dict__["_is_zero"] = z
        return z

    @staticmethod
    def null_grid():
        """The '@null' 3x3 zero world grid (src/pj_gridlist.c:109-151)."""
        return ShiftGrid(
            "null",
            ll=(-PI, -PI / 2),
            delta=(PI, PI / 2),
            lim=(3, 3),
            cvs=np.zeros((3, 3, 2), dtype=np.float32),
        )


def _locate(t_lam, t_phi, grid: ShiftGrid):
    """Cell index + fraction + in-grid mask for nad_intr's lookup,
    including the edge snapping (src/nad_intr.c:17-43)."""
    dl, dp = grid.delta
    nlam, nphi = grid.lim
    tl = t_lam / dl
    tp = t_phi / dp
    il = np.floor(tl)
    ip = np.floor(tp)
    fl = tl - il
    fp = tp - ip

    snap_lo_l = (il == -1) & (fl > 0.99999999999)
    il = np.where(snap_lo_l, il + 1, il)
    fl = np.where(snap_lo_l, 0.0, fl)
    snap_hi_l = (il + 1 == nlam) & (fl < 1e-11)
    il = np.where(snap_hi_l, il - 1, il)
    fl = np.where(snap_hi_l, 1.0, fl)
    snap_lo_p = (ip == -1) & (fp > 0.99999999999)
    ip = np.where(snap_lo_p, ip + 1, ip)
    fp = np.where(snap_lo_p, 0.0, fp)
    snap_hi_p = (ip + 1 == nphi) & (fp < 1e-11)
    ip = np.where(snap_hi_p, ip - 1, ip)
    fp = np.where(snap_hi_p, 1.0, fp)

    ok = (il >= 0) & (il + 1 < nlam) & (ip >= 0) & (ip + 1 < nphi)
    ok &= np.isfinite(tl) & np.isfinite(tp)
    ii = np.where(ok, il, 0).astype(np.int64)
    jj = np.where(ok, ip, 0).astype(np.int64)
    return ok, ii, jj, fl, fp


def nad_intr(t_lam, t_phi, grid: ShiftGrid):
    """Vectorized bilinear lookup; inputs are offsets from grid ll in
    radians. Returns (d_lam, d_phi) with inf outside. src/nad_intr.c:5-62."""
    ok, ii, jj, fl, fp = _locate(t_lam, t_phi, grid)
    cvs = grid.cvs
    f00 = cvs[jj, ii]
    f10 = cvs[jj, ii + np.where(ok, 1, 0)]
    f01 = cvs[jj + np.where(ok, 1, 0), ii]
    f11 = cvs[jj + np.where(ok, 1, 0), ii + np.where(ok, 1, 0)]

    m11 = fl * fp
    m10 = fl * (1.0 - fp)
    m01 = (1.0 - fl) * fp
    m00 = (1.0 - fl) * (1.0 - fp)
    # match the reference's accumulation order (nad_intr.c:50-59)
    val_lam = m00 * f00[..., 0] + m10 * f10[..., 0] + m01 * f01[..., 0] + m11 * f11[..., 0]
    val_phi = m00 * f00[..., 1] + m10 * f10[..., 1] + m01 * f01[..., 1] + m11 * f11[..., 1]
    return np.where(ok, val_lam, HUGE), np.where(ok, val_phi, HUGE)


def nad_cvt(lam, phi, grid: ShiftGrid, inverse: bool):
    """Vectorized nad_cvt (src/nad_cvt.c:6-68). Returns shifted (lam, phi)
    with inf where the grid doesn't apply / iteration diverged."""
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    ll_lam, ll_phi = grid.ll
    tb_lam = lam - ll_lam
    tb_phi = phi - ll_phi
    tb_lam = adjlon(tb_lam - PI) + PI

    if grid.is_zero:
        # zero-shift grid (the '@null' world grid, pj_gridlist.c:109-151):
        # the interpolated shift is exactly 0.0 and the inverse fixed
        # point converges on its first pass, so only the containment
        # mask and the reference's exact op chain remain — bit-identical
        # to the full path, without gathers or iteration
        ok, _, _, _, _ = _locate(tb_lam, tb_phi, grid)
        if not inverse:
            return (np.where(ok, lam - 0.0, HUGE),
                    np.where(ok, phi + 0.0, HUGE))
        ll_lam, ll_phi = grid.ll
        out_lam = adjlon((tb_lam + 0.0) + ll_lam)
        out_phi = (tb_phi - 0.0) + ll_phi
        return (np.where(ok, out_lam, HUGE),
                np.where(ok, out_phi, HUGE))

    t_lam, t_phi = nad_intr(tb_lam, tb_phi, grid)
    outside = ~np.isfinite(t_lam)

    if not inverse:
        out_lam = np.where(outside, HUGE, lam - t_lam)
        out_phi = np.where(outside, HUGE, phi + t_phi)
        return out_lam, out_phi

    # inverse: fixed point iteration, MAX_TRY 9, TOL 1e-12
    TOL = 1e-12
    t_lam = np.where(outside, HUGE, tb_lam + t_lam)
    t_phi = np.where(outside, HUGE, tb_phi - t_phi)
    active = ~outside & np.isfinite(lam)
    diverged = np.zeros_like(active)
    for _ in range(10):
        if not np.any(active):
            break
        dl, dp = nad_intr(t_lam[np.flatnonzero(active)], t_phi[np.flatnonzero(active)], grid)
        idx = np.flatnonzero(active)
        edge = ~np.isfinite(dl)
        # grid-edge: keep first-order approximation (nad_cvt.c:29-45)
        keep = idx[edge]
        active[keep] = False
        idx2 = idx[~edge]
        if idx2.size:
            dif_lam = t_lam[idx2] - dl[~edge] - tb_lam[idx2]
            dif_phi = t_phi[idx2] + dp[~edge] - tb_phi[idx2]
            t_lam[idx2] = t_lam[idx2] - dif_lam
            t_phi[idx2] = t_phi[idx2] - dif_phi
            done = ~((np.abs(dif_lam) > TOL) & (np.abs(dif_phi) > TOL))
            active[idx2[done]] = False
    # elements still active after 10 passes diverged (i < 0 in the C)
    diverged |= active
    out_lam = adjlon(t_lam + ll_lam)
    out_phi = t_phi + ll_phi
    out_lam = np.where(outside | diverged, HUGE, out_lam)
    out_phi = np.where(outside | diverged, HUGE, out_phi)
    return out_lam, out_phi


def _descend(grid: ShiftGrid, lam, phi):
    """Find the finest child subgrid containing each point (scalar-free
    approximation of src/pj_apply_gridshift.c:161-188: per point, descend
    to the first containing child, recursively)."""
    # returns list of (grid, index-array) partitions of the input indices
    idx_all = np.arange(lam.shape[0])
    if not grid.children:
        return [(grid, idx_all)]
    remaining = idx_all
    out = []
    for child in grid.children:
        if remaining.size == 0:
            break
        m = child.contains(lam[remaining], phi[remaining])
        took = remaining[m]
        if took.size:
            for g, sub in _descend(child, lam[took], phi[took]):
                out.append((g, took[sub]))
        remaining = remaining[~m]
    if remaining.size:
        out.append((grid, remaining))
    return out


def apply_gridshift(grids, inverse: bool, lam, phi):
    """Ordered first-match multi-grid apply (pj_apply_gridshift_3,
    src/pj_apply_gridshift.c:116-254). Unmatched points pass through."""
    lam = np.asarray(lam, dtype=np.float64).copy()
    phi = np.asarray(phi, dtype=np.float64).copy()
    done = ~np.isfinite(lam)  # error lanes stay untouched
    for grid in grids:
        todo = np.flatnonzero(~done)
        if todo.size == 0:
            break
        inside = grid.contains(lam[todo], phi[todo])
        cand = todo[inside]
        if cand.size == 0:
            continue
        for g, sub in _descend(grid, lam[cand], phi[cand]):
            ids = cand[sub]
            ol, op = nad_cvt(lam[ids], phi[ids], g, inverse)
            okm = np.isfinite(ol)
            ok_ids = ids[okm]
            lam[ok_ids] = ol[okm]
            phi[ok_ids] = op[okm]
            done[ok_ids] = True
    return lam, phi


# ---------------------------------------------------------------------------
# CTABLE2 binary format read/write (dispatch src/pj_gridinfo.c:893-918,
# reader src/nad_init.c:85-175). Self-contained: fixtures generate their
# own grids; no external data files.
# ---------------------------------------------------------------------------

def write_ctable2(path: str, grid: ShiftGrid):
    """Write a CTABLE2 file with the reference's exact 160-byte header
    layout (src/nad2bin.c:180-192, nad_init.c:214-228): 16-byte magic,
    EIGHTY-byte id at offset 16, ll/del doubles at 96, lim int32s at
    128, zero pad to 160, then float32 (lam,phi) pairs LSB-first."""
    with open(path, "wb") as f:
        f.write(b"CTABLE V2.0     ")
        f.write(grid.id.encode()[:80].ljust(80, b"\0"))
        f.write(struct.pack("<dddd", grid.ll[0], grid.ll[1], grid.delta[0], grid.delta[1]))
        f.write(struct.pack("<ii", grid.lim[0], grid.lim[1]))
        f.write(b"\0" * (160 - 136))
        f.write(np.ascontiguousarray(grid.cvs, dtype="<f4").tobytes())


def read_ctable2(path: str) -> ShiftGrid:
    """Read a CTABLE2 file (layout per src/nad_init.c:198-240: id is 80
    bytes at offset 16, doubles at 96, int32 dims at 128, data at 160).
    The id field may carry whatever bytes the writing process had on
    its stack after the NUL (nad2bin memcpys an uninitialized char[80]),
    so it is truncated at the first NUL before decoding."""
    with open(path, "rb") as f:
        magic = f.read(16)
        if not magic.startswith(b"CTABLE V2"):
            raise ValueError(f"{path}: not a CTABLE2 file")
        gid = f.read(80).split(b"\0", 1)[0].decode(errors="replace").rstrip()
        ll_lam, ll_phi, d_lam, d_phi = struct.unpack("<dddd", f.read(32))
        nlam, nphi = struct.unpack("<ii", f.read(8))
        f.seek(160)
        cvs = np.frombuffer(f.read(nlam * nphi * 2 * 4), dtype="<f4").reshape(nphi, nlam, 2)
        return ShiftGrid(gid, (ll_lam, ll_phi), (d_lam, d_phi), (nlam, nphi), cvs)


def gridlist_from_nadgrids(nadgrids: str, loader=None):
    """Parse a '+nadgrids=' comma list: '@' prefix marks optional grids
    (missing ones are skipped, src/pj_gridlist.c:185-190), 'null' / '@null'
    yields the no-op world grid. ``loader(name)`` resolves other names
    (fixtures register synthetic grids); missing non-optional grids raise."""
    grids = []
    for name in nadgrids.split(","):
        name = name.strip()
        if not name:
            continue
        optional = name.startswith("@")
        if optional:
            name = name[1:]
        if name == "null":
            grids.append(ShiftGrid.null_grid())
            continue
        g = loader(name) if loader is not None else None
        if g is None:
            if optional:
                continue
            raise FileNotFoundError(f"required grid {name!r} not available (-38)")
        if isinstance(g, list):
            grids.extend(g)  # NTv2 top-level subgrids are list siblings
        else:
            grids.append(g)
    return grids


def apply_vgridshift(vgrids, inverse: bool, lam, phi, z):
    """Vertical (geoid) grid shift: first-match bilinear height applied
    to z (+= forward geoid->ellipsoidal, -= inverse), replicating
    pj_apply_vgridshift (src/pj_apply_vgridshift.c:46-211): NON-inflated
    bbox, child descent, -88.8888 nodata.

    Deviation from the reference: a point with no vgrid coverage gets an
    inf z lane (and ok=False) instead of failing the whole call — batch
    engines must not let one point poison the stream. Returns (z, ok).
    """
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64).copy()
    ok = np.zeros(lam.shape, dtype=bool)
    err_in = ~np.isfinite(lam)
    NODATA = np.float32(-88.8888)
    for vg in vgrids:
        todo = np.flatnonzero(~ok & ~err_in)
        if todo.size == 0:
            break
        inside = vg.contains(lam[todo], phi[todo])
        ids = todo[inside]
        if ids.size == 0:
            continue
        dl, dp = vg.delta
        nl = vg.lim[0]
        gx = (lam[ids] - vg.ll[0]) / dl
        gy = (phi[ids] - vg.ll[1]) / dp
        ix = np.floor(gx)
        iy = np.floor(gy)
        fx = gx - ix
        fy = gy - iy
        ix = np.clip(ix, 0, vg.lim[0] - 2).astype(np.int64)
        iy = np.clip(iy, 0, vg.lim[1] - 2).astype(np.int64)
        v = vg.values
        # accumulation order of pj_apply_vgridshift.c:146-155
        value = (v[iy, ix] * (1.0 - fx) * (1.0 - fy)
                 + v[iy, ix + 1] * fx * (1.0 - fy)
                 + v[iy + 1, ix] * (1.0 - fx) * fy
                 + v[iy + 1, ix + 1] * fx * fy)
        good = value != NODATA
        gids = ids[good]
        if inverse:
            z[gids] = z[gids] - value[good]
        else:
            z[gids] = z[gids] + value[good]
        ok[gids] = True
    z[~ok & ~err_in] = HUGE
    return z, ok
