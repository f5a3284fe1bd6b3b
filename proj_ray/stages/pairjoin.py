"""Within-distance spatial self-join (radius pair join).

Finds every pair of points whose great-circle separation is below a
radius — the all-pairs neighborhood primitive under the spatial joins
the reference's pnpoly/geodesic kernels serve point-wise
(src/PJ_healpix.c:103-138, src/geodesic.c) — as a replicated
grid-bucket join, the standard distributed spatial self-join:

1. each point lands in its HOME cell and replicates ONLY into the
   adjacent cells whose id is SMALLER than its home cell's (~4 of 8 —
   a ~5x fan-out instead of the naive 9x, 44% less shuffle volume);
2. ONE hash shuffle co-locates cells (groupby(cell));
3. within a cell, a cross-cell pair is owned by the SMALLER cell id
   (the home point pairs with the replica whose home is a larger
   neighbor — mutually exclusive directions, so exactly once), and a
   same-cell pair by the pid order; the exact haversine test keeps
   true neighbors and the output canonicalizes to pid_a < pid_b.

Cell sizing is a proof obligation, not a tuning knob: with lat capped
at |lat| <= 80 deg (derive.lonlat_numpy's band), a lon gap of one full
cell (>= 2 deg) already implies distance >= 2*R*asin(cos(80 deg) *
sin(1 deg)) ~ 38.6 km > the 30 km radius, and one lat cell (0.5 deg)
implies >= 55.6 km; so the 3x3 neighborhood provably covers the
radius and the join is EXACT, not approximate.

100 TB shape: replication is a bounded ~5x on the point stream; the
shuffle moves (cell, pid, lon, lat) rows only; per-cell work is
quadratic in the CELL population (inherent — the OUTPUT is quadratic
in dense regions), so a deployment sizes cells to the radius exactly
as here and salts/sub-splits any cell whose population exceeds the
per-task budget.  The emitted pair stream is already globally
distinct — each pair appears only in its owning cell, and
duplicate-pid input rows collapse inside that one group — so there is
NO second shuffle and no driver materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels.geodesic import haversine

# lon cells of 2 deg x lat cells of 0.5 deg; see the sizing proof above
PAIR_DX_DEG = 2.0
PAIR_DY_DEG = 0.5
PAIR_NX = 180           # lon cells wrap modulo this
PAIR_NY = 360
_CELL_MUL = PAIR_NY + 2  # cell id = cx * _CELL_MUL + cy (cy in [0, NY))


def pair_cells_numpy(lon, lat):
    """Home cell coordinates; the SQL oracle must spell the identical
    IEEE op sequence: floor((lon + 180.0) / 2.0), floor((lat + 90.0) / 0.5)."""
    cx = np.floor((lon + 180.0) / PAIR_DX_DEG).astype(np.int64)
    cy = np.floor((lat + 90.0) / PAIR_DY_DEG).astype(np.int64)
    return cx, cy


def _replicate(t: pa.Table) -> pa.Table:
    pid = t["pid"].to_numpy(zero_copy_only=False)
    lon = t["lon"].to_numpy(zero_copy_only=False)
    lat = t["lat"].to_numpy(zero_copy_only=False)
    cx, cy = pair_cells_numpy(lon, lat)
    home_cell = cx * _CELL_MUL + cy
    n = pid.size
    outs = {"cell": [home_cell], "pid": [pid], "lon": [lon], "lat": [lat],
            "home": [np.ones(n, dtype=bool)]}
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nb = ((cx + dx) % PAIR_NX) * _CELL_MUL + (cy + dy)
            m = nb < home_cell  # replicate only toward smaller-id cells
            if not m.any():
                continue
            outs["cell"].append(nb[m])
            outs["pid"].append(pid[m])
            outs["lon"].append(lon[m])
            outs["lat"].append(lat[m])
            outs["home"].append(np.zeros(int(m.sum()), dtype=bool))
    return pa.table({
        "cell": pa.array(np.concatenate(outs["cell"]), pa.int64()),
        "pid": pa.array(np.concatenate(outs["pid"]), pa.int64()),
        "lon": pa.array(np.concatenate(outs["lon"]), pa.float64()),
        "lat": pa.array(np.concatenate(outs["lat"]), pa.float64()),
        "home": pa.array(np.concatenate(outs["home"]), pa.bool_()),
    })


def _pairs_in_cell(radius_m: float):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"pid_a": pd.Series(dtype=np.int64),
                              "pid_b": pd.Series(dtype=np.int64),
                              "dist_m": pd.Series(dtype=np.float64)})
        # distinct points: duplicate pids carry identical coordinates
        # (pid-derived), and a pid's home/replica cells are functions of
        # the pid, so ALL duplicate rows of a pair land in THIS group —
        # one group-local dedup makes the pair stream globally distinct
        # with no downstream keyed combine
        df = df.drop_duplicates("pid")
        hm = df["home"].to_numpy()
        if not hm.any():
            return empty
        pid = df["pid"].to_numpy()
        lon = df["lon"].to_numpy()
        lat = df["lat"].to_numpy()
        ph, lh, th = pid[hm], lon[hm], lat[hm]
        d = haversine(lh[:, None], th[:, None], lon[None, :], lat[None, :])
        d = np.floor(d * 1.0e3 + 0.5) / 1.0e3  # mm-rounded, as the oracle
        # home-home pairs once by pid order; home-replica pairs are
        # all owned here (the replica's home cell has a larger id)
        keep = ((ph[:, None] < pid[None, :]) | ~hm[None, :]) & (d < radius_m)
        ii, jj = np.nonzero(keep)
        if ii.size == 0:
            return empty
        pa_, pb_ = ph[ii], pid[jj]
        return pd.DataFrame({"pid_a": np.minimum(pa_, pb_),
                             "pid_b": np.maximum(pa_, pb_),
                             "dist_m": d[ii, jj]})
    return fn


def radius_pair_join_stage(points, radius_m: float):
    """points: Dataset(pid, lon, lat) -> Dataset(pid_a, pid_b, dist_m),
    globally distinct pairs (see module docstring)."""
    reps = points.map_batches(_replicate, batch_format="pyarrow",
                              zero_copy_batch=True)
    return reps.groupby("cell").map_groups(
        _pairs_in_cell(radius_m), batch_format="pandas")


def _spanning_in_cell(radius_m: float):
    """Local-contraction variant for connected components: instead of
    the cell's O(k^2) pair list, emit a SPANNING STAR per local
    component (min-pid representative -> member).  The union of local
    stars over all cells has exactly the same connected components as
    the full pair graph — every true pair lies inside some cell, where
    its endpoints share a local component — but the global edge list is
    LINEAR in points (vs quadratic pairs) and each cell contracts to
    depth-2 stars, collapsing the propagation depth the downstream
    min-label CC pays."""
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"src": pd.Series(dtype=np.int64),
                              "dst": pd.Series(dtype=np.int64)})
        df = df.drop_duplicates("pid")
        hm = df["home"].to_numpy()
        if not hm.any():
            return empty
        pid = df["pid"].to_numpy()
        lon = df["lon"].to_numpy()
        lat = df["lat"].to_numpy()
        hidx = np.flatnonzero(hm)
        d = haversine(lon[hidx][:, None], lat[hidx][:, None],
                      lon[None, :], lat[None, :])
        d = np.floor(d * 1.0e3 + 0.5) / 1.0e3
        keep = ((pid[hidx][:, None] < pid[None, :]) | ~hm[None, :]) \
            & (d < radius_m)
        ii, jj = np.nonzero(keep)
        if ii.size == 0:
            return empty
        parent = np.arange(pid.size, dtype=np.int64)

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for a, b in zip(hidx[ii], jj):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                # union toward the smaller PID so the local root is the
                # local min-pid representative
                if pid[ra] <= pid[rb]:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        roots = np.array([find(int(i)) for i in range(pid.size)],
                         dtype=np.int64)
        member = roots != np.arange(pid.size)
        return pd.DataFrame({"src": pid[roots[member]],
                             "dst": pid[member]})
    return fn


def radius_spanning_edges_stage(points, radius_m: float):
    """points -> Dataset(src, dst): per-cell locally-contracted spanning
    edges whose global connected components equal the full radius
    graph's (see _spanning_in_cell)."""
    reps = points.map_batches(_replicate, batch_format="pyarrow",
                              zero_copy_batch=True)
    return reps.groupby("cell").map_groups(
        _spanning_in_cell(radius_m), batch_format="pandas")


# ---------------------------------------------------------------------------
# Rectangle-overlap join (2D interval join) — the replicated grid-cell
# join with the REFERENCE-POINT de-duplication rule (Dittrich & Seeger,
# ICDE 2000): both rectangle sets replicate into every grid cell their
# bbox covers; after the one hash shuffle, a candidate pair found in a
# cell is emitted only when the INTERSECTION's min corner lies in that
# cell — each overlapping pair has exactly one such cell, so the join
# emits each pair exactly once with NO second dedup shuffle.  All
# bounds here are integer centi-degrees: overlap tests and areas are
# exact int64 arithmetic, bit-identical to the SQL inequality join.
# ---------------------------------------------------------------------------

RECT_CELL = 1000  # grid pitch (centi-units)


def _rect_replicate(side: str):
    def fn(t: pa.Table) -> pa.Table:
        rid = t["rid"].to_numpy(zero_copy_only=False)
        x0 = t["x0"].to_numpy(zero_copy_only=False)
        x1 = t["x1"].to_numpy(zero_copy_only=False)
        y0 = t["y0"].to_numpy(zero_copy_only=False)
        y1 = t["y1"].to_numpy(zero_copy_only=False)
        cx0, cx1 = x0 // RECT_CELL, x1 // RECT_CELL
        cy0, cy1 = y0 // RECT_CELL, y1 // RECT_CELL
        reps = {"cell": [], "rid": [], "x0": [], "x1": [], "y0": [], "y1": []}
        ncx = int((cx1 - cx0).max()) + 1 if rid.size else 1
        ncy = int((cy1 - cy0).max()) + 1 if rid.size else 1
        for dx in range(ncx):
            for dy in range(ncy):
                m = (cx0 + dx <= cx1) & (cy0 + dy <= cy1)
                if not m.any():
                    continue
                reps["cell"].append((cx0[m] + dx) * 1024 + (cy0[m] + dy))
                for c, v in (("rid", rid), ("x0", x0), ("x1", x1),
                             ("y0", y0), ("y1", y1)):
                    reps[c].append(v[m])
        if not reps["cell"]:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "side": pa.array([], pa.string()),
                             "rid": pa.array([], pa.int64()),
                             "x0": pa.array([], pa.int64()),
                             "x1": pa.array([], pa.int64()),
                             "y0": pa.array([], pa.int64()),
                             "y1": pa.array([], pa.int64())})
        out = {k: np.concatenate(v) for k, v in reps.items()}
        n = out["cell"].size
        return pa.table({"cell": pa.array(out["cell"], pa.int64()),
                         "side": pa.array(np.full(n, side, dtype=object),
                                          pa.string()),
                         "rid": pa.array(out["rid"], pa.int64()),
                         "x0": pa.array(out["x0"], pa.int64()),
                         "x1": pa.array(out["x1"], pa.int64()),
                         "y0": pa.array(out["y0"], pa.int64()),
                         "y1": pa.array(out["y1"], pa.int64())})
    return fn


def _overlaps_in_cell(df: pd.DataFrame) -> pd.DataFrame:
    empty = pd.DataFrame({"rid_a": pd.Series(dtype=np.int64),
                          "rid_b": pd.Series(dtype=np.int64),
                          "overlap_area": pd.Series(dtype=np.int64)})
    sa = df["side"].to_numpy() == "A"
    if not sa.any() or sa.all():
        return empty
    A = df[sa]
    B = df[~sa]
    ax0 = A["x0"].to_numpy()[:, None]
    ax1 = A["x1"].to_numpy()[:, None]
    ay0 = A["y0"].to_numpy()[:, None]
    ay1 = A["y1"].to_numpy()[:, None]
    bx0 = B["x0"].to_numpy()[None, :]
    bx1 = B["x1"].to_numpy()[None, :]
    by0 = B["y0"].to_numpy()[None, :]
    by1 = B["y1"].to_numpy()[None, :]
    ix0 = np.maximum(ax0, bx0)
    iy0 = np.maximum(ay0, by0)
    overlap = (ax0 <= bx1) & (bx0 <= ax1) & (ay0 <= by1) & (by0 <= ay1)
    # reference point: the intersection's min corner must be in THIS cell
    cell = int(df["cell"].iloc[0])
    owns = ((ix0 // RECT_CELL) * 1024 + (iy0 // RECT_CELL)) == cell
    ii, jj = np.nonzero(overlap & owns)
    if ii.size == 0:
        return empty
    area = ((np.minimum(ax1, bx1) - ix0) * (np.minimum(ay1, by1) - iy0))[ii, jj]
    return pd.DataFrame({"rid_a": A["rid"].to_numpy()[ii],
                         "rid_b": B["rid"].to_numpy()[jj],
                         "overlap_area": area.astype(np.int64)})


def rect_overlap_join_stage(rects_a, rects_b):
    """rects_*: Dataset(rid, x0, x1, y0, y1) int64 closed intervals ->
    Dataset(rid_a, rid_b, overlap_area), each overlapping pair exactly
    once.  One union + one hash shuffle; per-cell work is the vectorized
    nA x nB mask (dense cells are the documented salting point, exactly
    as in radius_pair_join)."""
    ra = rects_a.map_batches(_rect_replicate("A"), batch_format="pyarrow",
                             zero_copy_batch=True)
    rb = rects_b.map_batches(_rect_replicate("B"), batch_format="pyarrow",
                             zero_copy_batch=True)
    return ra.union(rb).groupby("cell").map_groups(
        _overlaps_in_cell, batch_format="pandas")
