"""STR-packed R-tree kernel + cell-bucketed R-tree-shard PIP parity."""

import numpy as np
import pyarrow as pa

from proj_ray.kernels.rtree import STRtree


def _brute_pairs(boxes, px, py):
    exp = set()
    for i in range(px.size):
        m = ((boxes[:, 0] <= px[i]) & (px[i] <= boxes[:, 2])
             & (boxes[:, 1] <= py[i]) & (py[i] <= boxes[:, 3]))
        exp |= {(i, int(j)) for j in np.flatnonzero(m)}
    return exp


def test_strtree_matches_bruteforce_across_sizes_and_fanouts():
    rng = np.random.default_rng(7)
    for n in [0, 1, 2, 3, 5, 17, 64, 500]:
        for fanout in [2, 3, 8]:
            lo = rng.uniform(-180, 180, (n, 2))
            sz = rng.uniform(0, 30, (n, 2))
            boxes = np.concatenate([lo, lo + sz], 1)
            tree = STRtree(boxes, fanout)
            px = rng.uniform(-180, 210, 400)
            py = rng.uniform(-180, 210, 400)
            pt, it = tree.query_points(px, py)
            assert set(zip(pt.tolist(), it.tolist())) == \
                _brute_pairs(boxes, px, py), (n, fanout)


def test_strtree_closed_bounds_and_duplicates():
    # points ON the bbox edge are hits (closed bounds, matching the
    # Polygon.contains >= / <= prefilter); duplicate boxes both report
    boxes = np.array([[0.0, 0.0, 10.0, 10.0],
                      [0.0, 0.0, 10.0, 10.0],
                      [20.0, 20.0, 30.0, 30.0]])
    tree = STRtree(boxes, fanout=2)
    pt, it = tree.query_points(np.array([0.0, 10.0, 15.0, 20.0]),
                               np.array([0.0, 10.0, 15.0, 30.0]))
    got = set(zip(pt.tolist(), it.tolist()))
    assert got == {(0, 0), (0, 1), (1, 0), (1, 1), (3, 2)}


def test_pip_s2rtree_shards_match_direct_incl_polar():
    """The cell-bucketed R-tree-shard probe (north-star plan) equals
    the direct all-polygons evaluation — on a dense random polygon set
    so shard trees have real depth, plus a polar cap."""
    from proj_ray.stages.pip_stage import PIPJoinActor

    rng = np.random.default_rng(11)
    polys = [("cap_n", [(-180.0, 86.0), (-60.0, 86.0), (60.0, 86.0),
                        (180.0, 86.0), (180.0, 90.0), (-180.0, 90.0)])]
    for k in range(60):  # random triangles, many per S2 cell
        x0 = rng.uniform(-170, 150)
        y0 = rng.uniform(-75, 70)
        polys.append((f"tri{k}", [(x0, y0), (x0 + rng.uniform(2, 25), y0),
                                  (x0 + rng.uniform(0, 10),
                                   y0 + rng.uniform(2, 15))]))
    lon = np.concatenate([rng.uniform(-180, 180, 6000),
                          rng.uniform(-180, 180, 400)])
    lat = np.concatenate([rng.uniform(-90, 90, 6000),
                          rng.uniform(85.5, 90, 400)])
    t = pa.table({"pid": pa.array(np.arange(lon.size), pa.int64()),
                  "lon": pa.array(lon), "lat": pa.array(lat)})
    direct = PIPJoinActor(polys, id_cols=("pid",),
                          direct_threshold=len(polys))(t).to_pandas()
    for fanout in (2, 8):
        sharded = PIPJoinActor(polys, zoom=5, id_cols=("pid",),
                               direct_threshold=0, index="s2rtree",
                               rtree_fanout=fanout)(t).to_pandas()
        key = ["pid", "polygon_id"]
        d = direct.sort_values(key).reset_index(drop=True)
        s = sharded.sort_values(key).reset_index(drop=True)
        assert len(d) and (d["polygon_id"] == "cap_n").any()
        assert d.equals(s)
