"""Raster -> vector polygonize (functions/raster.py + the
raster_polygonize query): hand-built rasters with known components,
determinism of the rank threshold, and the sf0.001 DuckDB oracle
cross-check."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from proj_ray.functions.raster import (
    ID_MUL, active_cells, adjacency_edges, polygonize,
)


def _cells(rows):
    return pd.DataFrame(rows, columns=["r", "c", "n"]).astype("int64")


def test_polygonize_l_shape_and_isolated():
    # mask (frac=1.0 keeps everything): an L of 3 cells + 1 isolated
    cells = _cells([(0, 0, 5), (1, 0, 4), (1, 1, 3), (3, 3, 9)])
    out = polygonize(cells, frac=1.0)
    assert list(out["component"]) == [0, 3 * ID_MUL + 3]
    l_row = out.iloc[0]
    assert (l_row["n_cells"], l_row["total_points"]) == (3, 12)
    assert (l_row["row_min"], l_row["row_max"],
            l_row["col_min"], l_row["col_max"]) == (0, 1, 0, 1)
    iso = out.iloc[1]
    assert (iso["n_cells"], iso["total_points"]) == (1, 9)


def test_polygonize_diagonal_not_connected():
    # 4-adjacency: diagonal neighbors are separate components
    cells = _cells([(0, 0, 1), (1, 1, 1)])
    out = polygonize(cells, frac=1.0)
    assert len(out) == 2
    assert list(out["n_cells"]) == [1, 1]


def test_active_cells_rank_threshold_deterministic():
    # counts tie at 5: (r, c) order breaks the tie deterministically
    cells = _cells([(2, 2, 5), (0, 1, 5), (0, 0, 5), (9, 9, 1)])
    act = active_cells(cells, frac=0.5)  # keep floor(0.5*4) = 2
    assert list(zip(act["r"], act["c"])) == [(0, 0), (0, 1)]


def test_adjacency_edges_right_and_down_only():
    cells = _cells([(0, 0, 1), (0, 1, 1), (1, 0, 1)])
    act = active_cells(cells, frac=1.0)
    e = adjacency_edges(act)
    got = set(zip(e["src"], e["dst"]))
    # src is the left/up neighbor shifted onto its right/down neighbor
    assert got == {(0, 1), (0, ID_MUL)}


def test_polygonize_empty_mask():
    out = polygonize(_cells([(0, 0, 1)]), frac=0.0)
    assert out.empty
    assert list(out.columns) == ["component", "n_cells", "total_points",
                                 "row_min", "row_max", "col_min", "col_max"]


def test_polygonize_long_snake_converges():
    # a 200-cell path exceeds cc_min_label's default 50 rounds; the
    # polygonize wrapper passes max_rounds=4096
    cells = _cells([(0, i, 1) for i in range(200)])
    out = polygonize(cells, frac=1.0)
    assert len(out) == 1
    assert out.iloc[0]["n_cells"] == 200


@pytest.mark.usefixtures("ray_session")
def test_raster_polygonize_matches_duckdb_sf0001():
    from proj_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    eng = QUERIES["raster_polygonize"]["fn"](sf)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS "
                f"SELECT * FROM read_parquet('{sf}/lineitem.parquet')")
    ora = con.execute(QUERIES["raster_polygonize"]["sql"]).fetchdf()
    ora = ora.astype({k: "int64" for k in ora.columns})
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), ora.reset_index(drop=True))
    # structure sanity at this sf (frozen by the derivation math)
    assert len(eng) == 322
    assert eng["n_cells"].sum() == 623


@pytest.mark.usefixtures("ray_session")
def test_polygonize_cc_distributed_path_parity_sf001():
    """The fine-raster claim: building the adjacency edges as a Ray
    Dataset and running the DISTRIBUTED min-label CC yields the same
    components the driver path computes, on the real sf0.001 mask."""
    import ray.data as rd

    from proj_ray.functions.dedup import cc_min_label_distributed
    from proj_ray.pipelines.queries import (
        _RCELL, _RFRAC, _RNCOL, _RNROW,
    )
    from proj_ray.pipelines.derive import LAT_MUL, LON_MUL

    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber"])
    pid = (li["l_orderkey"].to_numpy(np.int64) * 10
           + li["l_linenumber"].to_numpy(np.int64))
    r = (pid * LAT_MUL % 16000) // _RCELL
    c = (pid * LON_MUL % 36000) // _RCELL
    cnt = np.bincount(r * _RNCOL + c, minlength=_RNROW * _RNCOL)
    nz = np.flatnonzero(cnt)
    cells = pd.DataFrame({"r": nz // _RNCOL, "c": nz % _RNCOL,
                          "n": cnt[nz]}).astype("int64")
    act = active_cells(cells, _RFRAC)
    edges = adjacency_edges(act)

    from proj_ray.functions.dedup import cc_min_label

    driver = cc_min_label(edges, max_rounds=4096)
    dist = cc_min_label_distributed(
        rd.from_pandas(edges), max_rounds=64).to_pandas()
    driver = driver.sort_values("node").reset_index(drop=True)
    dist = dist.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(driver, dist.astype(driver.dtypes.to_dict()))


@pytest.mark.usefixtures("ray_session")
def test_zonal_stats_matches_duckdb_sf0001():
    from proj_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    eng = QUERIES["zonal_stats"]["fn"](sf)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS "
                f"SELECT * FROM read_parquet('{sf}/lineitem.parquet')")
    ora = con.execute(QUERIES["zonal_stats"]["sql"]).fetchdf()
    ora = ora.astype({k: "int64" for k in ora.columns if k != "polygon_id"})
    pd.testing.assert_frame_equal(
        eng.reset_index(drop=True), ora.reset_index(drop=True))
    # every AOI zone is populated at this sf, and zone totals are a
    # strict subset of the corpus
    assert set(eng["polygon_id"]) == {
        "concave_c", "eu_blob", "na_box", "overlap_eu", "south_band"}
    assert 0 < eng["total_points"].sum() < 6001 * 10
