"""Pure NumPy kernels (no Ray imports): math helpers, projections,
geocentric/Helmert, shift grids, tiling, point-in-polygon, geodesics."""
