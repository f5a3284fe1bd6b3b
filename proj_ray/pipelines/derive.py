"""Deterministic point derivation shared by Ray pipelines and the DuckDB
oracle SQL.

The driver's testdata has no coordinate columns, so geospatial queries
derive synthetic-but-deterministic points from integer keys. Every
derivation here is *pure integer arithmetic followed by one division*,
written identically in NumPy and ANSI SQL, so both engines produce
bit-identical float64 values — which is what makes exact value-hash
oracle matches possible for the transform pipelines built on top.

Conventions:
- ``pid`` point id: ``l_orderkey * 10 + l_linenumber`` for lineitem
  points, ``doc_id`` for document points.
- lon in [-180, 180), lat in [-80, 80) (clear of both the tmerc series
  domain edge and the Mercator clip).
"""

from __future__ import annotations

import numpy as np

LON_MUL = 104729  # primes: deterministic pseudo-scatter
LAT_MUL = 7919

# The engine multiplies degrees by this exact literal (DEG_TO_RAD,
# src/proj_api.h:47); oracle SQL must use the same literal rather than
# radians() so both sides run the identical IEEE op sequence.
DEG_TO_RAD_LIT = "0.0174532925199432958e0"


def pid_numpy(orderkey, linenumber):
    return orderkey.astype(np.int64) * 10 + linenumber.astype(np.int64)


PID_SQL = "(l_orderkey * 10 + l_linenumber)"


def lonlat_numpy(pid):
    """pid -> (lon, lat) float64 degrees; exact integer ops + /100."""
    pid = pid.astype(np.int64)
    lon_centi = (pid * LON_MUL) % 36000 - 18000
    lat_centi = (pid * LAT_MUL) % 16000 - 8000
    return lon_centi / 100.0, lat_centi / 100.0


def lonlat_sql(pid_expr: str):
    lon = f"((({pid_expr}) * {LON_MUL}) % 36000 - 18000) / 1.0e2"
    lat = f"((({pid_expr}) * {LAT_MUL}) % 16000 - 8000) / 1.0e2"
    return lon, lat


def lon_band_numpy(pid, lo_centi: int, width_centi: int):
    """lon restricted to a band [lo, lo+width) degrees (e.g. a UTM zone)."""
    pid = pid.astype(np.int64)
    return (lo_centi + (pid * LON_MUL) % width_centi) / 100.0


def lon_band_sql(pid_expr: str, lo_centi: int, width_centi: int):
    return f"({lo_centi} + (({pid_expr}) * {LON_MUL}) % {width_centi}) / 1.0e2"
