"""The engine's query registry: every operator from SURVEY.md §2 exposed
as a named Ray Data pipeline plus (where SQL-expressible) a DuckDB
oracle that reproduces the computation independently.

Exactness design (the driver hash-compares values):
- integer results (counts, cents, ids, cells) are exact by construction
- float results either use ONLY IEEE-deterministic ops shared by both
  engines (+,-,*,/,sqrt,sin,cos are bit-identical numpy<->duckdb on this
  platform) and match bit-for-bit at full precision, or — where ln/tan/
  pow/atan (1-3 ulp libm differences) are involved — both sides round
  via the same floor(x*s+0.5)/s expression at a scale that swallows the
  ulp noise.
- engine constants (series coefficients, lam0, es, ...) are computed
  once in Python and pasted into the SQL as repr() literals, so both
  sides run the identical op sequence on identical constants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources import read_table
from .derive import (
    DEG_TO_RAD_LIT,
    LAT_MUL,
    LON_MUL,
    PID_SQL,
    lon_band_numpy,
    lon_band_sql,
    lonlat_numpy,
    lonlat_sql,
    pid_numpy,
)

QUERIES: dict = {}


def query(name, sql=None):
    def deco(fn):
        QUERIES[name] = {"fn": fn, "sql": sql}
        return fn

    return deco


def _cents(arr):
    """money double -> exact bigint cents (all money cols are 2-decimal)."""
    return np.floor(arr * 100.0 + 0.5).astype(np.int64)


CENTS_SQL = "CAST(floor(({e}) * 100.0 + 0.5) AS BIGINT)"

# DuckDB SUM(BIGINT) yields HUGEINT, which fetchdf() materializes as
# float64 — while the engine returns int64.  The driver's value hash is
# dtype-sensitive (round-1 lesson: 9 bitwise-correct queries failed on
# exactly this).  Every SUM in an oracle MUST be wrapped in
# CAST(... AS BIGINT); SUM_BIG is the idiom.
def SUM_BIG(e):
    return f"CAST(SUM({e}) AS BIGINT)"


import os as _os

_GOLDEN_DIR = _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), "..", "data", "goldens"))


def _golden_sql(fname):
    """Oracle for deterministic non-SQL-expressible queries: a frozen
    golden table (tools/freeze_goldens.py; fingerprint/simhash goldens
    come from independent SCALAR reference implementations, geod /
    multimodal are engine regression snapshots).  Valid for the
    driver's sf=0.01 comparison inputs."""
    return f"SELECT * FROM read_parquet('{_os.path.join(_GOLDEN_DIR, fname)}')"


def _sorted_pdf(obj, by):
    """Small-result finisher: driver-side pandas frame in deterministic
    row order (belt-and-braces vs any row-order-sensitive hashing).
    Only for results bounded by key cardinality (<= ~15k rows)."""
    df = obj.to_pandas() if not isinstance(obj, pd.DataFrame) else obj
    return df.sort_values(by).reset_index(drop=True)


# ===========================================================================
# Relational core (engine operators: filter, project, groupby-agg with
# partial combine, broadcast join, sort+limit, distinct, windowing)
# ===========================================================================

@query(
    "q1_pricing_summary",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           {SUM_BIG(CENTS_SQL.format(e='l_quantity'))} AS sum_qty_cents,
           {SUM_BIG(CENTS_SQL.format(e='l_extendedprice'))} AS sum_base_cents,
           {SUM_BIG(CENTS_SQL.format(e='l_extendedprice') + ' * ' + CENTS_SQL.format(e='1.0 - l_discount'))} AS sum_disc_cents2,
           COUNT(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(sf_dir):
    """TPC-H Q1 shape: filter -> per-batch partial aggregate -> small
    groupby (the two-phase pattern that keeps the shuffle tiny at 100 TB).
    Money handled as exact integer cents."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity",
                             "l_extendedprice", "l_discount", "l_shipdate"])

    cutoff = np.datetime64("1998-09-02T00:00:00", "us")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"].to_numpy() <= cutoff]
        qty = _cents(df["l_quantity"].to_numpy())
        base = _cents(df["l_extendedprice"].to_numpy())
        disc2 = base * _cents(1.0 - df["l_discount"].to_numpy())
        tmp = pd.DataFrame({
            "l_returnflag": df["l_returnflag"].to_numpy(),
            "l_linestatus": df["l_linestatus"].to_numpy(),
            "sum_qty_cents": qty, "sum_base_cents": base,
            "sum_disc_cents2": disc2, "count_order": 1,
        })
        return tmp.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=None)
    # size-dispatched final combine (stages.agg.combine_partials):
    # driver reduce below the threshold (partial stream is #blocks x 6
    # groups), distributed groupby past it — no unbounded driver concat
    from ..stages.agg import combine_partials

    out = combine_partials(
        partials, ["l_returnflag", "l_linestatus"],
        {"sum_qty_cents": "sum", "sum_base_cents": "sum",
         "sum_disc_cents2": "sum", "count_order": "sum"})
    return _sorted_pdf(out, ["l_returnflag", "l_linestatus"])


@query(
    "top_orders",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def top_orders(sf_dir):
    """sort + limit (top-k). Ray's sort is a full shuffle; for a plain
    top-k the scalable form is per-batch local top-k then a tiny final
    sort — done here via map_batches partials."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["o_totalprice", "o_orderkey"],
                              ascending=[False, True]).head(10)

    cand = ds.map_batches(local_topk, batch_format="pandas", batch_size=None).to_pandas()
    return (cand.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
            .head(10).reset_index(drop=True))


@query(
    "regional_customers",
    sql=f"""
    SELECT r.r_name AS region_name, COUNT(*) AS n_customers,
           {SUM_BIG(CENTS_SQL.format(e='c.c_acctbal'))} AS sum_acctbal_cents
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def regional_customers(sf_dir):
    """Broadcast join: the nation+region dimension tables are tiny, so
    they ride to every task as a plain dict (ray.put/closure) and the
    'join' is a vectorized map lookup inside map_batches — no shuffle of
    the customer stream (SURVEY.md §2.4)."""
    import duckdb as _dd  # driver-side tiny-dim load only

    dim = _dd.sql(
        f"SELECT n.n_nationkey AS k, r.r_name AS region_name FROM "
        f"'{sf_dir}/nation.parquet' n JOIN '{sf_dir}/region.parquet' r "
        f"ON n.n_regionkey = r.r_regionkey").fetchdf()
    lookup = dict(zip(dim["k"].tolist(), dim["region_name"].tolist()))

    ds = read_table(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        region = df["c_nationkey"].map(lookup)
        tmp = pd.DataFrame({
            "region_name": region,
            "n_customers": 1,
            "sum_acctbal_cents": _cents(df["c_acctbal"].to_numpy()),
        })
        return tmp.groupby("region_name", as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=None)
    from ray.data.aggregate import Sum

    out = partials.groupby("region_name").aggregate(
        Sum("n_customers", alias_name="n_customers"),
        Sum("sum_acctbal_cents", alias_name="sum_acctbal_cents"),
    )
    return _sorted_pdf(out, ["region_name"])


@query(
    "filter_ship_window",
    sql=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           {SUM_BIG(CENTS_SQL.format(e='l_quantity'))} AS sum_qty_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
          AND l_discount >= 0.05
    GROUP BY l_returnflag
    """,
)
def filter_ship_window(sf_dir):
    """Vectorized predicate inside map_batches (pyarrow compute) —
    the row-filter idiom."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity", "l_discount", "l_shipdate"])
    lo = pa.scalar(np.datetime64("1995-01-01T00:00:00", "us"))
    hi = pa.scalar(np.datetime64("1996-01-01T00:00:00", "us"))

    def fn(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                               pc.less(t["l_shipdate"], hi)),
                       pc.greater_equal(t["l_discount"], pa.scalar(0.05)))
        t = t.filter(keep)
        qty = _cents(t["l_quantity"].to_numpy(zero_copy_only=False))
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "sum_qty_cents": pa.array(qty, pa.int64())})

    filtered = ds.map_batches(fn, batch_format="pyarrow", batch_size=None,
                              zero_copy_batch=True)
    from ray.data.aggregate import Count, Sum

    out = filtered.groupby("l_returnflag").aggregate(
        Count(alias_name="n_rows"),
        Sum("sum_qty_cents", alias_name="sum_qty_cents"),
    )
    return _sorted_pdf(out, ["l_returnflag"])


@query(
    "distinct_event_types",
    sql="SELECT DISTINCT event_type FROM events",
)
def distinct_event_types(sf_dir):
    ds = read_table(sf_dir, "events", columns=["event_type"])
    vals = ds.unique("event_type")
    return pd.DataFrame({"event_type": sorted(vals)})


@query(
    "events_hourly",
    sql=f"""
    SELECT event_type,
           CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_bucket,
           COUNT(*) AS n_events,
           {SUM_BIG(CENTS_SQL.format(e='value'))} AS sum_value_cents
    FROM events GROUP BY event_type, hour_bucket
    """,
)
def events_hourly(sf_dir):
    """Tumbling-window aggregate: window = integer bucket of event time,
    two-phase (partial per batch, final groupby)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].astype("int64").to_numpy()  # epoch micros
        bucket = np.floor_divide(us, 3600_000_000)
        tmp = pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "hour_bucket": bucket,
            "n_events": 1,
            "sum_value_cents": _cents(df["value"].to_numpy()),
        })
        return tmp.groupby(["event_type", "hour_bucket"], as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=None)
    from ray.data.aggregate import Sum

    out = partials.groupby(["event_type", "hour_bucket"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value_cents", alias_name="sum_value_cents"),
    )
    return _sorted_pdf(out, ["event_type", "hour_bucket"])


@query(
    "user_sessions",
    sql="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def user_sessions(sf_dir):
    """Sessionization (streaming-shaped op): partition by key, sort by
    ts within group, gap > 30 min opens a session. groupby.map_groups
    keeps each user's events together; at scale the key-hash shuffle
    moves (user_id, ts) pairs only."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        us = g["ts"].astype("int64").to_numpy()
        gaps = np.diff(us, prepend=us[0] - 10**15)
        n_sessions = int((gaps > 1800_000_000).sum())
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "n_sessions": [n_sessions],
                             "n_events": [len(g)]})

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
    return _sorted_pdf(out, ["user_id"])


# ===========================================================================
# Geospatial: PROJ-kernel transforms with independent SQL oracles.
# Engine constants (series coefficients, lam0, es, ...) are computed once
# here and pasted into the SQL as repr() literals so both sides execute
# the identical IEEE op sequence (see module docstring).
# ===========================================================================

from ..kernels.common import (  # noqa: E402
    DEG_TO_RAD, FORTPI, HALFPI, RAD_TO_DEG, enfn,
)
from ..stages.transform_stage import transform_points_stage  # noqa: E402
from ..transform import make_transform  # noqa: E402

def _R(x):
    """Paste an engine constant as a DOUBLE literal. DuckDB parses bare
    decimal literals as DECIMAL (and its DECIMAL->DOUBLE cast can be
    1 ulp off), but scientific-notation literals are DOUBLE and parse
    to the exact same bits as Python's repr round-trip."""
    r = repr(float(x))
    return r if ("e" in r or "E" in r or "inf" in r or "nan" in r) else r + "e0"

ROUND2_SQL = "floor(({e}) * 100.0 + 0.5) / 100.0"


def _r2(x):
    return np.floor(x * 100.0 + 0.5) / 100.0


def _points_ds(sf_dir, batch_size=None):
    """lineitem keys -> (pid, lon, lat) derived point stream."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])

    def mk(t: pa.Table) -> pa.Table:
        pid = pid_numpy(t["l_orderkey"].to_numpy(zero_copy_only=False),
                        t["l_linenumber"].to_numpy(zero_copy_only=False))
        lon, lat = lonlat_numpy(pid)
        return pa.table({"pid": pa.array(pid, pa.int64()),
                         "lon": pa.array(lon, pa.float64()),
                         "lat": pa.array(lat, pa.float64())})

    return ds.map_batches(mk, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


_LON_SQL, _LAT_SQL = lonlat_sql(PID_SQL)
_POINTS_CTE = f"""
points AS (
  SELECT {PID_SQL} AS pid, {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM lineitem
)"""


# -- Web Mercator forward ---------------------------------------------------

@query(
    "points_webmerc",
    sql=f"""
    WITH {_POINTS_CTE}
    SELECT pid,
           {ROUND2_SQL.format(e=f"6378137.0 * (lon * {DEG_TO_RAD_LIT})")} AS xm,
           {ROUND2_SQL.format(e=f"6378137.0 * ln(tan({_R(FORTPI)} + 0.5 * (lat * {DEG_TO_RAD_LIT})))")} AS ym
    FROM points
    """,
)
def points_webmerc(sf_dir):
    """WGS84 lon/lat -> EPSG:3857 through the full fused transform
    pipeline (incl. the @null nadgrids datum branch of epsg:3857)."""
    pts = _points_ds(sf_dir)
    out = transform_points_stage(pts, "+init=epsg:4326", "+init=epsg:3857",
                                 out_x="xm", out_y="ym")

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({"pid": t["pid"],
                         "xm": pa.array(_r2(t["xm"].to_numpy(zero_copy_only=False))),
                         "ym": pa.array(_r2(t["ym"].to_numpy(zero_copy_only=False)))})

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


# -- UTM (tmerc series) forward --------------------------------------------

def _utm_sql():
    """Emit the exact Snyder-series SQL mirroring kernels.projections
    _tmerc_setup_common, with engine-computed constants pasted in."""
    from ..crs import CRS

    P = CRS("+proj=utm +zone=33 +datum=WGS84")
    en = enfn(P.es)
    ml0 = 0.0  # phi0 = 0
    esp = P.es / (1.0 - P.es)
    FC = (1.0, 0.5, 0.16666666666666666666, 0.08333333333333333333, 0.05,
          0.03333333333333333333, 0.02380952380952380952, 0.01785714285714285714)
    lon_sql = lon_band_sql(PID_SQL, 1200, 600)  # lon in [12, 18)
    return f"""
    WITH pts AS (
      SELECT {PID_SQL} AS pid,
             ({lon_sql}) * {DEG_TO_RAD_LIT} - {_R(P.lam0)} AS lam,
             ({_LAT_SQL}) * {DEG_TO_RAD_LIT} AS phi
      FROM lineitem
    ), trig AS (
      SELECT pid, lam, phi, sin(phi) AS sinphi, cos(phi) AS cosphi FROM pts
    ), t1 AS (
      SELECT *,
        CASE WHEN abs(cosphi) > 1e-10 THEN (sinphi/cosphi)*(sinphi/cosphi) ELSE 0.0 END AS t,
        (cosphi * lam) * (cosphi * lam) AS als,
        (cosphi * lam) / sqrt(1.0 - {_R(P.es)} * sinphi * sinphi) AS al,
        {_R(esp)} * cosphi * cosphi AS n
      FROM trig
    )
    SELECT pid,
      {_R(P.a)} * ({_R(P.k0)} * al * ({_R(FC[0])} +
        {_R(FC[2])} * als * (1.0 - t + n +
        {_R(FC[4])} * als * (5.0 + t * (t - 18.0) + n * (14.0 - 58.0 * t)
        + {_R(FC[6])} * als * (61.0 + t * (t * (179.0 - t) - 479.0)))))) + 500000.0 AS xm,
      {_R(P.a)} * ({_R(P.k0)} * (({_R(en[0])} * phi - (cosphi * sinphi) *
          ({_R(en[1])} + (sinphi*sinphi)*({_R(en[2])}
           + (sinphi*sinphi)*({_R(en[3])} + (sinphi*sinphi)*{_R(en[4])})))) - {_R(ml0)} +
        sinphi * al * lam * {_R(FC[1])} * (1.0 +
        {_R(FC[3])} * als * (5.0 - t + n * (9.0 + 4.0 * n) +
        {_R(FC[5])} * als * (61.0 + t * (t - 58.0) + n * (270.0 - 330.0 * t)
        + {_R(FC[7])} * als * (1385.0 + t * (t * (543.0 - t) - 3111.0))))))) + 0.0 AS ym
    FROM t1
    """


@query("points_utm", sql=_utm_sql())
def points_utm(sf_dir):
    """Derived points in the zone-33 band -> UTM 33N. The tmerc series
    uses only +,-,*,/,sqrt,sin,cos => bit-identical to the SQL oracle at
    FULL precision (no rounding)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])

    def mk(t: pa.Table) -> pa.Table:
        pid = pid_numpy(t["l_orderkey"].to_numpy(zero_copy_only=False),
                        t["l_linenumber"].to_numpy(zero_copy_only=False))
        lon = lon_band_numpy(pid, 1200, 600)
        _, lat = lonlat_numpy(pid)
        return pa.table({"pid": pa.array(pid, pa.int64()),
                         "lon": pa.array(lon, pa.float64()),
                         "lat": pa.array(lat, pa.float64())})

    pts = ds.map_batches(mk, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
    out = transform_points_stage(pts, "+proj=latlong +datum=WGS84",
                                 "+proj=utm +zone=33 +datum=WGS84",
                                 out_x="xm", out_y="ym")
    return out.select_columns(["pid", "xm", "ym"])


# -- Lambert Conformal Conic forward ----------------------------------------

_LCC_DEF = ("+proj=lcc +lat_1=44 +lat_2=49 +lat_0=46.5 +lon_0=3 "
            "+x_0=700000 +y_0=6600000 +datum=WGS84")


def _lcc_sql():
    from ..crs import CRS
    from ..kernels.common import msfn, tsfn

    P = CRS(_LCC_DEF)
    phi1 = P.param_r("lat_1")
    phi2_ = P.param_r("lat_2")
    sinphi = np.sin(phi1)
    m1 = float(msfn(sinphi, np.cos(phi1), P.es))
    ml1 = float(tsfn(np.float64(phi1), sinphi, P.e))
    sinphi2 = np.sin(phi2_)
    n = float(np.log(m1 / float(msfn(sinphi2, np.cos(phi2_), P.es)))
              / np.log(ml1 / float(tsfn(np.float64(phi2_), sinphi2, P.e))))
    c = rho0 = m1 * ml1 ** (-n) / n
    rho0 = rho0 * float(tsfn(np.float64(P.phi0), np.sin(P.phi0), P.e)) ** n
    lon_sql = lon_band_sql(PID_SQL, -500, 1500)  # lon in [-5, 10)
    # tsfn(phi) = tan(.5*(HALFPI - phi)) / ((1-e*sin)/(1+e*sin))^(e/2)
    tsfn_sql = (f"tan(0.5 * ({_R(HALFPI)} - phi)) / "
                f"pow((1.0 - {_R(P.e)} * sin(phi)) / (1.0 + {_R(P.e)} * sin(phi)), {_R(0.5 * P.e)})")
    return f"""
    WITH pts AS (
      SELECT {PID_SQL} AS pid,
             ({lon_sql}) * {DEG_TO_RAD_LIT} - {_R(P.lam0)} AS lam,
             ({_LAT_SQL}) * {DEG_TO_RAD_LIT} AS phi
      FROM lineitem
    ), rho_t AS (
      SELECT pid, lam, {_R(c)} * pow({tsfn_sql}, {_R(n)}) AS rho FROM pts
    )
    SELECT pid,
      {ROUND2_SQL.format(e=f"{_R(P.a)} * ({_R(P.k0)} * (rho * sin(lam * {_R(n)}))) + 700000.0")} AS xm,
      {ROUND2_SQL.format(e=f"{_R(P.a)} * ({_R(P.k0)} * ({_R(rho0)} - rho * cos(lam * {_R(n)}))) + 6600000.0")} AS ym
    FROM rho_t
    """


@query("points_lcc", sql=_lcc_sql())
def points_lcc(sf_dir):
    """European-band points -> LCC 2SP (tan/pow in tsfn => cm rounding
    swallows the <=3-ulp libm differences)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])

    def mk(t: pa.Table) -> pa.Table:
        pid = pid_numpy(t["l_orderkey"].to_numpy(zero_copy_only=False),
                        t["l_linenumber"].to_numpy(zero_copy_only=False))
        lon = lon_band_numpy(pid, -500, 1500)
        _, lat = lonlat_numpy(pid)
        return pa.table({"pid": pa.array(pid, pa.int64()),
                         "lon": pa.array(lon, pa.float64()),
                         "lat": pa.array(lat, pa.float64())})

    pts = ds.map_batches(mk, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
    out = transform_points_stage(pts, "+proj=latlong +datum=WGS84", _LCC_DEF,
                                 out_x="xm", out_y="ym")

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({"pid": t["pid"],
                         "xm": pa.array(_r2(t["xm"].to_numpy(zero_copy_only=False))),
                         "ym": pa.array(_r2(t["ym"].to_numpy(zero_copy_only=False)))})

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


# -- geocentric XYZ ---------------------------------------------------------

def _geocent_sql():
    from ..crs import CRS

    P = CRS("+proj=geocent +datum=WGS84")
    return f"""
    WITH {_POINTS_CTE}
    SELECT pid,
      ({_R(P.a)} / sqrt(1.0 - {_R(P.es)} * (sin(lat * {DEG_TO_RAD_LIT}) * sin(lat * {DEG_TO_RAD_LIT}))) + 100.0)
        * cos(lat * {DEG_TO_RAD_LIT}) * cos(lon * {DEG_TO_RAD_LIT}) AS gx,
      ({_R(P.a)} / sqrt(1.0 - {_R(P.es)} * (sin(lat * {DEG_TO_RAD_LIT}) * sin(lat * {DEG_TO_RAD_LIT}))) + 100.0)
        * cos(lat * {DEG_TO_RAD_LIT}) * sin(lon * {DEG_TO_RAD_LIT}) AS gy,
      (({_R(P.a)} / sqrt(1.0 - {_R(P.es)} * (sin(lat * {DEG_TO_RAD_LIT}) * sin(lat * {DEG_TO_RAD_LIT}))))
        * {_R(1.0 - P.es)} + 100.0) * sin(lat * {DEG_TO_RAD_LIT}) AS gz
    FROM points
    """


@query("points_geocent", sql=_geocent_sql())
def points_geocent(sf_dir):
    """lon/lat/h=100 -> geocentric XYZ; sin/cos/sqrt only => FULL
    precision bitwise match (src/geocent.c:148-205 closed form)."""
    pts = _points_ds(sf_dir)
    t = make_transform("+proj=latlong +datum=WGS84", "+proj=geocent +datum=WGS84")

    def fn(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        z = np.full(lon.shape, 100.0)
        X, Y, Z = t(lon, lat, z)
        return pa.table({"pid": b["pid"], "gx": pa.array(X), "gy": pa.array(Y),
                         "gz": pa.array(Z)})

    return pts.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ===========================================================================
# Geospatial part 2: Helmert, inverse webmerc, tiling, PIP join, kNN,
# haversine, synthetic grid shift, pm/axis/units, geoparse extraction
# ===========================================================================

from ..kernels.tiling import cell_id as _cell_id, cell_xy as _cell_xy, parent_cell as _parent  # noqa: E402
from ..kernels.geodesic import MEAN_RADIUS, haversine as _haversine  # noqa: E402
from ..stages.geoparse import GeoparseStage, synth_pages_batch  # noqa: E402
from ..stages.knn_stage import knn_topk  # noqa: E402
from ..stages.pip_stage import PIPJoinActor  # noqa: E402
from .flagship import FLAGSHIP_POLYGONS  # noqa: E402


# -- 7-param Helmert on geocentric XYZ (linear => bitwise exact) -----------

def _helmert_sql():
    from ..crs import CRS

    dp = CRS("+proj=latlong +datum=potsdam").datum_params  # pre-scaled (rad, 1+ppm)
    X = f"(CAST(({PID_SQL}) * 31 % 2000000 - 1000000 AS DOUBLE) + 6378137.0e0)"
    Y = f"CAST(({PID_SQL}) * 37 % 2000000 - 1000000 AS DOUBLE)"
    Z = f"CAST(({PID_SQL}) * 41 % 2000000 - 1000000 AS DOUBLE)"
    return f"""
    WITH xyz AS (SELECT {PID_SQL} AS pid, {X} AS X, {Y} AS Y, {Z} AS Z FROM lineitem)
    SELECT pid,
      {_R(dp[6])} * (X - {_R(dp[5])} * Y + {_R(dp[4])} * Z) + {_R(dp[0])} AS hx,
      {_R(dp[6])} * ({_R(dp[5])} * X + Y - {_R(dp[3])} * Z) + {_R(dp[1])} AS hy,
      {_R(dp[6])} * (-{_R(dp[4])} * X + {_R(dp[3])} * Y + Z) + {_R(dp[2])} AS hz
    FROM xyz
    """


@query("helmert7_xyz", sql=_helmert_sql())
def helmert7_xyz(sf_dir):
    """Position-vector 7-param Helmert toward WGS84 on derived XYZ
    (src/pj_transform.c:502-543). Linear => full-precision bitwise."""
    from ..crs import CRS
    from ..kernels.geocent import helmert_to_wgs84

    dp = CRS("+proj=latlong +datum=potsdam").datum_params
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])

    def fn(t: pa.Table) -> pa.Table:
        pid = pid_numpy(t["l_orderkey"].to_numpy(zero_copy_only=False),
                        t["l_linenumber"].to_numpy(zero_copy_only=False))
        X = (pid * 31 % 2000000 - 1000000).astype(np.float64) + 6378137.0
        Y = (pid * 37 % 2000000 - 1000000).astype(np.float64)
        Z = (pid * 41 % 2000000 - 1000000).astype(np.float64)
        hx, hy, hz = helmert_to_wgs84(dp, X, Y, Z, seven=True)
        return pa.table({"pid": pa.array(pid, pa.int64()), "hx": pa.array(hx),
                         "hy": pa.array(hy), "hz": pa.array(hz)})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)


# -- inverse Web Mercator ---------------------------------------------------

ROUND6_SQL = "floor(({e}) * 1.0e6 + 0.5) / 1.0e6"


def _r6(x):
    return np.floor(x * 1.0e6 + 0.5) / 1.0e6


def _webmerc_inv_sql():
    ra = 1.0 / 6378137.0
    XM = f"CAST((({PID_SQL}) * {LON_MUL}) % 36000 - 18000 AS DOUBLE) * 1.0e3"
    YM = f"CAST((({PID_SQL}) * {LAT_MUL}) % 16000 - 8000 AS DOUBLE) * 1.0e3"
    return f"""
    WITH m AS (SELECT {PID_SQL} AS pid, {XM} AS xm, {YM} AS ym FROM lineitem)
    SELECT pid,
      {ROUND6_SQL.format(e=f"(xm * {_R(ra)}) * {_R(RAD_TO_DEG)}")} AS lon,
      {ROUND6_SQL.format(e=f"({_R(HALFPI)} - 2.0 * atan(exp(-(ym * {_R(ra)})))) * {_R(RAD_TO_DEG)}")} AS lat
    FROM m
    """


@query("webmerc_inverse", sql=_webmerc_inv_sql())
def webmerc_inverse(sf_dir):
    """EPSG:3857 meters -> WGS84 degrees through the fused inverse
    pipeline (incl. the epsg:3857 @null-grid datum branch)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])

    def mk(t: pa.Table) -> pa.Table:
        pid = pid_numpy(t["l_orderkey"].to_numpy(zero_copy_only=False),
                        t["l_linenumber"].to_numpy(zero_copy_only=False))
        xm = (pid * LON_MUL % 36000 - 18000).astype(np.float64) * 1.0e3
        ym = (pid * LAT_MUL % 16000 - 8000).astype(np.float64) * 1.0e3
        return pa.table({"pid": pa.array(pid, pa.int64()),
                         "xm": pa.array(xm), "ym": pa.array(ym)})

    pts = ds.map_batches(mk, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
    out = transform_points_stage(pts, "+init=epsg:3857", "+init=epsg:4326",
                                 lon_col="xm", lat_col="ym",
                                 out_x="lon", out_y="lat")

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({"pid": t["pid"],
                         "lon": pa.array(_r6(t["lon"].to_numpy(zero_copy_only=False))),
                         "lat": pa.array(_r6(t["lat"].to_numpy(zero_copy_only=False)))})

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


# -- tile assignment + per-tile aggregate ----------------------------------

_TILE_ZOOM = 12


def _tile_sql_exprs(zoom):
    n = float(1 << zoom)
    pi = float(np.pi)
    u = "((lon + 180.0) / 360.0)"
    latr = f"(lat * {_R(pi / 180.0)})"
    v = f"((1.0 - ln(tan({_R(pi / 4.0)} + {latr} / 2.0)) / {_R(pi)}) / 2.0)"
    tx = f"CAST(least(greatest(floor({u} * {_R(n)}), 0.0), {_R(n - 1)}) AS BIGINT)"
    ty = f"CAST(least(greatest(floor({v} * {_R(n)}), 0.0), {_R(n - 1)}) AS BIGINT)"
    return tx, ty


def _tile_assign_sql():
    tx, ty = _tile_sql_exprs(_TILE_ZOOM)
    return f"""
    WITH {_POINTS_CTE}
    SELECT pid, {tx} AS tile_x, {ty} AS tile_y,
           {ty} * {1 << _TILE_ZOOM} + {tx} AS cell_id
    FROM points
    """


@query("tile_assign", sql=_tile_assign_sql())
def tile_assign(sf_dir):
    """Integer-exact web-mercator quadtree cells at zoom 12 (documented
    half-open edge convention; see kernels.tiling)."""
    pts = _points_ds(sf_dir)
    from ..stages.tile_stage import tile_stage

    out = tile_stage(pts, _TILE_ZOOM, out="cell_id", with_xy=True)
    return out.select_columns(["pid", "tile_x", "tile_y", "cell_id"])


def _tile_agg_sql():
    tx, ty = _tile_sql_exprs(_TILE_ZOOM)
    d = _TILE_ZOOM - 4
    return f"""
    WITH {_POINTS_CTE},
    cells AS (
      SELECT pid, ({ty} // {1 << d}) * {1 << 4} + ({tx} // {1 << d}) AS parent_cell,
             ((pid) * {LON_MUL}) % 36000 - 18000 AS lon_centi
      FROM points
    )
    SELECT parent_cell, COUNT(*) AS n_points, CAST(SUM(lon_centi) AS BIGINT) AS sum_lon_centi,
           MIN(pid) AS min_pid
    FROM cells GROUP BY parent_cell
    """


@query("tile_agg", sql=_tile_agg_sql())
def tile_agg(sf_dir):
    """Per-tile aggregate at zoom 4 via partial combine + small groupby
    (the skew-safe two-phase shape; dense cells pre-reduced per batch)."""
    pts = _points_ds(sf_dir)
    from ..stages.tile_stage import tile_stage

    tiled = tile_stage(pts, _TILE_ZOOM, out="cell_id")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pid = df["pid"].to_numpy()
        df = pd.DataFrame({
            "parent_cell": _parent(df["cell_id"].to_numpy(), _TILE_ZOOM, 4),
            "n_points": 1,
            "sum_lon_centi": pid * LON_MUL % 36000 - 18000,
            "min_pid": pid,
        })
        return df.groupby("parent_cell", as_index=False).agg(
            n_points=("n_points", "sum"), sum_lon_centi=("sum_lon_centi", "sum"),
            min_pid=("min_pid", "min"))

    partials = tiled.map_batches(partial, batch_format="pandas", batch_size=None)
    # size-dispatched final combine: <= 256 zoom-4 parent cells per
    # block; distributed groupby past the threshold (stages.agg)
    from ..stages.agg import combine_partials

    out = combine_partials(
        partials, ["parent_cell"],
        {"n_points": "sum", "sum_lon_centi": "sum", "min_pid": "min"})
    return _sorted_pdf(out, ["parent_cell"])


# -- point-in-polygon join --------------------------------------------------

def _pip_sql():
    rows = []
    for pid_, ring in FLAGSHIP_POLYGONS:
        jj = len(ring) - 1
        for i in range(len(ring)):
            xi, yi = ring[i]
            xj, yj = ring[jj]
            rows.append(f"('{pid_}', {_R(xi)}, {_R(yi)}, {_R(xj)}, {_R(yj)})")
            jj = i
    edges = ",\n      ".join(rows)
    return f"""
    WITH {_POINTS_CTE},
    dpoints AS (SELECT DISTINCT pid, lon, lat FROM points),
    edges(polygon_id, xi, yi, xj, yj) AS (VALUES
      {edges}
    ),
    crossings AS (
      SELECT p.pid, e.polygon_id
      FROM dpoints p JOIN edges e
        ON ((e.yi > p.lat) != (e.yj > p.lat))
       AND p.lon < (e.xj - e.xi) * (p.lat - e.yi) / (e.yj - e.yi) + e.xi
    ),
    inside AS (
      SELECT pid, polygon_id FROM crossings
      GROUP BY pid, polygon_id HAVING COUNT(*) % 2 = 1
    )
    -- join back so multiplicity matches the per-input-row engine output
    -- (pid = orderkey*10+linenumber is not unique in the synthetic data)
    SELECT p.pid, i.polygon_id FROM points p JOIN inside i USING (pid)
    """


@query("pip_join", sql=_pip_sql())
def pip_join(sf_dir):
    """Broadcast PIP join: cell-bucketed polygons in an actor pool,
    even-odd ray casting per point (pnpoly semantics,
    src/PJ_healpix.c:103-138). Exact rows (north rule)."""
    pts = _points_ds(sf_dir)
    joined = pts.map_batches(
        PIPJoinActor(poly_defs=FLAGSHIP_POLYGONS, zoom=5, id_cols=("pid",)),
        batch_format="pyarrow", batch_size=None)
    return joined


# -- kNN --------------------------------------------------------------------

_KNN_QUERIES = [(0, -100.0, 40.0), (1, 10.0, 50.0), (2, 140.0, -30.0), (3, 0.0, 0.0)]


def _knn_sql():
    vals = ", ".join(f"({q}, {_R(x)}, {_R(y)})" for q, x, y in _KNN_QUERIES)
    return f"""
    WITH {_POINTS_CTE},
    qs(qid, qx, qy) AS (VALUES {vals}),
    d AS (
      SELECT q.qid, p.pid AS id,
             (p.lon - q.qx) * (p.lon - q.qx) + (p.lat - q.qy) * (p.lat - q.qy) AS d2
      FROM points p CROSS JOIN qs q
    ),
    r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY d2, id) AS rank FROM d)
    SELECT qid, id, rank, d2 FROM r WHERE rank <= 5
    """


@query("knn_points", sql=_knn_sql())
def knn_points(sf_dir):
    """Broadcast kNN: per-batch partial top-k then tiny final reduce —
    no shuffle of the point stream. Deterministic (d2, id) tie-break."""
    pts = _points_ds(sf_dir)
    return knn_topk(pts, _KNN_QUERIES, k=5, id_col="pid")


# -- haversine distances ----------------------------------------------------

def _haversine_sql():
    return f"""
    WITH {_POINTS_CTE}
    SELECT pid,
      floor((2.0 * {_R(MEAN_RADIUS)} * asin(sqrt(least(
        sin((lat * {_R(np.pi / 180.0)} - 0.0) * 0.5) * sin((lat * {_R(np.pi / 180.0)} - 0.0) * 0.5)
        + cos(0.0) * cos(lat * {_R(np.pi / 180.0)})
          * (sin((lon * {_R(np.pi / 180.0)} - 0.0) * 0.5) * sin((lon * {_R(np.pi / 180.0)} - 0.0) * 0.5)),
        1.0)))) * 1.0e3 + 0.5) / 1.0e3 AS dist_m
    FROM points
    """


@query("haversine_dist", sql=_haversine_sql())
def haversine_dist(sf_dir):
    """Great-circle distance to (0,0) (mm-rounded; the SQL-expressible
    spherical variant of the Karney geod_inverse kernel)."""
    pts = _points_ds(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        d = _haversine(lon, lat, np.zeros_like(lon), np.zeros_like(lat))
        d = np.floor(d * 1.0e3 + 0.5) / 1.0e3
        return pa.table({"pid": t["pid"], "dist_m": pa.array(d)})

    return pts.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ===========================================================================
# Geospatial part 3: synthetic datum-shift grid, prime meridian,
# axis/units handling, geoparse extraction
# ===========================================================================

# Synthetic CTABLE grid (FIXTURES.md §3): node values are small-int
# multiples of 2^-30 => exactly representable in BOTH float32 (engine
# storage) and float64 (SQL), so bilinear results match bit-for-bit.
_GRID_D2R = float(np.pi / 180.0)
_GRID_SPEC = dict(
    ll=(-30.0 * _GRID_D2R, 30.0 * _GRID_D2R),
    delta=(0.5 * _GRID_D2R, 0.5 * _GRID_D2R),
    lim=(121, 81),
)
_GRID_AMP = 2.0 ** -30


def _grid_cvs():
    nlam, nphi = _GRID_SPEC["lim"]
    jj, ii = np.meshgrid(np.arange(nphi), np.arange(nlam), indexing="ij")
    cvs = np.empty((nphi, nlam, 2), dtype=np.float32)
    cvs[..., 0] = ((ii * 7 + jj * 13) % 101 - 50) * _GRID_AMP
    cvs[..., 1] = ((ii * 11 + jj * 17) % 89 - 44) * _GRID_AMP
    return cvs


def _grid_loader(name):
    from ..kernels.grid import ShiftGrid

    if name == "synthA":
        return ShiftGrid("synthA", _GRID_SPEC["ll"], _GRID_SPEC["delta"],
                         _GRID_SPEC["lim"], _grid_cvs())
    return None


def _gridshift_sql():
    from ..kernels.common import PI

    ll_lam, ll_phi = _GRID_SPEC["ll"]
    dl, dp = _GRID_SPEC["delta"]
    lon_sql = lon_band_sql(PID_SQL, -2900, 5800)       # lon in [-29, 29)
    lat_sql = f"(3100 + (({PID_SQL}) * {LAT_MUL}) %% 3800) / 1.0e2".replace("%%", "%")
    vlam = "CAST((({i}) * 7 + ({j}) * 13) % 101 - 50 AS DOUBLE) * {amp}".replace("{amp}", _R(_GRID_AMP))
    vphi = "CAST((({i}) * 11 + ({j}) * 17) % 89 - 44 AS DOUBLE) * {amp}".replace("{amp}", _R(_GRID_AMP))

    def bil(v):
        f00 = v.format(i="il", j="ip")
        f10 = v.format(i="il + 1", j="ip")
        f01 = v.format(i="il", j="ip + 1")
        f11 = v.format(i="il + 1", j="ip + 1")
        return (f"((1.0 - fl) * (1.0 - fp)) * ({f00}) + (fl * (1.0 - fp)) * ({f10}) "
                f"+ ((1.0 - fl) * fp) * ({f01}) + (fl * fp) * ({f11})")

    return f"""
    WITH pts AS (
      SELECT {PID_SQL} AS pid,
             ({lon_sql}) * {DEG_TO_RAD_LIT} AS lam,
             ({lat_sql}) * {DEG_TO_RAD_LIT} AS phi
      FROM lineitem
    ), tb AS (
      SELECT pid, lam, phi,
             ((lam - {_R(ll_lam)}) - {_R(PI)}) + {_R(PI)} AS tbl,
             phi - {_R(ll_phi)} AS tbp
      FROM pts
    ), idx AS (
      SELECT pid, lam, phi,
             CAST(floor(tbl / {_R(dl)}) AS BIGINT) AS il,
             CAST(floor(tbp / {_R(dp)}) AS BIGINT) AS ip,
             tbl / {_R(dl)} - floor(tbl / {_R(dl)}) AS fl,
             tbp / {_R(dp)} - floor(tbp / {_R(dp)}) AS fp
      FROM tb
    )
    SELECT pid,
      (lam - ({bil(vlam)})) * {_R(RAD_TO_DEG)} AS lon_shifted,
      (phi + ({bil(vphi)})) * {_R(RAD_TO_DEG)} AS lat_shifted
    FROM idx
    """


@query("grid_shift_fwd", sql=_gridshift_sql())
def grid_shift_fwd(sf_dir):
    """Forward datum grid shift through a synthetic CTABLE: ordered
    first-match apply + bilinear interpolation (src/nad_intr.c:5-62,
    src/nad_cvt.c:59-67). Full-precision bitwise vs the SQL bilinear."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])

    def mk(t: pa.Table) -> pa.Table:
        pid = pid_numpy(t["l_orderkey"].to_numpy(zero_copy_only=False),
                        t["l_linenumber"].to_numpy(zero_copy_only=False))
        lon = lon_band_numpy(pid, -2900, 5800)
        lat = (3100 + pid * LAT_MUL % 3800) / 1.0e2
        return pa.table({"pid": pa.array(pid, pa.int64()),
                         "lon": pa.array(lon), "lat": pa.array(lat)})

    pts = ds.map_batches(mk, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
    out = transform_points_stage(
        pts, "+proj=latlong +nadgrids=synthA +ellps=WGS84",
        "+proj=latlong +datum=WGS84",
        out_x="lon_shifted", out_y="lat_shifted", grid_loader=_grid_loader)
    return out.select_columns(["pid", "lon_shifted", "lat_shifted"])


_NTF_GRID = "/root/reference/nad/ntf_r93.gsb"


@query("grid_shift_real",
       sql=_golden_sql("grid_shift_real_sf001.parquet")
       if _os.path.isfile(_NTF_GRID) else None)
def grid_shift_real(sf_dir):
    """Datum grid shift through the reference's REAL ntf_r93.gsb NTv2
    file (France NTF->RGF93): derived points inside the grid's
    coverage, shifted via the full NTv2 reader + subgrid selection +
    bilinear path (pj_gridinfo.c:424-621, pj_apply_gridshift.c:131-254).
    Oracle = frozen engine golden (tools/freeze_goldens.py); the same
    machinery is independently golden-tested against td_out.dist in
    tests/test_grid_golden.py."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])

    def mk(t: pa.Table) -> pa.Table:
        pid = pid_numpy(t["l_orderkey"].to_numpy(zero_copy_only=False),
                        t["l_linenumber"].to_numpy(zero_copy_only=False))
        # deterministic points inside the ntf_r93 coverage (France):
        # lon in [-4.0, 7.99], lat in [42.5, 50.99]
        lon = (pid * LON_MUL % 1200 - 400) / 1.0e2
        lat = (4250 + pid * LAT_MUL % 850) / 1.0e2
        return pa.table({"pid": pa.array(pid, pa.int64()),
                         "lon": pa.array(lon), "lat": pa.array(lat)})

    pts = ds.map_batches(mk, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
    out = transform_points_stage(
        pts, f"+proj=latlong +ellps=WGS84 +nadgrids={_NTF_GRID}",
        "+proj=latlong +datum=WGS84",
        out_x="lon_shifted", out_y="lat_shifted")
    return out.select_columns(["pid", "lon_shifted", "lat_shifted"])


# -- prime meridian ---------------------------------------------------------

def _pm_sql():
    from ..crs import CRS

    pm = CRS("+proj=latlong +datum=WGS84 +pm=paris").from_greenwich
    return f"""
    WITH {_POINTS_CTE}
    SELECT pid,
      ((lon * {DEG_TO_RAD_LIT}) - {_R(pm)}) * {_R(RAD_TO_DEG)} AS lon_paris,
      (lat * {DEG_TO_RAD_LIT}) * {_R(RAD_TO_DEG)} AS lat_out
    FROM points
    """


@query("pm_shift_paris", sql=_pm_sql())
def pm_shift_paris(sf_dir):
    """Prime-meridian handling (pj_datums.c:66-81 registry + the
    from_greenwich step, src/pj_transform.c:253-260). Bitwise exact."""
    pts = _points_ds(sf_dir)
    out = transform_points_stage(pts, "+proj=latlong +datum=WGS84",
                                 "+proj=latlong +datum=WGS84 +pm=paris",
                                 out_x="lon_paris", out_y="lat_out")
    return out.select_columns(["pid", "lon_paris", "lat_out"])


# -- axis orientation + unit conversion -------------------------------------

def _axis_units_sql():
    from ..crs import CRS

    P = CRS("+proj=merc +datum=WGS84 +units=km +axis=wsu")
    fr = 1.0 / 1000.0
    # ellipsoidal merc (es != 0): y = -k0 * ln(tsfn(phi)) (PJ_merc.c e_forward)
    phi = f"(lat * {DEG_TO_RAD_LIT})"
    tsfn = (f"tan(0.5 * ({_R(HALFPI)} - {phi})) / "
            f"pow((1.0 - {_R(P.e)} * sin({phi})) / (1.0 + {_R(P.e)} * sin({phi})), {_R(0.5 * P.e)})")
    y = f"-ln({tsfn})"
    return f"""
    WITH {_POINTS_CTE}
    SELECT pid,
      {ROUND6_SQL.format(e=f"-((6378137.0e0 * (lon * {DEG_TO_RAD_LIT}) + 0.0) * {_R(fr)})")} AS xw_km,
      {ROUND6_SQL.format(e=f"-((6378137.0e0 * ({y}) + 0.0) * {_R(fr)})")} AS ys_km,
      lat AS lat_in
    FROM points
    """


@query("axis_units_km", sql=_axis_units_sql())
def axis_units_km(sf_dir):
    """+axis=wsu (denormalization, src/pj_transform.c:728-825) combined
    with +units=km (fr_meter scaling, src/pj_init.c:556-571)."""
    pts = _points_ds(sf_dir)
    out = transform_points_stage(
        pts, "+proj=latlong +datum=WGS84",
        "+proj=merc +datum=WGS84 +units=km +axis=wsu",
        out_x="xw_km", out_y="ys_km")

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({"pid": t["pid"],
                         "xw_km": pa.array(_r6(t["xw_km"].to_numpy(zero_copy_only=False))),
                         "ys_km": pa.array(_r6(t["ys_km"].to_numpy(zero_copy_only=False))),
                         "lat_in": t["lat"]})

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


# -- geoparse extraction ----------------------------------------------------

def _geoparse_sql():
    lon_sql, lat_sql = lonlat_sql("doc_id")
    return f"""
    WITH pages AS (
      SELECT doc_id AS pid,
             'https://site' || (doc_id % 1000) || '.example/page/' || doc_id AS url,
             text || ' Coordinates: (' || printf('%.2f', {lat_sql}) || ', '
                  || printf('%.2f', {lon_sql}) || ')' AS t
      FROM documents
    )
    SELECT pid, url,
           CAST(regexp_extract(t, '\\((-?\\d+\\.\\d\\d), (-?\\d+\\.\\d\\d)\\)', 1) AS DOUBLE) AS lat,
           CAST(regexp_extract(t, '\\((-?\\d+\\.\\d\\d), (-?\\d+\\.\\d\\d)\\)', 2) AS DOUBLE) AS lon
    FROM pages
    """


@query("geoparse_extract", sql=_geoparse_sql())
def geoparse_extract(sf_dir):
    """Page synthesis (printf-exact text construction) + RE2 coordinate
    extraction; text passthrough is byte-identical per url by design."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def mk(t: pa.Table) -> pa.Table:
        return synth_pages_batch(
            pa.table({"pid": pc.cast(t["doc_id"], pa.int64()), "text": t["text"]}),
            "pid", text_col="text")

    pages = ds.map_batches(mk, batch_format="pyarrow", batch_size=None,
                           zero_copy_batch=True)
    parsed = pages.map_batches(GeoparseStage(), batch_format="pyarrow",
                               batch_size=None)
    return parsed.select_columns(["pid", "url", "lat", "lon"])


# ===========================================================================
# Training-data-pipeline operators: dedup, text analysis, similarity,
# multimodal plumbing, geodesic line expansion
# ===========================================================================

from ..functions.dedup import (  # noqa: E402
    add_text_hash, minhash_bands_batch,
)
from ..functions.text import (  # noqa: E402
    LANG_MARKERS, STOPWORDS_EN, TOKEN_RE, fingerprint_batch, lang_id_batch,
    quality_batch, token_count,
)
from ..kernels.geodesic import slerp_line  # noqa: E402


@query(
    "dedup_exact",
    sql="""
    SELECT MIN(doc_id) AS doc_id_keep, COUNT(*) AS dup_count
    FROM documents GROUP BY text
    """,
)
def dedup_exact(sf_dir):
    """Exact dedup: vectorized content hash per batch -> groupby(hash)
    -> (min id, count). The shuffle moves (hash, id) pairs, never text
    (64-bit content hash; collisions ~2^-64, oracle groups by raw text)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        t = add_text_hash(t, "text")
        df = pd.DataFrame({"text_hash": t["text_hash"].to_numpy(zero_copy_only=False),
                           "doc_id": t["doc_id"].to_numpy(zero_copy_only=False)})
        g = df.groupby("text_hash", as_index=False).agg(
            doc_id_keep=("doc_id", "min"), dup_count=("doc_id", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    from ray.data.aggregate import Min, Sum

    agg = partials.groupby("text_hash").aggregate(
        Min("doc_id_keep", alias_name="doc_id_keep"),
        Sum("dup_count", alias_name="dup_count"))
    return agg.select_columns(["doc_id_keep", "dup_count"])


@query(
    "token_stats",
    sql=f"""
    SELECT doc_id, len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_tokens,
           length(text) AS n_chars_seen
    FROM documents
    """,
)
def token_stats(sf_dir):
    """Token counting via RE2 (pyarrow count_substring_regex); identical
    RE2 semantics in the DuckDB oracle."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pc.cast(token_count(t["text"]), pa.int64()),
            "n_chars_seen": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)


def _quality_sql():
    stop = "|".join(STOPWORDS_EN)
    return f"""
    WITH c AS (
      SELECT doc_id,
        len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
        len(regexp_extract_all(text, '[0-9]')) AS n_digit,
        len(regexp_extract_all(text, '\\s')) AS n_space,
        length(text) AS n_len,
        len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tok,
        len(regexp_extract_all(text, '\\b(?:{stop})\\b')) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_len AS n_chars_seen, n_tok AS n_tokens, n_stop AS n_stopwords,
      CAST(n_alpha AS DOUBLE) / greatest(CAST(n_len AS DOUBLE), 1.0) AS alpha_ratio,
      CAST(n_digit AS DOUBLE) / greatest(CAST(n_len AS DOUBLE), 1.0) AS digit_ratio,
      CAST(n_len - (n_alpha + n_digit + n_space) AS DOUBLE)
        / greatest(CAST(n_len AS DOUBLE), 1.0) AS punct_ratio,
      CAST(n_stop AS DOUBLE) / greatest(CAST(n_tok AS DOUBLE), 1.0) AS stopword_ratio,
      CAST(n_alpha AS DOUBLE) / greatest(CAST(n_tok AS DOUBLE), 1.0) AS avg_token_len
    FROM c
    """


@query("quality_scores", sql=_quality_sql())
def quality_scores(sf_dir):
    """Per-doc quality features: ratios of identical integer counts =>
    bit-identical doubles."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(lambda t: quality_batch(t), batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)


def _langid_sql():
    cols = ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{lang}"
        for lang, pat in LANG_MARKERS)
    l0, l1, l2, l3 = [l for l, _ in LANG_MARKERS]
    return f"""
    WITH c AS (SELECT doc_id, {cols} FROM documents)
    SELECT doc_id, n_{l0}, n_{l1}, n_{l2}, n_{l3},
      CASE WHEN n_{l0} = 0 AND n_{l1} = 0 AND n_{l2} = 0 AND n_{l3} = 0 THEN 'und'
           WHEN n_{l0} >= n_{l1} AND n_{l0} >= n_{l2} AND n_{l0} >= n_{l3} THEN '{l0}'
           WHEN n_{l1} >= n_{l2} AND n_{l1} >= n_{l3} THEN '{l1}'
           WHEN n_{l2} >= n_{l3} THEN '{l2}'
           ELSE '{l3}' END AS pred_lang
    FROM c
    """


@query("lang_markers", sql=_langid_sql())
def lang_markers(sf_dir):
    """N-gram-marker language id, deterministic first-wins argmax."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(lambda t: lang_id_batch(t), batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)


@query("doc_fingerprint", sql=_golden_sql("doc_fingerprint_sf001.parquet"))
def doc_fingerprint(sf_dir):
    """Rolling-hash document fingerprint (Rabin-Karp min-sketch)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(lambda t: fingerprint_batch(t), batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)

    def tostr(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "fingerprint": pc.cast(t["fingerprint"], pa.string())})

    return out.map_batches(tostr, batch_format="pyarrow")


def lsh_partner_counts(bands, docs=None, num_partitions: int = 16,
                       broadcast_threshold: int = 2_000_000,
                       num_perm: int = 64, bands_n: int = 16, k: int = 5):
    """Per-doc LSH collision-partner counts, fully distributed.

    ``num_perm``/``bands_n``/``k`` MUST match the parameters used to
    build ``bands`` — the fast path recomputes band rows in-UDF with
    these values, so a mismatch would silently count wrong buckets.

    Bucket sizes come from one groupby(band_id, band_hash) Count over
    the band rows; only buckets of size >= 2 contribute partners.

    Fast path (``docs`` given, colliding table under
    ``broadcast_threshold``): the colliding-bucket table broadcasts and
    a SECOND pass over the documents recomputes each batch's band rows
    IN-UDF, merges the sizes and reduces to one row per doc — a doc's
    16 band rows never leave the UDF invocation, so there is no
    block-straddling hazard and no per-doc shuffle at all (signatures
    are computed twice; they are cheap vectorized passes).

    Fallback (huge colliding table, or no ``docs``): scale-safe hash
    join of sizes onto the band rows + per-doc groupby."""
    from ray.data.aggregate import Max, Sum

    from ..functions.dedup import _adaptive_partitions, colliding_bucket_sizes

    sizes = colliding_bucket_sizes(bands).materialize()
    n_dup_buckets = sizes.count()

    if docs is not None and n_dup_buckets <= broadcast_threshold:
        dup = sizes.to_pandas()  # only COLLIDING buckets, broadcast

        def per_doc(t: pa.Table) -> pa.Table:
            from ..functions.dedup import minhash_bands_batch as _mbb

            b = _mbb(t, num_perm=num_perm, bands=bands_n, k=k)
            df = b.to_pandas()
            m = df.merge(dup, on=["band_id", "band_hash"], how="left")
            m["partners"] = m["bucket_size"].fillna(1).astype(np.int64) - 1
            g = m.groupby("doc_id", as_index=False).agg(
                collision_partners=("partners", "sum"),
                max_bucket_partners=("partners", "max"))
            return pa.Table.from_pandas(
                g.astype({"doc_id": np.int64,
                          "collision_partners": np.int64,
                          "max_bucket_partners": np.int64}),
                preserve_index=False)

        return docs.map_batches(per_doc, batch_format="pyarrow",
                                batch_size=None)

    # heavily-duplicated corpora (or pre-built band rows only): the
    # scale-safe hash join; the join shuffle destroys doc locality, so
    # a per-doc groupby follows
    joined = bands.join(sizes, join_type="left_outer",
                        num_partitions=_adaptive_partitions(num_partitions),
                        on=("band_id", "band_hash"))

    def partners_joined(t: pa.Table) -> pa.Table:
        sz = pc.coalesce(pc.cast(t["bucket_size"], pa.int64()),
                         pa.scalar(1, pa.int64()))
        return pa.table({"doc_id": t["doc_id"],
                         "partners": pc.subtract(sz, 1)})

    per_band = joined.map_batches(partners_joined, batch_format="pyarrow",
                                  batch_size=None)
    return per_band.groupby("doc_id").aggregate(
        Sum("partners", alias_name="collision_partners"),
        Max("partners", alias_name="max_bucket_partners"),
    )


@query("minhash_lsh_candidates",
       sql=_golden_sql("minhash_lsh_candidates_sf001.parquet"))
def minhash_lsh_candidates(sf_dir):
    """MinHash+LSH near-dup detection: signature per doc (vectorized
    across the batch) -> explode to (band_id, band_hash, doc) rows ->
    distributed bucket-size groupby -> per-doc partner counts via the
    fused second documents pass. The classic shingle->minhash->band
    shuffle, driver-free."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bands = ds.map_batches(lambda t: minhash_bands_batch(t), batch_format="pyarrow",
                           batch_size=None)
    out = lsh_partner_counts(bands, docs=ds)
    return _sorted_pdf(out, ["doc_id"])


@query(
    "dedup_keep_first",
    sql="""
    SELECT doc_id FROM documents
    WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY text)
    """,
)
def dedup_keep_first(sf_dir):
    """The dedup FILTER itself (not just group counts): survivors =
    min doc_id per exact content group, via the size-dispatched
    functions.dedup.keep_first_filter — keeper-id broadcast below the
    threshold, distributed semi-join above it (the 100 TB path; the
    keeper count is corpus-proportional, so broadcast alone would be an
    unbounded driver materialization).  Parity between the two paths is
    pytest-proven (tests/test_dedup_distributed.py)."""
    from ..functions.dedup import keep_first_filter

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return keep_first_filter(ds)


@query(
    "quality_filter",
    sql=f"""
    WITH c AS (
      SELECT doc_id,
        len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha,
        length(text) AS n_len,
        len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tok
      FROM documents
    )
    SELECT doc_id FROM c
    WHERE n_tok >= 20
      AND CAST(n_alpha AS DOUBLE) / greatest(CAST(n_len AS DOUBLE), 1.0) >= 0.6
    """,
)
def quality_filter(sf_dir):
    """Quality FILTER: keep documents with >= 20 tokens and >= 60%
    alphabetic characters (the standard web-corpus gate) — one
    streaming Arrow-kernel pass, identical RE2 semantics as the SQL."""
    from ..functions.text import quality_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        q = quality_batch(t)
        keep = pc.and_(pc.greater_equal(q["n_tokens"], pa.scalar(20)),
                       pc.greater_equal(q["alpha_ratio"], pa.scalar(0.6)))
        return q.filter(keep).select(["doc_id"])

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)


@query("minhash_verified_pairs",
       sql=_golden_sql("minhash_verified_pairs_sf001.parquet"))
def minhash_verified_pairs(sf_dir):
    """The full LSH near-dup pipeline with the VERIFY stage: band
    collisions -> distinct candidate pairs -> hash-join both texts
    back on (scale-safe; candidates are a pruned subset) -> exact
    k-shingle Jaccard per pair (micro-int for determinism).  Only the
    candidate set is ever pairwise-verified — never all pairs."""
    from ..functions.dedup import (_adaptive_partitions, jaccard_pairs,
                                   lsh_candidate_pairs, minhash_bands_batch)

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bands = ds.map_batches(lambda t: minhash_bands_batch(t),
                           batch_format="pyarrow", batch_size=None)
    pairs = lsh_candidate_pairs(bands)
    np_ = _adaptive_partitions(8)
    j1 = pairs.join(ds, join_type="inner", num_partitions=np_,
                    on=("doc_a",), right_on=("doc_id",))

    def ren_a(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["text_a" if c == "text" else c for c in t.column_names])

    j1 = j1.map_batches(ren_a, batch_format="pyarrow", batch_size=None)
    j2 = j1.join(ds, join_type="inner", num_partitions=np_,
                 on=("doc_b",), right_on=("doc_id",))

    def verify(t: pa.Table) -> pa.Table:
        jac = jaccard_pairs(t["text_a"], t["text"])
        return pa.table({
            "doc_a": pc.cast(t["doc_a"], pa.int64()),
            "doc_b": pc.cast(t["doc_b"], pa.int64()),
            "n_bands": pc.cast(t["n_bands"], pa.int64()),
            "jaccard_micro": pa.array(
                np.floor(jac * 1e6 + 0.5).astype(np.int64)),
        })

    out = j2.map_batches(verify, batch_format="pyarrow", batch_size=None)
    return _sorted_pdf(out, ["doc_a", "doc_b"])


@query("simhash_docs", sql=_golden_sql("simhash_docs_sf001.parquet"))
def simhash_docs(sf_dir):
    """SimHash-64 per document (sign-sum of shingle-hash bits),
    vectorized across each batch (unpackbits + segmented sums)."""
    from ..functions.dedup import simhash_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(lambda t: simhash_batch(t), batch_format="pyarrow",
                          batch_size=None)


@query("ann_cosine_topk", sql=_golden_sql("ann_cosine_topk_sf001.parquet"))
def ann_cosine_topk(sf_dir):
    """Brute-force cosine top-k over the embeddings table against 3
    broadcast query vectors (per-batch matmul + partial top-k)."""
    import duckdb as _dd

    from ..functions.vector import ann_cosine_topk as _ann

    qv = _dd.sql(f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
                 f"WHERE vec_id IN (0, 1, 2) ORDER BY vec_id").fetchall()
    Q = np.array([list(r[0]) for r in qv], dtype=np.float32)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = _ann(ds, Q, k=10)
    return out.select(["qid", "vec_id", "rank"])


@query("ann_lsh_buckets", sql=_golden_sql("ann_lsh_buckets_sf001.parquet"))
def ann_lsh_buckets(sf_dir):
    """Random-hyperplane LSH bucketing (the 100 TB ANN path): bucket
    histogram proves the partitioner; same planes broadcast everywhere."""
    from ..functions.vector import batch_matrix, hyperplane_signatures, make_planes

    planes = make_planes(64, nbits=8, seed=42)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def fn(t: pa.Table) -> pa.Table:
        M = batch_matrix(t)
        sig = hyperplane_signatures(M, planes)
        return pa.table({"bucket": pa.array(sig, pa.int64())})

    b = ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
    from ray.data.aggregate import Count

    return b.groupby("bucket").aggregate(Count(alias_name="n_vectors"))


@query("multimodal_features", sql=_golden_sql("multimodal_sf001.parquet"))
def multimodal_features(sf_dir):
    """Multimodal plumbing: binary payload column + typed metadata ->
    actor-pool decode stage (deterministic fake features; the real codec
    raises NotImplementedError by design). Small batch_size — binary
    payloads are wide rows."""
    from ..stages.multimodal import DecodeStage, attach_fake_media

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    with_media = ds.map_batches(lambda t: attach_fake_media(t),
                                batch_format="pyarrow", batch_size=1024)
    decoded = with_media.map_batches(
        DecodeStage, fn_constructor_kwargs=dict(n_features=4),
        batch_format="pyarrow", batch_size=512, concurrency=(1, 2))

    def fin(t: pa.Table) -> pa.Table:
        col = t["features"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        feats = col.flatten().to_numpy(zero_copy_only=False).reshape(len(t), -1)
        return pa.table({"doc_id": t["doc_id"],
                         "payload_bytes": t["payload_bytes"],
                         "f0": pa.array(np.round(feats[:, 0].astype(np.float64), 3))})

    return decoded.map_batches(fin, batch_format="pyarrow")


# -- geodesic line expansion (flat_map: 1 row -> n rows) --------------------

_GEOD_N = 5


def _geod_line_sql():
    pi = float(np.pi)
    d2r = pi / 180.0
    lon2_sql = f"(((pid) * {LAT_MUL}) % 36000 - 18000) / 1.0e2"
    lat2_sql = f"(((pid) * {LON_MUL}) % 16000 - 8000) / 1.0e2"
    v = {}
    for p, lo, la in (("1", "lon", "lat"), ("2", "lon2", "lat2")):
        v[f"x{p}"] = f"cos({la} * {_R(d2r)}) * cos({lo} * {_R(d2r)})"
        v[f"y{p}"] = f"cos({la} * {_R(d2r)}) * sin({lo} * {_R(d2r)})"
        v[f"z{p}"] = f"sin({la} * {_R(d2r)})"
    return f"""
    WITH {_POINTS_CTE},
    pts AS (
      SELECT pid, lon, lat, {lon2_sql} AS lon2, {lat2_sql} AS lat2 FROM points
    ),
    vec AS (
      SELECT pid, {v['x1']} AS x1, {v['y1']} AS y1, {v['z1']} AS z1,
                  {v['x2']} AS x2, {v['y2']} AS y2, {v['z2']} AS z2
      FROM pts
    ),
    om AS (
      SELECT *, acos(least(greatest(x1*x2 + y1*y2 + z1*z2, -1.0), 1.0)) AS omega,
             sin(acos(least(greatest(x1*x2 + y1*y2 + z1*z2, -1.0), 1.0))) AS sino
      FROM vec
    ),
    expanded AS (
      SELECT o.*, k.k,
        CASE WHEN sino != 0.0 THEN sin((1.0 - k.k * {_R(1.0 / (_GEOD_N - 1))}) * omega) / sino
             ELSE 1.0 - k.k * {_R(1.0 / (_GEOD_N - 1))} END AS a,
        CASE WHEN sino != 0.0 THEN sin(k.k * {_R(1.0 / (_GEOD_N - 1))} * omega) / sino
             ELSE k.k * {_R(1.0 / (_GEOD_N - 1))} END AS b
      FROM om o CROSS JOIN (VALUES (0.0e0), (1.0e0), (2.0e0), (3.0e0), (4.0e0)) k(k)
    )
    SELECT pid, CAST(k AS BIGINT) AS k,
      {ROUND6_SQL.format(e=f"atan2(a*y1 + b*y2, a*x1 + b*x2) * {_R(57.29577951308232)}")} AS lon_i,
      {ROUND6_SQL.format(e=f"atan2(a*z1 + b*z2, sqrt((a*x1 + b*x2)*(a*x1 + b*x2) + (a*y1 + b*y2)*(a*y1 + b*y2))) * {_R(57.29577951308232)}")} AS lat_i
    FROM expanded
    """


@query("geod_line_interp", sql=_geod_line_sql())
def geod_line_interp(sf_dir):
    """geod -l line mode as a flat_map-shaped stage: each point pair
    expands to 5 great-circle samples (spherical slerp variant;
    the ellipsoidal Karney path is covered by geod_inverse_ellipsoidal)."""
    pts = _points_ds(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        pid = t["pid"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lon2 = (pid * LAT_MUL % 36000 - 18000) / 1.0e2
        lat2 = (pid * LON_MUL % 16000 - 8000) / 1.0e2
        lons, lats = slerp_line(lon, lat, lon2, lat2, _GEOD_N)
        n = pid.size
        ks = np.tile(np.arange(_GEOD_N, dtype=np.int64), n)
        return pa.table({
            "pid": pa.array(np.repeat(pid, _GEOD_N), pa.int64()),
            "k": pa.array(ks, pa.int64()),
            "lon_i": pa.array(_r6(lons.reshape(-1))),
            "lat_i": pa.array(_r6(lats.reshape(-1))),
        })

    return pts.map_batches(fn, batch_format="pyarrow", batch_size=None,
                           zero_copy_batch=True)


@query("geod_inverse_ellipsoidal", sql=_golden_sql("geod_inverse_sf001.parquet"))
def geod_inverse_ellipsoidal(sf_dir):
    """Ellipsoidal geodesic inverse (Karney order-6 series, the
    reference's geod_inverse, src/geodesic.c:944): distance + azimuths
    per derived pair; exact everywhere incl. near-antipodal."""
    from ..kernels.geodesic import geod_inverse

    pts = _points_ds(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        pid = t["pid"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lon2 = (pid * LAT_MUL % 36000 - 18000) / 1.0e2
        lat2 = (pid * LON_MUL % 16000 - 8000) / 1.0e2
        s12, azi1, azi2, ok = geod_inverse(lon, lat, lon2, lat2)
        return pa.table({
            "pid": pa.array(pid, pa.int64()),
            "s12_mm": pa.array(np.floor(s12 * 1e3 + 0.5).astype(np.int64)),
            "azi1_udeg": pa.array(np.floor(azi1 * 1e6 + 0.5).astype(np.int64)),
            "converged": pa.array(ok),
        })

    return pts.map_batches(fn, batch_format="pyarrow", batch_size=None,
                           zero_copy_batch=True)


# ===========================================================================
# Relational part 2: as-of join, salted skew aggregate, union/repartition,
# token frequency top-k
# ===========================================================================

@query(
    "asof_signup_purchase",
    sql="""
    WITH s AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup'),
         p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, s.event_id AS signup_event_id,
           epoch_us(p.ts) - epoch_us(s.ts) AS gap_us
    FROM p ASOF JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def asof_signup_purchase(sf_dir):
    """AS-OF join: each purchase matched to the latest prior-or-equal
    signup of the same user. groupby(user).map_groups with sorted
    searchsorted — the per-key ordered-log pattern; at scale the
    key-hash shuffle co-locates each user's events."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type", "event_id"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        s = g[g["event_type"] == "signup"].sort_values(["ts", "event_id"])
        p = g[g["event_type"] == "purchase"]
        if s.empty or p.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "signup_event_id": pd.Series(dtype="int64"),
                                 "gap_us": pd.Series(dtype="int64")})
        s_ts = s["ts"].astype("int64").to_numpy()
        p_ts = p["ts"].astype("int64").to_numpy()
        pos = np.searchsorted(s_ts, p_ts, side="right") - 1
        ok = pos >= 0
        return pd.DataFrame({
            "event_id": p["event_id"].to_numpy()[ok],
            "signup_event_id": s["event_id"].to_numpy()[pos[ok]],
            "gap_us": p_ts[ok] - s_ts[pos[ok]],
        })

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def _salted_sql():
    tx, ty = _tile_sql_exprs(2)
    return f"""
    WITH {_POINTS_CTE}
    SELECT {ty} * 4 + {tx} AS cell,
           COUNT(*) AS n_points,
           CAST(SUM(pid) AS BIGINT) AS sum_pid
    FROM points GROUP BY cell
    """


@query("salted_cell_agg", sql=_salted_sql())
def salted_cell_agg(sf_dir):
    """Skew demo: zoom-2 cells are few and hot (megacity-cell shape).
    The salted two-phase aggregate (partial per (key, salt) inside
    map_batches, final groupby over tiny partials) produces the exact
    same totals as an unsalted GROUP BY — the oracle proves it."""
    pts = _points_ds(sf_dir)

    def add_cell(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        return pa.table({"cell": pa.array(_cell_id(lon, lat, 2), pa.int64()),
                         "pid": t["pid"]})

    with_cell = pts.map_batches(add_cell, batch_format="pyarrow", batch_size=None)
    from ..stages.agg import partial_group_sums

    out = partial_group_sums(with_cell, ["cell"], ["pid"], count_col="n_points",
                             salt_mod=8)
    # rename summed column to the oracle's name
    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"pid": "sum_pid"})

    out = out.map_batches(fin, batch_format="pandas", batch_size=None)
    return _sorted_pdf(out, ["cell"])


@query(
    "union_repartition_count",
    sql="""
    SELECT COUNT(*) AS n_rows, CAST(SUM(l_orderkey) AS BIGINT) AS sum_key FROM (
      SELECT l_orderkey FROM lineitem WHERE l_discount < 0.03
      UNION ALL
      SELECT l_orderkey FROM lineitem WHERE l_discount >= 0.07
    )
    """,
)
def union_repartition_count(sf_dir):
    """union + repartition coverage: two filtered streams unioned,
    redistributed, then aggregated."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_discount"])

    def filt(lo, hi):
        def fn(t: pa.Table) -> pa.Table:
            keep = pc.and_(pc.greater_equal(t["l_discount"], pa.scalar(lo)),
                           pc.less(t["l_discount"], pa.scalar(hi)))
            return t.filter(keep).select(["l_orderkey"])
        return fn

    a = ds.map_batches(filt(-1.0, 0.03), batch_format="pyarrow", batch_size=None)
    b = ds.map_batches(filt(0.07, 99.0), batch_format="pyarrow", batch_size=None)
    u = a.union(b).repartition(16)

    def partial(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({"n_rows": pa.array([len(k)], pa.int64()),
                         "sum_key": pa.array([int(k.sum())], pa.int64())})

    parts = u.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    return pd.DataFrame({"n_rows": [int(parts["n_rows"].sum())],
                         "sum_key": [int(parts["sum_key"].sum())]})


@query(
    "token_topk",
    sql=f"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(text, '{TOKEN_RE}')) AS token FROM documents
    )
    SELECT token, COUNT(*) AS n FROM toks GROUP BY token
    ORDER BY n DESC, token LIMIT 20
    """,
)
def token_topk(sf_dir):
    """Top-k token frequency: per-batch partial counts -> groupby(token)
    -> small final sort (the wordcount shape)."""
    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        # tokens([A-Za-z0-9]+) == split on the complement, drop empties;
        # all Arrow C kernels (split/flatten/value_counts), no row loop.
        txt = pc.fill_null(t["text"], "")
        flat = pc.list_flatten(pc.split_pattern_regex(txt, "[^A-Za-z0-9]+"))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table({"token": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    from ray.data.aggregate import Sum

    agg = parts.groupby("token").aggregate(Sum("n", alias_name="n")).to_pandas()
    return (agg.sort_values(["n", "token"], ascending=[False, True])
            .head(20).reset_index(drop=True))


# ===========================================================================
# Relational part 3: window function (running aggregate), interval/range
# join, holistic per-group quantile, IVF ANN (the second scale path)
# ===========================================================================

@query(
    "window_running_total",
    sql="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
             OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
    FROM orders
    """,
)
def window_running_total(sf_dir):
    """Windowed running aggregate: per-customer cumulative order value in
    date order.  groupby(custkey).map_groups sorts each partition and
    cumsums — integer cents so the running sum is exact on both sides.
    At scale this is the standard key-hash shuffle + per-key sort; no
    global sort is needed."""
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_custkey", "o_totalprice",
                             "o_orderdate"])

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_orderdate", "o_orderkey"])
        cents = np.floor(g["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].to_numpy(),
            "o_custkey": g["o_custkey"].to_numpy(),
            "run_cents": np.cumsum(cents),
        })

    out = ds.groupby("o_custkey").map_groups(per_cust, batch_format="pandas")
    return _sorted_pdf(out, ["o_custkey", "o_orderkey"])


_WM_DELAY_US = 360 * 3600_000_000  # 15-day allowed lateness
_WM_MOD = 33554467  # prime > any event_id range => arrival key is unique


@query(
    "windowed_watermark_agg",
    sql=f"""
    WITH a AS (
      SELECT event_type, ((event_id % {_WM_MOD}) * 104729) % {_WM_MOD} AS arr,
             epoch_us(ts) AS tu
      FROM events
    ), w AS (
      SELECT event_type, tu,
             max(tu) OVER (ORDER BY arr
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS wm
      FROM a
    )
    SELECT event_type,
           CAST(floor(tu / 3600000000) AS BIGINT) AS hour_bucket,
           COUNT(*) AS n_events
    FROM w WHERE wm IS NULL OR tu >= wm - {_WM_DELAY_US}
    GROUP BY event_type, hour_bucket
    """,
)
def windowed_watermark_agg(sf_dir):
    """Event-time tumbling-window aggregate with a watermark: events
    'arrive' in a deterministic permuted order; rows older than the
    running-max event time minus 15 days at their arrival are dropped
    as late, the rest aggregate into hourly windows.  The watermark is
    a distributed prefix-scan (sort + per-block partials + O(#blocks)
    driver carry + second pass — stages/watermark.py); the oracle
    expresses the identical semantics with one SQL window function."""
    from ..stages.watermark import watermark_filter

    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        tu = t["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        # reduce mod _WM_MOD BEFORE multiplying: (eid % M) * 104729 stays
        # far inside int64 for any event_id, where eid * 104729 would
        # silently wrap for eid > ~88e12 (and the SQL oracle would not)
        return pa.table({
            "event_type": t["event_type"],
            "arr": pa.array((eid % _WM_MOD) * 104729 % _WM_MOD, pa.int64()),
            "tu": pa.array(tu, pa.int64()),
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    on_time = watermark_filter(prepped, ts_col="tu", arrival_col="arr",
                               delay_us=_WM_DELAY_US)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tmp = pd.DataFrame({
            "event_type": df["event_type"].to_numpy(),
            "hour_bucket": np.floor_divide(df["tu"].to_numpy(), 3600_000_000),
            "n_events": 1,
        })
        return tmp.groupby(["event_type", "hour_bucket"], as_index=False).sum()

    partials = on_time.map_batches(partial, batch_format="pandas",
                                   batch_size=None)
    from ray.data.aggregate import Sum

    out = partials.groupby(["event_type", "hour_bucket"]).aggregate(
        Sum("n_events", alias_name="n_events"))
    return _sorted_pdf(out, ["event_type", "hour_bucket"])


@query(
    "interval_join_purchases",
    sql="""
    WITH s AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'signup'),
         p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT s.event_id, COUNT(p.ts) AS n_purchases_7d
    FROM s LEFT JOIN p ON p.user_id = s.user_id
       AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 7 DAY
    GROUP BY s.event_id
    """,
)
def interval_join_purchases(sf_dir):
    """Interval (range) join: purchases inside each signup's 7-day
    window, counted per signup.  Co-locate by user (key-hash shuffle),
    then two searchsorted probes per signup against the user's sorted
    purchase timestamps — O(n log n) per key instead of the quadratic
    nested-loop a naive range join would do."""
    SEVEN_DAYS_US = 7 * 86400 * 1_000_000
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_type", "event_id"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        s = g[g["event_type"] == "signup"]
        if s.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "n_purchases_7d": pd.Series(dtype="int64")})
        p_ts = np.sort(g.loc[g["event_type"] == "purchase", "ts"]
                       .astype("int64").to_numpy())
        s_ts = s["ts"].astype("int64").to_numpy()
        lo = np.searchsorted(p_ts, s_ts, side="left")
        hi = np.searchsorted(p_ts, s_ts + SEVEN_DAYS_US, side="left")
        return pd.DataFrame({"event_id": s["event_id"].to_numpy(),
                             "n_purchases_7d": (hi - lo).astype(np.int64)})

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


@query(
    "segment_acctbal_median",
    sql="""
    SELECT c_mktsegment,
           CAST(floor(quantile_cont(c_acctbal, 0.5) * 1000.0 + 0.5) AS BIGINT)
             AS median_milli,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
)
def segment_acctbal_median(sf_dir):
    """Holistic per-group quantile (exact median).  Quantiles cannot be
    combined from partials, so each group's values are shuffled to one
    map_groups task (cardinality = 5 segments).  The linear-interpolated
    midpoint of 2-decimal money is a multiple of 0.0005, so rounding to
    milli-units is boundary-safe on both engines.  At 100 TB swap in a
    mergeable sketch (t-digest) behind the same API."""
    ds = read_table(sf_dir, "customer", columns=["c_mktsegment", "c_acctbal"])

    def per_seg(g: pd.DataFrame) -> pd.DataFrame:
        v = g["c_acctbal"].to_numpy()
        med = float(np.quantile(v, 0.5))  # linear interpolation, like quantile_cont
        return pd.DataFrame({
            "c_mktsegment": [g["c_mktsegment"].iloc[0]],
            "median_milli": np.floor(np.float64(med) * 1000.0 + 0.5).astype(np.int64),
            "n_customers": [np.int64(len(v))],
        })

    return ds.groupby("c_mktsegment").map_groups(per_seg, batch_format="pandas")


@query(
    "segment_acctbal_p90",
    sql="""
    SELECT c_mktsegment,
           CAST(floor(quantile_cont(c_acctbal, 0.9) * 1000.0 + 0.5) AS BIGINT)
             AS p90_milli,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
)
def segment_acctbal_p90(sf_dir):
    """Holistic per-group quantile through the 100-TB MERGEABLE-SKETCH
    path (unlike segment_acctbal_median's whole-group shuffle): money is
    a discrete domain (exact cents), so the sketch is a SPARSE HISTOGRAM
    — per-batch (segment, cents, n) counts, merged by a distributed
    groupby-sum whose cardinality is bounded by |domain| x |segments|
    (~5.5M rows), NEVER corpus-proportional.  The driver reconstructs
    the exact order statistics from the merged histogram, so the result
    equals quantile_cont bit-for-bit after milli rounding: with
    0-based rank r = 0.9*(n-1) = (10*lo + k)/10, the interpolated value
    x satisfies x*1000 = cents_lo*10 + k*(cents_hi - cents_lo) — an
    exact int64 (the continuous-range variant of this sketch is
    functions.sketch.HistogramSketch / TDigest, pytest-verified with
    error bounds; this query gates the same map-partial -> mergeable
    -> tiny-final shape with an exact oracle)."""
    ds = read_table(sf_dir, "customer", columns=["c_mktsegment", "c_acctbal"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tmp = pd.DataFrame({
            "c_mktsegment": df["c_mktsegment"].to_numpy(),
            "cents": _cents(df["c_acctbal"].to_numpy()),
            "n": 1,
        })
        return tmp.groupby(["c_mktsegment", "cents"], as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=None)
    from ray.data.aggregate import Sum

    hist = (partials.groupby(["c_mktsegment", "cents"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())  # bounded by domain x segments, not corpus
    rows = []
    for seg, g in hist.groupby("c_mktsegment"):
        g = g.sort_values("cents")
        c = g["cents"].to_numpy(np.int64)
        w = g["n"].to_numpy(np.int64)
        n = int(w.sum())
        lo_rank, k = divmod(9 * (n - 1), 10)
        cum = np.cumsum(w)
        v_lo = int(c[np.searchsorted(cum, lo_rank, side="right")])
        if k == 0:
            milli = v_lo * 10
        else:
            v_hi = int(c[np.searchsorted(cum, lo_rank + 1, side="right")])
            milli = v_lo * 10 + k * (v_hi - v_lo)
        rows.append((seg, milli, n))
    out = pd.DataFrame(rows, columns=["c_mktsegment", "p90_milli",
                                      "n_customers"])
    return _sorted_pdf(out, ["c_mktsegment"])


@query("ann_ivf_topk", sql=_golden_sql("ann_ivf_topk_sf001.parquet"))
def ann_ivf_topk_query(sf_dir):
    """IVF-bucketed ANN (second scale path next to ann_lsh_buckets):
    spherical k-means coarse quantizer on a deterministic sample, probe
    the 4 nearest of 16 cells per query, score only those rows.
    tests/test_vector_ivf.py checks recall against the brute-force
    baseline."""
    import duckdb as _dd

    from ..functions.vector import ann_ivf_topk as _ivf

    con = _dd.connect()
    qv = con.sql(f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
                 f"WHERE vec_id IN (0, 1, 2) ORDER BY vec_id").fetchall()
    sv = con.sql(f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
                 f"WHERE vec_id % 7 = 0 ORDER BY vec_id LIMIT 1024").fetchall()
    con.close()
    Q = np.array([list(r[0]) for r in qv], dtype=np.float32)
    S = np.array([list(r[0]) for r in sv], dtype=np.float32)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # the synthetic embeddings are near-isotropic (within-label cosine
    # ~0.02), the worst case for IVF: neighbours scatter across cells, so
    # the operating point is nprobe=8/16 (scan ~half) for recall ~0.9.
    # On clustered real-world embeddings nprobe=2-4 suffices.
    out = _ivf(ds, Q, S, k=10, ncells=16, nprobe=8)
    return out.select(["qid", "vec_id", "rank"])


@query("ann_ivf_partitioned", sql=_golden_sql("ann_ivf_topk_sf001.parquet"))
def ann_ivf_partitioned(sf_dir):
    """The partitioned IVF index END-TO-END (the true 100-TB ANN path):
    ``ivf_build_index`` writes the embeddings as one parquet partition
    per coarse cell (also the resumable layout — a failed build re-runs
    only missing cells), ``ivf_search_partitioned`` computes each
    query's nprobe cells and READS ONLY those partitions — pruning at
    the I/O layer, the unprobed corpus share never leaves storage.
    Same sample/centroids/probe count as ann_ivf_topk, so the oracle is
    the SAME golden table the masked-scan query matches — the two
    independent executions (single-pass masked scan vs partitioned
    build+pruned read) must agree row-for-row."""
    import hashlib
    import shutil
    import tempfile

    import duckdb as _dd

    from ..functions.vector import (ivf_build_index, ivf_search_partitioned,
                                    kmeans_cosine)

    con = _dd.connect()
    qv = con.sql(f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
                 f"WHERE vec_id IN (0, 1, 2) ORDER BY vec_id").fetchall()
    sv = con.sql(f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
                 f"WHERE vec_id % 7 = 0 ORDER BY vec_id LIMIT 1024").fetchall()
    con.close()
    Q = np.array([list(r[0]) for r in qv], dtype=np.float32)
    S = np.array([list(r[0]) for r in sv], dtype=np.float32)
    C = kmeans_cosine(S, 16)  # same quantizer as ann_ivf_topk

    tag = hashlib.md5(_os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    idx_dir = _os.path.join(tempfile.gettempdir(), f"proj_ray_ivf_{tag}")
    shutil.rmtree(idx_dir, ignore_errors=True)  # no stale partitions
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ivf_build_index(ds, idx_dir, C)
    out = ivf_search_partitioned(idx_dir, Q, k=10, nprobe=8)
    return out.select(["qid", "vec_id", "rank"])


@query(
    "dedup_clusters",
    sql="""
    SELECT d.doc_id,
           m.cluster
    FROM documents d
    JOIN (SELECT substr(text, 1, 40) AS pfx, MIN(doc_id) AS cluster
          FROM documents GROUP BY pfx) m ON substr(d.text, 1, 40) = m.pfx
    """,
)
def dedup_clusters(sf_dir):
    """Connected-components dedup clustering: duplicate-key edges
    (per-hash star edges; key = 40-char prefix fingerprint, which the
    synthetic corpus actually collides on) -> min-label propagation ->
    every doc labeled with its component representative (min doc_id).
    The edge list is sub-linear in the corpus, so propagation shuffles
    only edges; the corpus is touched once for hashing and once for the
    final label attach (size-dispatched: broadcast below the threshold,
    distributed hash join above — functions.dedup.attach_clusters).
    The same cc_min_label machinery clusters LSH near-dup candidates
    (rows-only there — SQL cannot express MinHash banding)."""
    from ..functions.dedup import attach_clusters, exact_dup_edges, text_hash64

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def hash_prefix(t: pa.Table) -> pa.Table:
        pfx = pc.utf8_slice_codeunits(pc.fill_null(t["text"], ""), 0, 40)
        return pa.table({"doc_id": t["doc_id"],
                         "text_hash": pa.array(text_hash64(pfx).astype(np.int64),
                                               pa.int64())})

    hashed = ds.map_batches(hash_prefix, batch_format="pyarrow",
                            batch_size=None)
    edges = exact_dup_edges(hashed)
    return attach_clusters(ds, edges)


@query("minhash_dedup_clusters",
       sql=_golden_sql("minhash_dedup_clusters_sf001.parquet"))
def minhash_dedup_clusters(sf_dir):
    """Near-dup clustering: LSH band buckets -> same-bucket star edges
    -> cc_min_label components.  Returns each doc's cluster id (min
    doc_id of its near-dup component; singletons keep their own id).
    Label attach is size-dispatched (broadcast / distributed join)."""
    from ..functions.dedup import attach_clusters, minhash_bands_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bands = ds.map_batches(lambda t: minhash_bands_batch(t),
                           batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique().astype(np.int64))
        if len(ids) < 2:
            return pd.DataFrame({"src": pd.Series(dtype="int64"),
                                 "dst": pd.Series(dtype="int64")})
        return pd.DataFrame({"src": ids[1:], "dst": ids[0]})

    edges = bands.groupby(["band_id", "band_hash"]).map_groups(
        per_bucket, batch_format="pandas")
    return attach_clusters(ds, edges)
