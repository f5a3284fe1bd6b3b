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


# ===========================================================================
# Relational core (engine operators: filter, project, groupby-agg with
# partial combine, broadcast join, sort+limit, distinct, windowing)
# ===========================================================================

@query(
    "q1_pricing_summary",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           SUM({CENTS_SQL.format(e='l_quantity')}) AS sum_qty_cents,
           SUM({CENTS_SQL.format(e='l_extendedprice')}) AS sum_base_cents,
           SUM({CENTS_SQL.format(e='l_extendedprice')} * {CENTS_SQL.format(e='1.0 - l_discount')}) AS sum_disc_cents2,
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

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=131072)
    from ray.data.aggregate import Sum

    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty_cents", alias_name="sum_qty_cents"),
        Sum("sum_base_cents", alias_name="sum_base_cents"),
        Sum("sum_disc_cents2", alias_name="sum_disc_cents2"),
        Sum("count_order", alias_name="count_order"),
    )
    return out


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

    cand = ds.map_batches(local_topk, batch_format="pandas", batch_size=262144).to_pandas()
    return (cand.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
            .head(10).reset_index(drop=True))


@query(
    "regional_customers",
    sql=f"""
    SELECT r.r_name AS region_name, COUNT(*) AS n_customers,
           SUM({CENTS_SQL.format(e='c.c_acctbal')}) AS sum_acctbal_cents
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

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=262144)
    from ray.data.aggregate import Sum

    return partials.groupby("region_name").aggregate(
        Sum("n_customers", alias_name="n_customers"),
        Sum("sum_acctbal_cents", alias_name="sum_acctbal_cents"),
    )


@query(
    "filter_ship_window",
    sql=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           SUM({CENTS_SQL.format(e='l_quantity')}) AS sum_qty_cents
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

    filtered = ds.map_batches(fn, batch_format="pyarrow", batch_size=131072,
                              zero_copy_batch=True)
    from ray.data.aggregate import Count, Sum

    return filtered.groupby("l_returnflag").aggregate(
        Count(alias_name="n_rows"),
        Sum("sum_qty_cents", alias_name="sum_qty_cents"),
    )


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
           SUM({CENTS_SQL.format(e='value')}) AS sum_value_cents
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

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=262144)
    from ray.data.aggregate import Sum

    return partials.groupby(["event_type", "hour_bucket"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value_cents", alias_name="sum_value_cents"),
    )


@query(
    "user_sessions",
    sql="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, SUM(new_session) AS n_sessions, COUNT(*) AS n_events
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

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


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


def _points_ds(sf_dir, batch_size=131072):
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

    pts = ds.map_batches(mk, batch_format="pyarrow", batch_size=131072,
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

    pts = ds.map_batches(mk, batch_format="pyarrow", batch_size=131072,
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
