"""Watermark filter: the distributed prefix-scan (sort + per-block
carry) must equal the sequential definition for any blocking."""

import numpy as np
import pyarrow as pa

from proj_ray.stages.watermark import watermark_filter


def _ref_on_time(arr, ts, delay):
    order = np.argsort(arr)
    ts_o = ts[order]
    prior = np.maximum.accumulate(
        np.concatenate([[np.iinfo(np.int64).min], ts_o[:-1]]))
    keep = (prior == np.iinfo(np.int64).min) | (ts_o >= prior - delay)
    out = np.zeros(len(arr), dtype=bool)
    out[order] = keep
    return out


def test_watermark_filter_matches_sequential(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    n = 5000
    arr = rng.permutation(n).astype(np.int64)
    ts = np.sort(rng.integers(0, 10**9, n)).astype(np.int64)
    delay = np.int64(2 * 10**8)
    ds = rd.from_arrow(pa.table({"arr": arr, "tu": ts}))
    ds = ds.repartition(13)  # force many blocks through the scan
    kept = watermark_filter(ds, ts_col="tu", arrival_col="arr",
                            delay_us=int(delay)).to_pandas()
    want_mask = _ref_on_time(arr, ts, delay)
    want = np.sort(arr[want_mask])
    got = np.sort(kept["arr"].to_numpy())
    assert np.array_equal(got, want)
    assert 0 < len(got) < n  # the delay actually discriminates


def test_watermark_keep_col_flags(ray_session):
    import ray.data as rd

    arr = np.array([0, 1, 2, 3], dtype=np.int64)
    ts = np.array([100, 500, 50, 460], dtype=np.int64)
    # delay 60: row arr=2 (ts=50) is late vs watermark 500; arr=3
    # (ts=460) is within 500-60
    ds = rd.from_arrow(pa.table({"arr": arr, "tu": ts}))
    out = (watermark_filter(ds, "tu", "arr", 60, keep_col="on_time")
           .to_pandas().sort_values("arr"))
    assert out["on_time"].tolist() == [True, True, False, True]
