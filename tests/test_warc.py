"""WARC source/sink: record layout, binary safety, Ray read/write."""

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa

from proj_ray.sources.warc import (
    _ts_to_warc_date,
    _warc_date_to_us,
    parse_warc_bytes,
    read_warc,
    serialize_warc_records,
    write_warc_stage,
)


def test_serialize_parse_roundtrip():
    urls = ["https://a.example/1", "https://b.example/2"]
    ts = np.array([0, 1_700_000_000_123_456], dtype=np.int64)
    dates = _ts_to_warc_date(ts)
    payloads = [b"<html><body>hello</body></html>", b""]
    blob = serialize_warc_records(urls, dates, payloads)
    t = parse_warc_bytes(blob)
    assert t["url"].to_pylist() == urls
    assert t["html"].to_pylist() == payloads
    got_us = t["warc_ts"].cast(pa.int64()).to_pylist()
    assert got_us == ts.tolist()


def test_payload_containing_magic_is_not_resplit():
    # Content-Length walking must not be confused by record-head bytes
    # inside a payload (a crawl page QUOTING the WARC spec, say)
    evil = b"x WARC/1.0\r\nWARC-Type: response\r\n\r\n y" * 3
    blob = serialize_warc_records(
        ["https://e.example/x"], _ts_to_warc_date(np.array([5], np.int64)),
        [evil])
    t = parse_warc_bytes(blob)
    assert t.num_rows == 1
    assert t["html"].to_pylist() == [evil]


def test_warc_date_microsecond_fidelity():
    for us in (0, 1, 999_999, 1_577_836_800_000_000 + 12345 * 1_000_003):
        s = _ts_to_warc_date(np.array([us], np.int64))[0]
        assert s.endswith("Z") and "T" in s
        assert _warc_date_to_us(s) == us


def test_bad_record_head_raises():
    try:
        parse_warc_bytes(b"GARBAGE")
    except ValueError as e:
        assert "bad WARC record head" in str(e)
    else:  # pragma: no cover
        raise AssertionError("expected ValueError")


def test_ray_write_read_roundtrip(ray_session):
    import ray.data as rd

    n = 1000
    pid = np.arange(n, dtype=np.int64)
    t = pa.table({
        "pid": pid,
        "url": pa.array([f"https://s.example/page/{i}" for i in pid]),
        "warc_ts": pa.array(pid * 7 + 3, pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array([b"<b>%d</b>" % i for i in pid], pa.binary()),
    })
    out_dir = os.path.join(tempfile.gettempdir(), "proj_ray_warc_unittest")
    shutil.rmtree(out_dir, ignore_errors=True)
    ds = rd.from_arrow(t).repartition(7)
    manifest = write_warc_stage(ds, out_dir).take_all()
    assert sum(r["n_records"] for r in manifest) == n
    assert len(manifest) >= 2  # really sharded
    back = read_warc(out_dir).take_all()
    assert len(back) == n
    by_url = {r["url"]: r for r in back}
    for i in (0, 1, 499, 999):
        r = by_url[f"https://s.example/page/{i}"]
        assert r["html"] == b"<b>%d</b>" % i
        assert int(r["warc_ts"].timestamp() * 1e6) in (i * 7 + 3,)


def test_rerun_overwrites_not_duplicates(ray_session):
    import ray.data as rd

    t = pa.table({
        "pid": pa.array(np.arange(50, dtype=np.int64)),
        "url": pa.array([f"u{i}" for i in range(50)]),
        "warc_ts": pa.array(np.arange(50, dtype=np.int64)).cast(
            pa.timestamp("us")),
        "html": pa.array([b"p%d" % i for i in range(50)], pa.binary()),
    })
    out_dir = os.path.join(tempfile.gettempdir(), "proj_ray_warc_rerun")
    shutil.rmtree(out_dir, ignore_errors=True)
    ds = rd.from_arrow(t).repartition(4)
    write_warc_stage(ds, out_dir).take_all()
    write_warc_stage(ds, out_dir).take_all()  # idempotent re-run
    assert read_warc(out_dir).count() == 50


def test_http_envelope_and_warcinfo_roundtrip():
    # Common-Crawl shape: warcinfo record first, responses carry an
    # HTTP envelope; the reader skips warcinfo and unwraps the body
    urls = ["https://cc.example/a", "https://cc.example/b"]
    ts = np.array([7, 8], dtype=np.int64)
    payloads = [b"<html>body with \r\n\r\n inside</html>", b"x"]
    blob = serialize_warc_records(
        urls, _ts_to_warc_date(ts), payloads, http_envelope=True,
        warcinfo="software: proj-ray\r\nformat: WARC file version 1.0\r\n")
    t = parse_warc_bytes(blob)
    assert t.num_rows == 2  # warcinfo skipped
    assert t["url"].to_pylist() == urls
    assert t["html"].to_pylist() == payloads


def test_warc_url_crlf_rejected():
    """CR/LF in a header value would silently corrupt the record
    framing on round-trip; the writer must refuse."""
    import pytest

    from proj_ray.sources.warc import serialize_warc_records

    with pytest.raises(ValueError, match="CR/LF"):
        serialize_warc_records(["https://evil.example/\r\nX: 0"],
                               ["2020-01-01T00:00:00.000000Z"], [b"x"])


def test_jsonl_roundtrip_tricky_text(ray_session):
    """JSONL shards must round-trip newlines, quotes, backslashes and
    non-ASCII byte-identically (escaping is the container's job)."""
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from proj_ray.sources.jsonl import read_jsonl, write_jsonl_stage

    texts = ['line1\nline2', 'quote " and \\ backslash', 'naïve café  u',
             'tabs\tand\r\ncrlf', '{"json": "inside"}', '']
    t = pa.table({
        "pid": pa.array(np.arange(len(texts), dtype=np.int64)),
        "warc_ts": pa.array(
            np.arange(len(texts), dtype=np.int64) * 1_000_003,
            pa.timestamp("us")),
        "text": pa.array(texts),
    })
    out = tempfile.mkdtemp(prefix="jsonl_rt_")
    try:
        write_jsonl_stage(rd.from_arrow(t).repartition(3), out).count()
        back = (read_jsonl(out).to_pandas()
                .sort_values("pid").reset_index(drop=True))
        assert back["text"].tolist() == texts
        assert back["warc_ts"].astype("int64").tolist() == \
            (np.arange(len(texts)) * 1_000_003).tolist()
    finally:
        shutil.rmtree(out, ignore_errors=True)
