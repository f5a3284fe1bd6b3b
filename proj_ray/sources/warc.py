"""WARC-format source/sink for Common-Crawl-style pages.

The WARC record layout follows the public ISO 28500 / WARC 1.0 spec
(the same container Common Crawl publishes): each record is

    WARC/1.0\r\n
    <Header-Name>: <value>\r\n ...
    \r\n
    <Content-Length bytes of payload>
    \r\n\r\n

We write ``response``-type records whose payload is the raw ``html``
bytes (no HTTP envelope), carrying ``url`` in ``WARC-Target-URI`` and
``warc_ts`` in ``WARC-Date`` (ISO-8601 with microseconds so the
timestamp round-trips bit-exactly through the text form).

Scale notes:
- The WRITER is a ``map_batches`` stage — each task serializes its
  batch to one shard file named by the batch's minimum record id
  (record ids are disjoint across blocks, so names never collide and
  a re-run overwrites rather than duplicates: resumable output).
- The READER is a ``FileBasedDatasource``: Ray schedules one read
  task per file (or per file group), so a 100-TB crawl of many .warc
  shards parallelizes for free.  Record walking uses Content-Length
  skips exactly like warcio — never a regex scan over payload bytes,
  so binary payloads containing "WARC/1.0" cannot confuse it.  The
  per-RECORD Python loop is bounded by records-per-file, not corpus
  size, and runs inside the distributed read tasks.
"""

from __future__ import annotations

import os
from typing import List, Union

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"
_MAGIC = b"WARC/1.0\r\n"

# epoch for us-resolution timestamps; numpy datetime64 keeps the math
# integer-exact both directions
_EPOCH = np.datetime64("1970-01-01T00:00:00", "us")


def _ts_to_warc_date(ts_us: np.ndarray) -> List[str]:
    """int64 microseconds-since-epoch -> ISO-8601 'YYYY-MM-DDTHH:MM:SS.ffffffZ'.

    numpy renders datetime64[us] exactly in this shape (minus the Z)."""
    dt = (_EPOCH + ts_us.astype("timedelta64[us]")).astype("datetime64[us]")
    return [s + "Z" for s in np.datetime_as_string(dt, unit="us")]


def _warc_date_to_us(s: str) -> int:
    return int((np.datetime64(s.rstrip("Z"), "us") - _EPOCH)
               .astype("int64"))


def serialize_warc_records(urls, dates, payloads, http_envelope: bool = False,
                           warcinfo: str | None = None) -> bytes:
    """Assemble one shard's bytes. Joined once at the end — O(total).

    ``http_envelope=True`` writes Common-Crawl-shaped records: payload
    = "HTTP/1.1 200 OK" + headers + CRLFCRLF + body, with
    Content-Type: application/http; msgtype=response (what real CC
    .warc.gz response records look like).  ``warcinfo`` prepends one
    warcinfo record, as CC shards carry."""
    parts = []
    if warcinfo is not None:
        info = warcinfo.encode()
        parts.append(
            b"WARC/1.0\r\n"
            b"WARC-Type: warcinfo\r\n"
            b"Content-Type: application/warc-fields\r\n"
            b"Content-Length: " + str(len(info)).encode() + _CRLF + _CRLF)
        parts.append(info)
        parts.append(b"\r\n\r\n")
    for url, date, payload in zip(urls, dates, payloads):
        if "\r" in url or "\n" in url:
            # a CR/LF inside a header value would be read back as a
            # header-block terminator / extra header: the record would
            # silently round-trip to a DIFFERENT url (or misframe the
            # whole shard), violating the byte-identity invariant
            raise ValueError(f"url contains CR/LF, not WARC-header-safe: "
                             f"{url!r:.120}")
        payload = bytes(payload)
        if http_envelope:
            payload = (b"HTTP/1.1 200 OK\r\n"
                       b"Content-Type: text/html\r\n"
                       b"Content-Length: " + str(len(payload)).encode() +
                       _CRLF + _CRLF + payload)
            ctype = b"application/http; msgtype=response"
        else:
            ctype = b"application/octet-stream"
        header = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode() + _CRLF +
            b"WARC-Date: " + date.encode() + _CRLF +
            b"Content-Type: " + ctype + _CRLF +
            b"Content-Length: " + str(len(payload)).encode() + _CRLF +
            _CRLF
        )
        parts.append(header)
        parts.append(payload)
        parts.append(b"\r\n\r\n")
    return b"".join(parts)


def parse_warc_bytes(data: bytes) -> pa.Table:
    """Walk records via Content-Length (no payload scanning).

    Non-response records (warcinfo, request, metadata, ...) are
    skipped, as a Common-Crawl consumer does.  Response payloads
    carrying an HTTP envelope (Content-Type: application/http) are
    unwrapped to the body bytes."""
    urls, ts_us, payloads = [], [], []
    pos = 0
    n = len(data)
    while pos < n:
        if not data.startswith(_MAGIC, pos):
            raise ValueError(f"bad WARC record head at byte {pos}")
        head_end = data.index(b"\r\n\r\n", pos)
        header_block = data[pos + len(_MAGIC):head_end].decode()
        headers = {}
        for line in header_block.split("\r\n"):
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers["content-length"])
        body_start = head_end + 4
        pos = body_start + clen + 4  # trailing \r\n\r\n
        if headers.get("warc-type") != "response":
            continue
        body = data[body_start:body_start + clen]
        if headers.get("content-type", "").startswith("application/http"):
            # strip the HTTP response envelope: body follows the first
            # blank line (HTTP headers cannot contain bare CRLFCRLF)
            sep = body.find(b"\r\n\r\n")
            if sep >= 0:
                body = body[sep + 4:]
        payloads.append(body)
        urls.append(headers["warc-target-uri"])
        ts_us.append(_warc_date_to_us(headers["warc-date"]))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(np.array(ts_us, dtype=np.int64),
                            pa.timestamp("us")),
        "html": pa.array(payloads, pa.binary()),
    })


def write_warc_stage(ds, out_dir: str, id_col: str = "pid",
                     http_envelope: bool = False,
                     warcinfo: str | None = None):
    """Sink stage: each task writes its batch as one .warc shard named by
    the batch's min id (ids are disjoint across blocks -> unique names,
    idempotent overwrite on re-run GIVEN IDENTICAL BLOCK BOUNDARIES — a
    re-run that splits blocks differently leaves stale shards under the
    old names, so callers clear or validate the output dir first).
    Returns a manifest Dataset (path, n_records) — consuming it drives
    the write."""
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # upstream filters/repartitions produce empty blocks
            # routinely; write nothing, contribute nothing
            return pa.table({"path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64())})
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        dates = _ts_to_warc_date(ts)
        urls = batch["url"].to_pylist()
        payloads = batch["html"].to_pylist()
        blob = serialize_warc_records(urls, dates, payloads,
                                      http_envelope=http_envelope,
                                      warcinfo=warcinfo)
        path = os.path.join(out_dir, "part-%016d.warc" % int(ids.min()))
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # atomic publish: resumable / crash-safe
        return pa.table({"path": pa.array([path]),
                         "n_records": pa.array([len(urls)], pa.int64())})

    return ds.map_batches(write_shard, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)


try:  # Ray is an optional import at module level (library surface)
    from ray.data.datasource import FileBasedDatasource

    class WarcDatasource(FileBasedDatasource):
        """Distributed .warc reader: one read task per file shard."""

        _FILE_EXTENSIONS = ["warc"]

        def __init__(self, paths: Union[str, List[str]], **kwargs):
            kwargs.setdefault("file_extensions", ["warc"])
            super().__init__(paths, **kwargs)

        def _read_stream(self, f, path: str):
            yield parse_warc_bytes(f.readall())

except ImportError:  # pragma: no cover
    WarcDatasource = None


def read_warc(paths, **kwargs):
    """ray.data entry: Dataset of (url, warc_ts, html) from .warc shards."""
    import ray.data as rd

    return rd.read_datasource(WarcDatasource(paths), **kwargs)
