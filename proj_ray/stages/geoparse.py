"""Web-page synthesis + geoparsing stages.

``synth_pages_stage`` turns a keyed table into the Common-Crawl-style
pages shape from BASELINE.json's input_hint
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string),
embedding deterministic coordinate mentions in ``text``. Everything is
exact integer arithmetic + C printf formatting (np.char.mod), so an
independent SQL oracle reproduces the text byte-for-byte.

``GeoparseStage`` extracts "(lat, lon)" mentions with an RE2 regex via
``pyarrow.compute.extract_regex`` — fully vectorized, no Python-per-row.
The ``text`` column itself is NEVER rewritten downstream of synthesis:
the per-row invariant "byte-identical extracted text per url" falls out
of passthrough (SURVEY.md §1.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..pipelines.derive import lonlat_numpy

COORD_RE = r"\((?P<glat>-?\d+\.\d\d), (?P<glon>-?\d+\.\d\d)\)"


def synth_pages_batch(batch: pa.Table, pid_col: str, text_col=None) -> pa.Table:
    """One page per input row. text = [base text +] ' Coordinates: (lat, lon)'."""
    pid = batch[pid_col].to_numpy(zero_copy_only=False).astype(np.int64)
    lon, lat = lonlat_numpy(pid)
    lat_s = np.char.mod("%.2f", lat)
    lon_s = np.char.mod("%.2f", lon)
    base = (np.asarray(batch[text_col].to_pandas().fillna(""), dtype=object)
            if text_col else np.full(pid.shape, "", dtype=object))
    text = np.char.add(
        np.char.add(np.asarray(base, dtype="U"), " Coordinates: ("),
        np.char.add(lat_s, np.char.add(", ", np.char.add(lon_s, ")"))),
    )
    url = np.char.add(
        np.char.add("https://site", np.char.mod("%d", pid % 1000)),
        np.char.add(".example/page/", np.char.mod("%d", pid)),
    )
    langs = np.array(["en", "de", "fr", "es", "pt", "it", "nl", "pl"])
    lang = langs[(pid % 8).astype(np.int64)]
    warc_ts = (np.int64(1577836800_000000) + pid * np.int64(1_000_003)).astype(
        "datetime64[us]")
    html = pa.array([t.encode() for t in
                     np.char.add("<html><body>", np.char.add(text, "</body></html>"))],
                    pa.binary())
    return pa.table({
        "pid": pa.array(pid, pa.int64()),
        "url": pa.array(url, pa.string()),
        "warc_ts": pa.array(warc_ts, pa.timestamp("us")),
        "html": html,
        "text": pa.array(text, pa.string()),
        "lang": pa.array(lang, pa.string()),
    })


def synth_pages_stage(ds, pid_col: str, text_col=None, batch_size=65536):
    def fn(batch: pa.Table) -> pa.Table:
        return synth_pages_batch(batch, pid_col, text_col)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


class GeoparseStage:
    """Actor-pool geoparser: the RE2 pattern is compiled once per actor
    (pyarrow caches compiled regexes per call site, but the actor form
    also carries optional custom patterns / gazetteers at scale)."""

    def __init__(self, pattern: str = COORD_RE, text_col="text", keep=("pid", "url", "text")):
        self.pattern = pattern
        self.text_col = text_col
        self.keep = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(batch[self.text_col], self.pattern)
        lat = pc.cast(pc.struct_field(ex, "glat"), pa.float64())
        lon = pc.cast(pc.struct_field(ex, "glon"), pa.float64())
        cols = {k: batch[k] for k in self.keep if k in batch.column_names}
        cols["lat"] = lat
        cols["lon"] = lon
        out = pa.table(cols)
        ok = pc.and_(pc.is_valid(out["lat"]), pc.is_valid(out["lon"]))
        return out.filter(ok)
