"""Multimodal (image/audio/video) column stages.

Binary payloads are opaque ``binary`` columns with typed metadata
(media_type, width/height/duration). The Ray-side plumbing — schema,
small batch sizes for large payloads, actor-pool signature, output
layout — is real and tested; the codec itself is STUBBED because the
decode libraries (PIL/ffmpeg/torchaudio) are not in this environment:

- ``DecodeStage(deterministic_fake=True)`` (default in tests) computes
  deterministic pseudo-features from the raw bytes so pipelines and
  oracles are exercisable end-to-end.
- ``DecodeStage(deterministic_fake=False)`` is an ADAPTER: if PIL is
  importable it decodes real image payloads (grayscale stripe means as
  the feature vector — same output schema as the fake path, pinned in
  tests/test_multimodal.py); without PIL it raises NotImplementedError
  at construction, marking exactly where a real decoder plugs in.

Sizing rule for binary payloads: batch_size small (256-2048) so
batch x concurrency fits worker heaps; blocks of wide binary rows are
kept small via DataContext.target_max_block_size at the pipeline level.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _pil_image():
    """Import-probe for the optional real codec (PIL is not baked into
    this container; the adapter activates the moment the environment
    provides it)."""
    try:
        from PIL import Image  # noqa: PLC0415
        return Image
    except ImportError:
        return None


class DecodeStage:
    """Actor-pool decode/feature stage for binary media columns.

    ``deterministic_fake=True``: per-stripe raw-byte means (the
    container-testable path).  ``deterministic_fake=False``: real
    image decode via PIL when importable (grayscale stripe means over
    the decoded pixel raster — an actual content feature), else
    NotImplementedError at construction.  Both paths emit the
    IDENTICAL schema: input minus the payload column, plus
    ``payload_bytes`` int64 and ``features``
    fixed_size_list<float32>[n_features]."""

    def __init__(self, media_col="payload", media_type_col="media_type",
                 n_features=8, deterministic_fake=True):
        self._pil = None
        if not deterministic_fake:
            self._pil = _pil_image()  # probe ONCE per actor, in __init__
            if self._pil is None:
                raise NotImplementedError(
                    "real media decoding needs PIL/ffmpeg (not in this "
                    "container); construct with deterministic_fake=True "
                    "or provide PIL to activate the adapter")
        self.media_col = media_col
        self.media_type_col = media_type_col
        self.n_features = n_features

    def _features_fake(self, b: np.ndarray) -> np.ndarray:
        # deterministic fake features: per-stripe byte means
        stripes = np.array_split(b.astype(np.float32), self.n_features)
        return np.array([s.mean() if s.size else 0.0 for s in stripes],
                        dtype=np.float32)

    def _features_real(self, payload: bytes) -> np.ndarray:
        # real codec: decode -> grayscale -> row-stripe pixel means; an
        # undecodable payload yields zeros (schema never varies by row)
        import io

        try:
            img = self._pil.open(io.BytesIO(payload)).convert("L")
        except Exception:
            return np.zeros(self.n_features, dtype=np.float32)
        px = np.asarray(img, dtype=np.float32)
        if px.ndim != 2 or px.size == 0:
            return np.zeros(self.n_features, dtype=np.float32)
        stripes = np.array_split(px, self.n_features, axis=0)
        return np.array([s.mean() if s.size else 0.0 for s in stripes],
                        dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.media_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        feats = np.zeros((n, self.n_features), dtype=np.float32)
        sizes = np.zeros(n, dtype=np.int64)
        buf = col.to_pylist()
        for i, payload in enumerate(buf):
            if payload is None:
                continue
            b = np.frombuffer(payload, dtype=np.uint8)
            sizes[i] = b.size
            if b.size:
                feats[i] = (self._features_real(payload)
                            if self._pil is not None
                            else self._features_fake(b))
        out = batch.drop_columns([self.media_col])
        out = out.append_column("payload_bytes", pa.array(sizes, pa.int64()))
        out = out.append_column(
            "features", pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), self.n_features))
        return out


class ResizeStage:
    """Actor-pool image-resize stage for binary media columns.

    Real plumbing, stubbed codec (like DecodeStage): with
    ``deterministic_fake=True`` the 'resize' is a deterministic stride
    resample of the payload bytes to ``out_bytes``; with False it
    raises NotImplementedError at construction — the spot a real
    PIL/libvips resize plugs in.  Output keeps the input schema with
    the payload replaced and an ``out_bytes`` size column appended."""

    def __init__(self, media_col="payload", out_bytes=256,
                 deterministic_fake=True):
        if not deterministic_fake:
            raise NotImplementedError(
                "real image resizing needs PIL/libvips (not in this "
                "container); construct with deterministic_fake=True or "
                "plug a decoder here")
        self.media_col = media_col
        self.out_bytes = int(out_bytes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.media_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out = []
        for payload in col.to_pylist():
            b = np.frombuffer(payload or b"", dtype=np.uint8)
            if b.size == 0:
                out.append(b"")
                continue
            idx = (np.arange(self.out_bytes, dtype=np.int64)
                   * b.size // self.out_bytes)
            out.append(b[idx].tobytes())
        t = batch.set_column(batch.column_names.index(self.media_col),
                             self.media_col, pa.array(out, pa.binary()))
        return t.append_column(
            "resized_bytes", pa.array([len(o) for o in out], pa.int64()))


def frame_sample_batch(batch: pa.Table, media_col="payload",
                       id_col="doc_id", n_frames: int = 4,
                       frame_len: int = 64) -> pa.Table:
    """Video frame sampling as a flat_map-shaped stage: each binary
    payload expands to ``n_frames`` evenly spaced fixed-length byte
    windows with per-frame stats.  Fully vectorized over the batch:
    window offsets are computed into the Arrow data buffer and frame
    sums come from one cumsum + gather — no per-frame Python loop.
    (The 'frames' are raw byte windows — the decode itself is the
    stubbed codec, as in DecodeStage; the Ray-side shape — 1 row ->
    n rows, small batches for wide binary — is the real thing.)"""
    col = batch[media_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(col)
    if n == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "frame_idx": pa.array([], pa.int64()),
                         "frame_len": pa.array([], pa.int64()),
                         "byte_sum": pa.array([], pa.int64())})
    buffers = col.buffers()
    off = np.frombuffer(buffers[1], dtype=np.int32).astype(np.int64)
    off = off[col.offset: col.offset + n + 1]
    data = (np.frombuffer(buffers[2], dtype=np.uint8)
            if buffers[2] is not None else np.empty(0, np.uint8))
    lens = off[1:] - off[:-1]
    k = np.arange(n_frames, dtype=np.int64)
    # frame f of doc d starts at floor(f * len_d / n_frames), clipped so
    # a full frame_len window fits (shorter docs get truncated windows)
    starts = off[:-1, None] + k[None, :] * lens[:, None] // n_frames
    ends = np.minimum(starts + frame_len, off[1:, None])
    cs = np.concatenate([[0], np.cumsum(data, dtype=np.int64)])
    sums = cs[ends] - cs[starts]
    return pa.table({
        id_col: pa.array(np.repeat(ids, n_frames), pa.int64()),
        "frame_idx": pa.array(np.tile(k, n), pa.int64()),
        "frame_len": pa.array((ends - starts).reshape(-1), pa.int64()),
        "byte_sum": pa.array(sums.reshape(-1), pa.int64()),
    })


def attach_fake_media(batch: pa.Table, text_col="text", out="payload",
                      media_type="image/png") -> pa.Table:
    """Test/bench helper: synthesize a deterministic binary payload from
    the text column (stands in for a real image/audio blob)."""
    payloads = [(t or "").encode("utf-8")[:4096] for t in batch[text_col].to_pylist()]
    out_t = batch.append_column(out, pa.array(payloads, pa.binary()))
    return out_t.append_column("media_type",
                               pa.array([media_type] * len(payloads), pa.string()))
