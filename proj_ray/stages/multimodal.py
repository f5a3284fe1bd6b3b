"""Multimodal (image/audio/video) column stages.

Binary payloads are opaque ``binary`` columns with typed metadata
(media_type, width/height/duration). The Ray-side plumbing — schema,
small batch sizes for large payloads, actor-pool signature, output
layout — is real and tested; the codec itself is STUBBED because the
decode libraries (PIL/ffmpeg/torchaudio) are not in this environment:

- ``DecodeStage(deterministic_fake=True)`` (default in tests) computes
  deterministic pseudo-features from the raw bytes so pipelines and
  oracles are exercisable end-to-end.
- ``DecodeStage(deterministic_fake=False)`` raises NotImplementedError
  at construction, marking exactly where a real decoder plugs in.

Sizing rule for binary payloads: batch_size small (256-2048) so
batch x concurrency fits worker heaps; blocks of wide binary rows are
kept small via DataContext.target_max_block_size at the pipeline level.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class DecodeStage:
    """Actor-pool decode/feature stage for binary media columns."""

    def __init__(self, media_col="payload", media_type_col="media_type",
                 n_features=8, deterministic_fake=True):
        if not deterministic_fake:
            raise NotImplementedError(
                "real media decoding needs PIL/ffmpeg (not in this container); "
                "construct with deterministic_fake=True or plug a decoder here")
        self.media_col = media_col
        self.media_type_col = media_type_col
        self.n_features = n_features

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
                # deterministic fake features: per-stripe byte means
                stripes = np.array_split(b.astype(np.float32), self.n_features)
                feats[i] = [s.mean() if s.size else 0.0 for s in stripes]
        out = batch.drop_columns([self.media_col])
        out = out.append_column("payload_bytes", pa.array(sizes, pa.int64()))
        out = out.append_column(
            "features", pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), self.n_features))
        return out


def attach_fake_media(batch: pa.Table, text_col="text", out="payload",
                      media_type="image/png") -> pa.Table:
    """Test/bench helper: synthesize a deterministic binary payload from
    the text column (stands in for a real image/audio blob)."""
    payloads = [(t or "").encode("utf-8")[:4096] for t in batch[text_col].to_pylist()]
    out_t = batch.append_column(out, pa.array(payloads, pa.binary()))
    return out_t.append_column("media_type",
                               pa.array([media_type] * len(payloads), pa.string()))
