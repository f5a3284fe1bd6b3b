"""Multimodal stage plumbing: decode/resize/frame-sample shapes are
real (schemas, batch handling, 1->n expansion, edge cases); the codecs
themselves are disclosed stubs."""

import numpy as np
import pyarrow as pa
import pytest

from proj_ray.stages.multimodal import (
    DecodeStage,
    ResizeStage,
    attach_fake_media,
    frame_sample_batch,
)


def _media_batch(texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return attach_fake_media(t)


def test_real_codecs_are_explicit_stubs():
    with pytest.raises(NotImplementedError):
        DecodeStage(deterministic_fake=False)
    with pytest.raises(NotImplementedError):
        ResizeStage(deterministic_fake=False)


def test_resize_stage_deterministic():
    b = _media_batch(["x" * 1000, "short", ""])
    out = ResizeStage(out_bytes=256)(b)
    sizes = out["resized_bytes"].to_pylist()
    assert sizes[0] == 256
    assert sizes[1] == 256  # stride resample repeats bytes upward too
    assert sizes[2] == 0    # empty payload stays empty
    # deterministic: same input -> same bytes
    out2 = ResizeStage(out_bytes=256)(_media_batch(["x" * 1000, "short", ""]))
    assert out["payload"].to_pylist() == out2["payload"].to_pylist()


def test_frame_sample_expansion_and_stats():
    texts = ["a" * 300, "b" * 10, ""]
    b = _media_batch(texts)
    out = frame_sample_batch(b, n_frames=4, frame_len=64)
    assert out.num_rows == 3 * 4
    df = out.to_pandas()
    # doc 0: 300 bytes of 'a' (97): frames at 0/75/150/225, all full 64
    d0 = df[df["doc_id"] == 0]
    assert d0["frame_len"].tolist() == [64, 64, 64, 64]
    assert d0["byte_sum"].tolist() == [64 * 97] * 4
    # doc 1: 10 bytes: frame starts 0,2,5,7; windows truncated at len 10
    d1 = df[df["doc_id"] == 1]
    assert d1["frame_len"].tolist() == [10, 8, 5, 3]
    assert d1["byte_sum"].tolist() == [98 * 10, 98 * 8, 98 * 5, 98 * 3]
    # doc 2: empty payload -> zero-length frames, zero sums
    d2 = df[df["doc_id"] == 2]
    assert d2["frame_len"].tolist() == [0, 0, 0, 0]
    assert d2["byte_sum"].tolist() == [0, 0, 0, 0]


def test_frame_sample_empty_batch():
    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "payload": pa.array([], pa.binary())})
    out = frame_sample_batch(t)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "frame_idx", "frame_len",
                                "byte_sum"]
