"""Persisted incremental-dedup index: layout, pruned probe, anti-join."""

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa


def test_index_layout_and_antijoin(ray_session):
    import ray.data as rd

    from proj_ray.functions.dedup import (build_hash_index,
                                          dedup_new_against_index)

    old_texts = ["alpha", "beta", "gamma", "delta", "alpha"]
    new_texts = ["alpha", "epsilon", "gamma", "zeta"]
    old = pa.table({"doc_id": pa.array(np.arange(5, dtype=np.int64)),
                    "text": pa.array(old_texts)})
    new = pa.table({"doc_id": pa.array(np.arange(100, 104, dtype=np.int64)),
                    "text": pa.array(new_texts)})
    idx = tempfile.mkdtemp(prefix="hashidx_")
    try:
        build_hash_index(rd.from_arrow(old).repartition(2), idx,
                         num_buckets=8)
        # hive layout: one directory per occupied bucket
        dirs = os.listdir(os.path.join(idx, "buckets"))
        assert all(d.startswith("hash_bucket=") for d in dirs)
        assert 1 <= len(dirs) <= 8
        out = dedup_new_against_index(rd.from_arrow(new), idx,
                                      num_buckets=8)
        # 'alpha' and 'gamma' are already in the corpus
        assert out["doc_id"].tolist() == [101, 103]
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_empty_new_shard(ray_session):
    import ray.data as rd

    from proj_ray.functions.dedup import (build_hash_index,
                                          dedup_new_against_index)

    old = pa.table({"doc_id": pa.array([0], pa.int64()),
                    "text": pa.array(["x"])})
    new = pa.table({"doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string())})
    idx = tempfile.mkdtemp(prefix="hashidx_")
    try:
        build_hash_index(rd.from_arrow(old), idx, num_buckets=4)
        out = dedup_new_against_index(rd.from_arrow(new), idx, num_buckets=4)
        assert len(out) == 0
    finally:
        shutil.rmtree(idx, ignore_errors=True)
