"""Partitioned IVF layout: build writes one parquet partition per
coarse cell; search reads ONLY the probed partitions and returns the
same results as the in-stream IVF scan with identical centroids."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from proj_ray.functions.vector import (
    ann_ivf_topk,
    ivf_build_index,
    ivf_search_partitioned,
    kmeans_cosine,
)


@pytest.fixture(scope="module")
def index_dir(ray_session, sf_dir, tmp_path_factory):
    import duckdb
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("ivf_index"))
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    sample = np.array(
        [list(r[0]) for r in duckdb.sql(
            f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
            f"ORDER BY vec_id LIMIT 256").fetchall()], dtype=np.float32)
    C = kmeans_cosine(sample, 8)
    ivf_build_index(ds, out, C)
    return out, C, sample


def test_ivf_partition_layout(index_dir, sf_dir):
    """One directory per cell, union of partitions = the corpus."""
    out, C, _ = index_dir
    cells_dir = os.path.join(out, "cells")
    parts = sorted(os.listdir(cells_dir))
    assert all(p.startswith("ivf_cell=") for p in parts)
    assert 2 <= len(parts) <= 8
    total = sum(pq.read_table(os.path.join(cells_dir, p)).num_rows
                for p in parts)
    n_src = pq.read_metadata(
        os.path.join(sf_dir, "embeddings.parquet")).num_rows
    assert total == n_src
    assert os.path.isfile(os.path.join(out, "centroids.npy"))


def test_ivf_partitioned_search_matches_stream(index_dir, sf_dir):
    """Partition-pruned search == in-stream IVF scan with the same
    centroids (identical probed candidate set => identical top-k)."""
    import duckdb
    import ray.data as rd

    out, C, sample = index_dir
    Q = np.array(
        [list(r[0]) for r in duckdb.sql(
            f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
            f"WHERE vec_id IN (0, 1, 2) ORDER BY vec_id").fetchall()],
        dtype=np.float32)
    got = ivf_search_partitioned(out, Q, k=5, nprobe=3).to_pandas()
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    # ann_ivf_topk retrains from the same sample/ncells => same centroids
    want = ann_ivf_topk(ds, Q, sample, k=5, ncells=8, nprobe=3).to_pandas()
    g = got.sort_values(["qid", "rank"]).reset_index(drop=True)
    w = want.sort_values(["qid", "rank"]).reset_index(drop=True)
    assert g[["qid", "vec_id", "rank"]].equals(w[["qid", "vec_id", "rank"]])
    # each query's own vector is its rank-1 hit
    assert set(g[g["rank"] == 1]["vec_id"]) == {0, 1, 2}
