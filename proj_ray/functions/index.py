"""Inverted (posting-list) index over the corpus word domain — the
search-engine primitive next to the exact-dup hash index
(functions/dedup.build_hash_index) and the IVF vector index
(functions/vector.ivf_build_index): build once, then answer term
queries by reading ONLY the index buckets the query terms occupy.

Layout: one (word_hash, doc_id) parquet dataset partitioned by
``word_bucket = word_hash % num_buckets`` (hive directories).  Each
document contributes each DISTINCT word once (presence postings, the
boolean-retrieval model); because every document lives in exactly one
build batch, per-batch distinct == global distinct and the build needs
NO shuffle — it is a single streaming map over the corpus.

At 100 TB the bucket partitioning is the point: a conjunctive query
over K terms reads K buckets' worth of postings (I/O-layer pruning via
the hive layout — the untouched vocabulary never leaves storage), and
the intersection is one bounded per-doc count over the matched
postings, never a scan of the corpus text.

Word tokenization is the single-space split shared with the SQL twin
(functions/dedup.word_spans == DuckDB ``string_split(text, ' ')``);
word identity is the 64-bit segment hash (collision odds ~V^2/2^64,
the exact-dedup family's documented contract).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import segment_hash64, word_spans


def word_hash64(words) -> np.ndarray:
    """64-bit polynomial hash of each python/numpy string — the same
    hash ``build_posting_index`` stores, for hashing QUERY terms."""
    out = np.empty(len(words), np.uint64)
    for i, w in enumerate(words):
        b = np.frombuffer(w.encode("utf-8"), np.uint8)
        out[i] = segment_hash64(b, np.array([0], np.int64),
                                np.array([len(b)], np.int64))[0]
    return out


def build_posting_index(ds, index_dir: str, text_col: str = "text",
                        id_col: str = "doc_id",
                        num_buckets: int = 256) -> None:
    """Build the partitioned posting layout: distinct (word_hash,
    doc_id) rows, hive-partitioned by word_bucket.  One streaming
    map_batches pass; no shuffle (see module docstring)."""

    def postings(t: pa.Table) -> pa.Table:
        data, doc_of, ws, we, _ = word_spans(t[text_col])
        h = segment_hash64(data, ws, we)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.stack([h.view(np.int64), ids[doc_of]], axis=1)
        key = np.unique(key, axis=0)  # distinct words per doc
        wh = key[:, 0]
        return pa.table({
            "word_bucket": pa.array(
                (wh.view(np.uint64) % np.uint64(num_buckets))
                .astype(np.int64), pa.int64()),
            "word_hash": pa.array(wh, pa.int64()),
            id_col: pa.array(key[:, 1], pa.int64()),
        })

    os.makedirs(index_dir, exist_ok=True)
    (ds.map_batches(postings, batch_format="pyarrow", batch_size=None,
                    zero_copy_batch=True)
     .write_parquet(os.path.join(index_dir, "buckets"),
                    partition_cols=["word_bucket"]))


def _bucket_files(index_dir: str, buckets) -> list:
    files = []
    for b in sorted(int(b) for b in buckets):
        d = os.path.join(index_dir, "buckets", f"word_bucket={b}")
        if not os.path.isdir(d):
            continue
        files.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                     if f.endswith(".parquet"))
    return files


def search_all_terms(index_dir: str, terms, id_col: str = "doc_id",
                     num_buckets: int = 256) -> pd.DataFrame:
    """Conjunctive (AND) boolean retrieval: ids of documents containing
    EVERY query term, by reading only the query terms' buckets and
    counting matched postings per doc (a doc matches iff its distinct
    matched-term count equals the number of distinct query terms).

    The pruned read is the scale story; the per-doc count runs through
    the size-dispatched combine (stages/agg.py), so the result path is
    bounded by the matched-posting volume, never the corpus."""
    import ray.data as rd

    from ..stages.agg import combine_partials

    q = np.unique(word_hash64(list(terms)))
    n_terms = len(q)
    if n_terms == 0:
        return pd.DataFrame({id_col: np.empty(0, np.int64)})
    files = _bucket_files(
        index_dir, np.unique(q % np.uint64(num_buckets)).tolist())
    if not files:
        return pd.DataFrame({id_col: np.empty(0, np.int64)})

    def matched(t: pa.Table) -> pa.Table:
        h = t["word_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        idx = np.minimum(np.searchsorted(q, h), n_terms - 1)
        m = q[idx] == h
        return pa.table({
            id_col: pa.array(
                t[id_col].to_numpy(zero_copy_only=False)[m], pa.int64()),
            "n_terms": pa.array(np.ones(int(m.sum()), np.int64)),
        })

    per_doc = combine_partials(
        rd.read_parquet(files, columns=["word_hash", id_col])
        .map_batches(matched, batch_format="pyarrow", batch_size=None),
        [id_col], {"n_terms": "sum"})
    hit = per_doc[per_doc["n_terms"].to_numpy(np.int64) == n_terms]
    return (hit[[id_col]].astype(np.int64)
            .sort_values(id_col).reset_index(drop=True))
