"""Sources/sinks: pruned parquet readers + resumable partitioned writes."""

from __future__ import annotations

import os


def read_table(sf_dir: str, name: str, columns=None, **kwargs):
    """Column-pruned parquet read of one testdata table. Always pass
    ``columns`` in pipelines — a read that loads all columns for a
    2-column transform is wrong at 100 TB."""
    import ray.data as rd

    path = os.path.join(sf_dir, f"{name}.parquet")
    return rd.read_parquet(path, columns=columns, **kwargs)
