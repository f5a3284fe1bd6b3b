#!/usr/bin/env python
"""Flagship pipeline as a ``ray job submit`` entrypoint.

On a fixed-size multi-node cluster (the north-rule deployment shape):

    ray job submit --working-dir /root/repo -- \\
        python jobs/flagship_job.py --sf <pages_dir> --out <out_dir>

Inside a submitted job ``RAY_ADDRESS`` points at the cluster and
``ray.init()`` attaches to it; standalone (this sandbox) the same
script runs against a local session.  The job:

1. streams the flagship point pipeline (pages -> geoparse ->
   web-mercator -> tile -> PIP join) into PARTITIONED parquet under
   ``--out/points`` via state.write_partitioned — one atomically-
   renamed file per block, per-partition lineage + metrics in
   ``_manifest.jsonl`` (rows, error-sentinel lanes, bytes, wall time),
   never one giant file and never a driver collect;
2. reduces the same stream to the per-(cell, polygon) aggregate and
   writes it to ``--out/agg.parquet``;
3. prints ONE JSON line of job metrics (the driver-readable contract).

A re-run over a non-empty ``--out`` refuses by default (block-boundary
partition ids are not stable across runs — write_partitioned's
documented contract); multi-run resumable jobs go through
state.run_resumable_shards, whose shard ids derive from the input
work plan (see tests/test_state.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", default="/root/testdata/sf0.001",
                    help="input table directory (TESTDATA.md layout)")
    ap.add_argument("--out", required=True,
                    help="output directory (points/ partitions + agg.parquet)")
    ap.add_argument("--mult", type=int, default=1,
                    help="page fan-out multiplier (bench knob)")
    ap.add_argument("--zoom", type=int, default=12)
    ap.add_argument("--agg-zoom", type=int, default=4)
    args = ap.parse_args(argv)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS is the cluster; standalone
        # (sandbox) it is preset to "local"
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")

    from proj_ray.pipelines.flagship import flagship_pipeline, flagship_points
    from proj_ray.state import write_partitioned

    t0 = time.perf_counter()
    points_dir = os.path.join(args.out, "points")
    os.makedirs(points_dir, exist_ok=True)
    config = {"sf": args.sf, "zoom": args.zoom, "mult": args.mult,
              "pipeline": "flagship_points"}
    metrics = write_partitioned(
        flagship_points(args.sf, zoom=args.zoom, mult=args.mult),
        points_dir, config, partition_col="pid")

    agg = flagship_pipeline(args.sf, zoom=args.zoom, agg_zoom=args.agg_zoom,
                            mult=args.mult)
    agg_path = os.path.join(args.out, "agg.parquet")
    agg.to_parquet(agg_path, index=False)

    out = {"job": "flagship", "sf": args.sf, "out": args.out,
           "wall_sec": round(time.perf_counter() - t0, 3),
           "agg_rows": int(len(agg)), "points": metrics}
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(rc)
