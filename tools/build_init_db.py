#!/usr/bin/env python
"""Build the bundled +init database.

Parses the reference distribution's public keyed init files (the
``nad/epsg`` format consumed by src/pj_init.c get_init/get_opt:97-291 —
EPSG / IGN / ESRI-published CRS definitions, i.e. data, not code) into
one parquet table (file, key, defn) shipped as
``proj_ray/data/init_db.parquet`` so ``+init=epsg:2154`` /
``+init=IGNF:LAMB93`` / ``+init=nad27:3001`` resolve without PROJ_LIB.

Usage: python tools/build_init_db.py [--nad /root/reference/nad]
"""

import argparse
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

FILES = ["epsg", "epsg-deprecated", "IGNF", "esri", "esri.extra",
         "other.extra", "nad27", "nad83", "world", "GL27", "CH"]


def iter_init_entries(path):
    """Yield (key, defn) for every ``<key> words <>`` block, mirroring
    the tokenizer contract of proj_ray.crs.read_init_file."""
    key = None
    words = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            hash_at = line.find("#")
            if hash_at >= 0:
                line = line[:hash_at]
            for w in line.split():
                if key is None:
                    if w.startswith("<") and w.endswith(">") and len(w) > 2:
                        key = w[1:-1]
                        words = []
                    continue
                if w == "<>":
                    yield key, " ".join(words)
                    key = None
                    continue
                words.append(w)
    if key is not None and words:
        yield key, " ".join(words)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nad", default="/root/reference/nad")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "proj_ray", "data", "init_db.parquet"))
    args = ap.parse_args()

    files, keys, defns = [], [], []
    for fname in FILES:
        path = os.path.join(args.nad, fname)
        if not os.path.isfile(path):
            print(f"skip (missing): {fname}", file=sys.stderr)
            continue
        seen = set()
        n = 0
        for key, defn in iter_init_entries(path):
            if key in seen:  # first occurrence wins (get_init contract)
                continue
            seen.add(key)
            files.append(fname)
            keys.append(key)
            defns.append(defn)
            n += 1
        print(f"{fname}: {n} entries")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    t = pa.table({"file": pa.array(files, pa.string()),
                  "key": pa.array(keys, pa.string()),
                  "defn": pa.array(defns, pa.string())})
    pq.write_table(t, args.out, compression="zstd")
    print(f"wrote {len(files)} total entries -> {args.out}")


if __name__ == "__main__":
    main()
