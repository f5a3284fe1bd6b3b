"""python -m proj_ray.geod — the geod-equivalent text filter."""
from .cli import geod_main

if __name__ == "__main__":
    from .cli import block_lazy_pandas

    block_lazy_pandas()
    raise SystemExit(geod_main())
