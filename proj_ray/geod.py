"""python -m proj_ray.geod — the geod-equivalent text filter."""
from .cli import geod_main

if __name__ == "__main__":
    raise SystemExit(geod_main())
