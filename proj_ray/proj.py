"""python -m proj_ray.proj — the proj-equivalent text filter."""
from .cli import proj_main

if __name__ == "__main__":
    raise SystemExit(proj_main())
