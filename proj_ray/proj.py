"""python -m proj_ray.proj — the proj-equivalent text filter."""
from .cli import proj_main

if __name__ == "__main__":
    from .cli import block_lazy_pandas

    block_lazy_pandas()
    raise SystemExit(proj_main())
