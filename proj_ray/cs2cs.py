"""python -m proj_ray.cs2cs — the cs2cs-equivalent text filter."""
from .cli import cs2cs_main

if __name__ == "__main__":
    from .cli import block_lazy_pandas

    block_lazy_pandas()
    raise SystemExit(cs2cs_main())
