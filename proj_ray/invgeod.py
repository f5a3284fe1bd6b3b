"""python -m proj_ray.invgeod — the inverse-by-name geod variant.

The reference installs ``invgeod`` as a symlink to ``geod``; the main
checks ``strncmp(Prog_name, "inv", 3)`` and flips the default mode
(src/geod.c:116-120).  Equivalent to ``geod -I``.
"""
from .cli import geod_main

if __name__ == "__main__":
    import sys

    from .cli import block_lazy_pandas

    block_lazy_pandas()

    args = sys.argv[1:]
    if not args:
        from .cli import PJ_RELEASE, _USAGE

        print(f"{PJ_RELEASE}\n" + _USAGE["geod"] % "invgeod",
              file=sys.stderr)
        raise SystemExit(0)
    raise SystemExit(geod_main(["-I"] + args))
