"""python -m proj_ray.invproj — the inverse-by-name proj variant.

The reference installs ``invproj`` as a symlink to ``proj``; the main
checks ``strncmp(Prog_name, "inv", 3)`` and flips the default
direction (src/proj.c:250-253).  Equivalent to ``proj -I``.
"""
from .cli import proj_main

if __name__ == "__main__":
    import sys

    from .cli import block_lazy_pandas

    block_lazy_pandas()

    args = sys.argv[1:]
    if not args:
        from .cli import PJ_RELEASE, _USAGE

        print(f"{PJ_RELEASE}\n" + _USAGE["proj"] % "invproj",
              file=sys.stderr)
        raise SystemExit(0)
    raise SystemExit(proj_main(["-I"] + args))
