"""python -m proj_ray.nad2bin — the nad2bin-equivalent grid compiler.

Converts an ASCII ``.lla`` shift table on stdin to a binary grid file
(ctable / ctable2 / ntv2), byte-identical to the reference tool
(src/nad2bin.c) except bytes the C leaves uninitialized, which we zero.
Usage, messages and exit codes mirror the C main (src/nad2bin.c:46-84,
374-375): 1 = usage error, 2 = output failure, 3 = unsupported format.
"""
import sys


def nad2bin_main(argv=None, stdin=None, stdout=None, stderr=None):
    from .sources.grids import nad2bin_convert

    argv = sys.argv[1:] if argv is None else argv
    stdin = sys.stdin if stdin is None else stdin
    stdout = sys.stdout if stdout is None else stdout
    stderr = sys.stderr if stderr is None else stderr

    fmt = "ctable2"
    output_file = None
    i = 0
    while i < len(argv):
        if argv[i] == "-f" and i < len(argv) - 1:
            i += 1
            fmt = argv[i]
        elif output_file is None:
            output_file = argv[i]
        else:
            output_file = None
            break
        i += 1
    if output_file is None:
        print("usage: nad2bin [-f ctable/ctable2/ntv2] binary_output"
              " < ascii_source", file=stderr)
        return 1

    print(f"Output Binary File Format: {fmt}", file=stdout)
    text = stdin.read()
    try:
        nad2bin_convert(text, output_file, fmt)
    except ValueError as exc:
        if "unsupported format" in str(exc):
            print("Unsupported format, nothing written.", file=stderr)
            return 3
        print(str(exc), file=stderr)
        return 1
    except OSError:
        print("output failure", file=stderr)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(nad2bin_main())
