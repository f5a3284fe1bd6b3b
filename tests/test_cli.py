"""CLI text-filter parity: cs2cs/proj/geod line grammar, '#'
passthrough, '*' error sentinel, -E echo, +to split."""

import io

from proj_ray.cli import cs2cs_main, geod_main, proj_main


def run(main, argv, text):
    out = io.StringIO()
    main(argv, stdin=io.StringIO(text), stdout=out)
    return out.getvalue().splitlines()


def test_cs2cs_golden_line():
    lines = run(cs2cs_main,
                ["+proj=latlong", "+ellps=bessel", "+towgs84=5,0,0",
                 "+to", "+proj=latlong", "+ellps=bessel", "+towgs84=1,0,0", "-E"],
                "0d00'00.000\"W 0d00'00.000\"N 0.0\n"
                "79d00'00.000\"W 45d00'00.000\"N 0.0\n")
    # golden: nad/tv_out.dist:10-11
    assert lines[0].endswith("0d0'0.000\"E\t0d0'0.000\"N 4.000")
    assert "78d59'59.821\"W" in lines[1] and "44d59'59.983\"N" in lines[1]
    assert lines[1].endswith("0.540")


def test_cs2cs_comment_and_sentinel():
    lines = run(cs2cs_main,
                ["+proj=latlong", "+datum=WGS84", "+to", "+proj=merc", "+datum=WGS84",
                 "-f", "%.2f"],
                "# a comment\n10 45\n0 91\n")
    assert lines[0] == "# a comment"
    assert lines[1].startswith("1113194.91")
    assert lines[2].startswith("*\t*")


def test_cs2cs_tail_passthrough():
    lines = run(cs2cs_main,
                ["+proj=latlong", "+datum=WGS84", "+to", "+proj=merc",
                 "+datum=WGS84", "-f", "%.2f"],
                "10 45 7.5 site42 extra words\n")
    # z is printed with oform when -f is given (cs2cs.c:151-155)
    assert lines[0].endswith("7.50 site42 extra words")


def test_proj_inverse_flag():
    f = run(proj_main, ["+proj=merc", "+datum=WGS84", "-f", "%.2f"], "10 45\n")
    x = float(f[0].split("\t")[0])
    b = run(proj_main, ["+proj=merc", "+datum=WGS84", "-I", "-f", "%.8f"],
            f"{x} {f[0].split()[1]}\n")
    lon = float(b[0].split("\t")[0])
    assert abs(lon - 10.0) < 1e-6


def test_geod_equator():
    lines = run(geod_main, ["+ellps=WGS84"], "0d 0d 0d 1d\n")
    assert lines[0].endswith("111319.491")


def test_cli_init_failure_diagnostics(capsys):
    """Init failures print the reference's diagnostic + pj_strerrno
    message (src/pj_strerrno.c) instead of a traceback, exit 1."""
    import sys

    rc = proj_main(["+proj=nosuchproj"], stdin=io.StringIO("1 1\n"),
                   stdout=io.StringIO())
    err = capsys.readouterr().err
    assert rc == 1
    assert "proj: projection initialization failure" in err
    assert "cause: unknown projection id" in err

    rc = cs2cs_main(["+proj=latlong", "+catalog=missing.csv", "+ellps=WGS84",
                     "+to", "+proj=latlong", "+datum=WGS84"],
                    stdin=io.StringIO("0 0\n"), stdout=io.StringIO())
    err = capsys.readouterr().err
    assert rc == 1 and "cause: failed to load datum shift file" in err

    rc = geod_main(["+ellps=nosuchell"], stdin=io.StringIO("0d 0d 0d 1d\n"),
                   stdout=io.StringIO())
    err = capsys.readouterr().err
    assert rc == 1 and "geod: projection initialization failure" in err
