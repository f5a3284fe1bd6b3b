"""Driver-contract checks for __ray_entry__: the queries()/oracle_sql()
registries stay consistent and every oracle SQL compiles against the
driver's registered views (catches a syntax slip before the gate)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()
SF = "/root/testdata/sf0.001"


def test_registry_consistency():
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert len(qs) >= 55
    assert set(sqls) <= set(qs)
    # everything is oracle-gated in this repo (no rows-only checks)
    assert set(sqls) == set(qs)
    for fn in qs.values():
        assert callable(fn)


def test_every_oracle_sql_compiles():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as e:  # pragma: no cover
            pytest.fail(f"oracle SQL for {name!r} does not compile: {e}")
    con.close()


def test_driver_priority_queries_inside_50_window():
    """The correctness driver records only the FIRST 50 registrations;
    every query named in _DRIVER_PRIORITY (never driver-checked before
    round 4, or new/changed) must stay inside that window, and the
    registry must keep all entries intact after the reorder."""
    from proj_ray.pipelines.queries import (_DRIVER_PRIORITY, _DRIVER_TAIL,
                                            QUERIES)

    names = list(QUERIES)
    first50 = set(names[:50])
    missing = [n for n in _DRIVER_PRIORITY if n not in first50]
    assert not missing, missing
    assert names[:len(_DRIVER_PRIORITY)] == _DRIVER_PRIORITY
    assert names[-len(_DRIVER_TAIL):] == _DRIVER_TAIL
    assert len(names) == len(set(names))
    for spec in QUERIES.values():
        assert callable(spec["fn"])
