"""Round-4 session-9 operators: per-domain aggregation over the pages
surface (url -> host extraction + two-phase distinct-language stats)."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _sorted(df, by):
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    return df.sort_values(by).reset_index(drop=True)


def _oracle(qname, tables):
    from proj_ray.pipelines.queries import QUERIES

    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.sql(QUERIES[qname]["sql"]).fetchdf()


def test_domain_doc_stats_matches_oracle(ray_session):
    from proj_ray.pipelines.queries import domain_doc_stats

    got = _sorted(domain_doc_stats(SF), ["domain"])
    want = _sorted(_oracle("domain_doc_stats", ["documents"]), ["domain"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # hosts are real string extractions, not key arithmetic
    assert got["domain"].str.match(r"^site\d+\.example$").all()


def test_domain_doc_stats_paths_agree(ray_session):
    from proj_ray.pipelines.queries import domain_doc_stats

    a = _sorted(domain_doc_stats(SF, combine_path="driver"), ["domain"])
    b = _sorted(domain_doc_stats(SF, combine_path="distributed"), ["domain"])
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
