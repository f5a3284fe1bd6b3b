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


SF01 = "/root/testdata/sf0.01"


def _oracle01(qname, tables):
    from proj_ray.pipelines.queries import QUERIES

    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF01}/{t}.parquet'")
    return con.sql(QUERIES[qname]["sql"]).fetchdf()


def test_url_dedup_canonical_matches_oracle(ray_session):
    from proj_ray.pipelines.queries import url_dedup_canonical

    # sf0.01: 500 docs -> 63 canonical urls; the variants (mixed-case
    # host, ?session=, #frag) MUST collapse — collision groups of 8
    got = _sorted(url_dedup_canonical(SF01), ["curl"])
    want = _sorted(_oracle01("url_dedup_canonical", ["documents"]), ["curl"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    assert (got["n_dups"] > 1).all()
    assert not got["curl"].str.contains("[?#]|SITE", regex=True).any()


def test_url_dedup_canonical_paths_agree(ray_session):
    from proj_ray.pipelines.queries import url_dedup_canonical

    a = _sorted(url_dedup_canonical(SF01, combine_path="driver"), ["curl"])
    b = _sorted(url_dedup_canonical(SF01, combine_path="distributed"),
                ["curl"])
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))


def test_decontaminate_substr_matches_oracle(ray_session):
    from proj_ray.pipelines.queries import decontaminate_substr

    got = _sorted(decontaminate_substr(SF01), ["doc_id", "bid"])
    want = _sorted(_oracle01("decontaminate_substr", ["documents"]),
                   ["doc_id", "bid"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # the synthesized leak set: every flagged doc has doc_id % 7 == 3
    # (texts are unique at 40 chars, so no organic hits) and every
    # leaked doc is flagged
    assert (got["doc_id"] % 7 == 3).all()
    assert len(got) > 0


def test_domain_cap_sample_matches_oracle_and_binds(ray_session):
    from proj_ray.pipelines.queries import domain_cap_sample

    got = _sorted(domain_cap_sample(SF01), ["domain", "pid"])
    want = _sorted(_oracle01("domain_cap_sample", ["documents"]),
                   ["domain", "pid"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # the cap must actually prune (10 docs/domain at sf0.01, cap 5)
    assert got.groupby("domain").size().max() == 5
    assert len(got) == 250
