"""Round-4 session-10 operators: PII redaction, corpus line dedup,
n-gram decontamination, hex spatial index."""

import numpy as np
import duckdb
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _sorted(df, by):
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    return df.sort_values(by).reset_index(drop=True)


def _oracle(qname, tables, sf=SF01):
    from proj_ray.pipelines.queries import QUERIES

    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con.sql(QUERIES[qname]["sql"]).fetchdf()


# -- segment / span helpers -------------------------------------------------

def test_segment_hash_equals_text_hash():
    from proj_ray.functions.dedup import (line_spans, segment_hash64,
                                          text_hash64, word_spans)

    texts = pa.array(["a b c d e", "xx yy", "", "one",
                      "w1 w2 w3 w4 w5 w6 w7 w8 w9"])
    data, doc_of, s, e = line_spans(texts, 8)
    lines = [bytes(data[a:b]).decode() for a, b in zip(s, e)]
    assert lines == ["a b c d e", "xx yy", "", "one",
                     "w1 w2 w3 w4 w5 w6 w7 w8", "w9"]
    assert np.array_equal(segment_hash64(data, s, e),
                          text_hash64(pa.array(lines)))
    d2, dw, ws, we, n = word_spans(texts)
    words = [bytes(d2[a:b]).decode() for a, b in zip(ws, we)]
    assert words[:5] == ["a", "b", "c", "d", "e"]
    assert n == 5


def test_wordgram_hashes_match_joined_strings():
    from proj_ray.functions.dedup import text_hash64, wordgram_hashes

    doc = "q w e r t y u"
    doc_of, gh = wordgram_hashes(pa.array([doc, "too short"]), 3)
    words = doc.split()
    grams = [" ".join(words[i:i + 3]) for i in range(len(words) - 2)]
    assert np.array_equal(gh, text_hash64(pa.array(grams)))
    assert (doc_of == 0).all()  # 2-word doc has no 3-gram


# -- queries ----------------------------------------------------------------

def test_pii_redact_stats_matches_oracle(ray_session):
    from proj_ray.pipelines.queries import pii_redact_stats

    got = _sorted(pii_redact_stats(SF01), ["doc_id"])
    want = _sorted(_oracle("pii_redact_stats", ["documents"]), ["doc_id"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # synthesized PII: residue classes 1/2/3 each have exactly one hit
    assert (got.loc[got.doc_id % 5 == 1, "n_email"] == 1).all()
    assert (got.loc[got.doc_id % 5 == 2, "n_phone"] == 1).all()
    assert (got.loc[got.doc_id % 5 == 3, "n_ip"] == 1).all()
    assert (got.loc[got.doc_id % 5 == 0, ["n_email", "n_phone", "n_ip"]]
            .to_numpy() == 0).all()
    # redaction really happened and removed the raw PII
    hit = got[got.doc_id % 5 == 1]
    assert hit["red_text"].str.contains("<EMAIL>", regex=False).all()
    assert not hit["red_text"].str.contains("@", regex=False).any()


def test_line_dedup_docs_matches_oracle(ray_session):
    from proj_ray.pipelines.queries import line_dedup_docs

    got = _sorted(line_dedup_docs(SF01), ["doc_id"])
    want = _sorted(_oracle("line_dedup_docs", ["documents"]), ["doc_id"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # the prepended boilerplate lines are duplicated BY CONSTRUCTION:
    # every doc_id%11==4 doc shares its first line
    bp = got[got.doc_id % 11 == 4]
    assert len(bp) > 1 and (bp["n_dup_lines"] >= 1).all()
    # and clean docs keep everything
    clean = got[(got.doc_id % 11 != 4) & (got.doc_id % 13 != 6)]
    assert (clean["n_dup_lines"] == 0).any()  # most are unique
    # exact-duplicate docs (the dedup_exact signal) retain nothing;
    # everything else retains a positive remainder
    assert (got["retained_chars"] > 0).sum() > 400
    assert (got["retained_chars"] == 0).any()


def test_line_dedup_paths_agree(ray_session):
    from proj_ray.pipelines.queries import line_dedup_docs

    a = _sorted(line_dedup_docs(SF, path="driver"), ["doc_id"])
    b = _sorted(line_dedup_docs(SF, path="distributed"), ["doc_id"])
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))


def test_decontaminate_ngram_matches_oracle(ray_session):
    from proj_ray.pipelines.queries import decontaminate_ngram

    got = _sorted(decontaminate_ngram(SF01), ["doc_id"])
    want = _sorted(_oracle("decontaminate_ngram", ["documents"]), ["doc_id"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # every injected doc is flagged; injection is the only signal at
    # 13 words (organic 13-gram collisions in random soup ~ 0)
    inj = got[(got.doc_id % 7 == 3)]
    assert (inj["contaminated"] == 1).all() and (inj["n_hit_grams"] >= 1).all()
    assert (got.loc[got.doc_id % 7 != 3, "contaminated"] == 0).all()


def test_hex_cell_agg_matches_oracle(ray_session):
    from proj_ray.pipelines.queries import hex_cell_agg

    got = _sorted(hex_cell_agg(SF01), ["hex_q", "hex_r"])
    want = _sorted(_oracle("hex_cell_agg", ["lineitem"]), ["hex_q", "hex_r"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    assert got["n_points"].sum() == 60000  # every point assigned once
    assert len(got) > 1000  # real spatial spread


def test_hex_cube_rounding_invariant(ray_session):
    # every assigned cell must satisfy the cube constraint q+r+s=0
    # after rounding: reconstruct from the fixed (hq, hr)
    from proj_ray.pipelines.queries import hex_cell_agg

    got = hex_cell_agg(SF)
    assert ((got["hex_q"] + got["hex_r"]).abs() < 10_000).all()
    # cells are contiguous-ish ints, not garbage floats
    assert got["hex_q"].dtype == np.int64 and got["hex_r"].dtype == np.int64


def test_lm_quality_score_matches_oracle(ray_session):
    from proj_ray.pipelines.queries import lm_quality_score

    got = _sorted(lm_quality_score(SF01), ["doc_id"])
    want = _sorted(_oracle("lm_quality_score", ["documents"]), ["doc_id"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # the threshold must really split the corpus (CCNet keeps a head
    # fraction, not everything)
    kept = got["keep"].sum()
    assert 50 < kept < 450
    # the injected OOV token exercises the smoothing lane and costs
    # score: OOV docs score strictly below their residue-free twins
    # on average
    oov = got[got.doc_id % 17 == 5]
    assert len(oov) > 0
    assert oov["mean_lp"].mean() < got[got.doc_id % 17 != 5]["mean_lp"].mean()


def test_semdedup_keep_matches_golden(ray_session):
    from proj_ray.pipelines.queries import semdedup_keep

    got = _sorted(semdedup_keep(SF01), ["vec_id"])
    want = _sorted(_oracle("semdedup_keep", ["embeddings"]), ["vec_id"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # drops really happen, most of the corpus survives
    assert got["kept"].sum() == 346
    assert got["kept"].eq(0).sum() == 154
    # the first member of every cluster is always kept
    first = got.sort_values("vec_id").groupby("cell").head(1)
    assert (first["kept"] == 1).all()


def test_bm25_topk_matches_oracle(ray_session):
    from proj_ray.pipelines.queries import bm25_topk

    got = bm25_topk(SF01)
    want = _oracle("bm25_topk", ["documents"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # scores strictly positive and non-increasing; a real ranking
    assert (got["score"] > 0).all()
    assert (got["score"].diff().dropna() <= 0).all()
    assert got["score"].nunique() > 5  # not one flat tie


def test_top_ngrams_matches_oracle(ray_session):
    from proj_ray.pipelines.queries import top_ngrams

    got = top_ngrams(SF01)
    want = _oracle("top_ngrams", ["documents"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    assert len(got) == 20
    assert (got["n"] >= 2).all()  # real repeats, not singletons
    assert got["gram"].str.count(" ").eq(2).all()  # true 3-grams


def test_curation_pipeline_matches_oracle(ray_session):
    from proj_ray.pipelines.queries import curation_pipeline

    got = _sorted(curation_pipeline(SF01), ["doc_id"])
    want = _sorted(_oracle("curation_pipeline", ["documents"]), ["doc_id"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # every stage must really fire, and a majority-ish survives to 0
    vc = got["drop_stage"].value_counts()
    assert set(vc.index) == {0, 1, 2, 3, 4}
    # first-fail attribution: non-en docs are stage 1 regardless of
    # anything else
    import pyarrow.parquet as _pq
    langs = _pq.read_table(f"{SF01}/documents.parquet",
                           columns=["doc_id", "lang"]).to_pandas()
    m = got.merge(langs, on="doc_id")
    assert (m.loc[m.lang != "en", "drop_stage"] == 1).all()
    assert (m.loc[m.drop_stage == 0, "lang"] == "en").all()


def test_minhash_dedup_keep_matches_golden(ray_session):
    from proj_ray.pipelines.queries import minhash_dedup_keep

    got = _sorted(minhash_dedup_keep(SF01), ["doc_id"])
    want = _sorted(_oracle("minhash_dedup_keep", ["documents"]), ["doc_id"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # clusters really collapse: fewer survivors than docs, one keeper
    # per cluster, and the keeper is the min member
    assert got["kept"].sum() == got["cluster"].nunique()
    assert got["kept"].sum() < len(got)
    keepers = got[got.kept == 1]
    assert (keepers["doc_id"] == keepers["cluster"]).all()
