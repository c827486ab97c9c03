"""docs_c4_filter: the composite must equal the composition of its already-
verified component operators."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def test_c4_filter_equals_component_composition(ray_session):
    from address_semantic_search_ray.pipelines import queries as q

    got = q.docs_c4_filter(SF_DIR).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    tok = q.text_token_count(SF_DIR).to_pandas().set_index("doc_id")
    qual = q.text_quality(SF_DIR).to_pandas().set_index("doc_id")
    lang = q.text_lang_id(SF_DIR).to_pandas().set_index("doc_id")
    surv = set(q.dedup_filter(SF_DIR).to_pandas()["doc_id"])
    scrub = q.text_scrub_pii(SF_DIR).to_pandas().set_index("doc_id")

    keep = sorted(
        d for d in tok.index
        if d in surv
        and 10 <= tok.loc[d, "n_tokens"] <= 1000
        and qual.loc[d, "distinct_ratio"] >= 0.3
        and 2.0 <= qual.loc[d, "mean_token_len"] <= 12.0
        and lang.loc[d, "lang_pred"] != "unk")

    assert list(got["doc_id"]) == keep
    assert 0 < len(keep) < len(tok), "gates should drop some docs, not all"
    for row in got.itertuples(index=False):
        assert row.text == scrub.loc[row.doc_id, "text"]
        assert row.lang_pred == lang.loc[row.doc_id, "lang_pred"]
        assert row.n_tokens == tok.loc[row.doc_id, "n_tokens"]
