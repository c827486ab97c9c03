"""Property-based parity fuzz: NpCorpusIndex vs the sequential kernel.

Random single-district corpora (arbitrary combinations of town / village /
road / road_num / residual tokens, including empty fields, duplicate docs,
shared road names with different numbers) and random queries must score
EXACTLY equal through both kernels — every float, every top-N doc id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from address_semantic_search_ray.kernel.document import doc_from_fields, term_idf_key
from address_semantic_search_ray.kernel.npindex import NpCorpusIndex
from address_semantic_search_ray.kernel.similarity import (
    compute_doc_similarity, compute_idf, find_similar, stat_inverse_doc_refers,
)

TOWNS = ["", "青山镇", "柳河镇"]
VILLAGES = ["", "马家村", "石桥村"]
ROADS = ["", "人民路", "解放路", "幸福街"]
ROAD_NUMS = ["", "1号", "180号", "一二三号", "9号"]
TOKENS = ["阳", "光", "花", "园", "A", "12", "小", "区", "楼"]

field_strategy = st.tuples(
    st.sampled_from(TOWNS), st.sampled_from(VILLAGES), st.sampled_from(ROADS),
    st.sampled_from(ROAD_NUMS),
    st.lists(st.sampled_from(TOKENS), min_size=0, max_size=6).map("".join),
)

DIST = "11-1101-110101"


def _build_both(doc_fields):
    docs = []
    for i, (town, village, road, road_num, residual) in enumerate(doc_fields):
        docs.append(doc_from_fields(i, town, village, road, road_num, residual))
    idf = compute_idf(len(docs), stat_inverse_doc_refers(docs))
    for d in docs:
        for t in d.terms:
            t.idf = idf.get(term_idf_key(t), 0.0)

    docs_tbl = pa.table({
        "addr_id": pa.array(list(range(len(doc_fields))), pa.int64()),
        "district_key": pa.array([DIST] * len(doc_fields), pa.string()),
        "town": pa.array([f[0] for f in doc_fields], pa.string()),
        "village": pa.array([f[1] for f in doc_fields], pa.string()),
        "road": pa.array([f[2] for f in doc_fields], pa.string()),
        "road_num": pa.array([f[3] for f in doc_fields], pa.string()),
        "residual": pa.array([f[4] for f in doc_fields], pa.string()),
    })
    idf_tbl = pa.table({
        "district_key": pa.array([DIST] * len(idf), pa.string()),
        "term_key": pa.array(list(idf.keys()), pa.string()),
        "idf": pa.array(list(idf.values()), pa.float64()),
    })
    return docs, idf, NpCorpusIndex.from_tables(docs_tbl, idf_tbl)


@settings(max_examples=60, deadline=None)
@given(
    doc_fields=st.lists(field_strategy, min_size=1, max_size=10),
    query=field_strategy,
    top_n=st.integers(min_value=1, max_value=3),
)
def test_random_corpus_and_query_score_identically(doc_fields, query, top_n):
    docs, idf, np_index = _build_both(doc_fields)
    town, village, road, road_num, residual = query
    q = doc_from_fields(-1, town, village, road, road_num, residual, idf_lookup=idf)
    expected = np.array([compute_doc_similarity(q, d) for d in docs])
    got = np_index.score_district(DIST, town, village, road, road_num, residual)
    np.testing.assert_array_equal(got, expected)

    assert np_index.find_similar(DIST, town, village, road, road_num, residual,
                                 top_n=top_n) == find_similar(q, docs, top_n=top_n)
