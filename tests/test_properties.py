"""Property-based robustness tests (hypothesis).

The reference has no randomized testing (SURVEY.md §5); these guard the
invariants retries depend on: no crashes on arbitrary text, determinism of
every per-record kernel, and structural invariants of the outputs.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from address_semantic_search_ray.kernel.roadnum import translate_road_num
from address_semantic_search_ray.kernel.segment import simple_segment

# mixed alphabet incl. CJK, digits, ASCII, punctuation, brackets, whitespace
_TEXT = st.text(
    alphabet=st.sampled_from(
        "山东青岛市南区宁夏路号楼单元室镇乡村街道大0123456789ABab#-（）()【】 \t\r\n，。;；"
        "广州省北京上海людé🏠十一二三"
    ),
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(_TEXT)
def test_interpret_never_crashes_and_is_deterministic(interpreter, text):
    a1 = interpreter.interpret(text)
    a2 = interpreter.interpret(text)
    if a1 is None:
        assert a2 is None
        return
    assert (a1.text, a1.road, a1.road_num, a1.building_num) == \
        (a2.text, a2.road, a2.road_num, a2.building_num)
    for slot in ("province", "city", "district", "street", "town", "village"):
        r1, r2 = getattr(a1, slot), getattr(a2, slot)
        assert (r1.id if r1 else None) == (r2.id if r2 else None)


@settings(max_examples=200, deadline=None)
@given(_TEXT)
def test_mentions_are_in_bounds_and_ordered(interpreter, text):
    from address_semantic_search_ray.kernel.mentions import find_mentions

    mentions = find_mentions(text, interpreter)
    prev_end = -1
    for m in mentions:
        assert 0 <= m.start < m.end <= len(text)
        assert m.start >= prev_end  # non-overlapping, left-to-right
        assert text[m.start:m.end] == m.text
        assert m.addr.city is not None and m.addr.district is not None
        prev_end = m.end


@settings(max_examples=300, deadline=None)
@given(_TEXT)
def test_segmenter_partition_property(text):
    tokens = simple_segment(text)
    assert "".join(tokens) == text  # exact partition of the input


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="0123456789０-９一二三四五六七八九十甲乙号院ABab", max_size=10))
def test_translate_road_num_total(text):
    v = translate_road_num(text)
    assert isinstance(v, int) and v >= 0
    assert translate_road_num(text) == v


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="翠微西北里路号0123456789", min_size=1, max_size=12),
                min_size=2, max_size=8))
def test_similarity_bounds_and_self_rank(texts):
    from address_semantic_search_ray.kernel.document import doc_from_fields, term_idf_key
    from address_semantic_search_ray.kernel.similarity import (
        compute_doc_similarity, compute_idf, stat_inverse_doc_refers,
    )

    docs = [doc_from_fields(i, "", "", "", "", t) for i, t in enumerate(texts)]
    idf = compute_idf(len(docs), stat_inverse_doc_refers(docs))
    for d in docs:
        for t in d.terms:
            t.idf = idf.get(term_idf_key(t), 0.0)
    for q in docs:
        for d in docs:
            s = compute_doc_similarity(q, d)
            assert -1e-9 <= s <= 1 + 1e-9  # cosine bounds
