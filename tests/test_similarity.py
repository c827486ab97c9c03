"""Similarity-kernel tests (discrimination cases from SURVEY.md §2.9 / FIXTURES.md F4).

Covers: identical-doc similarity 1.0, text-term density (翠微西里 vs 翠微北里,
SimilarityComputer.java:486-498), road-number proximity decay (:246-247),
town/village boost matrix (:216-237), numeric/ASCII idf=2 override and
MISSING_IDF=4 (:77,:590-592), .vt codec round-trip, top-N min-evict.
"""

from __future__ import annotations

import math

import pytest

from address_semantic_search_ray.kernel.document import (
    MISSING_IDF, analyse, deserialize, serialize, term_idf_key,
)
from address_semantic_search_ray.kernel.interpreter import Address
from address_semantic_search_ray.kernel.similarity import (
    TopN, compute_doc_similarity, compute_idf, find_similar, stat_inverse_doc_refers,
)


def _addr(text="", town=None, village=None, road="", road_num=""):
    a = Address("")
    a.text = text
    a.road = road
    a.road_num = road_num
    if town is not None:
        from address_semantic_search_ray.kernel.regions import Region
        a.town = Region(9000, 1, 400, town)
    if village is not None:
        from address_semantic_search_ray.kernel.regions import Region
        a.village = Region(9001, 1, 410, village)
    return a


_FILLERS = ["幸福小区甲座", "光明大厦乙单元", "人民广场丙侧", "建设新城丁区"]


def _corpus(addrs, fillers=True):
    """Build an analysed corpus; pad with filler docs so idf > 0 (a 2-doc
    partition would make every idf ln(2/2)=0, as in the reference)."""
    if fillers:
        addrs = list(addrs) + [_addr(t) for t in _FILLERS]
    docs = [analyse(a, doc_id=i) for i, a in enumerate(addrs)]
    idf = compute_idf(len(docs), stat_inverse_doc_refers(docs))
    for d in docs:
        for t in d.terms:
            t.idf = idf.get(term_idf_key(t), 0.0)
    return docs, idf


def test_identical_doc_sim_is_one():
    docs, idf = _corpus([_addr("翠微西里", road="万寿路", road_num="13号"),
                         _addr("金梦花园东门", road="宁德路")])
    q = analyse(_addr("翠微西里", road="万寿路", road_num="13号"), idf_lookup=idf, doc_id=-1)
    assert compute_doc_similarity(q, docs[0]) == pytest.approx(1.0)
    assert compute_doc_similarity(q, docs[1]) < 1.0


def test_density_discriminates_contiguous_match():
    # query 翠微西里 matches both docs' 4 tokens; in doc1 they are spread out
    # (翠微北里89号西2楼) so text-term density < 1 scales the text dims down
    # relative to the (density-free) road dim -> lower cosine. NOTE: density
    # only discriminates when mixed with non-text terms — with a pure-text doc
    # the uniform scale cancels in the normalized cosine (same as reference).
    docs, idf = _corpus([
        _addr("翠微西里10楼", road="万寿路"),
        _addr("翠微北里89号西2楼", road="万寿路"),  # 翠,微,西,里 present but spread
    ])
    q = analyse(_addr("翠微西里", road="万寿路"), idf_lookup=idf, doc_id=-1)
    s0 = compute_doc_similarity(q, docs[0])
    s1 = compute_doc_similarity(q, docs[1])
    assert s0 > s1 > 0


def test_road_num_proximity_decay():
    docs, idf = _corpus([
        _addr(road="和平里中街", road_num="19号"),
        _addr(road="和平里中街", road_num="100号"),
        _addr(road="建国路", road_num="17号"),
    ])
    q = analyse(_addr(road="和平里中街", road_num="17号"), idf_lookup=idf, doc_id=-1)
    s_near = compute_doc_similarity(q, docs[0])
    s_far = compute_doc_similarity(q, docs[1])
    # |17-19| decay beats |17-100| decay (SimilarityComputer.java:246-247)
    assert s_near > s_far > 0
    # NOTE: a different-road doc with the same road-num TEXT can still score
    # high because sumDD sums matched dims only (the Lucene-flavored quirk,
    # java:538-542) — intentionally not asserted against.


def test_town_village_boost_matrix():
    docs, idf = _corpus([
        _addr(town="温泉镇", village="新田村"),
        _addr(town="温泉镇", village="旧田村"),
        _addr(town="别镇", village="新田村"),
    ])
    q = analyse(_addr(town="温泉镇", village="新田村"), idf_lookup=idf, doc_id=-1)
    sims = [compute_doc_similarity(q, d) for d in docs]
    assert sims[0] > sims[1]  # same town+village beats same town only
    assert sims[0] > sims[2]


def test_idf_overrides():
    docs, _ = _corpus([_addr("天元12号AB"), _addr("天元大厦")], fillers=False)
    df = stat_inverse_doc_refers(docs)
    idf = compute_idf(len(docs), df)
    assert idf["12"] == 2.0  # pure digits
    assert idf["AB"] == 2.0  # pure ASCII letters
    # 天 appears in both docs: ln(2/3) < 0 -> clamped to 0
    assert idf["天"] == 0.0
    # 大 appears once: ln(2/2) = 0
    assert idf["大"] == pytest.approx(math.log(2 / 2))
    # query-side missing key falls back to 4
    q = analyse(_addr("不存在词"), idf_lookup=idf, doc_id=-1)
    assert all(t.idf == MISSING_IDF for t in q.terms)


def test_road_num_idf_key():
    a = _addr(road="和平里中街", road_num="17号")
    d = analyse(a, doc_id=5)
    keys = [term_idf_key(t) for t in d.terms]
    assert "和平里中街-17" in keys  # RoadNum key = "{road}-{num}"


def test_serialize_round_trip():
    # .vt codec shape: 955163$R和平里中街|N17号|X天 (SimilarityComputer.java:331-380)
    d = analyse(_addr("天元", road="和平里中街", road_num="17号"), doc_id=955163)
    line = serialize(d)
    assert line.startswith("955163$R和平里中街|N17号|X天|X元")
    d2 = deserialize(line)
    assert d2.id == 955163
    assert [t.text for t in d2.terms] == [t.text for t in d.terms]
    assert d2.road_num_value == 17
    assert d2.road_num.ref is d2.road


def test_topn_min_evict():
    k = TopN(2)
    assert not k.add(1, 0.0)  # non-positive similarity rejected
    k.add(1, 0.5)
    k.add(2, 0.7)
    k.add(3, 0.6)  # evicts 0.5
    assert sorted(d for d, _ in k.docs) == [2, 3]
    assert [d for d, _ in k.sorted_desc()] == [2, 3]


def test_find_similar_end_to_end(interpreter):
    # interpret real addresses -> corpus -> query -> top-1 is the right doc
    texts = [
        "北京北京海淀区万寿路翠微西里13号楼1403室",
        "北京北京海淀区万寿路翠微北里89号2楼",
        "北京北京海淀区中关村南大街9号理想大厦",
    ]
    addrs = [interpreter.interpret(t) for t in texts]
    docs, idf = _corpus(addrs)
    q_addr = interpreter.interpret("北京市海淀区万寿路翠微西里13号楼")
    q = analyse(q_addr, idf_lookup=idf, doc_id=-1)
    top = find_similar(q, docs, top_n=3)
    assert top[0][0] == 0
    assert top[0][1] > top[1][1]
