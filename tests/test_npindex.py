"""Bit-parity of the numpy similarity index vs the sequential kernel.

The vectorized ``NpCorpusIndex`` (kernel/npindex.py) must reproduce
``compute_doc_similarity``/``find_similar`` EXACTLY — same floats, same
top-1 doc — for every real query shape the synthetic corpus produces, plus
adversarial field combinations (missing town/village/road, roadnum fallback,
town==village text, idf-missing terms). Exactness is the guarantee that the
streaming (numpy) and checkpointed (python) pipeline modes emit identical
triples.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from address_semantic_search_ray.data.synth import ensure_dataset
from address_semantic_search_ray.kernel.document import doc_from_fields
from address_semantic_search_ray.kernel.interpreter import Interpreter
from address_semantic_search_ray.kernel.mentions import district_key, find_mentions
from address_semantic_search_ray.kernel.npindex import NpCorpusIndex
from address_semantic_search_ray.kernel.regions import RegionDict
from address_semantic_search_ray.kernel.similarity import compute_doc_similarity, find_similar
from address_semantic_search_ray.pipelines.oracle import (
    build_corpus_index, default_region_dict_path,
)


@pytest.fixture(scope="module")
def kit():
    rd = RegionDict.from_parquet(default_region_dict_path())
    interpreter = Interpreter(rd)
    data_dir = ensure_dataset(0.001, root="/tmp/asr_synth")
    addresses = pq.read_table(data_dir + "/addresses.parquet")
    py_index = build_corpus_index(addresses, interpreter)

    # docs table in the exact shape CorpusInterpretStage emits (residual is
    # the RAW interpreted text — the segmenter re-derives tokens from it)
    import pyarrow as pa

    rows = {k: [] for k in ("addr_id", "district_key", "town", "village",
                            "road", "road_num", "residual")}
    for addr_id, text in zip(addresses.column("addr_id").to_pylist(),
                             addresses.column("text").to_pylist()):
        a = interpreter.interpret(text)
        if a is None or a.city is None or a.district is None:
            continue
        rows["addr_id"].append(addr_id)
        rows["district_key"].append(district_key(a))
        rows["town"].append(a.town.name if a.town is not None else "")
        rows["village"].append(a.village.name if a.village is not None else "")
        rows["road"].append(a.road)
        rows["road_num"].append(a.road_num)
        rows["residual"].append(a.text)
    idf_rows = {"district_key": [], "term_key": [], "idf": []}
    for key, (_docs, idf) in py_index.items():
        for k, v in idf.items():
            idf_rows["district_key"].append(key)
            idf_rows["term_key"].append(k)
            idf_rows["idf"].append(v)
    docs_tbl = pa.table({k: pa.array(v) for k, v in rows.items()})
    idf_tbl = pa.table({k: pa.array(v) for k, v in idf_rows.items()})
    np_index = NpCorpusIndex.from_tables(docs_tbl, idf_tbl)
    return interpreter, data_dir, py_index, np_index


def _residual_tokens(doc):
    return " ".join(t.text for t in doc.terms if t.type == "X")


def _compare_query(py_index, np_index, key, town, village, road, road_num, residual):
    entry = py_index.get(key)
    assert entry is not None
    docs, idf = entry
    q = doc_from_fields(-1, town, village, road, road_num, residual, idf_lookup=idf)
    expected = np.array([compute_doc_similarity(q, d) for d in docs])
    got = np_index.score_district(key, town, village, road, road_num, residual)
    assert got is not None and len(got) == len(expected)
    np.testing.assert_array_equal(got, expected)  # EXACT, not approx

    # BOTH internal paths must agree bit-for-bit with the sequential kernel
    # regardless of which one the district-size dispatch picks
    di = np_index.district_idx[key]
    vec = np_index._score_district_vec(di, town, village, road, road_num, residual)
    sca = np_index._score_district_scalar(di, town, village, road, road_num, residual)
    np.testing.assert_array_equal(vec, expected)
    np.testing.assert_array_equal(np.array(sca), expected)

    top_py = find_similar(q, docs, top_n=3)
    top_np = np_index.find_similar(key, town, village, road, road_num,
                                   residual, top_n=3)
    assert top_np == top_py
    top1_py = find_similar(q, docs, top_n=1)
    top1_np = np_index.find_similar(key, town, village, road, road_num,
                                    residual, top_n=1)
    assert top1_np == top1_py


def test_every_synthetic_mention_scores_identically(kit):
    """All mention shapes from the sf0.001 transcripts, both kernels."""
    interpreter, data_dir, py_index, np_index = kit
    transcripts = pq.read_table(data_dir + "/transcripts.parquet", columns=["text"])
    n_checked = 0
    seen = set()
    for text in transcripts.column("text").to_pylist():
        if not text:
            continue
        for m in find_mentions(text, interpreter):
            a = m.addr
            key = district_key(a)
            if key not in py_index:
                continue
            town = a.town.name if a.town is not None else ""
            village = a.village.name if a.village is not None else ""
            shape = (key, town, village, a.road, a.road_num, a.text)
            if shape in seen:
                continue
            seen.add(shape)
            _compare_query(py_index, np_index, *shape)
            n_checked += 1
    assert n_checked > 100  # the corpus must actually exercise the kernel


def test_corpus_docs_score_themselves_identically(kit):
    """Every corpus doc as its own query: perfect-match rows + tie handling."""
    _, _, py_index, np_index = kit
    n = 0
    for key, (docs, idf) in py_index.items():
        for d in docs[:3]:
            _compare_query(
                py_index, np_index, key,
                d.town.text if d.town is not None else "",
                d.village.text if d.village is not None else "",
                d.road.text if d.road is not None else "",
                d.road_num.text if d.road_num is not None else "",
                _residual_tokens(d))
            n += 1
    assert n > 20


def test_adversarial_field_combinations(kit):
    """Field shapes the synthetic mentions may not cover: missing pieces,
    roadnum-fallback (matching road, absent roadnum text), unknown terms
    (MISSING_IDF path), wrong road."""
    _, _, py_index, np_index = kit
    key = max(py_index, key=lambda k: len(py_index[k][0]))
    docs, idf = py_index[key]
    base = next((d for d in docs if d.road is not None and d.road_num is not None), docs[0])
    road = base.road.text if base.road is not None else ""
    town = base.town.text if base.town is not None else ""
    cases = [
        ("", "", "", "", "完全未知的词 另一个词"),
        (town, "", "", "", ""),
        ("", "", road, "", ""),
        ("", "", road, "99号", ""),          # roadnum fallback w/ decay
        ("", "", road, "1号", "某个 词"),
        ("", "", "不存在路", "1号", ""),      # wrong road: no fallback
        (town, "不存在村", road, "1号", ""),
        ("不存在镇", "", "", "", "词 词 词"),  # repeated-token dedup
    ]
    for c in cases:
        _compare_query(py_index, np_index, key, *c)


def test_payload_roundtrip_is_zero_copy_safe(kit):
    """to_payload/from_payload reproduces identical scores (the plasma path
    ships exactly these arrays)."""
    _, _, py_index, np_index = kit
    payload = np_index.to_payload()
    rebuilt = NpCorpusIndex.from_payload(payload)
    key = next(iter(py_index))
    docs, idf = py_index[key]
    d = docs[0]
    args = (key,
            d.town.text if d.town is not None else "",
            d.village.text if d.village is not None else "",
            d.road.text if d.road is not None else "",
            d.road_num.text if d.road_num is not None else "",
            _residual_tokens(d))
    np.testing.assert_array_equal(rebuilt.score_district(*args),
                                  np_index.score_district(*args))


def test_pipeline_idf_bit_equals_kernel_idf(kit):
    """The distributed idf producer (stages/idf.py, libm log elementwise) must
    emit floats BIT-IDENTICAL to the sequential kernel's compute_idf
    (math.log). np.log differs from math.log in the last ulp (e.g. ln 3), and
    one ulp in an idf flipped a top-N tie between the numpy scan and the
    python explain scorer — so this parity is load-bearing, not cosmetic."""
    import pyarrow as pa

    from address_semantic_search_ray.kernel.document import term_idf_key
    from address_semantic_search_ray.stages.idf import driver_idf

    _, _, py_index, _ = kit
    rows = {"district_key": [], "term_keys": []}
    for key, (docs, _idf) in py_index.items():
        for d in docs:
            rows["district_key"].append(key)
            rows["term_keys"].append([term_idf_key(t) for t in d.terms])
    tbl = pa.table({
        "district_key": pa.array(rows["district_key"], pa.string()),
        "term_keys": pa.array(rows["term_keys"], pa.list_(pa.string())),
    })
    out = driver_idf(tbl)
    got = {}
    for dist, k, v in zip(out.column("district_key").to_pylist(),
                          out.column("term_key").to_pylist(),
                          out.column("idf").to_pylist()):
        got[(dist, k)] = v
    n = 0
    for key, (_docs, idf) in py_index.items():
        for k, v in idf.items():
            assert got[(key, k)] == v, (key, k, got[(key, k)], v)  # exact
            n += 1
    assert n > 500  # sanity: the corpus produced a real idf table


def test_explain_matched_equals_python_explain(kit):
    """``NpCorpusIndex.explain_matched`` must reproduce the python explain
    scorer's MatchedTerm records EXACTLY (text, 1-char type, boost, tfidf,
    density, coord — same order, same floats) for every distinct mention
    shape the sf0.001 transcripts produce, on that mention's top-3 winners
    plus doc 0 (fallback/boost edges live off the winners too)."""
    from address_semantic_search_ray.kernel.similarity import (
        compute_doc_similarity_explain)

    interpreter, data_dir, py_index, np_index = kit
    transcripts = pq.read_table(data_dir + "/transcripts.parquet", columns=["text"])
    n_rows = 0
    seen = set()
    for text in transcripts.column("text").to_pylist():
        if not text:
            continue
        for m in find_mentions(text, interpreter):
            a = m.addr
            key = district_key(a)
            if key not in py_index:
                continue
            town = a.town.name if a.town is not None else ""
            village = a.village.name if a.village is not None else ""
            shape = (key, town, village, a.road, a.road_num, a.text)
            if shape in seen:
                continue
            seen.add(shape)
            docs, idf = py_index[key]
            q = doc_from_fields(-1, town, village, a.road, a.road_num, a.text,
                                idf_lookup=idf)
            sims = np.asarray(np_index.score_district(*shape), dtype=np.float64)
            pos = np.flatnonzero(sims > 0.0)
            sel = list(pos[np.argsort(-sims[pos], kind="stable")][:3]) + [0]
            for i in dict.fromkeys(int(x) for x in sel):
                _sim, want = compute_doc_similarity_explain(q, docs[i])
                got = np_index.explain_matched(key, i, town, village,
                                               a.road, a.road_num, a.text)
                assert len(got) == len(want)
                for g, w in zip(got, want):
                    assert g["text"] == w["text"]
                    assert g["type"] == str(w["type"])
                    assert g["boost"] == w["boost"]
                    assert g["tfidf"] == w["tfidf"]  # exact, not approx
                    assert g["density"] == w["density"]
                    assert g["coord"] == w["coord"]
                    n_rows += 1
    assert n_rows > 200  # the corpus must actually exercise the explain path
