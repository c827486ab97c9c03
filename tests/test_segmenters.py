"""Alternate segmenters (P9 extension surface) + import-side caps (S5)."""

from __future__ import annotations

from address_semantic_search_ray.kernel.document import doc_from_fields
from address_semantic_search_ray.kernel.segment import (
    BigramSegmenter, DictSegmenter, simple_segment,
)
from address_semantic_search_ray.stages.interpret import IMPORT_CAPS, apply_import_caps


def test_dict_segmenter_prefers_longest_dictionary_term():
    seg = DictSegmenter(["人民路", "人民", "解放路", "小区"])
    # longest match 人民路 beats 人民; unmatched spans fall back to
    # simple-segment rules: ASCII runs as one token, CJK char-by-char
    assert seg("人民路9号阳光小区") == ["人民路", "9", "号", "阳", "光", "小区"]


def test_dict_segmenter_ascii_runs_and_empty():
    seg = DictSegmenter(["幸福街"])
    assert seg("") == []
    assert seg("abc123幸福街") == ["abc", "123", "幸福街"]


def test_bigram_segmenter_overlapping_bigrams():
    seg = BigramSegmenter()
    assert seg("人民路") == ["人民", "民路"]
    assert seg("路") == ["路"]
    assert seg("A1人民") == ["A", "1", "人民"]
    assert seg("") == []


def test_segmenter_is_injectable_into_doc_builder():
    seg = DictSegmenter(["光明路"])
    d = doc_from_fields(1, "", "", "", "", "光明路口", segment=seg)
    assert [t.text for t in d.terms] == ["光明路", "口"]
    d2 = doc_from_fields(1, "", "", "", "", "光明路口", segment=simple_segment)
    assert [t.text for t in d2.terms] == ["光", "明", "路", "口"]


def test_import_caps_truncate_persisted_fields():
    class A:
        pass

    a = A()
    a.text = "x" * 150
    a.road = "长" * 12
    a.road_num = "9" * 14
    apply_import_caps(a)
    assert len(a.text) == IMPORT_CAPS["text"] == 100
    assert len(a.road) == IMPORT_CAPS["road"] == 8
    assert len(a.road_num) == IMPORT_CAPS["road_num"] == 10
    # under-cap fields pass through untouched
    b = A()
    b.text, b.road, b.road_num = "short", "路", "1号"
    apply_import_caps(b)
    assert (b.text, b.road, b.road_num) == ("short", "路", "1号")
