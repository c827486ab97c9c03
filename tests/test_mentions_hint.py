"""Region-hint reuse in find_mentions must be invisible: identical mentions
and identical Address fields with the hint on and off (the hint skips
interpret's extract_region re-scan only when provably safe)."""

import pickle

import pytest

from address_semantic_search_ray.data.synth import ensure_dataset
from address_semantic_search_ray.kernel.interpreter import Interpreter
from address_semantic_search_ray.kernel.mentions import find_mentions
from address_semantic_search_ray.kernel.regions import RegionDict
from address_semantic_search_ray.pipelines.oracle import default_region_dict_path


@pytest.fixture(scope="module")
def interp():
    return Interpreter(RegionDict.from_parquet(default_region_dict_path()))


def _addr_sig(a):
    return (
        a.province.id if a.province else None,
        a.city.id if a.city else None,
        a.district.id if a.district else None,
        a.street.id if a.street else None,
        a.town.id if a.town else None,
        a.village.id if a.village else None,
        a.text, a.road, a.road_num, a.building_num,
    )


def test_hint_parity_on_synth_corpus(interp):
    """Every turn of the sf0.001 transcripts: same mentions, same addresses."""
    import glob
    import os

    import pyarrow.parquet as pq

    data_dir = ensure_dataset(0.001)
    files = sorted(glob.glob(os.path.join(data_dir, "transcripts.parquet", "*.parquet")))
    n_checked = 0
    for f in files:
        texts = pq.read_table(f, columns=["text"]).column("text").to_pylist()
        for text in texts:
            if not text:
                continue
            with_hint = find_mentions(text, interp, use_hint=True)
            without = find_mentions(text, interp, use_hint=False)
            assert len(with_hint) == len(without), text
            for m1, m2 in zip(with_hint, without):
                assert (m1.start, m1.end, m1.text) == (m2.start, m2.end, m2.text), text
                assert _addr_sig(m1.addr) == _addr_sig(m2.addr), text
            n_checked += 1
    assert n_checked >= 1000


EDGE_TEXTS = [
    # special chars INSIDE the region span -> hint must fall back
    "浙江省,杭州市西湖区文三路100号",
    "浙江省杭州市-西湖区文三路100号",
    # digit run (phone) immediately after the region prefix
    "浙江省杭州市西湖区1381234567890号楼",
    # building-num pattern early in the mention
    "北京市朝阳区3号楼2单元301室",
    # bracketless but unit suffix adjacent to region
    "上海市浦东新区5单元",
    # mention runs to end of turn (scan hits text end)
    "收货地址浙江省杭州市西湖区文三路",
    # two mentions back to back, stop char between
    "先去浙江省杭州市西湖区文三路1号，再到江苏省南京市玄武区中山路2号",
    # ambiguous trailing 市 char at the frontier
    "四川省成都市青羊区人民中路",
]


def test_hint_parity_edge_cases(interp):
    for text in EDGE_TEXTS:
        with_hint = find_mentions(text, interp, use_hint=True)
        without = find_mentions(text, interp, use_hint=False)
        assert len(with_hint) == len(without), text
        for m1, m2 in zip(with_hint, without):
            assert (m1.start, m1.end, m1.text) == (m2.start, m2.end, m2.text), text
            assert _addr_sig(m1.addr) == _addr_sig(m2.addr), text


def test_trie_pickle_roundtrip_keeps_node_items(interp):
    """The broadcast path pickles the trie; node_items must survive."""
    trie2 = pickle.loads(pickle.dumps(interp.trie, protocol=5))
    assert trie2.node_items is not None
    hits = trie2.full_match("西湖区")
    assert hits
