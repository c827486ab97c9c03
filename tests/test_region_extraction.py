"""Golden region-extraction cases.

Ported from the reference's ``AddressInterpretTest.testExtractRegion``
(``src/test/java/com/rrs/rd/address/test/AddressInterpretTest.java:322-428``):
error tolerance (wrong city), missing levels, municipality 2/3-level forms,
市-prefixed district names, city==district names, renamed-district alias,
province-governed city-level districts, the 阿拉尔 re-parenting case.
"""

from __future__ import annotations

import pytest

from address_semantic_search_ray.kernel.stringutil import sub_from
from address_semantic_search_ray.kernel.visitor import RegionVisitor

CASES = [
    # (province, city, district, street(0=ignore), text, expected residual, title)
    (440000, 440100, 440184, 440184103, "广东广州从化区温泉镇新田村", "新田村", "normal"),
    (440000, 440100, 440184, 440184103, "广州从化区温泉镇新田村", "新田村", "missing-province"),
    (430000, 430100, 430181, 430181115, "湖南浏阳镇头镇回龙村", "回龙村", "town-starting-with-镇"),
    (520000, 522700, 522701, 0, "贵州黔东南都匀市大西门州中医院食堂4楼", "大西门州中医院食堂4楼", "wrong-city"),
    (650000, 652100, 652122, 0, "新疆维吾尔自治区吐鲁番地区鄯善县经济贸易委员会", "经济贸易委员会", "tolerance"),
    (310000, 310100, 310230, 310230203, "上海上海崇明县横沙乡", "", "municipality-3level"),
    (310000, 310100, 310230, 310230203, "上海崇明县横沙乡", "", "municipality-2level"),
    (370000, 370200, 370202, 0, "山东青岛市市南区宁德路金梦花园", "宁德路金梦花园", "市南区-full"),
    (370000, 370200, 370202, 0, "山东青岛市南区宁德路金梦花园", "宁德路金梦花园", "市南区-short"),
    (430000, 430300, 430321, 430321100, "湖南湘潭市湘潭县易俗河镇中南建材市场", "中南建材市场", "city==district-full"),
    (430000, 430300, 430321, 430321100, "湖南湘潭县易俗河镇中南建材市场", "中南建材市场", "city==district-no-city"),
    (330000, 330600, 330621, 330621102, "浙江省绍兴市绍兴县孙端镇村西村", "村西村", "renamed-alias-full"),
    (330000, 330600, 330621, 330621102, "浙江省绍兴县孙端镇村西村", "村西村", "renamed-alias-no-city"),
    (460000, 469031, 469031, 469026100, "海南海南省直辖市县昌江黎族自治县石碌镇", "", "province-governed-3level"),
    (460000, 469005, 469005, 0, "海南省文昌文昌市文建东路13号", "文建东路13号", "province-governed-3level-b"),
    (460000, 469005, 469005, 0, "海南省文昌市文建东路13号", "文建东路13号", "province-governed-2level"),
    (650000, 659002, 659002, 0, "新疆阿克苏地区阿拉尔市新苑祥和小区", "新苑祥和小区", "re-parented-city-level"),
]


@pytest.fixture(scope="module")
def visitor(region_dict):
    return RegionVisitor(region_dict)


@pytest.mark.parametrize(
    "pid,cid,did,sid,text,left_exp,title", CASES, ids=[c[-1] for c in CASES]
)
def test_extract_region(interpreter, visitor, pid, cid, did, sid, text, left_exp, title):
    visitor.reset()
    interpreter.trie.deep_most_query(text, 0, visitor)
    div = visitor.result_division()
    left = sub_from(text, visitor.result_end_position() + 1)
    assert div.province is not None and div.province.id == pid
    assert div.city is not None and div.city.id == cid
    assert div.district is not None and div.district.id == did
    if sid:
        assert div.street is not None and div.street.id == sid
    assert left == left_exp
