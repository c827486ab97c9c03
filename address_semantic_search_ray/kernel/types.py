"""Region / term type enums.

Semantics ported from the reference (liuzhibin-cn/address-semantic-search):
- region level codes: ``persist/RegionType.java:9-57`` — the integer order is
  load-bearing ("lowest level" selection uses max value).
- term type 1-char codes: ``TermType.java:14-55``.
"""

from __future__ import annotations

from enum import IntEnum


class RegionType(IntEnum):
    UNDEFINED = 0
    COUNTRY = 10
    PROVINCE = 100
    PROVINCE_LEVEL_CITY1 = 150  # municipality, province-parallel node (北京)
    PROVINCE_LEVEL_CITY2 = 151  # municipality, city-parallel node (北京市)
    CITY = 200
    CITY_LEVEL_DISTRICT = 250  # province-governed city-level district (阿拉尔市)
    DISTRICT = 300
    TOWN = 400  # mined town (附加乡镇)
    VILLAGE = 410  # mined village (附加村)
    STREET = 450
    PLATFORM_L4 = 460


class TermType:
    """1-char term codes (``TermType.java:14-55``)."""

    UNDEFINED = "0"
    PROVINCE = "1"
    CITY = "2"
    DISTRICT = "3"
    STREET = "4"
    TOWN = "T"
    VILLAGE = "V"
    ROAD = "R"
    ROAD_NUM = "N"
    TEXT = "X"
    IGNORE = "I"
