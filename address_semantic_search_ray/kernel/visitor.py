"""Acceptance policy for trie matches — the heart of region interpretation.

Direct semantic port of ``interpret/RegionInterpreterVisitor.java:61-557``:
- best result = max accepted-term stack depth (``checkDeepMost`` ``:472-484``);
- ``findAcceptableItem`` priority cascade (``:234-390``): nothing-matched-yet,
  alias-guard for street/town, exact next-level child, skip-one-level, repeated
  region, fault tolerance (city-level district under province; full-name
  district overriding a wrong city), street/town/village under current district;
- ``positioning`` pointer fix for ambiguous trailing 市/县/区/镇/乡 (``:206-225``);
- ``endVisit`` stack/pos restore + division rebuild (``:140-192``);
- ``updateCurrentDivisionState`` hierarchy backfill (``:423-471``).

One visitor instance per actor/worker (stateful, reset per row) — mirrors the
reference's explicitly non-thread-safe, zero-alloc reuse design (``:52-56``).

Items arrive from the trie as ``(term_type, region, is_full)`` — full-match-
ness is precomputed at index build (a constant of the indexed name and
region; the reference recomputes it per visit, ``isFullMatch`` java:391-399).
"""

from __future__ import annotations

from .division import Division
from .regions import RegionDict
from .types import RegionType, TermType

_AMBIGUOUS_CHARS = frozenset("市县区镇乡")

_ACCEPTABLE_ITEM_TYPES = frozenset((
    TermType.PROVINCE, TermType.CITY, TermType.DISTRICT,
    TermType.STREET, TermType.TOWN, TermType.VILLAGE, TermType.IGNORE,
))


class RegionVisitor:
    __slots__ = (
        "regions", "current_level", "deep_most_level", "current_pos", "deep_most_pos",
        "full_match_count", "deep_most_full_match_count", "deep_most_division", "cur_division",
        "stack", "scan_max_read",
    )

    def __init__(self, regions: RegionDict):
        self.regions = regions
        self.deep_most_division = Division()
        self.cur_division = Division()
        self.stack: list[tuple] = []  # (term_type, region, is_full)
        self.reset()

    # -- visitor contract --------------------------------------------------

    def start_round(self):
        self.current_level += 1

    def visit(self, items, key_len: int, text: str, pos: int) -> bool:
        # conservative read-frontier tracking: the acceptance cascade and
        # positioning may read text[pos+1] / text[pos+2] (see interpret's
        # region-hint reuse in interpreter.py — a scan result is only reused
        # when the text is unchanged over [0, scan_max_read])
        mr = pos + 2
        last = len(text) - 1
        if mr > last:
            mr = last
        if mr > self.scan_max_read:
            self.scan_max_read = mr
        item = self._find_acceptable_item(items, key_len, text, pos)
        if item is None:
            return False
        region = item[1]  # None for Ignore items
        self.stack.append(item)
        if item[2]:
            self.full_match_count += 1
        self.current_pos = self._positioning(region, item[2], text, pos)
        self._update_current_division(region)
        return True

    def position_after_accept_item(self) -> int:
        return self.current_pos

    def end_visit(self, key_len: int, text: str, pos: int):
        # RegionInterpreterVisitor.java:140-192
        self._check_deep_most()

        term_type, region, is_full = self.stack.pop()
        self.current_pos = pos - key_len
        if is_full:
            # NOTE: the reference *increments* here too (:149) — kept for parity.
            self.full_match_count += 1
        if term_type == TermType.IGNORE:
            return

        cur = self.cur_division
        least = street = town = village = None
        for t, r, _f in self.stack:
            if t == TermType.IGNORE:
                continue
            rt = r.type
            if rt in (RegionType.STREET, RegionType.PLATFORM_L4):
                street = r
                continue
            if rt == RegionType.TOWN:
                town = r
                continue
            if rt == RegionType.VILLAGE:
                village = r
                continue
            if least is None or rt > least.type:
                least = r

        if street is None:
            cur.street = None
        if town is None:
            cur._town = None  # == town setter with None
        if village is None:
            cur.village = None
        # (town property == _town when street is None; when street is not
        # None the first disjunct already decides)
        if cur.street is not None or cur._town is not None or cur.village is not None:
            return
        if least is not None:
            if least.type in (RegionType.PROVINCE, RegionType.PROVINCE_LEVEL_CITY1):
                cur.city = None
                cur.district = None
            elif least.type in (RegionType.CITY, RegionType.PROVINCE_LEVEL_CITY2):
                cur.district = None
            return
        cur.province = None
        cur.city = None
        cur.district = None

    def end_round(self):
        self._check_deep_most()
        self.current_level -= 1

    # -- internals ---------------------------------------------------------

    def _positioning(self, region, is_full: bool, text: str, pos: int) -> int:
        # RegionInterpreterVisitor.java:206-225
        if region is None:
            return pos
        if (
            not is_full
            and region.type in (RegionType.CITY, RegionType.DISTRICT, RegionType.STREET)
            and pos + 1 <= len(text) - 1
        ):
            c = text[pos + 1]
            if c in _AMBIGUOUS_CHARS:
                if region.children:
                    for child in region.children:
                        if child.name[0] == c:
                            return pos
                return pos + 1
        return pos

    def _find_acceptable_item(self, items, key_len: int, text: str, pos: int):
        # RegionInterpreterVisitor.java:234-390
        most_priority = -1
        acceptable = None
        cur = self.cur_division
        get_region = self.regions.get
        cur_province = cur.province
        # hoisted: constant during the item loop (cur division is not mutated
        # while scanning one entry's items — same in the reference)
        least = cur.least_region() if cur_province is not None else None
        least_id = least.id if least is not None else None
        n = len(text)
        for item in items:
            term_type, region, is_full = item
            if term_type not in _ACCEPTABLE_ITEM_TYPES:
                continue

            if term_type == TermType.IGNORE:
                if acceptable is None:
                    most_priority = 4
                    acceptable = item
                continue

            # nothing matched yet -> pick the highest level (lowest type value)
            if cur_province is None:
                rt = region.type  # IntEnum: compares as a plain int
                if most_priority == -1:
                    most_priority = rt
                    acceptable = item
                if rt < most_priority:
                    most_priority = rt
                    acceptable = item
                continue

            rtype = region.type

            # alias-matched street/town can't be followed by region/road keywords
            if not is_full and pos + 1 <= n - 1:
                if rtype == RegionType.STREET or rtype == RegionType.TOWN:
                    nxt = text[pos + 1]
                    if nxt in "区县乡镇村街路":
                        continue
                    if nxt == "大" and pos + 2 <= n - 1 and text[pos + 2] in "街道":
                        continue

            # 1. exact next-level child of the current division
            if region.parent_id == least_id:
                acceptable = item
                break

            # 2. one level missing in the middle
            if most_priority == -1 or most_priority > 2:
                parent = get_region(region.parent_id)
                # 2.1 city missing: province + district
                if (
                    cur.city is None
                    and rtype == RegionType.DISTRICT
                    and parent is not None
                    and cur_province.id == parent.parent_id
                ):
                    most_priority = 2
                    acceptable = item
                    continue
                # 2.2 district missing: city + street/town/village/platform-L4
                if (
                    cur.district is None
                    and cur.city is not None
                    and rtype in (
                        RegionType.STREET, RegionType.TOWN,
                        RegionType.PLATFORM_L4, RegionType.VILLAGE,
                    )
                    and parent is not None
                    and cur.city.id == parent.parent_id
                ):
                    most_priority = 2
                    acceptable = item
                    continue

            # 3. region repeated in the address
            if most_priority == -1 or most_priority > 3:
                rid = region.id
                if (
                    (cur_province is not None and cur_province.id == rid)
                    or (cur.city is not None and cur.city.id == rid)
                    or (cur.district is not None and cur.district.id == rid)
                    or (cur.street is not None and cur.street.id == rid)
                    # _town: the property's street fallback is subsumed by the
                    # street check one line up (same region object)
                    or (cur._town is not None and cur._town.id == rid)
                    or (cur.village is not None and cur.village.id == rid)
                ):
                    most_priority = 3
                    acceptable = item
                    continue

            # 4. fault tolerance
            if most_priority == -1 or most_priority > 4:
                # 4.1 city-level district directly under the matched province (阿拉尔)
                if (
                    rtype == RegionType.CITY_LEVEL_DISTRICT
                    and cur_province.id == region.parent_id
                ):
                    most_priority = 4
                    acceptable = item
                    continue
                # 4.2 full-name district whose city disagrees but province agrees
                if (
                    rtype == RegionType.DISTRICT
                    and cur.city is not None
                    and is_full
                    and cur.city.id != region.parent_id
                ):
                    city = get_region(region.parent_id)
                    if city is not None and city.parent_id == cur_province.id:
                        most_priority = 4
                        acceptable = item
                        continue

            # 5. street/town/village not covered above
            if rtype in (
                RegionType.STREET, RegionType.TOWN, RegionType.VILLAGE, RegionType.PLATFORM_L4
            ):
                if cur.district is None:
                    parent = get_region(region.parent_id)  # district
                    parent = get_region(parent.parent_id) if parent is not None else None  # city
                    if cur.city is not None and parent is not None and cur.city.id == parent.id:
                        most_priority = 5
                        acceptable = item
                        continue
                elif region.parent_id == cur.district.id:
                    most_priority = 5
                    acceptable = item
                    continue

        return acceptable

    def _update_current_division(self, region):
        # RegionInterpreterVisitor.java:423-471 (repeat check by region id —
        # Region.__eq__ is id equality, so this is the same predicate)
        if region is None:
            return
        cur = self.cur_division
        rid = region.id
        if (
            (cur.province is not None and cur.province.id == rid)
            or (cur.city is not None and cur.city.id == rid)
            or (cur.district is not None and cur.district.id == rid)
            or (cur.street is not None and cur.street.id == rid)
            # _town: street fallback subsumed by the street check above
            or (cur._town is not None and cur._town.id == rid)
            or (cur.village is not None and cur.village.id == rid)
        ):
            return
        get_region = self.regions.get
        t = region.type
        if t in (RegionType.PROVINCE, RegionType.PROVINCE_LEVEL_CITY1):
            cur.province = region
            cur.city = None
        elif t in (RegionType.CITY, RegionType.PROVINCE_LEVEL_CITY2):
            cur.city = region
            if cur.province is None:
                cur.province = get_region(region.parent_id)
        elif t == RegionType.CITY_LEVEL_DISTRICT:
            cur.city = region
            cur.district = region
            if cur.province is None:
                cur.province = get_region(region.parent_id)
        elif t == RegionType.DISTRICT:
            cur.district = region
            # a matched district forces its city (and province)
            cur.city = get_region(cur.district.parent_id)
            if cur.province is None and cur.city is not None:
                cur.province = get_region(cur.city.parent_id)
        elif t in (RegionType.STREET, RegionType.PLATFORM_L4):
            if cur.street is None:
                cur.street = region
            if cur.district is None:
                cur.district = get_region(region.parent_id)
        elif t == RegionType.TOWN:
            if cur.town is None:
                cur.town = region
            if cur.district is None:
                cur.district = get_region(region.parent_id)
        elif t == RegionType.VILLAGE:
            if cur.village is None:
                cur.village = region
            if cur.district is None:
                cur.district = get_region(region.parent_id)

    def _check_deep_most(self):
        if len(self.stack) > self.deep_most_level:
            self.deep_most_level = len(self.stack)
            self.deep_most_pos = self.current_pos
            self.deep_most_full_match_count = self.full_match_count
            self.deep_most_division.copy_from(self.cur_division)

    # -- results -----------------------------------------------------------

    def has_result(self) -> bool:
        return self.deep_most_pos > 0 and self.deep_most_division.district is not None

    def result_end_position(self) -> int:
        return self.deep_most_pos

    def result_match_count(self) -> int:
        return self.deep_most_level

    def result_full_match_count(self) -> int:
        return self.deep_most_full_match_count

    def result_division(self) -> Division:
        return self.deep_most_division

    def reset(self):
        self.scan_max_read = -1
        self.current_level = 0
        self.deep_most_level = 0
        self.current_pos = -1
        self.deep_most_pos = -1
        self.full_match_count = 0
        self.deep_most_full_match_count = 0
        self.deep_most_division.reset()
        self.cur_division.reset()
        self.stack.clear()
