"""Address interpreter chain: text -> structured Address.

Semantic port of ``interpret/AddressInterpreter.java`` (fixed chain order
``:256-293``): building-num -> special-chars -> brackets -> region ->
redundancy -> road -> unit-suffix scrub -> bracket re-append. Town/village
mining (``extractTownVillage``, ``:415-557``) is a separate pass, as in the
reference's ``misc/ExtractTown.java``.

Pure Python, no Ray: one ``Interpreter`` per actor/worker, driven from
``map_batches`` UDFs. All regexes are compiled at import time.
"""

from __future__ import annotations

import re

from .division import Division
from .regions import Region, RegionDict
from .stringutil import head, java_trim, sub_from, sub_incl, tail
from .trie import TermIndex
from .types import TermType
from .visitor import RegionVisitor

# -- patterns (AddressInterpreter.java:34-63) -------------------------------

_SPECIAL_CHARS1 = " \r\n\t,，。·.．;；:：、！@$%*^`~=+&'\"|_-\\/"
_SPECIAL_TRANS = {ord(c): None for c in _SPECIAL_CHARS1}
_DIGIT_RUN5 = re.compile(r"[0-9]{5,}")

BRACKET_PATTERN = re.compile(
    r"(?P<bracket>([\(（\{\<〈\[【「][^\)）\}\>〉\]】」]*[\)）\}\>〉\]】」]))"
)

P_BUILDING_NUM1 = re.compile(
    r"((路|街|巷)[0-9]+号)?([0-9A-Z一二三四五六七八九十]+(栋|橦|幢|座|号楼|号|\#楼?)){0,1}"
    r"([一二三四五六七八九十东西南北甲乙丙0-9]+(单元|门|梯|层|座))?([0-9]+(室|房)?)?"
)
P_BUILDING_NUM_V = re.compile(r"(栋|幢|橦|号楼|号|\#|\#楼|单元|室|房|门)+")
P_BUILDING_NUM2 = re.compile(r"[A-Za-z0-9]+([\#\-一－/\\]+[A-Za-z0-9]+)+")
P_BUILDING_NUM3 = re.compile(r"[0-9]+组[0-9\-一]+号?")

P_TOWN1 = re.compile(r"^((?P<z>[一-龥]{2,2}(镇|乡))(?P<c>[一-龥]{1,3}村)?)")
P_TOWN2 = re.compile(
    r"^((?P<z>[一-龥]{1,3}镇)?(?P<x>[一-龥]{1,3}乡)?"
    r"(?P<c>[一-龥]{1,3}村(?!(村|委|公路|(东|西|南|北)?(大街|大道|路|街))))?)"
)
P_TOWN3 = re.compile(r"^(?P<c>[一-龥]{1,3}村(?!(村|委|公路|(东|西|南|北)?(大街|大道|路|街))))?")
P_ROAD = re.compile(
    r"^(?P<road>([一-龥]{2,4}(路|街坊|街|道|大街|大道)))(?P<ex>[甲乙丙丁])?"
    r"(?P<roadnum>[0-9０１２３４５６７８９一二三四五六七八九十]+(号院|号楼|号大院|号|號|巷|弄|院|区|条|\#院|\#))?"
)

_UNIT_SUFFIX1 = re.compile(r"[0-9A-Za-z\#]+(单元|楼|室|层|米|户|\#)")
_UNIT_SUFFIX2 = re.compile(r"[一二三四五六七八九十]+(单元|楼|室|层|米|户)")

# blocklists (AddressInterpreter.java:66-170)
INVALID_TOWN_FOLLOWINGS = frozenset((
    "政府", "大街", "大道", "社区", "小区", "小学", "中学", "医院", "银行",
    "中心", "卫生", "一小", "一中", "政局", "企局",
))
INVALID_TOWN = frozenset((
    "新村", "外村", "大村", "后村", "东村", "南村", "北村", "西村", "上村", "下村",
    "一村", "二村", "三村", "四村", "五村", "六村", "七村", "八村", "九村", "十村",
    "中村", "街村", "头村", "店村", "桥村", "楼村", "老村", "户村", "山村", "才村",
    "子村", "旧村", "文村", "全村", "和村", "湖村", "甲村", "乙村", "丙村", "邻村",
    "乡村", "村二村", "中关村",
    "城乡", "县乡", "头乡", "牌乡", "茶乡", "水乡", "港乡", "巷乡", "七乡", "站乡",
    "西乡", "宝乡", "还乡",
    "古镇", "小镇", "街镇", "城镇", "环镇", "湾镇", "岗镇", "镇镇", "场镇", "新镇",
    "乡镇", "屯镇", "大镇", "南镇", "店镇", "铺镇", "关镇", "口镇", "和镇", "建镇",
    "集镇", "庙镇", "河镇", "村镇", "",
))


class Address(Division):
    """Interpreted address = Division slots + residual text + road/building fields.

    Mirrors ``persist/AddressEntity.java:34-258`` (setters trim; None -> "")."""

    __slots__ = ("id", "raw_text", "_text", "road", "road_num", "building_num")

    def __init__(self, text: str = "", id: int = 0):
        super().__init__()
        self.id = id
        self.raw_text = text
        self._text = java_trim(text) if text else ""
        self.road = ""
        self.road_num = ""
        self.building_num = ""

    @property
    def text(self) -> str:
        return self._text

    @text.setter
    def text(self, value):
        self._text = java_trim(value) if value else ""


class Interpreter:
    """Stateful interpreter: region dict + trie + a reusable visitor.

    Build once per worker (``__init__`` of the actor-pool UDF); ``interpret``
    is called per row with zero allocations beyond the Address itself."""

    def __init__(self, region_dict: RegionDict, ignore_list=None,
                 trie: TermIndex | None = None):
        self.regions = region_dict
        if trie is not None:
            self.trie = trie  # prebuilt (e.g. unpickled from a broadcast)
        elif ignore_list is None:
            self.trie = TermIndex(region_dict)
        else:
            self.trie = TermIndex(region_dict, ignore_list)
        self.visitor = RegionVisitor(region_dict)

    # -- full chain (AddressInterpreter.java:256-293) ----------------------

    def interpret(self, address_text: str, visitor: RegionVisitor | None = None,
                  region_hint: tuple | None = None) -> Address | None:
        """``region_hint`` (optional) reuses a deep-most scan already run on
        the RAW text (mentions.find_mentions): ``(province, city, district,
        street, town, village, end_rel, window)`` where ``window`` is the raw
        text over ``[0, scan_max_read]`` — every character the scan read. The
        hint is applied ONLY when the preprocessed text still starts with
        ``window`` (preprocessing only deletes characters, so an unchanged
        window means the re-scan would read identical characters, take
        identical bounds-check branches, and produce the identical division
        and end position); otherwise the full ``extract_region`` runs."""
        if address_text is None or len(java_trim(address_text)) <= 0:
            return None
        if visitor is None:
            visitor = self.visitor
        addr = Address(address_text)
        self.extract_building_num(addr)
        self.remove_special_chars(addr)
        brackets = self.extract_brackets(addr)
        hinted = False
        if region_hint is not None:
            prov, city, district, street, town_v, village, end_rel, window = region_hint
            t = addr.text
            if t.startswith(window):
                # identical assignment order/setters as extract_region
                addr.province = prov
                addr.city = city
                addr.district = district
                addr.street = street
                addr.town = town_v
                addr.village = village
                addr.text = sub_from(t, end_rel + 1)
                hinted = True
        if not hinted:
            self.extract_region(addr, visitor)
        self.remove_redundancy(addr, visitor)
        self.extract_road(addr)
        addr.text = _UNIT_SUFFIX1.sub("", addr.text)
        addr.text = _UNIT_SUFFIX2.sub("", addr.text)
        if brackets:
            addr.text = addr.text + brackets
        return addr

    # -- P4: region (AddressInterpreter.java:295-307) ----------------------

    def extract_region(self, addr: Address, visitor: RegionVisitor) -> bool:
        visitor.reset()
        self.trie.deep_most_query(addr.text, 0, visitor)
        div = visitor.result_division()
        addr.province = div.province
        addr.city = div.city
        addr.district = div.district
        addr.street = div.street
        addr.town = div.town
        addr.village = div.village
        addr.text = sub_from(addr.text, visitor.result_end_position() + 1)
        return visitor.has_result()

    # -- P2: special chars (AddressInterpreter.java:309-340) ---------------

    def remove_special_chars(self, addr: Address) -> bool:
        if len(addr.text) <= 0:
            return False
        text = addr.text.translate(_SPECIAL_TRANS)
        # delete runs of >=5 ASCII digits (phone numbers); the javadoc says 6+,
        # the code says >=5 — follow the code (AddressInterpreter.java:319)
        text = _DIGIT_RUN5.sub("", text)
        changed = len(text) != len(addr.text)
        addr.text = text
        return changed

    # -- P5: redundancy (AddressInterpreter.java:342-389) ------------------

    def remove_redundancy(self, addr: Address, visitor: RegionVisitor) -> bool:
        if len(addr.text) <= 0 or addr.province is None or addr.city is None:
            return False
        removed = False
        scan_if_hits = self.trie.scan_if_hits
        end_index = len(addr.text) - 2
        i = 0
        while i < end_index:
            # no-hit skip (min_depth=1): a position whose descent bears no
            # item would have scanned to match_count 0 — behavior-identical
            if not scan_if_hits(addr.text, i, visitor, 1):
                i += 1
                continue
            if visitor.result_match_count() < 2 and visitor.result_full_match_count() < 1:
                i += 1
                continue
            div = visitor.result_division()
            if (
                div.province is None or div.province.id != addr.province.id
                or div.city is None or div.city.id != addr.city.id
            ):
                i += 1
                continue

            # matched correctly — backfill missing lower levels
            if addr.district is None and div.district is not None \
                    and div.district.parent_id == addr.city.id:
                addr.district = div.district
            if addr.district is not None and addr.street is None and div.street is not None \
                    and div.street.parent_id == addr.district.id:
                addr.street = div.street
            if addr.district is not None and addr.town is None and div.town is not None \
                    and div.town.parent_id == addr.district.id:
                addr.town = div.town
            elif (
                addr.district is not None and addr.town is not None
                and addr.town == addr.street
                and div.town is not None
                and div.town != div.street
                and div.town.parent_id == addr.district.id
            ):
                addr.town = div.town
            if addr.district is not None and addr.village is None and div.village is not None \
                    and div.village.parent_id == addr.district.id:
                addr.village = div.village

            addr.text = sub_from(addr.text, visitor.result_end_position() + 1)
            end_index = len(addr.text)
            i = 0
            removed = True
        return removed

    # -- P3: brackets (AddressInterpreter.java:391-413) --------------------

    def extract_brackets(self, addr: Address) -> str | None:
        if len(addr.text) <= 0:
            return None
        found = False
        parts = []
        for m in BRACKET_PATTERN.finditer(addr.text):
            bracket = m.group("bracket")
            if len(bracket) <= 2:
                continue
            parts.append(sub_incl(bracket, 1, len(bracket) - 2))
            found = True
        if found:
            addr.text = BRACKET_PATTERN.sub("", addr.text)
            return "".join(parts)
        return None

    # -- P8: town/village mining (AddressInterpreter.java:415-557) ---------

    def extract_town_village_text(self, address_text: str, visitor: RegionVisitor, towns: dict):
        # ExtractTown pipeline entry (AddressInterpreter.java:415-423)
        if address_text is None or len(java_trim(address_text)) <= 0:
            return
        addr = Address(address_text)
        self.remove_special_chars(addr)
        self.extract_brackets(addr)
        self.extract_region(addr, visitor)
        self.remove_redundancy(addr, visitor)
        self.extract_town_village(addr, towns)

    def extract_town_village(self, addr: Address, towns: dict):
        # AddressInterpreter.java:424-430
        if self._extract_tv(addr, towns, P_TOWN1, "z", None, "c") >= 0:
            return
        if addr.town is not None:
            self._extract_tv(addr, towns, P_TOWN3, None, None, "c")
        else:
            self._extract_tv(addr, towns, P_TOWN2, "z", "x", "c")

    def _extract_tv(self, addr: Address, towns: dict, pattern, gz, gx, gc) -> int:
        # AddressInterpreter.java:438-502; returns 1 matched, -1 no match, 0 skipped
        if len(addr.text) <= 0 or addr.district is None:
            return 0
        result = -1
        m = pattern.search(addr.text)
        if m is not None:
            text = addr.text
            c = m.group(gc) if gc is not None else None
            ic = m.end(gc) if gc is not None else -1

            for g in (gz, gx):
                if g is None:
                    continue
                z = m.group(g)
                iz = m.end(g)
                if z:
                    if len(z) == 2 and text[len(z):].startswith("村"):
                        c = z + "村"
                        ic = iz + 1
                    elif self._is_acceptable_town_following(z, text, len(z)):
                        if self._accept_town(towns, z, addr.district, addr.raw_text, addr.text) >= 0:
                            addr.text = sub_from(text, iz)
                            result = 1

            if c:
                if c.endswith("农村"):
                    return result
                left = sub_from(text, ic)
                if c.endswith("村村"):
                    c = head(c, len(c) - 1)
                    left = "村" + left
                if left.startswith("委") or left.startswith("民委员"):
                    left = "村" + left
                if len(c) >= 4 and c[0] in "东西南北":
                    c = tail(c, len(c) - 1)
                if len(c) == 2 and not self._is_acceptable_town_following(c, left, 0):
                    return ic
                if self._accept_town(towns, c, addr.district, addr.raw_text, addr.text) >= 0:
                    addr.text = left
                    result = 1
        return result

    def _accept_town(self, all_towns: dict, town: str, district: Region, text1: str, text2: str) -> int:
        # AddressInterpreter.java:507-536; -1 invalid, 0 valid/no add, 1 added
        if all_towns is None or not town or district is None:
            return -1
        if town in INVALID_TOWN:
            return -1
        lst = all_towns.get(district.id)
        if lst is not None and town in lst:
            return 0
        # anti-join against the region trie: already a known region -> don't add
        items = self.trie.full_match(town)
        if items:
            for term_type, region, _is_full in items:
                if term_type not in (TermType.TOWN, TermType.STREET, TermType.VILLAGE):
                    continue
                if region is not None and region.parent_id == district.id:
                    return 0
        if len(town) == 4 and town[2] == "街":
            return -1
        if lst is None:
            lst = []
            all_towns[district.id] = lst
        lst.append(town)
        return 1

    @staticmethod
    def _is_acceptable_town_following(matched: str, text: str, start: int) -> bool:
        # AddressInterpreter.java:537-557
        if text is None or start >= len(text):
            return True
        if len(matched) == 4 and text[start] in "区县乡镇村街路":
            return False
        s1 = sub_incl(text, start, start + 1)
        if s1 in INVALID_TOWN_FOLLOWINGS:
            return False
        s1 = sub_incl(text, start, start + 2)
        if s1 in INVALID_TOWN_FOLLOWINGS:
            return False
        return True

    # -- P6: road (AddressInterpreter.java:559-578) ------------------------

    def extract_road(self, addr: Address) -> bool:
        if len(addr.text) <= 0:
            return False
        if len(addr.road) > 0:
            return True
        m = P_ROAD.search(addr.text)
        if m is not None:
            road = m.group("road")
            ex = m.group("ex")
            road_num = (ex or "") + (m.group("roadnum") or "")
            left = sub_from(addr.text, len(road) + len(road_num))
            if left.startswith("小区"):
                return False
            addr.road = road
            if len(road_num) == 1:
                # a bare 甲/乙/丙/丁 is not a road number — push back to text
                addr.text = road_num + left
            else:
                addr.road_num = road_num
                addr.text = left
            return True
        return False

    # -- P1: building number (AddressInterpreter.java:580-630) -------------

    def extract_building_num(self, addr: Address) -> bool:
        if len(addr.text) <= 0:
            return False
        found = False
        text = addr.text
        ngroups = P_BUILDING_NUM1.groups
        for m in P_BUILDING_NUM1.finditer(text):
            if m.end() == m.start():
                continue
            building = text[m.start():m.end()]
            # Java iterates groups 0..groupCount()-1 — i.e. INCLUDES group 0 and
            # EXCLUDES the last capture group (AddressInterpreter.java:592-595)
            non_empty = sum(1 for i in range(0, ngroups) if m.group(i) is not None)
            if P_BUILDING_NUM_V.search(building) is not None and non_empty > 3:
                pos = m.start()
                if building.startswith(("路", "街", "巷")):
                    pos += building.index("号") + 1
                    building = text[pos:m.end()]
                addr.building_num = building
                addr.text = head(text, pos)
                found = True
                break
        if not found:
            m = P_BUILDING_NUM2.search(text)
            if m is not None:
                addr.building_num = text[m.start():m.end()]
                addr.text = head(text, m.start())
                found = True
        if not found:
            m = P_BUILDING_NUM3.search(text)
            if m is not None:
                addr.building_num = text[m.start():m.end()]
                addr.text = head(text, m.start())
                found = True
        return found
