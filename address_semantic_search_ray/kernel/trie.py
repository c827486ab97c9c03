"""Region term index: a character trie with longest-match-first DFS.

Reference semantics:
- trie node / index item: ``index/TermIndexEntry.java:16-68``,
  ``index/TermIndexItem.java:10-37``;
- index construction incl. alias + auto-alias rules and the ignore list:
  ``index/TermIndexBuilder.java:19-105``;
- region-type -> term-type mapping: ``TermIndexBuilder.java:86-105``;
- ``deepMostQuery`` (recurse deeper before visiting the item at the current
  position; on acceptance start a new round after the accepted item) and
  ``fullMatch``: ``TermIndexBuilder.java:107-144``;
- visitor contract: ``index/TermIndexVisitor.java:48-76``.

Built once per interpreter actor (in ``__init__``) from the broadcast region
dictionary; traversal is pure CPU inside the batch UDF.
"""

from __future__ import annotations

from .regions import Region, RegionDict
from .types import RegionType, TermType


class TrieNode:
    """Trie node; ``key_len`` is the depth (== length of the matched prefix) —
    the reference stores the prefix string (TermIndexEntry.java:16-68) but only
    its length is load-bearing (full-match + position restore)."""

    __slots__ = ("key_len", "items", "children")

    def __init__(self, key_len: int = 0):
        self.key_len = key_len
        self.items: list[tuple[str, Region | None]] | None = None  # (term_type, region)
        self.children: dict[str, TrieNode] | None = None


def _convert_region_type(region: Region) -> str:
    # TermIndexBuilder.java:86-105
    t = region.type
    if t in (RegionType.PROVINCE, RegionType.PROVINCE_LEVEL_CITY1):
        return TermType.PROVINCE
    if t in (RegionType.CITY, RegionType.PROVINCE_LEVEL_CITY2):
        return TermType.CITY
    if t in (RegionType.DISTRICT, RegionType.CITY_LEVEL_DISTRICT):
        return TermType.DISTRICT
    if t == RegionType.PLATFORM_L4:
        return TermType.STREET
    if t == RegionType.TOWN:
        return TermType.TOWN
    if t == RegionType.VILLAGE:
        return TermType.VILLAGE
    if t == RegionType.STREET:
        return TermType.TOWN if region.is_town() else TermType.STREET
    return TermType.UNDEFINED


# 18 ignored phrases from the reference's spring-config.xml termIndex bean.
DEFAULT_IGNORE_LIST = (
    "其它区", "其他地区", "其它地区", "全境", "城区", "城区以内", "城区以外",
    "郊区", "县城内", "内环以内", "开发区", "经济开发区", "经济技术开发区",
    "省直辖", "省直辖市县", "地区", "市区",
)


class TermIndex:
    """Character trie over every region name + alias (+ auto-aliases + ignore list)."""

    __slots__ = ("root",)

    def __init__(self, region_dict: RegionDict, ignore_list=DEFAULT_IGNORE_LIST):
        self.root = TrieNode()
        if region_dict.root is not None and region_dict.root.children:
            self._index_regions(region_dict.root.children)
        for phrase in ignore_list or ():
            self._build_index(phrase, (TermType.IGNORE, None))

    # -- construction ------------------------------------------------------

    def _build_index(self, name: str, item: tuple[str, Region | None]):
        node = self.root
        depth = 0
        for ch in name:
            depth += 1
            children = node.children
            if children is None:
                children = node.children = {}
            child = children.get(ch)
            if child is None:
                child = children[ch] = TrieNode(depth)
            node = child
        if node.items is None:
            node.items = []
        node.items.append(item)

    def _index_regions(self, regions: list[Region]):
        # TermIndexBuilder.java:33-74
        for region in regions:
            item = (_convert_region_type(region), region)
            for name in region.ordered_name_and_alias():
                self._build_index(name, item)

            # auto-aliases: xx街道 -> xx / xx镇 / xx乡; xx镇 -> xx乡; xx乡 -> xx镇
            name = region.name
            auto_alias = (
                len(name) <= 5
                and not region.alias
                and (region.is_town() or name.endswith("街道"))
            )
            if auto_alias and len(name) == 5 and name[2] in "路街门镇村区":
                auto_alias = False
            if auto_alias:
                short = name[:-1] if region.is_town() else name[:-2]
                if len(short) >= 2:
                    self._build_index(short, item)
                if name.endswith("街道") or name.endswith("镇"):
                    self._build_index(short + "乡", item)
                if name.endswith("街道") or name.endswith("乡"):
                    self._build_index(short + "镇", item)

            if region.children:
                self._index_regions(region.children)

    # -- search ------------------------------------------------------------

    def deep_most_query(self, text: str, pos: int, visitor) -> None:
        """Longest-match-first DFS from ``pos`` (TermIndexBuilder.java:107-131)."""
        if not text:
            return
        visitor.start_round()
        self._deep_first_round(text, pos, self.root.children, visitor)
        visitor.end_round()

    def _deep_first_round(self, text: str, pos: int, children, visitor) -> None:
        if children is None or pos >= len(text):
            return
        entry = children.get(text[pos])
        if entry is None:
            return
        if entry.children is not None and pos + 1 <= len(text) - 1:
            self._deep_first_round(text, pos + 1, entry.children, visitor)
        if entry.items:
            if visitor.visit(entry, text, pos):
                pos = visitor.position_after_accept_item()
                if pos + 1 <= len(text) - 1:
                    self.deep_most_query(text, pos + 1, visitor)
                visitor.end_visit(entry, text, pos)

    def full_match(self, text: str):
        """Exact whole-string lookup (TermIndexBuilder.java:133-144)."""
        if not text:
            return None
        node = self.root
        for ch in text:
            if node.children is None:
                return None
            node = node.children.get(ch)
            if node is None:
                return None
        return node.items
