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

Storage is FLAT (one int-keyed children dict + arrays), not a node-object
graph: one trie instance lives in every interpreter actor, and ~200k node
objects each holding a child dict both thrash the shared LLC under a 28-actor
pool and slow every GC pass. Node ids index ``key_len``; items live in a
side dict for the ~130k terminal nodes. A child edge key packs
``(node_id << 21) | ord(char)`` into one small int (no tuple allocation per
probe).
"""

from __future__ import annotations

from array import array

from .regions import Region, RegionDict
from .types import RegionType, TermType

_CH_BITS = 21  # ord(char) < 0x110000 fits in 21 bits


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

    __slots__ = ("children", "key_len", "items", "_n_nodes", "first_chars",
                 "node_items")

    def __init__(self, region_dict: RegionDict, ignore_list=DEFAULT_IGNORE_LIST):
        self.children: dict[int, int] = {}  # (node<<21)|ord(ch) -> child node id
        self.key_len = array("i", [0])  # node id -> depth (root = 0)
        self.items: dict[int, list] = {}  # node id -> [(term_type, region), ...]
        self._n_nodes = 1
        if region_dict.root is not None and region_dict.root.children:
            self._index_regions(region_dict.root.children)
        for phrase in ignore_list or ():
            self._build_index(phrase, (TermType.IGNORE, None))
        # first-char filter for mention scanning (root's child edges)
        self.first_chars = frozenset(
            chr(k & ((1 << _CH_BITS) - 1)) for k in self.children if (k >> _CH_BITS) == 0
        )
        # flat node-id -> items view (O(1) list index beats a dict probe in
        # the scan's unwind; ~1 in 2 nodes is terminal so the density is fine)
        self.node_items: list = [None] * self._n_nodes
        for nid, its in self.items.items():
            self.node_items[nid] = its

    # -- construction ------------------------------------------------------

    def _build_index(self, name: str, item):
        children = self.children
        key_len = self.key_len
        node = 0
        depth = 0
        for ch in name:
            depth += 1
            k = (node << _CH_BITS) | ord(ch)
            child = children.get(k)
            if child is None:
                child = self._n_nodes
                self._n_nodes += 1
                children[k] = child
                key_len.append(depth)
            node = child
        # full-match-ness is a build-time constant of (indexed name, region)
        # (RegionInterpreterVisitor.isFullMatch, java:391-399): exact length,
        # or an xx街道 region matched via its 2-char-shorter alias
        term_type, region = item
        if region is None:
            is_full = False
        else:
            is_full = len(name) == len(region.name) or (
                region.type == RegionType.STREET
                and region.name.endswith("街道")
                and len(region.name) == len(name) + 1
            )
        self.items.setdefault(node, []).append((term_type, region, is_full))

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
        """Longest-match-first DFS from ``pos`` (TermIndexBuilder.java:107-131).

        Iterative: one greedy descent collects the terminal nodes on the path,
        then they are visited deepest-first — identical order to the
        reference's recursion (recurse deeper BEFORE visiting the current
        node) without a Python frame per character."""
        if not text:
            return
        visitor.start_round()
        children = self.children
        node_items = self.node_items
        n = len(text)
        # greedy descent from the root at ``pos``; remember item-bearing nodes
        hits = None
        node = 0
        p = pos
        while p < n:
            node = children.get((node << _CH_BITS) | ord(text[p]))
            if node is None:
                break
            items = node_items[node]
            if items is not None:
                if hits is None:
                    hits = [(items, node, p)]
                else:
                    hits.append((items, node, p))
            p += 1
        # read-frontier for region-hint reuse: the descent read text[p]
        # (the char with no child edge), or up to n-1 if it ran off the end
        mr = p if p < n else n - 1
        if mr > visitor.scan_max_read:
            visitor.scan_max_read = mr
        if hits is not None:
            key_len = self.key_len
            last = n - 1
            for hi in range(len(hits) - 1, -1, -1):
                items, entry, epos = hits[hi]
                if visitor.visit(items, key_len[entry], text, epos):
                    npos = visitor.position_after_accept_item()
                    if npos < last:
                        self.deep_most_query(text, npos + 1, visitor)
                    visitor.end_visit(key_len[entry], text, npos)
        visitor.end_round()

    def scan_if_hits(self, text: str, pos: int, visitor, min_depth: int = 1) -> bool:
        """Fused gate + deep-most scan: descend once from ``pos``; if the
        path reaches ``min_depth`` and holds at least one item-bearing node,
        reset the visitor and run the standard deepest-first rounds over the
        collected hits (identical to ``visitor.reset()`` +
        ``deep_most_query``), returning True. Otherwise return False WITHOUT
        touching the visitor — for a caller that would only have found
        ``has_result() == False`` / ``result_match_count() == 0``, skipping
        the reset + round machinery is behavior-identical and much cheaper
        (most scan positions in free text match nothing).

        ``min_depth=2`` replicates the ``has_prefix2`` precondition used by
        mention scanning (depth-1 items are visited only when a 2-char
        descent exists, as before); ``min_depth=1`` is a pure no-hit skip."""
        children = self.children
        node_items = self.node_items
        n = len(text)
        hits = None
        node = 0
        p = pos
        while p < n:
            node = children.get((node << _CH_BITS) | ord(text[p]))
            if node is None:
                break
            items = node_items[node]
            if items is not None:
                if hits is None:
                    hits = [(items, node, p)]
                else:
                    hits.append((items, node, p))
            p += 1
        if hits is None or p - pos < min_depth:
            return False
        visitor.reset()
        visitor.start_round()
        mr = p if p < n else n - 1
        if mr > visitor.scan_max_read:
            visitor.scan_max_read = mr
        key_len = self.key_len
        last = n - 1
        for hi in range(len(hits) - 1, -1, -1):
            items, entry, epos = hits[hi]
            if visitor.visit(items, key_len[entry], text, epos):
                npos = visitor.position_after_accept_item()
                if npos < last:
                    self.deep_most_query(text, npos + 1, visitor)
                visitor.end_visit(key_len[entry], text, npos)
        visitor.end_round()
        return True

    def has_prefix2(self, text: str, pos: int) -> bool:
        """Cheap guard for mention scanning: does any indexed name start with
        text[pos:pos+2]? (All region names are >= 2 chars, so a position that
        fails this cannot begin a match — skip the visitor machinery.)"""
        children = self.children
        node = children.get(ord(text[pos]))
        if node is None:
            return False
        if pos + 1 >= len(text):
            return False
        return ((node << _CH_BITS) | ord(text[pos + 1])) in children

    def full_match(self, text: str):
        """Exact whole-string lookup (TermIndexBuilder.java:133-144)."""
        if not text:
            return None
        children = self.children
        node = 0
        for ch in text:
            node = children.get((node << _CH_BITS) | ord(ch))
            if node is None:
                return None
        return self.items.get(node)
