"""Region dictionary: tree + id lookup, built from an Arrow table.

Reference semantics:
- entity + alias ordering: ``persist/RegionEntity.java:37-177`` (names and aliases
  sorted longest-first so the trie prefers long forms, ``:124-159``);
- ``isTown`` quirk (a Street named xx镇/xx乡 *is* a town): ``RegionEntity.java:49-59``;
- tree assembly and the stop-descend rule: ``persist/AddressPersister.java:248-278``
  (children only below non-terminal levels).

This module is pure Python (no Ray). The whole dictionary is ~48k rows / a few
MB — it is broadcast to every interpreter actor, never shuffled.
"""

from __future__ import annotations

from .types import RegionType

_TERMINAL_TYPES = frozenset(
    {RegionType.STREET, RegionType.TOWN, RegionType.VILLAGE, RegionType.PLATFORM_L4}
)


class Region:
    __slots__ = ("id", "parent_id", "type", "name", "alias", "zip", "children",
                 "_ordered_names", "_is_town")

    def __init__(self, id, parent_id, type_, name, alias="", zip_=""):
        self.id = id
        self.parent_id = parent_id
        self.type = RegionType(type_)
        self.name = name
        self.alias = alias or ""
        self.zip = zip_ or ""
        self.children = None  # list[Region] | None
        self._ordered_names = None
        # is_town is a constant of (type, name) — precompute once
        # (RegionEntity.java:49-59)
        if self.type == RegionType.TOWN:
            self._is_town = True
        elif self.type == RegionType.STREET and name:
            self._is_town = len(name) <= 4 and name[-1] in ("镇", "乡")
        else:
            self._is_town = False

    def is_town(self) -> bool:
        return self._is_town

    def ordered_name_and_alias(self) -> list[str]:
        # RegionEntity.java:124-159 — name + ';'-split aliases, stable-sorted by
        # length descending (the Java bubble sort is a stable sort).
        if self._ordered_names is None:
            names = [self.name]
            if self.alias.strip():
                names.extend(t.strip() for t in self.alias.strip().split(";") if t.strip())
            names.sort(key=len, reverse=True)  # stable, like the reference bubble sort
            self._ordered_names = names
        return self._ordered_names

    def __repr__(self):
        return f"{{{self.id}-{self.name}}}"

    def __eq__(self, other):
        return isinstance(other, Region) and self.id == other.id

    def __hash__(self):
        return hash(self.id)


class RegionDict:
    """id -> Region map plus the assembled tree (root = country node)."""

    __slots__ = ("by_id", "root")

    def __init__(self, regions: list[Region], root_id: int = 1):
        self.by_id = {r.id: r for r in regions}
        self.root = self.by_id.get(root_id)
        children_of: dict[int, list[Region]] = {}
        for r in regions:
            children_of.setdefault(r.parent_id, []).append(r)
        for r in regions:
            # AddressPersister.loadRegionChildren stops descending below
            # street/town/village/platform-L4 (AddressPersister.java:263-278).
            if r.type in _TERMINAL_TYPES:
                continue
            kids = children_of.get(r.id)
            if kids:
                r.children = kids

    def get(self, region_id: int) -> Region | None:
        return self.by_id.get(region_id)

    @staticmethod
    def from_arrow(table) -> "RegionDict":
        """Build from a pyarrow table with columns id, parent_id, type, name, alias, zip."""
        cols = {name: table.column(name).to_pylist() for name in
                ("id", "parent_id", "type", "name", "alias", "zip")}
        regions = [
            Region(i, p, t, n, a, z)
            for i, p, t, n, a, z in zip(
                cols["id"], cols["parent_id"], cols["type"], cols["name"], cols["alias"], cols["zip"]
            )
        ]
        return RegionDict(regions)

    @staticmethod
    def from_parquet(path: str) -> "RegionDict":
        import pyarrow.parquet as pq

        return RegionDict.from_arrow(pq.read_table(path))
