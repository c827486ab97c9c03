"""6-slot matched-region struct (province/city/district/street/town/village).

Ported semantics from ``Division.java:5-193``:
- ``least_region`` = finest non-null slot (``:35-42``);
- ``get_town`` falls back to the street when the street *is* a town
  (``:107-111``, via ``RegionEntity.isTown`` at ``RegionEntity.java:49-59``);
- ``set_town`` routes Street/PlatformL4 values into the street slot (``:117-133``).
"""

from __future__ import annotations

from .regions import Region
from .types import RegionType


class Division:
    __slots__ = ("province", "city", "district", "street", "_town", "village")

    def __init__(self):
        self.province = None
        self.city = None
        self.district = None
        self.street = None
        self._town = None
        self.village = None

    # town has coupled get/set semantics
    @property
    def town(self) -> Region | None:
        if self._town is not None:
            return self._town
        s = self.street
        if s is None:
            return None
        return s if s._is_town else None

    @town.setter
    def town(self, value: Region | None):
        if value is None:
            self._town = None
            return
        if value.type == RegionType.TOWN:
            self._town = value
        elif value.type in (RegionType.STREET, RegionType.PLATFORM_L4):
            self.street = value
        else:
            self._town = None

    def least_region(self) -> Region | None:
        # Division.java:35-42. Reads _town directly: when _town is None the
        # town property can only return self.street (is_town fallback), and
        # street is the very next slot checked — same object either way.
        r = self.village
        if r is not None:
            return r
        r = self._town
        if r is not None:
            return r
        r = self.street
        if r is not None:
            return r
        r = self.district
        if r is not None:
            return r
        r = self.city
        if r is not None:
            return r
        return self.province

    def copy_from(self, other: "Division"):
        self.province = other.province
        self.city = other.city
        self.district = other.district
        self.street = other.street
        self._town = other._town
        self.village = other.village

    def reset(self):
        self.province = self.city = self.district = self.street = None
        self._town = self.village = None

    def __repr__(self):
        parts = []
        for slot in ("province", "city", "district", "street", "town", "village"):
            r = getattr(self, slot)
            if r is not None:
                parts.append(f"{r.id}{r.name}")
        return "{" + "-".join(parts) + "}"
