"""Extract the administrative-region dictionary into Parquet.

The reference ships the region dictionary as MySQL seed data
(``/root/reference/src/main/resources/conf/script/db-init-data.sql``, one
INSERT with ~47.7k value tuples for table ``bas_region``). This is public
factual data (Chinese administrative divisions); we parse the tuples and write
``address_semantic_search_ray/data/region_dict.parquet`` with columns
``id, parent_id, type, name, alias, zip`` (schema per
``db-schema.sql:54-65`` / ``persist/RegionEntity.java:37-59``).

Run once: ``python tools/extract_region_dict.py``
"""

from __future__ import annotations

import re
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/reference/src/main/resources/conf/script/db-init-data.sql")
DST = Path(__file__).resolve().parent.parent / "address_semantic_search_ray" / "data" / "region_dict.parquet"

# (id, parent_id, type, 'name', 'alias', 'zip', 'source', 'created')
TUPLE_RE = re.compile(
    r"\((\d+),(\d+),(\d+),'((?:[^'\\]|\\.)*)','((?:[^'\\]|\\.)*)','((?:[^'\\]|\\.)*)','[^']*','[^']*'\)"
)


def main():
    sql = SRC.read_text(encoding="utf-8")
    rows = TUPLE_RE.findall(sql)
    if not rows:
        raise SystemExit("no region tuples parsed")
    ids, parents, types, names, aliases, zips = [], [], [], [], [], []
    for rid, pid, typ, name, alias, zip_ in rows:
        ids.append(int(rid))
        parents.append(int(pid))
        types.append(int(typ))
        names.append(name.replace("\\'", "'"))
        aliases.append(alias.replace("\\'", "'"))
        zips.append(zip_)
    table = pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "parent_id": pa.array(parents, pa.int64()),
            "type": pa.array(types, pa.int32()),
            "name": pa.array(names, pa.string()),
            "alias": pa.array(aliases, pa.string()),
            "zip": pa.array(zips, pa.string()),
        }
    )
    DST.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, DST, compression="zstd")
    print(f"wrote {table.num_rows} regions -> {DST}")


if __name__ == "__main__":
    main()
