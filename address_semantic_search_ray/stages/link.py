"""Entity-linking stage: score mentions against their district's doc vectors.

Co-partitioned by ``district_key`` via ``groupby().map_groups`` — the same
sharding the reference uses for its ``.vt`` files (one per district,
``SimilarityComputer.java:619-631``). Each group task reads ONLY its
district's hive partitions of the doc-vector and idf checkpoints (partition
pruning at the read), rebuilds the Doc objects, and runs the §2.9 kernel.

Skew: a ``salt`` column (hash(conv_id) % S) can split a hot district across S
group tasks; the corpus side is re-read per salted task (doc vectors are the
small side of this join) and output is salt-invariant.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..kernel.document import doc_from_fields, term_idf_key
from ..kernel.similarity import find_similar

LINK_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("mention_idx", pa.int32()),
    ("role", pa.string()),
    ("district_key", pa.string()),
    ("least_region_id", pa.int64()),
    ("linked_addr", pa.int64()),  # -1 when unlinked
    ("score", pa.float64()),
])


def load_district_index(doc_dir: str, idf_dir: str, key: str):
    """Read one district's doc vectors + idf from hive-partitioned checkpoints."""
    part = f"district_key={key}"
    doc_files = glob.glob(os.path.join(doc_dir, part, "*.parquet"))
    if not doc_files:
        return [], {}
    docs_tbl = pa.concat_tables([pq.read_table(f) for f in doc_files])
    idf_files = glob.glob(os.path.join(idf_dir, part, "*.parquet"))
    idf = {}
    for f in idf_files:
        t = pq.read_table(f, columns=["term_key", "idf"])
        idf.update(zip(t.column("term_key").to_pylist(), t.column("idf").to_pylist()))
    docs = []
    for addr_id, town, village, road, road_num, residual in zip(
        docs_tbl.column("addr_id").to_pylist(),
        docs_tbl.column("town").to_pylist(),
        docs_tbl.column("village").to_pylist(),
        docs_tbl.column("road").to_pylist(),
        docs_tbl.column("road_num").to_pylist(),
        docs_tbl.column("residual").to_pylist(),
    ):
        d = doc_from_fields(addr_id, town, village, road, road_num, residual)
        for t in d.terms:
            t.idf = idf.get(term_idf_key(t), 0.0)
        docs.append(d)
    return docs, idf


def make_link_group_fn(doc_dir: str, idf_dir: str, top_n: int = 1):
    """Returns the per-group UDF for groupby("district_key"[, "salt"]).map_groups."""

    def link_group(group: pa.Table) -> pa.Table:
        key = group.column("district_key")[0].as_py()
        docs, idf = load_district_index(doc_dir, idf_dir, key)
        out = {name: [] for name in LINK_SCHEMA.names}
        for conv_id, turn_idx, mention_idx, role, town, village, road, road_num, residual, least in zip(
            group.column("conv_id").to_pylist(),
            group.column("turn_idx").to_pylist(),
            group.column("mention_idx").to_pylist(),
            group.column("role").to_pylist(),
            group.column("town").to_pylist(),
            group.column("village").to_pylist(),
            group.column("road").to_pylist(),
            group.column("road_num").to_pylist(),
            group.column("residual").to_pylist(),
            group.column("least_region_id").to_pylist(),
        ):
            if docs:
                q = doc_from_fields(-1, town, village, road, road_num, residual, idf_lookup=idf)
                top = find_similar(q, docs, top_n=top_n)
            else:
                top = []
            linked, score = (top[0][0], top[0][1]) if top else (-1, 0.0)
            out["conv_id"].append(conv_id)
            out["turn_idx"].append(turn_idx)
            out["mention_idx"].append(mention_idx)
            out["role"].append(role)
            out["district_key"].append(key)
            out["least_region_id"].append(least)
            out["linked_addr"].append(linked)
            out["score"].append(score)
        return pa.Table.from_arrays(
            [pa.array(out[f.name], f.type) for f in LINK_SCHEMA], schema=LINK_SCHEMA
        )

    return link_group
