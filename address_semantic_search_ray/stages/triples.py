"""Triple emission + per-conversation canonicalization (K3 + D4).

Triple spec shared with the single-process oracle — see
``pipelines/oracle.py`` docstring. The conv-level canonicalization is the
north rule's stable-ordering shuffle: ``groupby(conv_id)`` then an in-group
sort by (turn_idx, mention_idx, pred) before first-wins dedup on
(subj, pred, obj). Order is only guaranteed WITHIN a group (global
``preserve_order`` stays off so the streaming executor can pipeline).
"""

from __future__ import annotations

import pyarrow as pa

TRIPLE_SCHEMA = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("district_key", pa.string()),
    ("score", pa.float64()),
])

# located_at sorts before mentions, matching the oracle's per-mention emission
# order (located_at first) — only relevant for first-wins ties within one turn
_PRED_ORDER = {"located_at": 0, "mentions": 1}


def emit_turn_triples(batch: pa.Table) -> pa.Table:
    """link rows -> 2 triple rows per mention (+ mention_idx kept for ordering)."""
    cols = {n: [] for n in ("subj", "pred", "obj", "conv_id", "turn_idx",
                            "mention_idx", "district_key", "score")}

    def add(subj, pred, obj, conv, turn, mi, key, score):
        cols["subj"].append(subj)
        cols["pred"].append(pred)
        cols["obj"].append(obj)
        cols["conv_id"].append(conv)
        cols["turn_idx"].append(turn)
        cols["mention_idx"].append(mi)
        cols["district_key"].append(key)
        cols["score"].append(score)

    for conv, turn, mi, role, key, least, linked, score in zip(
        batch.column("conv_id").to_pylist(),
        batch.column("turn_idx").to_pylist(),
        batch.column("mention_idx").to_pylist(),
        batch.column("role").to_pylist(),
        batch.column("district_key").to_pylist(),
        batch.column("least_region_id").to_pylist(),
        batch.column("linked_addr").to_pylist(),
        batch.column("score").to_pylist(),
    ):
        add(f"conv:{conv}:{role}", "located_at", f"region:{least}", conv, turn, mi, key, score)
        obj = f"addr:{linked}" if linked >= 0 else "addr:none"
        add(f"conv:{conv}", "mentions", obj, conv, turn, mi, key, score)

    return pa.table({
        "subj": pa.array(cols["subj"], pa.string()),
        "pred": pa.array(cols["pred"], pa.string()),
        "obj": pa.array(cols["obj"], pa.string()),
        "conv_id": pa.array(cols["conv_id"], pa.string()),
        "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
        "mention_idx": pa.array(cols["mention_idx"], pa.int32()),
        "district_key": pa.array(cols["district_key"], pa.string()),
        "score": pa.array(cols["score"], pa.float64()),
    })


def canonicalize_conv_group(group: pa.Table) -> pa.Table:
    """Stable turn ordering + first-wins dedup on (subj, pred, obj)."""
    rows = sorted(
        zip(
            group.column("subj").to_pylist(),
            group.column("pred").to_pylist(),
            group.column("obj").to_pylist(),
            group.column("conv_id").to_pylist(),
            group.column("turn_idx").to_pylist(),
            group.column("mention_idx").to_pylist(),
            group.column("district_key").to_pylist(),
            group.column("score").to_pylist(),
        ),
        key=lambda r: (r[4], r[5], _PRED_ORDER.get(r[1], 9)),
    )
    seen = set()
    out = []
    for r in rows:
        k = (r[0], r[1], r[2])
        if k in seen:
            continue
        seen.add(k)
        out.append((r[0], r[1], r[2], r[3], r[4], r[6], r[7]))
    return pa.Table.from_arrays(
        [pa.array([r[i] for r in out], TRIPLE_SCHEMA.field(i).type) for i in range(7)],
        schema=TRIPLE_SCHEMA,
    )


def explode_part_of_edges(batch: pa.Table) -> pa.Table:
    """mention rows -> (subj, obj) hierarchy edges from region_chain (leaf->root)."""
    subjs, objs = [], []
    for chain in batch.column("region_chain").to_pylist():
        for child, parent in zip(chain, chain[1:]):
            subjs.append(f"region:{child}")
            objs.append(f"region:{parent}")
    return pa.table({
        "subj": pa.array(subjs, pa.string()),
        "obj": pa.array(objs, pa.string()),
    })


def part_of_group_first(group: pa.Table) -> pa.Table:
    """Dedup one (subj, obj) group into a single part_of triple row."""
    subj = group.column("subj")[0].as_py()
    obj = group.column("obj")[0].as_py()
    return pa.Table.from_arrays(
        [
            pa.array([subj], pa.string()),
            pa.array(["part_of"], pa.string()),
            pa.array([obj], pa.string()),
            pa.array([""], pa.string()),
            pa.array([-1], pa.int32()),
            pa.array([""], pa.string()),
            pa.array([1.0], pa.float64()),
        ],
        schema=TRIPLE_SCHEMA,
    )
