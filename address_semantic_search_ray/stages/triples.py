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
    """Stable turn ordering + first-wins dedup on (subj, pred, obj), per conv.

    The group is a conv BUCKET (crc32(conv_id) % B), not a single conv —
    thousands of per-conv group calls cost more in per-group overhead than
    the work itself; inside the bucket the dedup is vectorized pandas with
    conv_id leading the sort key, so per-conv semantics are unchanged."""
    import pandas as pd  # noqa: F401

    df = group.to_pandas()
    df["_pred_order"] = df["pred"].map(_PRED_ORDER).fillna(9).astype("int64")
    df = df.sort_values(["conv_id", "turn_idx", "mention_idx", "_pred_order"],
                        kind="stable")
    df = df.drop_duplicates(["conv_id", "subj", "pred", "obj"], keep="first")
    df = df[["subj", "pred", "obj", "conv_id", "turn_idx", "district_key", "score"]]
    return pa.Table.from_pandas(df, schema=TRIPLE_SCHEMA,
                                preserve_index=False).replace_schema_metadata(None)


def add_conv_bucket(batch: pa.Table, n_buckets: int = 256) -> pa.Table:
    import zlib

    buckets = [zlib.crc32(c.encode()) % n_buckets
               for c in batch.column("conv_id").to_pylist()]
    return batch.append_column("conv_bucket", pa.array(buckets, pa.int32()))


def explode_part_of_edges(batch: pa.Table, n_buckets: int = 64) -> pa.Table:
    """mention rows -> (subj, obj) hierarchy edges from region_chain, with a
    pre-dedup INSIDE the batch (edges repeat massively) + an edge bucket so
    the global distinct is a small grouped dedup, not one group per edge."""
    import zlib

    edges = set()
    for chain in batch.column("region_chain").to_pylist():
        for child, parent in zip(chain, chain[1:]):
            edges.add((f"region:{child}", f"region:{parent}"))
    subjs, objs, buckets = [], [], []
    for s, o in edges:
        subjs.append(s)
        objs.append(o)
        buckets.append(zlib.crc32((s + o).encode()) % n_buckets)
    return pa.table({
        "subj": pa.array(subjs, pa.string()),
        "obj": pa.array(objs, pa.string()),
        "edge_bucket": pa.array(buckets, pa.int32()),
    })


def part_of_bucket_dedup(group: pa.Table) -> pa.Table:
    """Distinct (subj, obj) within one edge bucket -> part_of triple rows."""
    df = group.to_pandas().drop_duplicates(["subj", "obj"]).sort_values(["subj", "obj"])
    n = len(df)
    return pa.Table.from_arrays(
        [
            pa.array(df["subj"].tolist(), pa.string()),
            pa.array(["part_of"] * n, pa.string()),
            pa.array(df["obj"].tolist(), pa.string()),
            pa.array([""] * n, pa.string()),
            pa.array([-1] * n, pa.int32()),
            pa.array([""] * n, pa.string()),
            pa.array([1.0] * n, pa.float64()),
        ],
        schema=TRIPLE_SCHEMA,
    )
