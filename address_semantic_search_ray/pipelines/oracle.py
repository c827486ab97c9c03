"""Single-process oracle for the KG-construction pipeline.

Runs the exact lifecycle the Ray pipeline distributes — E2 corpus build
(interpret + per-district doc vectors + IDF), E1' mention scan, E3 top-1
linking, triple emission with per-conv canonicalization — sequentially with
plain dicts. The Ray pipeline must reproduce these triples exactly (P/R >= 0.95
binding target; in practice 1.0 because both share the kernel — the comparison
isolates orchestration bugs: partitioning, shuffle, ordering, dedup).

Triple schema (FIXTURES.md F6):
``(subj, pred, obj, conv_id, turn_idx, district_key, score)`` with
``pred in {mentions, located_at, part_of}``:
- ``(conv:{c}:{role}, located_at, region:{least_region_id})`` per mention;
- ``(conv:{c}, mentions, addr:{linked_addr_id|none})`` per mention, score =
  top-1 similarity against the historical corpus of the mention's district;
- ``(region:{child}, part_of, region:{parent})`` for every hierarchy edge of a
  mentioned division (global facts: conv_id="", turn_idx=-1, district_key="").
Canonicalization: within each conversation, triples are deduped on
(subj, pred, obj) keeping the EARLIEST turn (stable turn ordering is
load-bearing — a mis-ordered pipeline keeps a different turn_idx).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..kernel.document import analyse, term_idf_key
from ..kernel.interpreter import Interpreter
from ..kernel.mentions import district_key, find_mentions
from ..kernel.regions import RegionDict
from ..kernel.similarity import compute_idf, find_similar, stat_inverse_doc_refers

TRIPLE_SCHEMA = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("district_key", pa.string()),
    ("score", pa.float64()),
])


def default_region_dict_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "data", "region_dict.parquet")


def build_corpus_index(addresses: pa.Table, interpreter: Interpreter):
    """E2: interpret the historical corpus, partition by district_key, build
    doc vectors + IDF per partition. Returns {key: (docs, idf_map)}."""
    texts = addresses.column("text").to_pylist()
    ids = addresses.column("addr_id").to_pylist()
    parts: dict[str, list] = {}
    from ..stages.interpret import apply_import_caps

    for addr_id, text in zip(ids, texts):
        a = interpreter.interpret(text)
        if a is None or a.city is None or a.district is None:
            continue
        a.id = addr_id
        apply_import_caps(a)  # S5 persist caps (AddressPersister.java:106-115)
        parts.setdefault(district_key(a), []).append(a)
    index = {}
    for key, addrs in parts.items():
        docs = [analyse(a) for a in addrs]
        idf = compute_idf(len(docs), stat_inverse_doc_refers(docs))
        for d in docs:
            for t in d.terms:
                t.idf = idf.get(term_idf_key(t), 0.0)
        index[key] = (docs, idf)
    return index


def division_part_of_edges(addr) -> list[tuple[str, str]]:
    """Hierarchy edges (child, parent) for the interpreted division."""
    chain = [addr.village, addr.town, addr.street, addr.district, addr.city, addr.province]
    chain = [r for r in chain if r is not None]
    # collapse identical adjacent nodes (district==city for city-level districts)
    edges = []
    uniq = []
    for r in chain:
        if not uniq or uniq[-1].id != r.id:
            uniq.append(r)
    for child, parent in zip(uniq, uniq[1:]):
        edges.append((f"region:{child.id}", f"region:{parent.id}"))
    return edges


def triples_for_turn(conv_id: str, turn_idx: int, role: str, text: str,
                     interpreter: Interpreter, corpus_index, top_n: int = 1):
    """Shared per-turn triple emission (used by oracle AND Ray stages)."""
    rows = []
    part_of = set()
    for m in find_mentions(text, interpreter):
        a = m.addr
        key = district_key(a)
        entry = corpus_index.get(key) if corpus_index else None
        if entry is not None:
            docs, idf = entry
            q = analyse(a, idf_lookup=idf, doc_id=-1)
            top = find_similar(q, docs, top_n=top_n)
        else:
            top = []
        if top:
            obj = f"addr:{top[0][0]}"
            score = top[0][1]
        else:
            obj = "addr:none"
            score = 0.0
        least = a.least_region()
        rows.append((f"conv:{conv_id}:{role}", "located_at", f"region:{least.id}",
                     conv_id, turn_idx, key, score))
        rows.append((f"conv:{conv_id}", "mentions", obj, conv_id, turn_idx, key, score))
        part_of.update(division_part_of_edges(a))
    return rows, part_of


def canonicalize_conv(rows: list[tuple]) -> list[tuple]:
    """Within one conversation: sort by turn_idx (stable), dedup on
    (subj,pred,obj) keeping the earliest turn."""
    rows = sorted(rows, key=lambda r: (r[4],))
    seen = set()
    out = []
    for r in rows:
        k = (r[0], r[1], r[2])
        if k in seen:
            continue
        seen.add(k)
        out.append(r)
    return out


def run_oracle(data_dir: str, region_dict_path: str | None = None, top_n: int = 1) -> pa.Table:
    """Full single-process pipeline: returns the triples table."""
    rd = RegionDict.from_parquet(region_dict_path or default_region_dict_path())
    interpreter = Interpreter(rd)

    addresses = pq.read_table(os.path.join(data_dir, "addresses.parquet"))
    corpus_index = build_corpus_index(addresses, interpreter)

    transcripts = pq.read_table(
        os.path.join(data_dir, "transcripts.parquet"),
        columns=["conv_id", "turn_idx", "role", "text"],
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])

    by_conv: dict[str, list] = {}
    part_of = set()
    for conv_id, turn_idx, role, text in zip(
        transcripts.column("conv_id").to_pylist(),
        transcripts.column("turn_idx").to_pylist(),
        transcripts.column("role").to_pylist(),
        transcripts.column("text").to_pylist(),
    ):
        rows, po = triples_for_turn(conv_id, turn_idx, role, text, interpreter, corpus_index, top_n)
        if rows:
            by_conv.setdefault(conv_id, []).extend(rows)
        part_of.update(po)

    out = []
    for conv_id in sorted(by_conv):
        out.extend(canonicalize_conv(by_conv[conv_id]))
    for child, parent in sorted(part_of):
        out.append((child, "part_of", parent, "", -1, "", 1.0))

    return pa.Table.from_arrays(
        [pa.array([r[i] for r in out], TRIPLE_SCHEMA.field(i).type) for i in range(7)],
        schema=TRIPLE_SCHEMA,
    )
