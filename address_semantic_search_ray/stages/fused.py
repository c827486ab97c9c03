"""Fused mention-detection + linking stage (broadcast-index mode).

When the historical corpus index fits in the object store — and against a
10^12-turn transcript table the corpus IS the small side — the idiomatic Ray
Data shape is a broadcast map-side join: the flat numpy similarity index
(kernel/npindex.py) is ``ray.put`` ONCE; each actor's ``ray.get`` maps the
same plasma buffers read-only (zero-copy, O(1) index memory per node
regardless of actor count), and mention detection + top-1 linking happen in
one pass over the transcript stream with NO shuffle at all (no sort, no
co-partition).

The checkpointed pipeline (pipelines/kg.py, bucketed partitions + sorted
actor pool) is the path for when the corpus outgrows worker memory; both
modes produce byte-identical triples (the numpy scorer is bit-equal to the
sequential kernel — tests/test_npindex.py).
"""

from __future__ import annotations

import pyarrow as pa

from ..kernel.mentions import district_key, find_mentions
from ..kernel.npindex import NpCorpusIndex, ShardedNpIndex
from .interpret import _RegionStateMixin, _region_ids


def resolve_index(index_ref):
    """Accepts a single-payload ObjectRef, a raw payload dict
    (tests/microbench), or a sharded {bucket: payload ObjectRef} map; the
    ``ray.get`` of each payload maps plasma buffers zero-copy per node."""
    if isinstance(index_ref, dict):
        if "district_keys" in index_ref:  # raw payload
            return NpCorpusIndex.from_payload(index_ref)
        import ray

        buckets = sorted(index_ref)
        payloads = ray.get([index_ref[b] for b in buckets])
        return ShardedNpIndex.from_payloads(dict(zip(buckets, payloads)))
    import ray

    return NpCorpusIndex.from_payload(ray.get(index_ref))

FUSED_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("mention_idx", pa.int32()),
    ("role", pa.string()),
    ("district_key", pa.string()),
    ("least_region_id", pa.int64()),
    ("linked_addr", pa.int64()),
    ("score", pa.float64()),
    ("region_chain", pa.list_(pa.int64())),
])


def put_np_index(docs_tbl: pa.Table, idf_tbl: pa.Table):
    """Driver-side: build the flat numpy corpus index once and put it in the
    object store. Every actor's ``ray.get`` maps the SAME plasma buffers
    read-only (zero-copy) — per-node index memory is O(1) in actor count,
    which is the round-2 fix for the measured 28-replicas memory-bus
    saturation (BASELINE.md round-1 scaling analysis)."""
    import ray

    return ray.put(NpCorpusIndex.from_tables(docs_tbl, idf_tbl).to_payload())


class MentionLinkStage(_RegionStateMixin):
    """transcripts -> link rows (+ region_chain) in one actor-pool pass."""

    def __init__(self, region_ref, index_ref, top_n: int = 1, memo: bool = True):
        self._init_interpreter(region_ref)
        self.np_index = resolve_index(index_ref)
        self.top_n = top_n
        self.memo = memo
        self._results: dict[tuple, tuple] = {}
        self._turn_results: dict[str, list] = {}
        # vectorized turn prefilter: a turn with NO trie root-edge char can't
        # contain a mention (the scan gate needs one at the mention start) —
        # such rows are dropped arrow-side before any Python row work.
        # RE2 handles the ~full first-char class fine.
        chars = "".join(sorted(self.interpreter.trie.first_chars))
        for c in "\\]^-":
            chars = chars.replace(c, "\\" + c)
        self._prefilter = f"[{chars}]"
        self._freeze_state()

    def _link_rows(self, batch: pa.Table) -> dict[str, list]:
        """One pass: detect + link; returns plain column lists (FUSED_SCHEMA
        order) so subclasses can consume them without an Arrow round-trip."""
        import pyarrow.compute as pc

        mask = pc.match_substring_regex(batch.column("text"), self._prefilter)
        n_match = pc.sum(mask).as_py() or 0
        if n_match < batch.num_rows:
            batch = batch.filter(mask)

        it = self.interpreter
        results = self._results if self.memo else None
        # turn-level memo: web-scale transcript streams are heavy with EXACT
        # duplicate turns (boilerplate, re-shares, crawl dups — the reason
        # C4-style pipelines dedupe exact text first). One dict probe on the
        # raw text skips the whole interpret+link for a repeated turn.
        # Measured on the bench stream (67% dup turns): +4-15% — modest,
        # because the duplicated turns are mostly the CHEAP chitchat ones;
        # the win grows with duplicate-heavy address-dense streams. Output
        # is byte-identical either way (hash-checked A/B).
        turn_memo = self._turn_results if self.memo else None
        find = self.np_index.find_similar
        top_n = self.top_n
        out = {name: [] for name in FUSED_SCHEMA.names}
        o_conv = out["conv_id"].append
        o_turn = out["turn_idx"].append
        o_mi = out["mention_idx"].append
        o_role = out["role"].append
        o_key = out["district_key"].append
        o_least = out["least_region_id"].append
        o_linked = out["linked_addr"].append
        o_score = out["score"].append
        o_chain = out["region_chain"].append
        for conv_id, turn_idx, role, text in zip(
            batch.column("conv_id").to_pylist(),
            batch.column("turn_idx").to_pylist(),
            batch.column("role").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            if not text:
                continue
            rec = turn_memo.get(text) if turn_memo is not None else None
            if rec is None:
                rec = []
                for mention_idx, m in enumerate(find_mentions(text, it)):
                    a = m.addr
                    key = district_key(a)
                    least, chain = _region_ids(a)
                    town = a.town.name if a.town is not None else ""
                    village = a.village.name if a.village is not None else ""
                    hit = None
                    if results is not None:
                        memo_key = (key, town, village, a.road, a.road_num,
                                    a.text)
                        hit = results.get(memo_key)
                    if hit is not None:
                        linked, score = hit
                    else:
                        top = find(key, town, village, a.road, a.road_num,
                                   a.text, top_n=top_n)
                        linked, score = ((top[0][0], top[0][1]) if top
                                         else (-1, 0.0))
                        if results is not None:
                            if len(results) > 500_000:
                                results.clear()
                            results[memo_key] = (linked, score)
                    rec.append((mention_idx, key, least, linked, score, chain))
                if turn_memo is not None:
                    if len(turn_memo) > 200_000:
                        turn_memo.clear()
                    turn_memo[text] = rec
            for mention_idx, key, least, linked, score, chain in rec:
                o_conv(conv_id)
                o_turn(turn_idx)
                o_mi(mention_idx)
                o_role(role)
                o_key(key)
                o_least(least)
                o_linked(linked)
                o_score(score)
                o_chain(chain)
        self._maybe_gc()
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self._link_rows(batch)
        return pa.Table.from_arrays(
            [pa.array(out[f.name], f.type) for f in FUSED_SCHEMA], schema=FUSED_SCHEMA
        )


class BroadcastLinker:
    """Linking-only actor over mention rows, scoring against the broadcast
    index. Used after a district sort so each memo key lands on ~one actor
    (an unsorted stream fragments the memo across the pool: N actors pay N
    cold misses per repeated query shape)."""

    def __init__(self, index_ref, top_n: int = 1):
        import gc

        self.np_index = resolve_index(index_ref)
        self.top_n = top_n
        self._results: dict[tuple, tuple] = {}
        self._gc_tick = 0
        gc.collect()
        gc.freeze()
        gc.disable()  # see _RegionStateMixin._freeze_state (+ _maybe_gc)

    _maybe_gc = _RegionStateMixin._maybe_gc
    _GC_EVERY = _RegionStateMixin._GC_EVERY

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._maybe_gc()
        linked_out, score_out = [], []
        for key, town, village, road, road_num, residual in zip(
            batch.column("district_key").to_pylist(),
            batch.column("town").to_pylist(),
            batch.column("village").to_pylist(),
            batch.column("road").to_pylist(),
            batch.column("road_num").to_pylist(),
            batch.column("residual").to_pylist(),
        ):
            memo_key = (key, town, village, road, road_num, residual)
            hit = self._results.get(memo_key)
            if hit is not None:
                linked, score = hit
            else:
                top = self.np_index.find_similar(
                    key, town, village, road, road_num, residual,
                    top_n=self.top_n)
                linked, score = (top[0][0], top[0][1]) if top else (-1, 0.0)
                if len(self._results) > 500_000:
                    self._results.clear()
                self._results[memo_key] = (linked, score)
            linked_out.append(linked)
            score_out.append(score)
        out = batch.select(["conv_id", "turn_idx", "mention_idx", "role",
                            "district_key", "least_region_id", "region_chain"])
        out = out.append_column("linked_addr", pa.array(linked_out, pa.int64()))
        return out.append_column("score", pa.array(score_out, pa.float64()))


TRIPLE_ROUTE_SCHEMA = pa.schema([
    ("route", pa.int32()),  # <1000: conv bucket; >=1000: part_of edge bucket
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("mention_idx", pa.int32()),
    ("role", pa.string()),
    ("district_key", pa.string()),
    ("least", pa.int64()),   # mention rows: least_region_id; edges: child
    ("linked", pa.int64()),  # mention rows: linked_addr (-1 none); edges: parent
    ("score", pa.float64()),
])

_N_CONV_BUCKETS = 256
_N_EDGE_BUCKETS = 64


class MentionLinkTriplesStage(MentionLinkStage):
    """Fully fused: transcripts -> routed COMPACT rows in ONE pass.

    One row per mention (int codes only — no subj/pred/obj strings) routed
    by conv bucket, plus batch-deduped part_of edges as int pairs routed by
    edge bucket. The located_at + mentions expansion and ALL triple string
    formatting happen vectorized in ``finalize_route_group`` AFTER the
    shuffle, so the one all-to-all moves ~2.5x fewer bytes per turn and the
    hot actor loop allocates no per-row f-strings (round-3 verdict: the
    32-CPU anchor is pinned on memory bandwidth; bytes-per-turn is the
    lever). The whole pipeline stays a single streaming job:
    read -> this stage -> one groupby -> finalize -> write."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from zlib import crc32

        rows = self._link_rows(batch)  # plain lists — no Arrow round-trip
        convs = rows["conv_id"]
        routes = [crc32(c.encode()) % _N_CONV_BUCKETS for c in convs]
        edges = set()
        for chain in rows["region_chain"]:
            for child, parent in zip(chain, chain[1:]):
                edges.add((child, parent))
        ne = len(edges)
        e_child = [c for c, _ in edges]
        e_parent = [p for _, p in edges]
        e_route = [1000 + crc32(b"%d:%d" % (c, p)) % _N_EDGE_BUCKETS
                   for c, p in edges]
        return pa.Table.from_arrays(
            [
                pa.array(routes + e_route, pa.int32()),
                pa.array(convs + [""] * ne, pa.string()),
                pa.array(rows["turn_idx"] + [-1] * ne, pa.int32()),
                pa.array(rows["mention_idx"] + [-1] * ne, pa.int32()),
                pa.array(rows["role"] + [""] * ne, pa.string()),
                pa.array(rows["district_key"] + [""] * ne, pa.string()),
                pa.array(rows["least_region_id"] + e_child, pa.int64()),
                pa.array(rows["linked_addr"] + e_parent, pa.int64()),
                pa.array(rows["score"] + [1.0] * ne, pa.float64()),
            ],
            schema=TRIPLE_ROUTE_SCHEMA,
        )


def finalize_route_group(group: pa.Table) -> pa.Table:
    """One routed bucket -> final triple rows.

    Mention rows expand to their located_at + mentions triples HERE —
    first-wins dedup runs on the int codes ((conv, role, least) is exactly
    located_at's (conv, subj, pred, obj) key and (conv, linked) exactly
    mentions'), in the same stable (conv, turn, mention, pred) order as the
    checkpointed path's ``canonicalize_conv_group``; the subj/obj strings
    are then built vectorized for the survivors only. Edge buckets dedup
    the int pairs and format the same way. Output is byte-identical to the
    pre-compaction emit (driver kg_triples hash + mode-parity tests)."""
    import numpy as np
    import pandas as pd

    from .triples import TRIPLE_SCHEMA

    df = group.to_pandas()
    if int(df["route"].iloc[0]) >= 1000:
        df = df.drop_duplicates(["least", "linked"])
        out = pd.DataFrame({
            "subj": "region:" + df["least"].astype(str),
            "pred": "part_of",
            "obj": "region:" + df["linked"].astype(str),
            "conv_id": "", "turn_idx": -1, "district_key": "", "score": 1.0,
        }).sort_values(["subj", "obj"])
    else:
        df = df.sort_values(["conv_id", "turn_idx", "mention_idx"],
                            kind="stable").reset_index(drop=True)
        pos = np.arange(len(df), dtype=np.int64)
        la_keep = ~df.duplicated(["conv_id", "role", "least"]).to_numpy()
        me_keep = ~df.duplicated(["conv_id", "linked"]).to_numpy()
        la, me = df[la_keep], df[me_keep]
        la_out = pd.DataFrame({
            "subj": "conv:" + la["conv_id"] + ":" + la["role"],
            "pred": "located_at",
            "obj": "region:" + la["least"].astype(str),
            "conv_id": la["conv_id"], "turn_idx": la["turn_idx"],
            "district_key": la["district_key"], "score": la["score"],
            # located_at precedes mentions within a mention (oracle emission
            # order), hence the 2i / 2i+1 interleave positions
            "_pos": pos[la_keep] * 2,
        })
        me_out = pd.DataFrame({
            "subj": "conv:" + me["conv_id"],
            "pred": "mentions",
            "obj": np.where(me["linked"].to_numpy() >= 0,
                            ("addr:" + me["linked"].astype(str)).to_numpy(),
                            "addr:none"),
            "conv_id": me["conv_id"], "turn_idx": me["turn_idx"],
            "district_key": me["district_key"], "score": me["score"],
            "_pos": pos[me_keep] * 2 + 1,
        })
        out = (pd.concat([la_out, me_out], ignore_index=True)
               .sort_values("_pos", kind="stable").drop(columns=["_pos"]))
    out = out[["subj", "pred", "obj", "conv_id", "turn_idx", "district_key", "score"]]
    # strip the pandas schema-metadata blob (unhashable in pyarrow 16 —
    # trips Ray's block-schema dedup into per-batch warnings)
    return pa.Table.from_pandas(out, schema=TRIPLE_SCHEMA,
                                preserve_index=False).replace_schema_metadata(None)
