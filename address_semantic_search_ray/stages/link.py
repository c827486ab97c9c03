"""Entity-linking stage: score mentions against their district's doc vectors.

Layout: doc-vector and idf checkpoints are hive-partitioned by
``bucket = crc32(district_key) % n_buckets`` (not by raw district — 3k+ tiny
directories cost more in file-system and read-task overhead than they save;
a bucket is the pruning unit, a district the lookup unit inside it).

Execution: mentions are SORTED by district_key (the only shuffle) and scored
by an actor pool; each actor keeps an LRU of loaded buckets, so consecutive
batches — district-clustered after the sort — hit the cache. Worst-case
bucket loads = actors x buckets, vs. groups x 2 parquet opens for the naive
per-district ``map_groups`` (measured 3-5x slower at sf0.1).

Skew: a hot district spans many batches but loads its bucket once per actor;
batch size bounds per-task memory regardless of key skew. This mirrors the
reference's per-district ``.vt`` cache with ``cacheVectorsInMemory``
(SimilarityComputer.java:83, 558-617) as a bounded per-actor cache.
"""

from __future__ import annotations

import glob
import os
import zlib
from collections import OrderedDict

import pyarrow as pa
import pyarrow.parquet as pq

from ..kernel.npindex import NpCorpusIndex

DEFAULT_N_BUCKETS = 64

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


def bucket_of(district_key: str, n_buckets: int = DEFAULT_N_BUCKETS) -> int:
    from ..kernel.npindex import district_bucket

    return district_bucket(district_key, n_buckets)


def _read_dir(root: str, bucket: int, columns=None) -> pa.Table | None:
    files = glob.glob(os.path.join(root, f"bucket={bucket}", "*.parquet"))
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f, columns=columns) for f in files])


def load_bucket_index(doc_dir: str, idf_dir: str, bucket: int) -> NpCorpusIndex | None:
    """bucket -> flat numpy similarity index over the bucket's districts
    (same vectorized scoring kernel as the broadcast mode — bit-identical
    to the sequential kernel, so both pipeline modes emit equal triples)."""
    docs_tbl = _read_dir(doc_dir, bucket,
                         columns=["addr_id", "district_key", "town", "village",
                                  "road", "road_num", "residual"])
    if docs_tbl is None:
        return None
    idf_tbl = _read_dir(idf_dir, bucket, columns=["district_key", "term_key", "idf"])
    if idf_tbl is None:
        idf_tbl = pa.table({"district_key": pa.array([], pa.string()),
                            "term_key": pa.array([], pa.string()),
                            "idf": pa.array([], pa.float64())})
    return NpCorpusIndex.from_tables(docs_tbl, idf_tbl)


class LinkerActor:
    """Actor-pool scorer with an LRU of loaded buckets."""

    def __init__(self, doc_dir: str, idf_dir: str, top_n: int = 1,
                 n_buckets: int = DEFAULT_N_BUCKETS, cache_buckets: int = 16):
        self.doc_dir = doc_dir
        self.idf_dir = idf_dir
        self.top_n = top_n
        self.n_buckets = n_buckets
        self.cache_buckets = cache_buckets
        self._cache: OrderedDict[int, NpCorpusIndex | None] = OrderedDict()
        import gc

        gc.collect()
        gc.freeze()
        gc.disable()  # see _RegionStateMixin._freeze_state (+ _maybe_gc)
        self._gc_tick = 0
        # result memo: repeated query shapes (same fields, same district) are
        # common in conversational data; deterministic, bounded
        self._results: dict[tuple, tuple] = {}

    _GC_EVERY = 512  # see _RegionStateMixin._maybe_gc

    def _maybe_gc(self):
        self._gc_tick += 1
        if self._gc_tick >= self._GC_EVERY:
            self._gc_tick = 0
            import gc

            gc.collect()

    def _bucket_index(self, bucket: int) -> dict:
        if bucket in self._cache:
            self._cache.move_to_end(bucket)
            return self._cache[bucket]
        idx = load_bucket_index(self.doc_dir, self.idf_dir, bucket)
        self._cache[bucket] = idx
        if len(self._cache) > self.cache_buckets:
            self._cache.popitem(last=False)
        return idx

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._maybe_gc()
        out = {name: [] for name in LINK_SCHEMA.names}
        for conv_id, turn_idx, mention_idx, role, key, town, village, road, road_num, residual, least in zip(
            batch.column("conv_id").to_pylist(),
            batch.column("turn_idx").to_pylist(),
            batch.column("mention_idx").to_pylist(),
            batch.column("role").to_pylist(),
            batch.column("district_key").to_pylist(),
            batch.column("town").to_pylist(),
            batch.column("village").to_pylist(),
            batch.column("road").to_pylist(),
            batch.column("road_num").to_pylist(),
            batch.column("residual").to_pylist(),
            batch.column("least_region_id").to_pylist(),
        ):
            memo_key = (key, town, village, road, road_num, residual)
            hit = self._results.get(memo_key)
            if hit is not None:
                linked, score = hit
            else:
                idx = self._bucket_index(bucket_of(key, self.n_buckets))
                top = idx.find_similar(key, town, village, road, road_num,
                                       residual, top_n=self.top_n) \
                    if idx is not None else []
                linked, score = (top[0][0], top[0][1]) if top else (-1, 0.0)
                if len(self._results) > 500_000:
                    self._results.clear()
                self._results[memo_key] = (linked, score)
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
