"""knn_graph: the streamed broadcast-corpus k-NN vs a numpy naive twin, plus
the tie rule (cos DESC, neighbor_id ASC) on planted duplicate vectors."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _naive(path: str, k: int = 5) -> pd.DataFrame:
    t = pq.read_table(path, columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.stack(t.column("embedding").to_pandas().to_numpy()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    out = []
    for i in range(len(ids)):
        cos = m @ m[i]
        cand = sorted(((-cos[j], ids[j]) for j in range(len(ids)) if j != i))
        for rank, (neg, nid) in enumerate(cand[:k], 1):
            out.append((ids[i], nid, round(-neg, 6), rank))
    return pd.DataFrame(out, columns=["vec_id", "neighbor_id", "cos", "rank"])


def test_knn_graph_matches_naive(ray_session):
    from address_semantic_search_ray.pipelines.queries import knn_graph

    got = (knn_graph(SF_DIR).to_pandas()
           .sort_values(["vec_id", "rank"]).reset_index(drop=True))
    want = (_naive(SF_DIR + "/embeddings.parquet")
            .sort_values(["vec_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def test_knn_graph_duplicate_vector_tie(ray_session, tmp_path):
    # ids 10 and 20 are EXACT copies: both tie at cos=1.0 from id 30's view?
    # no — 30 differs; the tie is from id 0's view: neighbors 10 and 20 have
    # bit-identical cosine, and the smaller neighbor_id must rank first.
    from address_semantic_search_ray.pipelines.queries import knn_graph

    vecs = {0: [1.0, 0.0, 0.0], 10: [0.6, 0.8, 0.0], 20: [0.6, 0.8, 0.0],
            30: [0.0, 0.0, 1.0]}
    tbl = pa.table({
        "vec_id": pa.array(list(vecs), pa.int64()),
        "embedding": pa.array(list(vecs.values()), pa.list_(pa.float32())),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    got = knn_graph(str(tmp_path), k=2).to_pandas()
    row0 = got[got["vec_id"] == 0].sort_values("rank")
    assert list(row0["neighbor_id"]) == [10, 20]
    # duplicates see each other at cos 1.0 first
    for a, b in ((10, 20), (20, 10)):
        r = got[(got["vec_id"] == a) & (got["rank"] == 1)]
        assert list(r["neighbor_id"]) == [b] and float(r["cos"]) == 1.0


def test_knn_graph_forced_shards_matches_single(ray_session, monkeypatch):
    """Round-4 verdict #3: the size-routed shard fold must be exact — the
    same graph (values AND tie order) whether the corpus is one broadcast
    payload or 4 row-group shards."""
    from address_semantic_search_ray.pipelines.queries import knn_graph

    key = lambda df: df.sort_values(["vec_id", "rank"]).reset_index(drop=True)
    single = key(knn_graph(SF_DIR).to_pandas())
    monkeypatch.setenv("ASR_EMB_SHARDS", "4")
    sharded = key(knn_graph(SF_DIR).to_pandas())
    pd.testing.assert_frame_equal(single, sharded)


def test_embedding_near_dup_forced_shards_matches_single(ray_session, monkeypatch):
    from address_semantic_search_ray.pipelines.queries import embedding_near_dup

    key = lambda df: df.sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)
    single = key(embedding_near_dup(SF_DIR).to_pandas())
    monkeypatch.setenv("ASR_EMB_SHARDS", "4")
    sharded = key(embedding_near_dup(SF_DIR).to_pandas())
    assert len(single) > 0
    pd.testing.assert_frame_equal(single, sharded)


def test_emb_shard_units_cover_exactly_once():
    """The shard plan must partition the row space: every row in exactly one
    shard, shards contiguous, even when shards outnumber row groups."""
    import pyarrow.parquet as pq

    from address_semantic_search_ray.pipelines.queries import _emb_shard_units

    path = SF_DIR + "/embeddings.parquet"
    total = pq.read_metadata(path).num_rows
    for n in (1, 3, 7, total + 5):
        units = _emb_shard_units(path, n)
        seen = sum(u[3] for shard in units for u in shard)
        assert seen == total
        # each unit's (rg, lo, len) ranges must not overlap
        spans = sorted((u[1], u[2], u[2] + u[3])
                       for shard in units for u in shard)
        for (rg_a, _, hi), (rg_b, lo, _) in zip(spans, spans[1:]):
            assert rg_a != rg_b or hi <= lo


def test_topk_rows_argpartition_matches_lexsort():
    """The >8k-column argpartition cut must reproduce the full lexsort's
    exact (cos DESC, id ASC) selection, including tie groups that straddle
    the kth boundary."""
    from address_semantic_search_ray.pipelines.queries import _topk_rows

    rng = np.random.default_rng(3)
    n = 9000
    ids = rng.permutation(n).astype(np.int64)
    # quantized sims force many exact ties across the k-th boundary
    sims = np.round(rng.random((6, n)), 2)
    kk = 7
    got = _topk_rows(sims, ids, kk)  # n > 8192 -> argpartition path
    want = np.lexsort((np.broadcast_to(ids, sims.shape), -sims), axis=1)[:, :kk]
    assert (got == want).all()
