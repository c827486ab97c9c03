"""Product-quantization ANN: code-table shape, plain-loop ADC parity, and
recall sanity against the exact brute-force scan."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def test_pq_matches_plain_loop_adc(ray_session):
    from address_semantic_search_ray.pipelines.queries import (
        similarity_topk_pq,
    )
    from address_semantic_search_ray.stages.vector import pq_train

    k, n_queries, m, ksub = 5, 5, 16, 256
    got = similarity_topk_pq(SF_DIR, k=k, n_queries=n_queries,
                             m=m, ksub=ksub).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)

    t = pq.read_table(SF_DIR + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    vecs = [np.asarray(v, dtype=np.float64)
            for v in t.column("embedding").to_pylist()]
    books = pq_train(np.stack(vecs[:4096]), m=m, ksub=ksub)
    dsub = books.shape[2]
    unit = lambda v: v / (np.linalg.norm(v) or 1.0)

    codes = []
    for v in vecs:
        u = unit(v)
        codes.append([int(np.argmin(((u[s * dsub:(s + 1) * dsub]
                                      - books[s]) ** 2).sum(axis=1)))
                      for s in range(m)])

    rows = []
    for qid, qv in zip(ids, vecs):
        if qid >= n_queries:
            continue
        u = unit(qv)
        lut = [u[s * dsub:(s + 1) * dsub] @ books[s].T for s in range(m)]
        scored = []
        for vid, code in zip(ids, codes):
            if vid == qid:
                continue
            sc = round(float(np.round(np.asarray(
                [lut[s][code[s]] for s in range(m)]).sum(), 6)), 6)
            scored.append((-sc, vid))
        for rank, (negsc, vid) in enumerate(sorted(scored)[:k], 1):
            rows.append((qid, vid, -negsc, rank))

    assert len(got) == len(rows) == n_queries * k
    for row, (qid, vid, sc, rank) in zip(got.itertuples(index=False), rows):
        assert (row.query_id, row.vec_id, row.rank) == (qid, vid, rank)
        assert row.score == sc


def test_pq_recall_vs_exact(ray_session):
    """PQ@5 should recover a solid fraction of the exact cosine top-5 —
    quantization trades recall, not everything."""
    from address_semantic_search_ray.pipelines.queries import (
        similarity_topk, similarity_topk_pq,
    )

    got = similarity_topk_pq(SF_DIR).to_pandas()
    exact = similarity_topk(SF_DIR).to_pandas()
    hit = tot = 0
    for qid in exact["query_id"].unique():
        e = set(exact.loc[exact["query_id"] == qid, "vec_id"])
        p = set(got.loc[got["query_id"] == qid, "vec_id"])
        hit += len(e & p)
        tot += len(e)
    assert tot == 25
    assert hit / tot >= 0.6, f"PQ recall@5 too low: {hit}/{tot}"


def test_pq_encode_drops_embeddings():
    """The code table is m int columns + vec_id — the 32x story."""
    import pandas as pd

    from address_semantic_search_ray.stages.vector import (
        pq_encode_batch_fn, pq_train,
    )

    rng = np.random.RandomState(3)
    mat = rng.normal(size=(64, 64))
    books = pq_train(mat, m=8, ksub=16)
    out = pq_encode_batch_fn(books)(pd.DataFrame({
        "vec_id": np.arange(64, dtype=np.int64),
        "embedding": list(mat)}))
    assert list(out.columns) == ["vec_id"] + [f"code_{s}" for s in range(8)]
    assert all(out[f"code_{s}"].between(0, 15).all() for s in range(8))
