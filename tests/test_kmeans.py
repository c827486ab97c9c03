"""embedding_kmeans: the distributed broadcast-iterate Lloyd loop vs the
sequential naive twin's centroids, shard-fold exactness, and the
deterministic seed/tie rules."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _twin_assign(sf_dir: str, k: int = 8, n_iters: int = 5) -> pd.DataFrame:
    """Recompute the final assignment in plain numpy from the naive twin's
    centroids (the oracle's job, sans DuckDB)."""
    from address_semantic_search_ray.pipelines import naive
    from address_semantic_search_ray.pipelines.queries import _naive_oracle_dir

    out_dir = _naive_oracle_dir(sf_dir)
    naive.write_kmeans(sf_dir + "/embeddings.parquet", out_dir,
                       k=k, n_iters=n_iters)
    c = pq.read_table(out_dir + "/kmeans_centroids.parquet").to_pandas()
    cents = np.stack(c["centroid"].to_numpy())
    cu = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    t = pq.read_table(sf_dir + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    m = np.stack(t.column("embedding").to_pandas().to_numpy()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ cu.T
    best = np.argmax(sims, axis=1)  # first max = smallest cluster on ties
    return pd.DataFrame({
        "vec_id": np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64),
        "cluster": best.astype(np.int64),
        "cos": np.round(sims[np.arange(len(best)), best], 6),
    })


def test_kmeans_matches_sequential_twin(ray_session):
    from address_semantic_search_ray.pipelines.queries import embedding_kmeans

    key = lambda df: df.sort_values("vec_id").reset_index(drop=True)
    got = key(embedding_kmeans(SF_DIR).to_pandas())
    want = key(_twin_assign(SF_DIR))
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)
    # every cluster id is in range and at least 2 clusters survive 5 steps
    assert got["cluster"].between(0, 7).all() and got["cluster"].nunique() >= 2


def test_kmeans_forced_shards_matches_single(ray_session, monkeypatch):
    """The per-shard partial-sum fold must reproduce the single-payload run
    exactly (assignments AND rounded cos) — centroid rounding absorbs the
    fold's re-association."""
    from address_semantic_search_ray.pipelines.queries import embedding_kmeans

    key = lambda df: df.sort_values("vec_id").reset_index(drop=True)
    single = key(embedding_kmeans(SF_DIR).to_pandas())
    monkeypatch.setenv("ASR_EMB_SHARDS", "3")
    sharded = key(embedding_kmeans(SF_DIR).to_pandas())
    pd.testing.assert_frame_equal(single, sharded)
