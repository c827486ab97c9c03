"""docs_pack_sequences: the distributed prefix-sum (scan) primitive vs a
sequential naive twin, including non-contiguous doc_ids and bucket-boundary
offsets."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _naive(ids, texts, ctx):
    order = np.argsort(ids)
    running = 0
    rows = []
    for i in order:
        n = len(texts[i].split(" "))
        rows.append((int(ids[i]), n, running, running // ctx))
        running += n
    return pd.DataFrame(rows, columns=["doc_id", "n_tokens", "start_tok",
                                       "bin_id"])


def _got(sf_dir, ctx, n_buckets):
    from address_semantic_search_ray.pipelines.queries import docs_pack_sequences

    return (docs_pack_sequences(sf_dir, ctx=ctx, n_buckets=n_buckets)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
            .astype({"doc_id": np.int64, "n_tokens": np.int64,
                     "start_tok": np.int64, "bin_id": np.int64}))


def test_pack_sequences_matches_sequential_scan(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    # SPARSE, shuffled doc_ids: the bucket ranges are uneven on purpose
    ids = rng.choice(np.arange(10_000, dtype=np.int64), size=400,
                     replace=False)
    texts = ["w " * rng.integers(0, 40) + "end" for _ in ids]
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   str(tmp_path / "documents.parquet"))
    for ctx, n_buckets in ((16, 8), (512, 64), (7, 3)):
        got = _got(str(tmp_path), ctx, n_buckets)
        want = _naive(ids, texts, ctx).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


def test_pack_sequences_single_doc_and_empty_text(ray_session, tmp_path):
    # "" splits to [''] -> 1 token; a single doc starts at offset 0, bin 0
    pq.write_table(pa.table({"doc_id": pa.array([7], pa.int64()),
                             "text": pa.array([""], pa.string())}),
                   str(tmp_path / "documents.parquet"))
    got = _got(str(tmp_path), 512, 64)
    assert got.iloc[0].tolist() == [7, 1, 0, 0]


def test_pack_sequences_bins_are_contiguous(ray_session):
    # over the real testdata: starts are a perfect exclusive prefix sum and
    # bin assignment matches start // ctx
    got = _got("/root/testdata/sf0.001", 512, 64)
    starts = got["start_tok"].to_numpy()
    toks = got["n_tokens"].to_numpy()
    assert starts[0] == 0
    assert (starts[1:] == starts[:-1] + toks[:-1]).all()
    assert (got["bin_id"].to_numpy() == starts // 512).all()


def test_weighted_sample_matches_sequential_aes(ray_session, tmp_path):
    """A-ES over a synthetic corpus vs a sequential naive: identical
    selection and rank order; heavier docs appear more often than light
    ones across disjoint id ranges (the weighting actually bites)."""
    import hashlib
    import math

    ids = np.arange(1000, dtype=np.int64)
    # ids < 500 are 100x heavier
    n_chars = np.where(ids < 500, 5000, 50).astype(np.int64)
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(["x"] * len(ids), pa.string()),
                             "n_chars": pa.array(n_chars, pa.int64())}),
                   str(tmp_path / "documents.parquet"))

    def key_of(i, w):
        u = (int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16) + 1) \
            / 4294967296.0
        return math.log(u) / max(int(w), 1)

    want = sorted(((key_of(i, w), int(i)) for i, w in zip(ids, n_chars)),
                  key=lambda t: (-t[0], t[1]))[:20]
    want_ids = [i for _, i in want]

    from address_semantic_search_ray.pipelines.queries import docs_weighted_sample

    got = (docs_weighted_sample(str(tmp_path), k=20).to_pandas()
           .sort_values("rank"))
    assert got["doc_id"].tolist() == want_ids
    # weighting bites: heavy ids dominate the sample
    assert (np.asarray(want_ids) < 500).mean() > 0.8
    # determinism: a second run returns the identical frame
    got2 = (docs_weighted_sample(str(tmp_path), k=20).to_pandas()
            .sort_values("rank"))
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  got2.reset_index(drop=True))


def test_vocab_growth_matches_pandas(ray_session):
    """Cumulative distinct-vocab curve vs a sequential set-union walk."""
    import numpy as np
    import pyarrow.parquet as pq

    from address_semantic_search_ray.pipelines.queries import (
        docs_vocab_growth,
    )

    SF_DIR = "/root/testdata/sf0.001"
    got = docs_vocab_growth(SF_DIR).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    docs = pq.read_table(SF_DIR + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id")
    seen: set = set()
    want = []
    for t in docs["text"]:
        seen.update(t.split(" "))
        want.append(len(seen))
    assert list(got["doc_id"]) == list(docs["doc_id"])
    assert list(got["vocab_size"]) == want
    assert (np.diff(got["vocab_size"].to_numpy()) >= 0).all()
