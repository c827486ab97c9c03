"""Similarity search over an embedding column (``list<float>``).

- Brute-force cosine top-k: the scale path is a broadcast of the (small)
  query matrix via ``ray.put`` + one numpy matmul per batch, keeping only a
  per-batch top-k partial — the final reduce merges tiny partials, never the
  full score matrix.
- LSH-bucketed variant: random-hyperplane signatures (stable seed) bucket the
  corpus; probing only matching buckets bounds the scan at the cost of recall.
- Embedding near-dup: all pairs above a cosine threshold, blocked by label.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def make_topk_partial(queries_ref, k: int):
    """Per-batch partial: cosine of batch vs broadcast queries, local top-k."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        import ray

        if not len(batch):  # Ray Data can hand map_batches empty blocks
            return pd.DataFrame({"query_id": np.asarray([], dtype=np.int64),
                                 "vec_id": np.asarray([], dtype=np.int64),
                                 "cos": np.asarray([], dtype=np.float64)})
        q = ray.get(queries_ref) if not isinstance(queries_ref, dict) else queries_ref
        qids, qmat = q["ids"], q["mat"]  # (m,), (m, d) float64 normalized
        vec_ids = batch["vec_id"].to_numpy()
        m = normalize_rows(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        scores = qmat @ m.T  # (m_queries, n_batch)
        out_q, out_v, out_c = [], [], []
        for qi, qid in enumerate(qids):
            row = scores[qi]
            mask = vec_ids != qid  # exclude self
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                continue
            take = idx[np.argsort(-row[idx], kind="stable")[:k]]
            out_q.extend([qid] * len(take))
            out_v.extend(vec_ids[take].tolist())
            out_c.extend(row[take].tolist())
        return pd.DataFrame({"query_id": np.asarray(out_q, dtype=np.int64),
                             "vec_id": np.asarray(out_v, dtype=np.int64),
                             "cos": np.asarray(out_c, dtype=np.float64)})

    return partial


def make_topk_final(k: int):
    """Per-query group reduce: merge partials, rank, keep top-k."""

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cos", "vec_id"], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.asarray(range(1, len(g) + 1), dtype=np.int64)
        g["cos"] = g["cos"].round(6)
        return g[["query_id", "vec_id", "cos", "rank"]]

    return final


# -- IVF (inverted-file) coarse quantizer (scale path #2) -------------------

def ivf_train(mat: np.ndarray, nlist: int = 16, n_iter: int = 10,
              seed: int = 11) -> np.ndarray:
    """Deterministic Lloyd k-means over L2-normalized vectors (cosine order).

    Trains on whatever sample the caller passes (at corpus scale: a bounded
    sample, not the full table). Empty clusters keep their previous centroid.
    Returns (nlist, dim) normalized centroids."""
    x = normalize_rows(mat.astype(np.float64))
    rng = np.random.RandomState(seed)
    centroids = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)].copy()
    if len(centroids) < nlist:  # tiny corpus: pad by repeating
        centroids = np.vstack([centroids] * ((nlist // len(centroids)) + 1))[:nlist]
    for _ in range(n_iter):
        assign = np.argmax(x @ centroids.T, axis=1)
        for c in range(nlist):
            members = x[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = normalize_rows(centroids)
    return centroids


def ivf_assign_batch_fn(centroids: np.ndarray):
    """vec -> nearest-centroid list id (max cosine; ties -> lowest id)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["vec_id", "embedding"]].copy()
        if not len(batch):  # empty block: keep the schema explicit
            out["list_id"] = np.asarray([], dtype=np.int64)
            return out
        m = normalize_rows(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        out["list_id"] = np.argmax(m @ centroids.T, axis=1).astype(np.int64)
        return out

    return fn


def ivf_probe_lists(qmat: np.ndarray, centroids: np.ndarray,
                    nprobe: int) -> np.ndarray:
    """(n_queries, nprobe) nearest list ids per query, cosine desc then id."""
    sims = normalize_rows(qmat.astype(np.float64)) @ centroids.T
    # argsort on (-sim, id): stable sort of -sims gives id-ascending ties
    return np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]


# -- LSH bucketing (scale path) --------------------------------------------

def lsh_planes(dim: int, n_bits: int = 12, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_bits, dim))


def lsh_bucket_batch_fn(planes: np.ndarray):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):  # empty block: keep the schema explicit
            out = batch[["vec_id", "embedding"]].copy()
            out["bucket"] = np.asarray([], dtype=np.int64)
            return out
        m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        bits = (m @ planes.T) > 0  # (n, n_bits)
        buckets = np.zeros(len(m), dtype=np.int64)
        for b in range(planes.shape[0]):
            buckets |= bits[:, b].astype(np.int64) << b
        out = batch[["vec_id", "embedding"]].copy()
        out["bucket"] = buckets
        return out

    return fn


def near_dup_pairs_group(group: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """All pairs (a<b) in one block with cosine >= threshold."""
    ids = group["vec_id"].to_numpy()
    m = normalize_rows(np.stack(group["embedding"].to_numpy()).astype(np.float64))
    s = m @ m.T
    order = np.argsort(ids)
    a_out, b_out, c_out = [], [], []
    for ii in range(len(order)):
        for jj in range(ii + 1, len(order)):
            i, j = order[ii], order[jj]
            c = s[i, j]
            if c >= threshold:
                a_out.append(int(ids[i]))
                b_out.append(int(ids[j]))
                c_out.append(round(float(c), 6))
    return pd.DataFrame({"vec_id_a": np.asarray(a_out, dtype=np.int64),
                         "vec_id_b": np.asarray(b_out, dtype=np.int64),
                         "cos": np.asarray(c_out, dtype=np.float64)})


# -- Product quantization (scale path #3: 64-dim float -> m uint8 codes) ----

def pq_train(mat: np.ndarray, m: int = 8, ksub: int = 16, n_iter: int = 10,
             seed: int = 13) -> np.ndarray:
    """Deterministic per-subspace Lloyd k-means over L2-normalized vectors.

    Returns (m, ksub, dim/m) codebooks. Like ``ivf_train`` this trainer is
    SPEC shared with the naive twin; encoding and scoring are recomputed
    independently there. Empty clusters keep their previous centroid; the
    subspace RNG draws consume one shared stream so the whole codebook is
    a pure function of (sample, m, ksub, n_iter, seed)."""
    x = normalize_rows(mat.astype(np.float64))
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for s in range(m):
        sub = x[:, s * dsub:(s + 1) * dsub]
        cent = sub[rng.choice(len(sub), size=min(ksub, len(sub)),
                              replace=False)].copy()
        if len(cent) < ksub:
            cent = np.vstack([cent] * ((ksub // len(cent)) + 1))[:ksub]
        # matmul form of the squared distance (|x|^2 - 2 x.c + |c|^2): same
        # argmin, ~30x over the broadcast-subtract form at ksub=256
        x2 = (sub ** 2).sum(axis=1, keepdims=True)
        for _ in range(n_iter):
            d2 = x2 - 2.0 * (sub @ cent.T) + (cent ** 2).sum(axis=1)[None, :]
            assign = np.argmin(d2, axis=1)
            sums = np.zeros((ksub, dsub), dtype=np.float64)
            np.add.at(sums, assign, sub)
            counts = np.bincount(assign, minlength=ksub)
            nz = counts > 0
            cent[nz] = sums[nz] / counts[nz, None]
        books[s] = cent
    return books


def pq_encode_batch_fn(books: np.ndarray):
    """vec -> (vec_id, code_0..code_{m-1}): per-subspace nearest codebook
    entry by squared L2 (ties -> lowest code). The embedding column is
    DROPPED here — downstream sees only the m-byte code row, the whole
    point of the PQ scale path."""
    m, _, dsub = books.shape

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):  # Ray Data can hand map_batches empty blocks
            return pd.DataFrame({"vec_id": np.asarray([], dtype=np.int64),
                                 **{f"code_{s}": np.asarray([], dtype=np.int64)
                                    for s in range(m)}})
        x = normalize_rows(
            np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        out = pd.DataFrame({"vec_id": batch["vec_id"].to_numpy()})
        for s in range(m):
            sub = x[:, s * dsub:(s + 1) * dsub]
            d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
            out[f"code_{s}"] = np.argmin(d2, axis=1).astype(np.int64)
        return out

    return fn


def pq_adc_partial_fn(queries_ref, books: np.ndarray, k: int):
    """Per-batch asymmetric-distance partial top-k: each query's LUT
    (m x ksub inner products vs the codebooks, computed once per batch
    from the broadcast normalized query matrix) scores every code row as
    sum_s LUT[s, code_s]; scores round to 6 dp BEFORE ranking so the
    distributed ranking and the naive twin agree exactly."""
    m = books.shape[0]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, dict) \
            else queries_ref
        qids, qmat = q["ids"], q["mat"]  # (nq,), (nq, d) normalized
        vec_ids = batch["vec_id"].to_numpy()
        codes = np.stack([batch[f"code_{s}"].to_numpy() for s in range(m)],
                         axis=1)  # (n, m)
        dsub = books.shape[2]
        out_q, out_v, out_c = [], [], []
        for qi, qid in enumerate(qids):
            lut = np.stack([qmat[qi, s * dsub:(s + 1) * dsub] @ books[s].T
                            for s in range(m)])  # (m, ksub)
            scores = np.round(
                lut[np.arange(m)[None, :], codes].sum(axis=1), 6)
            mask = vec_ids != qid
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                continue
            order = idx[np.lexsort((vec_ids[idx], -scores[idx]))[:k]]
            out_q.extend([qid] * len(order))
            out_v.extend(vec_ids[order].tolist())
            out_c.extend(scores[order].tolist())
        return pd.DataFrame({"query_id": np.asarray(out_q, dtype=np.int64),
                             "vec_id": np.asarray(out_v, dtype=np.int64),
                             "score": np.asarray(out_c, dtype=np.float64)})

    return partial


def pq_topk_final(k: int):
    """Per-query merge of ADC partials: rank on (score desc, vec_id asc)."""

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score", "vec_id"], ascending=[False, True],
                              kind="stable").head(k).reset_index(drop=True)
        g["rank"] = np.asarray(range(1, len(g) + 1), dtype=np.int64)
        return g[["query_id", "vec_id", "score", "rank"]]

    return final
