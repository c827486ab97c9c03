"""docs_tfidf: the two-shuffle distributed TF-IDF top-k vs a sequential
naive twin, including rank ties (equal tfidf -> term ASC) and repeated
tokens."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _naive(ids, texts, k):
    n = float(len(ids))
    df: Counter = Counter()
    tfs = []
    for t in texts:
        tf = Counter(t.split(" "))
        tfs.append(tf)
        df.update(tf.keys())
    rows = []
    for doc_id, tf in zip(ids, tfs):
        scored = sorted(((tc * math.log(n / df[term]), term)
                         for term, tc in tf.items()),
                        key=lambda x: (-x[0], x[1]))
        for rank, (s, term) in enumerate(scored[:k], 1):
            rows.append((int(doc_id), term, round(s, 6), rank))
    return (pd.DataFrame(rows, columns=["doc_id", "term", "tfidf", "rank"])
            .sort_values(["doc_id", "rank"]).reset_index(drop=True))


def _got(sf_dir, k):
    from address_semantic_search_ray.pipelines.queries import docs_tfidf

    return (docs_tfidf(sf_dir, k=k).to_pandas()
            .sort_values(["doc_id", "rank"]).reset_index(drop=True)
            .astype({"doc_id": np.int64, "tfidf": np.float64,
                     "rank": np.int64}))


def test_docs_tfidf_matches_naive(ray_session, tmp_path):
    texts = [
        "apple banana apple cherry",        # repeated token: tf=2
        "banana banana banana",             # single-term doc
        "apple cherry date elderberry fig",
        "zeta zeta yotta yotta",            # tf tie -> term ASC rank order
        "",                                 # empty text -> one '' token
        "date date date date cherry",
    ]
    ids = [5, 1, 9, 3, 7, 2]
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   str(tmp_path / "documents.parquet"))
    for k in (1, 3, 10):
        got = _got(str(tmp_path), k)
        want = _naive(ids, texts, k)
        pd.testing.assert_frame_equal(got, want)


def test_docs_tfidf_on_testdata(ray_session):
    got = _got("/root/testdata/sf0.001", 3)
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    want = _naive(t.column("doc_id").to_pylist(),
                  t.column("text").to_pylist(), 3)
    pd.testing.assert_frame_equal(got, want)
