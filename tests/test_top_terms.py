"""docs_top_terms: exact two-level top-k vs a naive twin, including count
ties at the k-boundary across token buckets (the total order is
(count DESC, token ASC), so equal-count tokens resolve lexicographically
regardless of which bucket each lives in)."""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq


def _naive(texts_by_lang, k):
    out = set()
    for lang, texts in texts_by_lang.items():
        c = Counter(t for x in texts for t in x.split(" "))
        ranked = sorted(c.items(), key=lambda it: (-it[1], it[0]))[:k]
        for rank, (tok, n) in enumerate(ranked, 1):
            out.add((lang, tok, n, rank))
    return out


def test_top_terms_ties_across_buckets(ray_session, tmp_path):
    from address_semantic_search_ray.pipelines.queries import docs_top_terms

    # many distinct tokens all with count 1 -> every k-boundary is a tie and
    # candidates come from many different crc buckets
    texts = {"en": ["alpha beta gamma", "delta epsilon zeta", "eta theta"],
             "de": ["ein zwei drei", "vier ein zwei", "ein"]}
    rows = [(lang, t) for lang, ts in texts.items() for t in ts]
    tbl = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "lang": pa.array([r[0] for r in rows]),
        "text": pa.array([r[1] for r in rows]),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = docs_top_terms(str(tmp_path), k=4).to_pandas()
    got_set = set(zip(got["lang"], got["tok"], got["n"].astype(int),
                      got["rank"].astype(int)))
    assert got_set == _naive(texts, 4)
