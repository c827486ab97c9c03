"""docs_postings and text_normalize vs plain-python recomputations.

The whitespace class is RE2's ASCII ``\s`` (both the pipeline's arrow RE2
kernels and the DuckDB oracle) — Python ``re`` would also match U+00A0
etc., so the recompute uses the explicit ASCII class."""

from __future__ import annotations

import re
import unicodedata
from collections import defaultdict

import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def test_postings_matches_dicts(ray_session):
    from address_semantic_search_ray.pipelines.queries import docs_postings

    got = docs_postings(SF_DIR).to_pandas() \
        .sort_values("term").reset_index(drop=True)

    docs = pq.read_table(SF_DIR + "/documents.parquet").to_pandas()
    df_d, tf_d, first_d = defaultdict(int), defaultdict(int), {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = [t for t in text.split(" ") if t]
        for t in set(toks):
            df_d[t] += 1
            first_d[t] = min(first_d.get(t, doc_id), doc_id)
        for t in toks:
            tf_d[t] += 1
    want = pd.DataFrame(
        sorted((t, df_d[t], tf_d[t], first_d[t]) for t in df_d),
        columns=["term", "df", "tf", "first_doc"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)
    assert (got["df"] <= got["tf"]).all() and len(got) > 0


def test_normalize_matches_python(ray_session):
    from address_semantic_search_ray.pipelines.queries import text_normalize

    got = text_normalize(SF_DIR).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    docs = pq.read_table(SF_DIR + "/documents.parquet").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    norm = [unicodedata.normalize(
                "NFC", re.sub(r"[ \t\n\r\f\v]+", " ",
                              re.sub(r"^[ \t\n\r\f\v]+|[ \t\n\r\f\v]+$", "", t)).lower())
            for t in docs["text"]]
    assert list(got["doc_id"]) == list(docs["doc_id"])
    assert list(got["norm_text"]) == norm
    assert list(got["n_chars_norm"]) == [len(t) for t in norm]


def test_normalize_edge_inputs(ray_session, tmp_path):
    """Whitespace-only / mixed-unicode / emoji inputs survive the kernel
    chain with the same python semantics."""
    import pyarrow as pa

    from address_semantic_search_ray.pipelines.queries import text_normalize

    texts = ["  \t\n  ", "Ábc  DEF", "héllo wörld", "😀  X\t\ty"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = text_normalize(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = [unicodedata.normalize(
                "NFC", re.sub(r"[ \t\n\r\f\v]+", " ",
                              re.sub(r"^[ \t\n\r\f\v]+|[ \t\n\r\f\v]+$", "", t)).lower())
            for t in texts]
    assert list(got["norm_text"]) == want
