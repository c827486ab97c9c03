"""text_scrub_pii: pattern order + RE2 semantics on planted PII, and the
real-corpus no-op invariant (word-salad docs carry no PII shapes)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def test_scrub_planted_pii(ray_session, tmp_path):
    from address_semantic_search_ray.pipelines.queries import text_scrub_pii

    texts = [
        "mail me at a.b-c%d@ex-ample.co.uk now",
        "call +1 (415) 555-0199 ok",
        "id 1234567 and 12345",          # only the >=6-digit run redacts
        "nothing here",
        "a@b.cx 123456789012",            # long digit run is phone-shaped
    ]
    want = [
        "mail me at <EMAIL> now",
        "call <PHONE> ok",
        "id <NUM> and 12345",
        "nothing here",
        "<EMAIL> <PHONE>",
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)}),
        str(tmp_path / "documents.parquet"))
    got = text_scrub_pii(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert list(got["text"]) == want


def test_scrub_idempotent(ray_session, tmp_path):
    # scrubbing already-scrubbed text changes nothing (tokens carry no PII)
    from address_semantic_search_ray.pipelines.queries import text_scrub_pii

    pq.write_table(
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["<EMAIL> <PHONE> <NUM> plain"])}),
        str(tmp_path / "documents.parquet"))
    got = text_scrub_pii(str(tmp_path)).to_pandas()
    assert got["text"][0] == "<EMAIL> <PHONE> <NUM> plain"
