"""events_value_p95_hourly (exact per-window value percentiles) and
docs_bigram_lm (corpus bigram LM quality score), each checked against an
independent single-process recomputation over the raw parquet."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMALL


def test_value_p95_matches_quantile_disc_rule(ray_session):
    from address_semantic_search_ray.pipelines import queries as q

    got = (q.events_value_p95_hourly(SF_SMALL).to_pandas()
           .sort_values(["event_type", "hour"]).reset_index(drop=True))

    ev = pq.read_table(f"{SF_SMALL}/events.parquet",
                       columns=["event_type", "ts", "value"]).to_pandas()
    ev["hour"] = ev["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:00:00")
    rows = []
    for (et, hour), sub in ev.groupby(["event_type", "hour"]):
        vals = np.sort(sub["value"].to_numpy())
        n = len(vals)
        rows.append({"event_type": et, "hour": hour, "n": n,
                     "p50": vals[max(1, math.ceil(0.5 * n)) - 1],
                     "p95": vals[max(1, math.ceil(0.95 * n)) - 1]})
    want = (pd.DataFrame(rows).sort_values(["event_type", "hour"])
            .reset_index(drop=True))
    assert len(got) == len(want) > 0
    assert (got["event_type"] == want["event_type"]).all()
    assert (got["hour"] == want["hour"]).all()
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    # quantile_disc picks an actual data value: bit-exact, no tolerance
    assert (got["p50"].to_numpy() == want["p50"].to_numpy()).all()
    assert (got["p95"].to_numpy() == want["p95"].to_numpy()).all()


def test_bigram_lm_matches_dict_model(ray_session):
    from address_semantic_search_ray.pipelines import queries as q

    got = q.docs_bigram_lm(SF_SMALL).to_pandas()
    got_s = dict(zip(got["doc_id"], got["lm_score"]))
    got_n = dict(zip(got["doc_id"], got["n_bigrams"]))

    docs = pq.read_table(f"{SF_SMALL}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    bgc: dict = {}
    unic: dict = {}
    seqs = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        ws = text.split(" ")
        pairs = list(zip(ws, ws[1:]))
        seqs[did] = pairs
        for p in pairs:
            bgc[p] = bgc.get(p, 0) + 1
            unic[p[0]] = unic.get(p[0], 0) + 1
    n_checked = 0
    for did, pairs in seqs.items():
        if not pairs:
            assert did not in got_s
            continue
        score = sum(math.log(bgc[p]) - math.log(unic[p[0]])
                    for p in pairs) / len(pairs)
        assert got_n[did] == len(pairs)
        assert got_s[did] == pytest.approx(score, abs=2e-6)
        n_checked += 1
    assert n_checked == len(got) > 0
    # a corpus-trained LM never sees an unseen bigram: all probs <= 1
    assert (got["lm_score"] <= 0.0).all()
