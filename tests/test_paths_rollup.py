"""events_user_paths (consecutive event-type transition counts) and
orders_rollup (multi-level aggregate), each checked against an independent
pandas recomputation over the raw parquet."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from tests.conftest import SF_SMALL


def test_user_paths_matches_pandas_lag(ray_session):
    from address_semantic_search_ray.pipelines import queries as q

    got = (q.events_user_paths(SF_SMALL).to_pandas()
           .sort_values(["from_type", "to_type"]).reset_index(drop=True))

    ev = pq.read_table(f"{SF_SMALL}/events.parquet",
                       columns=["user_id", "ts", "event_id",
                                "event_type"]).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="stable")
    prev = ev.groupby("user_id")["event_type"].shift()
    pairs = pd.DataFrame({"from_type": prev, "to_type": ev["event_type"]}) \
        .dropna()
    want = (pairs.groupby(["from_type", "to_type"], as_index=False)
            .agg(n=("to_type", "size"))
            .sort_values(["from_type", "to_type"]).reset_index(drop=True))
    assert len(got) == len(want) > 0
    assert (got["from_type"] == want["from_type"]).all()
    assert (got["to_type"] == want["to_type"]).all()
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    # transition total == events minus one per multi-event user
    n_users_multi = (ev.groupby("user_id").size() > 1).sum()
    singles = (ev.groupby("user_id").size() == 1).sum()
    assert got["n"].sum() == len(ev) - n_users_multi - singles


def test_orders_rollup_levels(ray_session):
    from address_semantic_search_ray.pipelines import queries as q

    got = q.orders_rollup(SF_SMALL).to_pandas()

    orders = pq.read_table(f"{SF_SMALL}/orders.parquet",
                           columns=["o_orderdate", "o_orderpriority",
                                    "o_totalprice"]).to_pandas()
    orders["year"] = orders["o_orderdate"].dt.strftime("%Y")
    base = (orders.groupby(["year", "o_orderpriority"], as_index=False)
            .agg(n=("o_totalprice", "size"), revenue=("o_totalprice", "sum")))

    fine = got[(got["year"] != "ALL") & (got["priority"] != "ALL")]
    assert len(fine) == len(base)
    m = fine.merge(base, left_on=["year", "priority"],
                   right_on=["year", "o_orderpriority"])
    assert len(m) == len(base)
    assert (m["n_x"].to_numpy() == m["n_y"].to_numpy()).all()
    assert np.allclose(m["revenue_x"], m["revenue_y"].round(2))

    total = got[(got["year"] == "ALL") & (got["priority"] == "ALL")]
    assert len(total) == 1
    assert int(total["n"].iloc[0]) == len(orders)
    # per-year level sums match and every level is internally consistent
    per_year = got[(got["year"] != "ALL") & (got["priority"] == "ALL")]
    assert per_year["n"].sum() == len(orders)
    assert fine["n"].sum() == len(orders)


def test_cdc_compact_matches_pandas(ray_session):
    from address_semantic_search_ray.pipelines.queries import (
        events_cdc_compact,
    )

    got = events_cdc_compact(SF_SMALL).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)

    ev = pq.read_table(SF_SMALL + "/events.parquet").to_pandas()
    ev["last_ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    want = (ev.sort_values(["user_id", "last_ts_us", "event_id"],
                           kind="mergesort")
            .groupby("user_id", sort=True).tail(1)
            .sort_values("user_id").reset_index(drop=True))

    assert len(got) == ev["user_id"].nunique()
    assert (got["user_id"].to_numpy()
            == want["user_id"].to_numpy(dtype=np.int64)).all()
    assert (got["last_ts_us"].to_numpy()
            == want["last_ts_us"].to_numpy()).all()
    assert (got["last_event_id"].to_numpy()
            == want["event_id"].to_numpy(dtype=np.int64)).all()
    assert list(got["last_event_type"]) == list(want["event_type"])
    assert np.allclose(got["last_value"].to_numpy(),
                       want["value"].to_numpy(), atol=1e-12)
