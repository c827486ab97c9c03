"""orders_shipping_priority (TPC-H Q3 shape) and events_running_total vs
plain-pandas recomputations."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def test_shipping_priority_matches_pandas(ray_session):
    from address_semantic_search_ray.pipelines.queries import (
        orders_shipping_priority,
    )

    got = orders_shipping_priority(SF_DIR).to_pandas().reset_index(drop=True)

    cust = pq.read_table(SF_DIR + "/customer.parquet").to_pandas()
    orders = pq.read_table(SF_DIR + "/orders.parquet").to_pandas()
    items = pq.read_table(SF_DIR + "/lineitem.parquet").to_pandas()
    cut = pd.Timestamp("1998-06-01")
    ck = set(cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"])
    o = orders[(orders["o_orderdate"] < cut) & orders["o_custkey"].isin(ck)]
    li = items[items["l_shipdate"] > cut].copy()
    li["rev"] = li["l_extendedprice"] * (1.0 - li["l_discount"])
    m = o.merge(li.groupby("l_orderkey", as_index=False)["rev"].sum(),
                left_on="o_orderkey", right_on="l_orderkey")
    m["revenue"] = m["rev"].round(2)
    m["o_orderdate_us"] = m["o_orderdate"].astype("datetime64[us]") \
        .astype("int64")
    want = (m.sort_values(["revenue", "o_orderdate_us", "o_orderkey"],
                          ascending=[False, True, True]).head(10)
            [["o_orderkey", "revenue", "o_orderdate_us", "o_orderpriority"]]
            .rename(columns={"o_orderkey": "l_orderkey"})
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)
    assert len(got) == 10


def test_running_total_matches_pandas(ray_session):
    from address_semantic_search_ray.pipelines.queries import (
        events_running_total,
    )

    key = lambda df: df.sort_values(["user_id", "seq"]).reset_index(drop=True)
    got = key(events_running_total(SF_DIR).to_pandas())

    ev = pq.read_table(SF_DIR + "/events.parquet").to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    grp = ev.groupby("user_id", sort=False)
    want = key(pd.DataFrame({
        "event_id": ev["event_id"].to_numpy(dtype=np.int64),
        "user_id": ev["user_id"].to_numpy(dtype=np.int64),
        "seq": (grp.cumcount() + 1).to_numpy(dtype=np.int64),
        "running_value": np.round(
            grp["value"].cumsum().to_numpy(dtype=np.float64), 6),
    }))
    assert len(got) == len(ev)
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def test_nation_market_share_matches_pandas(ray_session):
    from address_semantic_search_ray.pipelines.queries import (
        nation_market_share,
    )

    got = nation_market_share(SF_DIR).to_pandas() \
        .sort_values("o_year").reset_index(drop=True)

    cust = pq.read_table(SF_DIR + "/customer.parquet").to_pandas()
    nat = pq.read_table(SF_DIR + "/nation.parquet").to_pandas()
    reg = pq.read_table(SF_DIR + "/region.parquet").to_pandas()
    supp = pq.read_table(SF_DIR + "/supplier.parquet").to_pandas()
    part = pq.read_table(SF_DIR + "/part.parquet").to_pandas()
    orders = pq.read_table(SF_DIR + "/orders.parquet").to_pandas()
    items = pq.read_table(SF_DIR + "/lineitem.parquet").to_pandas()

    rk = set(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"])
    nk = set(nat.loc[nat["n_regionkey"].isin(rk), "n_nationkey"])
    ck = set(cust.loc[cust["c_nationkey"].isin(nk), "c_custkey"])
    pk = set(part.loc[part["p_type"] == "PROMO", "p_partkey"])
    sn = dict(zip(supp["s_suppkey"],
                  supp["s_nationkey"].map(
                      dict(zip(nat["n_nationkey"], nat["n_name"])))))

    li = items[items["l_partkey"].isin(pk)].copy()
    li["supp_nation"] = li["l_suppkey"].map(sn)
    li["vol"] = li["l_extendedprice"] * (1.0 - li["l_discount"])
    o = orders[orders["o_custkey"].isin(ck)].copy()
    o["o_year"] = o["o_orderdate"].dt.year.astype("int64")
    m = li.merge(o[["o_orderkey", "o_year"]],
                 left_on="l_orderkey", right_on="o_orderkey")
    den = m.groupby("o_year")["vol"].sum().round(2)
    num = m[m["supp_nation"] == "NATION_12"] \
        .groupby("o_year")["vol"].sum().round(2)
    want = (num.reindex(den.index, fill_value=0.0) / den).round(6)

    assert list(got["o_year"]) == list(want.index)
    assert np.allclose(got["mkt_share"].to_numpy(), want.to_numpy(),
                       atol=1e-9)
    assert (got["mkt_share"] > 0).any()


def test_local_supplier_volume_matches_pandas(ray_session):
    from address_semantic_search_ray.pipelines.queries import (
        local_supplier_volume,
    )

    got = local_supplier_volume(SF_DIR).to_pandas() \
        .sort_values("n_name").reset_index(drop=True)

    cust = pq.read_table(SF_DIR + "/customer.parquet").to_pandas()
    nat = pq.read_table(SF_DIR + "/nation.parquet").to_pandas()
    reg = pq.read_table(SF_DIR + "/region.parquet").to_pandas()
    supp = pq.read_table(SF_DIR + "/supplier.parquet").to_pandas()
    orders = pq.read_table(SF_DIR + "/orders.parquet").to_pandas()
    items = pq.read_table(SF_DIR + "/lineitem.parquet").to_pandas()

    rk = set(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"])
    nk = nat[nat["n_regionkey"].isin(rk)]
    o = orders[(orders["o_orderdate"] >= pd.Timestamp("1996-01-01"))
               & (orders["o_orderdate"] < pd.Timestamp("1997-01-01"))]
    m = (items.merge(o[["o_orderkey", "o_custkey"]],
                     left_on="l_orderkey", right_on="o_orderkey")
         .merge(cust[["c_custkey", "c_nationkey"]],
                left_on="o_custkey", right_on="c_custkey")
         .merge(supp[["s_suppkey", "s_nationkey"]],
                left_on="l_suppkey", right_on="s_suppkey"))
    m = m[(m["c_nationkey"] == m["s_nationkey"])
          & m["c_nationkey"].isin(set(nk["n_nationkey"]))]
    m["vol"] = m["l_extendedprice"] * (1.0 - m["l_discount"])
    want = (m.groupby("c_nationkey")["vol"].sum().round(2)
            .rename(index=dict(zip(nk["n_nationkey"], nk["n_name"])))
            .sort_index())

    assert list(got["n_name"]) == list(want.index)
    assert np.allclose(got["revenue"].to_numpy(), want.to_numpy(), atol=0.02)
    assert len(got) > 0


def test_supplier_revenue_top_matches_pandas(ray_session):
    from address_semantic_search_ray.pipelines.queries import (
        supplier_revenue_top,
    )

    got = supplier_revenue_top(SF_DIR).to_pandas().reset_index(drop=True)

    supp = pq.read_table(SF_DIR + "/supplier.parquet").to_pandas()
    items = pq.read_table(SF_DIR + "/lineitem.parquet").to_pandas()
    li = items[(items["l_shipdate"] >= pd.Timestamp("1996-01-01"))
               & (items["l_shipdate"] < pd.Timestamp("1996-04-01"))].copy()
    li["vol"] = li["l_extendedprice"] * (1.0 - li["l_discount"])
    rev = li.groupby("l_suppkey")["vol"].sum().round(2)
    top = rev[rev == rev.max()]

    assert list(got["s_suppkey"]) == sorted(top.index)
    assert np.allclose(got["total_revenue"].to_numpy(),
                       top.sort_index().to_numpy(), atol=0.02)
    names = dict(zip(supp["s_suppkey"], supp["s_name"]))
    assert list(got["s_name"]) == [names[k] for k in sorted(top.index)]
