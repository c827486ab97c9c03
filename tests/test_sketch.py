"""HyperLogLog sketch kernel: estimator accuracy on known cardinalities and
the merge associativity the distributed fold relies on."""

from __future__ import annotations

import numpy as np


def test_hll_accuracy_known_cardinalities():
    from address_semantic_search_ray.stages.sketch import (
        estimate, fold_registers, register_updates)

    for n in (50, 500, 5000, 50000):
        regs, rhos = register_updates(np.arange(n, dtype=np.int64))
        e = estimate(fold_registers(regs, rhos))
        # standard error for m=256 is ~1.04/sqrt(256) = 6.5%; allow 3 sigma
        assert abs(e - n) / n < 0.2, (n, e)


def test_hll_merge_associative():
    # folding any partition of the updates then max-merging equals folding
    # all updates at once — the property that makes per-batch partials exact
    from address_semantic_search_ray.stages.sketch import (
        fold_registers, register_updates)

    ids = np.arange(3000, dtype=np.int64)
    regs, rhos = register_updates(ids)
    whole = fold_registers(regs, rhos)
    rng = np.random.RandomState(7)
    parts = rng.randint(0, 5, size=len(ids))
    merged = np.zeros_like(whole)
    for p in range(5):
        m = parts == p
        np.maximum(merged, fold_registers(regs[m], rhos[m]), out=merged)
    assert np.array_equal(whole, merged)


def test_hll_distinct_vs_duplicates():
    # duplicates never change the registers: 1000 distinct ids repeated 10x
    # fold to the same vector as one copy
    from address_semantic_search_ray.stages.sketch import (
        fold_registers, register_updates)

    once = np.arange(1000, dtype=np.int64)
    ten = np.tile(once, 10)
    r1, h1 = register_updates(once)
    r2, h2 = register_updates(ten)
    assert np.array_equal(fold_registers(r1, h1), fold_registers(r2, h2))


def test_cms_never_undercounts_and_merges():
    from address_semantic_search_ray.stages.sketch import cms_fold, cms_probe

    rng = np.random.RandomState(11)
    ids = rng.randint(0, 400, size=20000).astype(np.int64)
    whole = cms_fold(ids)
    # partition-merge == single fold (integer sums associate)
    parts = rng.randint(0, 7, size=len(ids))
    merged = np.zeros_like(whole)
    for p in range(7):
        merged += cms_fold(ids[parts == p])
    assert np.array_equal(whole, merged)
    distinct, true = np.unique(ids, return_counts=True)
    est = cms_probe(whole, distinct)
    assert (est >= true).all()          # CMS is an upper bound
    assert (est - true).mean() < 5      # and tight at this load factor


def test_cms_operator_matches_exact_counts(ray_session):
    # at sf0.001 the table is sparse enough that estimates are EXACT
    import duckdb

    from address_semantic_search_ray.pipelines.queries import (
        events_heavy_users_cms)

    got = events_heavy_users_cms("/root/testdata/sf0.001", min_count=5) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    con = duckdb.connect()
    want = con.execute(
        "SELECT user_id, count(*)::BIGINT AS n_est "
        "FROM '/root/testdata/sf0.001/events.parquet' "
        "GROUP BY user_id HAVING count(*) >= 5 ORDER BY user_id").df()
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert (got["n_est"].to_numpy() >= want["n_est"].to_numpy()).all()
