"""Sketch ESTIMATOR properties against independent ground truth.

The driver oracles for events_approx_users_hll / events_heavy_users_cms
share the sketch kernel with the pipeline (disclosed in pipelines/naive.py)
— they verify the distributed merge, not the estimator. These tests close
that seam: HLL estimates are checked against exact distinct counts within
the published theoretical error bound, and CMS point estimates against the
never-undercount invariant, on seeded random streams the kernel never saw.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from address_semantic_search_ray.stages.sketch import (CMS_D, CMS_W, M,
                                                       cms_fold, cms_probe,
                                                       estimate,
                                                       fold_registers,
                                                       register_updates)


def _hll_estimate(ids) -> float:
    regs, rhos = register_updates(np.asarray(ids, dtype=np.int64))
    return estimate(fold_registers(regs, rhos))


def test_hll_within_theoretical_error_bounds():
    """Standard error of HLL with m=256 registers is 1.04/sqrt(256) = 6.5%.
    Seeded streams at several cardinalities (duplicates included) must land
    within 4 sigma = 26% relative error — far inside the bound for a
    correct estimator, far outside what a broken one achieves."""
    rng = np.random.default_rng(42)
    for n_distinct in (60, 500, 5_000, 60_000, 300_000):
        distinct = rng.choice(np.arange(10 * n_distinct, dtype=np.int64),
                              size=n_distinct, replace=False)
        # stream with duplicates: each id appears 1-4 times
        stream = np.repeat(distinct, rng.integers(1, 5, size=n_distinct))
        est = _hll_estimate(stream)
        rel = abs(est - n_distinct) / n_distinct
        assert rel < 4 * 1.04 / np.sqrt(M), (n_distinct, est, rel)


def test_hll_duplicate_invariance():
    """Registers fold by max, so an estimate is a pure function of the
    DISTINCT id set — any duplication pattern gives the identical float."""
    rng = np.random.default_rng(7)
    distinct = rng.integers(-2**62, 2**62, size=1000, dtype=np.int64)
    dup3 = np.repeat(distinct, 3)
    shuffled = distinct.copy()
    rng.shuffle(shuffled)
    assert _hll_estimate(distinct) == _hll_estimate(dup3) \
        == _hll_estimate(shuffled)


def test_cms_never_undercounts_uniform_and_zipf():
    """The CMS min-over-rows point estimate is an upper bound on the true
    count, ALWAYS (deterministic guarantee, not probabilistic) — checked on
    a uniform stream and on a heavily skewed zipf stream where collisions
    are guaranteed (20k distinct ids >> 1024 cells/row)."""
    rng = np.random.default_rng(3)
    streams = [
        rng.integers(0, 20_000, size=100_000, dtype=np.int64),
        rng.zipf(1.3, size=100_000).astype(np.int64),
    ]
    for stream in streams:
        table = cms_fold(stream)
        true = Counter(stream.tolist())
        ids = np.fromiter(true.keys(), dtype=np.int64, count=len(true))
        est = cms_probe(table, ids)
        exact = np.fromiter((true[int(i)] for i in ids), dtype=np.int64,
                            count=len(ids))
        assert (est >= exact).all()
        # sanity: the total guarantee est <= true + eps*N holds on average
        # (eps = e/CMS_W); assert the MEAN overshoot is inside 4x that band
        overshoot = (est - exact).mean()
        assert overshoot <= 4 * np.e / CMS_W * len(stream)


def test_cms_exact_when_collision_free():
    """With far fewer distinct ids than cells, min-over-rows is exact with
    overwhelming probability; allow zero failures on this seeded stream."""
    rng = np.random.default_rng(11)
    ids = rng.choice(np.arange(10_000, dtype=np.int64), size=20,
                     replace=False)
    stream = np.repeat(ids, rng.integers(1, 50, size=len(ids)))
    table = cms_fold(stream)
    true = np.fromiter((np.count_nonzero(stream == i) for i in ids),
                       dtype=np.int64, count=len(ids))
    assert (cms_probe(table, ids) == true).all()


@settings(max_examples=150, deadline=None)
@given(ids=st.lists(st.integers(min_value=-2**63, max_value=2**63 - 1),
                    min_size=0, max_size=200),
       split=st.integers(min_value=0, max_value=200))
def test_merge_equals_single_pass(ids, split):
    """Partition-invariance, the property the distributed operators lean on:
    HLL registers merged by elementwise max and CMS tables merged by sum
    across ANY split equal the single-pass fold; probes never undercount."""
    arr = np.asarray(ids, dtype=np.int64)
    split = min(split, len(arr))
    a, b = arr[:split], arr[split:]

    regs, rhos = register_updates(arr)
    whole = fold_registers(regs, rhos)
    ra, pa_ = register_updates(a)
    rb, pb = register_updates(b)
    merged = np.maximum(fold_registers(ra, pa_), fold_registers(rb, pb))
    assert (whole == merged).all()

    t_whole = cms_fold(arr)
    t_merged = cms_fold(a) + cms_fold(b)
    assert (t_whole == t_merged).all()
    assert t_whole.shape == (CMS_D, CMS_W)
    if len(arr):
        uniq = np.unique(arr)
        true = np.fromiter((np.count_nonzero(arr == u) for u in uniq),
                           dtype=np.int64, count=len(uniq))
        assert (cms_probe(t_whole, uniq) >= true).all()


def test_bloom_no_false_negatives_and_fp_bound():
    """An inserted id ALWAYS probes True (the Bloom guarantee the unseen-
    users operator leans on: False == certain absence); the false-positive
    rate on fresh ids stays within 3x the classic (1-e^(-Kn/m))^K bound."""
    from address_semantic_search_ray.stages.sketch import (BLOOM_BITS,
                                                           BLOOM_K,
                                                           bloom_fold,
                                                           bloom_probe)

    rng = np.random.default_rng(13)
    for n in (10, 500, 5_000):
        pool = rng.choice(np.arange(10**7, dtype=np.int64), size=2 * n,
                          replace=False)
        inserted, fresh = pool[:n], pool[n:]
        words = bloom_fold(inserted)
        assert bloom_probe(words, inserted).all()          # no false negatives
        fp = float(bloom_probe(words, fresh).mean())
        bound = (1 - np.exp(-BLOOM_K * n / BLOOM_BITS)) ** BLOOM_K
        assert fp <= 3 * bound + 0.002, (n, fp, bound)


@settings(max_examples=150, deadline=None)
@given(ids=st.lists(st.integers(min_value=-2**63, max_value=2**63 - 1),
                    min_size=0, max_size=200),
       split=st.integers(min_value=0, max_value=200))
def test_bloom_merge_is_or_and_idempotent(ids, split):
    """OR-merge across any split equals the single-pass fold, and folding
    duplicated input changes nothing — the two properties that make the
    filter safe under retries and arbitrary partitioning."""
    from address_semantic_search_ray.stages.sketch import bloom_fold

    arr = np.asarray(ids, dtype=np.int64)
    split = min(split, len(arr))
    whole = bloom_fold(arr)
    merged = bloom_fold(arr[:split]) | bloom_fold(arr[split:])
    assert (whole == merged).all()
    assert (bloom_fold(np.concatenate([arr, arr])) == whole).all()
