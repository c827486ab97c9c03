"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, the public HLL
recipe): the mergeable approximate-distinct primitive for when an exact
count (events_distinct_users_hourly's shape) is too wide — registers are a
fixed 2^p-byte summary regardless of cardinality, and merging is an
elementwise max, so partials combine associatively across any partitioning.

ONE kernel shared by the distributed operator and the naive oracle twin:
identical md5-derived hashes, identical register folds, identical estimator
arithmetic — the driver gate then checks bit-equal estimates, not a
tolerance band.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

P = 8                       # 2^8 = 256 registers
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)   # alpha_256 (standard bias constant)


def hash64(value: int) -> int:
    """Deterministic 64-bit hash of an integer id (md5 head — stable across
    processes, unlike builtin hash)."""
    return int.from_bytes(
        hashlib.md5(str(int(value)).encode()).digest()[:8], "big")


def register_updates(ids) -> tuple[np.ndarray, np.ndarray]:
    """(register_index, rho) per id: low p bits pick the register, rho =
    1 + leading zeros of the remaining 64-p bits (capped at 64-p+1 when the
    suffix is all zeros)."""
    regs = np.empty(len(ids), dtype=np.int64)
    rhos = np.empty(len(ids), dtype=np.int64)
    width = 64 - P
    for i, v in enumerate(ids):
        h = hash64(v)
        regs[i] = h & (M - 1)
        rest = h >> P
        rhos[i] = (width - rest.bit_length() + 1) if rest else (width + 1)
    return regs, rhos


def fold_registers(regs: np.ndarray, rhos: np.ndarray) -> np.ndarray:
    """Dense length-M register vector: elementwise max of the updates."""
    out = np.zeros(M, dtype=np.int64)
    np.maximum.at(out, regs, rhos)
    return out


def estimate(registers: np.ndarray) -> float:
    """The standard HLL estimator with the small-range linear-counting
    correction; pure function of the register vector, so both sides of the
    gate compute the identical float64."""
    inv = float(np.sum(np.exp2(-registers.astype(np.float64))))
    e = _ALPHA * M * M / inv
    zeros = int(np.count_nonzero(registers == 0))
    if e <= 2.5 * M and zeros:
        e = M * math.log(M / zeros)
    return e


# -- Count-Min sketch (Cormode & Muthukrishnan 2005) -------------------------

CMS_W = 1024                 # cells per row
CMS_D = 4                    # hash rows


def cms_cells(ids) -> np.ndarray:
    """(len(ids), CMS_D) cell indices — row j uses the j-th 16-bit slice of
    the md5-derived 64-bit hash (independent-enough rows, one digest per
    id). Deterministic across processes."""
    out = np.empty((len(ids), CMS_D), dtype=np.int64)
    for i, v in enumerate(ids):
        h = hash64(v)
        for j in range(CMS_D):
            out[i, j] = (h >> (16 * j)) & (CMS_W - 1)
    return out


def cms_fold(ids) -> np.ndarray:
    """Dense (CMS_D, CMS_W) int64 count table for one batch of ids.
    Integer addition is associative, so partial tables merged in ANY order
    equal the single-pass fold — the distributed operator and the naive
    twin are bit-identical by construction."""
    table = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    cells = cms_cells(ids)
    for j in range(CMS_D):
        np.add.at(table[j], cells[:, j], 1)
    return table


def cms_probe(table: np.ndarray, ids) -> np.ndarray:
    """Point estimate per id: min over rows (the classic CMS upper bound —
    exact when no collisions, never an undercount)."""
    cells = cms_cells(ids)
    ests = np.empty((len(ids), CMS_D), dtype=np.int64)
    for j in range(CMS_D):
        ests[:, j] = table[j][cells[:, j]]
    return ests.min(axis=1)
