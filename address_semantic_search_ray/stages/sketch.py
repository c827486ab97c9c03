"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, the public HLL
recipe): the mergeable approximate-distinct primitive for when an exact
count (events_distinct_users_hourly's shape) is too wide — registers are a
fixed 2^p-byte summary regardless of cardinality, and merging is an
elementwise max, so partials combine associatively across any partitioning.

ONE kernel shared by the distributed operator and the naive oracle twin:
identical splitmix64 hashes, identical register folds, identical estimator
arithmetic — the driver gate then checks bit-equal estimates, not a
tolerance band. The twins fingerprint THIS file, so a kernel change
regenerates the cached oracle parquet.
"""

from __future__ import annotations

import math

import numpy as np

P = 8                       # 2^8 = 256 registers
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)   # alpha_256 (standard bias constant)


def hash64_array(ids) -> np.ndarray:
    """Vectorized splitmix64 finalizer (the public Steele/Vigna mix):
    deterministic pure uint64 arithmetic — stable across processes like a
    digest, ~100x faster than a per-row md5 loop. Overflow wraps mod 2^64
    by uint64 semantics (the point of the mix)."""
    with np.errstate(over="ignore"):
        x = np.asarray(ids, dtype=np.int64).view(np.uint64).copy()
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _bit_length(v: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length of a uint64 array (float log2 is lossy
    above 2^53, so shift-and-accumulate instead)."""
    bl = np.zeros(len(v), dtype=np.int64)
    r = v.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = r >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        r[m] >>= np.uint64(s)
    bl += (r > 0)
    return bl


def register_updates(ids) -> tuple[np.ndarray, np.ndarray]:
    """(register_index, rho) per id: low p bits pick the register, rho =
    1 + leading zeros of the remaining 64-p bits (capped at 64-p+1 when the
    suffix is all zeros — the rest==0 case falls out of bit_length 0)."""
    h = hash64_array(ids)
    regs = (h & np.uint64(M - 1)).astype(np.int64)
    rest = h >> np.uint64(P)
    width = 64 - P
    rhos = width - _bit_length(rest) + 1
    return regs, rhos.astype(np.int64)


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


# -- Bloom filter (Bloom 1970) ----------------------------------------------

BLOOM_BITS = 1 << 16         # 65,536 bits = 8 KB packed
BLOOM_K = 4                  # hash functions
_BLOOM_WORDS = BLOOM_BITS // 64


def bloom_positions(ids) -> np.ndarray:
    """(len(ids), BLOOM_K) bit positions — the j-th 16-bit slice of the
    splitmix64 hash (the ``cms_cells`` slicing; BLOOM_BITS = 2^16 makes
    each slice a full-range position). One mix per id, vectorized."""
    h = hash64_array(ids)
    out = np.empty((len(ids), BLOOM_K), dtype=np.int64)
    for j in range(BLOOM_K):
        out[:, j] = ((h >> np.uint64(16 * j))
                     & np.uint64(BLOOM_BITS - 1)).astype(np.int64)
    return out


def bloom_fold(ids) -> np.ndarray:
    """Packed uint64 bit array (length 1024 = 8 KB) with every id's K bits
    set. Bitwise OR is associative AND idempotent, so partial filters
    merged in any order — or folded over overlapping partitions — equal
    the single-pass filter bit-for-bit."""
    words = np.zeros(_BLOOM_WORDS, dtype=np.uint64)
    pos = bloom_positions(ids).ravel()
    np.bitwise_or.at(words, pos >> 6,
                     np.uint64(1) << (pos & 63).astype(np.uint64))
    return words


def bloom_probe(words: np.ndarray, ids) -> np.ndarray:
    """Membership per id: True iff all K bits are set. NO false negatives
    ever (an inserted id always probes True); false-positive rate is the
    classic (1 - e^(-K*n/m))^K."""
    pos = bloom_positions(ids)
    bits = (words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
    return bits.astype(bool).all(axis=1)


# -- Count-Min sketch (Cormode & Muthukrishnan 2005) -------------------------

CMS_W = 1024                 # cells per row
CMS_D = 4                    # hash rows


def cms_cells(ids) -> np.ndarray:
    """(len(ids), CMS_D) cell indices — row j uses the j-th 16-bit slice of
    the splitmix64 hash (independent-enough rows, one mix per id).
    Deterministic across processes, fully vectorized."""
    h = hash64_array(ids)
    out = np.empty((len(ids), CMS_D), dtype=np.int64)
    for j in range(CMS_D):
        out[:, j] = ((h >> np.uint64(16 * j))
                     & np.uint64(CMS_W - 1)).astype(np.int64)
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
