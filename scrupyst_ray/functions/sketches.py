"""Mergeable quantile sketch — the scale path for per-group quantiles.

Exact per-group quantiles (``pipelines/textstats.py::doc_length_quantiles``)
need the whole group on one worker.  This HDR-histogram-style sketch gives
bounded-relative-error quantiles for positive-int values with a fixed-size,
ADDITIVE state — per-batch partial histograms combine by summation, so it
composes with ``groupby().sum()`` at any group size and any partitioning
(merge order is irrelevant: integer addition commutes).

Bucket layout (HdrHistogram / DDSketch-style, pure integer semantics so
every worker bins identically): for v ≥ 1 with ``e = floor(log2(v))``, the
bucket is ``e`` (exponent) plus the top ``SUB_BITS`` mantissa bits —
relative bucket width ≤ 2^-SUB_BITS (≈3.1% at the default 5 bits).  The
quantile estimate is the LOWER BOUND of the bucket holding the q-th value
(rank = ceil(q·n), matching ``quantile_disc``), so estimates are
deterministic and underestimate by at most one bucket width.
"""

from __future__ import annotations

import numpy as np

SUB_BITS = 5
_SUB = 1 << SUB_BITS


def bucket_of(values: np.ndarray) -> np.ndarray:
    """Vectorized bucket index for positive int64 values (v ≥ 1)."""
    v = values.astype(np.uint64)
    if (v < 1).any():
        raise ValueError("sketch values must be ≥ 1")
    # exponent = bit_length - 1, via float64 frexp (exact for v < 2^53)
    e = (np.frexp(v.astype(np.float64))[1] - 1).astype(np.int64)
    shift = np.maximum(e - SUB_BITS, 0)
    sub = ((v >> shift.astype(np.uint64)) & np.uint64(_SUB - 1)).astype(np.int64)
    # exponents below SUB_BITS don't fill all mantissa bits; their raw value
    # IS the bucket (buckets 1..2^SUB_BITS map 1:1 — exact for small values)
    return np.where(e < SUB_BITS, v.astype(np.int64), e * _SUB + sub)


def bucket_lower_bound(idx: np.ndarray) -> np.ndarray:
    """Smallest value that maps to bucket *idx* (the quantile estimate)."""
    idx = np.asarray(idx, dtype=np.int64)
    e = idx // _SUB
    sub = idx % _SUB
    big = (np.int64(1) << e.clip(min=0)) + (sub << np.maximum(e - SUB_BITS, 0))
    # exact region: values < 2^SUB_BITS map to bucket == value, and their
    # indices (< SUB_BITS·2^SUB_BITS) never collide with the e·2^SUB_BITS+sub
    # layout (whose smallest index is exactly SUB_BITS·2^SUB_BITS)
    return np.where(idx < SUB_BITS * _SUB, idx, big)


def quantiles_from_hist(
    buckets: np.ndarray, counts: np.ndarray, qs: list[float]
) -> list[int]:
    """Quantile estimates from a (bucket, count) histogram: the lower bound
    of the bucket containing rank ceil(q·n) (``quantile_disc`` rank rule)."""
    order = np.argsort(buckets)
    b = np.asarray(buckets)[order]
    c = np.asarray(counts)[order]
    cum = np.cumsum(c)
    n = int(cum[-1])
    out = []
    for q in qs:
        rank = max(1, int(np.ceil(q * n)))
        i = int(np.searchsorted(cum, rank))
        out.append(int(bucket_lower_bound(np.array([b[i]]))[0]))
    return out


# -- HyperLogLog distinct-count sketch ----------------------------------------
#
# Same additive-state philosophy as the histogram above, for COUNT(DISTINCT):
# per-batch partial registers combine by elementwise MAX (commutative,
# idempotent — merge order and duplicate partials are both irrelevant), so
# the sketch composes with groupby().max() at any group size.  Standard
# HLL with the small-range linear-counting correction; p=12 → 4096 registers
# ≈ 1.6% standard error and 4 KB of state per group.

HLL_P = 12
HLL_M = 1 << HLL_P
_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)  # bias constant for m ≥ 128


def hll_partial(hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sparse HLL registers for a batch of uint64 hashes:
    (register_idx, rho) with rho = 1 + leading-zeros of the remaining bits
    (only the max rho per register is returned — the mergeable partial)."""
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # leading zeros of rest via float64 log2 is unsafe; use bit_length trick
    # on the complemented shift: rho = 64 - p - bit_length(rest >> p ... )
    # numpy has no clz — frexp gives the exponent (exact, rest ≥ 2^p > 2^53
    # concern avoided by masking to the top 53 bits first)
    top = (rest >> np.uint64(11)).astype(np.float64)  # 53 significant bits
    exp = np.frexp(top)[1].astype(np.int64)  # bit_length of (rest >> 11)
    rho = (64 - 11) - exp + 1
    order = np.lexsort((-rho, idx))
    idx_s, rho_s = idx[order], rho[order]
    first = np.concatenate(([True], idx_s[1:] != idx_s[:-1]))
    return idx_s[first], rho_s[first]


def hll_estimate(idx: np.ndarray, rho: np.ndarray) -> int:
    """Cardinality estimate from merged sparse registers (absent = 0)."""
    reg = np.zeros(HLL_M, dtype=np.int64)
    reg[np.asarray(idx, dtype=np.int64)] = np.asarray(rho, dtype=np.int64)
    est = _ALPHA * HLL_M * HLL_M / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * HLL_M and zeros:
        est = HLL_M * np.log(HLL_M / zeros)  # linear counting
    return int(round(est))
