"""HyperBall register kernels (dependency-free so Ray workers can unpickle
closures that reference them without touching the similarity<->graph import
cycle).  Layout follows sketches.py's HLL conventions shrunk to p=6: md5
hash, low 6 bits pick one of 64 registers, leading-zero rank of the
remaining 58 bits + 1 is the value.  Estimates use an exact-integer scaled
denominator (each register of rank r contributes 2**(59-r); untouched
registers contribute 2**59) so the double division sees bit-identical
operands in the Ray kernels and the DuckDB oracle."""

from __future__ import annotations

import hashlib
import math

import numpy as np

HB_P = 6
HB_M = 1 << HB_P           # 64 registers
HB_RANK_BITS = 64 - HB_P   # 58 significant hash bits -> rank in 1..59
HB_SCALE = HB_RANK_BITS + 1  # exponent scale for the exact denominator


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


HB_ALPHA_MM_SCALED = _alpha(HB_M) * HB_M * HB_M * float(1 << HB_SCALE)

#: linear-counting lookup m*ln(m/zeros), pre-rounded here and embedded
#: verbatim in the SQL oracle's CASE so the small-range branch cannot
#: diverge on libm ln() last bits.
HB_LINCOUNT = {
    z: int(math.floor(HB_M * math.log(HB_M / z) + 0.5))
    for z in range(1, HB_M)
}


def hb_seed(vec_ids: "np.ndarray") -> "np.ndarray":
    """(n, 64) uint8 register planes for the singleton balls {v}."""
    regs = np.zeros((len(vec_ids), HB_M), dtype=np.uint8)
    for i, v in enumerate(vec_ids):
        h = int.from_bytes(hashlib.md5(str(int(v)).encode()).digest()[:8], "big")
        rest = h >> HB_P
        regs[i, h & (HB_M - 1)] = HB_RANK_BITS - rest.bit_length() + 1
    return regs


def hb_estimates(regs: "np.ndarray") -> "np.ndarray":
    """Per-row HLL estimate of an (n, 64) register matrix: vectorized
    per-row rank histogram, then a <=60-term exact-integer fold per node
    (node-proportional, never corpus-proportional).  Rounding is
    floor(e + 0.5) to match the oracle's floor() verbatim."""
    n = len(regs)
    hist = np.zeros((n, HB_SCALE + 1), dtype=np.int64)
    np.add.at(
        hist,
        (np.repeat(np.arange(n), HB_M), regs.reshape(-1).astype(np.int64)),
        1,
    )
    pows = [1 << (HB_SCALE - r) for r in range(HB_SCALE + 1)]
    lin_cut = 2.5 * HB_M
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        row = hist[i]
        zeros = int(row[0])
        denom = 0
        for r in range(HB_SCALE + 1):
            c = row[r]
            if c:
                denom += int(c) * pows[r]
        e = HB_ALPHA_MM_SCALED / float(denom)
        if e <= lin_cut and zeros > 0:
            out[i] = HB_LINCOUNT[zeros]
        else:
            out[i] = int(math.floor(e + 0.5))
    return out
