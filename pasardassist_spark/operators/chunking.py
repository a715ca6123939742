"""Content-defined chunking (FastCDC, Xia et al. 2016) — byte-level
chunk boundaries from a gear rolling hash, so INSERTIONS SHIFT OFFSETS
BUT NOT BOUNDARIES: two documents sharing a long byte run produce
identical chunks inside the shared span no matter where it sits in each
file.  This is the dedup-storage / partial-duplicate-detection primitive
fixed-size blocking cannot provide (one inserted byte re-frames every
downstream fixed block; CDC resynchronizes within a window).

Gear hash: ``h_i = (h_{i-1} << 1) + gear[b_i]  (mod 2^64)`` over a
256-entry seeded random table.  The ``<<1`` ages a byte out of the low
``B`` bits after ``B`` steps, so ``h_i & mask`` depends on only the last
``mask_bits`` bytes — which both makes the boundary decision windowed
(the resynchronization property) and lets the candidate scan vectorize:
``h & mask = (sum_{j<B} gear[b_(i-j)] << j) & mask`` needs just B ~ 13
shifted numpy adds per payload batch, not a per-byte Python loop.

FastCDC normalization (§3.4): chunks in [MIN, MAX] bytes around AVG,
judged by a HARDER mask before AVG and an easier one after — tightening
the size distribution around AVG without the cut-point-skipping cost of
plain min/max clamping.  Cut forced at MAX.

The per-doc walk over candidate positions is a loop over the SPARSE
candidate arrays (numpy searchsorted per cut, ~n_chunks iterations),
never per byte.  Spark-side the chunker is a mapInPandas batch map; the
cross-document duplicate detection is one hash-shuffle on chunk digest —
the partition key a dedup store uses at any scale.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np

__all__ = [
    "CDC_MIN", "CDC_AVG", "CDC_MAX",
    "cdc_chunks", "cdc_chunks_reference", "gear_table",
]

# Sized for document-scale payloads (this corpus' docs are a few hundred
# bytes; a storage deduper over multi-MB blobs would run 2-8 KiB AVG —
# the policy is identical, only the three knobs move).
CDC_MIN = 8
CDC_AVG = 32
CDC_MAX = 128
_GEAR_SEED = 13
# normalization level 2 around AVG=32 (5 bits): 7-bit mask before the
# average point, 3-bit after
_MASK_S = (1 << 7) - 1
_MASK_L = (1 << 3) - 1
_MASK_BITS = 7  # shifts >= this cannot influence (h & mask_s)


def gear_table(seed: int = _GEAR_SEED) -> np.ndarray:
    rng = random.Random(seed)
    return np.array(
        [rng.getrandbits(64) for _ in range(256)], dtype=np.uint64
    )


_GEAR = gear_table()


def _windowed_hash(data: bytes) -> np.ndarray:
    """h_i & 0x3FF-equivalent low bits for every position: the gear
    recurrence truncated to the bits any mask can see (see module
    docstring) — B shifted adds, fully vectorized."""
    arr = np.frombuffer(data, dtype=np.uint8)
    g = _GEAR[arr]
    h = np.zeros(len(arr), dtype=np.uint64)
    for j in range(_MASK_BITS):
        if j == 0:
            h += g
        else:
            h[j:] += g[:-j] << np.uint64(j)
    return h


def cdc_chunks(data: bytes) -> list[tuple[int, int, str]]:
    """FastCDC chunk list [(start, length, md5hex)] covering ``data``
    exactly (concatenation reconstructs the input)."""
    n = len(data)
    if n == 0:
        return []
    h = _windowed_hash(data)
    cand_s = np.flatnonzero((h & np.uint64(_MASK_S)) == 0)
    cand_l = np.flatnonzero((h & np.uint64(_MASK_L)) == 0)
    out: list[tuple[int, int, str]] = []
    s = 0
    while s < n:
        if n - s <= CDC_MIN:
            cut = n
        else:
            cut = None
            # harder mask in (s+MIN, s+AVG)
            lo, hi = s + CDC_MIN, min(s + CDC_AVG, n)
            i = np.searchsorted(cand_s, lo)
            if i < len(cand_s) and cand_s[i] < hi:
                cut = int(cand_s[i]) + 1
            if cut is None:
                # easier mask in [s+AVG, s+MAX)
                lo2, hi2 = min(s + CDC_AVG, n), min(s + CDC_MAX, n)
                j = np.searchsorted(cand_l, lo2)
                if j < len(cand_l) and cand_l[j] < hi2:
                    cut = int(cand_l[j]) + 1
            if cut is None:
                cut = min(s + CDC_MAX, n)
        chunk = data[s:cut]
        out.append((s, len(chunk), hashlib.md5(chunk).hexdigest()))
        s = cut
    return out


def cdc_chunks_reference(data: bytes) -> list[tuple[int, int, str]]:
    """Byte-at-a-time sequential reference of the SAME policy (the
    published FastCDC control flow) — the oracle the vectorized form is
    pytest-pinned against."""
    n = len(data)
    out: list[tuple[int, int, str]] = []
    s = 0
    while s < n:
        if n - s <= CDC_MIN:
            cut = n
        else:
            cut = None
            hh = 0
            end = min(s + CDC_MAX, n)
            for i in range(s, end):
                hh = ((hh << 1) + int(_GEAR[data[i]])) & 0xFFFFFFFFFFFFFFFF
                if i < s + CDC_MIN:
                    continue
                if i < s + CDC_AVG:
                    if hh & _MASK_S == 0:
                        cut = i + 1
                        break
                elif hh & _MASK_L == 0:
                    cut = i + 1
                    break
            if cut is None:
                cut = end
        chunk = data[s:cut]
        out.append((s, len(chunk), hashlib.md5(chunk).hexdigest()))
        s = cut
    return out
