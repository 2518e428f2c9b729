"""Sketch sizing math (O1 in SURVEY §2.1).

Bloom sizing uses the *standard* formula m = -n·ln(p)/ln²2, k = m/n·ln2
(the variant at /root/reference/fbloom/external/bloom_filters.h:44-52 and
gloom_clean.h:121-126).  The reference's ln(2)^4 oversizing
(bloom.h:235-238) and the k = log2(n) bug (gloom.h:338-341) are documented
reference quirks we deliberately do NOT replicate (SURVEY §2.2).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

__all__ = ["BloomParams", "fpp_bound"]


@dataclass(frozen=True)
class BloomParams:
    """Derived Bloom geometry: ``m_bits`` (64-bit aligned), ``k`` hashes."""

    n: int
    p: float
    m_bits: int
    k: int

    @staticmethod
    def from_np(n: int, p: float) -> "BloomParams":
        """Standard sizing with the reference's rounding conventions:
        bits floored at 64 and aligned up to 64-bit words
        (semantics of bloom.h:239-242 / gloom.h:243-247); degenerate
        inputs (n<=0 or p outside (0,1)) fall back to 8192 bits, the
        reference's 1024-byte fallback (bloom.h:231-233)."""
        if n <= 0 or not (0.0 < p < 1.0):
            return BloomParams(max(n, 0), p, 8192, 6)
        m = math.ceil(-n * math.log(p) / (math.log(2) ** 2))
        m = max(64, ((m + 63) // 64) * 64)
        k = max(1, round(m / n * math.log(2)))
        return BloomParams(n, p, m, k)

    @property
    def n_words(self) -> int:
        return self.m_bits // 64

    @property
    def bits_per_item(self) -> float:
        return self.m_bits / max(1, self.n)

    def fpp_bound(self, n_inserted: int | None = None) -> float:
        """Published bound (1 - e^{-kn/m})^k for the actual insert count."""
        n = self.n if n_inserted is None else n_inserted
        return fpp_bound(self.m_bits, self.k, n)


def fpp_bound(m_bits: int, k: int, n: int) -> float:
    if n <= 0:
        return 0.0
    return (1.0 - math.exp(-k * n / m_bits)) ** k
