"""KLL quantile sketch as a mergeable, vectorized sketch.

No reference counterpart — mandated by BASELINE.json:6,14; background in
PAPERS.md (Karnin, Lang, Liberty 2016, "Optimal Quantile Approximation in
Streams"). Compactor hierarchy: level l holds items of weight 2^l; when a
level overflows its capacity k*(2/3)^(H-l) it is sorted and every other
item is promoted to level l+1.

Determinism: the odd/even selection during compaction alternates via a
per-level counter carried in the state (instead of a random coin), so the
same input in the same partition order reproduces byte-identical states —
SURVEY §7 risk register ("make compaction deterministic").  Merge is
therefore associative/commutative *up to rank-error equivalence*, which is
what the property tests assert for KLL (byte equality is order-dependent
by construction for any compacting sketch).

Rank error: eps ~ O(1/k * sqrt(log(n/k))) per the KLL paper; with k=200 the
practical bound asserted in tests is ~1.5% rank error.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .protocol import pack_state, unpack_state

__all__ = ["KllState", "Kll", "KLL"]

_C = 2.0 / 3.0


@dataclass
class KllState:
    k: int
    compactors: list[np.ndarray] = field(default_factory=list)  # float64 arrays
    parities: list[int] = field(default_factory=list)  # deterministic coin per level
    n: int = 0

    @property
    def size(self) -> int:
        return sum(len(c) for c in self.compactors)


class Kll:
    name = "kll"

    def create(self, k: int = 200) -> KllState:
        st = KllState(k)
        st.compactors.append(np.zeros(0, np.float64))
        st.parities.append(0)
        return st

    def _capacity(self, state: KllState, level: int) -> int:
        height = len(state.compactors) - 1
        return max(2, int(np.ceil(state.k * (_C ** (height - level)))))

    def _grow(self, state: KllState) -> None:
        state.compactors.append(np.zeros(0, np.float64))
        state.parities.append(0)

    def _total_capacity(self, state: KllState) -> int:
        return sum(self._capacity(state, l) for l in range(len(state.compactors)))

    def _compress(self, state: KllState) -> None:
        while state.size > self._total_capacity(state):
            for level in range(len(state.compactors)):
                if len(state.compactors[level]) > self._capacity(state, level):
                    if level + 1 == len(state.compactors):
                        self._grow(state)
                    vals = np.sort(state.compactors[level])
                    start = state.parities[level] & 1
                    state.parities[level] += 1
                    promoted = vals[start::2]
                    # keep nothing at this level (full compaction), promote
                    # every other item with doubled implicit weight
                    state.compactors[level] = np.zeros(0, np.float64)
                    state.compactors[level + 1] = np.concatenate(
                        [state.compactors[level + 1], promoted])
                    break
            else:
                break

    def update(self, state: KllState, values) -> KllState:
        vals = np.asarray(values, np.float64)
        vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            return state
        state.compactors[0] = np.concatenate([state.compactors[0], vals])
        state.n += int(vals.size)
        self._compress(state)
        return state

    def merge(self, a: KllState, b: KllState) -> KllState:
        if a.k != b.k:
            raise ValueError("cannot merge KLL with different k")
        out = self.create(a.k)
        height = max(len(a.compactors), len(b.compactors))
        while len(out.compactors) < height:
            self._grow(out)
        for level in range(height):
            parts = []
            for src in (a, b):
                if level < len(src.compactors):
                    parts.append(src.compactors[level])
            out.compactors[level] = np.concatenate(parts) if parts else np.zeros(0, np.float64)
            out.parities[level] = (
                (a.parities[level] if level < len(a.parities) else 0)
                + (b.parities[level] if level < len(b.parities) else 0))
        out.n = a.n + b.n
        self._compress(out)
        return out

    # -- queries --------------------------------------------------------------

    def _weighted(self, state: KllState) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for level, c in enumerate(state.compactors):
            if len(c):
                vals.append(c)
                wts.append(np.full(len(c), 1 << level, np.int64))
        if not vals:
            return np.zeros(0, np.float64), np.zeros(0, np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, state: KllState, q) -> np.ndarray:
        """Value(s) at normalized rank(s) q in [0,1]."""
        qs = np.atleast_1d(np.asarray(q, np.float64))
        v, w = self._weighted(state)
        if v.size == 0:
            return np.full(qs.shape, np.nan)
        cum = np.cumsum(w)
        total = cum[-1]
        targets = np.clip(qs, 0.0, 1.0) * total
        idx = np.searchsorted(cum, targets, side="left")
        idx = np.minimum(idx, v.size - 1)
        return v[idx]

    def rank(self, state: KllState, x) -> np.ndarray:
        """Normalized rank estimate(s) of value(s) x."""
        xs = np.atleast_1d(np.asarray(x, np.float64))
        v, w = self._weighted(state)
        if v.size == 0:
            return np.full(xs.shape, np.nan)
        cum = np.concatenate([[0], np.cumsum(w)])
        idx = np.searchsorted(v, xs, side="right")
        return cum[idx] / cum[-1]

    def stats(self, state: KllState) -> dict:
        return {"k": state.k, "n": state.n, "levels": len(state.compactors),
                "retained": state.size}

    def serialize(self, state: KllState) -> bytes:
        header = {"k": state.k, "n": state.n,
                  "sizes": [len(c) for c in state.compactors],
                  "par": state.parities}
        flat = (np.concatenate(state.compactors)
                if state.compactors else np.zeros(0, np.float64))
        return pack_state(self.name, header, [flat])

    def deserialize(self, data: bytes) -> KllState:
        kind, header, bufs = unpack_state(data)
        if kind != self.name:
            raise ValueError(f"expected kll blob, got {kind}")
        st = KllState(header["k"])
        st.compactors, st.parities = [], []
        flat = bufs[0].astype(np.float64, copy=False)
        pos = 0
        for size in header["sizes"]:
            st.compactors.append(flat[pos : pos + size].copy())
            pos += size
        st.parities = list(header["par"])
        st.n = header["n"]
        return st


KLL = Kll()
