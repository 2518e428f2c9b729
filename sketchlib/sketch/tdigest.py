"""t-digest quantile sketch as a mergeable, vectorized sketch.

No reference counterpart — mandated by BASELINE.json:6,14 (Dunning &
Ertl, "Computing extremely accurate quantiles using t-digests").  This is
the *merging* t-digest with the k1 scale function
k1(q) = (delta / 2*pi) * asin(2q - 1), which bounds centroid size by the
scale-function cell width — tight at the tails, looser at the median.

Vectorized compression: instead of the usual sequential greedy merge, each
centroid is assigned the integer cell floor(k1(q_mid)) of its midpoint rank
and all centroids in one cell are merged with one np.add.reduceat pass —
deterministic, whole-column, no per-centroid Python loop.  Merge of two
digests = concatenate centroid arrays + recompress; associativity holds up
to rank-error equivalence (as for any compacting sketch).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .protocol import pack_state, unpack_state

__all__ = ["TDigestState", "TDigest", "TDIGEST"]


@dataclass
class TDigestState:
    delta: float
    means: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float64))
    weights: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float64))
    n: int = 0
    v_min: float = np.inf
    v_max: float = -np.inf


class TDigest:
    name = "tdigest"

    def create(self, delta: float = 200.0) -> TDigestState:
        return TDigestState(float(delta))

    def _compress(self, state: TDigestState) -> None:
        if state.means.size <= 1:
            return
        order = np.argsort(state.means, kind="stable")
        means = state.means[order]
        weights = state.weights[order]
        total = weights.sum()
        cum = np.cumsum(weights)
        q_mid = (cum - weights / 2.0) / total
        # k1 scale function cell index
        k = (state.delta / (2.0 * np.pi)) * np.arcsin(2.0 * q_mid - 1.0)
        cell = np.floor(k).astype(np.int64)
        # boundaries where the cell index changes
        starts = np.flatnonzero(np.concatenate([[True], cell[1:] != cell[:-1]]))
        w_sum = np.add.reduceat(weights, starts)
        m_sum = np.add.reduceat(means * weights, starts)
        state.means = m_sum / w_sum
        state.weights = w_sum
        state.n = int(total)

    def update(self, state: TDigestState, values) -> TDigestState:
        vals = np.asarray(values, np.float64)
        vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            return state
        state.v_min = min(state.v_min, float(vals.min()))
        state.v_max = max(state.v_max, float(vals.max()))
        state.means = np.concatenate([state.means, vals])
        state.weights = np.concatenate([state.weights, np.ones(vals.size)])
        state.n += int(vals.size)
        if state.means.size > 8 * state.delta:
            self._compress(state)
        return state

    def merge(self, a: TDigestState, b: TDigestState) -> TDigestState:
        if a.delta != b.delta:
            raise ValueError("cannot merge t-digests with different delta")
        out = TDigestState(
            a.delta,
            np.concatenate([a.means, b.means]),
            np.concatenate([a.weights, b.weights]),
            a.n + b.n,
            min(a.v_min, b.v_min),
            max(a.v_max, b.v_max),
        )
        self._compress(out)
        return out

    # -- queries --------------------------------------------------------------

    def quantile(self, state: TDigestState, q) -> np.ndarray:
        qs = np.atleast_1d(np.asarray(q, np.float64))
        if state.means.size == 0:
            return np.full(qs.shape, np.nan)
        self._compress(state)
        means, weights = state.means, state.weights
        total = weights.sum()
        cum = np.cumsum(weights) - weights / 2.0  # centroid midpoints
        targets = np.clip(qs, 0.0, 1.0) * total
        out = np.interp(targets, cum, means)
        out = np.where(targets <= cum[0], state.v_min
                       if np.isfinite(state.v_min) else means[0], out)
        out = np.where(targets >= cum[-1], state.v_max
                       if np.isfinite(state.v_max) else means[-1], out)
        return out

    def rank(self, state: TDigestState, x) -> np.ndarray:
        xs = np.atleast_1d(np.asarray(x, np.float64))
        if state.means.size == 0:
            return np.full(xs.shape, np.nan)
        self._compress(state)
        means, weights = state.means, state.weights
        total = weights.sum()
        cum = np.cumsum(weights) - weights / 2.0
        return np.interp(xs, means, cum / total, left=0.0, right=1.0)

    def stats(self, state: TDigestState) -> dict:
        return {"delta": state.delta, "n": state.n,
                "centroids": int(state.means.size),
                "min": state.v_min, "max": state.v_max}

    def serialize(self, state: TDigestState) -> bytes:
        self._compress(state)
        header = {"delta": state.delta, "n": state.n,
                  "min": state.v_min if np.isfinite(state.v_min) else None,
                  "max": state.v_max if np.isfinite(state.v_max) else None}
        return pack_state(self.name, header, [state.means, state.weights])

    def deserialize(self, data: bytes) -> TDigestState:
        kind, header, bufs = unpack_state(data)
        if kind != self.name:
            raise ValueError(f"expected tdigest blob, got {kind}")
        return TDigestState(
            header["delta"],
            bufs[0].astype(np.float64, copy=False),
            bufs[1].astype(np.float64, copy=False),
            header["n"],
            header["min"] if header["min"] is not None else np.inf,
            header["max"] if header["max"] is not None else -np.inf,
        )


TDIGEST = TDigest()
