"""Misra-Gries heavy-hitters summary as a mergeable, vectorized sketch.

No reference counterpart — added for the training-data-pipeline surface
(heavy-hitter queries without a candidate set: unlike CMS, the summary
itself carries the candidate identities).  Semantics follow the mergeable
form of Agarwal et al. 2012 ("Mergeable Summaries"): keep at most ``cap``
(key, count) counters; to restore capacity after absorbing a batch or a
merge, subtract the (cap+1)-th largest counter value from every counter
and drop the non-positive ones.

Guarantees (asserted in tests):
  * stored count c is a LOWER bound:  c <= true <= c + decr_total,
    where ``decr_total`` is the exact accumulated subtraction;
  * any key absent from the summary has true count <= decr_total;
  * decr_total <= n_total / (cap + 1)  (the published MG bound, preserved
    under merge per the mergeable-summaries paper).

So every phi-heavy hitter with phi * n > n/(cap+1) is guaranteed present,
making the summary a recall-1 candidate generator for an exact
verification join (the same pattern the CMS gates use).

Batch updates are vectorized: per-row counting is Arrow's
``value_counts`` / numpy ``unique``; Python touches only the DISTINCT
keys of a batch against the <=cap stored counters.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .protocol import decode_keys, encode_keys, pack_state, unpack_state

__all__ = ["MgState", "Mg", "MG"]


def _batch_counts(values) -> tuple[list, np.ndarray]:
    """Exact (distinct key, count) of one batch, vectorized."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        vc = pc.value_counts(values)
        keys = vc.field("values").to_pylist()
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
    else:
        arr = np.asarray(values)
        uniq, counts = np.unique(arr, return_counts=True)
        keys = uniq.tolist()
    return keys, counts.astype(np.int64, copy=False)


@dataclass
class MgState:
    cap: int
    keys: list = field(default_factory=list)  # column scalars (protocol.encode_keys on the wire)
    counts: np.ndarray = None  # int64[len(keys)], lower-bound counts
    n_total: int = 0
    decr_total: int = 0  # exact accumulated subtraction (the error bound)

    def __post_init__(self):
        if self.counts is None:
            self.counts = np.zeros(0, np.int64)


class Mg:
    name = "mg"

    def create(self, cap: int = 256) -> MgState:
        return MgState(int(cap))

    def _absorb(self, state: MgState, keys: list, counts: np.ndarray) -> MgState:
        d = dict(zip(state.keys, state.counts.tolist()))
        for k, c in zip(keys, counts.tolist()):
            d[k] = d.get(k, 0) + c
        state.n_total += int(counts.sum())
        if len(d) > state.cap:
            cnts = np.fromiter(d.values(), np.int64, len(d))
            # (cap+1)-th largest: subtracting it zeroes everything at or
            # below, leaving at most cap strictly-positive counters
            v = int(np.partition(cnts, -(state.cap + 1))[-(state.cap + 1)])
            state.decr_total += v
            keep_keys, keep_counts = [], []
            for k, c in d.items():
                if c > v:
                    keep_keys.append(k)
                    keep_counts.append(c - v)
            state.keys = keep_keys
            state.counts = np.asarray(keep_counts, np.int64)
        else:
            state.keys = list(d.keys())
            state.counts = np.fromiter(d.values(), np.int64, len(d))
        return state

    def update(self, state: MgState, values) -> MgState:
        keys, counts = _batch_counts(values)
        if not keys:
            return state
        return self._absorb(state, keys, counts)

    def merge(self, a: MgState, b: MgState) -> MgState:
        if a.cap != b.cap:
            raise ValueError("cannot merge MG summaries with different capacity")
        out = MgState(a.cap, list(a.keys), a.counts.copy(),
                      a.n_total, a.decr_total + b.decr_total)
        out = self._absorb(out, b.keys, b.counts)
        # _absorb added sum(b.counts), which is less than b's true mass by
        # whatever b already decremented away — n_total must stay exact
        out.n_total = a.n_total + b.n_total
        return out

    # -- queries ------------------------------------------------------------

    def items(self, state: MgState) -> tuple[list, np.ndarray]:
        """(keys, lower-bound counts); true count <= count + decr_total."""
        return list(state.keys), state.counts.copy()

    def estimate(self, state: MgState, keys) -> np.ndarray:
        """Lower-bound count per queried key (0 if not stored)."""
        d = dict(zip(state.keys, state.counts.tolist()))
        return np.asarray([d.get(k, 0) for k in keys], np.int64)

    def error_bound(self, state: MgState) -> int:
        """Exact max undercount: true - stored <= decr_total, and any
        unstored key has true <= decr_total."""
        return state.decr_total

    def heavy_candidates(self, state: MgState, threshold: int) -> list:
        """All keys whose true count COULD be >= threshold — recall-1
        candidate set for an exact verification join."""
        ub = state.counts + state.decr_total
        return [k for k, u in zip(state.keys, ub.tolist()) if u >= threshold]

    def stats(self, state: MgState) -> dict:
        return {"cap": state.cap, "n_stored": len(state.keys),
                "n_total": state.n_total, "decr_total": state.decr_total,
                "published_bound": state.n_total / (state.cap + 1)}

    # -- wire ---------------------------------------------------------------

    def serialize(self, state: MgState) -> bytes:
        header = {"cap": state.cap, "n": state.n_total,
                  "dec": state.decr_total, "keys": encode_keys(state.keys)}
        return pack_state(self.name, header, [state.counts])

    def deserialize(self, data: bytes) -> MgState:
        kind, header, bufs = unpack_state(data)
        if kind != self.name:
            raise ValueError(f"expected mg blob, got {kind}")
        return MgState(header["cap"], decode_keys(header["keys"]),
                       bufs[0].astype(np.int64, copy=False),
                       header["n"], header["dec"])


MG = Mg()
