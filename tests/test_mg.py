"""Misra-Gries summary tests: the mergeable-summaries guarantees
(Agarwal et al. 2012) on seeded Zipf data, plus the shared sketch-protocol
conventions (merge algebra up to the sketch's equivalence, wire roundtrip,
Spark build path)."""

import collections

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from sketchlib.sketch import MG


def _zipf(n, seed, mod=5_000):
    rng = np.random.default_rng(seed)
    return rng.zipf(1.4, n) % mod


def _check_invariants(state, data):
    true = collections.Counter(np.asarray(data).tolist())
    assert state.n_total == len(data)
    # published bound: accumulated decrement <= n/(cap+1)
    assert state.decr_total <= state.n_total / (state.cap + 1)
    stored = dict(zip(state.keys, state.counts.tolist()))
    assert len(stored) <= state.cap
    for k, c in stored.items():
        assert c <= true[k] <= c + state.decr_total  # lower bound + exact err
    for k, f in true.items():
        if f > state.decr_total:  # every possibly-heavy key is stored
            assert k in stored


class TestGuarantees:
    def test_stream_invariants(self):
        data = _zipf(150_000, seed=3)
        state = MG.create(cap=128)
        for s in range(0, len(data), 8_192):  # batched like Arrow batches
            MG.update(state, data[s:s + 8_192])
        _check_invariants(state, data)

    def test_merge_invariants_and_exact_n(self):
        data = _zipf(150_000, seed=5)
        a, b, c = (MG.create(cap=128) for _ in range(3))
        MG.update(a, data[:50_000])
        MG.update(b, data[50_000:100_000])
        MG.update(c, data[100_000:])
        merged = MG.merge(MG.merge(a, b), c)
        _check_invariants(merged, data)
        # other association order: same totals, same guarantees
        merged2 = MG.merge(a, MG.merge(b, c))
        assert merged2.n_total == merged.n_total
        _check_invariants(merged2, data)

    def test_no_decrement_when_under_capacity(self):
        state = MG.update(MG.create(cap=64), np.arange(60) % 30)
        assert state.decr_total == 0
        assert dict(zip(state.keys, state.counts.tolist())) == \
            {i: 2 for i in range(30)}

    def test_heavy_candidates_recall(self):
        data = _zipf(80_000, seed=11)
        state = MG.update(MG.create(cap=256), data)
        thresh = int(0.005 * len(data))
        cands = set(MG.heavy_candidates(state, thresh))
        true = collections.Counter(data.tolist())
        for k, f in true.items():
            if f >= thresh:
                assert k in cands  # recall 1 — the whole point

    def test_string_keys_roundtrip(self):
        import pyarrow as pa

        state = MG.create(cap=16)
        MG.update(state, pa.array(["x"] * 9 + ["y"] * 4 + ["z"]))
        rt = MG.deserialize(MG.serialize(state))
        assert dict(zip(rt.keys, rt.counts.tolist())) == {"x": 9, "y": 4, "z": 1}
        assert rt.cap == 16 and rt.decr_total == 0

    def test_geometry_mismatch(self):
        with pytest.raises(ValueError, match="capacity"):
            MG.merge(MG.create(16), MG.create(32))

    def test_empty_update(self):
        state = MG.update(MG.create(16), np.array([], np.int64))
        assert state.n_total == 0 and len(state.keys) == 0


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(0, 50), max_size=400),
       st.lists(st.integers(0, 50), max_size=400))
def test_split_build_guarantees_hold(xs, ys):
    """hypothesis: build-split then merge preserves every MG guarantee on
    arbitrary key multisets (the estimate-equivalence class of algebra,
    like KLL/t-digest — byte equality is not required)."""
    both = xs + ys
    a = MG.update(MG.create(cap=8), np.asarray(xs, np.int64)) if xs else MG.create(8)
    b = MG.update(MG.create(cap=8), np.asarray(ys, np.int64)) if ys else MG.create(8)
    merged = MG.merge(a, b)
    if both:
        _check_invariants(merged, np.asarray(both, np.int64))
    else:
        assert merged.n_total == 0


def test_spark_build_path(spark):
    """End-to-end through the generic agg engine: partials + tree merge."""
    from pyspark.sql import functions as F

    from sketchlib.agg import build_sketch, mg_spec

    df = spark.range(30_000).select(
        (F.floor(F.pow(F.rand(seed=4), F.lit(4.0)) * 40)).cast("long").alias("k"))
    res = build_sketch(df, "k", mg_spec(cap=64))
    pdf = df.toPandas()
    _check_invariants(res.state, pdf["k"].to_numpy())


class TestWireKeyTypes:
    """Same regression as KMV's TestWireKeyTypes: raw keys in the JSON
    header crashed on bytes/timestamp columns at serialize time."""

    def test_bytes_keys_roundtrip_and_merge(self):
        import pyarrow as pa
        from sketchlib.sketch import MG
        vals = pa.array(([b"hot"] * 50) + [f"b{i}".encode() for i in range(30)],
                        type=pa.large_binary())
        st_ = MG.update(MG.create(cap=8), vals)
        back = MG.deserialize(MG.serialize(st_))
        assert set(back.keys) == set(st_.keys)
        assert all(isinstance(k, bytes) for k in back.keys)
        # deserialized counters keep merging against fresh batches by value
        merged = MG.merge(back, MG.update(MG.create(cap=8), vals))
        assert MG.estimate(merged, [b"hot"])[0] >= 50
