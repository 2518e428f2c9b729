"""KMV (bottom-k) sketch tests: deterministic sample semantics, exact
byte-level merge algebra (union + truncate is order-free), and the
Bar-Yossef distinct-count estimator within its published error."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from sketchlib.sketch import KMV


class TestSampleSemantics:
    def test_below_capacity_keeps_all_distinct(self):
        state = KMV.update(KMV.create(k=100), np.arange(50) % 25)
        assert len(state.prios) == 25  # distinct values, duplicates collapse
        assert state.n_total == 50
        assert KMV.distinct_count(state) == 25.0  # exact below capacity

    def test_sample_deterministic_across_batching(self):
        data = np.arange(10_000, dtype=np.int64)
        a = KMV.update(KMV.create(64), data)
        b = KMV.create(64)
        for s in range(0, len(data), 777):  # different batch boundaries
            KMV.update(b, data[s:s + 777])
        assert np.array_equal(a.prios, b.prios)
        assert a.keys == b.keys

    def test_merge_exactly_equals_single_build(self):
        data = np.arange(20_000, dtype=np.int64)
        whole = KMV.update(KMV.create(128), data)
        a = KMV.update(KMV.create(128), data[:9_000])
        b = KMV.update(KMV.create(128), data[9_000:])
        merged = KMV.deserialize(KMV.serialize(KMV.merge(a, b)))
        assert np.array_equal(merged.prios, whole.prios)
        assert merged.keys == whole.keys
        assert merged.n_total == whole.n_total
        # commutative, byte-for-byte
        swapped = KMV.merge(b, a)
        assert np.array_equal(swapped.prios, merged.prios)
        assert swapped.keys == merged.keys

    def test_update_with_prios_and_string_keys(self):
        state = KMV.create(4)
        KMV.update_with_prios(state, np.array([30, 10, 20, 40, 5], np.uint64),
                              ["c", "a", "b", "d", "e"])
        assert state.keys == ["e", "a", "b", "c"]  # priority order, k=4
        rt = KMV.deserialize(KMV.serialize(state))
        assert rt.keys == state.keys
        assert np.array_equal(rt.prios, state.prios)

    def test_geometry_mismatch(self):
        with pytest.raises(ValueError, match="different k"):
            KMV.merge(KMV.create(16), KMV.create(32))


class TestDistinctEstimator:
    @pytest.mark.parametrize("n_distinct", [5_000, 50_000])
    def test_estimate_within_bound(self, n_distinct):
        state = KMV.update(KMV.create(k=1024),
                           np.arange(n_distinct, dtype=np.int64))
        est = KMV.distinct_count(state)
        rel = KMV.rel_error(state)  # ~1/sqrt(k-2) ~ 3.1%
        assert abs(est - n_distinct) <= 5 * rel * n_distinct

    def test_duplicates_do_not_shift_estimate(self):
        uniq = np.arange(30_000, dtype=np.int64)
        dup = np.concatenate([uniq, uniq, uniq])
        a = KMV.update(KMV.create(512), uniq)
        b = KMV.update(KMV.create(512), dup)
        assert KMV.distinct_count(a) == KMV.distinct_count(b)
        assert np.array_equal(a.prios, b.prios)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(0, 10_000), max_size=300),
       st.lists(st.integers(0, 10_000), max_size=300))
def test_merge_is_union_truncate(xs, ys):
    """hypothesis: merge == build over the multiset union, byte-for-byte
    (the strongest algebra class — same as Bloom OR)."""
    a = KMV.update(KMV.create(16), np.asarray(xs, np.int64)) if xs else KMV.create(16)
    b = KMV.update(KMV.create(16), np.asarray(ys, np.int64)) if ys else KMV.create(16)
    merged = KMV.merge(a, b)
    both = xs + ys
    direct = KMV.update(KMV.create(16), np.asarray(both, np.int64)) if both else KMV.create(16)
    assert np.array_equal(merged.prios, direct.prios)
    assert merged.keys == direct.keys


def test_spark_build_path(spark):
    """End-to-end through the generic agg engine and through kmv_bottomk."""
    from pyspark.sql import functions as F

    from sketchlib.agg import build_sketch, kmv_bottomk, kmv_spec

    df = spark.range(40_000).select((F.col("id") % 9_000).alias("k"))
    res = build_sketch(df, "k", kmv_spec(k=512))
    est = KMV.distinct_count(res.state)
    assert abs(est - 9_000) <= 5 * KMV.rel_error(res.state) * 9_000

    # bottom-k with an explicit priority column: result must equal the
    # engine's own orderBy().limit() on the same priority
    pr = df.withColumn("p", F.pmod(F.xxhash64("k"), F.lit(2**40)))
    st = kmv_bottomk(pr, "k", "p", 32)
    # KMV samples DISTINCT values; compare against the distinct bottom-k
    expect = [r["k"] for r in pr.select("k", "p").distinct()
              .orderBy("p", "k").limit(32).collect()]
    assert KMV.sample(st) == expect


class TestThetaSetOps:
    def test_exact_below_capacity(self):
        a = KMV.update(KMV.create(1024), np.arange(0, 500, dtype=np.int64))
        b = KMV.update(KMV.create(1024), np.arange(300, 800, dtype=np.int64))
        est_i, kept_i = KMV.intersection_count(a, b)
        est_d, _ = KMV.difference_count(a, b)
        # theta == 1.0: the "sample" is the whole set, estimates are exact
        assert est_i == 200 and kept_i == 200
        assert est_d == 300

    def test_sampled_estimates_within_rse(self):
        n, overlap = 200_000, 60_000
        a = KMV.update(KMV.create(2048), np.arange(0, n, dtype=np.int64))
        b = KMV.update(KMV.create(2048),
                       np.arange(n - overlap, 2 * n - overlap, dtype=np.int64))
        est_i, kept_i = KMV.intersection_count(a, b)
        assert abs(est_i - overlap) <= 5 * overlap / np.sqrt(max(kept_i, 1))
        est_d, kept_d = KMV.difference_count(a, b)
        true_d = n - overlap
        assert abs(est_d - true_d) <= 5 * true_d / np.sqrt(max(kept_d, 1))

    def test_disjoint_and_subset(self):
        a = KMV.update(KMV.create(512), np.arange(0, 50_000, dtype=np.int64))
        b = KMV.update(KMV.create(512),
                       np.arange(60_000, 110_000, dtype=np.int64))
        est_i, _ = KMV.intersection_count(a, b)
        assert est_i == 0.0  # no shared hashes, ever
        sub = KMV.update(KMV.create(512), np.arange(0, 5_000, dtype=np.int64))
        est_ds, _ = KMV.difference_count(sub, a)  # subset minus superset
        assert est_ds == 0.0


class TestWireKeyTypes:
    """Regression: serialize() embedded raw sample keys in the JSON
    header, so bytes / timestamp / numpy-scalar keys (BinaryType,
    TimestampType columns) crashed json.dumps inside executors at
    partial-serialize time even though update/merge handled them fine."""

    def test_bytes_keys_roundtrip(self):
        import pyarrow as pa
        vals = pa.array([f"blob{i}".encode() for i in range(40)],
                        type=pa.large_binary())
        st_ = KMV.update(KMV.create(k=16), vals)
        back = KMV.deserialize(KMV.serialize(st_))
        assert back.keys == st_.keys
        assert all(isinstance(k, bytes) for k in back.keys)
        assert np.array_equal(back.prios, st_.prios)
        # a resumed state keeps deduping against fresh batches
        again = KMV.update(back, vals)
        assert np.array_equal(again.prios, st_.prios)

    def test_timestamp_keys_roundtrip(self):
        import datetime
        vals = [datetime.datetime(2026, 1, 1) + datetime.timedelta(hours=i)
                for i in range(40)]
        st_ = KMV.update(KMV.create(k=16), vals)
        back = KMV.deserialize(KMV.serialize(st_))
        assert back.keys == st_.keys

    def test_numpy_scalar_keys_serialize(self):
        st_ = KMV.create(k=8)
        KMV.update(st_, np.arange(20, dtype=np.int64))
        back = KMV.deserialize(KMV.serialize(st_))
        assert [int(k) for k in back.keys] == [int(k) for k in st_.keys]
