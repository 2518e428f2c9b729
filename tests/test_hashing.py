"""Hash kernel tests (SURVEY §5.1): vectorized murmur3-32 vs known public
test vectors and vs the scalar spec implementation on random byte strings."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, strategies as st

from sketchlib.hashing import (
    SEED_H1,
    SEED_H2,
    derive_hashes,
    hash64,
    hash_pair,
    int64_byte_matrix,
    murmur3_32,
    murmur3_32_scalar,
    to_byte_matrix,
)

# Public MurmurHash3-x86-32 test vectors (widely published, e.g. the
# SMHasher suite / RFC-style references).
KNOWN_VECTORS = [
    (b"", 0x00000000, 0x00000000),
    (b"", 0x00000001, 0x514E28B7),
    (b"", 0xFFFFFFFF, 0x81F16F39),
    (b"test", 0x00000000, 0xBA6BD213),
    (b"test", 0x9747B28C, 0x704B81DC),
    (b"Hello, world!", 0x00000000, 0xC0363E43),
    (b"The quick brown fox jumps over the lazy dog", 0x00000000, 0x2E4FF723),
    (b"\xff\xff\xff\xff", 0x00000000, 0x76293B50),
    (b"aaaa", 0x9747B28C, 0x5A97808A),
    (b"aaa", 0x9747B28C, 0x283E0130),
    (b"aa", 0x9747B28C, 0x5D211726),
    (b"a", 0x9747B28C, 0x7FA09EA6),
]


def test_scalar_known_vectors():
    for data, seed, expected in KNOWN_VECTORS:
        assert murmur3_32_scalar(data, seed) == expected, (data, seed)


def test_vectorized_known_vectors():
    for data, seed, expected in KNOWN_VECTORS:
        mat, lengths = to_byte_matrix([data])
        got = murmur3_32(mat, lengths, seed)
        assert int(got[0]) == expected, (data, seed)


def test_vectorized_matches_scalar_random():
    rng = np.random.default_rng(42)
    blobs = []
    for _ in range(500):
        n = int(rng.integers(0, 67))
        blobs.append(rng.integers(0, 256, n).astype(np.uint8).tobytes())
    mat, lengths = to_byte_matrix(blobs)
    for seed in (0, SEED_H2, 0xDEADBEEF):
        vec = murmur3_32(mat, lengths, seed)
        expected = [murmur3_32_scalar(b, seed) for b in blobs]
        assert vec.tolist() == expected


def test_vectorized_batch_equals_single():
    keys = [f"key-{i}".encode() for i in range(100)]
    mat, lengths = to_byte_matrix(keys)
    batch = murmur3_32(mat, lengths, 7)
    for i, k in enumerate(keys):
        m1, l1 = to_byte_matrix([k])
        assert int(murmur3_32(m1, l1, 7)[0]) == int(batch[i])


def test_unicode_strings():
    keys = ["héllo", "世界", "naïve", ""]
    mat, lengths = to_byte_matrix(keys)
    vec = murmur3_32(mat, lengths, 0)
    expected = [murmur3_32_scalar(k.encode("utf-8"), 0) for k in keys]
    assert vec.tolist() == expected


def test_int64_hashing_matches_le_bytes():
    vals = np.array([0, 1, -1, 2**62, -(2**62)], np.int64)
    mat, lengths = int64_byte_matrix(vals)
    vec = murmur3_32(mat, lengths, 0)
    expected = [murmur3_32_scalar(int(v).to_bytes(8, "little", signed=True), 0)
                for v in vals]
    assert vec.tolist() == expected


def test_hash_pair_independent_seeds():
    h1, h2 = hash_pair(["alpha", "beta", "gamma"])
    assert h1.dtype == np.uint32 and h2.dtype == np.uint32
    assert not np.array_equal(h1, h2)
    h1o, h2o = hash_pair(["alpha"], odd_h2=True)
    assert int(h2o[0]) % 2 == 1
    assert int(h1o[0]) == int(h1[0])


def test_hash64_distribution_smoke():
    keys = [f"k{i}" for i in range(10000)]
    h = hash64(keys)
    assert h.dtype == np.uint64
    assert len(np.unique(h)) == len(keys)  # no collisions at this scale
    # top bit should be ~50/50
    frac = np.mean((h >> np.uint64(63)).astype(float))
    assert 0.45 < frac < 0.55


def test_derive_hashes_independent():
    base = hash64([f"k{i}" for i in range(1000)])
    fam = derive_hashes(base, 4)
    assert fam.shape == (4, 1000)
    for i in range(4):
        for j in range(i + 1, 4):
            assert not np.array_equal(fam[i], fam[j])
    # deterministic
    fam2 = derive_hashes(base, 4)
    assert np.array_equal(fam, fam2)


def test_nulls_hash_as_empty():
    import pyarrow as pa
    arr = pa.array(["a", None, "b"])
    mat, lengths = to_byte_matrix(arr)
    assert lengths.tolist()[1] == 0


@pytest.mark.parametrize("n", [0, 1, 3, 4, 5, 63, 64, 65])
def test_edge_lengths(n):
    blob = bytes(range(256))[:n] if n <= 256 else b"x" * n
    mat, lengths = to_byte_matrix([blob])
    assert int(murmur3_32(mat, lengths, 123)[0]) == murmur3_32_scalar(blob, 123)


class TestCanonicalNumericDomain:
    """The per-value canonical rule (numeric_byte_matrix): a logical key
    must hash identically no matter which physical route delivers it —
    int64 ndarray, float64 ndarray (pandas' nullable-batch promotion),
    python list, or Arrow array.  A domain split between any two routes
    breaks Bloom's no-false-negative guarantee between build and probe."""

    @given(st.lists(st.integers(min_value=-(2**53), max_value=2**53),
                    min_size=1, max_size=200))
    def test_every_route_agrees_for_integral_keys(self, vals):
        base = hash64(np.asarray(vals, np.int64))
        assert np.array_equal(base, hash64(np.asarray(vals, np.float64)))
        assert np.array_equal(base, hash64(vals))
        assert np.array_equal(base, hash64(pa.array(vals, type=pa.int64())))
        assert np.array_equal(base, hash64(pa.array(
            [float(v) for v in vals], type=pa.float64())))

    @given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                              width=64),
                    min_size=1, max_size=200))
    def test_float_routes_agree_and_distinct_values_differ(self, vals):
        a = hash64(np.asarray(vals, np.float64))
        assert np.array_equal(a, hash64(vals))
        assert np.array_equal(a, hash64(pa.array(vals, type=pa.float64())))
        # determinism + injectivity up to hash collisions: equal values
        # hash equal (canonicalization is a pure function of the value)
        again = hash64(np.asarray(vals, np.float64))
        assert np.array_equal(a, again)

    def test_integral_double_matches_int_but_fractional_does_not(self):
        h_int = hash64(np.array([7], np.int64))
        assert np.array_equal(h_int, hash64(np.array([7.0], np.float64)))
        assert not np.array_equal(h_int, hash64(np.array([7.5], np.float64)))

    def test_out_of_int64_range_floats_hash_as_ieee(self):
        big = np.array([1e300, -1e300, float(2**63)], np.float64)
        h = hash64(big)  # must not overflow/crash; IEEE-bit domain
        assert len(set(h.tolist())) == 3
        assert np.array_equal(h, hash64(big.copy()))
