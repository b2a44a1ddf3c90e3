"""Property-based codec tests (hypothesis): encode→decode ≡ identity over
adversarial inputs — the generalization of the reference's hand-written
vectors (rle_v2.rs:760-816)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_format_spark.codecs import boolean_rle, deflate, fsst, rle_v2, strings

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
SMALL = st.integers(min_value=-1000, max_value=1000)


@settings(max_examples=150, deadline=None)
@given(st.lists(I64, max_size=1500))
def test_rle_v2_signed_identity(xs):
    v = np.array(xs, dtype=np.int64)
    assert (rle_v2.decode(rle_v2.encode(v, signed=True), len(v), signed=True) == v).all()


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=1500))
def test_rle_v2_unsigned_identity(xs):
    v = np.array(xs, dtype=np.uint64)
    assert (rle_v2.decode(rle_v2.encode(v, signed=False), len(v), signed=False) == v).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(SMALL, min_size=3, max_size=600),
       st.integers(min_value=0, max_value=2**45))
def test_rle_v2_outlier_identity(xs, spike):
    """Small values + one large outlier — the patched-base trigger zone."""
    v = np.array(xs, dtype=np.int64)
    v[len(v) // 2] = spike
    assert (rle_v2.decode(rle_v2.encode(v), len(v)) == v).all()


@settings(max_examples=150, deadline=None)
@given(st.lists(st.booleans(), max_size=3000))
def test_boolean_identity(xs):
    b = np.array(xs, dtype=bool)
    assert (boolean_rle.decode_bools(boolean_rle.encode_bools(b), len(b)) == b).all()


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2000))
def test_byte_rle_identity(data):
    out = boolean_rle.decode_bytes(boolean_rle.encode_bytes(data), len(data))
    assert out.tobytes() == data


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=40), max_size=300))
def test_string_direct_identity(xs):
    blob, lens = strings.encode_direct(xs)
    assert strings.decode_direct(blob, lens).to_pylist() == xs


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=20), max_size=300))
def test_string_dict_identity(xs):
    blob, dlens, codes, ndv = strings.encode_dict(xs)
    assert strings.decode_dict(blob, dlens, codes).to_pylist() == xs


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=6000))
def test_fsst_identity(data):
    assert fsst.decode(fsst.encode(data), len(data)) == data


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=6000), st.sampled_from([32, 256, 4096]))
def test_deflate_identity(data, block):
    assert deflate.decompress(deflate.compress(data, block_size=block)) == data
