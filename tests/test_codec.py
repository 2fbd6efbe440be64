"""Codec round-trip property tests (hypothesis) + compression sanity.

The north-rule invariant: decode(encode(bucket)) is bit-exact for
every column, especially per-row token arrays.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tstoolbox_spark.codec.bitpack import (
    pack_fixed,
    pack_for_blocks,
    unpack_fixed,
    unpack_for_blocks,
    zigzag_decode,
    zigzag_encode,
)
from tstoolbox_spark.codec.gorilla import (
    decode_bucket,
    decode_dod,
    decode_xor,
    encode_bucket,
    encode_dod,
    encode_xor,
)

i64 = st.integers(min_value=-(2**62), max_value=2**62 - 1)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300), st.integers(0, 64))
def test_pack_fixed_roundtrip(vals, width):
    arr = np.array(vals, dtype=np.uint64)
    mask = np.uint64((1 << width) - 1) if width < 64 else np.uint64(2**64 - 1)
    arr = arr & mask
    buf = pack_fixed(arr, width)
    out = unpack_fixed(buf, len(arr), width)
    np.testing.assert_array_equal(out, arr)


@given(st.lists(st.integers(min_value=0, max_value=2**63), max_size=500))
def test_for_blocks_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out, _ = unpack_for_blocks(pack_for_blocks(arr, block=64), block=64)
    np.testing.assert_array_equal(out, arr)


@given(st.lists(i64, max_size=400))
def test_zigzag_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    np.testing.assert_array_equal(zigzag_decode(zigzag_encode(arr)), arr)


@given(st.lists(i64, max_size=400))
def test_xor_roundtrip_ints(vals):
    arr = np.array(vals, dtype=np.int64).view(np.uint64)
    out, _ = decode_xor(encode_xor(arr, block=32), block=32)
    np.testing.assert_array_equal(out, arr)


@given(st.lists(st.floats(allow_nan=False, width=64), max_size=300))
def test_xor_roundtrip_floats(vals):
    arr = np.array(vals, dtype=np.float64)
    out, _ = decode_xor(encode_xor(arr.view(np.uint64)))
    np.testing.assert_array_equal(out.view(np.float64), arr)


def test_xor_handles_nan_bits():
    arr = np.array([1.5, np.nan, np.inf, -0.0, 0.0], dtype=np.float64)
    out, _ = decode_xor(encode_xor(arr.view(np.uint64)))
    np.testing.assert_array_equal(out, arr.view(np.uint64))  # bit-exact incl nan payload


@given(st.lists(i64, max_size=400))
def test_dod_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    out, _ = decode_dod(encode_dod(arr))
    np.testing.assert_array_equal(out, arr)


@settings(deadline=None)
@given(st.data())
def test_bucket_roundtrip(data):
    n = data.draw(st.integers(0, 60))
    rng = np.random.RandomState(data.draw(st.integers(0, 2**31 - 1)))
    ts = np.sort(rng.randint(0, 10**15, size=n).astype(np.int64))
    n_tok = rng.randint(1, 50, size=n).astype(np.int64)
    tokens = rng.randint(0, 50000, size=int(n_tok.sum()) if n else 0).astype(np.int64)
    doc_ids = [f"doc-{i:012d}" for i in range(n)]
    blob = encode_bucket(ts, n_tok, tokens, doc_ids)
    ts2, n_tok2, tokens2, ids2 = decode_bucket(blob)
    np.testing.assert_array_equal(ts2, ts)
    np.testing.assert_array_equal(n_tok2, n_tok)
    np.testing.assert_array_equal(tokens2, tokens)
    assert ids2 == doc_ids


def test_compression_ratio_on_regular_grid():
    """Regular minute grid + near-constant values → dod==0 and tiny
    XOR widths; blob must be far below raw size."""
    n = 100_000
    ts = (np.arange(n, dtype=np.int64) * 60_000_000) + 1_700_000_000_000_000
    n_tok = np.full(n, 128, dtype=np.int64)
    n_tok[::97] = 129  # slight variation
    tokens = np.zeros(0, dtype=np.int64)
    blob = encode_bucket(ts, np.zeros(n, dtype=np.int64) + n_tok * 0, tokens, [""] * n)
    # ts-only comparison: raw = 8 bytes/pt for ts alone
    assert len(blob) < n * 8 * 0.05, f"blob {len(blob)} bytes vs raw {n*8}"


def test_unicode_doc_ids():
    ts = np.array([1, 2], dtype=np.int64)
    n_tok = np.array([1, 1], dtype=np.int64)
    tokens = np.array([7, 9], dtype=np.int64)
    ids = ["π-doc", "emoji-🎯"]
    _, _, _, ids2 = decode_bucket(encode_bucket(ts, n_tok, tokens, ids))
    assert ids2 == ids
