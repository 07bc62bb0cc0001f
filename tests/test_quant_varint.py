from __future__ import annotations

import numpy as np
import pytest

from whoosh_reloaded_ray.functions.quant import (
    BYTE_TO_LENGTH,
    bytes_to_lengths,
    length_to_byte,
    lengths_to_bytes,
)
from whoosh_reloaded_ray.functions.varint import (
    decode_varints,
    delta_decode,
    delta_encode,
    encode_varints,
)


def test_byte_to_length_table_matches_reference(whoosh):
    from whoosh.util.numeric import byte_to_length, length_to_byte as w_l2b

    for b in range(256):
        assert BYTE_TO_LENGTH[b] == byte_to_length(b), b
    for ln in list(range(0, 2000)) + [5000, 10_000, 99_999, 106_373, 106_374, 200_000, 10**9]:
        assert length_to_byte(ln) == w_l2b(ln), ln
    arr = np.array([0, 1, 2, 3, 27, 28, 106_374, 10**9], dtype=np.int64)
    assert list(lengths_to_bytes(arr)) == [w_l2b(int(x)) for x in arr]
    assert list(bytes_to_lengths(np.arange(256))) == [byte_to_length(b) for b in range(256)]


@pytest.mark.parametrize(
    "vals",
    [
        [],
        [0],
        [1, 127, 128, 129, 16383, 16384, 2**32 - 1, 2**63, 2**64 - 1],
        list(range(1000)),
    ],
)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    buf = encode_varints(arr)
    out = decode_varints(buf, count=len(vals))
    assert list(out) == list(arr)


def test_varint_random_roundtrip():
    rng = np.random.default_rng(7)
    for _ in range(20):
        arr = rng.integers(0, 2**62, size=rng.integers(1, 5000), dtype=np.uint64)
        assert np.array_equal(decode_varints(encode_varints(arr)), arr)


def test_delta_roundtrip():
    rng = np.random.default_rng(11)
    arr = np.sort(rng.integers(0, 2**40, size=1000, dtype=np.uint64))
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)
