"""Bitstream encode/decode tests: bit-exact MSB-first order, numpy vs native
C++ cross-validation, round trips on varied data shapes."""

import numpy as np
import pytest

from datacomp_tpu import native
from datacomp_tpu.core import (
    build_codebook,
    decode_bitstream_py,
    encode_bitstream,
    encoded_size_bits,
)


def mk(data):
    data = np.asarray(data, dtype=np.uint8)
    hist = np.bincount(data, minlength=256).astype(np.int64)
    lens, codes = build_codebook(hist)
    return data, lens, codes


def reference_serial_encode(data, lens, codes):
    """Bit-by-bit oracle mimicking the reference BitOutputStream exactly."""
    bits = []
    for b in data:
        l, c = int(lens[b]), int(codes[b])
        for i in range(l - 1, -1, -1):
            bits.append((c >> i) & 1)
    out = bytearray()
    cur, n = 0, 0
    for bit in bits:
        cur = (cur << 1) | bit
        n += 1
        if n == 8:
            out.append(cur)
            cur, n = 0, 0
    if n:
        out.append(cur << (8 - n))
    return bytes(out)


CASES = {
    "ascii": b"hello huffman world, hello again and again",
    "single": b"A" * 333,
    "two-sym": bytes([0, 255] * 100 + [0] * 50),
    "all-bytes": bytes(range(256)) * 3,
    "one-byte": b"x",
}


@pytest.mark.parametrize("name", list(CASES))
def test_numpy_encode_matches_serial_oracle(name):
    data, lens, codes = mk(np.frombuffer(CASES[name], np.uint8))
    assert encode_bitstream(data, lens, codes) == reference_serial_encode(data, lens, codes)


@pytest.mark.parametrize("name", list(CASES))
def test_native_encode_matches_numpy(name):
    if not native.is_available():
        pytest.skip("native codec unavailable")
    data, lens, codes = mk(np.frombuffer(CASES[name], np.uint8))
    assert native.encode(data, lens, codes) == encode_bitstream(data, lens, codes)


@pytest.mark.parametrize("name", list(CASES))
def test_roundtrip_py_decoder(name):
    data, lens, codes = mk(np.frombuffer(CASES[name], np.uint8))
    enc = encode_bitstream(data, lens, codes)
    assert np.array_equal(decode_bitstream_py(enc, data.size, lens), data)


@pytest.mark.parametrize("name", list(CASES))
def test_roundtrip_native_decoder(name):
    if not native.is_available():
        pytest.skip("native codec unavailable")
    data, lens, codes = mk(np.frombuffer(CASES[name], np.uint8))
    enc = encode_bitstream(data, lens, codes)
    assert np.array_equal(native.decode(enc, data.size, lens), data)


def test_random_roundtrips(rng):
    if not native.is_available():
        pytest.skip("native codec unavailable")
    for _ in range(20):
        n = int(rng.integers(1, 60_000))
        nsym = int(rng.integers(1, 257))
        data = rng.integers(0, nsym, n).astype(np.uint8)
        data, lens, codes = mk(data)
        enc = encode_bitstream(data, lens, codes)
        assert len(enc) == (encoded_size_bits(data, lens) + 7) // 8
        assert native.encode(data, lens, codes) == enc
        assert np.array_equal(native.decode(enc, n, lens), data)


def test_long_codes_roundtrip():
    """Fibonacci-like frequencies force deep (>16-bit) codes, exercising the
    native decoder's long-code fallback path."""
    f = np.zeros(256, dtype=np.int64)
    a, b = 1, 1
    for s in range(24):
        f[s] = a
        a, b = b, a + b
    lens, codes = build_codebook(f)
    assert lens.max() > 16
    data = np.repeat(np.arange(24, dtype=np.uint8), 3)
    enc = encode_bitstream(data, lens, codes)
    assert np.array_equal(decode_bitstream_py(enc, data.size, lens), data)
    if native.is_available():
        assert native.encode(data, lens, codes) == enc
        assert np.array_equal(native.decode(enc, data.size, lens), data)


def test_empty_input():
    data, lens, codes = mk(np.zeros(0, dtype=np.uint8))
    assert encode_bitstream(data, lens, codes) == b""
    assert decode_bitstream_py(b"", 0, lens).size == 0


def test_corrupt_stream_detected():
    if not native.is_available():
        pytest.skip("native codec unavailable")
    # deep codebook so invalid prefixes exist
    f = np.zeros(256, dtype=np.int64)
    a, b = 1, 1
    for s in range(24):
        f[s] = a
        a, b = b, a + b
    lens, codes = build_codebook(f)
    data = np.repeat(np.arange(24, dtype=np.uint8), 5)
    enc = bytearray(encode_bitstream(data, lens, codes))
    enc = enc[: len(enc) // 2]  # truncate -> runs out of bits
    with pytest.raises(ValueError):
        native.decode(bytes(enc), data.size, lens)
