"""Deterministic test-data generators.

Byte-exact parity with the reference's fixtures
(``util/TestDataGenerator.java:26-73``): the "random" generator reproduces
``java.util.Random(42).nextBytes`` exactly (48-bit LCG, little-endian byte
extraction from each nextInt), vectorized in numpy via LCG jump-ahead; the
"compressible" generator repeats the same fox/dog pattern.
"""

from __future__ import annotations

import numpy as np

_LCG_MULT = 0x5DEECE66D
_LCG_ADD = 0xB
_LCG_MASK = (1 << 48) - 1

PATTERN = b"The quick brown fox jumps over the lazy dog. "


class JavaRandom:
    """java.util.Random replica (only what nextBytes needs), vectorized."""

    def __init__(self, seed: int):
        self._state = (seed ^ _LCG_MULT) & _LCG_MASK

    def next_ints(self, count: int) -> np.ndarray:
        """``count`` consecutive nextInt() draws as int32, via parallel
        jump-ahead: state_k = A^k·s + C·(A^k−1)/(A−1) (mod 2^48)."""
        if count == 0:
            return np.zeros(0, dtype=np.int32)
        # per-step affine coefficients: state after k+1 steps = a[k]*s + c[k],
        # filled by iterative doubling (compose the first `filled` steps onto
        # the already-computed prefix)
        a = np.empty(count, dtype=np.uint64)
        c = np.empty(count, dtype=np.uint64)
        a[0], c[0] = _LCG_MULT, _LCG_ADD
        filled = 1
        while filled < count:
            take = min(filled, count - filled)
            # compose: state_{i+filled} = a_filled * state_i + c_filled
            af = int(a[filled - 1])
            cf = int(c[filled - 1])
            a[filled : filled + take] = (a[:take] * np.uint64(af)) & np.uint64(_LCG_MASK)
            c[filled : filled + take] = (
                c[:take] * np.uint64(af) + np.uint64(cf)
            ) & np.uint64(_LCG_MASK)
            filled += take
        s = np.uint64(self._state)
        states = (a * s + c) & np.uint64(_LCG_MASK)
        self._state = int(states[-1])
        return (states >> np.uint64(16)).astype(np.uint32).view(np.int32)

    def next_bytes(self, n: int) -> bytes:
        """java.util.Random.nextBytes semantics: 4 little-endian bytes per
        nextInt, tail truncated."""
        nints = (n + 3) // 4
        ints = self.next_ints(nints)
        b = ints.astype("<i4").tobytes()
        return b[:n]


def java_random_bytes(n: int, seed: int = 42) -> bytes:
    return JavaRandom(seed).next_bytes(n)


def generate_random_file(size_mb: int, path: str, seed: int = 42) -> None:
    """Reference parity: 1 MB buffers from Random(42).nextBytes
    (``TestDataGenerator.generateRandomFile:26-50``). Note the reference
    reuses a full 1 MB draw even for a short final write — replicated here."""
    size = size_mb * 1024 * 1024
    rnd = JavaRandom(seed)
    buf_size = 1024 * 1024
    with open(path, "wb") as f:
        remaining = size
        while remaining > 0:
            to_write = min(buf_size, remaining)
            buf = rnd.next_bytes(buf_size)
            f.write(buf[:to_write])
            remaining -= to_write


def generate_compressible_file(size_mb: int, path: str) -> None:
    """Reference parity: repeats the fox/dog pattern
    (``TestDataGenerator.generateCompressibleFile:55-73``)."""
    size = size_mb * 1024 * 1024
    reps = size // len(PATTERN) + 1
    data = (PATTERN * reps)[:size]
    with open(path, "wb") as f:
        f.write(data)


def generate_bytes(kind: str, n: int, seed: int = 42) -> bytes:
    """In-memory generator used by tests/benchmarks: kinds 'random',
    'compressible', 'text', 'zeros', 'skewed'."""
    if kind == "random":
        return java_random_bytes(n, seed)
    if kind == "compressible":
        reps = n // len(PATTERN) + 1
        return (PATTERN * reps)[:n]
    if kind == "zeros":
        return b"\x00" * n
    if kind == "text":
        rng = np.random.default_rng(seed)
        # English-letter-frequency-ish text
        letters = np.frombuffer(b"etaoinshrdlcumwfgypbvkjxqz ", dtype=np.uint8)
        p = np.array([12.7, 9.1, 8.2, 7.5, 7.0, 6.7, 6.3, 6.1, 6.0, 4.3, 4.0, 2.8,
                      2.8, 2.4, 2.4, 2.2, 2.0, 2.0, 1.9, 1.5, 1.0, 0.8, 0.2, 0.2,
                      0.1, 0.1, 18.0])
        p = p / p.sum()
        return rng.choice(letters, size=n, p=p).tobytes()
    if kind == "skewed":
        rng = np.random.default_rng(seed)
        vals = rng.geometric(0.05, size=n).clip(1, 256) - 1
        return vals.astype(np.uint8).tobytes()
    raise ValueError(f"unknown test-data kind: {kind}")
