"""Canonical Huffman codebook tests.

Mirrors the reference's test strategy (``core/CanonicalHuffmanTest.java`` and
``core/HuffmanPropertyTest.java``): uniform/skewed distributions, the
single-symbol and empty edge cases, the canonical consecutive-codes property,
code uniqueness, frequency↔length monotonicity, completeness — plus parity
checks of the Java-PriorityQueue-exact tree build against an independent
reference heap implementation.
"""

import heapq

import numpy as np
import pytest

from datacomp_tpu.core import (
    build_code_lengths,
    build_codebook,
    canonical_codes_from_lengths,
    validate_lengths,
)


def ref_lengths_any_optimal(freqs):
    """Optimal Huffman total length via a plain heapq (tie-breaks differ,
    totals must match)."""
    items = [(int(f), i) for i, f in enumerate(freqs) if f > 0]
    if len(items) <= 1:
        return None
    heap = [(f, i, 0) for i, (f, s) in enumerate(items)]
    # store (freq, uid, ...) trees
    trees = [(f, [s]) for f, s in items]
    h = [(f, i) for i, (f, _) in enumerate(trees)]
    heapq.heapify(h)
    depth = {s: 0 for _, s in items}
    nxt = len(trees)
    while len(h) > 1:
        f1, i1 = heapq.heappop(h)
        f2, i2 = heapq.heappop(h)
        syms = trees[i1][1] + trees[i2][1]
        for s in syms:
            depth[s] += 1
        trees.append((f1 + f2, syms))
        heapq.heappush(h, (f1 + f2, nxt))
        nxt += 1
    return depth


class TestBuildCodeLengths:
    def test_empty_histogram(self):
        lens = build_code_lengths(np.zeros(256, dtype=np.int64))
        assert (lens == 0).all()

    def test_single_symbol_gets_one_bit(self):
        f = np.zeros(256, dtype=np.int64)
        f[65] = 1000
        lens = build_code_lengths(f)
        assert lens[65] == 1
        assert lens.sum() == 1

    def test_two_symbols(self):
        f = np.zeros(256, dtype=np.int64)
        f[0], f[255] = 7, 3
        lens, codes = build_codebook(f)
        assert lens[0] == 1 and lens[255] == 1
        assert {int(codes[0]), int(codes[255])} == {0, 1}

    def test_uniform_distribution_is_balanced(self):
        f = np.full(256, 100, dtype=np.int64)
        lens = build_code_lengths(f)
        assert (lens == 8).all()

    def test_skewed_shorter_codes_for_frequent(self):
        f = np.zeros(256, dtype=np.int64)
        f[:8] = [1000, 400, 200, 100, 50, 25, 12, 6]
        lens = build_code_lengths(f)
        used = lens[:8]
        # monotonic: higher frequency -> length no longer than less frequent
        assert all(used[i] <= used[i + 1] for i in range(7))

    def test_optimal_total_length_matches_heapq_reference(self, rng):
        for _ in range(25):
            nsym = int(rng.integers(2, 256))
            f = np.zeros(256, dtype=np.int64)
            syms = rng.choice(256, nsym, replace=False)
            f[syms] = rng.integers(1, 10_000, nsym)
            lens = build_code_lengths(f, mode="java")
            ref_depth = ref_lengths_any_optimal(f)
            total = sum(int(f[s]) * int(lens[s]) for s in syms)
            ref_total = sum(int(f[s]) * ref_depth[s] for s in syms)
            assert total == ref_total

    def test_fast_mode_same_total_length(self, rng):
        for _ in range(25):
            nsym = int(rng.integers(2, 256))
            f = np.zeros(256, dtype=np.int64)
            syms = rng.choice(256, nsym, replace=False)
            f[syms] = rng.integers(1, 10_000, nsym)
            lj = build_code_lengths(f, mode="java")
            lf = build_code_lengths(f, mode="fast")
            assert int(f @ lj) == int(f @ lf)
            assert validate_lengths(lf)

    def test_kraft_equality_holds(self, rng):
        for _ in range(10):
            f = rng.integers(0, 1000, 256).astype(np.int64)
            if np.count_nonzero(f) < 2:
                continue
            lens = build_code_lengths(f)
            used = lens[lens > 0]
            assert abs(np.sum(2.0 ** (-used.astype(float))) - 1.0) < 1e-9


class TestCanonicalCodes:
    def test_same_length_codes_consecutive(self, rng):
        """The explicit canonical-property check from the reference tests
        (CanonicalHuffmanTest.java:69-94)."""
        f = rng.integers(1, 1000, 256).astype(np.int64)
        lens, codes = build_codebook(f)
        for ln in np.unique(lens[lens > 0]):
            cs = np.sort(codes[lens == ln].astype(np.int64))
            assert (np.diff(cs) == 1).all()

    def test_all_codes_unique_per_length(self, rng):
        f = rng.integers(0, 50, 256).astype(np.int64)
        f[f < 5] = 0
        if np.count_nonzero(f) < 2:
            f[:3] = [10, 5, 1]
        lens, codes = build_codebook(f)
        for ln in np.unique(lens[lens > 0]):
            cs = codes[lens == ln]
            assert len(np.unique(cs)) == len(cs)

    def test_prefix_free(self, rng):
        f = rng.integers(0, 100, 256).astype(np.int64)
        lens, codes = build_codebook(f)
        entries = [
            (int(lens[s]), int(codes[s])) for s in range(256) if lens[s] > 0
        ]
        for la, ca in entries:
            for lb, cb in entries:
                if (la, ca) == (lb, cb) or la > lb:
                    continue
                assert (cb >> (lb - la)) != ca or (la, ca) == (lb, cb)

    def test_roundtrip_lengths_to_codes_deterministic(self):
        lens = np.zeros(256, dtype=np.int32)
        lens[10], lens[20], lens[30], lens[40] = 1, 2, 3, 3
        codes = canonical_codes_from_lengths(lens)
        assert int(codes[10]) == 0b0
        assert int(codes[20]) == 0b10
        assert int(codes[30]) == 0b110
        assert int(codes[40]) == 0b111

    def test_completeness_every_used_symbol_has_code(self, rng):
        f = rng.integers(0, 1000, 256).astype(np.int64)
        lens, codes = build_codebook(f)
        assert ((f > 0) == (lens > 0)).all()


class TestValidation:
    def test_rejects_bad_shapes(self):
        with pytest.raises(ValueError):
            build_code_lengths(np.zeros(255, dtype=np.int64))
        with pytest.raises(ValueError):
            canonical_codes_from_lengths(np.zeros(10, dtype=np.int32))

    def test_validate_lengths(self):
        lens = np.zeros(256, dtype=np.int32)
        assert validate_lengths(lens)
        lens[0] = 1
        lens[1] = 1
        assert validate_lengths(lens)
        lens[2] = 1  # Kraft violation
        assert not validate_lengths(lens)
