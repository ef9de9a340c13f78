"""Device-op tests (run on the CPU backend via conftest): histogram, on-device
codebook, encoder bit-exactness vs the host oracle, gap-array decoder."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from datacomp_tpu.core import build_codebook, encode_bitstream  # noqa: E402
from datacomp_tpu.core.huffman import (  # noqa: E402
    build_code_lengths,
    canonical_codes_from_lengths,
    validate_lengths,
)
from datacomp_tpu.ops import (  # noqa: E402
    build_decode_tables,
    decode_device,
    device_canonical_codes,
    device_code_lengths,
    histogram_device,
    payload_to_words,
    words_to_bytes,
)
from datacomp_tpu.ops.encode_scan_oracle import (  # noqa: E402 — test oracle
    encode_device_scan_oracle,
)
from datacomp_tpu.utils.testdata import generate_bytes  # noqa: E402


class TestHistogram:
    @pytest.mark.parametrize("n,cap", [(1000, 1024), (65536, 65536), (0, 512), (1, 8)])
    def test_matches_bincount(self, rng, n, cap):
        data = rng.integers(0, 256, cap).astype(np.uint8)
        h = np.asarray(histogram_device(jnp.asarray(data), jnp.int32(n)))
        assert np.array_equal(h, np.bincount(data[:n], minlength=256))

    def test_multi_tile_path(self, rng):
        data = rng.integers(0, 256, 1 << 17).astype(np.uint8)
        h = np.asarray(histogram_device(jnp.asarray(data), jnp.int32(data.size), tile=1 << 14))
        assert np.array_equal(h, np.bincount(data, minlength=256))


class TestHistogramPallas:
    """Pallas packed-8 kernel, run through the interpreter on the CPU tier
    (compiled through Mosaic on real TPU — see test_tpu_hardware.py)."""

    @pytest.mark.parametrize(
        "cap,n",
        [(1 << 18, 1 << 18), (1 << 18, 200_001), (1 << 18, 0), (1 << 20, 1 << 19)],
    )
    def test_matches_bincount(self, rng, cap, n):
        from datacomp_tpu.ops.histogram_pallas import histogram_pallas

        data = rng.integers(0, 256, cap).astype(np.uint8)
        h = np.asarray(
            histogram_pallas(jnp.asarray(data), jnp.int32(n), rows=512, interpret=True)
        )
        assert np.array_equal(h, np.bincount(data[:n], minlength=256))

    def test_vmapped_batches(self, rng):
        """vmap prepends a batch axis to the pallas grid; the accumulator
        zero-init keys off ``pl.program_id(0)``, which must keep meaning the
        first USER grid axis (jax filters ``vmapped_dims`` out of the
        kernel-visible grid indices).  Regression test for a suspected
        stale-accumulator bug under vmap (advisor r2): every batch element
        must histogram its OWN data across a multi-step grid."""
        from datacomp_tpu.ops.histogram_pallas import histogram_pallas

        B, cap = 3, 1 << 15  # rows=64 -> 4 grid steps per batch element
        data = rng.integers(0, 256, (B, cap)).astype(np.uint8)
        valid = np.array([cap, cap - 12345, 7], np.int32)
        out = np.asarray(
            jax.vmap(
                lambda d, v: histogram_pallas(d, v, rows=64, interpret=True)
            )(jnp.asarray(data), jnp.asarray(valid))
        )
        for b in range(B):
            want = np.bincount(data[b, : valid[b]], minlength=256)
            assert np.array_equal(out[b], want), f"batch {b} corrupt"

    def test_segments_beyond_exact_bound(self, rng):
        """Chunks past the 2^24 f32-exact bound split into exact segments."""
        import importlib

        hp = importlib.import_module("datacomp_tpu.ops.histogram_pallas")
        old = hp._MAX_BYTES_EXACT
        hp._MAX_BYTES_EXACT = 1 << 17  # shrink the bound so the test is fast
        try:
            data = rng.integers(0, 256, (1 << 18) + 64).astype(np.uint8)
            n = (1 << 17) + 12345  # valid_len straddles a segment boundary
            h = np.asarray(
                hp.histogram_pallas.__wrapped__(  # bypass jit: bound is read at trace
                    jnp.asarray(data), jnp.int32(n), 512, True
                )
            )
            assert np.array_equal(h, np.bincount(data[:n], minlength=256))
        finally:
            hp._MAX_BYTES_EXACT = old


class TestDeviceCodebook:
    def test_optimal_and_canonical(self, rng):
        for _ in range(15):
            nsym = int(rng.integers(1, 257))
            f = np.zeros(256, np.int64)
            syms = rng.choice(256, nsym, replace=False)
            f[syms] = rng.integers(1, 100_000, nsym)
            dl = np.asarray(device_code_lengths(jnp.asarray(f, dtype=jnp.int32)))
            assert validate_lengths(dl)
            if nsym >= 2:
                hl = build_code_lengths(f, mode="java")
                assert int(f @ dl) == int(f @ hl)  # same optimal total bits
            else:
                assert dl[syms[0]] == 1 and dl.sum() == 1
            dc = np.asarray(device_canonical_codes(jnp.asarray(dl))).astype(np.uint32)
            assert np.array_equal(dc, canonical_codes_from_lengths(dl))

    def test_empty_histogram(self):
        dl = np.asarray(device_code_lengths(jnp.zeros(256, jnp.int32)))
        assert (dl == 0).all()


class TestEncodeScanOracle:
    """The scan-formulation encoder is a DIFFERENTIAL ORACLE (not exported
    from datacomp_tpu.ops): an independent device implementation the
    production tree-merge encoder is cross-checked against below."""

    @pytest.mark.parametrize("kind", ["text", "compressible", "random", "skewed"])
    @pytest.mark.parametrize("n", [1, 97, 30_000])
    def test_bit_exact_vs_host(self, kind, n):
        data = np.frombuffer(generate_bytes(kind, n), np.uint8)
        N = 32768
        padded = np.zeros(N, np.uint8)
        padded[:n] = data
        lens, codes = build_codebook(np.bincount(data, minlength=256).astype(np.int64))
        words, total_bits = encode_device_scan_oracle(
            jnp.asarray(padded), jnp.int32(n), jnp.asarray(lens), jnp.asarray(codes), N
        )
        assert words_to_bytes(np.asarray(words), int(total_bits)) == encode_bitstream(
            data, lens, codes
        )

    def test_empty(self):
        words, tb = encode_device_scan_oracle(
            jnp.zeros(1024, jnp.uint8), jnp.int32(0),
            jnp.zeros(256, jnp.int32), jnp.zeros(256, jnp.uint32), 1024,
        )
        assert int(tb) == 0

    def test_gaps_match_prefix_sum(self):
        data = np.frombuffer(generate_bytes("text", 8000), np.uint8)
        N = 8192
        padded = np.zeros(N, np.uint8)
        padded[: data.size] = data
        lens, codes = build_codebook(np.bincount(data, minlength=256).astype(np.int64))
        _, _, gaps = encode_device_scan_oracle(
            jnp.asarray(padded), jnp.int32(data.size),
            jnp.asarray(lens), jnp.asarray(codes), N, 512,
        )
        l64 = lens.astype(np.int64)[data]
        starts = np.cumsum(l64) - l64
        expect = starts[::512]
        assert np.array_equal(np.asarray(gaps)[: expect.size], expect)


class TestDecodeDevice:
    @pytest.mark.parametrize("kind", ["text", "skewed", "compressible"])
    def test_roundtrip(self, kind):
        S = 512
        data = np.frombuffer(generate_bytes(kind, 20_000), np.uint8)
        lens, codes = build_codebook(np.bincount(data, minlength=256).astype(np.int64))
        enc = encode_bitstream(data, lens, codes)
        l64 = lens.astype(np.int64)[data]
        starts = np.cumsum(l64) - l64
        gaps = starts[::S].astype(np.uint32)
        Mpad = 64
        gpad = np.zeros(Mpad, np.uint32)
        gpad[: gaps.size] = gaps
        limits, adj, sym = build_decode_tables(lens)
        from datacomp_tpu.ops import syms_per_refill
        maxlen = int(lens.max())
        tried = set()
        for k in {1, 2, syms_per_refill(maxlen, S)}:
            if k * maxlen > 32 and k > 1:
                continue  # refill cannot sustain worst-case consumption
            if S % k or k in tried:
                continue
            tried.add(k)
            out = np.asarray(
                decode_device(
                    jnp.asarray(payload_to_words(enc)), jnp.asarray(gpad),
                    jnp.asarray(limits), jnp.asarray(adj), jnp.asarray(sym),
                    S, Mpad, syms_per_step=k,
                )
            )
            assert np.array_equal(out[: data.size], data), f"k={k} mismatch"

    @pytest.mark.parametrize("kind", ["text", "skewed", "random"])
    @pytest.mark.parametrize("refill_words", [2, 4, 8])
    def test_wide_refill_roundtrip(self, kind, refill_words):
        """W-word row refills (the per-index gather amortization) decode
        bit-identically, including mid-word gap offsets and deep codebooks."""
        from datacomp_tpu.ops import cmp_len_bucket, syms_per_refill

        S = 504  # 2^3*3^2*7: divisible by the wide per-step symbol counts
        data = np.frombuffer(generate_bytes(kind, 33_333), np.uint8)
        lens, codes = build_codebook(np.bincount(data, minlength=256).astype(np.int64))
        maxlen = int(lens.max())
        enc = encode_bitstream(data, lens, codes)
        l64 = lens.astype(np.int64)[data]
        starts = np.cumsum(l64) - l64
        gaps = starts[::S].astype(np.uint32)
        Mpad = 80
        gpad = np.zeros(Mpad, np.uint32)
        gpad[: gaps.size] = gaps
        limits, adj, sym = build_decode_tables(lens)
        k = syms_per_refill(maxlen, S, refill_words)
        assert k > syms_per_refill(maxlen, S, 1) or refill_words == 2
        out = np.asarray(
            decode_device(
                jnp.asarray(payload_to_words(enc)), jnp.asarray(gpad),
                jnp.asarray(limits), jnp.asarray(adj), jnp.asarray(sym),
                S, Mpad, syms_per_step=k, cmp_len=cmp_len_bucket(maxlen),
                refill_words=refill_words,
            )
        )
        assert np.array_equal(out[: data.size], data)

    def test_table_rejects_deep_codes(self):
        f = np.zeros(256, np.int64)
        a, b = 1, 1
        for s in range(26):
            f[s] = a
            a, b = b, a + b
        lens, _ = build_codebook(f)
        assert lens.max() > 16
        with pytest.raises(ValueError):
            build_decode_tables(lens)


class TestEncodeMerge:
    """Gather-free tree-merge encoder (the production device encode path)."""

    @pytest.mark.parametrize("kind", ["text", "compressible", "random", "skewed"])
    @pytest.mark.parametrize("n", [1, 31, 32, 97, 30_000])
    def test_bit_exact_vs_host(self, kind, n):
        from datacomp_tpu.ops import encode_device_merge

        data = np.frombuffer(generate_bytes(kind, n), np.uint8)
        N = 32768
        padded = np.zeros(N, np.uint8)
        padded[:n] = data
        lens, codes = build_codebook(np.bincount(data, minlength=256).astype(np.int64))
        words, tb, gaps = encode_device_merge(
            jnp.asarray(padded), jnp.int32(n), jnp.asarray(lens),
            jnp.asarray(codes), N, 512,
        )
        assert words_to_bytes(np.asarray(words), int(tb)) == encode_bitstream(data, lens, codes)
        l64 = lens.astype(np.int64)[data]
        starts = np.cumsum(l64) - l64
        exp = starts[::512]
        assert np.array_equal(np.asarray(gaps)[: exp.size], exp)

    @pytest.mark.parametrize("slots", [18, 33])
    def test_max_slots_buckets(self, slots):
        from datacomp_tpu.ops import encode_device_merge

        data = np.frombuffer(generate_bytes("text", 8000), np.uint8)
        N = 8192
        padded = np.zeros(N, np.uint8)
        padded[: data.size] = data
        lens, codes = build_codebook(np.bincount(data, minlength=256).astype(np.int64))
        assert int(lens.max()) + 2 <= slots
        words, tb = encode_device_merge(
            jnp.asarray(padded), jnp.int32(data.size), jnp.asarray(lens),
            jnp.asarray(codes), N, max_slots=slots,
        )
        assert words_to_bytes(np.asarray(words), int(tb)) == encode_bitstream(data, lens, codes)

    @pytest.mark.parametrize("kind,max_len,slots", [
        # m=8 bucket: the depth-bounded merge tree's tightest shapes,
        # including random data whose all-8-bit codes make unit bit-lengths
        # hit EXACT word multiples (la ≡ 0 mod 32 — the wo_max boundary)
        ("random", 8, 10),
        ("text", 8, 10),
        ("compressible", 8, 10),
        ("text", 16, 18),
        ("skewed", 16, 18),
    ])
    def test_depth_bounded_merge_bit_exact(self, kind, max_len, slots):
        """max_slots also bounds the merge tree's splice loops and buffer
        widths (round 5); every bucket must stay bit-identical to the host
        stream."""
        from datacomp_tpu.ops import encode_device_merge

        data = np.frombuffer(generate_bytes(kind, 30_000), np.uint8)
        N = 32768
        padded = np.zeros(N, np.uint8)
        padded[: data.size] = data
        lens, codes = build_codebook(
            np.bincount(data, minlength=256).astype(np.int64),
            mode="fast", max_len=max_len,
        )
        assert int(lens.max()) <= max_len
        words, tb, gaps = encode_device_merge(
            jnp.asarray(padded), jnp.int32(data.size), jnp.asarray(lens),
            jnp.asarray(codes), N, 512, max_slots=slots,
        )
        assert words_to_bytes(np.asarray(words), int(tb)) == encode_bitstream(
            data, lens, codes
        )
        l64 = lens.astype(np.int64)[data]
        starts = np.cumsum(l64) - l64
        exp = starts[::512]
        assert np.array_equal(np.asarray(gaps)[: exp.size], exp)

    @pytest.mark.parametrize("kind", ["text", "random", "skewed"])
    def test_window_scatter_bit_exact(self, kind):
        """window_scatter=True places each group's owned words with ONE
        windowed scatter-ADD (1 sorted index per group, dead slots masked
        to zero).  Measured 22x SLOWER than the chained unique-set form on
        v5e (1033 vs 46 ms/16 MB, round-5 A/B) — kept as the tested
        mechanism that refuted the fewer-indices hypothesis; never
        production.  Must stay bit-identical to the host stream."""
        from datacomp_tpu.ops import encode_device_merge, slot_bucket

        data = np.frombuffer(generate_bytes(kind, 30_000), np.uint8)
        N = 32768
        padded = np.zeros(N, np.uint8)
        padded[: data.size] = data
        lens, codes = build_codebook(np.bincount(data, minlength=256).astype(np.int64))
        words, tb, gaps = encode_device_merge(
            jnp.asarray(padded), jnp.int32(data.size), jnp.asarray(lens),
            jnp.asarray(codes), N, 512, max_slots=slot_bucket(int(lens.max())),
            window_scatter=True,
        )
        assert words_to_bytes(np.asarray(words), int(tb)) == encode_bitstream(
            data, lens, codes
        )

    @pytest.mark.parametrize("kind", ["text", "random", "skewed"])
    def test_fused_scatter_bit_exact(self, kind):
        """fused_scatter=True places every slot's owned words with ONE
        unique-set scatter; the stream must stay bit-identical to the host
        encoder and to the chained-scatter formulation."""
        from datacomp_tpu.ops import encode_device_merge

        data = np.frombuffer(generate_bytes(kind, 30_000), np.uint8)
        N = 32768
        padded = np.zeros(N, np.uint8)
        padded[: data.size] = data
        lens, codes = build_codebook(np.bincount(data, minlength=256).astype(np.int64))
        slots = min(33, int(lens.max()) + 2)
        words, tb, gaps = encode_device_merge(
            jnp.asarray(padded), jnp.int32(data.size), jnp.asarray(lens),
            jnp.asarray(codes), N, 512, max_slots=slots, fused_scatter=True,
        )
        assert words_to_bytes(np.asarray(words), int(tb)) == encode_bitstream(
            data, lens, codes
        )
        w2, tb2, g2 = encode_device_merge(
            jnp.asarray(padded), jnp.int32(data.size), jnp.asarray(lens),
            jnp.asarray(codes), N, 512, max_slots=slots,
        )
        assert int(tb) == int(tb2)
        assert np.array_equal(np.asarray(gaps), np.asarray(g2))
        assert np.array_equal(np.asarray(words), np.asarray(w2))

    def test_matmul_lookup_matches_gather(self, rng):
        from datacomp_tpu.ops.encode_merge import lookup_symbol_tables

        data = rng.integers(0, 256, 50_000).astype(np.uint8)
        lens, codes = build_codebook(np.bincount(data, minlength=256).astype(np.int64))
        l_dev, c_dev = jax.jit(lookup_symbol_tables)(
            jnp.asarray(data, jnp.int32), jnp.asarray(lens), jnp.asarray(codes)
        )
        assert np.array_equal(np.asarray(l_dev), lens[data])
        assert np.array_equal(np.asarray(c_dev), codes[data])

    @pytest.mark.parametrize("kind,code_bits", [
        ("compressible", 8), ("text", 16), ("skewed", 16),
    ])
    def test_plane_packed_lookup_bit_exact(self, kind, code_bits):
        """code_bits packs (len, code) into 2-3 one-hot planes (the encode
        MAC-cost lever); output must stay bit-identical to the host stream."""
        from datacomp_tpu.ops import code_bits_bucket, encode_device_merge

        data = np.frombuffer(generate_bytes(kind, 20_000), np.uint8)
        N = 20_480
        padded = np.zeros(N, np.uint8)
        padded[: data.size] = data
        mode = "fast" if code_bits == 8 else "java"
        lens, codes = build_codebook(
            np.bincount(data, minlength=256).astype(np.int64), mode=mode,
            max_len=8 if code_bits == 8 else 0,
        )
        assert code_bits_bucket(int(lens.max())) == code_bits
        words, tb = encode_device_merge(
            jnp.asarray(padded), jnp.int32(data.size), jnp.asarray(lens),
            jnp.asarray(codes), N, code_bits=code_bits,
        )
        assert words_to_bytes(np.asarray(words), int(tb)) == encode_bitstream(
            data, lens, codes
        )

    def test_empty(self):
        from datacomp_tpu.ops import encode_device_merge

        words, tb = encode_device_merge(
            jnp.zeros(1024, jnp.uint8), jnp.int32(0),
            jnp.zeros(256, jnp.int32), jnp.zeros(256, jnp.uint32), 1024,
        )
        assert int(tb) == 0
        assert not np.asarray(words).any()


class TestEncodeMergeLargeEntropy:
    """Regression: group bit-lengths above 256 overflowed the default (bf16)
    TPU matmul precision in the prefix-sum stage, silently corrupting streams
    for high-entropy chunks (caught by the round-trip checksum).  The cumsum
    matmul now pins precision=HIGHEST; this covers the shape on any backend."""

    def test_random_1mb_bit_exact(self):
        from datacomp_tpu.ops import encode_device_merge

        n = 1 << 20
        # skewed+random mix: the shared codebook gives the random half 9-bit
        # codes, pushing group lengths past 256 bits (the exact failing shape)
        data = np.frombuffer(
            generate_bytes("skewed", n // 2) + generate_bytes("random", n // 2), np.uint8
        )
        lens, codes = build_codebook(np.bincount(data, minlength=256).astype(np.int64))
        # random bytes ⇒ ~8-bit codes ⇒ group lengths ≈ 256-288 bits
        l64 = lens.astype(np.int64)[data]
        gl = np.add.reduceat(l64, np.arange(0, n, 32))
        assert gl.max() > 256
        words, tb = encode_device_merge(
            jnp.asarray(data), jnp.int32(n), jnp.asarray(lens), jnp.asarray(codes),
            (9 * n + 31) // 32 + 2,
        )
        assert int(tb) == int(l64.sum())
        got = words_to_bytes(np.asarray(words)[: (int(tb) + 31) // 32], int(tb))
        assert got == encode_bitstream(data, lens, codes)


class TestSlotBuckets:
    def test_slot_bucket_static(self):
        from datacomp_tpu.ops import SLOT_BUCKETS, slot_bucket

        assert SLOT_BUCKETS == (10, 12, 14, 16, 18, 33)
        assert [slot_bucket(m) for m in (1, 8, 10, 14, 16, 17, 32)] == [
            10, 10, 12, 16, 18, 33, 33
        ]
        # ml=32 must clamp (the old 3-bucket expression raised StopIteration)
        assert slot_bucket(32) == 33

    def test_traced_case_matches_static(self):
        from datacomp_tpu.ops.encode_merge import SLOT_BUCKETS, _slot_case, slot_bucket

        for ml in range(1, 33):
            lens = np.zeros(256, np.int32)
            lens[:2] = [ml, ml]
            idx = int(_slot_case(jnp.asarray(lens)))
            assert SLOT_BUCKETS[idx] == slot_bucket(ml), ml
