"""TPU service tests on the CPU JAX backend: round trips in every
format/codebook mode, byte-identity of v1 output vs the CPU service
(mirroring the reference's GPU/CPU file compatibility), fallback chain, and
the factory selection policy."""

import os

import numpy as np
import pytest

pytest.importorskip("jax")

from datacomp_tpu.config import load_config  # noqa: E402
from datacomp_tpu.core import read_container  # noqa: E402
from datacomp_tpu.services.cpu_service import CpuCompressionService  # noqa: E402
from datacomp_tpu.services.factory import (  # noqa: E402
    create_compression_service,
    create_frequency_service,
)
from datacomp_tpu.services.tpu_service import (  # noqa: E402
    TpuCompressionService,
    TpuFrequencyService,
)
from datacomp_tpu.utils.testdata import generate_bytes  # noqa: E402


def cfg(**over):
    base = {"chunk_size_mb": 1}
    base.update(over)
    return load_config(compression=base)


class TestTpuFrequencyService:
    def test_histogram_matches(self, rng):
        svc = TpuFrequencyService(cfg())
        data = rng.integers(0, 256, 100_000).astype(np.uint8)
        assert np.array_equal(
            svc.compute_histogram(data), np.bincount(data, minlength=256)
        )

    def test_offset_window(self, rng):
        svc = TpuFrequencyService(cfg())
        data = rng.integers(0, 256, 10_000).astype(np.uint8)
        h = svc.compute_histogram(data, offset=100, length=5000)
        assert np.array_equal(h, np.bincount(data[100:5100], minlength=256))

    def test_available(self):
        assert TpuFrequencyService(cfg()).is_available()


@pytest.mark.parametrize(
    "version,mode",
    [(1, "java"), (1, "fast"), (2, "java"), (2, "device")],
)
def test_roundtrip_modes(tmp_path, version, mode):
    c = cfg(format_version=version, codebook_mode=mode)
    svc = TpuCompressionService(c)
    data = generate_bytes("text", 1536 * 1024 + 13)
    src = tmp_path / "x.bin"
    src.write_bytes(data)
    dcz = str(src) + ".dcz"
    out = str(src) + ".out"
    svc.compress(str(src), dcz)
    h, _ = read_container(dcz)
    assert h.version == version
    if version >= 2:
        assert h.subblock_symbols > 0
        assert h.chunks[0].gap_bits is not None and h.chunks[0].gap_bits.size > 0
    svc.decompress(dcz, out)
    assert open(out, "rb").read() == data
    svc.close()


def test_v1_files_byte_identical_to_cpu(tmp_path):
    """The reference's CPU and GPU services produce interchangeable files;
    here v1 output is bit-for-bit identical across backends."""
    c = cfg(format_version=1, codebook_mode="java")
    data = generate_bytes("text", 512 * 1024)
    src = tmp_path / "x.bin"
    src.write_bytes(data)
    t, u = str(src) + ".tpu.dcz", str(src) + ".cpu.dcz"
    with TpuCompressionService(c) as tsvc:
        tsvc.compress(str(src), t)
    with CpuCompressionService(c) as csvc:
        csvc.compress(str(src), u)
    assert open(t, "rb").read() == open(u, "rb").read()


def test_cross_backend_decode(tmp_path):
    """CPU-written v2 file decodes on the TPU service and vice versa."""
    c = cfg(format_version=2)
    data = generate_bytes("skewed", 700_000)
    src = tmp_path / "x.bin"
    src.write_bytes(data)
    a = str(src) + ".a.dcz"
    with CpuCompressionService(c) as csvc:
        csvc.compress(str(src), a)
    with TpuCompressionService(c) as tsvc:
        tsvc.decompress(a, str(src) + ".out")
    assert open(str(src) + ".out", "rb").read() == data


def test_fallback_on_encode_error(tmp_path, monkeypatch):
    """Chain level 3: a device-pipeline failure falls back to CPU and still
    produces a valid archive."""
    c = cfg()
    svc = TpuCompressionService(c)
    monkeypatch.setattr(
        svc._codec, "encode_chunk",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("injected device failure")),
    )
    data = generate_bytes("text", 100_000)
    src = tmp_path / "x.bin"
    src.write_bytes(data)
    dcz = str(src) + ".dcz"
    svc.compress(str(src), dcz)  # must not raise
    with CpuCompressionService(c) as csvc:
        csvc.decompress(dcz, str(src) + ".out")
    assert open(str(src) + ".out", "rb").read() == data
    svc.close()


def test_fallback_disabled_raises(tmp_path, monkeypatch):
    c = load_config(
        compression={"chunk_size_mb": 1}, device={"fallback_on_error": False}
    )
    svc = TpuCompressionService(c)
    monkeypatch.setattr(
        svc._codec, "encode_chunk",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("injected")),
    )
    src = tmp_path / "x.bin"
    src.write_bytes(b"data" * 100)
    with pytest.raises(Exception):
        svc.compress(str(src), str(src) + ".dcz")
    svc.close()


def test_deep_codebook_decodes_via_host(tmp_path):
    """Fibonacci frequencies force >16-bit codes; the TPU service must route
    that chunk's decode to the host codec transparently."""
    c = cfg(format_version=2)
    a, b = 1, 1
    blob = bytearray()
    for s in range(26):
        blob.extend(bytes([s]) * a)
        a, b = b, a + b
    src = tmp_path / "deep.bin"
    src.write_bytes(bytes(blob))
    with TpuCompressionService(c) as svc:
        svc.compress(str(src), str(src) + ".dcz")
        svc.decompress(str(src) + ".dcz", str(src) + ".out")
    assert open(str(src) + ".out", "rb").read() == bytes(blob)


def test_max_code_len_keeps_decode_on_device(tmp_path, monkeypatch):
    """With ``max_code_len=12`` the same deep-skew chunk stays on the DEVICE
    decode path: poison the host decoder to prove it is never consulted."""
    c = cfg(format_version=2, codebook_mode="fast", max_code_len=12)
    a, b = 1, 1
    blob = bytearray()
    for s in range(26):
        blob.extend(bytes([s]) * a)
        a, b = b, a + b
    src = tmp_path / "deep.bin"
    src.write_bytes(bytes(blob))
    with TpuCompressionService(c) as svc:
        svc.compress(str(src), str(src) + ".dcz")
        hdr, _ = read_container(str(src) + ".dcz")
        assert all(int(np.asarray(m.code_lengths).max()) <= 12 for m in hdr.chunks)

        import datacomp_tpu.services.cpu_service as cpu_mod

        def _boom(*a, **k):  # pragma: no cover - must not run
            raise AssertionError("host decode consulted for device-decodable chunk")

        monkeypatch.setattr(
            cpu_mod.CpuChunkCodec, "decode_chunk", _boom, raising=True
        )
        svc.decompress(str(src) + ".dcz", str(src) + ".out")
    assert open(str(src) + ".out", "rb").read() == bytes(blob)


class TestFactory:
    def test_force_cpu(self):
        svc = create_compression_service(cfg(), force_cpu=True)
        assert svc.get_service_name() == "CPU Compression"
        svc.close()

    def test_auto_selects_available(self):
        svc = create_compression_service(cfg())
        assert svc.is_available()
        svc.close()

    def test_frequency_factory(self):
        svc = create_frequency_service(cfg(), force_cpu=True)
        assert svc.get_service_name().startswith("CPU")


class TestBatchedPipeline:
    """batch_chunks > 1: several chunks encode in ONE vmapped device program
    (the reference's sliding-window device scheduler re-expressed,
    GpuCompressionService.java:232-320).  Containers must be byte-identical
    to the per-chunk path in every mode, including tail groups smaller than
    the batch (padded to the same static executable)."""

    @pytest.mark.parametrize("version,mode", [(1, "java"), (2, "device")])
    def test_matches_per_chunk_output(self, tmp_path, version, mode):
        data = generate_bytes("text", 5 * 1024 * 1024 + 321)  # 6 chunks: 4 + 2
        src = tmp_path / "b.bin"
        src.write_bytes(data)
        os.utime(src, (1_700_000_000, 1_700_000_000))
        outs = {}
        for bc in (1, 4):
            c = load_config(
                compression={
                    "chunk_size_mb": 1, "format_version": version,
                    "codebook_mode": mode,
                },
                device={"batch_chunks": bc},
            )
            dcz = str(src) + f".b{bc}.dcz"
            with TpuCompressionService(c) as svc:
                assert svc._codec.batch_chunks == bc
                svc.compress(str(src), dcz)
                svc.decompress(dcz, dcz + ".out")
            assert open(dcz + ".out", "rb").read() == data
            outs[bc] = open(dcz, "rb").read()
        assert outs[1] == outs[4]

    def test_mixed_raw_store_group(self, tmp_path):
        """Incompressible chunks are raw-stored host-side; the device batch
        runs thinned + padded, and the container still round-trips."""
        data = (
            generate_bytes("text", 1024 * 1024)
            + generate_bytes("random", 2 * 1024 * 1024)  # raw-store x2
            + generate_bytes("skewed", 1024 * 1024 + 55)
        )
        src = tmp_path / "m.bin"
        src.write_bytes(data)
        c = load_config(
            compression={"chunk_size_mb": 1, "format_version": 2},
            device={"batch_chunks": 4},
        )
        dcz = str(src) + ".dcz"
        with TpuCompressionService(c) as svc:
            svc.compress(str(src), dcz)
            h, _ = read_container(dcz)
            raw = [not m.code_lengths.any() for m in h.chunks]
            assert raw[1] and raw[2]  # the random chunks stored raw
            assert not raw[0] and not raw[-1]
            svc.decompress(dcz, str(src) + ".out")
        assert open(str(src) + ".out", "rb").read() == data

    def test_auto_batch_is_1_on_cpu_platform(self):
        c = load_config(compression={"chunk_size_mb": 1})
        svc = TpuCompressionService(c)
        assert svc._codec.batch_chunks == 1  # auto: CPU platform
        svc.close()

    def test_batched_decode_matches_per_chunk(self, tmp_path):
        """decode_chunk_batch (one vmapped program per depth-bucket group,
        raw-store and host chunks routed around it) returns bit-identical
        output to the per-chunk decoder for a mixed container."""
        from datacomp_tpu.models import StageMetrics
        from datacomp_tpu.services.tpu_service import TpuChunkCodec

        data = (
            generate_bytes("text", 1024 * 1024)
            + generate_bytes("skewed", 1024 * 1024)
            + generate_bytes("random", 1024 * 1024)  # raw-store in v2
            + generate_bytes("compressible", 512 * 1024 + 77)
        )
        src = tmp_path / "d.bin"
        src.write_bytes(data)
        c = load_config(
            compression={"chunk_size_mb": 1, "format_version": 2},
            device={"batch_chunks": 4},
        )
        dcz = str(src) + ".dcz"
        with TpuCompressionService(c) as svc:
            svc.compress(str(src), dcz)
            # round trip through the batched pipeline path itself
            svc.decompress(dcz, dcz + ".out")
        assert open(dcz + ".out", "rb").read() == data

        header, data_start = read_container(dcz)
        with open(dcz, "rb") as f:
            payloads = [
                (f.seek(data_start + m.compressed_offset), f.read(m.compressed_size))[1]
                for m in header.chunks
            ]
        codec = TpuChunkCodec(c)
        batch = codec.decode_chunk_batch(
            payloads, header.chunks, header, StageMetrics()
        )
        for m, out in zip(header.chunks, batch):
            single = codec.decode_chunk(
                payloads[m.index], m, header, StageMetrics()
            )
            assert np.array_equal(out, single), f"chunk {m.index} diverged"
        assert b"".join(np.asarray(o).tobytes() for o in batch) == data


class TestRound4ServiceDesign:
    """Regression pins for the round-4 single-fetch service redesign
    (round-4 verdict weak #4): the fused v2 encode path must keep doing
    exactly ONE blocking ``device_get`` per chunk, the defensive
    ``opt_bits``-divergence refetch must produce correct payloads, and the
    fetch-width bucketing must hit its edges."""

    def _count_device_get(self, monkeypatch):
        import jax

        calls = {"n": 0}
        real = jax.device_get

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(jax, "device_get", counting)
        return calls

    @pytest.mark.parametrize("mode", ["device", "fast"])
    def test_single_fetch_per_chunk(self, tmp_path, monkeypatch, mode):
        """The v2 encode paths fetch metadata AND the payload prefix in ONE
        device_get (each blocking fetch costs a full relay latency; a future
        change that reintroduces a second round trip is exactly the class of
        regression rounds 2→3 suffered)."""
        from datacomp_tpu.models import StageMetrics
        from datacomp_tpu.services.tpu_service import TpuChunkCodec

        codec = TpuChunkCodec(cfg(format_version=2, codebook_mode=mode))
        data = np.frombuffer(generate_bytes("text", 500_000), np.uint8)
        m = StageMetrics()
        codec.encode_chunk(data, m)  # warm: compile + first program load
        calls = self._count_device_get(monkeypatch)
        enc = codec.encode_chunk(data, m)
        assert calls["n"] == 1, (
            f"fused v2 encode ({mode}) performed {calls['n']} blocking "
            "fetches per chunk; the design invariant is ONE"
        )
        assert len(enc.payload) < data.size

    def test_single_fetch_per_batched_group(self, tmp_path, monkeypatch):
        """The batched pipeline fetches every chunk's metadata and payload
        prefixes in ONE device_get per GROUP."""
        from datacomp_tpu.config import load_config
        from datacomp_tpu.models import StageMetrics
        from datacomp_tpu.services.tpu_service import TpuChunkCodec

        c = load_config(
            compression={"chunk_size_mb": 1, "format_version": 2,
                         "codebook_mode": "fast"},
            device={"batch_chunks": 3},
        )
        codec = TpuChunkCodec(c)
        datas = [
            np.frombuffer(generate_bytes(k, 400_000), np.uint8)
            for k in ("text", "compressible", "skewed")
        ]
        m = StageMetrics()
        codec.encode_chunk_batch(datas, m)  # warm
        calls = self._count_device_get(monkeypatch)
        encs = codec.encode_chunk_batch(datas, m)
        assert calls["n"] == 1, (
            f"batched encode performed {calls['n']} blocking fetches for "
            "one group; the design invariant is ONE"
        )
        assert all(len(e.payload) < d.size for e, d in zip(encs, datas))

    @pytest.mark.parametrize("mode", ["device", "fast"])
    def test_opt_bits_divergence_refetch(self, tmp_path, monkeypatch, mode):
        """Force the defensive branch: a prepass that UNDERSTATES opt_bits
        makes the single-fetch prefix too short, and the codec must detect
        the divergence and refetch at the bucketed true width — payload
        still byte-correct (tpu_service.py divergence branch, never
        exercised before round 5)."""
        from datacomp_tpu.models import StageMetrics
        from datacomp_tpu.services.tpu_service import TpuChunkCodec

        codec = TpuChunkCodec(cfg(format_version=2, codebook_mode=mode))
        real_prepass = codec._host_prepass
        real_ub = codec._fetch_words_ub
        ub_calls = []

        def lying_prepass(data, metrics):
            sha, lengths, codes, opt_bits, finished = real_prepass(data, metrics)
            if finished is None and opt_bits is not None:
                opt_bits = max(opt_bits // 8, 1)  # understate 8x
            return sha, lengths, codes, opt_bits, finished

        def counting_ub(opt_bits):
            ub_calls.append(opt_bits)
            return real_ub(opt_bits)

        monkeypatch.setattr(codec, "_host_prepass", lying_prepass)
        monkeypatch.setattr(codec, "_fetch_words_ub", counting_ub)
        data = np.frombuffer(generate_bytes("text", 900_000), np.uint8)
        m = StageMetrics()
        enc = codec.encode_chunk(data, m)
        # branch taken: a second bucketing call at the TRUE bit count
        assert len(ub_calls) == 2 and ub_calls[1] > ub_calls[0], (
            "divergence refetch branch was not taken"
        )
        # payload correct despite the lying prepass: host decode round-trips
        from datacomp_tpu.core.bitio import decode_bitstream_py

        if mode == "fast":
            _sha, lens, codes, _opt, _fin = real_prepass(data, StageMetrics())
            from datacomp_tpu.core import encode_bitstream

            assert enc.payload == encode_bitstream(data, lens, codes)
        restored = decode_bitstream_py(enc.payload, data.size, enc.code_lengths)
        assert np.array_equal(restored, data)

    def test_fetch_words_ub_edges(self):
        """Bucketing edges: exact bucket multiples round to themselves (+1
        safety word pushes exact fits to the next bucket), everything caps
        at out_words."""
        from datacomp_tpu.services.tpu_service import TpuChunkCodec

        codec = TpuChunkCodec(cfg(format_version=2, codebook_mode="fast"))
        b = codec.fetch_bucket_words
        assert b == 1 << 15
        # tiny bit counts -> one bucket
        assert codec._fetch_words_ub(1) == b
        assert codec._fetch_words_ub(32 * (b - 1) - 1) == b
        # nw + 1 safety word just over a bucket boundary -> next bucket
        assert codec._fetch_words_ub(32 * (b - 1)) == b
        assert codec._fetch_words_ub(32 * b) == 2 * b
        # exact multiple of the bucket in words
        assert codec._fetch_words_ub(32 * (2 * b - 1)) == 2 * b
        # cap at out_words regardless of opt_bits
        assert codec._fetch_words_ub(10**12) == codec.out_words
        assert codec._fetch_words_ub(32 * codec.out_words) == codec.out_words
