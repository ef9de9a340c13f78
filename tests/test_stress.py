"""Stress tests mirroring the reference's documented (manual) system tests
(``docs/CHAPTER5_IMPLEMENTATION_TESTING.md:1313-1661``): N-way concurrent
operations, corruption injection at random offsets, repeated-operation
stability, and a large multi-chunk scalability check."""

import os
import threading

import numpy as np
import pytest

from datacomp_tpu.config import load_config
from datacomp_tpu.services.cpu_service import CpuCompressionService
from datacomp_tpu.utils.testdata import generate_bytes


@pytest.fixture(scope="module")
def cfg():
    return load_config(compression={"chunk_size_mb": 1})


def test_concurrent_operations(tmp_path, cfg):
    """20 concurrent compress/decompress ops on one shared service
    (reference stress: 20-way concurrency, CHAPTER5:1586-1602)."""
    svc = CpuCompressionService(cfg)
    datas = {k: generate_bytes(k, 200_000, seed=7 + i) for i, k in
             enumerate(["text", "random", "skewed", "compressible"])}
    errors = []

    def op(i):
        try:
            kind = list(datas)[i % 4]
            src = tmp_path / f"c{i}.bin"
            src.write_bytes(datas[kind])
            dcz = str(src) + ".dcz"
            out = str(src) + ".out"
            svc.compress(str(src), dcz)
            svc.decompress(dcz, out)
            if open(out, "rb").read() != datas[kind]:
                errors.append(f"op {i}: roundtrip mismatch")
        except Exception as e:  # noqa: BLE001
            errors.append(f"op {i}: {e}")

    threads = [threading.Thread(target=op, args=(i,)) for i in range(20)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    svc.close()
    assert not errors, errors


def test_corruption_injection_sweep(tmp_path, cfg, rng):
    """Bit flips at random payload offsets must always be detected
    (reference: corruption injection, CHAPTER5:1463-1522)."""
    data = generate_bytes("text", 500_000)
    src = tmp_path / "c.bin"
    src.write_bytes(data)
    dcz = str(src) + ".dcz"
    with CpuCompressionService(cfg) as svc:
        svc.compress(str(src), dcz)
        raw = bytearray(open(dcz, "rb").read())
        payload_end = len(raw) - 2000  # stay inside chunk payloads
        detected = 0
        for trial in range(8):
            pos = int(rng.integers(0, payload_end))
            bit = int(rng.integers(0, 8))
            corrupted = bytearray(raw)
            corrupted[pos] ^= 1 << bit
            bad = str(tmp_path / f"bad{trial}.dcz")
            open(bad, "wb").write(bytes(corrupted))
            try:
                svc.decompress(bad, str(tmp_path / f"bad{trial}.out"))
                # flips in padding bits can legitimately decode... but the
                # checksum must still match only if output is identical
                if open(str(tmp_path / f"bad{trial}.out"), "rb").read() != data:
                    pytest.fail("corruption produced wrong output without error")
            except (IOError, ValueError, OSError):
                detected += 1
        assert detected >= 6  # nearly all payload flips must raise


def test_repeated_operations_stable(tmp_path, cfg):
    """100 successive ops on one service: no state leakage between ops
    (reference: 1000-op memory stability, scaled down for CI)."""
    data = generate_bytes("skewed", 50_000)
    src = tmp_path / "r.bin"
    src.write_bytes(data)
    with CpuCompressionService(cfg) as svc:
        for i in range(100):
            dcz = str(tmp_path / "r.dcz")
            svc.compress(str(src), dcz)
            svc.decompress(dcz, str(tmp_path / "r.out"))
        assert open(str(tmp_path / "r.out"), "rb").read() == data


@pytest.mark.slow
def test_large_file_scalability(tmp_path):
    """1 GB multi-chunk file: bounded memory, correct round trip (reference
    sweep: 10 MB → 1 GB, CHAPTER5:1574-1582)."""
    import resource

    # mmap off so RSS reflects working memory, not reclaimable page cache
    cfg = load_config(
        compression={
            "chunk_size_mb": 16, "format_version": 2,
            "use_memory_mapped_io": False,
        }
    )
    src = str(tmp_path / "big.bin")
    block = generate_bytes("text", 32 * 1024 * 1024)
    with open(src, "wb") as f:
        for _ in range(32):  # 1 GB
            f.write(block)
    with CpuCompressionService(cfg) as svc:
        dcz = src + ".dcz"
        before_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        svc.compress(src, dcz)
        peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        # memory stays O(workers × chunk), far below the 1 GB file — measured
        # as growth over the pre-existing peak (jax in earlier tests of the
        # same process can dominate absolute maxrss)
        assert peak_mb - before_mb < 800, (
            f"compress grew peak RSS by {peak_mb - before_mb:.0f} MB"
        )
        out = src + ".out"
        dec_before_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        svc.decompress(dcz, out)
        dec_peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        # O(footer) container reads: decompress must never slurp the archive
        # (the footer here is ~36 KB; the old read() cost ~700 MB of RSS)
        assert dec_peak_mb - dec_before_mb < 400, (
            f"decompress grew peak RSS by {dec_peak_mb - dec_before_mb:.0f} MB"
        )
        shallow_ok = svc.verify_integrity(dcz)
        ver_peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        assert shallow_ok and ver_peak_mb - dec_peak_mb < 100, (
            f"shallow verify grew peak RSS by {ver_peak_mb - dec_peak_mb:.0f} MB"
        )
    import filecmp

    assert filecmp.cmp(src, out, shallow=False)
    for p in (src, dcz, out):
        os.remove(p)
