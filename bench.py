"""Headline benchmark: end-to-end compression throughput on the TPU service.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "MB/s", "vs_baseline": N}

Baseline: the reference's measured end-to-end GPU-mode compression throughput
of 12.6 MB/s on its hardware of record (BASELINE.md: `docs/SYSTEM_ARCHITECTURE.md:656`,
`docs/CHAPTER5_IMPLEMENTATION_TESTING.md:1964`).

The bench compresses a generated mixed corpus (text-like, compressible and
binary chunks) through the full service path — file I/O, SHA-256, device
histogram/codebook/encode, container write — then verifies a decompress round
trip.  Warmup iterations absorb jit compilation.
"""

import json
import os
import sys
import tempfile
import time

BASELINE_MBPS = 12.6  # reference GPU-mode end-to-end compression


def main() -> int:
    size_mb = int(os.environ.get("BENCH_SIZE_MB", "128"))
    chunk_mb = int(os.environ.get("BENCH_CHUNK_MB", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    from datacomp_tpu.config import load_config
    from datacomp_tpu.utils.testdata import generate_bytes

    cfg = load_config(
        compression={"chunk_size_mb": chunk_mb, "format_version": 2,
                     "codebook_mode": "device"},
    )

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "bench.bin")
        mb = 1024 * 1024
        with open(src, "wb") as f:
            per = size_mb // 4 or 1
            f.write(generate_bytes("text", per * mb))
            f.write(generate_bytes("compressible", per * mb))
            f.write(generate_bytes("skewed", per * mb))
            f.write(generate_bytes("random", (size_mb - 3 * per) * mb))
        file_size = os.path.getsize(src)

        from datacomp_tpu.services.factory import create_compression_service

        svc = create_compression_service(cfg)
        backend = svc.get_service_name()
        dcz = os.path.join(d, "bench.dcz")
        out = os.path.join(d, "bench.out")

        svc.compress(src, dcz)  # warmup / compile
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            svc.compress(src, dcz)
            times.append(time.perf_counter() - t0)
        best = min(times)
        mbps = file_size / 1e6 / best

        # correctness gate: full round trip must be byte-exact
        svc.decompress(dcz, out)
        with open(src, "rb") as a, open(out, "rb") as b:
            while True:
                ca, cb = a.read(1 << 20), b.read(1 << 20)
                if ca != cb:
                    print(json.dumps({"error": "round trip mismatch"}))
                    return 1
                if not ca:
                    break
        ratio = os.path.getsize(dcz) / file_size
        svc.close()

    print(
        json.dumps(
            {
                "metric": "end_to_end_compress_throughput",
                "value": round(mbps, 2),
                "unit": "MB/s",
                "vs_baseline": round(mbps / BASELINE_MBPS, 2),
                "backend": backend,
                "file_mb": size_mb,
                "ratio": round(ratio, 4),
                "iters": iters,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
