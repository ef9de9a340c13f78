"""Round-4 bisect of the TPU service end-to-end collapse (VERDICT r3 #1).

Facts so far: the relay probes healthy in-window (H2D/D2H ~58 MB/s, round-2
rates), device encode is ~86 ms + ~25 ms dispatch per 16 MB chunk, yet the
service end-to-end measured 12.5-30 MB/s against a ~48 MB/s transfer ceiling
— the link is idle most of the time.  This script isolates where the time
goes inside ONE relay session:

  1. single encode_chunk calls, timed warm (serial per-chunk cost);
  2. the full service at workers = 1 / 2 / 3 (overlap behavior);
  3. stage metrics per run (attribution: ENCODING vs CHECKSUM vs IO).

Usage: python tools/diag_tpu_service_r4.py [size_mb]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    chunk_mb = 16

    from datacomp_tpu.config import load_config
    from datacomp_tpu.models import StageMetrics
    from datacomp_tpu.services.tpu_service import TpuChunkCodec, TpuCompressionService
    from datacomp_tpu.utils.testdata import generate_bytes

    import bench

    cfg = load_config(
        compression={
            "chunk_size_mb": chunk_mb, "format_version": 2,
            "codebook_mode": "device",
        },
    )
    codec = TpuChunkCodec(cfg)
    dev = codec.freq._ensure_device()
    print("relay:", bench.probe_relay(dev), flush=True)

    # -- 1. serial per-chunk cost, one stream, no pipeline ------------------
    text = np.frombuffer(generate_bytes("text", chunk_mb << 20), np.uint8)
    m = StageMetrics()
    t0 = time.perf_counter()
    codec.encode_chunk(text, m)  # warm (program load)
    print(f"encode_chunk warm: {time.perf_counter() - t0:.2f}s", flush=True)
    for i in range(3):
        t0 = time.perf_counter()
        enc = codec.encode_chunk(text, m)
        dt = time.perf_counter() - t0
        print(
            f"encode_chunk[{i}]: {dt * 1e3:8.1f} ms "
            f"({chunk_mb / dt:6.1f} MB/s serial, payload {len(enc.payload)})",
            flush=True,
        )

    # -- 2. full service at several worker counts ---------------------------
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in.bin")
        per = (size_mb // 4) << 20
        with open(src, "wb") as f:
            f.write(generate_bytes("text", per))
            f.write(generate_bytes("compressible", per))
            f.write(generate_bytes("skewed", per))
            f.write(generate_bytes("random", per))
        for workers in (1, 2, 3):
            cfgw = load_config(
                compression={
                    "chunk_size_mb": chunk_mb, "format_version": 2,
                    "codebook_mode": "device",
                },
                device={"parallel_chunks": workers},
            )
            svc = TpuCompressionService(cfgw)
            # share the warmed codec so program loads don't re-pay, and
            # force the exact worker count (the service floors it at 2)
            from datacomp_tpu.services.pipeline import ChunkedPipeline

            svc._codec = codec
            svc._pipeline.close()
            svc._pipeline = ChunkedPipeline(cfgw, codec, workers=workers)
            dcz = os.path.join(d, f"w{workers}.dcz")
            svc.compress(src, dcz)  # warm pass
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                svc.compress(src, dcz)
                times.append(time.perf_counter() - t0)
            best = min(times)
            print(
                f"workers={workers}: {best:6.2f}s  "
                f"{size_mb / best:6.1f} MB/s   (runs: "
                + ", ".join(f"{t:.2f}" for t in times) + ")",
                flush=True,
            )
            print(svc.get_last_stage_metrics().summary(), flush=True)
            svc._pipeline.close()
            svc._cpu_fallback.close()


if __name__ == "__main__":
    main()
