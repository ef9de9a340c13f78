"""Isolate the r3 runtime slot-switch as the e2e regression culprit.

Bisect so far (round 4): relay byte-rates healthy in-window; r2 tree = 39.3
MB/s e2e today; r4 tree = 26 MB/s in the same environment window.  The only
fused-path difference is encode_device_merge_slotted (lax.switch over 3
slot buckets, r3) vs encode_device_merge (static 33 slots, r2).  This runs
the FULL TPU service e2e with both fused executables in one relay session.

Usage: python tools/ab_fused_slotted_r4.py <slotted|static33|static18> [size_mb]
(one variant per process: the relay degrades badly when a process is killed
or runs alongside another TPU user — run variants sequentially)
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")


def run_service(cfg, codec, src, dcz, size_mb):
    from datacomp_tpu.services.tpu_service import TpuCompressionService

    svc = TpuCompressionService(cfg)
    svc._codec = codec
    svc._pipeline.codec = codec
    svc.compress(src, dcz)  # warm
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        svc.compress(src, dcz)
        times.append(time.perf_counter() - t0)
    svc._pipeline.close()
    svc._cpu_fallback.close()
    return min(times)


def main() -> None:
    variant = sys.argv[1]
    size_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import jax

    from datacomp_tpu.config import load_config
    from datacomp_tpu.ops import encode_device_merge, device_codebook
    from datacomp_tpu.services.tpu_service import TpuChunkCodec
    from datacomp_tpu.utils.testdata import generate_bytes

    cfg = load_config(
        compression={
            "chunk_size_mb": 16, "format_version": 2, "codebook_mode": "device",
        },
    )

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in.bin")
        per = (size_mb // 4) << 20
        with open(src, "wb") as f:
            f.write(generate_bytes("text", per))
            f.write(generate_bytes("compressible", per))
            f.write(generate_bytes("skewed", per))
            f.write(generate_bytes("random", per))

        if variant == "slotted":
            # A: current fused pipeline (runtime slot switch)
            codec = TpuChunkCodec(cfg)
            t = run_service(cfg, codec, src, os.path.join(d, "a.dcz"), size_mb)
            print(f"fused-slotted : {t:6.2f}s  {size_mb / t:6.1f} MB/s", flush=True)
            return

        # B: r2-exact fused pipeline (static 33-slot encode)
        codec_b = TpuChunkCodec(cfg)
        hist_fn = codec_b._histogram_fn()

        def fused_static(data, valid_len):
            import jax.numpy as jnp  # noqa: F401

            hist = hist_fn(data, valid_len)
            lengths, codes = device_codebook(hist)
            words, total_bits, gaps = encode_device_merge(
                data, valid_len, lengths, codes, codec_b.out_words,
                codec_b.subblock,
            )
            return lengths, words, total_bits, gaps

        if variant == "static33":
            codec_b._fused = jax.jit(fused_static)
            t = run_service(cfg, codec_b, src, os.path.join(d, "b.dcz"), size_mb)
            print(f"fused-static33: {t:6.2f}s  {size_mb / t:6.1f} MB/s", flush=True)
            return

        # C: static 18-slot (the bucket the runtime switch picks for this data)
        # — isolates switch overhead from slot-count compute
        codec_c = TpuChunkCodec(cfg)

        def fused_static18(data, valid_len):
            hist = hist_fn(data, valid_len)
            lengths, codes = device_codebook(hist)
            words, total_bits, gaps = encode_device_merge(
                data, valid_len, lengths, codes, codec_c.out_words,
                codec_c.subblock, max_slots=18,
            )
            return lengths, words, total_bits, gaps

        codec_c._fused = jax.jit(fused_static18)
        t = run_service(cfg, codec_c, src, os.path.join(d, "c.dcz"), size_mb)
        print(f"fused-static18: {t:6.2f}s  {size_mb / t:6.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
