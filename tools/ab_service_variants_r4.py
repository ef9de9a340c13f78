"""Round-4 single-session service A/B: root-cause the e2e collapse (VERDICT #1).

Bisect state: relay byte-rates probe healthy in-window; r2 tree = 39.3 MB/s
e2e today vs r4(pre-fusion) tree = 26 MB/s in the same window; prime suspect
is the r3 runtime slot-switch (``encode_device_merge_slotted``) in the fused
device-codebook executable.  Since then e8fb76f fused the payload fetch into
the metadata round trip (one blocking relay round trip saved per chunk) —
unmeasured.  This script runs ALL the candidate service configurations
sequentially in ONE relay session, so the comparison cannot be confounded by
relay drift between processes:

  slotted   current default: device codebook, runtime lax.switch slot bucket
  static33  device codebook, static 33-slot ownership scatter (r2 shape)
  fast      codebook_mode="fast": host tables (the prepass already builds
            them for opt_bits!), static bucketed slots, NO device codebook,
            NO lax.switch — the candidate production answer for relay rigs

Each variant: warm pass (program load) + 2 timed passes over the same 64 MB
mixed file, with the stage breakdown printed.  Relay probed at start and end.

Usage: python tools/ab_service_variants_r4.py [size_mb] [variants_csv]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")


def run_service(cfg, codec, src, dcz, size_mb, label, workers=None):
    from datacomp_tpu.services.pipeline import ChunkedPipeline
    from datacomp_tpu.services.tpu_service import TpuCompressionService

    svc = TpuCompressionService(cfg)
    if codec is not None or workers is not None:
        if codec is not None:
            svc._codec = codec
        svc._pipeline.close()
        svc._pipeline = ChunkedPipeline(
            cfg, svc._codec,
            workers=workers or max(2, cfg.device.parallel_chunks),
        )
    t0 = time.perf_counter()
    svc.compress(src, dcz)  # warm: program load + compile
    warm_s = time.perf_counter() - t0
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        svc.compress(src, dcz)
        times.append(time.perf_counter() - t0)
    best = min(times)
    ratio = os.path.getsize(dcz) / (size_mb << 20)
    print(
        f"{label:<10} {best:6.2f}s  {size_mb / best:6.1f} MB/s  "
        f"ratio={ratio:.4f}  warm={warm_s:.1f}s  "
        f"runs=[{', '.join(f'{t:.2f}' for t in times)}]",
        flush=True,
    )
    print(svc.get_last_stage_metrics().summary(), flush=True)
    svc._pipeline.close()
    svc._cpu_fallback.close()
    return {"mbps": round(size_mb / best, 2), "ratio": round(ratio, 4),
            "warm_s": round(warm_s, 1)}


def main() -> None:
    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    variants = (
        sys.argv[2].split(",") if len(sys.argv) > 2
        else ["slotted", "static33", "fast"]
    )

    import jax

    import bench
    from datacomp_tpu.config import load_config
    from datacomp_tpu.ops import device_codebook, encode_device_merge
    from datacomp_tpu.services.tpu_service import TpuChunkCodec
    from datacomp_tpu.utils.testdata import generate_bytes

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "in.bin")
        per = (size_mb // 4) << 20
        with open(src, "wb") as f:
            f.write(generate_bytes("text", per))
            f.write(generate_bytes("compressible", per))
            f.write(generate_bytes("skewed", per))
            f.write(generate_bytes("random", per))

        dev_cfg = load_config(
            compression={
                "chunk_size_mb": 16, "format_version": 2,
                "codebook_mode": "device",
            },
        )
        probe_codec = TpuChunkCodec(dev_cfg)
        dev = probe_codec.freq._ensure_device()
        print("relay(start):", bench.probe_relay(dev), flush=True)

        results = {}
        for variant in variants:
            if variant == "slotted":
                results[variant] = run_service(
                    dev_cfg, None, src, os.path.join(d, "a.dcz"), size_mb,
                    "slotted",
                )
            elif variant in ("static33", "static18"):
                slots = 33 if variant == "static33" else 18
                codec = TpuChunkCodec(dev_cfg)
                hist_fn = codec._histogram_fn()

                def fused_static(data, valid_len, _c=codec, _h=hist_fn,
                                 _s=slots):
                    hist = _h(data, valid_len)
                    lengths, codes = device_codebook(hist)
                    words, total_bits, gaps = encode_device_merge(
                        data, valid_len, lengths, codes, _c.out_words,
                        _c.subblock, max_slots=_s,
                    )
                    return lengths, words, total_bits, gaps

                codec._fused = jax.jit(fused_static)
                results[variant] = run_service(
                    dev_cfg, codec, src, os.path.join(d, f"{variant}.dcz"),
                    size_mb, variant,
                )
            elif variant.startswith("fast") or variant.startswith("devb"):
                # fast[_wN|_bN] — host-table mode at a worker count or a
                # batch size; devb_bN — device mode with batched executables.
                # In a fully serialized relay regime (round-4 finding:
                # workers 1/2/3 indistinguishable, transfer overlap
                # 1.01-1.14x) batching is a pure per-chunk LATENCY win —
                # the opposite call from round 3's overlapping-regime A/B.
                mode = "fast" if variant.startswith("fast") else "device"
                wk = bs = None
                if "_w" in variant:
                    wk = int(variant.split("_w")[1])
                if "_b" in variant:
                    bs = int(variant.split("_b")[1])
                var_cfg = load_config(
                    compression={
                        "chunk_size_mb": 16, "format_version": 2,
                        "codebook_mode": mode,
                    },
                    device={"batch_chunks": bs or 0},
                )
                results[variant] = run_service(
                    var_cfg, None, src, os.path.join(d, f"{variant}.dcz"),
                    size_mb, variant, workers=wk,
                )
            else:
                print(f"unknown variant {variant!r}", flush=True)

        results["relay_end"] = bench.probe_relay(dev)
        print("relay(end):", results["relay_end"], flush=True)
        print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
