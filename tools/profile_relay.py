"""One-shot relay transfer profile: H2D/D2H bandwidth + latency + duplex test.

Run on the real TPU (axon relay): `python tools/profile_relay.py`.
Prints JSON with the measured transfer characteristics that size the TPU
service's overlap design (docs/BENCHMARKS.md).  Single process — never run
concurrently with other TPU work on this rig.

Measurement notes: jax caches an Array's host copy after the first
``np.asarray``, so every timed D2H must fetch a FRESH device array (a trivial
on-device bump produces one); H2D is timed as device_put + a sparse digest
whose scalar fetch forces completion, with bandwidth taken from the slope
over sizes so dispatch/latency constants cancel.
"""

import json
import sys
import threading
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    out = {"device": str(dev)}

    def make(n):
        return jax.lax.broadcasted_iota(jnp.uint8, (n, 1), 0).reshape(n)

    @jax.jit
    def bump(a):
        return a + jnp.uint8(1)

    @jax.jit
    def digest(x):
        return x[::65536].astype(jnp.int32).sum()

    sizes = [1 << 20, 4 << 20, 16 << 20]

    # --- D2H: fresh device array per fetch ----------------------------------
    d2h = {}
    for n in sizes:
        a = jax.jit(make, static_argnums=0)(n)
        _ = np.asarray(bump(a)[:8])  # warm compile of bump at this shape
        best = float("inf")
        for _i in range(3):
            a = bump(a)  # fresh array: no cached host copy
            t0 = time.perf_counter()
            h = np.asarray(a)
            best = min(best, time.perf_counter() - t0)
            del h
        d2h[n] = best
    bw = (sizes[-1] - sizes[0]) / (d2h[sizes[-1]] - d2h[sizes[0]])
    lat = d2h[sizes[0]] - sizes[0] / bw
    out["d2h_mbps"] = round(bw / 1e6, 1)
    out["d2h_latency_ms"] = round(lat * 1e3, 1)
    out["d2h_raw"] = {str(k): round(v, 4) for k, v in d2h.items()}

    # --- H2D: device_put + sparse digest + scalar fetch ----------------------
    h2d = {}
    for n in sizes:
        buf = np.random.default_rng(0).integers(0, 255, n, dtype=np.uint8)
        x = jax.device_put(buf, dev)
        _ = int(digest(x))  # compile + warm
        best = float("inf")
        for _i in range(3):
            buf[0] ^= 1  # defeat any host-buffer dedup/caching
            t0 = time.perf_counter()
            x = jax.device_put(buf, dev)
            _ = int(digest(x))
            best = min(best, time.perf_counter() - t0)
        h2d[n] = best
    bw_u = (sizes[-1] - sizes[0]) / (h2d[sizes[-1]] - h2d[sizes[0]])
    lat_u = h2d[sizes[0]] - sizes[0] / bw_u
    out["h2d_mbps"] = round(bw_u / 1e6, 1)
    out["h2d_latency_ms"] = round(lat_u * 1e3, 1)
    out["h2d_raw"] = {str(k): round(v, 4) for k, v in h2d.items()}

    # --- duplex: concurrent H2D and D2H from two threads ---------------------
    n = 16 << 20
    up_buf = np.random.default_rng(1).integers(0, 255, n, dtype=np.uint8)
    base = jax.jit(make, static_argnums=0)(n)
    _ = np.asarray(bump(base)[:8])
    reps = 3

    def up_loop():
        for i in range(reps):
            up_buf[0] ^= 1
            x = jax.device_put(up_buf, dev)
            _ = int(digest(x))

    def dn_loop():
        a = base
        for _ in range(reps):
            a = bump(a)
            _ = np.asarray(a)

    t0 = time.perf_counter()
    up_loop()
    t_up = time.perf_counter() - t0
    t0 = time.perf_counter()
    dn_loop()
    t_dn = time.perf_counter() - t0
    t0 = time.perf_counter()
    a = threading.Thread(target=up_loop)
    b = threading.Thread(target=dn_loop)
    a.start(); b.start(); a.join(); b.join()
    t_both = time.perf_counter() - t0
    out["serial_up_s"] = round(t_up, 3)
    out["serial_dn_s"] = round(t_dn, 3)
    out["concurrent_both_s"] = round(t_both, 3)
    out["duplex_speedup"] = round((t_up + t_dn) / t_both, 2)

    # --- two concurrent same-direction D2H streams ---------------------------
    t0 = time.perf_counter()
    th = [threading.Thread(target=dn_loop) for _ in range(2)]
    for t in th:
        t.start()
    for t in th:
        t.join()
    out["two_d2h_streams_s"] = round(time.perf_counter() - t0, 3)
    out["d2h_parallel_speedup"] = round(2 * t_dn / out["two_d2h_streams_s"], 2)

    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
