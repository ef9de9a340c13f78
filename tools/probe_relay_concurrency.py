"""Do concurrent relay transfers overlap AT ALL in one process?

Round 2 measured the TPU service at 96% of the half-duplex link ceiling with
3 worker streams — possible only if one stream's device compute + metadata
latency hides under other streams' transfers.  Rounds 3-4 measure ~26 MB/s
= the fully-SERIALIZED per-chunk cost, with workers=1/2/3 indistinguishable
(tools/diag_tpu_service_r4.py).  This probe separates "service stopped
overlapping" from "the relay (or its client) stopped letting transfers
overlap":

  serial:     4x [device_put(8MB) + forced scalar fetch], one thread
  concurrent: same 4 calls from 2 threads (2 each)
  mixed:      thread A uploads while thread B fetches a device-resident 8MB

If concurrent ~= serial, per-process relay concurrency is 1 and the service
pipeline cannot do better than the serialized per-chunk cost — the round-2
overlap is environmentally gone, not a code regression.

Usage: python tools/probe_relay_concurrency.py
"""

import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    mb = 8
    n = mb << 20
    rng = np.random.default_rng(0)
    arrs = [rng.integers(0, 255, n, dtype=np.uint8) for _ in range(4)]
    force = jax.jit(lambda x: x[::4096].astype(jnp.int32).sum())

    def upload(a):
        x = jax.device_put(a, dev)
        int(force(x))
        return x

    # warm: compile + handshake
    resident = upload(arrs[0])
    np.asarray(resident)

    t0 = time.perf_counter()
    for a in arrs:
        upload(a)
    t_serial = time.perf_counter() - t0
    print(f"serial   4x{mb}MB H2D: {t_serial:6.2f}s "
          f"({4 * mb / t_serial:5.1f} MB/s)", flush=True)

    def worker(pair):
        for a in pair:
            upload(a)

    t0 = time.perf_counter()
    ts = [threading.Thread(target=worker, args=(arrs[i::2],)) for i in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    t_conc = time.perf_counter() - t0
    print(f"2-thread 4x{mb}MB H2D: {t_conc:6.2f}s "
          f"({4 * mb / t_conc:5.1f} MB/s)  overlap={t_serial / t_conc:4.2f}x",
          flush=True)

    # mixed direction: A uploads 2x8MB while B downloads 2x8MB
    t0 = time.perf_counter()
    for _ in range(2):
        upload(arrs[1])
        np.asarray(resident)
    t_mix_serial = time.perf_counter() - t0

    def down():
        for _ in range(2):
            np.asarray(resident)

    def up():
        for _ in range(2):
            upload(arrs[1])

    t0 = time.perf_counter()
    ts = [threading.Thread(target=up), threading.Thread(target=down)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    t_mix = time.perf_counter() - t0
    print(f"mixed serial {t_mix_serial:6.2f}s vs 2-thread {t_mix:6.2f}s "
          f"overlap={t_mix_serial / t_mix:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
