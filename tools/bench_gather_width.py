"""Measure TPU gather cost vs row width — the evidence behind refill_words=8.

Run on the real TPU: ``python tools/bench_gather_width.py``.  Single process —
never run concurrently with other TPU work on this rig.

Two regimes, both slope-timed (hoist-proof chained iterations, CLAUDE.md):

* ``bulk``: one gather op over 2^20 random indices into an (N, W) int32
  table — XLA's best case;
* ``decode-shape``: 4096-lane index vectors advanced sequentially inside a
  ``lax.scan`` — exactly the decoder's refill pattern.

Finding on v5e (2026-08, decode-shape): 13.3 ns/index at W=1 vs ~10-11 at
W=2..8 — the cost is per INDEX, not per fetched word, so fetching 8-word
rows is ~8x cheaper per word.  This drove ``ops/decode.py``'s
``refill_words=8`` production default (decode 41.5 -> 7.6-11 ms / 16 MB).
"""

import functools
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    # ---- bulk regime -------------------------------------------------------
    n_idx = 1 << 20
    n_rows = 1 << 20
    idx = jax.device_put(rng.integers(0, n_rows, n_idx, dtype=np.int32))

    def slope_chain(fn, arg, k_points=(2, 6), repeats=3):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(x, k):
            def body(i, carry):
                acc, x = carry
                total = fn(x)
                return acc + total, x ^ (total == jnp.int32(-123456789)).astype(x.dtype)

            acc, _ = jax.lax.fori_loop(0, k, body, (jnp.int32(0), x))
            return acc

        times = {}
        for K in k_points:
            _ = int(chain(arg, k=K))
            _ = int(chain(arg, k=K))
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                _ = int(chain(arg, k=K))
                best = min(best, time.perf_counter() - t0)
            times[K] = best
        k1, k2 = k_points
        return (times[k2] - times[k1]) / (k2 - k1)

    print("bulk: 2^20 random indices, one gather op")
    for W in (1, 2, 4, 8, 16):
        table = jax.device_put(
            rng.integers(0, 1 << 30, (n_rows, W), dtype=np.int32))
        per = slope_chain(lambda ix, t=table: t[ix].sum(dtype=jnp.int32), idx)
        print(f"  W={W:2d}: {per/n_idx*1e9:6.2f} ns/index  "
              f"{per/(n_idx*W)*1e9:6.2f} ns/word", flush=True)

    # ---- decode-shape regime ----------------------------------------------
    lanes, steps = 4096, 1344
    nwords = 1 << 22

    print(f"decode-shape: ({lanes},) sequential indices x {steps} scan steps")
    for W in (1, 2, 4, 8):
        table = jax.device_put(
            rng.integers(0, 1 << 30, (nwords // W, W), dtype=np.int32))
        wi0 = jax.device_put(
            rng.integers(0, nwords // W - steps - 1, lanes, dtype=np.int32))

        @functools.partial(jax.jit, static_argnames=("k",))
        def run(wi0, k, table=table):
            def outer(carry, _):
                wi, acc = carry

                def step(c, _):
                    wi, acc = c
                    row = table[wi]
                    return (wi + 1, acc + row.sum(axis=1, dtype=jnp.int32)), None

                (wi, acc), _ = jax.lax.scan(step, (wi, acc), None, length=steps)
                wi = wi0 + (acc[0] == jnp.int32(-123456789)).astype(jnp.int32)
                return (wi, acc), None

            (wi, acc), _ = jax.lax.scan(
                outer, (wi0, jnp.zeros(lanes, jnp.int32)), None, length=k)
            return acc.sum()

        times = {}
        for K in (1, 3):
            _ = int(run(wi0, k=K))
            _ = int(run(wi0, k=K))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _ = int(run(wi0, k=K))
                best = min(best, time.perf_counter() - t0)
            times[K] = best
        per = (times[3] - times[1]) / 2
        per_index = per / steps / lanes
        print(f"  W={W}: {per_index*1e9:6.2f} ns/index  "
              f"{per_index/W*1e9:6.2f} ns/word", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
