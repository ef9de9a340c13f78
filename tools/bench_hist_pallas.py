"""On-chip bench: Pallas packed-8 histogram vs the XLA matmul histogram.

Run on the real TPU: ``python tools/bench_hist_pallas.py``.  Single process —
never run concurrently with other TPU work on this rig.  Slope timing per
CLAUDE.md (chained unfoldable iterations, scalar-fetch warm).
"""

import functools
import json
import sys
import time

import numpy as np


def main() -> int:
    # NOTE: the round-3 stacked kernel keeps two (16*rows, 128) f32 one-hot
    # operands in VMEM — rows > 512 cannot compile; 128 is the production
    # default (fastest measured).
    rows_list = [int(a) for a in sys.argv[1:]] or [128]
    import jax
    import jax.numpy as jnp

    from datacomp_tpu.ops.histogram import histogram_device
    from datacomp_tpu.ops.histogram_pallas import histogram_pallas

    n = 1 << 24  # 16 MB
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, n, dtype=np.uint8)
    want = np.bincount(data, minlength=256).astype(np.int64)
    dev = jax.devices()[0]
    dd = jax.device_put(data, dev)
    nlen = jnp.int32(n)

    def slope(fn, k_points=(2, 6), repeats=3):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(x, k):
            def body(i, carry):
                acc, x = carry
                h = fn(x)
                total = h[1]
                return acc + total, x ^ (total == jnp.int32(-123456789)).astype(x.dtype)

            acc, _ = jax.lax.fori_loop(0, k, body, (jnp.int32(0), x))
            return acc

        times = {}
        for K in k_points:
            print(f"  compiling/warming K={K}", flush=True)
            _ = int(chain(dd, k=K))
            _ = int(chain(dd, k=K))
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                _ = int(chain(dd, k=K))
                best = min(best, time.perf_counter() - t0)
            times[K] = best
        k1, k2 = k_points
        return (times[k2] - times[k1]) / (k2 - k1)

    results = {}

    per = slope(lambda x: histogram_device(x, nlen))
    results["xla-matmul"] = {"ms": round(per * 1e3, 3), "gbps": round(n / per / 1e9, 2)}
    print(json.dumps({"xla-matmul": results["xla-matmul"]}), flush=True)

    for rows in rows_list:
        try:
            print(f"pallas rows={rows}: correctness run", flush=True)
            got = np.asarray(histogram_pallas(dd, nlen, rows=rows))
            ok = bool((got.astype(np.int64) == want).all())
            per = slope(lambda x, r=rows: histogram_pallas(x, nlen, rows=r))
            key = f"pallas/rows={rows}"
            results[key] = {
                "ms": round(per * 1e3, 3),
                "gbps": round(n / per / 1e9, 2),
                "exact": ok,
            }
            print(json.dumps({key: results[key]}), flush=True)
        except Exception as e:  # Mosaic compile/runtime failure: record it
            print(json.dumps({f"pallas/rows={rows}": {"error": str(e)[:500]}}),
                  flush=True)

    best = min(
        (kv for kv in results.items() if kv[1].get("exact", True)),
        key=lambda kv: kv[1]["ms"],
    )
    print(json.dumps({"best": best[0], **best[1]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
