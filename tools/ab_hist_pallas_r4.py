"""Round-4 Pallas histogram A/B: is the carried accumulator the stall?

Round 3 A/B'd block shapes (64/128/256 rows), one-hot dtypes (f32 wins),
stacking, masked compares and narrower widenings (Mosaic-blocked); the
kernel sits at ~1.6-1.9 ms / 16 MB ≈ 24% of either analytic term (VPU
one-hot build ~38 GB/s, MXU spin ~40 GB/s — both far above the measured
9-13 GB/s).  The one untried axis: every grid step accumulates into the
SAME (128,128) VMEM accumulator, a loop-carried dependency that could stall
the Mosaic pipeline between blocks.  This A/B gives the grid K independent
partial accumulators (out block index = i % K) summed in XLA afterwards —
if the dependency is the stall, K=2..8 should recover throughput.

All variants bit-exact vs np.bincount (asserted here before timing).

Usage: python tools/ab_hist_pallas_r4.py [size_mb]
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from datacomp_tpu.benchmark.kernels import _unfoldable_dep
    from datacomp_tpu.ops.histogram_pallas import (
        ROWS,
        _hist_kernel,
        histogram_pallas,
    )
    from datacomp_tpu.utils.testdata import generate_bytes

    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = size_mb << 20
    data = np.frombuffer(generate_bytes("text", n), np.uint8)
    expect = np.bincount(data, minlength=256).astype(np.int32)

    dev = jax.devices()[0]
    dd = jax.device_put(data, dev)

    def kernel_2d(x_ref, acc_ref):
        # inner grid dim: zero this k-slice's accumulator at its first visit;
        # each k-slice's visits are CONSECUTIVE (2-D grid), so the partial
        # accumulator stays resident in VMEM for its whole stripe
        @pl.when(pl.program_id(1) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        vals = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) >> 3
        his, los = [], []
        for g in range(16):
            t = x_ref[:, 8 * g : 8 * g + 8].astype(jnp.int32)
            rep = pltpu.repeat(t, 16, axis=1)
            his.append(((rep >> 4) == vals).astype(jnp.float32))
            los.append(((rep & 15) == vals).astype(jnp.float32))
        acc_ref[0] = acc_ref[0] + jax.lax.dot_general(
            jnp.concatenate(his, axis=0),
            jnp.concatenate(los, axis=0),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @functools.partial(jax.jit, static_argnames=("k", "semantics", "interpret"))
    def hist_partial(x, k: int, semantics: str = "arbitrary",
                     interpret: bool = False):
        mat = x.reshape(-1, 128)
        grid = mat.shape[0] // ROWS
        assert grid % k == 0, "chunk must split evenly over k stripes"
        inner = grid // k
        acc = pl.pallas_call(
            kernel_2d,
            grid=(k, inner),
            in_specs=[
                pl.BlockSpec((ROWS, 128), lambda ki, i: (ki * inner + i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 128, 128), lambda ki, i: (ki, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k, 128, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(semantics, "arbitrary"),
            ),
            interpret=interpret,
        )(mat)
        acc = acc.sum(axis=0)
        c4 = acc.reshape(16, 8, 16, 8)
        diag = jnp.diagonal(c4, axis1=1, axis2=3)
        return diag.sum(axis=-1).reshape(256).astype(jnp.int32)

    # correctness first (n is a multiple of ROWS*128 for size_mb >= 1)
    base = np.asarray(histogram_pallas(dd, jnp.int32(n)))
    assert np.array_equal(base, expect), "baseline kernel mismatch"
    variants = {"baseline": lambda x: histogram_pallas(x, jnp.int32(n))}
    for k in (2, 4, 8):
        out = np.asarray(hist_partial(dd, k=k))
        assert np.array_equal(out, expect), f"k={k} partial-acc mismatch"
        variants[f"partial-k{k}"] = functools.partial(hist_partial, k=k)
    out = np.asarray(hist_partial(dd, k=8, semantics="parallel"))
    assert np.array_equal(out, expect), "parallel-semantics mismatch"
    variants["partial-k8-parallel"] = functools.partial(
        hist_partial, k=8, semantics="parallel"
    )
    print("all variants bit-exact", flush=True)

    def slope(fn, k_points=(2, 10), repeats=3):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(x, k):
            def body(i, carry):
                acc, x = carry
                h = fn(x)
                total = h.sum(dtype=jnp.int32)
                return acc + total, x ^ _unfoldable_dep(total).astype(x.dtype)

            acc, _ = jax.lax.fori_loop(0, k, body, (jnp.int32(0), x))
            return acc

        times = {}
        for K in k_points:
            int(chain(dd, k=K))
            int(chain(dd, k=K))
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                int(chain(dd, k=K))
                best = min(best, time.perf_counter() - t0)
            times[K] = best
        k1, k2 = min(k_points), max(k_points)
        return max((times[k2] - times[k1]) / (k2 - k1), 1e-9)

    results = {}
    for name, fn in variants.items():
        s = slope(fn)
        results[name] = round(s * 1e3, 3)
        print(f"{name:<22} {s * 1e3:8.3f} ms  "
              f"({size_mb / s / 1e3:7.1f} MB/ms)", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
