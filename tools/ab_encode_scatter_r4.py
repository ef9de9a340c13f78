"""Round-4 A/B: encode's gap to its scatter floor (VERDICT r3 weak #3).

Round 3 measured device encode at 61.3 ms / 16 MB vs a 35.9 ms scatter floor
(59% efficiency) with no named blocker.  Hypothesis: the ownership placement
runs ``slots`` (≈12) CHAINED unique-set scatters of ng indices each, and each
scatter call materializes the full out_words output buffer (XLA scatter is
functional; if the chain isn't aliased in place, each call pays a ~4.7M-word
copy) — so the floor should be charged per CALL, not just per index.

Cases (all DCE-proof slope-timed, 16 MB text chunk, 10-bit codebook):
  encode-chained   production encoder (one scatter per slot)
  encode-fused     encode_device_merge(fused_scatter=True): ONE scatter of
                   slots*ng (index, value) pairs
  scatter-1call    primitive: ONE unique-set scatter of slots*ng indices
  scatter-chained  primitive: slots chained scatters of ng indices each
The (scatter-chained − scatter-1call) delta isolates the per-call cost; the
encode pair shows whether it transfers to the full kernel.

Usage: python tools/ab_encode_scatter_r4.py [size_mb]
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

    from datacomp_tpu.benchmark.kernels import _unfoldable_dep
    from datacomp_tpu.core.huffman import build_codebook
    from datacomp_tpu.ops import encode_device_merge, max_code_len
    from datacomp_tpu.utils.testdata import generate_bytes

    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = size_mb << 20
    subblock = 4032
    data = np.frombuffer(generate_bytes("text", n), np.uint8)
    lens, codes = build_codebook(np.bincount(data, minlength=256).astype(np.int64))
    maxlen = max_code_len(lens)
    slots = min(33, maxlen + 2)
    ng = n // 32
    out_words = (9 * n + 31) // 32 + 2

    dev = jax.devices()[0]
    dd = jax.device_put(data, dev)
    ld = jax.device_put(lens.astype(np.int32), dev)
    cd = jax.device_put(codes.astype(np.uint32), dev)

    def enc_chained(x):
        w, tb, _ = encode_device_merge(
            x, jnp.int32(n), ld, cd, out_words, subblock=subblock,
            max_slots=slots,
        )
        chk = jnp.sum(w, dtype=jnp.uint32)
        return tb + (chk >> jnp.uint32(31)).astype(jnp.int32)

    def enc_fused(x):
        w, tb, _ = encode_device_merge(
            x, jnp.int32(n), ld, cd, out_words, subblock=subblock,
            max_slots=slots, fused_scatter=True,
        )
        chk = jnp.sum(w, dtype=jnp.uint32)
        return tb + (chk >> jnp.uint32(31)).astype(jnp.int32)

    # scatter primitives at encode's exact shape: values/indices for `slots`
    # waves of ng writes into an out_words buffer; all indices unique.
    # slots*ng can exceed out_words (most slots are dead on real data), so
    # draw the permutation from the larger space — out-of-range indices
    # drop, exactly like the kernel's OOB sentinels.
    rng = np.random.default_rng(0)
    space = max(out_words, slots * ng)
    perm = rng.permutation(space)[: slots * ng].astype(np.int32)
    sidx = jax.device_put(perm, dev)                      # (slots*ng,)
    svals = jax.device_put(
        rng.integers(0, 1 << 30, slots * ng, np.int32), dev
    )

    def scatter_1call(ix):
        out = jnp.zeros(out_words, jnp.int32)
        out = out.at[ix].set(svals, mode="drop", unique_indices=True)
        return jnp.sum(out, dtype=jnp.int32)

    def scatter_chained(ix):
        out = jnp.zeros(out_words, jnp.int32)
        for j in range(slots):
            out = out.at[ix[j * ng : (j + 1) * ng]].set(
                svals[j * ng : (j + 1) * ng], mode="drop", unique_indices=True
            )
        return jnp.sum(out, dtype=jnp.int32)

    def slope(fn, arg, k_points=(2, 6), repeats=3):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(x, k):
            def body(i, carry):
                acc, x = carry
                total = fn(x)
                return acc + total, x ^ _unfoldable_dep(total).astype(x.dtype)

            acc, _ = jax.lax.fori_loop(0, k, body, (jnp.int32(0), x))
            return acc

        times = {}
        for K in k_points:
            int(chain(arg, k=K))  # warm (program load + compile)
            int(chain(arg, k=K))
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                int(chain(arg, k=K))
                best = min(best, time.perf_counter() - t0)
            times[K] = best
        k1, k2 = min(k_points), max(k_points)
        return max((times[k2] - times[k1]) / (k2 - k1), 1e-9)

    results = {}
    for name, fn, arg in (
        ("scatter-1call", scatter_1call, sidx),
        ("scatter-chained", scatter_chained, sidx),
        ("encode-chained", enc_chained, dd),
        ("encode-fused", enc_fused, dd),
    ):
        s = slope(fn, arg)
        results[name] = round(s * 1e3, 3)
        print(f"{name:<16} {s * 1e3:9.3f} ms", flush=True)

    results["slots"] = slots
    results["size_mb"] = size_mb
    results["ns_per_idx_1call"] = round(
        results["scatter-1call"] * 1e6 / (slots * ng), 3
    )
    results["per_call_overhead_ms"] = round(
        (results["scatter-chained"] - results["scatter-1call"]) / max(slots - 1, 1),
        3,
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
