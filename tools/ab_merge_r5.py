"""Round-5 A/B: the depth-bounded merge tree vs the unbounded r4 shape.

Round 4 decomposed encode's 61 ms / 16 MB into a 35.4 ms ownership-scatter
floor plus a ~26 ms merge/splice/cumsum remainder that executes strictly
before it (tools/ab_encode_scatter_r4.py; docs/BENCHMARKS.md).  Round 5
bounds every merge level's word-offset splice loop and buffer width by the
static codebook-depth bucket the scatter slots already use (a unit of k
symbols under an m-bit codebook holds <= k*m bits), cutting splice traffic
~4-8x.  This tool measures, same-session interleaved, DCE-proof slope
timings on one chunk:

  encode-m32        r4 production shape: slots = maxlen+2, merge UNBOUNDED
                    (merge_bound=32) — must reproduce r4's ~61 ms
  encode-bounded    the new default: same slots, merge bound = maxlen
  encode-b18        the service's runtime-bucket shape (slots=18, m=16)
  encode-cap8       auto-capped 8-bit codebook (slots=10, m=8) — the v2
                    production default's shape
  merge-only-m32 /  the merge tree + lookup + cumsum WITHOUT the ownership
  merge-only-bnd    scatter: directly measures the remainder shrink

Every encode case is asserted bit-exact vs the host encoder before timing.

Usage: python tools/ab_merge_r5.py [size_mb] [kind]
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
    from datacomp_tpu.core.bitio import encode_bitstream
    from datacomp_tpu.core.huffman import build_codebook
    from datacomp_tpu.ops import encode_device_merge, max_code_len, words_to_bytes
    from datacomp_tpu.ops.encode_merge import (
        GROUP,
        _exclusive_cumsum_2level,
        _merge_level,
        lookup_symbol_tables,
    )
    from datacomp_tpu.utils.testdata import generate_bytes

    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    kind = sys.argv[2] if len(sys.argv) > 2 else "text"
    n = size_mb << 20
    subblock = 4032
    data = np.frombuffer(generate_bytes(kind, n), np.uint8)
    hist = np.bincount(data, minlength=256).astype(np.int64)
    lens, codes = build_codebook(hist)
    maxlen = max_code_len(lens)
    slots = min(33, maxlen + 2)
    lens8, codes8 = build_codebook(hist, mode="fast", max_len=8)
    ml8 = max_code_len(lens8)
    out_words = (9 * n + 31) // 32 + 2

    dev = jax.devices()[0]
    dd = jax.device_put(data, dev)
    ld = jax.device_put(lens.astype(np.int32), dev)
    cd = jax.device_put(codes.astype(np.uint32), dev)
    ld8 = jax.device_put(lens8.astype(np.int32), dev)
    cd8 = jax.device_put(codes8.astype(np.uint32), dev)

    host_stream = encode_bitstream(data, lens, codes)
    host_stream8 = encode_bitstream(data, lens8, codes8)

    def make_enc(l, c, slots_, mb, win=False):
        def fn(x):
            w, tb, _ = encode_device_merge(
                x, jnp.int32(n), l, c, out_words, subblock=subblock,
                max_slots=slots_, merge_bound=mb, window_scatter=win,
            )
            chk = jnp.sum(w, dtype=jnp.uint32)  # DCE-proof
            return tb + (chk >> jnp.uint32(31)).astype(jnp.int32)
        return fn

    def check_exact(l, c, slots_, mb, expect, win=False):
        w, tb, _ = encode_device_merge(
            dd, jnp.int32(n), l, c, out_words, subblock=subblock,
            max_slots=slots_, merge_bound=mb, window_scatter=win,
        )
        got = words_to_bytes(
            np.asarray(w[: (int(tb) + 31) // 32]), int(tb)
        )
        assert got == expect, (
            f"bit-exactness FAILED at slots={slots_} mb={mb} win={win}"
        )

    def make_merge_only(l, c, mb):
        """Lookup + leaf pack + 5 merge levels + cumsum, NO scatter: the
        'remainder' of the round-4 decomposition, isolated.  Consumes the
        final group blocks so nothing is DCE'd."""
        def fn(x):
            idx = jnp.arange(n, dtype=jnp.int32)
            valid = idx < jnp.int32(n)
            xb = jnp.where(valid, x.astype(jnp.int32), 0)
            lv, cw = lookup_symbol_tables(xb, l, c)
            ng = n // GROUP
            shift = (jnp.uint32(32) - jnp.minimum(lv, 32).astype(jnp.uint32)) & jnp.uint32(31)
            leaf = jnp.where(lv > 0, cw << shift, jnp.uint32(0))
            buf = leaf.reshape(ng, GROUP).T.reshape(GROUP, 1, ng)
            ulen = lv.reshape(ng, GROUP).T
            mub = mb
            for _ in range(5):
                buf, ulen = _merge_level(buf, ulen, mub)
                mub *= 2
            gs = _exclusive_cumsum_2level(ulen[0])
            chk = jnp.sum(buf[0], dtype=jnp.uint32)
            return gs[-1] + (chk >> jnp.uint32(31)).astype(jnp.int32)
        return fn

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

    print(f"kind={kind} maxlen={maxlen} slots={slots} ml8={ml8}", flush=True)
    check_exact(ld, cd, slots, 32, host_stream)
    check_exact(ld, cd, slots, 0, host_stream)
    # the 18-slot bucket case only covers codebooks within its contract
    # (max_slots >= maxlen + 2, like every production bucket choice)
    b18_ok = maxlen + 2 <= 18
    if b18_ok:
        check_exact(ld, cd, 18, 0, host_stream)
    check_exact(ld8, cd8, ml8 + 2, 0, host_stream8)
    check_exact(ld, cd, slots, 0, host_stream, win=True)
    check_exact(ld8, cd8, ml8 + 2, 0, host_stream8, win=True)
    print("bit-exactness: all encode cases OK", flush=True)

    cases = [
        ("encode-m32", make_enc(ld, cd, slots, 32), dd),
        ("encode-bounded", make_enc(ld, cd, slots, 0), dd),
        ("encode-cap8", make_enc(ld8, cd8, ml8 + 2, 0), dd),
        ("encode-window", make_enc(ld, cd, slots, 0, win=True), dd),
        ("encode-window-cap8", make_enc(ld8, cd8, ml8 + 2, 0, win=True), dd),
        ("merge-only-m32", make_merge_only(ld, cd, 32), dd),
        ("merge-only-bnd", make_merge_only(ld, cd, maxlen), dd),
    ]
    if b18_ok:
        cases.insert(2, ("encode-b18", make_enc(ld, cd, 18, 0), dd))
    results = {}
    for name, fn, arg in cases:
        s = slope(fn, arg)
        results[name] = round(s * 1e3, 3)
        print(f"{name:<16} {s * 1e3:9.3f} ms "
              f"({n / 1e6 / s:7.1f} MB/s)", flush=True)

    results["size_mb"] = size_mb
    results["kind"] = kind
    results["maxlen"] = maxlen
    results["ml8"] = ml8
    print(json.dumps(results))


if __name__ == "__main__":
    main()
