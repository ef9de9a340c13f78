"""Device byte histogram (256 bins).

TPU-native replacement for the reference's tiled GPU histogram
(``TornadoKernels.histogramTiledKernel:89-100`` + CPU reduce in
``GpuFrequencyService.java:123-129``).  Instead of translating the
tile/sub-histogram/reduce structure, the histogram is re-expressed for the
MXU via a rank decomposition: with ``b = 16·hi + lo``,

    hist[hi, lo] = Σ_i onehot16(hi_i) ⊗ onehot16(lo_i)  =  OH_hiᵀ @ OH_lo

so the whole 256-bin histogram is one ``(16, N) × (N, 16)`` matmul whose
one-hot operands XLA fuses into the contraction — ~32 VPU compare-ops per
byte plus 256 MACs per byte on the MXU, no scatters, no atomics, race-free by
construction.

Accumulation is exact: one-hots are f32 0/1 and each tile contributes at most
``TILE`` counts (< 2²⁴), partials are converted to int32 before the final sum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

#: elements per accumulation tile — f32 matmul stays integer-exact (< 2^24)
TILE = 1 << 22


def _hist_tile(x: jnp.ndarray) -> jnp.ndarray:
    """(n,) uint8/int32 → (256,) int32 histogram of one tile.

    Measured variants on a v5e (tools A/B, round 2): f32 ≈ bf16 one-hots and
    ``lax.map`` over tiles beats ``vmap`` (2.2 ms vs 2.9-3.9 ms / 16 MB) —
    the (16,16)-output contraction runs the MXU at 16/128 × 16/128 = 1/64
    output-tile utilization, which, not operand width, is the floor of this
    formulation; wider-output reshapes spend exactly the utilization factor
    in extra MACs, so 2.2 ms/16 MB is the practical MXU histogram floor."""
    x = x.astype(jnp.int32)
    hi = x >> 4
    lo = x & 15
    r = jnp.arange(16, dtype=jnp.int32)
    oh_hi = (hi[:, None] == r[None, :]).astype(jnp.float32)  # (n,16)
    oh_lo = (lo[:, None] == r[None, :]).astype(jnp.float32)  # (n,16)
    h16 = jax.lax.dot_general(
        oh_hi, oh_lo,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (16,16): [hi, lo]
    return h16.reshape(256).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile",))
def histogram_device(data: jnp.ndarray, valid_len: jnp.ndarray, tile: int = TILE) -> jnp.ndarray:
    """int32[256] histogram of ``data[:valid_len]``.

    ``data`` is the padded (static-shape) chunk as uint8; bytes at or beyond
    ``valid_len`` are masked out by redirecting them to bin 0 and subtracting
    the pad count afterwards (cheaper than a select inside the matmul fusion).
    """
    n = data.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    masked = jnp.where(idx < valid_len, data.astype(jnp.int32), 0)
    if n <= tile:
        hist = _hist_tile(masked)
    else:
        ntiles = (n + tile - 1) // tile
        pad = ntiles * tile - n
        if pad:
            masked = jnp.concatenate([masked, jnp.zeros(pad, jnp.int32)])
        tiles = masked.reshape(ntiles, tile)
        # lax.map, not vmap: measured faster on-chip (vmap's batched
        # contraction layout loses to sequenced full-size sub-matmuls here)
        hist = jax.lax.map(_hist_tile, tiles).sum(axis=0, dtype=jnp.int32)
        hist = hist.at[0].add(-pad)
    # remove the pad-redirected zeros
    return hist.at[0].add(-(n - valid_len).astype(jnp.int32))


def histogram_np(data: np.ndarray) -> np.ndarray:
    return np.bincount(np.asarray(data, np.uint8), minlength=256).astype(np.int64)
