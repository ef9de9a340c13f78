"""Pallas TPU kernel: packed-8 one-hot MXU histogram.

The pure-XLA histogram (``ops/histogram.py``) expresses ``hist[hi, lo]`` as a
``(n,16)x(n,16)->(16,16)`` one-hot contraction — correct, but it keeps only
16 of the MXU's 128 lanes live on both operand and output, which pins the
formulation at ~2.2 ms / 16 MB on a v5e regardless of operand dtype (round-2
A/B in docs/BENCHMARKS.md).

This kernel implements the *packed-8* formulation (TPU equivalent, not a
translation, of the reference's tiled GPU histogram
``TornadoKernels.histogramTiledKernel:89-100`` + reduce in
``GpuFrequencyService.java:123-149``): view the chunk as rows of 8 bytes and
give every byte-slot its own column group, so both one-hot operands are
(rows, 128) and each contraction fills a complete (128, 128) MXU output
tile.  The slot-diagonal (16, 16) blocks of the result are the per-slot
histograms; off-diagonal blocks are discarded.  Useful MACs per byte are
unchanged (256) but the MXU consumes 8x fewer operand rows.

Kernel shape:

* grid over (ROWS, 128)-byte tiles; Pallas streams each block HBM -> VMEM
  automatically (double-buffered by the Mosaic pipeline);
* per block, a static loop over the 16 8-byte groups: widen the group to
  int32 (v5e's VPU has no i8 vector compare/shift — measured, see
  docs/BENCHMARKS.md), one ``pltpu.repeat`` to 128 lanes, nibble compares
  build **f32** one-hots, and the 16 groups' one-hots are stacked along the
  contraction axis into ONE ``(16·ROWS, 128)^T @ (16·ROWS, 128)`` dot per
  block (round 3; algebraically the sum of the 16 per-group outer blocks)
  accumulating into an f32 (128, 128) accumulator that lives in VMEM for
  the whole grid (every grid step maps to the same output block; TPU grids
  execute sequentially so the accumulation is race-free by construction —
  the property the reference's tiled kernel gets from
  one-sub-histogram-per-tile);
* the (128,128) -> slot-diagonal -> (256,) reduction runs in XLA after the
  kernel (trivial: one 64 KB tensor per chunk).

Measured on v5e (16 MB chunk, interleaved slope timings;
``tools/ab_hist_pallas_r3.py``): **1.58 ms (10.6 GB/s)** vs 2.03–2.11 ms
for the round-2 per-group-dot bf16 kernel in the same windows and 2.56 ms
for the XLA formulation — so this kernel is the production histogram on
real devices (``device.histogram_backend = "pallas"``, the default;
``"xla"`` forces the matmul formulation).  All variants bit-exact.
Round-3 same-window A/B findings:

* stacking the 16 per-group dots into one (dot launches 16 → 1 and
  accumulator adds 16 → 1 per block): 2.11 → 1.89 ms;
* **f32 one-hots instead of bf16**: 1.89 → 1.58 ms — the i1→f32 select
  keeps every vector in the native 32-bit lane layout of the i32 compares,
  while bf16 inserts a 16-bit relayout on 32 full-width registers per
  block; the f32 MXU rate does not bind (the dot is ~0.2 ms of MXU time);
* one-hots written to VMEM scratch instead of ``jnp.concatenate``: 8.3 ms
  — explicit stores + reload defeat Mosaic's fusion;
* two dots of 8 stacked groups: 1.96 ms; rows=64: 2.25; rows=256: 1.94;
* ``(rep & 0xF0) == vals<<4`` masked compare replacing the ``>> 4`` shift:
  2.30 ms (the shift was not the cost);
* int16 widening: Mosaic compile error on v5e (as with i8 — i32 is the
  only vector-legal widening here), the named blocker for halving the
  compare width.

Round-2 rejections (unchanged): int8 MXU operands (2.87 ms — no MXU win,
extra convert), u8-native compares (v5e legalizes neither ``arith.shrui``
nor ``arith.cmpi`` on i8 vectors), pure-XLA packed-8 (17 ms — XLA
materializes the one-hot build through HBM instead of fusing it; the
in-VMEM build is exactly what Pallas adds).  Full study: docs/BENCHMARKS.md.

Exactness: one-hot entries are exactly 0.0/1.0 in f32; the MXU accumulates
in f32, and each accumulator entry counts at most 2^24 bytes, so all counts
are exactly representable.  The public wrapper asserts chunks stay below
that bound.

vmap-safety of the accumulate-in-place pattern: ``jax.vmap`` of a
``pallas_call`` prepends the batch axis to the grid
(``jax/_src/pallas/pallas_call.py`` batching rule), but it also records it in
``grid_mapping.vmapped_dims``, and both the Mosaic lowering and the
interpreter *filter vmapped dims out of the kernel-visible grid indices*
(``jax/_src/pallas/mosaic/lowering.py`` ``_get_grid_indices`` /
``_program_id_lowering_rule``; ``hlo_interpreter.py`` does the same), so
``pl.program_id(0)`` inside the kernel keeps meaning "first USER grid axis"
under vmap and the ``step == 0`` zero-init fires once per batch element, at
its first block.  Pinned by a vmapped regression test
(``tests/test_ops.py::TestHistogramPallas::test_vmapped_batches``) so a JAX
upgrade that changes this contract fails loudly instead of corrupting
codebooks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU/Mosaic-oriented; keep import failures non-fatal
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover - environment without pallas
    _PALLAS_OK = False

#: 128-byte rows per grid step (block = ROWS x 128 bytes in VMEM).  Mosaic
#: keeps the 16 unrolled per-group one-hots live for the stacked dot (two
#: (16*ROWS, 128) f32 operands = ROWS/4 MB), so the scoped-VMEM footprint
#: scales with ROWS; 1024 overflowed the 16 MB budget already in the
#: round-2 shape.  Round-3 stacked-f32 A/B on a 16 MB chunk:
#: rows=64 → 2.25 ms, 128 → **1.58 ms**, 256 → 1.94 ms (smaller blocks
#: pipeline better against the compute), so 128 is the default.
ROWS = 128

#: hard exactness bound: per-slot counts accumulate in f32
_MAX_BYTES_EXACT = 1 << 24


def _hist_kernel(x_ref, acc_ref):
    """One grid step: accumulate this block's packed one-hot contraction.

    Column mapping is ``c = v*8 + s`` (nibble value v in bits 3..6, byte-slot
    s in bits 0..2) so the byte replication is a *tile*-repeat
    (``[t t t ...]`` — ``pltpu.repeat``), which Mosaic lowers natively; the
    elementwise layout (``c = 16s + v``) needs a (R,8,16)->(R,128) shape cast
    Mosaic's vector-layout inference rejects.  The group bytes are sliced
    straight from the uint8 ref and widened to int32 per group — v5e's VPU
    legalizes neither ``arith.shrui`` nor ``arith.cmpi`` on i8 vectors, and
    a full int32 copy of the block plus 16 groups of unrolled intermediates
    overflows scoped VMEM.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    vals = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) >> 3  # 0..15, x8
    his, los = [], []
    for g in range(16):
        t = x_ref[:, 8 * g : 8 * g + 8].astype(jnp.int32)  # (ROWS, 8)
        rep = pltpu.repeat(t, 16, axis=1)  # rep[i, c] = t[i, c & 7]
        # f32 (not bf16) one-hots: the i1->f32 select stays in the 32-bit
        # lane layout of the i32 compares; bf16 measured +20% (relayouts)
        his.append(((rep >> 4) == vals).astype(jnp.float32))
        los.append(((rep & 15) == vals).astype(jnp.float32))
    # ONE stacked contraction per block == the sum of the 16 per-group
    # (128,128) outer blocks, with 1/16th the dot launches and acc adds
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        jnp.concatenate(his, axis=0),
        jnp.concatenate(los, axis=0),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def pallas_available() -> bool:
    return _PALLAS_OK


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def histogram_pallas(
    data: jnp.ndarray,
    valid_len: jnp.ndarray,
    rows: int = ROWS,
    interpret: bool = False,
) -> jnp.ndarray:
    """int32[256] histogram of ``data[:valid_len]`` via the Pallas kernel.

    Same contract as ``histogram_device``: ``data`` is a padded static-shape
    uint8 chunk; bytes at or beyond ``valid_len`` are redirected to bin 0 and
    subtracted afterwards.  ``interpret=True`` runs the kernel in the Pallas
    interpreter (CPU CI); on TPU it compiles through Mosaic.
    """
    n = data.shape[0]
    if n > _MAX_BYTES_EXACT:
        # keep every f32 accumulator entry < 2^24: histogram exact-sized
        # segments independently (shapes are static, so this unrolls into a
        # handful of pallas_calls) and sum the int32 results
        parts = []
        for off in range(0, n, _MAX_BYTES_EXACT):
            seg = data[off : off + _MAX_BYTES_EXACT]
            seg_valid = jnp.clip(
                valid_len.astype(jnp.int32) - off, 0, seg.shape[0]
            )
            parts.append(histogram_pallas(seg, seg_valid, rows, interpret))
        return jnp.sum(jnp.stack(parts), axis=0)
    idx = jnp.arange(n, dtype=jnp.int32)
    masked = jnp.where(idx < valid_len, data, jnp.uint8(0))
    block = rows * 128
    pad = (-n) % block
    if pad:
        masked = jnp.concatenate([masked, jnp.zeros(pad, jnp.uint8)])
    mat = masked.reshape(-1, 128)
    grid = mat.shape[0] // rows

    acc = pl.pallas_call(
        _hist_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((128, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        interpret=interpret,
    )(mat)

    # acc[p, q] with p = hi*8 + slot_a, q = lo*8 + slot_b; the slot_a==slot_b
    # diagonal blocks are the per-slot histograms
    c4 = acc.reshape(16, 8, 16, 8)
    diag = jnp.diagonal(c4, axis1=1, axis2=3)  # (16, 16, 8)
    hist = diag.sum(axis=-1).reshape(256).astype(jnp.int32)
    # remove the pad/mask bytes redirected into bin 0
    return hist.at[0].add(-(jnp.int32(n + pad) - valid_len.astype(jnp.int32)))
