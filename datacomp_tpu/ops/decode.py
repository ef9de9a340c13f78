"""Device Huffman decoder: gap-array massively parallel table decode.

The reference abandoned in-chunk GPU decode because a Huffman stream is
"inherently sequential" (``gpu/GpuCompressionService.java:1096-1100``) and
falls back to CPU.  This framework goes further via the gap-array method from
the paper bundled with the reference (arXiv:2010.10039): format v2 records the
absolute bit offset of every sub-block of S symbols (free at encode time —
they are values of the same prefix-sum the encoder already computes), so at
decode time thousands of sub-blocks enter the bitstream at known offsets and
decode *concurrently*, one table-lookup step per symbol, vectorized across all
sub-blocks with ``lax.scan``.

The lookup table is the classic canonical table
(``core/TableBasedHuffmanDecoder.java:64-101`` uses 10 bits + slow fallback);
here the table covers ``max_len ≤ 16`` outright (2^16 × int32 = 256 KB —
VMEM-resident) and longer codebooks fall back to the host decoder (they are
vanishingly rare for byte data; the CPU service handles them).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bitio import CanonicalDecodeTables

TABLE_BITS = 16


def build_decode_table(lengths: np.ndarray, table_bits: int = TABLE_BITS) -> np.ndarray:
    """int32[2^table_bits] canonical decode table: entry = (len << 8) | symbol.
    Entries for invalid prefixes are 0 (len 0 ⇒ decode stalls, caught by the
    caller via checksum mismatch).  Requires max code length ≤ table_bits."""
    t = CanonicalDecodeTables(lengths)
    if t.max_len > table_bits:
        raise ValueError(f"max code length {t.max_len} > table bits {table_bits}")
    table = np.zeros(1 << table_bits, dtype=np.int32)
    for ln in range(t.min_len, t.max_len + 1):
        first = int(t.first[ln])
        cnt = int(t.counts[ln])
        if cnt == 0:
            continue
        span = 1 << (table_bits - ln)
        for c in range(first, first + cnt):
            sym = int(t.sym_sorted[int(t.base[ln]) + c - first])
            entry = (ln << 8) | sym
            table[c * span : (c + 1) * span] = entry
    return table


def max_code_len(lengths: np.ndarray) -> int:
    lengths = np.asarray(lengths)
    used = lengths[lengths > 0]
    return int(used.max()) if used.size else 0


@functools.partial(jax.jit, static_argnames=("subblock", "num_subblocks", "table_bits"))
def decode_device(
    words: jnp.ndarray,      # uint32[W+2] compressed stream as big-endian-bit words (2 pad words)
    gaps: jnp.ndarray,       # uint32[num_subblocks] absolute start bit per sub-block
    table: jnp.ndarray,      # int32[2^table_bits]
    subblock: int,           # symbols per sub-block (static, even)
    num_subblocks: int,      # static padded sub-block count
    table_bits: int = TABLE_BITS,
):
    """Decode ``num_subblocks × subblock`` symbols → uint8[num_subblocks*subblock].

    Sub-blocks beyond the real data decode garbage from padded state; callers
    slice to the true symbol count.

    The cost floor on TPU is per-element gathers (~8.5 ns each; the VPU has
    no vector gather).  Each lane therefore keeps a 64-bit bit window as two
    uint32 halves and decodes TWO symbols per scan step with ONE word-refill
    gather: 3 gathers per 2 symbols, versus 3 per symbol for the naive
    per-step window rebuild — measured ~2x.  Invariant: nbits >= 33 at step
    start; two <= 16-bit codes consume <= 32, and a single masked 32-bit
    refill restores the floor.
    """
    assert subblock % 2 == 0, "subblock must be even (2 symbols per step)"
    nwords = words.shape[0]
    u32 = jnp.uint32

    # Init: load two words, discard the bi leading bits.  The buffer's valid
    # bits then END at stream word boundary wi0+2, so refills can append
    # whole words at bit offset nb.
    pos0 = gaps.astype(jnp.int32)
    wi0 = pos0 >> 5
    bi = (pos0 & 31).astype(u32)
    bis = jnp.maximum(bi, u32(1))
    w0 = words[jnp.clip(wi0, 0, nwords - 1)]
    w1 = words[jnp.clip(wi0 + 1, 0, nwords - 1)]
    hi0 = jnp.where(bi > 0, (w0 << bi) | (w1 >> (u32(32) - bis)), w0)
    lo0 = jnp.where(bi > 0, w1 << bi, w1)
    nb0 = (64 - bi).astype(jnp.int32)   # valid bits in (hi, lo), 33..64
    wi = wi0 + 2                        # next unread word

    def decode1(hi, lo, nb):
        entry = table[(hi >> u32(32 - table_bits)).astype(jnp.int32)]
        ln = (entry >> 8).astype(u32)   # 1..table_bits; 0 = invalid (stall)
        sym = (entry & 255).astype(jnp.uint8)
        s = jnp.clip(ln, u32(1), u32(table_bits))
        hi2 = jnp.where(ln > 0, (hi << s) | (lo >> (u32(32) - s)), hi)
        lo2 = jnp.where(ln > 0, lo << s, lo)
        return hi2, lo2, nb - ln.astype(jnp.int32), sym

    def step(state, _):
        hi, lo, nb, wi = state
        hi, lo, nb, s1 = decode1(hi, lo, nb)
        hi, lo, nb, s2 = decode1(hi, lo, nb)
        # masked single-word refill: place the next word at bit offset nb
        w = words[jnp.clip(wi, 0, nwords - 1)]
        need = nb <= 32
        ofs = jnp.clip(nb, 0, 32).astype(u32)
        hi_add = jnp.where(ofs < 32, w >> ofs, u32(0))
        lo_add = jnp.where(ofs > 0, w << (u32(32) - jnp.maximum(ofs, u32(1))), u32(0))
        hi = jnp.where(need, hi | hi_add, hi)
        lo = jnp.where(need, lo | lo_add, lo)
        nb = nb + jnp.where(need, 32, 0)
        wi = wi + need.astype(jnp.int32)
        return (hi, lo, nb, wi), (s1, s2)

    _, (s1, s2) = jax.lax.scan(step, (hi0, lo0, nb0, wi), None, length=subblock // 2)
    # (steps, NL) pairs → per-lane sequential symbol order
    syms = jnp.stack([s1, s2], axis=1)           # (steps, 2, NL)
    return syms.transpose(2, 0, 1).reshape(num_subblocks * subblock)


def payload_to_words(payload: bytes) -> np.ndarray:
    """Byte stream → uint32 words (big-endian bit order) + 2 zero pad words
    (the decoder's 64-bit window may read one word past the final bit)."""
    pad = (-len(payload)) % 4
    buf = bytes(payload) + b"\x00" * (pad + 8)
    return np.frombuffer(buf, dtype=">u4").astype(np.uint32)
