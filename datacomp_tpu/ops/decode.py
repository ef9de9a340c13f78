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
    words: jnp.ndarray,      # uint32[W+1] compressed stream as big-endian-bit words (1 pad word)
    gaps: jnp.ndarray,       # uint32[num_subblocks] absolute start bit per sub-block
    table: jnp.ndarray,      # int32[2^table_bits]
    subblock: int,           # symbols per sub-block (static)
    num_subblocks: int,      # static padded sub-block count
    table_bits: int = TABLE_BITS,
):
    """Decode ``num_subblocks × subblock`` symbols → uint8[num_subblocks*subblock].

    Sub-blocks beyond the real data decode garbage from padded state; callers
    slice to the true symbol count.  All lanes advance one symbol per scan
    step: 2 word-gathers + 1 table-gather per lane per step.
    """
    nwords = words.shape[0]
    pos0 = gaps.astype(jnp.int32)

    def step(pos, _):
        wi = pos >> 5
        bi = (pos & 31).astype(jnp.uint32)
        w0 = words[jnp.clip(wi, 0, nwords - 1)]
        w1 = words[jnp.clip(wi + 1, 0, nwords - 1)]
        win = jnp.where(
            bi > 0,
            (w0 << bi) | (w1 >> (jnp.uint32(32) - jnp.maximum(bi, jnp.uint32(1)))),
            w0,
        )
        entry = table[(win >> jnp.uint32(32 - table_bits)).astype(jnp.int32)]
        ln = entry >> 8
        sym = (entry & 255).astype(jnp.uint8)
        return pos + ln, sym

    _, syms = jax.lax.scan(step, pos0, None, length=subblock)
    # syms: (subblock, num_subblocks) → row-major symbol order
    return syms.T.reshape(num_subblocks * subblock)


def payload_to_words(payload: bytes) -> np.ndarray:
    """Byte stream → uint32 words (big-endian bit order) + 1 zero pad word."""
    pad = (-len(payload)) % 4
    buf = payload + b"\x00" * (pad + 4)
    return np.frombuffer(buf, dtype=">u4").astype(np.uint32)
