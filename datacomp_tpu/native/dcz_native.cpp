// Native host codec for datacomp-tpu: canonical-Huffman bit-serial encoder,
// table-based decoder, and byte histogram.
//
// These are the host-side (CPU-service / fallback-chain) equivalents of the
// reference's hot loops:
//   * encode:    service/cpu/CpuCompressionService.java:303-315 + BitOutputStream
//   * decode:    core/TableBasedHuffmanDecoder.java (10-bit table + long-code
//                fallback); here a 16-bit-capped single-level table + canonical
//                limit/base fallback for longer codes
//   * histogram: service/cpu/CpuFrequencyService.java (ForkJoin split; here a
//                4-way unrolled single pass — callers parallelize across chunks)
//
// Bit order: MSB-first, codewords high-bit-first, trailing partial byte
// zero-padded — identical to the reference's BitOutputStream.writeBits.
//
// Build: g++ -O3 -shared -fPIC (see build.py). Pure C ABI for ctypes.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

void dcz_histogram(const uint8_t* data, int64_t n, int64_t* out256) {
  int64_t h0[256] = {0}, h1[256] = {0}, h2[256] = {0}, h3[256] = {0};
  int64_t i = 0;
  for (; i + 4 <= n; i += 4) {
    h0[data[i]]++;
    h1[data[i + 1]]++;
    h2[data[i + 2]]++;
    h3[data[i + 3]]++;
  }
  for (; i < n; i++) h0[data[i]]++;
  for (int s = 0; s < 256; s++) out256[s] = h0[s] + h1[s] + h2[s] + h3[s];
}

// Encode n input bytes; returns number of output bytes written, or -1 if
// out_cap insufficient. Exact output size = ceil(sum(lengths[data]) / 8).
// Hot loop: one fused (len<<32|code) table load per symbol, 32-bit
// byte-swapped flushes (the reference's BitOutputStream shifts bit-by-bit).
int64_t dcz_encode(const uint8_t* data, int64_t n, const int32_t* lengths,
                   const uint32_t* codes, uint8_t* out, int64_t out_cap) {
  // thin wrapper kept for ABI stability; no gap emission
  extern int64_t dcz_encode_gaps(const uint8_t*, int64_t, const int32_t*,
                                 const uint32_t*, uint8_t*, int64_t,
                                 uint32_t*, int64_t);
  return dcz_encode_gaps(data, n, lengths, codes, out, out_cap, nullptr, 0);
}

// Encode + optionally record the absolute bit offset of every `subblock`-th
// symbol (the format-v2 gap array — free here, the bit position is the
// encoder's own running counter).
int64_t dcz_encode_gaps(const uint8_t* data, int64_t n, const int32_t* lengths,
                        const uint32_t* codes, uint8_t* out, int64_t out_cap,
                        uint32_t* gaps, int64_t subblock) {
  // Per-symbol fused entry: codeword LEFT-aligned at bit 63 with the length
  // packed in the low 6 bits (codes are <= 32 bits so bits 0..31 of the
  // aligned word are zero; bit 5..0 are free).
  uint64_t tbl[256];
  for (int i = 0; i < 256; i++) {
    const int l = lengths[i];
    const uint64_t left =
        l > 0 ? static_cast<uint64_t>(codes[i]) << (64 - l) : 0ull;
    tbl[i] = left | static_cast<uint64_t>(l);
  }
  uint64_t acc = 0;
  int nbits = 0;  // bits held in acc, left-aligned at bit 63 (always < 32)
  int64_t w = 0;
  // Branchless flush: unconditionally store the next 4 bytes every symbol
  // (later stores overwrite speculative garbage), advance only when a full
  // 32-bit block is ready.  Caller must provide >= 8 bytes of slack beyond
  // the exact output size (see the -2 sentinel check below).
  const int64_t guard = out_cap - 8;
  // Outer loop per sub-block keeps gap emission out of the hot loop: the
  // running bit position is (8w + nbits) — no extra per-symbol state.
  const int64_t stride = (gaps != nullptr && subblock > 0) ? subblock : n;
  int64_t gi = 0;
  for (int64_t b0 = 0; b0 < n || (b0 == 0 && n == 0); b0 += stride) {
    if (gaps != nullptr) {
      gaps[gi++] = static_cast<uint32_t>((static_cast<uint64_t>(w) << 3) + nbits);
    }
    const int64_t b1 = b0 + stride < n ? b0 + stride : n;
    for (int64_t i = b0; i < b1; i++) {
      const uint64_t e = tbl[data[i]];
      acc |= (e & ~63ull) >> nbits;
      nbits += static_cast<int>(e & 63u);
      if (w > guard) return -1;
      const uint32_t blk = __builtin_bswap32(static_cast<uint32_t>(acc >> 32));
      std::memcpy(out + w, &blk, 4);
      const int full = nbits >> 5;  // 0 or 1
      w += static_cast<int64_t>(full) << 2;
      acc <<= (full << 5);
      nbits -= full << 5;
    }
    if (n == 0) break;
  }
  while (nbits > 0) {  // trailing partial bytes, zero-padded
    if (w >= out_cap) return -1;
    out[w++] = static_cast<uint8_t>(acc >> 56);
    acc <<= 8;
    nbits -= 8;
  }
  return w;
}

// Canonical table-based decode. Returns 0 on success, -1 on invalid code,
// -2 on invalid code-length table.
int64_t dcz_decode(const uint8_t* comp, int64_t comp_len, int64_t n_symbols,
                   const int32_t* lengths, uint8_t* out) {
  if (n_symbols == 0) return 0;
  int max_len = 0, min_len = 64;
  int64_t counts[40] = {0};
  for (int s = 0; s < 256; s++) {
    const int l = lengths[s];
    if (l < 0 || l > 32) return -2;
    if (l > 0) {
      counts[l]++;
      if (l > max_len) max_len = l;
      if (l < min_len) min_len = l;
    }
  }
  if (max_len == 0) return -2;

  // Canonical first-code per length and per-length symbol bases.
  int64_t first[40] = {0}, base[40] = {0}, limit[40] = {0};
  int64_t code = 0, nsyms = 0;
  for (int l = 1; l <= max_len; l++) {
    code = (code + counts[l - 1]) << 1;
    first[l] = code;
    base[l] = nsyms;
    nsyms += counts[l];
    limit[l] = first[l] + counts[l];
  }
  // Symbols sorted by (length, symbol).
  std::vector<uint8_t> sym_sorted(static_cast<size_t>(nsyms));
  {
    int64_t fill[40];
    std::memcpy(fill, base, sizeof(fill));
    for (int s = 0; s < 256; s++) {
      const int l = lengths[s];
      if (l > 0) sym_sorted[static_cast<size_t>(fill[l]++)] = static_cast<uint8_t>(s);
    }
  }

  const int TB = max_len < 16 ? max_len : 16;  // primary table bits
  std::vector<uint16_t> table(static_cast<size_t>(1) << TB, 0xFFFF);
  for (int l = 1; l <= TB; l++) {
    for (int64_t c = first[l]; c < limit[l]; c++) {
      const uint8_t sym = sym_sorted[static_cast<size_t>(base[l] + c - first[l])];
      const uint64_t start = static_cast<uint64_t>(c) << (TB - l);
      const uint64_t span = static_cast<uint64_t>(1) << (TB - l);
      const uint16_t entry = static_cast<uint16_t>((l << 8) | sym);
      for (uint64_t k = 0; k < span; k++) table[start + k] = entry;
    }
  }

  uint64_t acc = 0;  // bits left-aligned at bit 63
  int nbits = 0;
  int64_t r = 0;  // input byte cursor
  for (int64_t i = 0; i < n_symbols; i++) {
    while (nbits <= 32) {  // word-wise big-endian refill, byte-wise tail
      if (r + 4 <= comp_len) {
        uint32_t v;
        std::memcpy(&v, comp + r, 4);
        acc |= static_cast<uint64_t>(__builtin_bswap32(v)) << (32 - nbits);
        r += 4;
        nbits += 32;
      } else if (r < comp_len) {
        acc |= static_cast<uint64_t>(comp[r++]) << (56 - nbits);
        nbits += 8;
      } else {
        break;
      }
    }
    const uint32_t peek = static_cast<uint32_t>(acc >> (64 - TB));
    const uint16_t e = table[peek];
    int l;
    uint8_t sym;
    if (e != 0xFFFF) {
      l = e >> 8;
      sym = static_cast<uint8_t>(e & 0xFF);
    } else {
      // long code: canonical scan TB+1..max_len
      l = 0;
      sym = 0;
      for (int ln = TB + 1; ln <= max_len; ln++) {
        const int64_t c = static_cast<int64_t>(acc >> (64 - ln));
        if (c < limit[ln]) {
          l = ln;
          sym = sym_sorted[static_cast<size_t>(base[ln] + c - first[ln])];
          break;
        }
      }
      if (l == 0) return -1;
    }
    out[i] = sym;
    acc <<= l;
    nbits -= l;
    if (nbits < 0) return -1;  // ran past end of stream
  }
  return 0;
}

// Gap-array parallel decode (format v2): sub-block entry bit offsets let
// several cursors walk the stream concurrently — here 4 interleaved cursors
// in one loop so independent table-lookup chains overlap in the pipeline
// (the ILP analogue of the TPU decoder's thousands of lanes).  Returns 0 on
// success, -1 invalid code, -2 invalid table, -3 bad gap metadata.
int64_t dcz_decode_gaps(const uint8_t* comp, int64_t comp_len, int64_t n_symbols,
                        const int32_t* lengths, const uint32_t* gap_bits,
                        int64_t ngaps, int64_t subblock, uint8_t* out) {
  if (n_symbols == 0) return 0;
  if (ngaps <= 0 || subblock <= 0) return -3;
  if ((ngaps - 1) * subblock >= n_symbols || ngaps * subblock < n_symbols) return -3;

  int max_len = 0;
  int64_t counts[40] = {0};
  for (int s = 0; s < 256; s++) {
    const int l = lengths[s];
    if (l < 0 || l > 32) return -2;
    if (l > 0) {
      counts[l]++;
      if (l > max_len) max_len = l;
    }
  }
  if (max_len == 0) return -2;
  int64_t first[40] = {0}, base[40] = {0}, limit[40] = {0};
  int64_t code = 0, nsyms = 0;
  for (int l = 1; l <= max_len; l++) {
    code = (code + counts[l - 1]) << 1;
    first[l] = code;
    base[l] = nsyms;
    nsyms += counts[l];
    limit[l] = first[l] + counts[l];
  }
  std::vector<uint8_t> sym_sorted(static_cast<size_t>(nsyms));
  {
    int64_t fill[40];
    std::memcpy(fill, base, sizeof(fill));
    for (int s = 0; s < 256; s++) {
      const int l = lengths[s];
      if (l > 0) sym_sorted[static_cast<size_t>(fill[l]++)] = static_cast<uint8_t>(s);
    }
  }
  // 16-bit PAIR table: each entry decodes 1 or 2 symbols per lookup.
  // layout: sym1 | sym2<<8 | count<<16 | totalLen<<18 ; ESCAPE = long code.
  constexpr uint32_t ESCAPE = 0xFFFFFFFFu;
  std::vector<uint32_t> pt(static_cast<size_t>(1) << 16, ESCAPE);
  const int L1 = max_len < 16 ? max_len : 16;
  for (int l1 = 1; l1 <= L1; l1++) {
    for (int64_t c1 = first[l1]; c1 < limit[l1]; c1++) {
      const uint8_t s1 = sym_sorted[static_cast<size_t>(base[l1] + c1 - first[l1])];
      const uint64_t start1 = static_cast<uint64_t>(c1) << (16 - l1);
      const uint64_t span1 = static_cast<uint64_t>(1) << (16 - l1);
      const uint32_t e1 =
          static_cast<uint32_t>(s1) | (1u << 16) | (static_cast<uint32_t>(l1) << 18);
      for (uint64_t k = 0; k < span1; k++) pt[start1 + k] = e1;
      const int rem = 16 - l1;
      for (int l2 = 1; l2 <= rem && l2 <= max_len; l2++) {
        for (int64_t c2 = first[l2]; c2 < limit[l2]; c2++) {
          const uint8_t s2 =
              sym_sorted[static_cast<size_t>(base[l2] + c2 - first[l2])];
          const uint64_t start2 =
              start1 + (static_cast<uint64_t>(c2) << (rem - l2));
          const uint64_t span2 = static_cast<uint64_t>(1) << (rem - l2);
          const uint32_t e2 = static_cast<uint32_t>(s1) |
                              (static_cast<uint32_t>(s2) << 8) | (2u << 16) |
                              (static_cast<uint32_t>(l1 + l2) << 18);
          for (uint64_t k = 0; k < span2; k++) pt[start2 + k] = e2;
        }
      }
    }
  }

  struct Cursor {
    uint64_t acc = 0;
    int nbits = 0;
    int64_t r = 0;      // byte cursor
    int64_t oi = 0;     // next output index
    int64_t end = 0;    // one-past-last output index
  };

  auto init_cursor = [&](Cursor& cu, int64_t gap_index) {
    const uint64_t bit = gap_bits[gap_index];
    cu.r = static_cast<int64_t>(bit >> 3);
    cu.acc = 0;
    cu.nbits = 0;
    const int drop = static_cast<int>(bit & 7u);
    // preload one byte and discard the leading bits of the sub-block's byte
    if (cu.r < comp_len) {
      cu.acc = static_cast<uint64_t>(comp[cu.r++]) << 56;
      cu.nbits = 8;
    }
    cu.acc <<= drop;
    cu.nbits -= drop;
  };

  auto refill = [&](Cursor& cu) {
    while (cu.nbits <= 32) {
      if (cu.r + 4 <= comp_len) {
        uint32_t v;
        std::memcpy(&v, comp + cu.r, 4);
        cu.acc |= static_cast<uint64_t>(__builtin_bswap32(v)) << (32 - cu.nbits);
        cu.r += 4;
        cu.nbits += 32;
      } else if (cu.r < comp_len) {
        cu.acc |= static_cast<uint64_t>(comp[cu.r++]) << (56 - cu.nbits);
        cu.nbits += 8;
      } else {
        break;
      }
    }
  };

  // decode 1-2 symbols via the pair table; sym2 is written unconditionally
  // (callers provide +1 byte of slack past out[n-1]); returns 0 on error.
  // allow_pair=false near a cursor's span end (never emit past `end`).
  auto step = [&](Cursor& cu, bool allow_pair) -> int {
    const uint32_t e = pt[static_cast<uint32_t>(cu.acc >> 48)];
    if (e != ESCAPE) {
      const int cnt0 = static_cast<int>((e >> 16) & 3u);
      const int use_pair = (cnt0 == 2) & static_cast<int>(allow_pair);
      out[cu.oi] = static_cast<uint8_t>(e & 0xFF);
      out[cu.oi + 1] = static_cast<uint8_t>((e >> 8) & 0xFF);
      int l = static_cast<int>(e >> 18);
      if (!use_pair && cnt0 == 2) {
        // take only the first symbol: recover its length from the stream
        // via the single-symbol canonical tables
        l = 0;
        for (int ln = 1; ln <= max_len; ln++) {
          const int64_t c = static_cast<int64_t>(cu.acc >> (64 - ln));
          if (counts[ln] && c < limit[ln]) { l = ln; break; }
        }
        if (l == 0) return 0;
        cu.oi += 1;
      } else {
        cu.oi += 1 + use_pair;
      }
      cu.acc <<= l;
      cu.nbits -= l;
      return cu.nbits >= 0 ? 1 : 0;
    }
    // long code: canonical scan 17..max_len
    int l = 0;
    uint8_t sym = 0;
    for (int ln = 17; ln <= max_len; ln++) {
      const int64_t c = static_cast<int64_t>(cu.acc >> (64 - ln));
      if (c < limit[ln]) {
        l = ln;
        sym = sym_sorted[static_cast<size_t>(base[ln] + c - first[ln])];
        break;
      }
    }
    if (l == 0 || l > cu.nbits) return 0;
    out[cu.oi++] = sym;
    cu.acc <<= l;
    cu.nbits -= l;
    return 1;
  };

  constexpr int W = 4;
  // contiguous spans of whole sub-blocks per cursor
  const int64_t blocks_per = (ngaps + W - 1) / W;
  Cursor cur[W];
  int active = 0;
  for (int k = 0; k < W; k++) {
    const int64_t b0 = k * blocks_per;
    if (b0 >= ngaps) { cur[k].oi = cur[k].end = 0; continue; }
    const int64_t b1 = b0 + blocks_per < ngaps ? b0 + blocks_per : ngaps;
    init_cursor(cur[k], b0);
    cur[k].oi = b0 * subblock;
    cur[k].end = b1 * subblock < n_symbols ? b1 * subblock : n_symbols;
    active++;
  }
  (void)active;
  // joint loop: 4 independent decode chains per iteration (pairs allowed
  // while >= 2 symbols remain in a cursor's span)
  while (true) {
    bool all_done = true;
    bool any_err = false;
    for (int k = 0; k < W; k++) {
      if (cur[k].oi >= cur[k].end) continue;
      all_done = false;
      refill(cur[k]);
      if (step(cur[k], cur[k].oi + 1 < cur[k].end) == 0) any_err = true;
    }
    if (any_err) return -1;
    if (all_done) break;
  }
  return 0;
}

}  // extern "C"
