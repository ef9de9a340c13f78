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
int64_t dcz_encode(const uint8_t* data, int64_t n, const int32_t* lengths,
                   const uint32_t* codes, uint8_t* out, int64_t out_cap) {
  uint64_t acc = 0;
  int nbits = 0;  // bits currently held in acc (left-aligned at bit 63)
  int64_t w = 0;
  for (int64_t i = 0; i < n; i++) {
    const uint8_t b = data[i];
    const int l = lengths[b];
    acc |= static_cast<uint64_t>(codes[b]) << (64 - nbits - l);
    nbits += l;
    while (nbits >= 8) {
      if (w >= out_cap) return -1;
      out[w++] = static_cast<uint8_t>(acc >> 56);
      acc <<= 8;
      nbits -= 8;
    }
  }
  if (nbits > 0) {
    if (w >= out_cap) return -1;
    out[w++] = static_cast<uint8_t>(acc >> 56);
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
    while (nbits <= 56 && r < comp_len) {
      acc |= static_cast<uint64_t>(comp[r++]) << (56 - nbits);
      nbits += 8;
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

}  // extern "C"
