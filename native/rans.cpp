// rANS (range asymmetric numeral system) static-model entropy codec.
//
// Replaces Huffman's per-symbol integer-bit rounding (~9% overhead on the
// quantized-weight distributions this framework emits) with near-entropy
// coding (~0.1-1% overhead), directly improving the BPP number the
// compression pipeline reports.  Host-side and irreducibly serial, like the
// Huffman backend — the one place native code pays off in this framework.
//
// Scheme: classic 32-bit single-state rANS with byte renormalization
// (Duda 2013).  Frequencies are pre-quantized to sum to 1 << scale_bits by
// the Python caller; encoding runs over symbols in reverse so decoding is
// forward (LIFO).  State serialized little-endian in the last 4 bytes.
//
// Build: g++ -O3 -shared -fPIC -o librans.so rans.cpp   (auto-built by
// repnerv_tpu/compress/native.py on first use).

#include <cstdint>
#include <cstring>

namespace {
constexpr uint32_t RANS_L = 1u << 23;  // renormalization lower bound
}

extern "C" {

// idx: symbol indices [n]; freq/cum: quantized tables [n_syms] (cum[i] =
// sum of freq[:i]); out: capacity cap bytes.  Returns bytes written or -1.
long long rans_encode(const int32_t* idx, long long n, const uint32_t* freq,
                      const uint32_t* cum, int32_t scale_bits, uint8_t* out,
                      long long cap) {
  uint32_t x = RANS_L;
  long long pos = cap;  // fill backwards, then memmove to front
  for (long long i = n - 1; i >= 0; --i) {
    const uint32_t f = freq[idx[i]];
    if (f == 0) return -1;
    // renormalize: keep x < (RANS_L >> scale_bits << 8) * f after encoding
    const uint32_t x_max = ((RANS_L >> scale_bits) << 8) * f;
    while (x >= x_max) {
      if (pos <= 4) return -1;
      out[--pos] = static_cast<uint8_t>(x & 0xFF);
      x >>= 8;
    }
    x = ((x / f) << scale_bits) + (x % f) + cum[idx[i]];
  }
  if (pos < 4) return -1;
  // prepend final state (little-endian)
  pos -= 4;
  out[pos + 0] = static_cast<uint8_t>(x & 0xFF);
  out[pos + 1] = static_cast<uint8_t>((x >> 8) & 0xFF);
  out[pos + 2] = static_cast<uint8_t>((x >> 16) & 0xFF);
  out[pos + 3] = static_cast<uint8_t>((x >> 24) & 0xFF);
  const long long nbytes = cap - pos;
  std::memmove(out, out + pos, static_cast<size_t>(nbytes));
  return nbytes;
}

// slot2sym: lookup table of size (1 << scale_bits) mapping slot -> symbol
// index.  Returns symbols produced (== n on success) or -1.
long long rans_decode(const uint8_t* blob, long long nbytes,
                      const uint32_t* freq, const uint32_t* cum,
                      const int32_t* slot2sym, int32_t scale_bits,
                      int32_t* out, long long n) {
  if (nbytes < 4) return -1;
  uint32_t x = static_cast<uint32_t>(blob[0]) |
               (static_cast<uint32_t>(blob[1]) << 8) |
               (static_cast<uint32_t>(blob[2]) << 16) |
               (static_cast<uint32_t>(blob[3]) << 24);
  long long pos = 4;
  const uint32_t mask = (1u << scale_bits) - 1;
  for (long long i = 0; i < n; ++i) {
    const uint32_t slot = x & mask;
    const int32_t s = slot2sym[slot];
    out[i] = s;
    x = freq[s] * (x >> scale_bits) + slot - cum[s];
    // renormalize after EVERY symbol (incl. the last: the encoder may have
    // emitted renorm bytes before its first encode step, and the final
    // renorm is what restores x to the encoder's initial RANS_L)
    while (x < RANS_L) {
      if (pos >= nbytes) return -1;
      x = (x << 8) | blob[pos++];
    }
  }
  return (x == RANS_L && pos == nbytes) ? n : -1;
}

}  // extern "C"
