// Native Huffman bit-packing backend for repnerv_tpu.compress.huffman.
//
// The entropy coder is the only irreducibly serial host-side stage of the
// compression pipeline (quantized-weight streams run to ~10^6 symbols), so
// the pack/unpack loops live here.  Exposed via a C ABI for ctypes — no
// pybind11 dependency.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libhuffman.so huffman.cpp

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Encode symbol indices into a MSB-first bitstream.
//   idx:    [n] symbol indices into the code table
//   lens:   [n_syms] code bit-lengths
//   codes:  [n_syms] code values (right-aligned)
//   out:    caller-allocated buffer of at least (sum(lens[idx]) + 7) / 8
// Returns the number of bits written, or -1 on overflow of out_capacity.
long long huffman_encode(const int32_t* idx, long long n,
                         const int32_t* lens, const uint64_t* codes,
                         uint8_t* out, long long out_capacity) {
  uint64_t acc = 0;
  int acc_bits = 0;
  long long out_pos = 0;
  long long total_bits = 0;
  for (long long i = 0; i < n; ++i) {
    const int32_t s = idx[i];
    const int ln = lens[s];
    acc = (acc << ln) | codes[s];
    acc_bits += ln;
    total_bits += ln;
    while (acc_bits >= 8) {
      acc_bits -= 8;
      if (out_pos >= out_capacity) return -1;
      out[out_pos++] = static_cast<uint8_t>((acc >> acc_bits) & 0xFF);
    }
  }
  if (acc_bits > 0) {
    if (out_pos >= out_capacity) return -1;
    out[out_pos++] = static_cast<uint8_t>((acc << (8 - acc_bits)) & 0xFF);
  }
  return total_bits;
}

// Decode a bitstream back to symbol indices using a canonical-code table.
//   blob:     [n_bytes] packed bits, MSB-first
//   lens:     [n_syms] bit-lengths (canonical order = table order)
//   codes:    [n_syms] code values
//   out_idx:  [n_symbols] decoded indices
// Returns number of symbols decoded (== n_symbols on success).
long long huffman_decode(const uint8_t* blob, long long n_bytes,
                         const int32_t* lens, const uint64_t* codes,
                         long long n_syms, int32_t* out_idx,
                         long long n_symbols) {
  // Build (len, code) -> index lookup grouped by length for linear probing.
  int max_len = 0;
  for (long long s = 0; s < n_syms; ++s)
    if (lens[s] > max_len) max_len = lens[s];
  // first_code[l], first_index[l]: canonical codes of one length are
  // consecutive integers, so membership is a range check.
  std::vector<uint64_t> first_code(max_len + 1, 0);
  std::vector<long long> first_index(max_len + 1, -1);
  std::vector<long long> count(max_len + 1, 0);
  for (long long s = 0; s < n_syms; ++s) {
    const int l = lens[s];
    if (first_index[l] < 0 || codes[s] < first_code[l]) {
      first_code[l] = codes[s];
      first_index[l] = s;
    }
    ++count[l];
  }
  uint64_t cur = 0;
  int cur_len = 0;
  long long produced = 0;
  for (long long b = 0; b < n_bytes && produced < n_symbols; ++b) {
    const uint8_t byte = blob[b];
    for (int bit = 7; bit >= 0 && produced < n_symbols; --bit) {
      cur = (cur << 1) | ((byte >> bit) & 1u);
      ++cur_len;
      if (cur_len <= max_len && first_index[cur_len] >= 0) {
        const uint64_t lo = first_code[cur_len];
        if (cur >= lo && cur < lo + static_cast<uint64_t>(count[cur_len])) {
          out_idx[produced++] =
              static_cast<int32_t>(first_index[cur_len] + (cur - lo));
          cur = 0;
          cur_len = 0;
        }
      }
    }
  }
  return produced;
}

}  // extern "C"
