// textmae_tpu native entropy-coding runtime (C ABI, loaded via ctypes).
//
// From-scratch 64-bit rANS (range asymmetric numeral system) codec with
// per-symbol CDF indexing and escape/bypass coding for out-of-range symbols,
// plus the exact-integer PMF -> quantized-CDF builder.
//
// Role parity with the reference's native surface (SURVEY.md §2.9): the
// reference relies on compressai's C++ rANS (`BufferedRansEncoder` /
// `RansDecoder`, used at models/Compression/MCM.py:845-887, 917-944) and
// `_CXX.pmf_to_quantized_cdf`. This is an independent implementation with its
// own stream format:
//   * rans64: state in [2^31, 2^63), 32-bit renormalization words,
//   * 16-bit probability precision CDF rows (cdf[0]=0, cdf[len-1]=65536),
//   * bins 0..len-3 are literal symbols, bin len-2 is the escape bin whose
//     payload is a zigzagged value in continuation-coded 4-bit chunks,
//   * flush() emits the final state (2 words) followed by renorm words in
//     decode order.
//
// The Python mirror in textmae_tpu/coding/rans.py implements the identical
// format; tests cross-check byte-for-byte.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kProbBits = 16;
constexpr uint64_t kRansL = 1ull << 31;

struct RansEncState {
  uint64_t x = kRansL;
  // Renorm words, in emission order (reverse of decode order).
  std::vector<uint32_t> words;

  inline void put(uint32_t start, uint32_t freq, int prob_bits) {
    uint64_t x_max = ((kRansL >> prob_bits) << 32) * freq;
    if (x >= x_max) {
      words.push_back(static_cast<uint32_t>(x));
      x >>= 32;
    }
    x = ((x / freq) << prob_bits) + (x % freq) + start;
  }

  inline void put_bits(uint32_t val, int nbits) { put(val, 1, nbits); }
};

struct RansDecState {
  uint64_t x = 0;
  const uint32_t* ptr = nullptr;
  const uint32_t* end = nullptr;

  void init(const uint32_t* words, size_t n) {
    // First two words are the final encoder state (hi, lo).
    x = (static_cast<uint64_t>(words[0]) << 32) | words[1];
    ptr = words + 2;
    end = words + n;
  }

  inline uint32_t peek(int prob_bits) {
    return static_cast<uint32_t>(x & ((1u << prob_bits) - 1));
  }

  inline void advance(uint32_t start, uint32_t freq, int prob_bits) {
    x = freq * (x >> prob_bits) + (x & ((1u << prob_bits) - 1)) - start;
    if (x < kRansL && ptr < end) {
      x = (x << 32) | *ptr++;
    }
  }

  inline uint32_t get_bits(int nbits) {
    uint32_t val = static_cast<uint32_t>(x & ((1u << nbits) - 1));
    advance(val, 1, nbits);
    return val;
  }
};

// One buffered encode operation (encoder runs them in reverse at flush time).
struct Op {
  uint32_t start;
  uint32_t freq;
  int8_t prob_bits;  // kProbBits for CDF bins, 4 for bypass chunks
};

inline int64_t row_bin(int32_t symbol, const int32_t* cdf_row, int32_t cdf_len,
                       int32_t offset, std::vector<Op>* ops) {
  // Returns value bin; appends CDF-bin op plus bypass chunk ops if escaped.
  const int32_t max_bin = cdf_len - 2;  // last bin = escape/tail
  int64_t value = static_cast<int64_t>(symbol) - offset;
  // 64-bit raw: |symbol - offset| can reach 2^32 for extreme int32 inputs,
  // so the zigzagged payload needs more than 32 bits (the Python mirror's
  // bignums agree with this format chunk-for-chunk)
  uint64_t raw = 0;
  bool escape = value < 0 || value >= max_bin;
  if (escape) {
    raw = value >= max_bin ? static_cast<uint64_t>(2 * (value - max_bin))
                           : static_cast<uint64_t>(2 * (-value) - 1);
    value = max_bin;
  }
  ops->push_back(Op{static_cast<uint32_t>(cdf_row[value]),
                    static_cast<uint32_t>(cdf_row[value + 1] - cdf_row[value]),
                    kProbBits});
  if (escape) {
    // Continuation-coded 4-bit chunks, low bits first: payload 3 bits + carry.
    while (true) {
      uint32_t chunk = static_cast<uint32_t>(raw & 7u);
      raw >>= 3;
      if (raw) chunk |= 8u;
      ops->push_back(Op{chunk, 1, 4});
      if (!raw) break;
    }
  }
  return value;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// pmf_to_quantized_cdf — exact mirror of textmae_tpu/entropy/tables.py.
// pmf: n doubles (tail mass already appended). out: n+1 int32 CDF.
// Returns 0 on success.
int tm_pmf_to_quantized_cdf(const double* pmf, int n, int precision,
                            int32_t* out) {
  if (n <= 0 || precision <= 0 || precision > 30) return -1;
  double total = 0;
  for (int i = 0; i < n; ++i) {
    if (!(pmf[i] >= 0)) return -2;  // negative or NaN
    total += pmf[i];
  }
  if (!(total > 0)) return -3;
  const int64_t one = int64_t(1) << precision;
  std::vector<int64_t> freqs(n);
  int64_t sum = 0;
  int argmax = 0;
  for (int i = 0; i < n; ++i) {
    // round-half-away-from-zero to match numpy round on non-negative values?
    // numpy rounds half to even; replicate exactly:
    double scaled = pmf[i] * double(one) / total;
    double fl = std::floor(scaled);
    double frac = scaled - fl;
    int64_t f;
    if (frac > 0.5) {
      f = static_cast<int64_t>(fl) + 1;
    } else if (frac < 0.5) {
      f = static_cast<int64_t>(fl);
    } else {  // tie: to even
      int64_t lo = static_cast<int64_t>(fl);
      f = (lo % 2 == 0) ? lo : lo + 1;
    }
    freqs[i] = f;
    sum += f;
    if (freqs[i] > freqs[argmax]) argmax = i;
  }
  freqs[argmax] += one - sum;

  std::vector<int64_t> cdf(n + 1, 0);
  for (int i = 0; i < n; ++i) cdf[i + 1] = cdf[i] + freqs[i];

  for (int i = 0; i < n; ++i) {
    if (cdf[i] == cdf[i + 1]) {
      int64_t best_freq = INT64_MAX;
      int best_steal = -1;
      for (int j = 0; j < n; ++j) {
        int64_t freq = cdf[j + 1] - cdf[j];
        if (freq > 1 && freq < best_freq) {
          best_freq = freq;
          best_steal = j;
        }
      }
      if (best_steal < 0) return -4;
      if (best_steal < i) {
        for (int k = best_steal + 1; k <= i; ++k) cdf[k] -= 1;
      } else {
        for (int k = i + 1; k <= best_steal; ++k) cdf[k] += 1;
      }
    }
  }
  if (cdf[0] != 0 || cdf[n] != one) return -5;
  for (int i = 0; i < n; ++i) {
    if (cdf[i + 1] <= cdf[i]) return -5;
    out[i] = static_cast<int32_t>(cdf[i]);
  }
  out[n] = static_cast<int32_t>(cdf[n]);
  return 0;
}

// ---------------------------------------------------------------------------
// Buffered encoder
struct TmEnc {
  std::vector<Op> ops;
  std::vector<uint8_t> out;
};

TmEnc* tm_enc_new() { return new TmEnc(); }
void tm_enc_free(TmEnc* e) { delete e; }
void tm_enc_reset(TmEnc* e) {
  e->ops.clear();
  e->out.clear();
}

// cdfs: row-major (ncdfs, stride) int32. Returns 0 on success.
int tm_enc_encode_with_indexes(TmEnc* e, const int32_t* symbols,
                               const int32_t* indexes, int64_t n,
                               const int32_t* cdfs, int32_t ncdfs,
                               int32_t stride, const int32_t* cdf_lengths,
                               const int32_t* offsets) {
  for (int64_t i = 0; i < n; ++i) {
    int32_t idx = indexes[i];
    if (idx < 0 || idx >= ncdfs) return -1;
    int32_t len = cdf_lengths[idx];
    if (len < 3 || len > stride) return -2;
    row_bin(symbols[i], cdfs + static_cast<int64_t>(idx) * stride, len,
            offsets[idx], &e->ops);
  }
  return 0;
}

// Encode all buffered ops (in reverse), return stream length; *data points at
// an encoder-owned buffer valid until the next flush/reset/free.
int64_t tm_enc_flush(TmEnc* e, const uint8_t** data) {
  RansEncState st;
  for (auto it = e->ops.rbegin(); it != e->ops.rend(); ++it) {
    st.put(it->start, it->freq, it->prob_bits);
  }
  // Stream layout: [state hi][state lo][renorm words, decode order].
  std::vector<uint32_t> words;
  words.reserve(st.words.size() + 2);
  words.push_back(static_cast<uint32_t>(st.x >> 32));
  words.push_back(static_cast<uint32_t>(st.x));
  for (auto it = st.words.rbegin(); it != st.words.rend(); ++it)
    words.push_back(*it);
  e->out.resize(words.size() * 4);
  std::memcpy(e->out.data(), words.data(), e->out.size());
  e->ops.clear();
  *data = e->out.data();
  return static_cast<int64_t>(e->out.size());
}

// ---------------------------------------------------------------------------
// Streaming decoder (state persists across decode calls, enabling the
// per-slice decode chain of MCM.decompress).
struct TmDec {
  std::vector<uint32_t> words;
  RansDecState st;
};

TmDec* tm_dec_new() { return new TmDec(); }
void tm_dec_free(TmDec* d) { delete d; }

int tm_dec_set_stream(TmDec* d, const uint8_t* data, int64_t len) {
  if (len < 8 || (len % 4) != 0) return -1;
  d->words.resize(len / 4);
  std::memcpy(d->words.data(), data, len);
  d->st.init(d->words.data(), d->words.size());
  return 0;
}

int tm_dec_decode_stream(TmDec* d, const int32_t* indexes, int64_t n,
                         const int32_t* cdfs, int32_t ncdfs, int32_t stride,
                         const int32_t* cdf_lengths, const int32_t* offsets,
                         int32_t* out_symbols) {
  RansDecState& st = d->st;
  for (int64_t i = 0; i < n; ++i) {
    int32_t idx = indexes[i];
    if (idx < 0 || idx >= ncdfs) return -1;
    const int32_t* row = cdfs + static_cast<int64_t>(idx) * stride;
    int32_t len = cdf_lengths[idx];
    if (len < 3 || len > stride) return -2;
    uint32_t dx = st.peek(kProbBits);
    // Find bin: row[bin] <= dx < row[bin+1] over row[0..len-1].
    const int32_t* hi =
        std::upper_bound(row, row + len, static_cast<int32_t>(dx));
    int64_t bin = (hi - row) - 1;
    if (bin < 0 || bin >= len - 1) return -3;
    st.advance(static_cast<uint32_t>(row[bin]),
               static_cast<uint32_t>(row[bin + 1] - row[bin]), kProbBits);
    int64_t value = bin;
    const int32_t max_bin = len - 2;
    if (bin == max_bin) {  // escape: continuation-coded chunks, low bits first
      uint64_t raw = 0;
      int shift = 0;
      while (true) {
        if (shift > 33) return -4;  // legit payloads end by 2^34 (int32 API)
        uint32_t chunk = st.get_bits(4);
        raw |= static_cast<uint64_t>(chunk & 7u) << shift;
        shift += 3;
        if (!(chunk & 8u)) break;
      }
      value = (raw & 1u) ? -static_cast<int64_t>((raw + 1) / 2)
                         : max_bin + static_cast<int64_t>(raw / 2);
    }
    out_symbols[i] = static_cast<int32_t>(value + offsets[idx]);
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Subset decode: the K-of-L membership walk in one call (the Python-side
// per-flag loop costs a ctypes round trip per position; this is one).
// row_map: (K+1)*(L+1) int32, row_map[k_rem*(L+1)+t_rem] = CDF row id for the
// Bernoulli state (or -1 for unreachable states). member: out uint8[L].
int tm_dec_decode_subset(TmDec* d, int32_t length, int32_t k, const int32_t* row_map,
                         const int32_t* cdfs, int32_t ncdfs, int32_t stride,
                         const int32_t* cdf_lengths, uint8_t* member) {
  RansDecState& st = d->st;
  int32_t k_rem = k;
  int32_t t_rem = length;
  std::memset(member, 0, length);
  for (int32_t i = 0; i < length; ++i) {
    if (k_rem == t_rem) {
      std::memset(member + i, 1, length - i);
      break;
    }
    if (k_rem > 0) {
      int32_t row_id = row_map[k_rem * (length + 1) + t_rem];
      if (row_id < 0 || row_id >= ncdfs) return -1;
      const int32_t* row = cdfs + static_cast<int64_t>(row_id) * stride;
      int32_t len = cdf_lengths[row_id];
      uint32_t dx = st.peek(kProbBits);
      const int32_t* hi = std::upper_bound(row, row + len, static_cast<int32_t>(dx));
      int64_t bin = (hi - row) - 1;
      if (bin < 0 || bin > 1) return -2;  // escape bin never encoded here
      st.advance(static_cast<uint32_t>(row[bin]),
                 static_cast<uint32_t>(row[bin + 1] - row[bin]), kProbBits);
      if (bin == 1) {
        member[i] = 1;
        k_rem -= 1;
      }
    }
    t_rem -= 1;
  }
  return 0;
}

}  // extern "C"
