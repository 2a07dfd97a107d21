// ttx_runtime — native CPU helpers for the data/eval pipeline.
//
// The reference's only native component is the CUDA RNN-T loss (replaced by
// Pallas kernels on TPU); host-side, its hot loops are edit-distance CER
// (reference: editdistance package, tt/utils.py:46-50) and WAV decode
// (tt/utils.py:168-177). Exposed via a plain C ABI for ctypes — no pybind11.
//
// Build: make -C csrc   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Levenshtein distance between two int32 sequences.
int64_t ttx_levenshtein(const int32_t* a, int64_t n, const int32_t* b,
                        int64_t m) {
  if (n == 0) return m;
  if (m == 0) return n;
  std::vector<int64_t> prev(m + 1), cur(m + 1);
  for (int64_t j = 0; j <= m; ++j) prev[j] = j;
  for (int64_t i = 1; i <= n; ++i) {
    cur[0] = i;
    const int32_t ai = a[i - 1];
    for (int64_t j = 1; j <= m; ++j) {
      const int64_t sub = prev[j - 1] + (ai != b[j - 1]);
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
    }
    std::swap(prev, cur);
  }
  return prev[m];
}

// Batch edit distance: sequences are concatenated, with per-sequence offsets
// (len k+1, offsets[k] = end). Returns total distance; *total_ref_len gets
// the summed reference lengths (CER denominator).
int64_t ttx_batch_levenshtein(const int32_t* preds, const int64_t* pred_off,
                              const int32_t* refs, const int64_t* ref_off,
                              int64_t batch, int64_t* total_ref_len) {
  int64_t dist = 0, total = 0;
  for (int64_t i = 0; i < batch; ++i) {
    const int64_t pn = pred_off[i + 1] - pred_off[i];
    const int64_t rn = ref_off[i + 1] - ref_off[i];
    dist += ttx_levenshtein(preds + pred_off[i], pn, refs + ref_off[i], rn);
    total += rn;
  }
  if (total_ref_len) *total_ref_len = total;
  return dist;
}

// Minimal RIFF/WAVE PCM16 parser. Returns the number of mono samples written
// into `out` (caller allocates out_capacity int16s; channels are collapsed to
// the first channel), or -1 on parse error. `*sample_rate` receives the rate.
int64_t ttx_parse_wav(const uint8_t* data, int64_t size, int16_t* out,
                      int64_t out_capacity, int32_t* sample_rate) {
  if (size < 44 || std::memcmp(data, "RIFF", 4) || std::memcmp(data + 8, "WAVE", 4))
    return -1;
  int64_t pos = 12;
  int16_t channels = 1;
  int16_t bits = 16;
  int32_t rate = 0;
  while (pos + 8 <= size) {
    const char* tag = reinterpret_cast<const char*>(data + pos);
    uint32_t chunk = 0;
    std::memcpy(&chunk, data + pos + 4, 4);
    if (!std::memcmp(tag, "fmt ", 4)) {
      std::memcpy(&channels, data + pos + 10, 2);
      std::memcpy(&rate, data + pos + 12, 4);
      std::memcpy(&bits, data + pos + 22, 2);
      if (bits != 16) return -1;
    } else if (!std::memcmp(tag, "data", 4)) {
      const int64_t n_frames = chunk / (2 * channels);
      const int64_t n = std::min(n_frames, out_capacity);
      const uint8_t* p = data + pos + 8;
      if (pos + 8 + (int64_t)chunk > size) return -1;
      for (int64_t f = 0; f < n; ++f)
        std::memcpy(out + f, p + f * 2 * channels, 2);
      if (sample_rate) *sample_rate = rate;
      return n;
    }
    pos += 8 + chunk + (chunk & 1);
  }
  return -1;
}

}  // extern "C"
