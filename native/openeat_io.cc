// Native IO runtime: WAV decoding + parallel batch loading.
//
// TPU-native replacement for the reference's C-library data path
// (reference dependency surface, SURVEY.md §2.6: torchaudio sox_io /
// sox_effects C libsox doing wav load + segment slicing inside
// DataLoader worker processes). Python threads can't parallelize PCM
// decode under the GIL; this library decodes batches of wav segments
// with a std::thread pool and returns float32 mono buffers, exposed to
// Python via ctypes (openeat_tpu/runtime/native_io.py).
//
// Supported: RIFF/WAVE PCM 8/16/24/32-bit and IEEE float32, any channel
// count (averaged to mono), optional [start_s, end_s) segment slicing —
// semantics identical to openeat_tpu.dataset.audio.read_wav.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct WavResult {
  std::vector<float> samples;
  int32_t sample_rate = 0;
  std::string error;
};

bool ReadFileRange(FILE* f, void* dst, size_t n) {
  return fread(dst, 1, n, f) == n;
}

WavResult DecodeWav(const char* path, double start_s, double end_s) {
  WavResult r;
  FILE* f = fopen(path, "rb");
  if (!f) {
    r.error = std::string("cannot open ") + path;
    return r;
  }
  char hdr[12];
  if (!ReadFileRange(f, hdr, 12) || memcmp(hdr, "RIFF", 4) ||
      memcmp(hdr + 8, "WAVE", 4)) {
    r.error = std::string(path) + ": not RIFF/WAVE";
    fclose(f);
    return r;
  }
  uint16_t audio_format = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  std::vector<uint8_t> data;
  while (true) {
    char cid[4];
    uint32_t size = 0;
    if (!ReadFileRange(f, cid, 4) || !ReadFileRange(f, &size, 4)) break;
    if (!memcmp(cid, "fmt ", 4)) {
      std::vector<uint8_t> fmt(size);
      if (!ReadFileRange(f, fmt.data(), size)) break;
      memcpy(&audio_format, fmt.data(), 2);
      memcpy(&channels, fmt.data() + 2, 2);
      memcpy(&rate, fmt.data() + 4, 4);
      memcpy(&bits, fmt.data() + 14, 2);
      if (audio_format == 0xFFFE && size >= 26)
        memcpy(&audio_format, fmt.data() + 24, 2);
    } else if (!memcmp(cid, "data", 4)) {
      data.resize(size);
      if (!ReadFileRange(f, data.data(), size)) data.clear();
      break;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
  fclose(f);
  if (data.empty() || rate == 0 || channels == 0) {
    r.error = std::string(path) + ": missing fmt/data";
    return r;
  }
  size_t bytes_per_sample = bits / 8;
  size_t n_frames = data.size() / (bytes_per_sample * channels);
  size_t f0 = 0, f1 = n_frames;
  if (start_s >= 0.0) f0 = (size_t)(start_s * rate);
  if (end_s >= 0.0) f1 = (size_t)(end_s * rate);
  if (f1 > n_frames) f1 = n_frames;
  if (f0 > f1) f0 = f1;
  r.sample_rate = (int32_t)rate;
  r.samples.resize(f1 - f0);
  const uint8_t* p = data.data();
  // fast path: mono 16-bit PCM (the dominant ASR corpus format) — a
  // branch-free loop the compiler auto-vectorizes
  if (audio_format == 1 && bits == 16 && channels == 1) {
    const int16_t* s16 = reinterpret_cast<const int16_t*>(p) + f0;
    float* out = r.samples.data();
    const size_t n = f1 - f0;
    constexpr float kScale = 1.0f / 32768.0f;
    for (size_t i = 0; i < n; ++i) out[i] = s16[i] * kScale;
    return r;
  }
  for (size_t i = f0; i < f1; ++i) {
    double acc = 0.0;
    for (size_t c = 0; c < channels; ++c) {
      const uint8_t* sp = p + (i * channels + c) * bytes_per_sample;
      double v = 0.0;
      if (audio_format == 3 && bits == 32) {  // IEEE float
        float fv;
        memcpy(&fv, sp, 4);
        v = fv;
      } else if (bits == 16) {
        int16_t s;
        memcpy(&s, sp, 2);
        v = s / 32768.0;
      } else if (bits == 32) {
        int32_t s;
        memcpy(&s, sp, 4);
        v = s / 2147483648.0;
      } else if (bits == 8) {
        v = ((int)sp[0] - 128) / 128.0;
      } else if (bits == 24) {
        int32_t s = sp[0] | (sp[1] << 8) | (sp[2] << 16);
        if (s >= (1 << 23)) s -= (1 << 24);
        v = s / 8388608.0;
      }
      acc += v;
    }
    r.samples[i - f0] = (float)(acc / channels);
  }
  return r;
}

}  // namespace

extern "C" {

// Single-file probe: returns 0 on success; fills *n_samples/*rate.
int oet_wav_info(const char* path, int64_t* n_samples, int32_t* rate) {
  WavResult r = DecodeWav(path, -1.0, -1.0);
  if (!r.error.empty()) return 1;
  *n_samples = (int64_t)r.samples.size();
  *rate = r.sample_rate;
  return 0;
}

// Batched parallel decode.
//   paths: n null-terminated strings; starts/ends: seconds (<0 = whole);
//   out: caller buffer [n, max_samples] float32; out_lens: [n];
//   out_rates: [n]. Returns number of failed files (their out_lens = 0).
int oet_read_wav_batch(const char** paths, const double* starts,
                       const double* ends, int n, int n_threads,
                       float* out, int64_t max_samples, int64_t* out_lens,
                       int32_t* out_rates) {
  std::atomic<int> next(0), failed(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      WavResult r = DecodeWav(paths[i], starts[i], ends[i]);
      if (!r.error.empty()) {
        out_lens[i] = 0;
        out_rates[i] = 0;
        failed.fetch_add(1);
        continue;
      }
      int64_t m = (int64_t)r.samples.size();
      if (m > max_samples) m = max_samples;
      memcpy(out + (int64_t)i * max_samples, r.samples.data(),
             m * sizeof(float));
      out_lens[i] = m;
      out_rates[i] = r.sample_rate;
    }
  };
  int nt = n_threads > 0 ? n_threads : 4;
  if (nt > n) nt = n;
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failed.load();
}

}  // extern "C"
