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
// Supported: RIFF/WAVE PCM 8/16/24/32-bit and IEEE float32, plus native
// FLAC (all subframe types, rice/rice2 residuals, stereo decorrelation —
// LibriSpeech's distribution format), any channel count (averaged to
// mono), optional [start_s, end_s) segment slicing — semantics identical
// to openeat_tpu.dataset.audio.read_audio / dataset.flac.read_flac
// (which is also the tested python oracle for this decoder).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <functional>
#include <memory>
#include <mutex>
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

// ---------------------------------------------------------------------------
// FLAC decoder (RFC 9639 subset; mirrors openeat_tpu/dataset/flac.py)

struct BitReader {
  const uint8_t* data;
  size_t nbytes;
  size_t pos = 0;  // bit position
  bool ok = true;

  uint64_t Read(int n) {
    uint64_t v = 0;
    for (int i = 0; i < n; ++i) {
      size_t p = pos + i;
      if (p >= nbytes * 8) {
        ok = false;
        return 0;
      }
      v = (v << 1) | ((data[p >> 3] >> (7 - (p & 7))) & 1);
    }
    pos += n;
    return v;
  }
  int64_t ReadSigned(int n) {
    uint64_t v = Read(n);
    if (n > 0 && (v >> (n - 1))) return (int64_t)v - ((int64_t)1 << n);
    return (int64_t)v;
  }
  int64_t ReadUnary() {
    int64_t q = 0;
    while (true) {
      if (pos >= nbytes * 8) {
        ok = false;
        return 0;
      }
      int bit = (data[pos >> 3] >> (7 - (pos & 7))) & 1;
      ++pos;
      if (bit) return q;
      ++q;
    }
  }
  void Align() { pos = (pos + 7) & ~(size_t)7; }
  size_t BytePos() const { return pos >> 3; }
  bool AtEnd() const { return pos >= nbytes * 8; }
};

uint8_t Crc8(const uint8_t* d, size_t n) {
  uint8_t crc = 0;
  for (size_t i = 0; i < n; ++i) {
    crc ^= d[i];
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x80) ? (uint8_t)((crc << 1) ^ 0x07) : (uint8_t)(crc << 1);
  }
  return crc;
}

uint16_t Crc16(const uint8_t* d, size_t n) {
  uint16_t crc = 0;
  for (size_t i = 0; i < n; ++i) {
    crc ^= (uint16_t)d[i] << 8;
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x8000) ? (uint16_t)((crc << 1) ^ 0x8005)
                           : (uint16_t)(crc << 1);
  }
  return crc;
}

const int kBlockSizes[16] = {0,   192,  576,  1152, 2304, 4608, -1,    -2,
                             256, 512,  1024, 2048, 4096, 8192, 16384, 32768};
const int kSampleRates[16] = {0,     88200, 176400, 192000, 8000, 16000,
                              22050, 24000, 32000,  44100,  48000, 96000,
                              -1,    -2,    -3,     0};
const int kSampleSizes[8] = {0, 8, 12, 0, 16, 20, 24, 32};

bool ReadUtf8Num(BitReader& br, uint64_t* out) {
  uint64_t b0 = br.Read(8);
  if (!br.ok) return false;
  if (b0 < 0x80) {
    *out = b0;
    return true;
  }
  int n = 0;
  while ((b0 << n) & 0x80) ++n;
  if (n < 2 || n > 7) return false;
  uint64_t val = b0 & (0x7Full >> n);
  for (int i = 0; i < n - 1; ++i) {
    uint64_t c = br.Read(8);
    if (!br.ok || (c & 0xC0) != 0x80) return false;
    val = (val << 6) | (c & 0x3F);
  }
  *out = val;
  return true;
}

bool DecodeResidual(BitReader& br, int blocksize, int order,
                    std::vector<int64_t>* out) {
  int method = (int)br.Read(2);
  if (method > 1) return false;
  int pbits = method == 0 ? 4 : 5;
  int escape = (1 << pbits) - 1;
  int porder = (int)br.Read(4);
  int nparts = 1 << porder;
  if (blocksize % nparts || (blocksize >> porder) < order) return false;
  out->clear();
  out->reserve(blocksize - order);
  for (int p = 0; p < nparts; ++p) {
    int count = (blocksize >> porder) - (p == 0 ? order : 0);
    int param = (int)br.Read(pbits);
    if (param == escape) {
      int raw = (int)br.Read(5);
      for (int i = 0; i < count; ++i)
        out->push_back(raw ? br.ReadSigned(raw) : 0);
    } else {
      for (int i = 0; i < count; ++i) {
        int64_t q = br.ReadUnary();
        uint64_t u = ((uint64_t)q << param) | br.Read(param);
        out->push_back((int64_t)(u >> 1) ^ -(int64_t)(u & 1));
      }
    }
    if (!br.ok) return false;
  }
  return true;
}

bool DecodeSubframe(BitReader& br, int blocksize, int bps,
                    std::vector<int64_t>* x) {
  if (br.Read(1)) return false;  // pad bit must be 0
  int t = (int)br.Read(6);
  int wasted = 0;
  if (br.Read(1)) wasted = (int)br.ReadUnary() + 1;
  if (!br.ok) return false;
  bps -= wasted;
  x->assign(blocksize, 0);
  std::vector<int64_t> res;
  if (t == 0) {  // CONSTANT
    int64_t v = br.ReadSigned(bps);
    for (int i = 0; i < blocksize; ++i) (*x)[i] = v;
  } else if (t == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; ++i) (*x)[i] = br.ReadSigned(bps);
  } else if (t >= 8 && t <= 12) {  // FIXED
    int order = t & 7;
    for (int i = 0; i < order; ++i) (*x)[i] = br.ReadSigned(bps);
    if (!DecodeResidual(br, blocksize, order, &res)) return false;
    static const int kC[5][4] = {{0, 0, 0, 0},
                                 {1, 0, 0, 0},
                                 {2, -1, 0, 0},
                                 {3, -3, 1, 0},
                                 {4, -6, 4, -1}};
    for (int i = order; i < blocksize; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += kC[order][j] * (*x)[i - 1 - j];
      (*x)[i] = res[i - order] + pred;
    }
  } else if (t >= 32) {  // LPC
    int order = (t & 31) + 1;
    for (int i = 0; i < order; ++i) (*x)[i] = br.ReadSigned(bps);
    int prec = (int)br.Read(4) + 1;
    if (prec == 16) return false;
    int shift = (int)br.ReadSigned(5);
    if (shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; ++i) coef[i] = br.ReadSigned(prec);
    if (!DecodeResidual(br, blocksize, order, &res)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += coef[j] * (*x)[i - 1 - j];
      (*x)[i] = res[i - order] + (pred >> shift);
    }
  } else {
    return false;
  }
  if (!br.ok) return false;
  if (wasted)
    for (auto& v : *x) v <<= wasted;
  return true;
}

WavResult DecodeFlac(const std::vector<uint8_t>& file, const char* path,
                     double start_s, double end_s) {
  WavResult r;
  if (file.size() < 42 || memcmp(file.data(), "fLaC", 4)) {
    r.error = std::string(path) + ": not FLAC";
    return r;
  }
  size_t pos = 4;
  uint32_t rate = 0;
  int nch = 0, bps = 0;
  uint64_t total = 0;
  bool have_info = false;
  while (pos + 4 <= file.size()) {
    int last = file[pos] >> 7, btype = file[pos] & 0x7F;
    uint32_t blen = ((uint32_t)file[pos + 1] << 16) |
                    ((uint32_t)file[pos + 2] << 8) | file[pos + 3];
    if (btype == 0 && pos + 4 + 34 <= file.size()) {
      const uint8_t* si = file.data() + pos + 4;
      rate = ((uint32_t)si[10] << 12) | ((uint32_t)si[11] << 4) |
             (si[12] >> 4);
      nch = ((si[12] >> 1) & 7) + 1;
      bps = (((si[12] & 1) << 4) | (si[13] >> 4)) + 1;
      total = ((uint64_t)(si[13] & 0x0F) << 32) |
              ((uint64_t)si[14] << 24) | ((uint64_t)si[15] << 16) |
              ((uint64_t)si[16] << 8) | si[17];
      have_info = true;
    }
    pos += 4 + blen;
    if (last) break;
  }
  if (!have_info || rate == 0 || nch == 0) {
    r.error = std::string(path) + ": missing FLAC STREAMINFO";
    return r;
  }
  BitReader br{file.data() + pos, file.size() - pos};
  std::vector<double> mono;  // running mono mix
  if (total) mono.reserve(total);
  std::vector<std::vector<int64_t>> chans(8);
  while (!br.AtEnd()) {
    if ((br.nbytes * 8 - br.pos) < 16) break;  // trailing padding
    size_t frame_start = br.BytePos();
    if (br.Read(14) != 0x3FFE) {
      r.error = std::string(path) + ": FLAC frame sync lost";
      return r;
    }
    br.Read(1);  // reserved
    br.Read(1);  // blocking strategy
    int bs_code = (int)br.Read(4);
    int sr_code = (int)br.Read(4);
    int ch_code = (int)br.Read(4);
    int ss_code = (int)br.Read(3);
    br.Read(1);  // reserved
    uint64_t num;
    if (!ReadUtf8Num(br, &num)) {
      r.error = std::string(path) + ": bad FLAC frame number";
      return r;
    }
    int blocksize;
    if (bs_code == 0) {
      r.error = std::string(path) + ": reserved FLAC blocksize";
      return r;
    } else if (bs_code == 6) {
      blocksize = (int)br.Read(8) + 1;
    } else if (bs_code == 7) {
      blocksize = (int)br.Read(16) + 1;
    } else {
      blocksize = kBlockSizes[bs_code];
    }
    if (sr_code == 12)
      br.Read(8);
    else if (sr_code == 13 || sr_code == 14)
      br.Read(16);
    else if (sr_code == 15) {
      r.error = std::string(path) + ": invalid FLAC sample-rate code";
      return r;
    }
    int fbps = ss_code == 0 ? bps : kSampleSizes[ss_code];
    size_t hdr_end = br.BytePos();
    if (Crc8(br.data + frame_start, hdr_end - frame_start) != br.Read(8)) {
      r.error = std::string(path) + ": FLAC header CRC mismatch";
      return r;
    }
    int fch = ch_code < 8 ? ch_code + 1 : 2;
    for (int c = 0; c < fch; ++c) {
      int b = fbps;
      if ((ch_code == 8 && c == 1) || (ch_code == 9 && c == 0) ||
          (ch_code == 10 && c == 1))
        b += 1;
      if (ch_code > 10) {
        r.error = std::string(path) + ": reserved FLAC channel mode";
        return r;
      }
      if (!DecodeSubframe(br, blocksize, b, &chans[c])) {
        r.error = std::string(path) + ": FLAC subframe decode failed";
        return r;
      }
    }
    br.Align();
    size_t frame_end = br.BytePos();
    uint16_t crc = (uint16_t)br.Read(16);
    if (!br.ok ||
        Crc16(br.data + frame_start, frame_end - frame_start) != crc) {
      r.error = std::string(path) + ": FLAC frame CRC mismatch";
      return r;
    }
    // stereo decorrelation -> independent channels
    if (ch_code == 8) {  // left/side
      for (int i = 0; i < blocksize; ++i) chans[1][i] =
          chans[0][i] - chans[1][i];
    } else if (ch_code == 9) {  // side/right
      for (int i = 0; i < blocksize; ++i) chans[0][i] =
          chans[0][i] + chans[1][i];
    } else if (ch_code == 10) {  // mid/side
      for (int i = 0; i < blocksize; ++i) {
        int64_t mid2 = (chans[0][i] << 1) | (chans[1][i] & 1);
        int64_t side = chans[1][i];
        chans[0][i] = (mid2 + side) >> 1;
        chans[1][i] = (mid2 - side) >> 1;
      }
    }
    double scale = 1.0 / (double)((int64_t)1 << (fbps - 1));
    for (int i = 0; i < blocksize; ++i) {
      double acc = 0.0;
      for (int c = 0; c < fch; ++c) acc += (double)chans[c][i];
      mono.push_back(acc / fch * scale);
    }
  }
  if (total && mono.size() > total) mono.resize(total);
  size_t n_frames = mono.size();
  size_t f0 = 0, f1 = n_frames;
  if (start_s >= 0.0) f0 = (size_t)(start_s * rate);
  if (end_s >= 0.0) f1 = (size_t)(end_s * rate);
  if (f1 > n_frames) f1 = n_frames;
  if (f0 > f1) f0 = f1;
  r.sample_rate = (int32_t)rate;
  r.samples.resize(f1 - f0);
  for (size_t i = f0; i < f1; ++i) r.samples[i - f0] = (float)mono[i];
  return r;
}

// Magic-byte dispatch: RIFF/WAVE -> DecodeWav, fLaC -> DecodeFlac.
WavResult DecodeAudio(const char* path, double start_s, double end_s) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    WavResult r;
    r.error = std::string("cannot open ") + path;
    return r;
  }
  char magic[4] = {0};
  size_t got = fread(magic, 1, 4, f);
  if (got == 4 && !memcmp(magic, "fLaC", 4)) {
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf((size_t)size);
    bool ok = ReadFileRange(f, buf.data(), buf.size());
    fclose(f);
    if (!ok) {
      WavResult r;
      r.error = std::string(path) + ": short read";
      return r;
    }
    return DecodeFlac(buf, path, start_s, end_s);
  }
  fclose(f);
  return DecodeWav(path, start_s, end_s);
}

}  // namespace

extern "C" {

// Single-file probe: returns 0 on success; fills *n_samples/*rate.
int oet_wav_info(const char* path, int64_t* n_samples, int32_t* rate) {
  WavResult r = DecodeAudio(path, -1.0, -1.0);
  if (!r.error.empty()) return 1;
  *n_samples = (int64_t)r.samples.size();
  *rate = r.sample_rate;
  return 0;
}

}  // extern "C"

// Batched parallel decode.
//
// Decode helpers run on a PERSISTENT thread pool. The original design
// spawned n_threads fresh std::threads per call; with ~8 threads per
// batch that thread churn made glibc spread allocations over ever more
// malloc arenas and the freed decode buffers were never returned to the
// OS (~70 MB RSS growth per epoch measured on the AIShell-shaped
// corpus). A lazily-created, grow-only pool keeps the arena set fixed.
namespace {

class DecodePool {
 public:
  // Leaked singleton: worker threads park on the condvar at process
  // exit, which is safe, and avoids joining at static-destructor time.
  static DecodePool& Get() {
    static DecodePool* p = new DecodePool();
    return *p;
  }

  void EnsureThreads(int want) {
    unsigned hw = std::thread::hardware_concurrency();
    int cap = hw ? (int)hw : 4;
    if (want > cap) want = cap;
    std::lock_guard<std::mutex> l(mu_);
    while ((int)threads_.size() < want)
      threads_.emplace_back([this] { Loop(); });
  }

  // INVARIANT for queued closures: the caller of a batched decode may
  // return (and release its output buffers) while stragglers are still
  // queued. A closure must therefore never dereference caller-owned
  // pointers unless it first wins a next.fetch_add() < n claim on the
  // shared BatchState — losing claims must exit touching only the
  // BatchState itself (held alive by shared_ptr). Any future task type
  // capturing caller-owned buffers without that guard is a
  // use-after-free.
  void Submit(std::function<void()> f) {
    {
      std::lock_guard<std::mutex> l(mu_);
      queue_.push_back(std::move(f));
    }
    cv_.notify_one();
  }

 private:
  void Loop() {
    while (true) {
      std::function<void()> task;
      {
        std::unique_lock<std::mutex> l(mu_);
        cv_.wait(l, [this] { return !queue_.empty(); });
        task = std::move(queue_.front());
        queue_.pop_front();
      }
      task();
    }
  }

  std::mutex mu_;
  std::condition_variable cv_;
  std::deque<std::function<void()>> queue_;
  std::vector<std::thread> threads_;
};

// Shared per-call state: worker closures hold it by shared_ptr so a
// straggler task that wakes after the caller returned only touches
// live memory (it sees next >= n and exits without reading the output
// pointers, whose lifetime ends when the caller is released).
struct BatchState {
  std::atomic<int> next{0}, failed{0}, done{0};
  std::mutex m;
  std::condition_variable cv;
};

}  // namespace

extern "C" {

//   paths: n null-terminated strings; starts/ends: seconds (<0 = whole);
//   out: caller buffer [n, max_samples] float32; out_lens: [n];
//   out_rates: [n]. Returns number of failed files (their out_lens = 0).
int oet_read_wav_batch(const char** paths, const double* starts,
                       const double* ends, int n, int n_threads,
                       float* out, int64_t max_samples, int64_t* out_lens,
                       int32_t* out_rates) {
  auto st = std::make_shared<BatchState>();
  auto worker = [st, paths, starts, ends, n, out, max_samples, out_lens,
                 out_rates]() {
    while (true) {
      int i = st->next.fetch_add(1);
      if (i >= n) break;
      WavResult r = DecodeAudio(paths[i], starts[i], ends[i]);
      if (!r.error.empty()) {
        out_lens[i] = 0;
        out_rates[i] = 0;
        st->failed.fetch_add(1);
      } else {
        int64_t m = (int64_t)r.samples.size();
        if (m > max_samples) m = max_samples;
        memcpy(out + (int64_t)i * max_samples, r.samples.data(),
               m * sizeof(float));
        out_lens[i] = m;
        out_rates[i] = r.sample_rate;
      }
      if (st->done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> l(st->m);
        st->cv.notify_all();
      }
    }
  };
  int nt = n_threads > 0 ? n_threads : 4;
  if (nt > n) nt = n;
  DecodePool::Get().EnsureThreads(nt);
  for (int t = 0; t < nt - 1; ++t) DecodePool::Get().Submit(worker);
  worker();  // the calling thread decodes too
  std::unique_lock<std::mutex> l(st->m);
  st->cv.wait(l, [&] { return st->done.load() == n; });
  return st->failed.load();
}

}  // extern "C"
