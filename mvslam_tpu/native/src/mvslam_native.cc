// mvslam_native — native (C++) host data-plane for the TPU SLAM framework.
//
// The TPU compute path is JAX/XLA/Pallas; this library is the *runtime*
// around it: image decode and the multithreaded frame loader that feeds
// device windows. It replaces the Python-side cv2.imread + thread-queue
// decode stage of the reference design (reference ingestion_pipeline.py:
// producer thread -> N decode workers -> reorder buffer; frame_stream.py:
// loader thread + bounded ring) with a native equivalent:
//
//   * mvn_decode_gray  — PNG (libpng, 8/16-bit, gray/palette/RGB/RGBA) and
//     PGM (P5) decode straight into a caller-owned 8-bit grayscale buffer.
//     RGB->gray uses ITU-R BT.601 fixed-point coefficients (0.299/0.587/
//     0.114) to match the reference's cv2.imread(IMREAD_GRAYSCALE).
//   * mvn_loader_*     — a work-stealing decode pool (std::thread) over a
//     pre-allocated slot ring delivering frames strictly in order with
//     bounded-capacity backpressure (the reference's deterministic reorder
//     buffer, ingestion_control_plane.py:398-445, done natively: workers
//     may finish out of order, the consumer always sees sequence order).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).
// Thread-safety: one consumer thread per loader; any number of internal
// workers. All buffers are allocated once at loader creation (no per-frame
// malloc on the steady-state path).

#include <png.h>

#include <atomic>
#include <cctype>
#include <chrono>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kOk = 0;
constexpr int kErrOpen = -1;
constexpr int kErrFormat = -2;
constexpr int kErrTooLarge = -3;
constexpr int kErrDecode = -4;

// ---------------------------------------------------------------------------
// PGM (P5) decode
// ---------------------------------------------------------------------------

bool SkipPgmWhitespace(const uint8_t*& p, const uint8_t* end) {
  while (p < end) {
    if (*p == '#') {  // comment to end of line
      while (p < end && *p != '\n') ++p;
    } else if (std::isspace(*p)) {
      ++p;
    } else {
      return true;
    }
  }
  return false;
}

bool ParsePgmInt(const uint8_t*& p, const uint8_t* end, long* out) {
  if (!SkipPgmWhitespace(p, end) || !std::isdigit(*p)) return false;
  long v = 0;
  while (p < end && std::isdigit(*p)) v = v * 10 + (*p++ - '0');
  *out = v;
  return true;
}

int DecodePgmGray(const uint8_t* data, size_t size, uint8_t* out,
                  int32_t cap_h, int32_t cap_w, int32_t* h, int32_t* w) {
  const uint8_t* p = data;
  const uint8_t* end = data + size;
  if (size < 2 || p[0] != 'P' || p[1] != '5') return kErrFormat;
  p += 2;
  long width = 0, height = 0, maxval = 0;
  if (!ParsePgmInt(p, end, &width) || !ParsePgmInt(p, end, &height) ||
      !ParsePgmInt(p, end, &maxval)) {
    return kErrDecode;
  }
  if (p >= end || !std::isspace(*p)) return kErrDecode;
  ++p;  // single whitespace after maxval
  if (width <= 0 || height <= 0 || maxval <= 0 || maxval > 65535) return kErrDecode;
  if (height > cap_h || width > cap_w) return kErrTooLarge;
  const size_t n = static_cast<size_t>(width) * static_cast<size_t>(height);
  if (maxval < 256) {
    if (static_cast<size_t>(end - p) < n) return kErrDecode;
    if (maxval == 255) {
      std::memcpy(out, p, n);
    } else {  // rescale non-standard maxval to [0, 255] with rounding
      for (size_t i = 0; i < n; ++i) {
        long v = p[i] > maxval ? maxval : p[i];
        out[i] = static_cast<uint8_t>((v * 255 + maxval / 2) / maxval);
      }
    }
  } else {  // 16-bit big-endian -> scaled to [0, 255] with rounding
    if (static_cast<size_t>(end - p) < 2 * n) return kErrDecode;
    for (size_t i = 0; i < n; ++i) {
      long v = (static_cast<long>(p[2 * i]) << 8) | p[2 * i + 1];
      if (v > maxval) v = maxval;
      out[i] = static_cast<uint8_t>((v * 255 + maxval / 2) / maxval);
    }
  }
  *h = static_cast<int32_t>(height);
  *w = static_cast<int32_t>(width);
  return kOk;
}

// ---------------------------------------------------------------------------
// PNG decode (full libpng API so we control the RGB->gray coefficients)
// ---------------------------------------------------------------------------

struct PngMemReader {
  const uint8_t* data;
  size_t size;
  size_t offset;
};

void PngReadFromMemory(png_structp png, png_bytep dst, png_size_t len) {
  auto* r = static_cast<PngMemReader*>(png_get_io_ptr(png));
  if (r->offset + len > r->size) {
    png_error(png, "read past end of buffer");
    return;
  }
  std::memcpy(dst, r->data + r->offset, len);
  r->offset += len;
}

int DecodePngGray(const uint8_t* data, size_t size, uint8_t* out,
                  int32_t cap_h, int32_t cap_w, int32_t* h, int32_t* w) {
  if (size < 8 || png_sig_cmp(data, 0, 8) != 0) return kErrFormat;

  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return kErrDecode;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return kErrDecode;
  }
  if (setjmp(png_jmpbuf(png))) {  // libpng error -> long jump here
    png_destroy_read_struct(&png, &info, nullptr);
    return kErrDecode;
  }

  PngMemReader reader{data, size, 0};
  png_set_read_fn(png, &reader, PngReadFromMemory);
  png_read_info(png, info);

  const png_uint_32 width = png_get_image_width(png, info);
  const png_uint_32 height = png_get_image_height(png, info);
  const int color_type = png_get_color_type(png, info);
  const int bit_depth = png_get_bit_depth(png, info);
  if (static_cast<int64_t>(height) > cap_h || static_cast<int64_t>(width) > cap_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    return kErrTooLarge;
  }

  // Normalise every input to 8-bit single-channel gray.
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  // tRNS expansion can ADD an alpha channel to GRAY/PALETTE inputs whose
  // color_type lacks the alpha mask, so strip unconditionally (a no-op
  // when no alpha is present after the transforms above).
  png_set_strip_alpha(png);
  if (color_type == PNG_COLOR_TYPE_RGB || color_type == PNG_COLOR_TYPE_RGB_ALPHA ||
      color_type == PNG_COLOR_TYPE_PALETTE) {
    // BT.601 luma to match the reference path (cv2 IMREAD_GRAYSCALE).
    png_set_rgb_to_gray_fixed(png, 1 /* no error action */, 29900, 58700);
  }
  const int passes = png_set_interlace_handling(png);
  png_read_update_info(png, info);
  if (png_get_rowbytes(png, info) != width) {
    // Any transform combination that does not land on 1 byte/pixel would
    // overrun the row stride below — refuse rather than corrupt memory.
    png_destroy_read_struct(&png, &info, nullptr);
    return kErrDecode;
  }

  // Row-by-row into the caller's buffer: no heap state is live across the
  // setjmp error path above.
  for (int pass = 0; pass < passes; ++pass) {
    for (png_uint_32 y = 0; y < height; ++y) {
      png_read_row(png, out + static_cast<size_t>(y) * width, nullptr);
    }
  }
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);

  *h = static_cast<int32_t>(height);
  *w = static_cast<int32_t>(width);
  return kOk;
}

int DecodeGrayFromMemory(const uint8_t* data, size_t size, uint8_t* out,
                         int32_t cap_h, int32_t cap_w, int32_t* h, int32_t* w) {
  if (size >= 8 && png_sig_cmp(data, 0, 8) == 0) {
    return DecodePngGray(data, size, out, cap_h, cap_w, h, w);
  }
  if (size >= 2 && data[0] == 'P' && data[1] == '5') {
    return DecodePgmGray(data, size, out, cap_h, cap_w, h, w);
  }
  return kErrFormat;
}

int DecodeGrayFromFile(const char* path, uint8_t* out, int32_t cap_h, int32_t cap_w,
                       int32_t* h, int32_t* w, std::vector<uint8_t>* scratch) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return kErrOpen;
  std::fseek(f, 0, SEEK_END);
  const long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (fsize <= 0) {
    std::fclose(f);
    return kErrOpen;
  }
  scratch->resize(static_cast<size_t>(fsize));
  const size_t got = std::fread(scratch->data(), 1, static_cast<size_t>(fsize), f);
  std::fclose(f);
  if (got != static_cast<size_t>(fsize)) return kErrOpen;
  return DecodeGrayFromMemory(scratch->data(), got, out, cap_h, cap_w, h, w);
}

// ---------------------------------------------------------------------------
// Native frame loader: decode pool + in-order slot ring
// ---------------------------------------------------------------------------

struct Slot {
  std::vector<uint8_t> pixels;  // cap_h * cap_w, allocated once
  int32_t h = 0;
  int32_t w = 0;
  int status = kOk;
  int64_t seq = -1;  // which frame currently occupies the slot (-1 = free)
};

class FrameLoader {
 public:
  FrameLoader(std::vector<std::string> paths, int workers, int capacity,
              int32_t cap_h, int32_t cap_w)
      : paths_(std::move(paths)),
        cap_h_(cap_h),
        cap_w_(cap_w),
        capacity_(capacity),
        slots_(capacity) {
    for (auto& s : slots_) s.pixels.resize(static_cast<size_t>(cap_h) * cap_w);
    const int n = std::max(1, workers);
    threads_.reserve(n);
    for (int i = 0; i < n; ++i) threads_.emplace_back([this] { WorkerLoop(); });
  }

  ~FrameLoader() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      stopping_ = true;
    }
    cv_slot_free_.notify_all();
    cv_slot_ready_.notify_all();
    for (auto& t : threads_) t.join();
  }

  // Blocks until frame `delivered_` is ready, copies it out, frees the slot.
  // Returns 1 on frame delivered, 0 on end of sequence. `status` receives
  // the decode result for this index (kOk or an error code; on error h=w=0).
  int Next(uint8_t* out, int32_t* index, int32_t* h, int32_t* w, int32_t* status) {
    std::unique_lock<std::mutex> lock(mu_);
    if (delivered_ >= static_cast<int64_t>(paths_.size())) return 0;
    const int64_t want = delivered_;
    Slot& slot = slots_[want % capacity_];
    const auto wait_start = std::chrono::steady_clock::now();
    cv_slot_ready_.wait(lock, [&] { return slot.seq == want || stopping_; });
    consumer_wait_ns_ += std::chrono::duration_cast<std::chrono::nanoseconds>(
                             std::chrono::steady_clock::now() - wait_start)
                             .count();
    if (stopping_ && slot.seq != want) return 0;
    *index = static_cast<int32_t>(want);
    *status = slot.status;
    *h = slot.h;
    *w = slot.w;
    if (slot.status == kOk) {
      // Rows are packed at width w inside the slot buffer.
      std::memcpy(out, slot.pixels.data(), static_cast<size_t>(slot.h) * slot.w);
    }
    slot.seq = -1;
    ++delivered_;
    lock.unlock();
    cv_slot_free_.notify_all();
    return 1;
  }

  void Stats(int64_t* decoded, int64_t* failed, int64_t* consumer_wait_ns,
             int64_t* worker_wait_ns) const {
    std::lock_guard<std::mutex> lock(mu_);
    *decoded = decoded_;
    *failed = failed_;
    *consumer_wait_ns = consumer_wait_ns_;
    *worker_wait_ns = worker_wait_ns_;
  }

 private:
  void WorkerLoop() {
    std::vector<uint8_t> file_scratch;
    std::vector<uint8_t> decode_scratch(static_cast<size_t>(cap_h_) * cap_w_);
    while (true) {
      const int64_t seq = next_task_.fetch_add(1, std::memory_order_relaxed);
      if (seq >= static_cast<int64_t>(paths_.size())) return;
      // Decode OUTSIDE the lock into thread-local scratch; only the copy
      // into the delivery slot needs slot ownership.
      int32_t h = 0, w = 0;
      const int status = DecodeGrayFromFile(paths_[seq].c_str(), decode_scratch.data(),
                                            cap_h_, cap_w_, &h, &w, &file_scratch);
      std::unique_lock<std::mutex> lock(mu_);
      Slot& slot = slots_[seq % capacity_];
      const auto wait_start = std::chrono::steady_clock::now();
      // Backpressure: wait until the consumer has freed this slot's ring
      // position (seq is within `capacity_` of the delivery cursor).
      cv_slot_free_.wait(lock, [&] {
        return stopping_ || (slot.seq == -1 && seq - delivered_ < capacity_);
      });
      worker_wait_ns_ += std::chrono::duration_cast<std::chrono::nanoseconds>(
                             std::chrono::steady_clock::now() - wait_start)
                             .count();
      if (stopping_) return;
      slot.status = status;
      if (status == kOk) {
        slot.h = h;
        slot.w = w;
        std::memcpy(slot.pixels.data(), decode_scratch.data(),
                    static_cast<size_t>(h) * w);
        ++decoded_;
      } else {
        slot.h = 0;
        slot.w = 0;
        ++failed_;
      }
      slot.seq = seq;
      lock.unlock();
      cv_slot_ready_.notify_all();
    }
  }

  const std::vector<std::string> paths_;
  const int32_t cap_h_;
  const int32_t cap_w_;
  const int capacity_;

  mutable std::mutex mu_;
  std::condition_variable cv_slot_ready_;
  std::condition_variable cv_slot_free_;
  std::vector<Slot> slots_;
  std::vector<std::thread> threads_;
  std::atomic<int64_t> next_task_{0};
  int64_t delivered_ = 0;
  int64_t decoded_ = 0;
  int64_t failed_ = 0;
  int64_t consumer_wait_ns_ = 0;
  int64_t worker_wait_ns_ = 0;
  bool stopping_ = false;
};

}  // namespace

// The library is compiled with -fvisibility=hidden; only the C ABI below
// is exported.
#define MVN_EXPORT extern "C" __attribute__((visibility("default")))

MVN_EXPORT int32_t mvn_abi_version() { return 1; }

// Decode one image file to 8-bit grayscale. Returns 0 on success, negative
// error code otherwise (-1 open, -2 unknown format, -3 larger than the
// cap_h x cap_w buffer, -4 corrupt).
MVN_EXPORT int32_t mvn_decode_gray(const char* path, uint8_t* out, int32_t cap_h, int32_t cap_w,
                        int32_t* h, int32_t* w) {
  std::vector<uint8_t> scratch;
  return DecodeGrayFromFile(path, out, cap_h, cap_w, h, w, &scratch);
}

// Decode from an in-memory buffer (e.g. mmap'd or pre-read by the caller).
MVN_EXPORT int32_t mvn_decode_gray_buffer(const uint8_t* data, int64_t size, uint8_t* out,
                               int32_t cap_h, int32_t cap_w, int32_t* h, int32_t* w) {
  return DecodeGrayFromMemory(data, static_cast<size_t>(size), out, cap_h, cap_w, h, w);
}

MVN_EXPORT void* mvn_loader_create(const char** paths, int32_t n, int32_t workers,
                        int32_t capacity, int32_t cap_h, int32_t cap_w) {
  if (n < 0 || capacity <= 0 || cap_h <= 0 || cap_w <= 0) return nullptr;
  std::vector<std::string> p;
  p.reserve(n);
  for (int32_t i = 0; i < n; ++i) p.emplace_back(paths[i]);
  return new FrameLoader(std::move(p), workers, capacity, cap_h, cap_w);
}

MVN_EXPORT int32_t mvn_loader_next(void* loader, uint8_t* out, int32_t* index, int32_t* h,
                        int32_t* w, int32_t* status) {
  return static_cast<FrameLoader*>(loader)->Next(out, index, h, w, status);
}

MVN_EXPORT void mvn_loader_stats(void* loader, int64_t* decoded, int64_t* failed,
                      int64_t* consumer_wait_ns, int64_t* worker_wait_ns) {
  static_cast<FrameLoader*>(loader)->Stats(decoded, failed, consumer_wait_ns,
                                           worker_wait_ns);
}

MVN_EXPORT void mvn_loader_destroy(void* loader) { delete static_cast<FrameLoader*>(loader); }

// ---------------------------------------------------------------------------
// Packed-Hamming brute-force matcher — the host small-solve path's hot op.
//
// Replicates ops/hamming.py::match_descriptors EXACTLY (integer Hamming
// distances; argmin tie-break = lowest index; masked rows/columns behave
// like the +1e9 sentinel): the XLA path computes d via an exact 0/1 bf16
// matmul, so both paths produce identical f32 distance values and the
// Python wrapper can assert bitwise parity (tests/test_native.py).
//
// Why native: on the single-core measurement host, XLA:CPU takes ~79 ms
// for a 2048x2048 cross-check match — the dominant cost of every
// host-placed window-BA pair gate and loop-geometry solve (the RANSAC
// stage is ~3 ms). The inner loop XORs 4x u64 lanes per pair and relies
// on -march=native auto-vectorization (AVX-512 VPOPCNTQ where present;
// build.py falls back to a generic build if -march=native fails).
//
// Outputs per query row i: best_idx (first-min column), best / second
// distances (second excludes only the best COLUMN, so duplicate minima
// yield second == best, like the XLA d_masked pass). col_best[j] is the
// first-min ROW per train column (cross-check support). Invalid rows /
// all-invalid columns produce idx 0 and distance 1e9, matching argmin
// over an all-sentinel row.
MVN_EXPORT void mvn_hamming_match(const uint32_t* desc_a, const uint8_t* valid_a, int32_t na,
                                  const uint32_t* desc_b, const uint8_t* valid_b, int32_t nb,
                                  int32_t* best_idx, float* best, float* second,
                                  int32_t* col_best) {
  constexpr float kBig = 1e9f;
  // Planar u64 transpose of desc_b: lane k of every row contiguous, so the
  // per-row distance loop vectorizes across j.
  std::vector<uint64_t> plane(static_cast<size_t>(nb) * 4);
  uint64_t* p0 = plane.data();
  uint64_t* p1 = p0 + nb;
  uint64_t* p2 = p1 + nb;
  uint64_t* p3 = p2 + nb;
  for (int32_t j = 0; j < nb; ++j) {
    uint64_t row[4];
    std::memcpy(row, desc_b + static_cast<size_t>(j) * 8, 32);
    p0[j] = row[0];
    p1[j] = row[1];
    p2[j] = row[2];
    p3[j] = row[3];
  }
  std::vector<uint16_t> drow(nb);
  std::vector<float> col_val(nb, kBig);
  for (int32_t j = 0; j < nb; ++j) col_best[j] = 0;
  for (int32_t i = 0; i < na; ++i) {
    if (!valid_a[i]) {
      best_idx[i] = 0;
      best[i] = kBig;
      second[i] = kBig;
      continue;
    }
    uint64_t a[4];
    std::memcpy(a, desc_a + static_cast<size_t>(i) * 8, 32);
    const uint64_t a0 = a[0], a1 = a[1], a2 = a[2], a3 = a[3];
    uint16_t* d = drow.data();
    for (int32_t j = 0; j < nb; ++j) {
      d[j] = static_cast<uint16_t>(
          __builtin_popcountll(a0 ^ p0[j]) + __builtin_popcountll(a1 ^ p1[j]) +
          __builtin_popcountll(a2 ^ p2[j]) + __builtin_popcountll(a3 ^ p3[j]));
    }
    float bv = kBig, sv = kBig;
    int32_t bi = 0;
    for (int32_t j = 0; j < nb; ++j) {
      if (!valid_b[j]) continue;
      const float dj = static_cast<float>(d[j]);
      if (dj < bv) {
        sv = bv;
        bv = dj;
        bi = j;
      } else if (dj < sv) {
        sv = dj;
      }
      if (dj < col_val[j]) {
        col_val[j] = dj;
        col_best[j] = i;
      }
    }
    best_idx[i] = bi;
    best[i] = bv;
    second[i] = sv;
  }
}
