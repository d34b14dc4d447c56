// Native JPEG decode + resize for the host input pipeline.
//
// Replaces the cv2.imread → cvtColor → resize chain in
// vince_tpu/data/base_dataset.py::read_image with a single C++ call that
//   1. decodes at a DCT-domain scale (libjpeg scale_num/8) — the smallest
//      scale whose output still covers the target canvas. For a 1080p frame
//      decoded to a 256² canvas this skips ~8× of the IDCT + color-convert
//      work (the dominant cost of JPEG decode);
//   2. bilinear-resizes (half-pixel centers, cv2.INTER_LINEAR semantics)
//      straight to the square canvas in RGB;
//   3. runs batches on a persistent std::thread pool — ctypes releases the
//      GIL for the duration of the call, so decode scales across cores
//      without Python's process-pool pickling tax (the loader's fork mode).
//
// Reference behavior being replaced: torch DataLoader workers running
// cv2/PIL decode in the reference's datasets/base_dataset.py:46-56 (the
// decode itself was always native; the parallelism there came from torch's
// worker processes).
//
// C API only (ctypes-friendly); no Python.h dependency.

#include <cstddef>  // jpeglib.h needs size_t/FILE declared first
#include <cstdio>

#include <jpeglib.h>

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <condition_variable>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- errors
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

void jpeg_emit_silent(j_common_ptr, int) {}

// ------------------------------------------------------- bilinear resize
// cv2.INTER_LINEAR semantics: src = (dst + 0.5) * (in/out) - 0.5, clamped.
// Separable two-pass: each needed source row is horizontally resized once
// into a float row cache (2 slots — bilinear touches 2 src rows per dst
// row, consecutive dst rows share them), then the vertical lerp runs as a
// flat dw·3 float loop the compiler vectorizes.
void resize_bilinear_rgb(const uint8_t* src, int sh, int sw, uint8_t* dst,
                         int dh, int dw) {
  if (sh == dh && sw == dw) {
    std::memcpy(dst, src, static_cast<size_t>(sh) * sw * 3);
    return;
  }
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  std::vector<int> x0v(dw), x1v(dw);
  std::vector<float> fxv(dw);
  for (int x = 0; x < dw; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    if (fx < 0) fx = 0;
    int x0 = static_cast<int>(fx);
    if (x0 > sw - 1) x0 = sw - 1;
    int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
    x0v[x] = x0 * 3;
    x1v[x] = x1 * 3;
    fxv[x] = fx - x0;
  }
  const int rowlen = dw * 3;
  std::vector<float> rowbuf(2 * static_cast<size_t>(rowlen));
  int rowid[2] = {-1, -1};
  auto hresized = [&](int sy_row) -> const float* {
    const int slot = sy_row & 1;
    float* out = rowbuf.data() + slot * rowlen;
    if (rowid[slot] == sy_row) return out;
    const uint8_t* r = src + static_cast<size_t>(sy_row) * sw * 3;
    for (int x = 0; x < dw; ++x) {
      const float wx = fxv[x];
      const int a = x0v[x], b = x1v[x];
      out[x * 3 + 0] = r[a + 0] + wx * (r[b + 0] - r[a + 0]);
      out[x * 3 + 1] = r[a + 1] + wx * (r[b + 1] - r[a + 1]);
      out[x * 3 + 2] = r[a + 2] + wx * (r[b + 2] - r[a + 2]);
    }
    rowid[slot] = sy_row;
    return out;
  };
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    if (y0 > sh - 1) y0 = sh - 1;
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    const float wy = fy - y0;
    const float* t0 = hresized(y0);
    const float* t1 = (y1 == y0) ? t0 : hresized(y1);
    uint8_t* out = dst + static_cast<size_t>(y) * rowlen;
    for (int i = 0; i < rowlen; ++i) {
      out[i] = static_cast<uint8_t>(t0[i] + wy * (t1[i] - t0[i]) + 0.5f);
    }
  }
}

// ------------------------------------------------------------ one decode
// 0 ok; 1 decode error; 2 bad args. `out` must hold canvas*canvas*3 bytes.
int decode_jpeg_buf(const uint8_t* buf, size_t len, int canvas, uint8_t* out) {
  if (!buf || len < 4 || canvas <= 0 || !out) return 2;

  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  jerr.mgr.emit_message = jpeg_emit_silent;  // tolerate corrupt-but-decodable
  std::vector<uint8_t> decoded;               // declared before setjmp target

  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }

  // smallest DCT scale m/8 (m=1..8) whose output still covers the canvas
  // on both axes; never upscale in the DCT domain.
  int m = 8;
  for (int cand = 1; cand <= 8; ++cand) {
    const long oh = (static_cast<long>(cinfo.image_height) * cand + 7) / 8;
    const long ow = (static_cast<long>(cinfo.image_width) * cand + 7) / 8;
    if (oh >= canvas && ow >= canvas) {
      m = cand;
      break;
    }
  }
  cinfo.scale_num = m;
  cinfo.scale_denom = 8;
  cinfo.out_color_space = JCS_RGB;
  cinfo.dct_method = JDCT_ISLOW;  // match cv2/libjpeg-turbo default quality

  jpeg_start_decompress(&cinfo);
  const int sh = cinfo.output_height;
  const int sw = cinfo.output_width;
  if (sh <= 0 || sw <= 0 || cinfo.output_components != 3) {
    longjmp(jerr.jb, 1);
  }
  decoded.resize(static_cast<size_t>(sh) * sw * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = decoded.data() + static_cast<size_t>(cinfo.output_scanline) * sw * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  resize_bilinear_rgb(decoded.data(), sh, sw, out, canvas, canvas);
  return 0;
}

int decode_jpeg_file(const char* path, int canvas, uint8_t* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 3;
  std::fseek(f, 0, SEEK_END);
  const long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (len <= 0) {
    std::fclose(f);
    return 3;
  }
  std::vector<uint8_t> buf(static_cast<size_t>(len));
  const size_t rd = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  if (rd != buf.size()) return 3;
  return decode_jpeg_buf(buf.data(), buf.size(), canvas, out);
}

// ------------------------------------------------------------ thread pool
class Pool {
 public:
  explicit Pool(int n) {
    if (n < 1) n = 1;
    for (int i = 0; i < n; ++i) {
      threads_.emplace_back([this] { Run(); });
    }
  }
  ~Pool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
  }
  // Blocks until every task has run.
  void Map(int n, const std::function<void(int)>& fn) {
    if (n <= 0) return;
    {
      std::unique_lock<std::mutex> lk(mu_);
      fn_ = &fn;
      next_ = 0;
      done_ = 0;
      total_ = n;
    }
    cv_.notify_all();
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return done_ == total_; });
    fn_ = nullptr;
  }

 private:
  void Run() {
    for (;;) {
      int idx;
      const std::function<void(int)>* fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || (fn_ && next_ < total_); });
        if (stop_) return;
        idx = next_++;
        fn = fn_;
      }
      (*fn)(idx);
      {
        std::unique_lock<std::mutex> lk(mu_);
        if (++done_ == total_) done_cv_.notify_all();
      }
    }
  }

  std::vector<std::thread> threads_;
  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  const std::function<void(int)>* fn_ = nullptr;
  int next_ = 0, done_ = 0, total_ = 0;
  bool stop_ = false;
};

}  // namespace

extern "C" {

int vt_decode_jpeg(const uint8_t* buf, size_t len, int canvas, uint8_t* out) {
  return decode_jpeg_buf(buf, len, canvas, out);
}

int vt_decode_jpeg_file(const char* path, int canvas, uint8_t* out) {
  return decode_jpeg_file(path, canvas, out);
}

void* vt_pool_new(int n_threads) { return new Pool(n_threads); }

void vt_pool_free(void* pool) { delete static_cast<Pool*>(pool); }

// Decode n buffers in parallel. outs = n contiguous canvas*canvas*3 slots;
// oks[i] = return code of item i (0 ok).
void vt_pool_decode(void* pool, int n, const uint8_t** bufs,
                    const size_t* lens, int canvas, uint8_t* outs, int* oks) {
  Pool* p = static_cast<Pool*>(pool);
  const size_t slot = static_cast<size_t>(canvas) * canvas * 3;
  p->Map(n, [&](int i) {
    oks[i] = decode_jpeg_buf(bufs[i], lens[i], canvas, outs + slot * i);
  });
}

// Decode n files (paths) in parallel — the loader's read_image fan-out.
void vt_pool_decode_files(void* pool, int n, const char** paths, int canvas,
                          uint8_t* outs, int* oks) {
  Pool* p = static_cast<Pool*>(pool);
  const size_t slot = static_cast<size_t>(canvas) * canvas * 3;
  p->Map(n, [&](int i) {
    oks[i] = decode_jpeg_file(paths[i], canvas, outs + slot * i);
  });
}

}  // extern "C"
