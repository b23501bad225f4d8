// Native JPEG decode + crop + bilinear resize, thread-pooled.
//
// The hot host-side path for ImageNet-style training is decode -> (random)
// crop -> resize. The reference delegates it to PIL/libjpeg one sample at a
// time under the Python GIL; this implementation runs the whole batch on a
// C++ thread pool over libjpeg directly (DCT-domain prescaling via
// scale_num/scale_denom cuts IDCT work for large downscales), and is exposed
// through a minimal C ABI consumed with ctypes (no pybind11 in this image).
//
// Contract (mirrors the repo's corrupt-sample protocol): a failed decode
// writes zeros and reports status=0 for that image — the collate layer
// replaces such samples.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit_cb(j_common_ptr cinfo) {
  ErrorMgr* mgr = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(mgr->jump, 1);
}

// area-average resize for strong downscales (antialiased, close to PIL's
// filtered downsample — plain bilinear aliases and drifts the training
// distribution vs reference checkpoints). `flip` mirrors the output
// horizontally while writing (free flip: no extra pass over the pixels).
void resize_area(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                 int dw, int channels, bool flip = false) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    const int y0 = static_cast<int>(y * sy);
    int y1 = static_cast<int>((y + 1) * sy);
    if (y1 <= y0) y1 = y0 + 1;
    if (y1 > sh) y1 = sh;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * channels;
    for (int x = 0; x < dw; ++x) {
      const int x0 = static_cast<int>(x * sx);
      int x1 = static_cast<int>((x + 1) * sx);
      if (x1 <= x0) x1 = x0 + 1;
      if (x1 > sw) x1 = sw;
      float acc[4] = {0, 0, 0, 0};
      for (int yy = y0; yy < y1; ++yy) {
        const uint8_t* r = src + (static_cast<size_t>(yy) * sw + x0) * channels;
        for (int xx = x0; xx < x1; ++xx) {
          for (int c = 0; c < channels; ++c) acc[c] += r[(xx - x0) * channels + c];
        }
      }
      const float inv = 1.0f / ((y1 - y0) * (x1 - x0));
      const int ox = flip ? (dw - 1 - x) : x;
      for (int c = 0; c < channels; ++c) {
        out[ox * channels + c] = static_cast<uint8_t>(acc[c] * inv + 0.5f);
      }
    }
  }
}

// bilinear resize HWC uint8 (half-pixel convention, matches PIL/torch
// align_corners=False closely enough for training data)
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw, int channels, bool flip = false) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  std::vector<int> x0(dw), x1(dw);
  std::vector<float> fx(dw);
  for (int x = 0; x < dw; ++x) {
    float c = (x + 0.5f) * sx - 0.5f;
    c = std::max(0.0f, std::min(c, static_cast<float>(sw - 1)));
    x0[x] = static_cast<int>(c);
    x1[x] = std::min(x0[x] + 1, sw - 1);
    fx[x] = c - x0[x];
  }
  for (int y = 0; y < dh; ++y) {
    float cy = (y + 0.5f) * sy - 0.5f;
    cy = std::max(0.0f, std::min(cy, static_cast<float>(sh - 1)));
    const int y0 = static_cast<int>(cy);
    const int y1 = std::min(y0 + 1, sh - 1);
    const float fy = cy - y0;
    const uint8_t* r0 = src + static_cast<size_t>(y0) * sw * channels;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * sw * channels;
    uint8_t* out = dst + static_cast<size_t>(y) * dw * channels;
    for (int x = 0; x < dw; ++x) {
      const int o0 = x0[x] * channels, o1 = x1[x] * channels;
      const int ox = flip ? (dw - 1 - x) : x;
      for (int c = 0; c < channels; ++c) {
        const float top = r0[o0 + c] + (r0[o1 + c] - r0[o0 + c]) * fx[x];
        const float bot = r1[o0 + c] + (r1[o1 + c] - r1[o0 + c]) * fx[x];
        out[ox * channels + c] =
            static_cast<uint8_t>(top + (bot - top) * fy + 0.5f);
      }
    }
  }
}

// decode one JPEG; crop (cx,cy,cw,ch) in ORIGINAL image coords (cw<=0 = full
// image); resize to (out_h, out_w) RGB, mirrored when `flip`. Returns true on
// success. Only the crop region is IDCT'd: DCT-domain prescale picks the
// coarsest 1/2^k raster that still covers the output, jpeg_crop_scanline
// restricts the horizontal extent to the crop's iMCU span, and
// jpeg_skip_scanlines skips the rows above it (libjpeg-turbo partial-decode
// API); rows below the crop are never read (jpeg_abort_decompress).
bool decode_one(const uint8_t* buf, size_t len, int cx, int cy, int cw, int ch,
                int out_h, int out_w, uint8_t* out, bool flip = false) {
  jpeg_decompress_struct cinfo;
  ErrorMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = error_exit_cb;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;

  const int full_w = cinfo.image_width;
  const int full_h = cinfo.image_height;
  if (cw <= 0 || ch <= 0) {
    cx = cy = 0;
    cw = full_w;
    ch = full_h;
  }
  cx = std::max(0, std::min(cx, full_w - 1));
  cy = std::max(0, std::min(cy, full_h - 1));
  cw = std::max(1, std::min(cw, full_w - cx));
  ch = std::max(1, std::min(ch, full_h - cy));

  // DCT-domain prescale: decode at the smallest scale that still covers the
  // requested output (libjpeg supports M/8 for M in 1..16)
  int denom = 1;
  while (denom < 8 && (cw / (denom * 2) >= out_w) &&
         (ch / (denom * 2) >= out_h)) {
    denom *= 2;
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;

  jpeg_start_decompress(&cinfo);
  const int dec_w = cinfo.output_width;
  const int dec_h = cinfo.output_height;

  // crop coords in the decoded (prescaled) raster
  int dcx = cx / denom, dcy = cy / denom;
  int dcw = std::max(1, cw / denom), dch = std::max(1, ch / denom);
  dcx = std::min(dcx, dec_w - 1);
  dcy = std::min(dcy, dec_h - 1);
  dcw = std::min(dcw, dec_w - dcx);
  dch = std::min(dch, dec_h - dcy);

  // restrict horizontal decode to the crop's iMCU span; libjpeg-turbo rounds
  // xoff down to an iMCU boundary and widens xw accordingly, so the requested
  // columns land at offset (dcx - xoff) in the narrowed raster
  JDIMENSION xoff = static_cast<JDIMENSION>(dcx);
  JDIMENSION xw = static_cast<JDIMENSION>(dcw);
  jpeg_crop_scanline(&cinfo, &xoff, &xw);
  const int row_w = static_cast<int>(cinfo.output_width);
  const int xdelta = dcx - static_cast<int>(xoff);
  const int channels = cinfo.output_components;  // 3 (JCS_RGB)

  // skip rows above the crop without IDCT work
  while (static_cast<int>(cinfo.output_scanline) < dcy) {
    jpeg_skip_scanlines(
        &cinfo, static_cast<JDIMENSION>(dcy) - cinfo.output_scanline);
  }

  std::vector<uint8_t> crop_buf(static_cast<size_t>(dch) * dcw * 3);
  std::vector<uint8_t> row(static_cast<size_t>(row_w) * channels);
  JSAMPROW rowp = row.data();
  for (int y = 0; y < dch; ++y) {
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    uint8_t* dst = crop_buf.data() + static_cast<size_t>(y) * dcw * 3;
    std::memcpy(dst, row.data() + static_cast<size_t>(xdelta) * 3,
                static_cast<size_t>(dcw) * 3);
  }
  // rows below the crop are never decoded
  jpeg_abort_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  // antialias on strong downscale, bilinear otherwise
  if (dcw >= out_w * 3 / 2 && dch >= out_h * 3 / 2) {
    resize_area(crop_buf.data(), dch, dcw, out, out_h, out_w, 3, flip);
  } else {
    resize_bilinear(crop_buf.data(), dch, dcw, out, out_h, out_w, 3, flip);
  }
  return true;
}

}  // namespace

extern "C" {

// bufs/lens: n encoded JPEGs; crops: n*4 ints (x, y, w, h; w<=0 = full);
// flips: n bytes (nonzero = horizontal mirror) or null; out: the COLLATED
// batch n*out_h*out_w*3 uint8 (each image decoded straight into its batch
// slot — no per-sample numpy copies on the Python side); status: n ints
// (1 ok / 0 failed). n_threads <= 0 uses hardware_concurrency.
void decode_rrc_batch(const uint8_t** bufs, const size_t* lens, int n,
                      const int* crops, const uint8_t* flips, int out_h,
                      int out_w, uint8_t* out, int* status, int n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
  }
  n_threads = std::min(n_threads, n);
  std::atomic<int> next(0);
  const size_t img_bytes = static_cast<size_t>(out_h) * out_w * 3;

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      const bool ok =
          decode_one(bufs[i], lens[i], crops[i * 4], crops[i * 4 + 1],
                     crops[i * 4 + 2], crops[i * 4 + 3], out_h, out_w,
                     out + static_cast<size_t>(i) * img_bytes,
                     flips != nullptr && flips[i] != 0);
      if (!ok) std::memset(out + static_cast<size_t>(i) * img_bytes, 0,
                           img_bytes);
      status[i] = ok ? 1 : 0;
    }
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < n_threads; ++t) pool.emplace_back(worker);
  worker();  // calling thread participates (matters on 1-core hosts)
  for (auto& th : pool) th.join();
}

void decode_crop_resize_batch(const uint8_t** bufs, const size_t* lens, int n,
                              const int* crops, int out_h, int out_w,
                              uint8_t* out, int* status, int n_threads) {
  decode_rrc_batch(bufs, lens, n, crops, nullptr, out_h, out_w, out, status,
                   n_threads);
}

// header-only dimension probe for a whole batch: ws/hs get n ints (0 on
// failure). Amortizes the ctypes round-trip the per-image probe pays.
void jpeg_dimensions_batch(const uint8_t** bufs, const size_t* lens, int n,
                           int* ws, int* hs) {
  for (int i = 0; i < n; ++i) {
    jpeg_decompress_struct cinfo;
    ErrorMgr err;
    cinfo.err = jpeg_std_error(&err.pub);
    err.pub.error_exit = error_exit_cb;
    if (setjmp(err.jump)) {
      jpeg_destroy_decompress(&cinfo);
      ws[i] = hs[i] = 0;
      continue;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(bufs[i]),
                 static_cast<unsigned long>(lens[i]));
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
      jpeg_destroy_decompress(&cinfo);
      ws[i] = hs[i] = 0;
      continue;
    }
    ws[i] = cinfo.image_width;
    hs[i] = cinfo.image_height;
    jpeg_destroy_decompress(&cinfo);
  }
}

// probe the image dimensions without a full decode (for crop sampling)
int jpeg_dimensions(const uint8_t* buf, size_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = error_exit_cb;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 1;
}

}  // extern "C"
