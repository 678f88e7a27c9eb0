// Native patch-batch loader: multithreaded PNG decode into a caller-owned
// uint8 NHWC buffer.
//
// Role: the host-side input runtime feeding the TPU. The reference's
// equivalent "native layer" is PIL/libpng inside torch DataLoader worker
// processes (1_HistoPathology/models.py:277-295); here decode runs on a C++
// thread pool with no GIL, no per-worker process, and zero Python-object
// churn — batches land directly in the pinned numpy buffer that jax
// device_put consumes.
//
// Scope: PNGs as written by our tiler (8-bit, color type 2 RGB / 6 RGBA /
// 0 gray, non-interlaced — data/tiler.py writes type 2) plus bilinear resize
// when the stored size differs from the requested patch size. Returns per-file
// error codes so Python can fall back to cv2 for anything exotic.
//
// Build: g++ -O3 -shared -fPIC patch_loader.cc -o libpatchloader.so -lz -lpthread
// (driven by multimodalbrainsurvival_tpu/utils/native.py)

#include <zlib.h>

#include <atomic>
#include <cstdlib>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr uint8_t kPngSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};

struct PngImage {
  uint32_t width = 0;
  uint32_t height = 0;
  int channels = 0;  // after decode: 1, 3 or 4
  std::vector<uint8_t> pixels;  // H * W * channels
};

uint32_t ReadBE32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int PaethPredictor(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Returns 0 on success.
int DecodePng(const uint8_t* data, size_t size, PngImage* out) {
  if (size < 8 || memcmp(data, kPngSig, 8) != 0) return 1;
  size_t pos = 8;
  uint32_t width = 0, height = 0;
  int bit_depth = 0, color_type = -1, interlace = 0;
  std::vector<uint8_t> idat;

  while (pos + 8 <= size) {
    uint32_t len = ReadBE32(data + pos);
    const uint8_t* type = data + pos + 4;
    const uint8_t* body = data + pos + 8;
    if (pos + 12 + len > size) return 2;
    if (memcmp(type, "IHDR", 4) == 0) {
      if (len < 13) return 3;
      width = ReadBE32(body);
      height = ReadBE32(body + 4);
      bit_depth = body[8];
      color_type = body[9];
      interlace = body[12];
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), body, body + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (width == 0 || height == 0 || bit_depth != 8 || interlace != 0) return 4;
  int channels;
  switch (color_type) {
    case 0: channels = 1; break;  // gray
    case 2: channels = 3; break;  // RGB
    case 6: channels = 4; break;  // RGBA
    default: return 5;            // palette/gray+alpha unsupported -> fallback
  }

  const size_t stride = size_t(width) * channels;
  std::vector<uint8_t> raw((stride + 1) * height);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size()) {
    return 6;
  }

  out->width = width;
  out->height = height;
  out->channels = channels;
  out->pixels.resize(stride * height);
  const int bpp = channels;  // bytes per pixel (8-bit)
  for (uint32_t y = 0; y < height; ++y) {
    const uint8_t filter = raw[(stride + 1) * y];
    const uint8_t* src = raw.data() + (stride + 1) * y + 1;
    uint8_t* dst = out->pixels.data() + stride * y;
    const uint8_t* up = y ? out->pixels.data() + stride * (y - 1) : nullptr;
    switch (filter) {
      case 0:
        memcpy(dst, src, stride);
        break;
      case 1:  // Sub
        for (size_t x = 0; x < stride; ++x)
          dst[x] = src[x] + (x >= size_t(bpp) ? dst[x - bpp] : 0);
        break;
      case 2:  // Up
        for (size_t x = 0; x < stride; ++x) dst[x] = src[x] + (up ? up[x] : 0);
        break;
      case 3:  // Average
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
          int b = up ? up[x] : 0;
          dst[x] = src[x] + ((a + b) >> 1);
        }
        break;
      case 4:  // Paeth
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
          int b = up ? up[x] : 0;
          int c = (up && x >= size_t(bpp)) ? up[x - bpp] : 0;
          dst[x] = src[x] + PaethPredictor(a, b, c);
        }
        break;
      default:
        return 7;
    }
  }
  return 0;
}

// Bilinear resize + channel conversion into RGB uint8 (H, W, 3).
void ToRgbResized(const PngImage& img, uint8_t* dst, int out_h, int out_w) {
  const int ch = img.channels;
  auto rgb_at = [&](uint32_t y, uint32_t x, int c) -> uint8_t {
    const uint8_t* p = img.pixels.data() + (size_t(y) * img.width + x) * ch;
    if (ch == 1) return p[0];
    return p[c];
  };
  if (int(img.height) == out_h && int(img.width) == out_w) {
    for (int y = 0; y < out_h; ++y)
      for (int x = 0; x < out_w; ++x)
        for (int c = 0; c < 3; ++c)
          dst[(size_t(y) * out_w + x) * 3 + c] = rgb_at(y, x, c);
    return;
  }
  const float sy = float(img.height) / out_h;
  const float sx = float(img.width) / out_w;
  for (int y = 0; y < out_h; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    uint32_t y0 = uint32_t(fy);
    uint32_t y1 = y0 + 1 < img.height ? y0 + 1 : y0;
    float wy = fy - y0;
    for (int x = 0; x < out_w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      uint32_t x0 = uint32_t(fx);
      uint32_t x1 = x0 + 1 < img.width ? x0 + 1 : x0;
      float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        float v = (1 - wy) * ((1 - wx) * rgb_at(y0, x0, c) +
                              wx * rgb_at(y0, x1, c)) +
                  wy * ((1 - wx) * rgb_at(y1, x0, c) +
                        wx * rgb_at(y1, x1, c));
        dst[(size_t(y) * out_w + x) * 3 + c] = uint8_t(v + 0.5f);
      }
    }
  }
}

int DecodeFileToRgb(const char* path, uint8_t* dst, int out_h, int out_w) {
  FILE* f = fopen(path, "rb");
  if (!f) return 100;
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (fsize <= 0) {
    fclose(f);
    return 101;
  }
  std::vector<uint8_t> buf(static_cast<size_t>(fsize), 0);
  size_t got = fread(buf.data(), 1, buf.size(), f);
  fclose(f);
  if (got != buf.size()) return 102;
  PngImage img;
  int rc = DecodePng(buf.data(), buf.size(), &img);
  if (rc != 0) return rc;
  ToRgbResized(img, dst, out_h, out_w);
  return 0;
}

}  // namespace

extern "C" {

// Whole-batch assembler: one native call builds the flat (n, h, w, 3) uint8
// patch tensor of a batch. Slot i is filled from EITHER a raw RGB row of a
// packed mmap'd shard (srcs[i] != NULL: memcpy, sizes must match) OR a PNG
// file (paths[i] != NULL: decode+resize), else left untouched (zero-padded
// bag/sample slots). Runs on a thread pool with the GIL released — this
// replaces the Python per-bag gather + per-item assembly copies with a
// single pass writing straight into the final batch buffer.
// codes[i]: 0 ok; 200 = shard-row size mismatch (Python resizes that slot);
// other non-zero = PNG decode error (Python retries via cv2, row zeroed).
// Returns the number of non-zero codes.
int assemble_patch_batch(const char** paths, const uint8_t* const* srcs,
                         const int* src_h, const int* src_w, int n,
                         uint8_t* out, int h, int w, int num_threads,
                         int* codes) {
  const size_t row = size_t(h) * w * 3;
  std::atomic<int> next(0), errors(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = 0;
      if (srcs[i] != nullptr) {
        if (src_h[i] == h && src_w[i] == w) {
          memcpy(out + row * i, srcs[i], row);
        } else {
          rc = 200;
        }
      } else if (paths[i] != nullptr) {
        rc = DecodeFileToRgb(paths[i], out + row * i, h, w);
        if (rc != 0) memset(out + row * i, 0, row);
      }
      codes[i] = rc;
      if (rc != 0) errors.fetch_add(1);
    }
  };
  if (num_threads < 1) num_threads = 1;
  std::vector<std::thread> pool;
  for (int t = 0; t < num_threads && t < n; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return errors.load();
}

// Decodes n PNG files into out (n, h, w, 3) uint8. codes[i] gets the per-file
// status (0 = ok). Rows with a non-zero code are left zero-filled for the
// Python side to retry via its fallback decoder. Returns the error count.
int decode_patch_batch(const char** paths, int n, uint8_t* out, int h, int w,
                       int num_threads, int* codes) {
  const size_t row = size_t(h) * w * 3;
  std::atomic<int> next(0), errors(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = DecodeFileToRgb(paths[i], out + row * i, h, w);
      codes[i] = rc;
      if (rc != 0) {
        memset(out + row * i, 0, row);
        errors.fetch_add(1);
      }
    }
  };
  if (num_threads < 1) num_threads = 1;
  std::vector<std::thread> pool;
  for (int t = 0; t < num_threads && t < n; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return errors.load();
}

}  // extern "C"
