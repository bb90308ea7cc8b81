// fastpng: minimal multithreaded PNG batch decoder for the wst_tpu data
// pipeline.
//
// The reference pipeline decodes PNGs serially through PIL (reference:
// src/training/train_and_save_model.py:51-56); this native loader decodes a
// whole batch in parallel worker threads straight into one contiguous
// (N, H, W, 3) uint8 host buffer, ready for a single device transfer.
//
// Supports the PNG subset produced/consumed by this project: 8-bit depth,
// color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
// non-interlaced, output converted to RGB.  Inflate via system zlib.
//
// C ABI (ctypes):
//   int fastpng_info(const char* path, int* h, int* w);
//   int fastpng_decode_rgb(const char* path, unsigned char* out,
//                          int h, int w);            // out: h*w*3 bytes
//   int fastpng_load_batch(const char** paths, int n, unsigned char* out,
//                          int h, int w, int n_threads);
// Return 0 on success; negative error codes otherwise.  load_batch returns
// the number of failed files (0 == all good); failed slots are zeroed.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

constexpr int kErrIO = -1;
constexpr int kErrFormat = -2;
constexpr int kErrUnsupported = -3;
constexpr int kErrInflate = -4;
constexpr int kErrDims = -5;

struct Png {
  int width = 0, height = 0;
  int bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;          // concatenated IDAT payload
  std::vector<uint8_t> palette;       // PLTE (r,g,b)*
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int parse_png(const char* path, Png* png) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return kErrIO;
  uint8_t sig[8];
  if (std::fread(sig, 1, 8, f) != 8 ||
      std::memcmp(sig, "\x89PNG\r\n\x1a\n", 8) != 0) {
    std::fclose(f);
    return kErrFormat;
  }
  bool saw_ihdr = false, saw_iend = false;
  while (!saw_iend) {
    uint8_t head[8];
    if (std::fread(head, 1, 8, f) != 8) break;
    uint32_t len = be32(head);
    char type[5] = {char(head[4]), char(head[5]), char(head[6]),
                    char(head[7]), 0};
    std::vector<uint8_t> data(len);
    if (len && std::fread(data.data(), 1, len, f) != len) {
      std::fclose(f);
      return kErrFormat;
    }
    uint8_t crc[4];
    if (std::fread(crc, 1, 4, f) != 4) {
      std::fclose(f);
      return kErrFormat;
    }
    if (std::strcmp(type, "IHDR") == 0) {
      if (len != 13) { std::fclose(f); return kErrFormat; }
      png->width = int(be32(&data[0]));
      png->height = int(be32(&data[4]));
      png->bit_depth = data[8];
      png->color_type = data[9];
      png->interlace = data[12];
      saw_ihdr = true;
    } else if (std::strcmp(type, "PLTE") == 0) {
      png->palette = std::move(data);
    } else if (std::strcmp(type, "IDAT") == 0) {
      png->idat.insert(png->idat.end(), data.begin(), data.end());
    } else if (std::strcmp(type, "IEND") == 0) {
      saw_iend = true;
    }
  }
  std::fclose(f);
  if (!saw_ihdr || png->idat.empty()) return kErrFormat;
  if (png->bit_depth != 8 || png->interlace != 0) return kErrUnsupported;
  if (png->color_type == 3 && png->palette.empty()) return kErrFormat;
  return 0;
}

int channels_of(int color_type) {
  switch (color_type) {
    case 0: return 1;   // gray
    case 2: return 3;   // rgb
    case 3: return 1;   // palette index
    case 4: return 2;   // gray + alpha
    case 6: return 4;   // rgba
    default: return 0;
  }
}

uint8_t paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return uint8_t(a);
  if (pb <= pc) return uint8_t(b);
  return uint8_t(c);
}

// Decode one PNG to RGB into out (expected h*w*3). Enforces dims.
int decode_rgb(const char* path, uint8_t* out, int want_h, int want_w) {
  Png png;
  int rc = parse_png(path, &png);
  if (rc) return rc;
  if (png.width != want_w || png.height != want_h) return kErrDims;
  int ch = channels_of(png.color_type);
  if (!ch) return kErrUnsupported;

  size_t stride = size_t(png.width) * ch;
  size_t raw_size = (stride + 1) * png.height;
  std::vector<uint8_t> raw(raw_size);
  uLongf dst_len = raw_size;
  if (uncompress(raw.data(), &dst_len, png.idat.data(), png.idat.size())
          != Z_OK || dst_len != raw_size) {
    return kErrInflate;
  }

  // Undo per-scanline filters in place (into a defiltered buffer).
  std::vector<uint8_t> img(stride * png.height);
  const int bpp = ch;  // bytes per pixel at depth 8
  for (int y = 0; y < png.height; ++y) {
    const uint8_t* src = raw.data() + size_t(y) * (stride + 1);
    uint8_t filter = src[0];
    const uint8_t* cur_in = src + 1;
    uint8_t* cur = img.data() + size_t(y) * stride;
    const uint8_t* up = y ? img.data() + size_t(y - 1) * stride : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(bpp) ? cur[x - bpp] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= size_t(bpp)) ? up[x - bpp] : 0;
      int v = cur_in[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return kErrFormat;
      }
      cur[x] = uint8_t(v);
    }
  }

  // Convert to RGB.
  const size_t npx = size_t(png.width) * png.height;
  for (size_t i = 0; i < npx; ++i) {
    const uint8_t* p = img.data() + i * ch;
    uint8_t r, g, b;
    switch (png.color_type) {
      case 0: r = g = b = p[0]; break;
      case 2: r = p[0]; g = p[1]; b = p[2]; break;
      case 3: {
        size_t idx = size_t(p[0]) * 3;
        if (idx + 2 >= png.palette.size()) return kErrFormat;
        r = png.palette[idx]; g = png.palette[idx + 1];
        b = png.palette[idx + 2];
        break;
      }
      case 4: r = g = b = p[0]; break;
      case 6: r = p[0]; g = p[1]; b = p[2]; break;
      default: return kErrUnsupported;
    }
    out[i * 3 + 0] = r;
    out[i * 3 + 1] = g;
    out[i * 3 + 2] = b;
  }
  return 0;
}

}  // namespace

extern "C" {

int fastpng_info(const char* path, int* h, int* w) {
  Png png;
  int rc = parse_png(path, &png);
  if (rc) return rc;
  *h = png.height;
  *w = png.width;
  return 0;
}

int fastpng_decode_rgb(const char* path, unsigned char* out, int h, int w) {
  return decode_rgb(path, out, h, w);
}

int fastpng_load_batch(const char** paths, int n, unsigned char* out,
                       int h, int w, int n_threads) {
  if (n <= 0) return 0;
  if (n_threads <= 0) n_threads = 1;
  std::atomic<int> next(0), failures(0);
  const size_t img_bytes = size_t(h) * w * 3;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      unsigned char* dst = out + size_t(i) * img_bytes;
      if (decode_rgb(paths[i], dst, h, w) != 0) {
        std::memset(dst, 0, img_bytes);
        failures.fetch_add(1);
      }
    }
  };
  int nt = n_threads < n ? n_threads : n;
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
