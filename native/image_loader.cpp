// Native batch image loader for eacham_tpu.
//
// TPU-native equivalent of the reference's data path: OpenCV imread +
// sequential mutex-guarded reads (modules/sfm/data_source/
// MonoImageReader.h:41-54) and the repeated x0.95-until-rows<=1500 resize
// (SfmInputSource.h:28-33). Here: first-party decoders (PNG via zlib
// inflate + unfilter, PPM/PGM, 24/32-bit BMP), the same deterministic
// downsize policy applied as one bilinear resample, and a pthread worker
// pool that decodes a whole directory batch into one padded float32
// buffer ready for the host->device transfer. JPEG is delegated to the
// Python fallback (PIL) by returning EL_UNSUPPORTED.
//
// C ABI (ctypes-friendly), no exceptions across the boundary.

#include <zlib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int EL_OK = 0;
constexpr int EL_IO_ERROR = 1;
constexpr int EL_UNSUPPORTED = 2;
constexpr int EL_DECODE_ERROR = 3;

constexpr int MAX_ROWS = 1500;     // SfmInputSource.h:29
constexpr double SCALE_STEP = 0.95;

struct Image {
  int w = 0, h = 0, channels = 0;
  std::vector<uint8_t> data;  // interleaved
};

bool read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(n));
  size_t got = std::fread(out.data(), 1, out.size(), f);
  std::fclose(f);
  return got == out.size();
}

// ---------------------------------------------------------------- PNM ----
int decode_pnm(const std::vector<uint8_t>& buf, Image& img) {
  if (buf.size() < 2 || buf[0] != 'P') return EL_UNSUPPORTED;
  int kind = buf[1] - '0';
  if (kind != 5 && kind != 6) return EL_UNSUPPORTED;
  size_t pos = 2;
  auto next_int = [&](int& v) -> bool {
    // skip whitespace + comments
    while (pos < buf.size()) {
      if (buf[pos] == '#') {
        while (pos < buf.size() && buf[pos] != '\n') ++pos;
      } else if (std::isspace(buf[pos])) {
        ++pos;
      } else {
        break;
      }
    }
    v = 0;
    bool any = false;
    while (pos < buf.size() && std::isdigit(buf[pos])) {
      v = v * 10 + (buf[pos] - '0');
      ++pos;
      any = true;
    }
    return any;
  };
  int w, h, maxv;
  if (!next_int(w) || !next_int(h) || !next_int(maxv)) return EL_DECODE_ERROR;
  if (maxv != 255) return EL_UNSUPPORTED;
  if (pos >= buf.size()) return EL_DECODE_ERROR;  // truncated after header
  ++pos;  // single whitespace after header
  int ch = (kind == 6) ? 3 : 1;
  size_t need = static_cast<size_t>(w) * h * ch;
  if (w <= 0 || h <= 0 || need > buf.size() - pos) return EL_DECODE_ERROR;
  img.w = w;
  img.h = h;
  img.channels = ch;
  img.data.assign(buf.begin() + pos, buf.begin() + pos + need);
  return EL_OK;
}

// ---------------------------------------------------------------- BMP ----
uint32_t le32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}
uint16_t le16(const uint8_t* p) { return p[0] | (p[1] << 8); }

int decode_bmp(const std::vector<uint8_t>& buf, Image& img) {
  if (buf.size() < 54 || buf[0] != 'B' || buf[1] != 'M') return EL_UNSUPPORTED;
  uint32_t off = le32(&buf[10]);
  int32_t w = static_cast<int32_t>(le32(&buf[18]));
  int32_t h = static_cast<int32_t>(le32(&buf[22]));
  uint16_t bpp = le16(&buf[28]);
  uint32_t comp = le32(&buf[30]);
  if (comp != 0 || (bpp != 24 && bpp != 32)) return EL_UNSUPPORTED;
  bool flip = h > 0;
  int ah = std::abs(h);
  int ch = bpp / 8;
  size_t stride = ((static_cast<size_t>(w) * ch + 3) / 4) * 4;
  if (buf.size() < off + stride * ah) return EL_DECODE_ERROR;
  img.w = w;
  img.h = ah;
  img.channels = 3;
  img.data.resize(static_cast<size_t>(w) * ah * 3);
  for (int y = 0; y < ah; ++y) {
    const uint8_t* row = &buf[off + stride * (flip ? (ah - 1 - y) : y)];
    for (int x = 0; x < w; ++x) {
      // BMP stores BGR(A)
      img.data[(static_cast<size_t>(y) * w + x) * 3 + 0] = row[x * ch + 2];
      img.data[(static_cast<size_t>(y) * w + x) * 3 + 1] = row[x * ch + 1];
      img.data[(static_cast<size_t>(y) * w + x) * 3 + 2] = row[x * ch + 0];
    }
  }
  return EL_OK;
}

// ---------------------------------------------------------------- PNG ----
int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

int decode_png(const std::vector<uint8_t>& buf, Image& img) {
  static const uint8_t SIG[8] = {0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a};
  if (buf.size() < 8 || std::memcmp(buf.data(), SIG, 8) != 0)
    return EL_UNSUPPORTED;
  size_t pos = 8;
  uint32_t w = 0, h = 0;
  int bitdepth = 0, colortype = -1, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;

  auto be32 = [&](size_t p) {
    return (uint32_t(buf[p]) << 24) | (uint32_t(buf[p + 1]) << 16) |
           (uint32_t(buf[p + 2]) << 8) | uint32_t(buf[p + 3]);
  };

  while (pos + 8 <= buf.size()) {
    uint32_t len = be32(pos);
    if (pos + 12 + len > buf.size()) return EL_DECODE_ERROR;
    const char* tag = reinterpret_cast<const char*>(&buf[pos + 4]);
    const uint8_t* body = &buf[pos + 8];
    if (std::memcmp(tag, "IHDR", 4) == 0) {
      if (len < 13) return EL_DECODE_ERROR;  // IHDR body is 13 bytes
      w = be32(pos + 8);
      h = be32(pos + 12);
      bitdepth = body[8];
      colortype = body[9];
      interlace = body[12];
    } else if (std::memcmp(tag, "PLTE", 4) == 0) {
      palette.assign(body, body + len);
    } else if (std::memcmp(tag, "IDAT", 4) == 0) {
      idat.insert(idat.end(), body, body + len);
    } else if (std::memcmp(tag, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (w == 0 || h == 0 || bitdepth != 8 || interlace != 0)
    return EL_UNSUPPORTED;
  int ch;
  switch (colortype) {
    case 0: ch = 1; break;   // gray
    case 2: ch = 3; break;   // rgb
    case 3: ch = 1; break;   // palette index
    case 4: ch = 2; break;   // gray+alpha
    case 6: ch = 4; break;   // rgba
    default: return EL_UNSUPPORTED;
  }

  size_t stride = static_cast<size_t>(w) * ch;
  std::vector<uint8_t> raw((stride + 1) * h);
  {
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit(&zs) != Z_OK) return EL_DECODE_ERROR;
    zs.next_in = idat.data();
    zs.avail_in = static_cast<uInt>(idat.size());
    zs.next_out = raw.data();
    zs.avail_out = static_cast<uInt>(raw.size());
    int rc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    if (rc != Z_STREAM_END && rc != Z_OK) return EL_DECODE_ERROR;
  }

  // unfilter in place into out
  std::vector<uint8_t> out(stride * h);
  for (uint32_t y = 0; y < h; ++y) {
    uint8_t filter = raw[(stride + 1) * y];
    const uint8_t* src = &raw[(stride + 1) * y + 1];
    uint8_t* dst = &out[stride * y];
    const uint8_t* up = y ? &out[stride * (y - 1)] : nullptr;
    for (size_t i = 0; i < stride; ++i) {
      int a = (i >= static_cast<size_t>(ch)) ? dst[i - ch] : 0;
      int b = up ? up[i] : 0;
      int c = (up && i >= static_cast<size_t>(ch)) ? up[i - ch] : 0;
      int x = src[i];
      switch (filter) {
        case 0: dst[i] = static_cast<uint8_t>(x); break;
        case 1: dst[i] = static_cast<uint8_t>(x + a); break;
        case 2: dst[i] = static_cast<uint8_t>(x + b); break;
        case 3: dst[i] = static_cast<uint8_t>(x + ((a + b) >> 1)); break;
        case 4: dst[i] = static_cast<uint8_t>(x + paeth(a, b, c)); break;
        default: return EL_DECODE_ERROR;
      }
    }
  }

  img.w = static_cast<int>(w);
  img.h = static_cast<int>(h);
  if (colortype == 3) {
    if (palette.empty()) return EL_DECODE_ERROR;
    img.channels = 3;
    img.data.resize(static_cast<size_t>(w) * h * 3);
    for (size_t i = 0; i < static_cast<size_t>(w) * h; ++i) {
      uint8_t idx = out[i];
      if (static_cast<size_t>(idx) * 3 + 2 >= palette.size())
        return EL_DECODE_ERROR;
      img.data[i * 3 + 0] = palette[idx * 3 + 0];
      img.data[i * 3 + 1] = palette[idx * 3 + 1];
      img.data[i * 3 + 2] = palette[idx * 3 + 2];
    }
  } else {
    img.channels = ch;
    img.data = std::move(out);
  }
  return EL_OK;
}

int decode_any(const std::vector<uint8_t>& buf, Image& img) {
  int rc = decode_png(buf, img);
  if (rc != EL_UNSUPPORTED) return rc;
  rc = decode_pnm(buf, img);
  if (rc != EL_UNSUPPORTED) return rc;
  return decode_bmp(buf, img);
}

// ------------------------------------------------------------- resize ----
double downsize_scale(int rows) {
  double scale = 1.0, r = rows;
  while (r > MAX_ROWS) {
    scale *= SCALE_STEP;
    r *= SCALE_STEP;
  }
  return scale;
}

// grayscale + bilinear resample into float32 [0, 1]
void to_gray_resized(const Image& img, int out_w, int out_h, float* dst,
                     size_t dst_stride) {
  const double sx = static_cast<double>(img.w) / out_w;
  const double sy = static_cast<double>(img.h) / out_h;
  const int ch = img.channels;
  for (int y = 0; y < out_h; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    int y0 = std::clamp(static_cast<int>(std::floor(fy)), 0, img.h - 1);
    int y1 = std::min(y0 + 1, img.h - 1);
    double wy = std::clamp(fy - y0, 0.0, 1.0);
    for (int x = 0; x < out_w; ++x) {
      double fx = (x + 0.5) * sx - 0.5;
      int x0 = std::clamp(static_cast<int>(std::floor(fx)), 0, img.w - 1);
      int x1 = std::min(x0 + 1, img.w - 1);
      double wx = std::clamp(fx - x0, 0.0, 1.0);
      auto gray = [&](int yy, int xx) -> double {
        const uint8_t* p = &img.data[(static_cast<size_t>(yy) * img.w + xx) * ch];
        switch (ch) {
          case 1: return p[0];
          case 2: return p[0];                       // gray (+alpha)
          default: return 0.299 * p[0] + 0.587 * p[1] + 0.114 * p[2];
        }
      };
      double v = (1 - wy) * ((1 - wx) * gray(y0, x0) + wx * gray(y0, x1)) +
                 wy * ((1 - wx) * gray(y1, x0) + wx * gray(y1, x1));
      dst[static_cast<size_t>(y) * dst_stride + x] =
          static_cast<float>(v / 255.0);
    }
  }
}

}  // namespace

extern "C" {

// Probe decoded-and-downsized dimensions. Returns EL_* status.
int el_probe(const char* path, int* out_w, int* out_h) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return EL_IO_ERROR;
  Image img;
  int rc = decode_any(buf, img);
  if (rc != EL_OK) return rc;
  double s = downsize_scale(img.h);
  *out_w = std::max(1, static_cast<int>(std::lround(img.w * s)));
  *out_h = std::max(1, static_cast<int>(std::lround(img.h * s)));
  return EL_OK;
}

// Decode a batch of n images into a caller-allocated padded buffer
// out[n, out_h, out_w] (float32, grayscale, [0, 1]); writes per-image
// (w, h) into sizes[2 * i]. status[i] receives the per-image EL_* code.
// Runs on n_threads workers. Returns the number of failed images.
int el_load_batch(const char** paths, int n, float* out, int out_h, int out_w,
                  int* sizes, int* status, int n_threads) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      std::vector<uint8_t> buf;
      Image img;
      int rc = EL_IO_ERROR;
      if (read_file(paths[i], buf)) rc = decode_any(buf, img);
      status[i] = rc;
      if (rc != EL_OK) {
        failures.fetch_add(1);
        sizes[2 * i] = 0;
        sizes[2 * i + 1] = 0;
        continue;
      }
      double s = downsize_scale(img.h);
      int w = std::max(1, static_cast<int>(std::lround(img.w * s)));
      int h = std::max(1, static_cast<int>(std::lround(img.h * s)));
      w = std::min(w, out_w);
      h = std::min(h, out_h);
      sizes[2 * i] = w;
      sizes[2 * i + 1] = h;
      float* dst = out + static_cast<size_t>(i) * out_h * out_w;
      std::memset(dst, 0, sizeof(float) * out_h * out_w);
      to_gray_resized(img, w, h, dst, out_w);
    }
  };
  int nt = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
