// Native FITS windowed tile reader — the data-loader hot path.
//
// The reference leans on cfitsio (via the fitsio package) for windowed
// reads of mosaic tiles (reference utils.py:340-418) and re-reads every
// tile from disk on its MPI rank (reference inference.py:190-195).  This
// is the TPU-native equivalent: a GIL-free, thread-pooled batch tile
// reader exposed through a C ABI (Python binds via ctypes, see
// caesar_yolo_tpu/utils/fits_native.py).  Format authority is the pure
// -numpy reader in caesar_yolo_tpu/utils/fits.py; this library matches
// its semantics bit-for-bit: primary-HDU only, BITPIX in
// {8,16,32,64,-32,-64}, BSCALE/BZERO applied, big-endian decode,
// non-finite -> 0, output float32 rows [h, w] in C order.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <atomic>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#if defined(_WIN32)
#error "POSIX only"
#endif
#include <fcntl.h>
#include <unistd.h>

namespace {

constexpr int kBlock = 2880;
constexpr int kCard = 80;

struct FitsInfo {
  long data_offset = 0;
  int bitpix = 0;
  long nx = 0, ny = 0;
  int naxis = 0;
  double bscale = 1.0, bzero = 0.0;
  bool has_blank = false;   // BLANK: undefined-pixel sentinel (int data)
  double blank = 0.0;
  bool degenerate_hi_axes = true;  // NAXIS3/4 == 1 when naxis == 4
};

// Parse "KEY     = value / comment" cards from the primary header.
bool parse_header(int fd, FitsInfo* info, std::string* err) {
  char block[kBlock];
  long offset = 0;
  long naxis_n[4] = {0, 0, 1, 1};
  bool end_seen = false;
  while (!end_seen) {
    ssize_t n = pread(fd, block, kBlock, offset);
    if (n != kBlock) {
      *err = "truncated FITS header";
      return false;
    }
    for (int i = 0; i < kBlock; i += kCard) {
      char key[9] = {0};
      std::memcpy(key, block + i, 8);
      for (int k = 7; k >= 0 && key[k] == ' '; --k) key[k] = 0;
      if (std::strcmp(key, "END") == 0) {
        end_seen = true;
        break;
      }
      if (block[i + 8] != '=' || block[i + 9] != ' ') continue;
      char val[71] = {0};
      std::memcpy(val, block + i + 10, 70);
      // terminate at '/' comment (no quoted strings among numeric keys);
      // map FORTRAN D-exponents (1.0D-3, AIPS writers) to E — atof
      // stops at 'D' and would silently parse 1.0D-3 as 1.0, making
      // BSCALE/BZERO (and thus every pixel) up to orders of magnitude
      // wrong vs the numpy reader's _parse_card_value
      for (char* p = val; *p; ++p) {
        if (*p == '\'') break;
        if (*p == '/') { *p = 0; break; }
        if (*p == 'D' || *p == 'd') *p = 'E';
      }
      double d = std::atof(val);
      if (std::strcmp(key, "BITPIX") == 0) info->bitpix = (int)d;
      else if (std::strcmp(key, "NAXIS") == 0) info->naxis = (int)d;
      else if (std::strcmp(key, "NAXIS1") == 0) naxis_n[0] = (long)d;
      else if (std::strcmp(key, "NAXIS2") == 0) naxis_n[1] = (long)d;
      else if (std::strcmp(key, "NAXIS3") == 0) naxis_n[2] = (long)d;
      else if (std::strcmp(key, "NAXIS4") == 0) naxis_n[3] = (long)d;
      else if (std::strcmp(key, "BSCALE") == 0) info->bscale = d;
      else if (std::strcmp(key, "BZERO") == 0) info->bzero = d;
      else if (std::strcmp(key, "BLANK") == 0) {
        info->has_blank = true;
        info->blank = d;
      }
    }
    offset += kBlock;
  }
  info->data_offset = offset;
  info->nx = naxis_n[0];
  info->ny = naxis_n[1];
  info->degenerate_hi_axes = (naxis_n[2] == 1 && naxis_n[3] == 1);
  if (info->naxis != 2 && !(info->naxis == 4 && info->degenerate_hi_axes)) {
    *err = "unsupported NAXIS layout";
    return false;
  }
  switch (info->bitpix) {
    case 8: case 16: case 32: case 64: case -32: case -64: break;
    default: *err = "unsupported BITPIX"; return false;
  }
  return true;
}

inline uint16_t bswap16(uint16_t v) { return __builtin_bswap16(v); }
inline uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }
inline uint64_t bswap64(uint64_t v) { return __builtin_bswap64(v); }

// Decode one row of `w` big-endian values into float32 with scaling.
void decode_row(const uint8_t* src, float* dst, long w, int bitpix,
                double bscale, double bzero, bool has_blank,
                double blank) {
  const bool scaled = (bscale != 1.0) || (bzero != 0.0);
  switch (bitpix) {
    case 8:
      for (long i = 0; i < w; ++i) dst[i] = (float)src[i];
      break;
    case 16:
      for (long i = 0; i < w; ++i) {
        uint16_t u = bswap16(((const uint16_t*)src)[i]);
        int16_t s;
        std::memcpy(&s, &u, 2);
        dst[i] = (float)s;
      }
      break;
    case 32:
      for (long i = 0; i < w; ++i) {
        uint32_t u = bswap32(((const uint32_t*)src)[i]);
        int32_t s;
        std::memcpy(&s, &u, 4);
        dst[i] = (float)s;
      }
      break;
    case 64:
      for (long i = 0; i < w; ++i) {
        uint64_t u = bswap64(((const uint64_t*)src)[i]);
        int64_t s;
        std::memcpy(&s, &u, 8);
        dst[i] = (float)s;
      }
      break;
    case -32:
      for (long i = 0; i < w; ++i) {
        uint32_t u = bswap32(((const uint32_t*)src)[i]);
        float f;
        std::memcpy(&f, &u, 4);
        dst[i] = f;
      }
      break;
    case -64:
      for (long i = 0; i < w; ++i) {
        uint64_t u = bswap64(((const uint64_t*)src)[i]);
        double f;
        std::memcpy(&f, &u, 8);
        dst[i] = (float)f;
      }
      break;
  }
  // BLANK pixels (undefined, INTEGER data only; FITS 4.0 §5.3) become
  // NaN BEFORE scaling, then fall to 0 with every other non-finite —
  // the numpy reader's exact semantics (utils/fits.py _apply_scaling)
  if (has_blank && bitpix > 0) {
    const float bf = (float)blank;
    for (long i = 0; i < w; ++i)
      if (dst[i] == bf) dst[i] = NAN;
  }
  if (scaled) {
    for (long i = 0; i < w; ++i)
      dst[i] = (float)(dst[i] * bscale + bzero);
  }
  for (long i = 0; i < w; ++i)
    if (!std::isfinite(dst[i])) dst[i] = 0.0f;
}

int item_size(int bitpix) { return std::abs(bitpix) / 8; }

// Read window [y0, y1) x [x0, x1) into out[h * w] float32.
bool read_window(int fd, const FitsInfo& fi, long x0, long x1, long y0,
                 long y1, float* out, std::string* err) {
  if (x0 < 0 || y0 < 0 || x1 <= x0 || y1 <= y0 || x1 > fi.nx ||
      y1 > fi.ny) {
    *err = "window out of bounds";
    return false;
  }
  const long w = x1 - x0, h = y1 - y0;
  const int isz = item_size(fi.bitpix);
  std::vector<uint8_t> buf((size_t)w * isz);
  for (long j = 0; j < h; ++j) {
    off_t off = fi.data_offset + ((off_t)(y0 + j) * fi.nx + x0) * isz;
    ssize_t want = (ssize_t)w * isz;
    ssize_t got = pread(fd, buf.data(), want, off);
    if (got != want) {
      *err = "short read in data section";
      return false;
    }
    decode_row(buf.data(), out + (size_t)j * w, w, fi.bitpix, fi.bscale,
               fi.bzero, fi.has_blank, fi.blank);
  }
  return true;
}

thread_local std::string g_error;

}  // namespace

extern "C" {

// Returns 0 on success. info_out: [data_offset, bitpix, nx, ny].
int cyt_fits_open_info(const char* path, long long* info_out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) {
    g_error = "cannot open file";
    return -1;
  }
  FitsInfo fi;
  std::string err;
  bool ok = parse_header(fd, &fi, &err);
  close(fd);
  if (!ok) {
    g_error = err;
    return -1;
  }
  info_out[0] = fi.data_offset;
  info_out[1] = fi.bitpix;
  info_out[2] = fi.nx;
  info_out[3] = fi.ny;
  return 0;
}

// Batch tile read with an internal thread pool.
// windows: n x 4 longs (x0, x1, y0, y1), half-open; out: concatenated
// float32 tiles in window order (caller sizes it as sum of h*w).
// nthreads <= 0 selects hardware concurrency.  Returns 0 when every
// window read succeeds, else -(1 + index of first failed window).
int cyt_fits_read_tiles(const char* path, const long long* windows,
                        int n, float* out, int nthreads) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) {
    g_error = "cannot open file";
    return -1;
  }
  FitsInfo fi;
  std::string err;
  if (!parse_header(fd, &fi, &err)) {
    close(fd);
    g_error = err;
    return -1;
  }
  // per-window output offsets
  std::vector<size_t> offs(n + 1, 0);
  for (int i = 0; i < n; ++i) {
    const long long* wdw = windows + 4 * i;
    long w = wdw[1] - wdw[0], h = wdw[3] - wdw[2];
    offs[i + 1] = offs[i] + (size_t)(w > 0 ? w : 0) * (h > 0 ? h : 0);
  }
  int hw = (int)std::thread::hardware_concurrency();
  int nt = nthreads > 0 ? nthreads : (hw > 0 ? hw : 4);
  if (nt > n) nt = n;
  std::atomic<int> next(0), failed(-1);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load() >= 0) return;
      const long long* wdw = windows + 4 * i;
      std::string werr;
      if (!read_window(fd, fi, wdw[0], wdw[1], wdw[2], wdw[3],
                       out + offs[i], &werr)) {
        int expect = -1;
        failed.compare_exchange_strong(expect, i);
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  close(fd);
  int f = failed.load();
  if (f >= 0) {
    g_error = "window read failed";
    return -(1 + f);
  }
  return 0;
}

const char* cyt_last_error() { return g_error.c_str(); }

}  // extern "C"
