// fastio — native NIfTI-1 IO runtime for light_unet_tpu.
//
// The reference pipeline leans on nibabel's zlib and 16 forked DataLoader
// workers for IO throughput (light_unet/datasets/loader.py:10).  This
// library is the TPU-host equivalent: multithreaded gzip inflate + dtype
// conversion + scl_slope/inter scaling, entirely outside the Python GIL,
// exposed through a minimal C ABI consumed via ctypes
// (light_unet_tpu/utils/fastio.py).  A decode saturates memory bandwidth per
// thread; a batch of volumes decodes in parallel so the host never starves
// the TPU between cases.
//
// Build: g++ -O3 -march=native -shared -fPIC fastio.cpp -o libfastio.so -lz -lpthread

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include <libdeflate.h>
#include <zlib.h>

namespace {

constexpr int kHeaderSize = 348;

enum ErrorCode {
  kOk = 0,
  kErrOpen = -1,
  kErrGzip = -2,
  kErrHeader = -3,
  kErrDtype = -4,
  kErrShort = -5,
  kErrAlloc = -6,
  kErrData = -7,  // non-finite values in order-stats input
};

struct Inflater {
  z_stream strm{};
  bool live = false;

  int init() {
    std::memset(&strm, 0, sizeof(strm));
    // 15 + 32: zlib OR gzip auto-detection
    if (inflateInit2(&strm, 15 + 32) != Z_OK) return kErrGzip;
    live = true;
    return kOk;
  }
  ~Inflater() {
    if (live) inflateEnd(&strm);
  }
};

// Inflate from an in-memory compressed buffer into dst until dst_len bytes
// are produced (or the stream ends).  Returns bytes produced or error code.
long inflate_prefix(const uint8_t* src, size_t src_len, uint8_t* dst, size_t dst_len) {
  Inflater inf;
  if (inf.init() != kOk) return kErrGzip;
  inf.strm.next_in = const_cast<Bytef*>(src);
  inf.strm.avail_in = static_cast<uInt>(src_len);
  inf.strm.next_out = dst;
  inf.strm.avail_out = static_cast<uInt>(dst_len);
  while (inf.strm.avail_out > 0) {
    int rc = inflate(&inf.strm, Z_NO_FLUSH);
    if (rc == Z_STREAM_END) break;
    if (rc != Z_OK) return kErrGzip;
  }
  return static_cast<long>(dst_len - inf.strm.avail_out);
}

bool is_gzip(const uint8_t* buf, size_t len) {
  return len >= 2 && buf[0] == 0x1f && buf[1] == 0x8b;
}

// Whole-stream gzip decode via libdeflate (~2-3x zlib's streaming inflate:
// 64-bit bit buffer, flat multi-level Huffman tables, no window copies —
// the decode phase was the largest host cost at 160-370 ms/volume on this
// 1-core box, VERDICT r4 #8).  Inflate is a deterministic decode, so the
// output is bit-identical to the zlib path by construction; a fuzz test
// pins it (tests/unit/test_fastio.py).  Returns bytes produced, or a
// negative code meaning "use the zlib fallback" (stream larger than the
// expected NIfTI payload, corrupt data, FASTIO_ZLIB=1 kill switch).
long inflate_full_libdeflate(const uint8_t* src, size_t src_len, uint8_t* dst,
                             size_t dst_len) {
  // read per call (~ns): lets tests/benches A/B both paths in one process
  if (std::getenv("FASTIO_ZLIB") != nullptr) return kErrGzip;
  static thread_local libdeflate_decompressor* dec = libdeflate_alloc_decompressor();
  if (!dec) return kErrGzip;
  size_t actual = 0;
  libdeflate_result r =
      libdeflate_gzip_decompress(dec, src, src_len, dst, dst_len, &actual);
  // SUCCESS with actual < dst_len (member ended early) maps to the same
  // kErrShort the zlib path reports; anything else falls back to zlib.
  if (r == LIBDEFLATE_SUCCESS) return static_cast<long>(actual);
  return kErrGzip;
}

// Read a whole file into memory.
int read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return kErrOpen;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size <= 0) {
    std::fclose(f);
    return kErrShort;
  }
  out.resize(static_cast<size_t>(size));
  size_t got = std::fread(out.data(), 1, out.size(), f);
  std::fclose(f);
  return got == out.size() ? kOk : kErrShort;
}

template <typename T>
void convert_to_f32(const uint8_t* raw, float* dst, int64_t n, float slope, float inter) {
  const T* src = reinterpret_cast<const T*>(raw);
  if (slope == 1.0f && inter == 0.0f) {
    for (int64_t i = 0; i < n; ++i) dst[i] = static_cast<float>(src[i]);
  } else {
    for (int64_t i = 0; i < n; ++i) dst[i] = static_cast<float>(src[i]) * slope + inter;
  }
}

int dtype_itemsize(int code) {
  switch (code) {
    case 2: case 256: return 1;          // u8 / i8
    case 4: case 512: return 2;          // i16 / u16
    case 8: case 768: case 16: return 4; // i32 / u32 / f32
    case 64: return 8;                   // f64
    default: return 0;
  }
}

int convert(int code, const uint8_t* raw, float* dst, int64_t n, float slope, float inter) {
  switch (code) {
    case 2:   convert_to_f32<uint8_t>(raw, dst, n, slope, inter); return kOk;
    case 4:   convert_to_f32<int16_t>(raw, dst, n, slope, inter); return kOk;
    case 8:   convert_to_f32<int32_t>(raw, dst, n, slope, inter); return kOk;
    case 16:  convert_to_f32<float>(raw, dst, n, slope, inter); return kOk;
    case 64:  convert_to_f32<double>(raw, dst, n, slope, inter); return kOk;
    case 256: convert_to_f32<int8_t>(raw, dst, n, slope, inter); return kOk;
    case 512: convert_to_f32<uint16_t>(raw, dst, n, slope, inter); return kOk;
    case 768: convert_to_f32<uint32_t>(raw, dst, n, slope, inter); return kOk;
    default:  return kErrDtype;
  }
}

struct HeaderInfo {
  int16_t dim[8];
  int16_t datatype;
  float pixdim[8];
  float vox_offset;
  float scl_slope;
  float scl_inter;
};

int parse_header(const uint8_t* hdr, HeaderInfo* info) {
  int32_t sizeof_hdr;
  std::memcpy(&sizeof_hdr, hdr, 4);
  if (sizeof_hdr != kHeaderSize) return kErrHeader;  // big-endian: python fallback
  std::memcpy(info->dim, hdr + 40, 16);
  std::memcpy(&info->datatype, hdr + 70, 2);
  std::memcpy(info->pixdim, hdr + 76, 32);
  std::memcpy(&info->vox_offset, hdr + 108, 4);
  std::memcpy(&info->scl_slope, hdr + 112, 4);
  std::memcpy(&info->scl_inter, hdr + 116, 4);
  return kOk;
}

// Decode one NIfTI file (optionally gzipped) into a caller-provided f32
// buffer of capacity cap_voxels.  Writes the header into hdr348 (if not
// null).  Returns voxel count or negative error.
// Validate dim[]/vox_offset from an (untrusted) header.  Returns the voxel
// count, or a negative error if dims are out of range / would overflow.
// cap_voxels bounds the product so a hostile header can't drive a petabyte
// allocation.
int64_t checked_voxel_count(const HeaderInfo& info, int64_t cap_voxels) {
  int ndim = info.dim[0];
  if (ndim < 1 || ndim > 7) return kErrHeader;
  int64_t n = 1;
  for (int d = 1; d <= ndim; ++d) {
    int64_t dv = info.dim[d];
    if (dv < 1) return kErrHeader;
    n *= dv;
    if (n > cap_voxels) return kErrAlloc;
  }
  if (!std::isfinite(info.vox_offset) || info.vox_offset < kHeaderSize ||
      info.vox_offset > (1 << 20))
    return kErrHeader;
  return n;
}

int64_t decode_one(const char* path, float* dst, int64_t cap_voxels, uint8_t* hdr348) try {
  std::vector<uint8_t> file;
  int rc = read_file(path, file);
  if (rc != kOk) return rc;

  std::vector<uint8_t> plain;
  const uint8_t* data = file.data();
  size_t data_len = file.size();
  if (is_gzip(file.data(), file.size())) {
    // inflate the header first to learn the full size
    uint8_t hdr[kHeaderSize];
    long got = inflate_prefix(file.data(), file.size(), hdr, kHeaderSize);
    if (got != kHeaderSize) return kErrHeader;
    HeaderInfo info;
    if (parse_header(hdr, &info) != kOk) return kErrHeader;
    int isz = dtype_itemsize(info.datatype);
    if (!isz) return kErrDtype;
    int64_t n = checked_voxel_count(info, cap_voxels);
    if (n < 0) return n;
    size_t total = static_cast<size_t>(info.vox_offset) + static_cast<size_t>(n) * isz;
    plain.resize(total);
    long got2 = inflate_full_libdeflate(file.data(), file.size(), plain.data(), total);
    if (got2 < 0)  // larger-than-payload stream / odd data: zlib prefix decode
      got2 = inflate_prefix(file.data(), file.size(), plain.data(), total);
    if (got2 < static_cast<long>(total)) return kErrShort;
    data = plain.data();
    data_len = plain.size();
  }
  if (data_len < static_cast<size_t>(kHeaderSize)) return kErrShort;

  HeaderInfo info;
  if (parse_header(data, &info) != kOk) return kErrHeader;
  if (hdr348) std::memcpy(hdr348, data, kHeaderSize);
  int isz = dtype_itemsize(info.datatype);
  if (!isz) return kErrDtype;
  int64_t n = checked_voxel_count(info, cap_voxels);
  if (n < 0) return n;
  size_t offset = static_cast<size_t>(info.vox_offset);
  if (data_len < offset + static_cast<size_t>(n) * isz) return kErrShort;

  float slope = info.scl_slope;
  float inter = info.scl_inter;
  // nibabel semantics: slope 0/NaN means no scaling; non-finite inter is 0.
  if (!std::isfinite(slope) || slope == 0.0f) slope = 1.0f;
  if (!std::isfinite(inter)) inter = 0.0f;
  rc = convert(info.datatype, data + offset, dst, n, slope, inter);
  if (rc != kOk) return rc;
  return n;
} catch (...) {
  // std::bad_alloc etc. must not cross the extern-C boundary.
  return kErrAlloc;
}

}  // namespace

extern "C" {

// Header-only probe: fills hdr348; returns 0 or error.
int fastio_read_header(const char* path, uint8_t* hdr348) {
  std::vector<uint8_t> file;
  int rc = read_file(path, file);
  if (rc != kOk) return rc;
  if (is_gzip(file.data(), file.size())) {
    long got = inflate_prefix(file.data(), file.size(), hdr348, kHeaderSize);
    return got == kHeaderSize ? kOk : kErrHeader;
  }
  if (file.size() < static_cast<size_t>(kHeaderSize)) return kErrShort;
  std::memcpy(hdr348, file.data(), kHeaderSize);
  return kOk;
}

// Decode one volume to float32 (scaled).  Returns voxel count or error.
int64_t fastio_decode(const char* path, float* dst, int64_t cap_voxels, uint8_t* hdr348) {
  return decode_one(path, dst, cap_voxels, hdr348);
}

// Decode a batch of volumes in parallel.  dst buffers and headers are
// caller-provided arrays of pointers; results[i] gets the voxel count or a
// negative error code per file.
void fastio_decode_batch(const char** paths, int n_files, float** dsts,
                         const int64_t* caps, uint8_t** hdrs, int64_t* results,
                         int n_threads) {
  if (n_threads <= 0) n_threads = static_cast<int>(std::thread::hardware_concurrency());
  if (n_threads > n_files) n_threads = n_files;
  std::atomic<int> next{0};
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n_files) return;
      results[i] = decode_one(paths[i], dsts[i], caps[i], hdrs ? hdrs[i] : nullptr);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

// gzip-compress a buffer (for fast NIfTI writes).  Returns compressed size
// or negative error.  level: 1 (fast) .. 9.
int64_t fastio_gzip(const uint8_t* src, int64_t src_len, uint8_t* dst,
                    int64_t dst_cap, int level) {
  z_stream strm{};
  // 15 + 16: gzip wrapper
  if (deflateInit2(&strm, level, Z_DEFLATED, 15 + 16, 8, Z_DEFAULT_STRATEGY) != Z_OK)
    return kErrGzip;
  strm.next_in = const_cast<Bytef*>(src);
  strm.avail_in = static_cast<uInt>(src_len);
  strm.next_out = dst;
  strm.avail_out = static_cast<uInt>(dst_cap);
  int rc = deflate(&strm, Z_FINISH);
  int64_t out = static_cast<int64_t>(dst_cap - strm.avail_out);
  deflateEnd(&strm);
  if (rc != Z_STREAM_END) return kErrGzip;
  return out;
}

// Exact order statistics for float32 data: for each requested 0-based rank
// in idx[0..k) (sorted ascending, each in [0, n)), write the value that a
// full ascending sort would place at that rank into out[i].  Works on an
// internal scratch copy (data untouched); successive nth_element calls
// restrict to the tail partition, so k small ranks cost ~k linear passes.
// Powers the host percentile path (np.percentile linear interpolation needs
// two order stats per quantile; utils/fastio.py does the numpy-exact lerp).
// Non-finite values (NaN breaks nth_element's strict weak order, inf breaks
// the caller's lerp exactness) are detected HERE, fused into the scratch
// copy so the Python wrapper needs no separate isfinite pass; kErrData is
// returned and the wrapper falls back to numpy.
// Returns 0, or a negative error on bad args / data / allocation failure.
int fastio_order_stats(const float* data, int64_t n, const int64_t* idx,
                       int k, float* out) try {
  if (n <= 0 || k <= 0) return kErrHeader;
  for (int i = 0; i < k; ++i) {
    if (idx[i] < 0 || idx[i] >= n) return kErrHeader;
    if (i > 0 && idx[i] < idx[i - 1]) return kErrHeader;
  }
  std::vector<float> scratch(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    if (!std::isfinite(data[i])) return kErrData;
    scratch[i] = data[i];
  }
  int64_t start = 0;
  for (int i = 0; i < k; ++i) {
    if (i > 0 && idx[i] == idx[i - 1]) {
      out[i] = out[i - 1];
      continue;
    }
    std::nth_element(scratch.begin() + start, scratch.begin() + idx[i],
                     scratch.end());
    out[i] = scratch[idx[i]];
    start = idx[i] + 1;
  }
  return kOk;
} catch (...) {
  return kErrAlloc;
}

// Single-pass quantize+pad for the serving upload path
// (light_unet_tpu/ops/fused.py FusedVolumePipeline.prepare): replaces the
// numpy chain  clip -> -=lo -> *=scale -> +=0.5 -> uint16-cast-assign into a
// zeroed padded buffer  (4 full-volume temporaries/passes plus an F->C
// transpose copy, since decoded NIfTI volumes are Fortran-ordered views).
// Reads the f32 source through arbitrary element strides, writes the
// C-ordered padded uint16 destination sequentially, and zero-fills the
// padding — one read pass + one write pass, no allocations.
//
// Bit-identical to the numpy chain by construction: the same four f32 ops in
// the same order (the Makefile compiles with -ffp-contract=off so no FMA
// contraction changes a rounding), and the final cast is C truncation like
// numpy's astype. hi <= lo degenerates to scale = 0 exactly as the Python
// path does. Returns 0 or a negative error.
int fastio_quantize_pad(const float* src, const int64_t* dims,
                        const int64_t* strides_el, uint16_t* dst,
                        const int64_t* pdims, float lo, float hi,
                        float scale) {
  if (!src || !dst || !dims || !strides_el || !pdims) return kErrHeader;
  const int64_t d0 = dims[0], d1 = dims[1], d2 = dims[2];
  const int64_t p0 = pdims[0], p1 = pdims[1], p2 = pdims[2];
  if (d0 <= 0 || d1 <= 0 || d2 <= 0 || d0 > p0 || d1 > p1 || d2 > p2)
    return kErrHeader;
  const int64_t s0 = strides_el[0], s1 = strides_el[1], s2 = strides_el[2];
  // scale arrives precomputed: numpy derives it as f32(65535.0 / (hi - lo))
  // in FLOAT64 before the f32 cast — computing it here in f32 would round
  // differently (caught by the bit-identity fuzz test)

  // numpy chain: clip, subtract, multiply, add — each a separate f32
  // rounding (fp-contract off keeps it that way)
  auto quant = [lo, hi, scale](float v) -> uint16_t {
    if (v < lo) v = lo;
    if (v > hi) v = hi;
    v = v - lo;
    v = v * scale;
    v = v + 0.5f;
    return static_cast<uint16_t>(v);
  };

  // zero the padding margins (cheap: memset only the pad region)
  for (int64_t i = d0; i < p0; ++i)
    std::memset(dst + i * p1 * p2, 0,
                static_cast<size_t>(p1) * p2 * sizeof(uint16_t));
  for (int64_t i = 0; i < d0; ++i) {
    uint16_t* plane = dst + i * p1 * p2;
    for (int64_t j = d1; j < p1; ++j)
      std::memset(plane + j * p2, 0,
                  static_cast<size_t>(p2) * sizeof(uint16_t));
    if (d2 < p2)
      for (int64_t j = 0; j < d1; ++j)
        std::memset(plane + j * p2 + d2, 0,
                    static_cast<size_t>(p2 - d2) * sizeof(uint16_t));
  }

  if (s0 == 1 && d0 > 1) {
    // Fortran-contiguous source (decoded NIfTI views): out[i,j,k] =
    // src[i + j*s1 + k*s2] is a full transpose between the src-contiguous
    // axis (i) and the dst-contiguous axis (k).  Walk 64x64 (i,k) tiles per
    // j so both sides stay cache-resident (naive order misses a line per
    // element: measured 104 ms vs ~35 ms blocked on a whole-body volume).
    constexpr int64_t kTile = 64;
    for (int64_t j = 0; j < d1; ++j) {
      const float* sj = src + j * s1;
      uint16_t* pj = dst + j * p2;
      for (int64_t i0 = 0; i0 < d0; i0 += kTile) {
        const int64_t i1 = std::min(i0 + kTile, d0);
        for (int64_t k0 = 0; k0 < d2; k0 += kTile) {
          const int64_t k1 = std::min(k0 + kTile, d2);
          for (int64_t k = k0; k < k1; ++k) {
            const float* s = sj + k * s2;
            for (int64_t i = i0; i < i1; ++i)
              pj[i * p1 * p2 + k] = quant(s[i]);
          }
        }
      }
    }
    return kOk;
  }

  for (int64_t i = 0; i < d0; ++i) {
    uint16_t* plane = dst + i * p1 * p2;
    for (int64_t j = 0; j < d1; ++j) {
      uint16_t* row = plane + j * p2;
      const float* s = src + i * s0 + j * s1;
      for (int64_t k = 0; k < d2; ++k)
        row[k] = quant(s[k * s2]);
    }
  }
  return kOk;
}

int fastio_version() { return 4; }

}  // extern "C"
