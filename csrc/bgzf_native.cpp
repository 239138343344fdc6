// Native BGZF inflation for the host ingest layer.
//
// The reference delegates BAM decompression to htslib's bgzf.c (thread-pooled
// inflate). This is the equivalent for methyldackel_tpu: scan the BGZF block
// headers (BC extra subfield → BSIZE, trailing ISIZE), then inflate all
// blocks in parallel with raw zlib. Exposed via a C ABI consumed through
// ctypes (methyldackel_tpu/io/native.py).
//
// Build: make -C csrc   (produces csrc/build/libmdtpu_native.so)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <dlfcn.h>
#include <zlib.h>

namespace {

struct Block {
  int64_t coffset;   // compressed offset of the gzip member
  int64_t cdata_off; // offset of the deflate payload
  int64_t cdata_len;
  int64_t uoffset;   // output offset
  int64_t isize;
};

// Parse all block headers; returns false on malformed input.
bool scan_blocks(const uint8_t* data, int64_t len, std::vector<Block>& blocks) {
  int64_t off = 0;
  int64_t uoff = 0;
  while (off < len) {
    if (off + 18 > len) return false;
    if (data[off] != 0x1f || data[off + 1] != 0x8b) return false;
    if (!(data[off + 3] & 4)) return false;  // FEXTRA required
    uint16_t xlen;
    std::memcpy(&xlen, data + off + 10, 2);
    int64_t p = off + 12;
    int64_t xend = p + xlen;
    if (xend > len) return false;
    int64_t bsize = -1;
    while (p + 4 <= xend) {
      uint8_t si1 = data[p], si2 = data[p + 1];
      uint16_t slen;
      std::memcpy(&slen, data + p + 2, 2);
      if (si1 == 66 && si2 == 67 && slen == 2) {
        uint16_t bs;
        std::memcpy(&bs, data + p + 4, 2);
        bsize = int64_t(bs) + 1;
      }
      p += 4 + slen;
    }
    if (bsize < 0 || off + bsize > len) return false;
    uint32_t isize;
    std::memcpy(&isize, data + off + bsize - 4, 4);
    Block b;
    b.coffset = off;
    b.cdata_off = off + 12 + xlen;
    b.cdata_len = bsize - 12 - xlen - 8;
    b.uoffset = uoff;
    b.isize = isize;
    blocks.push_back(b);
    uoff += isize;
    off += bsize;
  }
  return true;
}

bool inflate_block_zlib(const uint8_t* src, int64_t srclen, uint8_t* dst,
                        int64_t dstlen) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -15) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(src);
  zs.avail_in = static_cast<uInt>(srclen);
  zs.next_out = dst;
  zs.avail_out = static_cast<uInt>(dstlen);
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return rc == Z_STREAM_END && zs.total_out == static_cast<uLong>(dstlen);
}

// libdeflate's raw-deflate decoder is ~2-3x zlib's. It is resolved at
// RUNTIME via dlopen — never linked — so the shipped .so loads on hosts
// without libdeflate and transparently falls back to zlib there (a
// hard-linked build previously failed ctypes.CDLL on such hosts, silently
// disabling every native kernel). Any per-block failure also retries with
// zlib (libdeflate is stricter about some streams zlib accepts).
typedef void* libdeflate_decompressor;
typedef libdeflate_decompressor* (*ld_alloc_fn)();
typedef void (*ld_free_fn)(libdeflate_decompressor*);
// libdeflate_result: 0 == LIBDEFLATE_SUCCESS
typedef int (*ld_decomp_fn)(libdeflate_decompressor*, const void*, size_t,
                            void*, size_t, size_t*);

struct LibDeflateApi {
  ld_alloc_fn alloc = nullptr;
  ld_free_fn release = nullptr;
  ld_decomp_fn decompress = nullptr;
  LibDeflateApi() {
    void* h = dlopen("libdeflate.so.0", RTLD_NOW | RTLD_LOCAL);
    if (!h) h = dlopen("libdeflate.so", RTLD_NOW | RTLD_LOCAL);
    if (!h) return;
    alloc = reinterpret_cast<ld_alloc_fn>(
        dlsym(h, "libdeflate_alloc_decompressor"));
    release = reinterpret_cast<ld_free_fn>(
        dlsym(h, "libdeflate_free_decompressor"));
    decompress = reinterpret_cast<ld_decomp_fn>(
        dlsym(h, "libdeflate_deflate_decompress"));
    if (!alloc || !release || !decompress) {
      alloc = nullptr;
      release = nullptr;
      decompress = nullptr;
    }
  }
};

const LibDeflateApi& libdeflate_api() {
  static LibDeflateApi api;  // thread-safe static init
  return api;
}

libdeflate_decompressor* libdeflate_alloc_decompressor() {
  const LibDeflateApi& api = libdeflate_api();
  return api.alloc ? api.alloc() : nullptr;
}

void libdeflate_free_decompressor(libdeflate_decompressor* dec) {
  const LibDeflateApi& api = libdeflate_api();
  if (api.release && dec) api.release(dec);
}

bool inflate_block(libdeflate_decompressor* dec, const uint8_t* src,
                   int64_t srclen, uint8_t* dst, int64_t dstlen) {
  if (dec) {
    size_t actual = 0;
    int r = libdeflate_api().decompress(
        dec, src, static_cast<size_t>(srclen), dst,
        static_cast<size_t>(dstlen), &actual);
    if (r == 0 && actual == static_cast<size_t>(dstlen)) return true;
  }
  return inflate_block_zlib(src, srclen, dst, dstlen);
}

}  // namespace

extern "C" {

// Total decompressed size, or -1 on malformed input.
int64_t mdtpu_bgzf_bound(const char* data, int64_t len) {
  std::vector<Block> blocks;
  if (!scan_blocks(reinterpret_cast<const uint8_t*>(data), len, blocks))
    return -1;
  int64_t total = 0;
  for (const auto& b : blocks) total += b.isize;
  return total;
}

// Inflate the whole stream into out (capacity outcap). Returns bytes
// written, or -1 on error.
int64_t mdtpu_bgzf_decompress(const char* data, int64_t len, char* out,
                              int64_t outcap, int nthreads) {
  const uint8_t* src = reinterpret_cast<const uint8_t*>(data);
  uint8_t* dst = reinterpret_cast<uint8_t*>(out);
  std::vector<Block> blocks;
  if (!scan_blocks(src, len, blocks)) return -1;
  int64_t total = 0;
  for (const auto& b : blocks) total += b.isize;
  if (total > outcap) return -1;

  if (nthreads < 1) nthreads = 1;
  size_t nb = blocks.size();
  size_t workers = std::min<size_t>(nthreads, std::max<size_t>(nb, 1));
  std::vector<std::thread> threads;
  std::vector<char> ok(nb, 1);
  auto work = [&](size_t tid) {
    libdeflate_decompressor* dec = libdeflate_alloc_decompressor();
    for (size_t i = tid; i < nb; i += workers) {
      const Block& b = blocks[i];
      if (b.isize == 0) continue;
      if (!inflate_block(dec, src + b.cdata_off, b.cdata_len,
                         dst + b.uoffset, b.isize))
        ok[i] = 0;
    }
    if (dec) libdeflate_free_decompressor(dec);
  };
  if (workers <= 1) {
    work(0);
  } else {
    threads.reserve(workers);
    for (size_t t = 0; t < workers; ++t) threads.emplace_back(work, t);
    for (auto& th : threads) th.join();
  }
  for (size_t i = 0; i < nb; ++i)
    if (!ok[i]) return -1;
  return total;
}

// Introspection: 1 if libdeflate was resolved at runtime, else 0 (zlib-only).
int mdtpu_uses_libdeflate() {
  return libdeflate_api().decompress ? 1 : 0;
}

}  // extern "C"
