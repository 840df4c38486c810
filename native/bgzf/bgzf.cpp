// Parallel BGZF block codec (native runtime component).
//
// Role: the reference stack's native compression layer (htsjdk
// BlockCompressed streams + Intel GKL deflate acceleration,
// /root/reference/Jar/lib/gkl-0.8.5.jar) — reimplemented as a small C++
// library driving zlib raw-deflate over independent 64KB BGZF blocks with a
// std::thread fan-out. Exposed through a C ABI consumed via ctypes
// (sicelore_tpu/io/native.py).
//
// BGZF block layout (SAMv1 spec §4.1):
//   gzip header (10B, FLG.FEXTRA) + XLEN(2) + extra "BC" subfield carrying
//   BSIZE(total block size - 1) + raw deflate payload + CRC32(4) + ISIZE(4)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <zlib.h>

namespace {

constexpr int64_t kMaxPayload = 65280;          // uncompressed bytes/block
constexpr int64_t kStride = 65536 + 256;        // scratch slot per block
const uint8_t kEofBlock[28] = {
    0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff, 0x06, 0x00, 0x42, 0x43,
    0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00};

// Compress one payload into a full BGZF block at dst; returns block size
// or -1.
int64_t compress_block(const uint8_t* src, int64_t n, int level,
                       uint8_t* dst, int64_t cap) {
  if (cap < 26 + n + 64) return -1;
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8, Z_DEFAULT_STRATEGY) !=
      Z_OK)
    return -1;
  uint8_t* body = dst + 18;
  zs.next_in = const_cast<uint8_t*>(src);
  zs.avail_in = static_cast<uInt>(n);
  zs.next_out = body;
  zs.avail_out = static_cast<uInt>(cap - 26);
  int ret = deflate(&zs, Z_FINISH);
  int64_t clen = static_cast<int64_t>(zs.total_out);
  deflateEnd(&zs);
  if (ret != Z_STREAM_END) return -1;
  int64_t bsize = clen + 26 - 1;
  if (bsize > 65535) return -1;
  const uint8_t hdr[12] = {0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0,
                           0,    0xff, 0x06, 0x00};
  std::memcpy(dst, hdr, 12);
  dst[12] = 'B';
  dst[13] = 'C';
  dst[14] = 2;
  dst[15] = 0;
  dst[16] = static_cast<uint8_t>(bsize & 0xff);
  dst[17] = static_cast<uint8_t>((bsize >> 8) & 0xff);
  uint32_t crc = crc32(0, src, static_cast<uInt>(n));
  uint8_t* tail = body + clen;
  for (int i = 0; i < 4; i++) tail[i] = (crc >> (8 * i)) & 0xff;
  for (int i = 0; i < 4; i++) tail[4 + i] = (n >> (8 * i)) & 0xff;
  return clen + 26;
}

}  // namespace

extern "C" {

int64_t bgzf_max_compressed_size(int64_t in_len) {
  int64_t blocks = (in_len + kMaxPayload - 1) / kMaxPayload + 1;
  return blocks * kStride + sizeof(kEofBlock);
}

// Compress `in` into a BGZF stream (without EOF block unless add_eof).
// Returns bytes written or -1.
int64_t bgzf_compress(const uint8_t* in, int64_t in_len, int level,
                      int nthreads, int add_eof, uint8_t* out,
                      int64_t out_cap) {
  int64_t nblocks = (in_len + kMaxPayload - 1) / kMaxPayload;
  if (in_len == 0) nblocks = 0;
  std::vector<int64_t> sizes(nblocks, 0);
  std::vector<uint8_t> scratch(static_cast<size_t>(nblocks) * kStride);
  if (nthreads < 1) nthreads = 1;
  std::vector<std::thread> pool;
  std::vector<int> fail(nthreads, 0);
  for (int t = 0; t < nthreads; t++) {
    pool.emplace_back([&, t]() {
      for (int64_t b = t; b < nblocks; b += nthreads) {
        int64_t off = b * kMaxPayload;
        int64_t n = std::min(kMaxPayload, in_len - off);
        int64_t s = compress_block(in + off, n, level,
                                   scratch.data() + b * kStride, kStride);
        if (s < 0) {
          fail[t] = 1;
          return;
        }
        sizes[b] = s;
      }
    });
  }
  for (auto& th : pool) th.join();
  for (int f : fail)
    if (f) return -1;
  int64_t w = 0;
  for (int64_t b = 0; b < nblocks; b++) {
    if (w + sizes[b] > out_cap) return -1;
    std::memcpy(out + w, scratch.data() + b * kStride, sizes[b]);
    w += sizes[b];
  }
  if (add_eof) {
    if (w + static_cast<int64_t>(sizeof(kEofBlock)) > out_cap) return -1;
    std::memcpy(out + w, kEofBlock, sizeof(kEofBlock));
    w += sizeof(kEofBlock);
  }
  return w;
}

// Scan the BGZF stream, then inflate all blocks in parallel.
// block_coffsets/block_uoffsets (optional, capacity max_blocks) receive the
// compressed/uncompressed start offset of each block (for virtual-offset
// seeks). Returns total uncompressed length, or -1 on error, or -2 if out
// capacity is insufficient (call again with a bigger buffer).
int64_t bgzf_decompress(const uint8_t* in, int64_t in_len, int nthreads,
                        uint8_t* out, int64_t out_cap,
                        int64_t* block_coffsets, int64_t* block_uoffsets,
                        int64_t max_blocks, int64_t* n_blocks_out) {
  struct Blk {
    int64_t coff, clen, uoff, ulen, body_off;
  };
  std::vector<Blk> blocks;
  int64_t p = 0, uoff = 0;
  while (p + 18 <= in_len) {
    if (in[p] != 0x1f || in[p + 1] != 0x8b) return -1;
    int xlen = in[p + 10] | (in[p + 11] << 8);
    // find BC subfield
    int64_t xs = p + 12, bsize = -1;
    int64_t xend = xs + xlen;
    while (xs + 4 <= xend) {
      int slen = in[xs + 2] | (in[xs + 3] << 8);
      if (in[xs] == 'B' && in[xs + 1] == 'C' && slen == 2)
        bsize = in[xs + 4] | (in[xs + 5] << 8);
      xs += 4 + slen;
    }
    if (bsize < 0) return -1;
    int64_t total = bsize + 1;
    if (p + total > in_len) break;  // truncated tail: stop
    int64_t body_off = p + 12 + xlen;
    int64_t clen = total - 12 - xlen - 8;
    const uint8_t* isize_p = in + p + total - 4;
    int64_t ulen = isize_p[0] | (isize_p[1] << 8) | (isize_p[2] << 16) |
                   (static_cast<int64_t>(isize_p[3]) << 24);
    blocks.push_back({p, clen, uoff, ulen, body_off});
    uoff += ulen;
    p += total;
  }
  if (uoff > out_cap) return -2;
  if (nthreads < 1) nthreads = 1;
  std::vector<std::thread> pool;
  std::vector<int> fail(nthreads, 0);
  for (int t = 0; t < nthreads; t++) {
    pool.emplace_back([&, t]() {
      for (size_t b = t; b < blocks.size();
           b += static_cast<size_t>(nthreads)) {
        const Blk& blk = blocks[b];
        if (blk.ulen == 0) continue;
        z_stream zs;
        std::memset(&zs, 0, sizeof(zs));
        if (inflateInit2(&zs, -15) != Z_OK) {
          fail[t] = 1;
          return;
        }
        zs.next_in = const_cast<uint8_t*>(in + blk.body_off);
        zs.avail_in = static_cast<uInt>(blk.clen);
        zs.next_out = out + blk.uoff;
        zs.avail_out = static_cast<uInt>(blk.ulen);
        int ret = inflate(&zs, Z_FINISH);
        inflateEnd(&zs);
        if (ret != Z_STREAM_END) {
          fail[t] = 1;
          return;
        }
      }
    });
  }
  for (auto& th : pool) th.join();
  for (int f : fail)
    if (f) return -1;
  if (block_coffsets && block_uoffsets) {
    int64_t n = std::min<int64_t>(blocks.size(), max_blocks);
    for (int64_t b = 0; b < n; b++) {
      block_coffsets[b] = blocks[b].coff;
      block_uoffsets[b] = blocks[b].uoff;
    }
  }
  if (n_blocks_out) *n_blocks_out = static_cast<int64_t>(blocks.size());
  return uoff;
}

}  // extern "C"
