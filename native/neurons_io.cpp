// neurons_io — native host-IO runtime for neurons_tpu.
//
// The TPU-native framework keeps its compute path in XLA/Pallas; this
// library owns the host-side IO hot paths the reference delegates to
// Python libraries (imageio GIF writing, reference animatediff/utils/
// util.py:61-74; GIF reading for the metric stage, reference
// run_metrics.py:36-47; torch DataLoader worker processes):
//
//   * GIF89a encoder: median-cut palette + LZW, frames compressed in a
//     thread pool (stage 5 writes 1200 clip GIFs).
//   * GIF89a decoder: LZW + palette expansion (stage 6 reads them back).
//   * parallel_read: thread-pooled pread() into caller buffers — the
//     native prefetcher under the data loader.
//
// C ABI for ctypes. No external dependencies.

#include <algorithm>
#include <atomic>
#include <functional>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

namespace {

// ---------------------------------------------------------------------------
// small helpers
// ---------------------------------------------------------------------------

struct Buf {
  std::vector<uint8_t> d;
  void u8(uint8_t v) { d.push_back(v); }
  void u16(uint16_t v) {
    d.push_back(v & 0xff);
    d.push_back(v >> 8);
  }
  void bytes(const void* p, size_t n) {
    const uint8_t* b = static_cast<const uint8_t*>(p);
    d.insert(d.end(), b, b + n);
  }
};

void parallel_for(int n, int threads, const std::function<void(int)>& fn) {
  if (threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next{0};
  std::vector<std::thread> pool;
  int nt = std::min(threads, n);
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    pool.emplace_back([&] {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
    });
  }
  for (auto& th : pool) th.join();
}

// ---------------------------------------------------------------------------
// median-cut palette (sampled), then an RGB555 -> index LUT
// ---------------------------------------------------------------------------

struct Box {
  std::vector<uint32_t> px;  // packed 0x00RRGGBB
};

int longest_axis(const Box& b, int* lo_out, int* hi_out) {
  int lo[3] = {255, 255, 255}, hi[3] = {0, 0, 0};
  for (uint32_t p : b.px) {
    int c[3] = {int(p >> 16 & 0xff), int(p >> 8 & 0xff), int(p & 0xff)};
    for (int a = 0; a < 3; ++a) {
      lo[a] = std::min(lo[a], c[a]);
      hi[a] = std::max(hi[a], c[a]);
    }
  }
  int axis = 0, best = -1;
  for (int a = 0; a < 3; ++a) {
    if (hi[a] - lo[a] > best) {
      best = hi[a] - lo[a];
      axis = a;
    }
  }
  *lo_out = lo[axis];
  *hi_out = hi[axis];
  return axis;
}

void median_cut(const uint8_t* rgb, size_t npx, int stride,
                uint8_t palette[256][3], int* n_colors) {
  Box root;
  root.px.reserve(npx / stride + 1);
  for (size_t i = 0; i < npx; i += stride) {
    const uint8_t* p = rgb + 3 * i;
    root.px.push_back(uint32_t(p[0]) << 16 | uint32_t(p[1]) << 8 | p[2]);
  }
  std::vector<Box> boxes;
  boxes.push_back(std::move(root));
  while (boxes.size() < 256) {
    // split the box with the widest axis range and >1 distinct pixel
    int best = -1, best_range = 0;
    for (size_t i = 0; i < boxes.size(); ++i) {
      if (boxes[i].px.size() < 2) continue;
      int lo, hi;
      longest_axis(boxes[i], &lo, &hi);
      if (hi - lo > best_range) {
        best_range = hi - lo;
        best = int(i);
      }
    }
    if (best < 0 || best_range == 0) break;
    Box& b = boxes[best];
    int lo, hi;
    int axis = longest_axis(b, &lo, &hi);
    int shift = axis == 0 ? 16 : axis == 1 ? 8 : 0;
    std::nth_element(b.px.begin(), b.px.begin() + b.px.size() / 2,
                     b.px.end(), [shift](uint32_t a, uint32_t c) {
                       return (a >> shift & 0xff) < (c >> shift & 0xff);
                     });
    Box nb;
    nb.px.assign(b.px.begin() + b.px.size() / 2, b.px.end());
    b.px.resize(b.px.size() / 2);
    boxes.push_back(std::move(nb));
  }
  *n_colors = int(boxes.size());
  for (size_t i = 0; i < boxes.size(); ++i) {
    uint64_t s[3] = {0, 0, 0};
    for (uint32_t p : boxes[i].px) {
      s[0] += p >> 16 & 0xff;
      s[1] += p >> 8 & 0xff;
      s[2] += p & 0xff;
    }
    size_t n = std::max<size_t>(1, boxes[i].px.size());
    palette[i][0] = uint8_t(s[0] / n);
    palette[i][1] = uint8_t(s[1] / n);
    palette[i][2] = uint8_t(s[2] / n);
  }
}

void build_lut(const uint8_t palette[256][3], int n_colors,
               uint8_t lut[32768]) {
  for (int r = 0; r < 32; ++r)
    for (int g = 0; g < 32; ++g)
      for (int b = 0; b < 32; ++b) {
        int rr = r << 3 | r >> 2, gg = g << 3 | g >> 2, bb = b << 3 | b >> 2;
        int best = 0, bd = 1 << 30;
        for (int i = 0; i < n_colors; ++i) {
          int dr = rr - palette[i][0], dg = gg - palette[i][1],
              db = bb - palette[i][2];
          int d = dr * dr + dg * dg + db * db;
          if (d < bd) {
            bd = d;
            best = i;
          }
        }
        lut[r << 10 | g << 5 | b] = uint8_t(best);
      }
}

// ---------------------------------------------------------------------------
// GIF LZW encode (variable-width codes, 4096-entry dict)
// ---------------------------------------------------------------------------

class BitWriter {
 public:
  explicit BitWriter(Buf* out) : out_(out) {}
  void put(uint32_t code, int width) {
    acc_ |= uint64_t(code) << nbits_;
    nbits_ += width;
    while (nbits_ >= 8) {
      block_[blen_++] = uint8_t(acc_ & 0xff);
      acc_ >>= 8;
      nbits_ -= 8;
      if (blen_ == 255) flush_block();
    }
  }
  void finish() {
    if (nbits_ > 0) {
      block_[blen_++] = uint8_t(acc_ & 0xff);
      if (blen_ == 255) flush_block();
    }
    if (blen_) flush_block();
    out_->u8(0);  // block terminator
  }

 private:
  void flush_block() {
    out_->u8(uint8_t(blen_));
    out_->bytes(block_, blen_);
    blen_ = 0;
  }
  Buf* out_;
  uint64_t acc_ = 0;
  int nbits_ = 0;
  uint8_t block_[255];
  int blen_ = 0;
};

void lzw_encode(const uint8_t* idx, size_t n, int min_code_size, Buf* out) {
  out->u8(uint8_t(min_code_size));
  BitWriter bw(out);
  const int clear = 1 << min_code_size, eoi = clear + 1;
  // dict: 4096 x 256 transition table (prev_code, symbol) -> code
  std::vector<int16_t> next(4096 * 256);
  auto reset = [&] { std::fill(next.begin(), next.end(), int16_t(-1)); };
  reset();
  int width = min_code_size + 1, ncodes = eoi + 1;
  bw.put(clear, width);
  if (n == 0) {
    bw.put(eoi, width);
    bw.finish();
    return;
  }
  int cur = idx[0];
  for (size_t i = 1; i < n; ++i) {
    uint8_t s = idx[i];
    int16_t& slot = next[size_t(cur) * 256 + s];
    if (slot >= 0) {
      cur = slot;
      continue;
    }
    bw.put(uint32_t(cur), width);
    if (ncodes < 4096) {
      slot = int16_t(ncodes++);
      if (ncodes - 1 == (1 << width) && width < 12) ++width;
    } else {
      bw.put(clear, width);
      reset();
      width = min_code_size + 1;
      ncodes = eoi + 1;
    }
    cur = s;
  }
  bw.put(uint32_t(cur), width);
  bw.put(eoi, width);
  bw.finish();
}

// ---------------------------------------------------------------------------
// GIF LZW decode
// ---------------------------------------------------------------------------

bool lzw_decode(const uint8_t* data, size_t len, size_t* pos,
                int min_code_size, std::vector<uint8_t>* out) {
  // gather sub-blocks
  std::vector<uint8_t> stream;
  while (*pos < len) {
    uint8_t blen = data[(*pos)++];
    if (blen == 0) break;
    if (*pos + blen > len) return false;
    stream.insert(stream.end(), data + *pos, data + *pos + blen);
    *pos += blen;
  }
  const int clear = 1 << min_code_size, eoi = clear + 1;
  std::vector<int> prefix(4096, -1);
  std::vector<uint8_t> suffix(4096), first(4096);
  int ncodes, width;
  auto reset = [&] {
    ncodes = eoi + 1;
    width = min_code_size + 1;
    for (int i = 0; i < clear; ++i) {
      suffix[i] = uint8_t(i);
      first[i] = uint8_t(i);
      prefix[i] = -1;
    }
  };
  reset();
  uint64_t acc = 0;
  int nbits = 0;
  size_t sp = 0;
  int prev = -1;
  std::vector<uint8_t> stack;
  while (true) {
    while (nbits < width && sp < stream.size()) {
      acc |= uint64_t(stream[sp++]) << nbits;
      nbits += 8;
    }
    if (nbits < width) break;
    int code = int(acc & ((1u << width) - 1));
    acc >>= width;
    nbits -= width;
    if (code == clear) {
      reset();
      prev = -1;
      continue;
    }
    if (code == eoi) break;
    if (prev < 0) {
      if (code >= ncodes) return false;
      out->push_back(suffix[code]);
      prev = code;
      continue;
    }
    int entry = code;
    if (code >= ncodes) {  // KwKwK case
      if (code > ncodes) return false;
      stack.push_back(first[prev]);
      entry = prev;
    }
    while (entry >= 0) {
      stack.push_back(suffix[entry]);
      entry = prefix[entry];
    }
    for (size_t i = stack.size(); i > 0; --i) out->push_back(stack[i - 1]);
    uint8_t fc = stack.back();
    stack.clear();
    if (ncodes < 4096) {
      prefix[ncodes] = prev;
      suffix[ncodes] = fc;
      first[ncodes] = first[prev];
      ++ncodes;
      if (ncodes == (1 << width) && width < 12) ++width;
    }
    prev = code;
  }
  return true;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// frames: [n, h, w, 3] uint8. Returns malloc'd GIF bytes via *out
// (caller frees with neurons_free), length via *out_len. 0 on success.
int gif_encode(const uint8_t* frames, int n, int h, int w, int delay_ms,
               int threads, uint8_t** out, int64_t* out_len) {
  if (n <= 0 || h <= 0 || w <= 0) return 1;
  const size_t fpx = size_t(h) * w;
  uint8_t palette[256][3];
  int n_colors = 0;
  // palette from a pixel sample across all frames
  size_t total = fpx * size_t(n);
  int stride = int(std::max<size_t>(1, total / 65536));
  median_cut(frames, total, stride, palette, &n_colors);
  std::vector<uint8_t> lut(32768);
  build_lut(palette, n_colors, lut.data());

  // index + LZW-compress frames in parallel
  std::vector<Buf> comp(n);
  parallel_for(n, threads, [&](int f) {
    std::vector<uint8_t> idx(fpx);
    const uint8_t* src = frames + f * fpx * 3;
    for (size_t i = 0; i < fpx; ++i) {
      const uint8_t* p = src + 3 * i;
      idx[i] = lut[(p[0] >> 3) << 10 | (p[1] >> 3) << 5 | (p[2] >> 3)];
    }
    lzw_encode(idx.data(), fpx, 8, &comp[f]);
  });

  Buf g;
  g.bytes("GIF89a", 6);
  g.u16(uint16_t(w));
  g.u16(uint16_t(h));
  g.u8(0xF7);  // global palette, 256 colors, 8-bit
  g.u8(0);     // background
  g.u8(0);     // aspect
  for (int i = 0; i < 256; ++i) {
    if (i < n_colors)
      g.bytes(palette[i], 3);
    else {
      g.u8(0);
      g.u8(0);
      g.u8(0);
    }
  }
  // NETSCAPE loop extension
  g.u8(0x21);
  g.u8(0xFF);
  g.u8(11);
  g.bytes("NETSCAPE2.0", 11);
  g.u8(3);
  g.u8(1);
  g.u16(0);  // loop forever
  g.u8(0);
  for (int f = 0; f < n; ++f) {
    g.u8(0x21);  // graphic control
    g.u8(0xF9);
    g.u8(4);
    g.u8(0x04);  // disposal: do not dispose
    g.u16(uint16_t(delay_ms / 10));
    g.u8(0);  // no transparency
    g.u8(0);
    g.u8(0x2C);  // image descriptor
    g.u16(0);
    g.u16(0);
    g.u16(uint16_t(w));
    g.u16(uint16_t(h));
    g.u8(0);  // no local palette, not interlaced
    g.bytes(comp[f].d.data(), comp[f].d.size());
  }
  g.u8(0x3B);  // trailer

  uint8_t* mem = static_cast<uint8_t*>(malloc(g.d.size()));
  if (!mem) return 2;
  memcpy(mem, g.d.data(), g.d.size());
  *out = mem;
  *out_len = int64_t(g.d.size());
  return 0;
}

// Decode a GIF into [n, h, w, 3] uint8. Two-call protocol: pass
// out=nullptr to query (*n/*h/*w set), then call again with a buffer of
// n*h*w*3 bytes. Returns 0 on success.
int gif_decode(const uint8_t* data, int64_t len, int* n, int* h, int* w,
               uint8_t* out) {
  if (len < 13 || memcmp(data, "GIF8", 4) != 0) return 1;
  int W = data[6] | data[7] << 8, H = data[8] | data[9] << 8;
  uint8_t flags = data[10];
  size_t pos = 13;
  uint8_t gpal[256][3] = {};
  if (flags & 0x80) {
    int gsize = 2 << (flags & 7);
    for (int i = 0; i < gsize && pos + 3 <= size_t(len); ++i) {
      gpal[i][0] = data[pos];
      gpal[i][1] = data[pos + 1];
      gpal[i][2] = data[pos + 2];
      pos += 3;
    }
  }
  int frame = 0;
  int transparent = -1;
  std::vector<uint8_t> canvas(size_t(W) * H * 3, 0);
  while (pos < size_t(len)) {
    uint8_t b = data[pos++];
    if (b == 0x3B) break;  // trailer
    if (b == 0x21) {       // extension
      if (pos >= size_t(len)) return 1;
      uint8_t label = data[pos++];
      if (label == 0xF9 && pos + 6 <= size_t(len)) {
        uint8_t sz = data[pos];
        uint8_t gflags = data[pos + 1];
        transparent = (gflags & 1) ? data[pos + 4] : -1;
        pos += sz + 1;
        if (pos < size_t(len) && data[pos] == 0) ++pos;
      } else {
        while (pos < size_t(len)) {  // skip sub-blocks
          uint8_t blen = data[pos++];
          if (blen == 0) break;
          pos += blen;
        }
      }
      continue;
    }
    if (b != 0x2C) return 1;  // image descriptor expected
    if (pos + 9 > size_t(len)) return 1;
    int ix = data[pos] | data[pos + 1] << 8;
    int iy = data[pos + 2] | data[pos + 3] << 8;
    int iw = data[pos + 4] | data[pos + 5] << 8;
    int ih = data[pos + 6] | data[pos + 7] << 8;
    uint8_t iflags = data[pos + 8];
    pos += 9;
    uint8_t lpal[256][3];
    const uint8_t(*pal)[3] = gpal;
    if (iflags & 0x80) {
      int lsize = 2 << (iflags & 7);
      for (int i = 0; i < lsize && pos + 3 <= size_t(len); ++i) {
        lpal[i][0] = data[pos];
        lpal[i][1] = data[pos + 1];
        lpal[i][2] = data[pos + 2];
        pos += 3;
      }
      pal = lpal;
    }
    if (pos >= size_t(len)) return 1;
    int mcs = data[pos++];
    if (!out) {  // counting pass: walk the sub-blocks, skip the LZW work
      (void)mcs;
      while (pos < size_t(len)) {
        uint8_t blen = data[pos++];
        if (blen == 0) break;
        pos += blen;
      }
      ++frame;
      continue;
    }
    std::vector<uint8_t> idx;
    idx.reserve(size_t(iw) * ih);
    if (!lzw_decode(data, size_t(len), &pos, mcs, &idx)) return 1;
    if (idx.size() < size_t(iw) * ih) return 1;
    if (iflags & 0x40) return 1;  // interlaced: unsupported fast path
    for (int y = 0; y < ih; ++y)
      for (int x = 0; x < iw; ++x) {
        int v = idx[size_t(y) * iw + x];
        if (v == transparent) continue;
        int cy = iy + y, cx = ix + x;
        if (cy >= H || cx >= W) continue;
        uint8_t* dst = canvas.data() + (size_t(cy) * W + cx) * 3;
        dst[0] = pal[v][0];
        dst[1] = pal[v][1];
        dst[2] = pal[v][2];
      }
    memcpy(out + size_t(frame) * W * H * 3, canvas.data(), canvas.size());
    ++frame;
  }
  *n = frame;
  *h = H;
  *w = W;
  return 0;
}

void neurons_free(void* p) { free(p); }

// Thread-pooled pread of n file regions into caller buffers.
// Returns number of failed reads (0 == all ok).
int parallel_read(const char** paths, const int64_t* offsets,
                  const int64_t* sizes, uint8_t** dests, int n,
                  int threads) {
  std::atomic<int> failed{0};
  parallel_for(n, threads, [&](int i) {
    int fd = open(paths[i], O_RDONLY);
    if (fd < 0) {
      failed.fetch_add(1);
      return;
    }
    int64_t off = offsets[i], remain = sizes[i];
    uint8_t* dst = dests[i];
    while (remain > 0) {
      ssize_t r = pread(fd, dst, size_t(remain), off);
      if (r <= 0) {
        failed.fetch_add(1);
        break;
      }
      dst += r;
      off += r;
      remain -= r;
    }
    close(fd);
  });
  return failed.load();
}

}  // extern "C"
