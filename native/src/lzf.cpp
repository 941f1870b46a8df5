/* LZF block compression — stream-compatible with liblzf, which PCL uses for
 * `DATA binary_compressed` PCD payloads (the reference reads/writes those via
 * pcl::io::loadPCDFile / savePCDFile, cloudIO.cpp usage at app.cpp:269).
 *
 * Re-implemented from the stream format:
 *   ctrl < 0x20            literal run of ctrl+1 bytes
 *   ctrl >= 0x20           back-reference: len = (ctrl >> 5) + 2, with an
 *                          extension byte when ctrl >> 5 == 7 (len += ext);
 *                          offset = ((ctrl & 0x1f) << 8 | next) + 1 behind
 *                          the current output position. Copies may overlap.
 */
#include "aicp_native.h"

#include <algorithm>
#include <cstring>
#include <vector>

namespace {
constexpr long kHashBits = 14;
constexpr long kHashSize = 1L << kHashBits;
constexpr long kMaxOffset = 0x1fff;  // 13-bit offset field
constexpr long kMaxMatch = 264;      // 7 + 255 + 2
}  // namespace

extern "C" {

long aicp_lzf_compress(const unsigned char* in, long in_len,
                       unsigned char* out, long out_cap) {
  std::vector<long> htab(kHashSize, -1);
  long i = 0, o = 0, lit_start = 0;

  auto flush_literals = [&](long end) -> bool {
    for (long k = lit_start; k < end;) {
      long run = std::min<long>(32, end - k);
      if (o + 1 + run > out_cap) return false;
      out[o++] = static_cast<unsigned char>(run - 1);
      std::memcpy(out + o, in + k, static_cast<size_t>(run));
      o += run;
      k += run;
    }
    return true;
  };

  while (i + 2 < in_len) {
    unsigned h = (static_cast<unsigned>(in[i]) << 16) |
                 (static_cast<unsigned>(in[i + 1]) << 8) | in[i + 2];
    h = (h * 2654435761u) >> (32 - kHashBits);
    long cand = htab[h & (kHashSize - 1)];
    htab[h & (kHashSize - 1)] = i;
    long off = i - cand - 1;
    if (cand >= 0 && off <= kMaxOffset && in[cand] == in[i] &&
        in[cand + 1] == in[i + 1] && in[cand + 2] == in[i + 2]) {
      long max_len = std::min<long>(in_len - i, kMaxMatch);
      long len = 3;
      while (len < max_len && in[cand + len] == in[i + len]) len++;
      if (!flush_literals(i)) return -1;
      long l = len - 2;
      if (l < 7) {
        if (o + 2 > out_cap) return -1;
        out[o++] = static_cast<unsigned char>((l << 5) | (off >> 8));
      } else {
        if (o + 3 > out_cap) return -1;
        out[o++] = static_cast<unsigned char>((7 << 5) | (off >> 8));
        out[o++] = static_cast<unsigned char>(l - 7);
      }
      out[o++] = static_cast<unsigned char>(off & 0xff);
      i += len;
      lit_start = i;
    } else {
      i++;
    }
  }
  if (!flush_literals(in_len)) return -1;
  return o;
}

long aicp_lzf_decompress(const unsigned char* in, long in_len,
                         unsigned char* out, long out_cap) {
  long i = 0, o = 0;
  while (i < in_len) {
    unsigned ctrl = in[i++];
    if (ctrl < 0x20) {
      long run = static_cast<long>(ctrl) + 1;
      if (i + run > in_len || o + run > out_cap) return -1;
      std::memcpy(out + o, in + i, static_cast<size_t>(run));
      i += run;
      o += run;
    } else {
      long len = ctrl >> 5;
      if (len == 7) {
        if (i >= in_len) return -1;
        len += in[i++];
      }
      len += 2;
      if (i >= in_len) return -1;
      long off = ((static_cast<long>(ctrl) & 0x1f) << 8) | in[i++];
      long ref = o - off - 1;
      if (ref < 0 || o + len > out_cap) return -1;
      // byte-wise: back-references may overlap the output being written
      for (long k = 0; k < len; k++) out[o + k] = out[ref + k];
      o += len;
    }
  }
  return o;
}

}  // extern "C"
