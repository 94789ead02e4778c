// Native host-side destuffer.
//
// Removes 0xFF00 byte stuffing and restart markers from a JPEG scan body
// and compacts each restart segment into the subsequence-aligned (128-byte,
// zero-padded) device layout — the same output the device destuff stage
// produces (cf. reference decode_destuff.cu:75-113, reimplemented for the
// host because byte-granular scatter is not TPU-native).
//
// Single pass, memchr-driven (like the reference host parser's segment walk,
// reader.cpp:450-487), ~1 GB/s.
//
// Build: cc -O3 -shared -fPIC destuff.cpp -o libjpeggpu_host.so

#include <cstdint>
#include <cstring>

namespace {
constexpr int kSubseqBytes = 128;
}

extern "C" {

// Destuff scan bytes into `out` (caller-zeroed, num_subseq*128 bytes).
// seg_sub_offset: per-segment subsequence offset (host-parsed, num_segments
// entries). Returns the number of segments actually consumed, or -1 if the
// output layout would be violated (inconsistent with the parsed geometry).
int64_t jpeggpu_destuff(const uint8_t* scan, int64_t scan_size,
                        const int32_t* seg_sub_offset, int64_t num_segments,
                        uint8_t* out, int64_t out_size) {
  if (num_segments <= 0) return 0;
  int64_t seg = 0;
  uint8_t* dst = out + static_cast<int64_t>(seg_sub_offset[0]) * kSubseqBytes;
  const uint8_t* src = scan;
  const uint8_t* end = scan + scan_size;
  const uint8_t* out_end = out + out_size;
  while (src < end) {
    const uint8_t* ff =
        static_cast<const uint8_t*>(memchr(src, 0xFF, end - src));
    if (ff == nullptr) ff = end;
    int64_t run = ff - src;
    if (dst + run > out_end) return -1;
    memcpy(dst, src, run);
    dst += run;
    src = ff;
    if (src >= end) break;
    // src points at 0xFF; look at the byte after it
    if (src + 1 >= end) break;  // dangling 0xFF: treated as scan end
    uint8_t m = src[1];
    if (m == 0x00) {
      if (dst + 1 > out_end) return -1;
      *dst++ = 0xFF;  // stuffed literal 0xFF
      src += 2;
    } else if (m >= 0xD0 && m <= 0xD7) {
      // restart marker: next segment starts subsequence-aligned
      ++seg;
      if (seg >= num_segments) return seg;  // trailing marker, done
      dst = out + static_cast<int64_t>(seg_sub_offset[seg]) * kSubseqBytes;
      src += 2;
    } else {
      break;  // any other marker terminates the scan
    }
  }
  return seg + 1;
}

}  // extern "C"
