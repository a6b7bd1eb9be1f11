// bsjpeg: baseline-JPEG *entropy* decoder for the device-side MJPG path.
//
// MJPG webcams (negotiated via -f MJPG, reference app/deepseg.cc:543-570)
// deliver one baseline JPEG per frame.  The reference decodes them fully on
// the host (OpenCV/libjpeg inside cv::VideoCapture).  TPU-first, the only
// part that is inherently serial bit-twiddling is the Huffman entropy
// decode; everything downstream (dequantize, 8x8 IDCT, chroma upsample,
// YCbCr->BGR) is dense math that belongs on the device, fused into the
// frame program (backscrub_tpu/pipeline/jpeg.py).
//
// This file therefore implements ONLY: marker parse + Huffman decode to
// quantized DCT coefficients, de-zigzagged into natural 8x8 order, laid out
// as (blocks_h, blocks_w, 64) int16 per component — a static-shape tensor
// the Python side uploads straight to HBM.
//
// Supported: baseline sequential DCT (SOF0/SOF1), 8-bit, 1 or 3 components,
// interleaved single scan or per-component scans, restart markers, missing
// DHT (MJPEG streams commonly omit tables; ITU T.81 Annex K defaults are
// installed, same as libjpeg-turbo's MJPEG handling).
// Not supported (negative return): progressive (SOF2), arithmetic coding,
// 12-bit precision, 4-component CMYK.
//
// C ABI only; consumed via ctypes from backscrub_tpu/io/jpeg.py.

#include <cstdint>
#include <cstring>
#if defined(__SSE2__) || defined(_M_X64) || defined(__x86_64__)
#include <emmintrin.h>
#endif

#include "bsjpeg.h"  // shared struct layout / error codes / prototypes

#define BSJPEG_API extern "C" __attribute__((visibility("default")))

// zigzag index -> natural index
static const uint8_t kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

// ---- ITU T.81 Annex K default Huffman tables (public spec constants) -------
static const uint8_t kDcLumBits[17] = {0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0};
static const uint8_t kDcLumVals[12] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11};
static const uint8_t kDcChrBits[17] = {0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0};
static const uint8_t kDcChrVals[12] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11};
static const uint8_t kAcLumBits[17] = {0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d};
static const uint8_t kAcLumVals[162] = {
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa};
static const uint8_t kAcChrBits[17] = {0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77};
static const uint8_t kAcChrVals[162] = {
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa};

// ---- canonical Huffman table with 8-bit lookahead ---------------------------
struct HuffTable {
  bool present = false;
  // canonical decode state (ITU T.81 F.2.2.3)
  int32_t maxcode[18];   // -1 when no codes of this length
  int32_t mincode[17];
  int32_t valptr[17];
  uint8_t vals[256];
  // fast path: first 8 bits -> (value, code length); len==0 means slow path
  uint8_t lut_val[256];
  uint8_t lut_len[256];

  // bits[1..16] = count of codes per length
  bool build(const uint8_t bits[17], const uint8_t* values, int nvals) {
    present = true;
    if (nvals > 256) return false;
    std::memcpy(vals, values, nvals);
    int code = 0, k = 0;
    std::memset(lut_len, 0, sizeof lut_len);
    for (int l = 1; l <= 16; l++) {
      valptr[l] = k;
      mincode[l] = code;
      int n = bits[l];
      if (k + n > nvals) return false;
      if (n) {
        if (l <= 8) {
          for (int i = 0; i < n; i++, code++, k++) {
            // every 8-bit string with this prefix decodes to vals[k]
            int shift = 8 - l;
            for (int rest = 0; rest < (1 << shift); rest++) {
              int idx = (code << shift) | rest;
              if (idx > 255) return false;
              lut_val[idx] = vals[k];
              lut_len[idx] = (uint8_t)l;
            }
          }
        } else {
          code += n;
          k += n;
        }
        maxcode[l] = code - 1;
      } else {
        maxcode[l] = -1;
      }
      if (code > (1 << l)) return false;  // over-subscribed table
      code <<= 1;
    }
    maxcode[17] = 0x7fffffff;  // sentinel: decode loop always terminates
    return true;
  }
};

// ---- stuffed-byte bit reader ------------------------------------------------
// 64-bit MSB-aligned bit buffer.  The refill has a fast path that loads 4
// plain bytes at once (no 0xFF anywhere — the overwhelmingly common case)
// and a byte-wise slow path handling 0xFF00 stuffing and marker latch.
struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  uint64_t buf = 0;   // top `cnt` bits valid
  int cnt = 0;
  bool at_marker = false;  // hit 0xFF <marker>; feeding zero bits since then

  BitReader(const uint8_t* p_, const uint8_t* end_) : p(p_), end(end_) {}

  // Refill to at least 32 valid bits (callers never need more than 24 at
  // once: 16-bit symbol window + 16 value bits fit in two calls).
  // On a real marker, latch at_marker and feed zeros (T.81 F.2.2.5 allows
  // the final blocks to complete off padded bits, same as libjpeg).
  void refill() {
    while (cnt <= 32) {
      if (!at_marker && end - p >= 4) {
        uint32_t w = ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
                     ((uint32_t)p[2] << 8) | (uint32_t)p[3];
        // SWAR: no byte == 0xFF anywhere -> no stuffing/markers possible
        uint32_t t = ~w;
        if (((t - 0x01010101u) & ~t & 0x80808080u) == 0) {
          p += 4;
          buf |= (uint64_t)w << (32 - cnt);
          cnt += 32;
          break;
        }
      }
      uint64_t b = 0;
      if (!at_marker && p < end) {
        b = *p;
        if (b == 0xFF) {
          const uint8_t* q = p + 1;
          while (q < end && *q == 0xFF) q++;  // fill bytes before a marker
          if (q < end && *q == 0x00) {
            p = q + 1;  // stuffed literal 0xFF
          } else {
            at_marker = true;  // leave p at the 0xFF; caller resyncs
            b = 0;
          }
        } else {
          p++;
        }
      }
      buf |= b << (56 - cnt);
      cnt += 8;
    }
  }

  inline void ensure(int n) {
    if (cnt < n) refill();
  }

  inline uint32_t peek(int n) const { return (uint32_t)(buf >> (64 - n)); }

  inline void consume(int n) {
    buf <<= n;
    cnt -= n;
  }

  inline int32_t receive(int n) {  // n in [0,16]
    if (n == 0) return 0;
    ensure(n);
    int32_t v = (int32_t)(buf >> (64 - n));
    consume(n);
    return v;
  }

  // receive() without the ensure — caller guarantees bits are buffered
  inline int32_t receive_ne(int n) {
    if (n == 0) return 0;
    int32_t v = (int32_t)(buf >> (64 - n));
    consume(n);
    return v;
  }

  // Decode one Huffman symbol; caller ensured >= 16 bits buffered.
  // Returns -1 on a corrupt code.
  inline int decode_ne(const HuffTable& t) {
    uint32_t look = peek(8);
    int l = t.lut_len[look];
    if (l) {
      consume(l);
      return t.lut_val[look];
    }
    // codes longer than 8 bits: walk lengths against the 16-bit window
    // (F.2.2.3, but without per-bit consumption)
    uint32_t w = peek(16);
    for (l = 9; l <= 16; l++) {
      int32_t code = (int32_t)(w >> (16 - l));
      if (code <= t.maxcode[l]) {
        consume(l);
        return t.vals[t.valptr[l] + code - t.mincode[l]];
      }
    }
    return -1;
  }

  inline int decode(const HuffTable& t) {
    ensure(16);
    return decode_ne(t);
  }

  // Reset at a restart marker: drop buffered bits and scan forward for
  // FF Dn.  p may lag the marker (refill buffers ahead), but the bytes in
  // between are entropy/padding data, which can never contain a raw
  // FF D0..D7 (any 0xFF in entropy data is stuffed as FF 00) — so the
  // first match IS the restart marker.
  bool sync_restart() {
    buf = 0;
    cnt = 0;
    at_marker = false;
    while (p + 1 < end) {
      if (p[0] == 0xFF && p[1] >= 0xD0 && p[1] <= 0xD7) {
        p += 2;
        return true;
      }
      p++;
    }
    return false;
  }
};

// EXTEND (T.81 F.2.2.1): map a `t`-bit magnitude to its signed value.
static inline int32_t extend(int32_t v, int t) {
  return (t && v < (1 << (t - 1))) ? v - (1 << t) + 1 : v;
}

// ---- parser state -----------------------------------------------------------
struct Parser {
  const uint8_t* data;
  int64_t len;
  int64_t pos = 0;

  // tables seen so far
  uint16_t qt[4][64];     // natural order
  bool qt_seen[4] = {false, false, false, false};
  HuffTable huff_dc[4], huff_ac[4];

  // frame
  int width = 0, height = 0, ncomp = 0;
  int comp_id[3], comp_h[3], comp_v[3], comp_tq[3];
  int restart_interval = 0;
  bool have_sof = false;

  // scan (filled by each SOS)
  int ns = 0;
  int scan_comp[3];  // index into frame comps
  int scan_dc[3], scan_ac[3];
  int64_t scan_data = 0;  // offset of entropy data after SOS header

  int u8() { return pos < len ? data[pos++] : -1; }
  int u16() {
    if (pos + 2 > len) { pos = len; return -1; }
    int v = (data[pos] << 8) | data[pos + 1];
    pos += 2;
    return v;
  }

  // Parse markers up to and including the next SOS header (entropy data
  // position stored in scan_data).  Returns BSJPEG_OK, a negative error,
  // or 1 at EOI (no more scans).
  int parse_to_scan() {
    for (;;) {
      // find next marker
      int b = u8();
      if (b < 0) return BSJPEG_ERR_TRUNCATED;
      if (b != 0xFF) continue;  // tolerate garbage between segments
      int m;
      do { m = u8(); } while (m == 0xFF);  // fill bytes
      if (m < 0) return BSJPEG_ERR_TRUNCATED;
      if (m == 0x00) continue;            // stuffed byte (stray entropy data)
      if (m == 0xD8) continue;            // SOI
      if (m == 0xD9) return 1;            // EOI
      if (m >= 0xD0 && m <= 0xD7) continue;  // stray RST
      // all remaining markers carry a length
      int seglen = u16();
      if (seglen < 2 || pos + seglen - 2 > len) return BSJPEG_ERR_TRUNCATED;
      int64_t segend = pos + seglen - 2;
      switch (m) {
        case 0xC0: case 0xC1: {  // SOF0 baseline / SOF1 extended sequential
          int prec = u8();
          if (prec != 8) return BSJPEG_ERR_UNSUPPORTED;
          height = u16();
          width = u16();
          ncomp = u8();
          if (ncomp != 1 && ncomp != 3) return BSJPEG_ERR_UNSUPPORTED;
          if (width <= 0 || height <= 0) return BSJPEG_ERR_CORRUPT;
          // sanity cap: bounds coefficient-buffer allocations against
          // hostile SOF dims (largest real MJPG streams are 4K)
          if (width > 16384 || height > 16384) return BSJPEG_ERR_UNSUPPORTED;
          for (int c = 0; c < ncomp; c++) {
            comp_id[c] = u8();
            int hv = u8();
            comp_h[c] = hv >> 4;
            comp_v[c] = hv & 15;
            comp_tq[c] = u8();
            if (comp_h[c] < 1 || comp_h[c] > 4 || comp_v[c] < 1 ||
                comp_v[c] > 4 || comp_tq[c] > 3)
              return BSJPEG_ERR_CORRUPT;
          }
          have_sof = true;
          break;
        }
        case 0xC2: case 0xC3: case 0xC5: case 0xC6: case 0xC7:
        case 0xC9: case 0xCA: case 0xCB: case 0xCD: case 0xCE: case 0xCF:
          return BSJPEG_ERR_UNSUPPORTED;  // progressive / lossless / arithmetic
        case 0xC4: {  // DHT
          while (pos < segend) {
            int tc_th = u8();
            int tc = tc_th >> 4, th = tc_th & 15;
            if (tc > 1 || th > 3) return BSJPEG_ERR_CORRUPT;
            uint8_t bits[17] = {0};
            int total = 0;
            for (int l = 1; l <= 16; l++) {
              int n = u8();
              if (n < 0) return BSJPEG_ERR_TRUNCATED;
              bits[l] = (uint8_t)n;
              total += n;
            }
            if (total > 256 || pos + total > segend) return BSJPEG_ERR_CORRUPT;
            HuffTable& t = tc ? huff_ac[th] : huff_dc[th];
            if (!t.build(bits, data + pos, total)) return BSJPEG_ERR_CORRUPT;
            pos += total;
          }
          break;
        }
        case 0xDB: {  // DQT
          while (pos < segend) {
            int pq_tq = u8();
            int pq = pq_tq >> 4, tq = pq_tq & 15;
            if (pq > 1 || tq > 3) return BSJPEG_ERR_CORRUPT;
            for (int i = 0; i < 64; i++) {
              int v = pq ? u16() : u8();
              if (v < 0) return BSJPEG_ERR_TRUNCATED;
              qt[tq][kZigzag[i]] = (uint16_t)v;
            }
            qt_seen[tq] = true;
          }
          break;
        }
        case 0xDD:  // DRI
          restart_interval = u16();
          break;
        case 0xDA: {  // SOS
          if (!have_sof) return BSJPEG_ERR_CORRUPT;
          ns = u8();
          if (ns < 1 || ns > 3) return BSJPEG_ERR_UNSUPPORTED;
          for (int s = 0; s < ns; s++) {
            int cid = u8();
            int tda = u8();
            int found = -1;
            for (int c = 0; c < ncomp; c++)
              if (comp_id[c] == cid) found = c;
            if (found < 0) return BSJPEG_ERR_CORRUPT;
            scan_comp[s] = found;
            scan_dc[s] = tda >> 4;
            scan_ac[s] = tda & 15;
            if (scan_dc[s] > 3 || scan_ac[s] > 3) return BSJPEG_ERR_CORRUPT;
          }
          u8(); u8(); u8();  // Ss, Se, Ah/Al (fixed for baseline)
          scan_data = pos;
          return BSJPEG_OK;
        }
        default:  // APPn, COM, anything else: skip
          break;
      }
      pos = segend;
    }
  }

  void install_default_huffman() {
    // MJPEG streams routinely omit DHT (the tables are "well known"); use
    // Annex K defaults exactly like libjpeg's MJPEG consumers do.
    if (!huff_dc[0].present) huff_dc[0].build(kDcLumBits, kDcLumVals, 12);
    if (!huff_dc[1].present) huff_dc[1].build(kDcChrBits, kDcChrVals, 12);
    if (!huff_ac[0].present) huff_ac[0].build(kAcLumBits, kAcLumVals, 162);
    if (!huff_ac[1].present) huff_ac[1].build(kAcChrBits, kAcChrVals, 162);
  }

  void geometry(int* hmax, int* vmax, int* mcus_x, int* mcus_y) const {
    int hm = 1, vm = 1;
    for (int c = 0; c < ncomp; c++) {
      if (comp_h[c] > hm) hm = comp_h[c];
      if (comp_v[c] > vm) vm = comp_v[c];
    }
    *hmax = hm;
    *vmax = vm;
    *mcus_x = (width + 8 * hm - 1) / (8 * hm);
    *mcus_y = (height + 8 * vm - 1) / (8 * vm);
  }
};

static int fill_info(const Parser& ps, bsjpeg_info_t* info) {
  std::memset(info, 0, sizeof *info);
  info->width = ps.width;
  info->height = ps.height;
  info->ncomp = ps.ncomp;
  info->restart_interval = ps.restart_interval;
  int hmax, vmax, mx, my;
  ps.geometry(&hmax, &vmax, &mx, &my);
  for (int c = 0; c < ps.ncomp; c++) {
    info->h[c] = ps.comp_h[c];
    info->v[c] = ps.comp_v[c];
    info->blocks_w[c] = mx * ps.comp_h[c];
    info->blocks_h[c] = my * ps.comp_v[c];
    if (!ps.qt_seen[ps.comp_tq[c]]) return BSJPEG_ERR_CORRUPT;
    std::memcpy(info->qtab[c], ps.qt[ps.comp_tq[c]], 64 * sizeof(uint16_t));
  }
  return BSJPEG_OK;
}

// Decode one 8x8 block into natural-order coefficients.  One ensure(32)
// per coefficient covers the worst case code(16) + value bits(<=15), so
// the symbol decode and value receive share a single refill check.
static int decode_block(BitReader& br, const HuffTable& dc, const HuffTable& ac,
                        int32_t* pred, int16_t* out /*64, zeroed*/) {
  br.ensure(32);
  int t = br.decode_ne(dc);
  if (t < 0 || t > 15) return BSJPEG_ERR_CORRUPT;
  *pred += extend(br.receive_ne(t), t);
  out[0] = (int16_t)*pred;
  for (int k = 1; k < 64;) {
    br.ensure(32);
    int rs = br.decode_ne(ac);
    if (rs < 0) return BSJPEG_ERR_CORRUPT;
    int r = rs >> 4, s = rs & 15;
    if (s == 0) {
      if (r != 15) break;  // EOB
      k += 16;             // ZRL
    } else {
      k += r;
      if (k > 63) return BSJPEG_ERR_CORRUPT;
      out[kZigzag[k]] = (int16_t)extend(br.receive_ne(s), s);
      k++;
    }
  }
  return BSJPEG_OK;
}

// ---- public API -------------------------------------------------------------

BSJPEG_API const char* bsjpeg_version() { return "bsjpeg 1.0"; }

BSJPEG_API int bsjpeg_parse(const uint8_t* data, int64_t len,
                            bsjpeg_info_t* info) {
  if (!data || !info || len < 4) return BSJPEG_ERR_BADARG;
  if (data[0] != 0xFF || data[1] != 0xD8) return BSJPEG_ERR_NOT_JPEG;
  Parser ps{data, len};
  int rc = ps.parse_to_scan();
  if (rc != BSJPEG_OK) return rc == 1 ? BSJPEG_ERR_CORRUPT : rc;
  return fill_info(ps, info);
}

// Full entropy decode.  `coef[c]` must hold blocks_h[c]*blocks_w[c]*64
// int16s (sized from a prior bsjpeg_parse of this stream); they are fully
// overwritten, laid out (blocks_h, blocks_w, 64) with each 64 in natural
// (row-major 8x8) order.  Values are RAW quantized coefficients — the
// device multiplies by qtab and runs the IDCT.
//
// `info` is IN/OUT: geometry in (verified against this frame — BADARG if
// the stream changed shape/sampling), fresh per-frame quant tables out.
// One call per frame does everything; no separate bsjpeg_parse needed
// after the first frame.
BSJPEG_API int bsjpeg_decode(const uint8_t* data, int64_t len,
                             bsjpeg_info_t* info, int16_t* coef0,
                             int16_t* coef1, int16_t* coef2) {
  if (!data || !info || !coef0) return BSJPEG_ERR_BADARG;
  if (info->ncomp == 3 && (!coef1 || !coef2)) return BSJPEG_ERR_BADARG;
  if (len < 4 || data[0] != 0xFF || data[1] != 0xD8) return BSJPEG_ERR_NOT_JPEG;
  Parser ps{data, len};
  int16_t* coef[3] = {coef0, coef1, coef2};

  // verify geometry still matches the caller's buffers, then zero them
  int rc = ps.parse_to_scan();
  if (rc != BSJPEG_OK) return rc == 1 ? BSJPEG_ERR_CORRUPT : rc;
  {
    bsjpeg_info_t now;
    int frc = fill_info(ps, &now);
    if (frc != BSJPEG_OK) return frc;
    if (now.width != info->width || now.height != info->height ||
        now.ncomp != info->ncomp)
      return BSJPEG_ERR_BADARG;
    for (int c = 0; c < now.ncomp; c++) {
      if (now.blocks_w[c] != info->blocks_w[c] ||
          now.blocks_h[c] != info->blocks_h[c] ||
          now.h[c] != info->h[c] || now.v[c] != info->v[c])
        return BSJPEG_ERR_BADARG;
      std::memset(coef[c], 0,
                  (size_t)now.blocks_w[c] * now.blocks_h[c] * 64 * sizeof(int16_t));
    }
    *info = now;  // fresh per-frame quant tables out
  }
  ps.install_default_huffman();

  int hmax, vmax, mcus_x, mcus_y;
  ps.geometry(&hmax, &vmax, &mcus_x, &mcus_y);

  // Scans: baseline is usually one interleaved scan; per-component scans
  // (Ns=1 each) also occur.  Loop until every frame component is covered.
  bool done[3] = {false, false, false};
  for (;;) {
    BitReader br(ps.data + ps.scan_data, ps.data + ps.len);
    int32_t pred[3] = {0, 0, 0};
    int interval = ps.restart_interval;
    int until_restart = interval ? interval : -1;

    if (ps.ns == 1) {
      // non-interleaved: MCU = one block, component's own block grid,
      // EXCLUDING the interleaved padding columns/rows (T.81 A.2.2)
      int c = ps.scan_comp[0];
      const HuffTable& dc = ps.huff_dc[ps.scan_dc[0]];
      const HuffTable& ac = ps.huff_ac[ps.scan_ac[0]];
      if (!dc.present || !ac.present) return BSJPEG_ERR_CORRUPT;
      int comp_w = (ps.width * ps.comp_h[c] + 8 * hmax - 1) / (8 * hmax);
      int comp_hh = (ps.height * ps.comp_v[c] + 8 * vmax - 1) / (8 * vmax);
      int stride = mcus_x * ps.comp_h[c];  // caller buffer row stride (blocks)
      for (int by = 0; by < comp_hh; by++) {
        for (int bx = 0; bx < comp_w; bx++) {
          if (until_restart == 0) {
            if (!br.sync_restart()) return BSJPEG_ERR_CORRUPT;
            pred[0] = pred[1] = pred[2] = 0;
            until_restart = interval;
          }
          int16_t* dst = coef[c] + ((int64_t)by * stride + bx) * 64;
          int brc = decode_block(br, dc, ac, &pred[0], dst);
          if (brc != BSJPEG_OK) return brc;
          if (until_restart > 0) until_restart--;
        }
      }
      done[c] = true;
    } else {
      for (int s = 0; s < ps.ns; s++) {
        int c = ps.scan_comp[s];
        if (!ps.huff_dc[ps.scan_dc[s]].present ||
            !ps.huff_ac[ps.scan_ac[s]].present)
          return BSJPEG_ERR_CORRUPT;
        done[c] = true;
      }
      for (int my = 0; my < mcus_y; my++) {
        for (int mx = 0; mx < mcus_x; mx++) {
          if (until_restart == 0) {
            if (!br.sync_restart()) return BSJPEG_ERR_CORRUPT;
            pred[0] = pred[1] = pred[2] = 0;
            until_restart = interval;
          }
          for (int s = 0; s < ps.ns; s++) {
            int c = ps.scan_comp[s];
            const HuffTable& dc = ps.huff_dc[ps.scan_dc[s]];
            const HuffTable& ac = ps.huff_ac[ps.scan_ac[s]];
            int stride = mcus_x * ps.comp_h[c];
            for (int v = 0; v < ps.comp_v[c]; v++) {
              for (int h = 0; h < ps.comp_h[c]; h++) {
                int by = my * ps.comp_v[c] + v;
                int bx = mx * ps.comp_h[c] + h;
                int16_t* dst = coef[c] + ((int64_t)by * stride + bx) * 64;
                int brc = decode_block(br, dc, ac, &pred[s], dst);
                if (brc != BSJPEG_OK) return brc;
              }
            }
          }
          if (until_restart > 0) until_restart--;
        }
      }
    }

    bool all = true;
    for (int c = 0; c < ps.ncomp; c++) all = all && done[c];
    if (all) return BSJPEG_OK;

    // advance past this scan's entropy data to the next scan header
    ps.pos = (br.p - ps.data);
    int prc = ps.parse_to_scan();
    if (prc == 1) return BSJPEG_ERR_CORRUPT;  // EOI before all components
    if (prc != BSJPEG_OK) return prc;
  }
}

// ===========================================================================
// Encoder: quantized coefficients -> baseline JPEG stream (Huffman pack).
//
// The device produced the coefficients (pipeline/jpeg_enc.py: fixed-point
// color conversion, downsampling, islow FDCT, quantization — all bit-exact
// vs libjpeg); this side only does the bit-serial part: headers + Huffman.
// Header layout and table emission order mirror libjpeg's jcmarker.c
// (SOI, JFIF APP0, per-table DQT, SOF0, per-table DHT, SOS), and the
// entropy coding uses the ITU T.81 Annex K tables — so for matching
// coefficients the whole stream matches cv2.imencode (optimize=off).
// ===========================================================================

namespace {

struct BitWriter {
  // __restrict__: u8 stores otherwise alias the writer's own fields and
  // the coefficient data, forcing acc/bits/n reloads around every byte —
  // measured ~2x on the 720p pack.
  uint8_t* __restrict__ out;
  int64_t cap;
  int64_t n = 0;
  uint64_t acc = 0;
  int bits = 0;

  void put_byte(uint8_t b) {
    if (n < cap) out[n] = b;
    n++;  // keep counting so the caller learns the needed size
  }
  void put16(uint16_t v) {
    put_byte((uint8_t)(v >> 8));
    put_byte((uint8_t)v);
  }
  // Per put_bits call len <= 27 (16-bit Huffman code + <=11 extend bits)
  // and the flush below keeps bits < 32, so acc never overflows 64 bits.
  inline void put_bits(uint32_t code, int len) {
    if (!len) return;
    acc = (acc << len) | (code & ((1u << len) - 1));
    bits += len;
    if (bits >= 32) {
      uint32_t w = (uint32_t)(acc >> (bits - 32));
      bits -= 32;
      // fast path: no 0xFF byte anywhere in the word -> no stuffing, one
      // big-endian store (SWAR zero-byte test on w ^ 0xFF...FF)
      uint32_t v = w ^ 0xFFFFFFFFu;
      if (((v - 0x01010101u) & ~v & 0x80808080u) == 0 && n + 4 <= cap) {
        uint32_t be = __builtin_bswap32(w);
        std::memcpy(out + n, &be, 4);
        n += 4;
      } else {
        for (int s = 24; s >= 0; s -= 8) {
          uint8_t b = (uint8_t)(w >> s);
          put_byte(b);
          if (b == 0xFF) put_byte(0x00);  // stuffing
        }
      }
    }
  }
  void flush_bits() {  // pad the last byte with 1-bits (T.81 F.1.2.3)
    while (bits >= 8) {
      uint8_t b = (uint8_t)(acc >> (bits - 8));
      put_byte(b);
      if (b == 0xFF) put_byte(0x00);
      bits -= 8;
    }
    if (bits) {
      uint8_t b = (uint8_t)((acc << (8 - bits)) | ((1u << (8 - bits)) - 1));
      put_byte(b);
      if (b == 0xFF) put_byte(0x00);
      bits = 0;
    }
  }
};

// canonical encode table: symbol -> (code, length)
struct EncTable {
  uint16_t code[256];
  uint8_t len[256];
  void build(const uint8_t bits[17], const uint8_t* vals, int nvals) {
    std::memset(len, 0, sizeof len);
    int c = 0, k = 0;
    for (int l = 1; l <= 16; l++) {
      for (int i = 0; i < bits[l] && k < nvals; i++, k++, c++) {
        code[vals[k]] = (uint16_t)c;
        len[vals[k]] = (uint8_t)l;
      }
      c <<= 1;
    }
  }
};

inline int bit_width(int v) {  // category of |v| (v >= 0)
  int n = 0;
  while (v) {
    v >>= 1;
    n++;
  }
  return n;
}

// Bit k set <=> blk[k] != 0, for 64 int16 (jchuff.c's zerobits trick,
// vectorized: compare-to-zero + pack + movemask, 4x16 lanes).
inline uint64_t nonzero_bitmap64(const int16_t* blk) {
#if defined(__SSE2__) || defined(_M_X64) || defined(__x86_64__)
  const __m128i zero = _mm_setzero_si128();
  uint64_t zb = 0;
  for (int i = 0; i < 64; i += 16) {
    __m128i a = _mm_loadu_si128((const __m128i*)(blk + i));
    __m128i b = _mm_loadu_si128((const __m128i*)(blk + i + 8));
    __m128i pk = _mm_packs_epi16(_mm_cmpeq_epi16(a, zero),
                                 _mm_cmpeq_epi16(b, zero));
    uint32_t m = (uint32_t)_mm_movemask_epi8(pk);  // 16 bits, 1 = zero lane
    zb |= (uint64_t)(~m & 0xFFFFu) << i;
  }
  return zb;
#else
  uint64_t zb = 0;
  for (int k = 0; k < 64; k++) zb |= (uint64_t)(blk[k] != 0) << k;
  return zb;
#endif
}

// `zz` is the block in ZIGZAG order (zz[k] = natural[kZigzag[k]]).
void encode_block(BitWriter& bw, const int16_t* zz, const EncTable& dc,
                  const EncTable& ac, int32_t* pred) {
  // DC: category + extend bits of the diff (T.81 F.1.2.1), one emission
  // (zigzag and natural order agree on index 0)
  int32_t diff = zz[0] - *pred;
  *pred = zz[0];
  int32_t t = diff < 0 ? -diff : diff;
  int nbits = bit_width(t);
  bw.put_bits(((uint32_t)dc.code[nbits] << nbits) |
                  ((uint32_t)(diff < 0 ? diff - 1 : diff) & ((1u << nbits) - 1)),
              dc.len[nbits] + nbits);
  // AC (T.81 F.1.2.2): nonzero bitmap, then only touch the set bits —
  // typical blocks have ~5-15 nonzero ACs out of 63.
  uint64_t zb = nonzero_bitmap64(zz) & ~1ull;
  int prev = 0;
  while (zb) {
    int k = __builtin_ctzll(zb);
    zb &= zb - 1;
    int run = k - prev - 1;
    prev = k;
    while (run > 15) {
      bw.put_bits(ac.code[0xF0], ac.len[0xF0]);  // ZRL
      run -= 16;
    }
    int32_t v = zz[k];
    int32_t a = v < 0 ? -v : v;
    int s = bit_width(a);
    int sym = (run << 4) | s;
    bw.put_bits(((uint32_t)ac.code[sym] << s) |
                    ((uint32_t)(v < 0 ? v - 1 : v) & ((1u << s) - 1)),
                ac.len[sym] + s);
  }
  if (prev != 63) bw.put_bits(ac.code[0x00], ac.len[0x00]);  // EOB
}

void emit_dqt(BitWriter& bw, int id, const uint16_t* qtab_natural) {
  bw.put_byte(0xFF);
  bw.put_byte(0xDB);
  bw.put16(2 + 1 + 64);
  bw.put_byte((uint8_t)id);  // Pq=0 (8-bit), Tq=id
  for (int i = 0; i < 64; i++)
    bw.put_byte((uint8_t)qtab_natural[kZigzag[i]]);
}

void emit_dht(BitWriter& bw, int cls, int id, const uint8_t bits[17],
              const uint8_t* vals) {
  int total = 0;
  for (int l = 1; l <= 16; l++) total += bits[l];
  bw.put_byte(0xFF);
  bw.put_byte(0xC4);
  bw.put16((uint16_t)(2 + 1 + 16 + total));
  bw.put_byte((uint8_t)((cls << 4) | id));
  for (int l = 1; l <= 16; l++) bw.put_byte(bits[l]);
  for (int i = 0; i < total; i++) bw.put_byte(vals[i]);
}

// `zz_order`: true = blocks already in zigzag order (the device emits this
// layout, pipeline/jpeg_enc.py order="zigzag" — no per-block gather here);
// false = natural order (bsjpeg_decode's layout), gathered per block.
static int64_t encode_impl(const bsjpeg_info_t* info, const int16_t* coef0,
                           const int16_t* coef1, const int16_t* coef2,
                           uint8_t* out, int64_t cap, bool zz_order) {
  if (!info || !coef0) return BSJPEG_ERR_BADARG;
  int nc = info->ncomp;
  if (nc != 1 && nc != 3) return BSJPEG_ERR_BADARG;
  if (nc == 3 && (!coef1 || !coef2)) return BSJPEG_ERR_BADARG;
  if (info->width <= 0 || info->height <= 0 || info->width > 16384 ||
      info->height > 16384)
    return BSJPEG_ERR_BADARG;
  const int16_t* coef[3] = {coef0, coef1, coef2};

  int hmax = 1, vmax = 1;
  for (int c = 0; c < nc; c++) {
    if (info->h[c] < 1 || info->h[c] > 4 || info->v[c] < 1 || info->v[c] > 4)
      return BSJPEG_ERR_BADARG;
    if (info->h[c] > hmax) hmax = info->h[c];
    if (info->v[c] > vmax) vmax = info->v[c];
  }
  // emit_dqt writes 8-bit (Pq=0) tables; a 16-bit source table (a decoded
  // stream that used Pq=1) would be silently altered by clamping — reject
  // instead so transcoders see the incompatibility.
  for (int c = 0; c < (nc == 3 ? 2 : 1); c++)
    for (int i = 0; i < 64; i++)
      if (info->qtab[c][i] > 255) return BSJPEG_ERR_BADARG;
  int mcus_x = (info->width + 8 * hmax - 1) / (8 * hmax);
  int mcus_y = (info->height + 8 * vmax - 1) / (8 * vmax);
  for (int c = 0; c < nc; c++) {
    if (info->blocks_w[c] != mcus_x * info->h[c] ||
        info->blocks_h[c] != mcus_y * info->v[c])
      return BSJPEG_ERR_BADARG;
  }

  BitWriter bw{out, out ? cap : 0};
  // --- headers (jcmarker.c order) ---
  bw.put_byte(0xFF); bw.put_byte(0xD8);                 // SOI
  bw.put_byte(0xFF); bw.put_byte(0xE0);                 // JFIF APP0
  bw.put16(16);
  const char jfif[5] = {'J', 'F', 'I', 'F', 0};
  for (char ch : jfif) bw.put_byte((uint8_t)ch);
  bw.put_byte(1); bw.put_byte(1);                       // version 1.1
  bw.put_byte(0);                                       // density: none
  bw.put16(1); bw.put16(1);                             // 1x1 aspect
  bw.put_byte(0); bw.put_byte(0);                       // no thumbnail
  emit_dqt(bw, 0, info->qtab[0]);
  if (nc == 3) emit_dqt(bw, 1, info->qtab[1]);          // chroma (comp 1==2)
  bw.put_byte(0xFF); bw.put_byte(0xC0);                 // SOF0
  bw.put16((uint16_t)(2 + 6 + 3 * nc));
  bw.put_byte(8);
  bw.put16((uint16_t)info->height);
  bw.put16((uint16_t)info->width);
  bw.put_byte((uint8_t)nc);
  for (int c = 0; c < nc; c++) {
    bw.put_byte((uint8_t)(c + 1));
    bw.put_byte((uint8_t)((info->h[c] << 4) | info->v[c]));
    bw.put_byte(c == 0 ? 0 : 1);
  }
  emit_dht(bw, 0, 0, kDcLumBits, kDcLumVals);
  emit_dht(bw, 1, 0, kAcLumBits, kAcLumVals);
  if (nc == 3) {
    emit_dht(bw, 0, 1, kDcChrBits, kDcChrVals);
    emit_dht(bw, 1, 1, kAcChrBits, kAcChrVals);
  }
  bw.put_byte(0xFF); bw.put_byte(0xDA);                 // SOS
  bw.put16((uint16_t)(2 + 1 + 2 * nc + 3));
  bw.put_byte((uint8_t)nc);
  for (int c = 0; c < nc; c++) {
    bw.put_byte((uint8_t)(c + 1));
    bw.put_byte(c == 0 ? 0x00 : 0x11);
  }
  bw.put_byte(0); bw.put_byte(63); bw.put_byte(0);      // Ss, Se, Ah/Al

  // --- entropy: interleaved MCUs ---
  EncTable dc[2], ac[2];
  dc[0].build(kDcLumBits, kDcLumVals, 12);
  ac[0].build(kAcLumBits, kAcLumVals, 162);
  dc[1].build(kDcChrBits, kDcChrVals, 12);
  ac[1].build(kAcChrBits, kAcChrVals, 162);
  int32_t pred[3] = {0, 0, 0};
  for (int my = 0; my < mcus_y; my++) {
    for (int mx = 0; mx < mcus_x; mx++) {
      for (int c = 0; c < nc; c++) {
        int t = c == 0 ? 0 : 1;
        int stride = mcus_x * info->h[c];
        for (int v = 0; v < info->v[c]; v++) {
          for (int h = 0; h < info->h[c]; h++) {
            int by = my * info->v[c] + v;
            int bx = mx * info->h[c] + h;
            const int16_t* blk = coef[c] + ((int64_t)by * stride + bx) * 64;
            if (zz_order) {
              encode_block(bw, blk, dc[t], ac[t], &pred[c]);
            } else {
              int16_t zz[64];
              for (int k = 0; k < 64; k++) zz[k] = blk[kZigzag[k]];
              encode_block(bw, zz, dc[t], ac[t], &pred[c]);
            }
          }
        }
      }
    }
  }
  bw.flush_bits();
  bw.put_byte(0xFF); bw.put_byte(0xD9);                 // EOI
  return bw.n;
}

}  // namespace

// Pack quantized coefficients into a complete baseline JPEG.  `coef[c]`
// layout matches bsjpeg_decode's output: (blocks_h, blocks_w, 64) int16,
// NATURAL order.  Returns the stream length in bytes (callers pass a
// buffer of at least that; probe with out=null/cap=0), or a negative
// error code.
BSJPEG_API int64_t bsjpeg_encode(const bsjpeg_info_t* info,
                                 const int16_t* coef0, const int16_t* coef1,
                                 const int16_t* coef2, uint8_t* out,
                                 int64_t cap) {
  return encode_impl(info, coef0, coef1, coef2, out, cap, false);
}

// Same contract, but blocks are in ZIGZAG order (zz[k] = nat[kZigzag[k]]).
// This is the fast path: the device applies the zigzag permutation for free
// (a static gather XLA fuses into the encode program), so the host skips
// the per-block 63-element reorder entirely.
BSJPEG_API int64_t bsjpeg_encode_zz(const bsjpeg_info_t* info,
                                    const int16_t* coef0, const int16_t* coef1,
                                    const int16_t* coef2, uint8_t* out,
                                    int64_t cap) {
  return encode_impl(info, coef0, coef1, coef2, out, cap, true);
}
