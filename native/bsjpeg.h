// bsjpeg: C ABI for the baseline-JPEG entropy codec (native/bsjpeg.cc).
//
// Single source of truth for the struct layout and prototypes shared by
// bsjpeg.cc, the fuzz harness (tools/fuzz_bsjpeg.cc) and the native demo;
// the Python side mirrors this layout via ctypes (backscrub_tpu/io/jpeg.py
// _InfoStruct — keep the field order in sync with this header).

#ifndef BSJPEG_H_
#define BSJPEG_H_

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

enum {
  BSJPEG_OK = 0,
  BSJPEG_ERR_TRUNCATED = -1,   // ran off the end of the buffer
  BSJPEG_ERR_NOT_JPEG = -2,    // no SOI
  BSJPEG_ERR_UNSUPPORTED = -3, // progressive / arithmetic / 12-bit / CMYK
  BSJPEG_ERR_CORRUPT = -4,     // malformed segment / bad Huffman code
  BSJPEG_ERR_BADARG = -5,      // null pointers, mismatched info
};

typedef struct bsjpeg_info_t {
  int32_t width, height;       // image dims (SOF)
  int32_t ncomp;               // 1 or 3
  int32_t h[3], v[3];          // sampling factors per component
  int32_t blocks_w[3], blocks_h[3];  // coefficient array dims (MCU-padded)
  uint16_t qtab[3][64];        // per-component dequant table, natural order
  int32_t restart_interval;    // DRI (MCUs), 0 = none
} bsjpeg_info_t;

const char* bsjpeg_version(void);

// Parse markers up to SOS; fills *info. Negative error code on failure.
int bsjpeg_parse(const uint8_t* data, int64_t len, bsjpeg_info_t* info);

// Huffman-decode quantized DCT coefficients into caller buffers laid out
// (blocks_h, blocks_w, 64) int16 per component, NATURAL order.
int bsjpeg_decode(const uint8_t* data, int64_t len, bsjpeg_info_t* info,
                  int16_t* coef0, int16_t* coef1, int16_t* coef2);

// Pack quantized coefficients into a complete baseline JPEG. Blocks in
// NATURAL order (bsjpeg_decode layout). Returns stream length or negative
// error; probe the needed size with out=NULL/cap=0.
int64_t bsjpeg_encode(const bsjpeg_info_t* info, const int16_t* coef0,
                      const int16_t* coef1, const int16_t* coef2,
                      uint8_t* out, int64_t cap);

// Same contract, blocks in ZIGZAG order (the device-emitted layout).
int64_t bsjpeg_encode_zz(const bsjpeg_info_t* info, const int16_t* coef0,
                         const int16_t* coef1, const int16_t* coef2,
                         uint8_t* out, int64_t cap);

#ifdef __cplusplus
}  // extern "C"
#endif

#endif  // BSJPEG_H_
