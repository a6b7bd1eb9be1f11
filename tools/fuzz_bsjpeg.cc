// fuzz decode->encode: mutated JPEGs through parse/decode, then feed the
// (possibly garbage) coefficients to bsjpeg_encode — no crashes allowed
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "../native/bsjpeg.h"  // shared ABI: struct layout + prototypes

static uint64_t s = 0xdeadbeefcafeULL;
static uint64_t rnd() { s ^= s<<13; s ^= s>>7; s ^= s<<17; return s; }

int main(int argc, char** argv) {
  FILE* f = fopen(argv[1], "rb");
  fseek(f, 0, SEEK_END); long n = ftell(f); fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> orig(n);
  fread(orig.data(), 1, n, f); fclose(f);
  int iters = atoi(argv[2]);
  int enc_ok = 0, rejected = 0;
  for (int it = 0; it < iters; it++) {
    std::vector<uint8_t> buf = orig;
    for (int j = 0, m = 1 + rnd() % 8; j < m; j++)
      buf[rnd() % buf.size()] = (uint8_t)rnd();
    if (it % 5 == 1) buf.resize(1 + rnd() % buf.size());
    bsjpeg_info_t info;
    if (bsjpeg_parse(buf.data(), (int64_t)buf.size(), &info) != 0) { rejected++; continue; }
    std::vector<std::vector<int16_t>> coef(3);
    for (int c = 0; c < info.ncomp; c++)
      coef[c].resize((size_t)info.blocks_w[c] * info.blocks_h[c] * 64);
    int rc = bsjpeg_decode(buf.data(), (int64_t)buf.size(), &info,
                           coef[0].data(),
                           info.ncomp > 1 ? coef[1].data() : nullptr,
                           info.ncomp > 2 ? coef[2].data() : nullptr);
    if (rc != 0) { rejected++; continue; }
    // extra hostility: scribble random values incl. int16 extremes
    for (int j = 0; j < 64; j++) {
      auto& v = coef[rnd() % info.ncomp];
      if (!v.empty()) v[rnd() % v.size()] = (int16_t)rnd();
    }
    std::vector<uint8_t> out((size_t)info.width * info.height * 8 + 65536);
    auto enc = (it & 1) ? bsjpeg_encode_zz : bsjpeg_encode;  // both layouts
    int64_t m = enc(&info, coef[0].data(),
                    info.ncomp > 1 ? coef[1].data() : nullptr,
                    info.ncomp > 2 ? coef[2].data() : nullptr,
                    out.data(), (int64_t)out.size());
    if (m > 0) enc_ok++;
  }
  printf("fuzz2 done: %d encoded, %d rejected, 0 crashes\n", enc_ok, rejected);
  return 0;
}
// Build & run (ASAN+UBSAN):
//   g++ -std=c++17 -g -O1 -fsanitize=address,undefined -shared -fPIC \
//       native/bsjpeg.cc -o /tmp/libbsjpeg_asan.so
//   g++ -std=c++17 -g -O1 -fsanitize=address,undefined tools/fuzz_bsjpeg.cc \
//       /tmp/libbsjpeg_asan.so -o /tmp/fuzz_bsjpeg -Wl,-rpath,/tmp
//   /tmp/fuzz_bsjpeg <seed.jpg> <iterations>
// Seeds: any cv2.imencode output (plain/RST/optimized/gray/444 all exercised;
// tests/test_jpeg.py::test_fuzz_byte_flips_never_crash keeps a fast
// regression in the suite).  Last clean sweep: 30k iterations alternating
// natural/zigzag encode layouts (post-SWAR-refill decoder), 0 crashes.
