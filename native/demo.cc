// backscrub_native: a pure-C++ consumer of the backscrub-tpu C ABI.
//
// Mirrors the reference application's main loop (app/deepseg.cc:627-804:
// grab -> maskgen -> background fetch -> alpha blend -> flip -> YUYV pack ->
// sink write) as a standalone binary linking only libbackscrub.so (masks,
// TPU-accelerated through the embedded interpreter) and libbsio.so (V4L2).
// It is the "third-party host" the opaque C contract exists for
// (lib/libbackscrub.h:13-39) — the full-featured application is the Python
// CLI (`backscrub-tpu`), where blend/pack also run on-device; here the
// composite runs on host with the same bit-exact integer math so consumers
// that only want masks can see the full recipe in plain C++.
//
// Sources: `test:` (deterministic moving pattern, reproduced by the test
// suite) or a raw BGR24 frame-concatenated file (loops at EOF, like the
// background reader at app/background.cc:92-100).  Sinks: a path (raw YUYV
// append), `/dev/video*` (v4l2loopback via bsio), or `null:`.

#include <fcntl.h>
#include <time.h>
#include <unistd.h>

#include <cerrno>
#include <cinttypes>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "backscrub.h"

// bsio.cc exports (no public header; ABI kept tiny on purpose).
extern "C" {
int bsio_loopback_init(const char *device, int width, int height);
int bsio_loopback_write(int fd, const uint8_t *data, int64_t size);
int bsio_loopback_free(int fd);
const char *bsio_version(void);
}

namespace {

struct Options {
  std::string model = "segm_lite_v681.tflite";
  std::string source = "test:";
  std::string sink = "null:";
  std::string background;  // raw BGR file; empty = green screen fallback
  std::string dump_mask;   // append raw masks here (test/debug seam)
  std::string pipe_opts;   // -p tokens, joined for bs_maskgen_new_ex
  int width = 640, height = 480;
  int frames = 16;
  int threads = 2;
  bool flip_h = false, flip_v = false;
  bool debug = false;
};

int64_t now_ns() {
  timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return int64_t(ts.tv_sec) * 1000000000 + ts.tv_nsec;
}

void usage(const char *argv0) {
  fprintf(stderr,
          "usage: %s [-m model] [-c test:|frames.bgr] [-v out.yuyv|/dev/videoN|null:]\n"
          "          [-b bg.bgr] [--cg WxH] [-n frames] [-t threads] [-H] [-V] [-d]\n"
          "          [-p option[:value]] [--dump-mask masks.raw] [--version]\n"
          "Raw-BGR24 sources/backgrounds must match the WxH geometry.\n"
          "-p (repeatable) mask options: refine:guided, morph:<op>[:k],\n"
          "   u8exact, no-bilateral (see backscrub.h bs_maskgen_new_ex).\n",
          argv0);
}

bool parse_geometry(const char *s, int *w, int *h) {
  char x = 0;
  return sscanf(s, "%d%c%d", w, &x, h) == 3 && (x == 'x' || x == 'X') &&
         *w > 0 && *h > 0;
}

// Deterministic moving test pattern (BGR).  The Python test regenerates this
// exact function; change both together.
void test_pattern(int frame, int w, int h, uint8_t *bgr) {
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) {
      uint8_t *p = bgr + 3 * (y * w + x);
      p[0] = uint8_t((x * 255) / (w > 1 ? w - 1 : 1));
      p[1] = uint8_t((y * 255) / (h > 1 ? h - 1 : 1));
      p[2] = uint8_t((x + y + 7 * frame) & 0xFF);
    }
  }
}

// Exact integer alpha blend (app/deepseg.cc:108-134 semantics; our mask
// convention: 0 = person/keep camera, 255 = background/replace).
void alpha_blend(const uint8_t *bg, const uint8_t *cam, const uint8_t *mask,
                 int w, int h, uint8_t *out) {
  for (int i = 0; i < w * h; i++) {
    int m = mask[i];
    for (int c = 0; c < 3; c++)
      out[3 * i + c] =
          uint8_t((bg[3 * i + c] * m + cam[3 * i + c] * (255 - m)) / 255);
  }
}

void flip_image(uint8_t *img, int w, int h, int ch, bool horiz, bool vert) {
  if (horiz) {
    for (int y = 0; y < h; y++) {
      uint8_t *row = img + size_t(y) * w * ch;
      for (int x = 0; x < w / 2; x++)
        for (int c = 0; c < ch; c++)
          std::swap(row[x * ch + c], row[(w - 1 - x) * ch + c]);
    }
  }
  if (vert) {
    std::vector<uint8_t> tmp(size_t(w) * ch);
    for (int y = 0; y < h / 2; y++) {
      uint8_t *a = img + size_t(y) * w * ch;
      uint8_t *b = img + size_t(h - 1 - y) * w * ch;
      memcpy(tmp.data(), a, tmp.size());
      memcpy(a, b, tmp.size());
      memcpy(b, tmp.data(), tmp.size());
    }
  }
}

inline int descale14(int64_t v) { return int((v + (1 << 13)) >> 14); }
inline uint8_t clamp_u8(int v) { return uint8_t(v < 0 ? 0 : (v > 255 ? 255 : v)); }

// BGR -> packed YUYV, bit-exact with the device path (pipeline/image.py
// rgb_to_yuyv with chroma_order="reference"): the frame's BGR bytes feed the
// RGB2YUV fixed-point constants unswapped and the interleave is Y0-V-Y1-U,
// both reproducing convert_rgb_to_yuyv at app/deepseg.cc:87-106.
void bgr_to_yuyv(const uint8_t *bgr, int w, int h, uint8_t *yuyv) {
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x += 2) {
      int yy[2], uu[2], vv[2];
      for (int k = 0; k < 2; k++) {
        const uint8_t *p = bgr + 3 * (y * w + x + k);
        int c0 = p[0], c1 = p[1], c2 = p[2];
        yy[k] = descale14(int64_t(c0) * 4899 + int64_t(c1) * 9617 +
                          int64_t(c2) * 1868);
        uu[k] = clamp_u8(descale14(int64_t(c2 - yy[k]) * 8061 + (128LL << 14)));
        vv[k] = clamp_u8(descale14(int64_t(c0 - yy[k]) * 14369 + (128LL << 14)));
      }
      uint8_t *q = yuyv + 2 * (y * w + x);
      q[0] = uint8_t(yy[0]);
      q[1] = uint8_t((vv[0] + vv[1]) / 2);
      q[2] = uint8_t(yy[1]);
      q[3] = uint8_t((uu[0] + uu[1]) / 2);
    }
  }
}

void on_debug(void *, const char *msg) { fprintf(stderr, "[lib] %s\n", msg); }

bool read_raw_frame(FILE *f, uint8_t *buf, size_t n) {
  size_t got = fread(buf, 1, n, f);
  if (got == n) return true;
  if (got == 0 && !ferror(f)) {  // EOF: loop like background.cc:92-100
    if (fseek(f, 0, SEEK_SET) != 0) return false;
    return fread(buf, 1, n, f) == n;
  }
  return false;
}

}  // namespace

int main(int argc, char **argv) {
  Options o;
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    auto next = [&](const char *flag) -> const char * {
      if (i + 1 >= argc) {
        fprintf(stderr, "%s requires an argument\n", flag);
        exit(1);
      }
      return argv[++i];
    };
    if (a == "-m") o.model = next("-m");
    else if (a == "-c") o.source = next("-c");
    else if (a == "-v") o.sink = next("-v");
    else if (a == "-b") o.background = next("-b");
    else if (a == "--dump-mask") o.dump_mask = next("--dump-mask");
    else if (a == "--cg") {
      if (!parse_geometry(next("--cg"), &o.width, &o.height)) {
        fprintf(stderr, "bad geometry (want WxH)\n");
        return 1;
      }
    } else if (a == "-p") {
      if (!o.pipe_opts.empty()) o.pipe_opts += ",";
      o.pipe_opts += next("-p");
    } else if (a == "-n") o.frames = atoi(next("-n"));
    else if (a == "-t") o.threads = atoi(next("-t"));
    else if (a == "-H") o.flip_h = true;
    else if (a == "-V") o.flip_v = true;
    else if (a == "-d") o.debug = true;
    else if (a == "--version") {
      printf("backscrub_native (%s, %s)\n", bs_tensorflow_version(),
             bsio_version());
      return 0;
    } else {
      usage(argv[0]);
      return a == "-?" || a == "--help" ? 0 : 1;
    }
  }
  if (o.width % 2) {
    fprintf(stderr, "width must be even for YUYV output\n");
    return 1;
  }

  const size_t npx = size_t(o.width) * o.height;
  std::vector<uint8_t> cam(npx * 3), bg(npx * 3), comp(npx * 3);
  std::vector<uint8_t> mask(npx, 255), yuyv(npx * 2);

  // Background: raw BGR file or the reference's green-screen fallback
  // (app/deepseg.cc:596-603).
  if (!o.background.empty()) {
    FILE *f = fopen(o.background.c_str(), "rb");
    if (!f) {
      fprintf(stderr, "failed to open background %s: %s\n",
              o.background.c_str(), strerror(errno));
      return 1;
    }
    size_t got = fread(bg.data(), 1, bg.size(), f);
    if (got != bg.size()) {
      fprintf(stderr,
              "background %s: read %zu bytes, need %zu (raw BGR24 at %dx%d)\n",
              o.background.c_str(), got, bg.size(), o.width, o.height);
      fclose(f);
      return 1;
    }
    fclose(f);
  } else {
    for (size_t i = 0; i < npx; i++) {
      bg[3 * i + 0] = 0;
      bg[3 * i + 1] = 255;
      bg[3 * i + 2] = 0;
    }
  }

  FILE *src = nullptr;
  if (o.source != "test:") {
    src = fopen(o.source.c_str(), "rb");
    if (!src) {
      fprintf(stderr, "failed to open source %s: %s\n", o.source.c_str(),
              strerror(errno));
      return 1;
    }
  }

  int lb_fd = -1;
  FILE *out = nullptr;
  if (o.sink.rfind("/dev/", 0) == 0) {
    lb_fd = bsio_loopback_init(o.sink.c_str(), o.width, o.height);
    if (lb_fd < 0) {
      fprintf(stderr, "loopback init failed on %s\n", o.sink.c_str());
      return 1;
    }
  } else if (o.sink != "null:") {
    out = fopen(o.sink.c_str(), "wb");
    if (!out) {
      fprintf(stderr, "failed to open sink %s: %s\n", o.sink.c_str(),
              strerror(errno));
      return 1;
    }
  }
  FILE *maskout = nullptr;
  if (!o.dump_mask.empty()) {
    maskout = fopen(o.dump_mask.c_str(), "wb");
    if (!maskout) {
      fprintf(stderr, "failed to open %s: %s\n", o.dump_mask.c_str(),
              strerror(errno));
      return 1;
    }
  }

  void *ctx = bs_maskgen_new_ex(o.model.c_str(), size_t(o.threads),
                                size_t(o.width), size_t(o.height),
                                o.pipe_opts.c_str(),
                                o.debug ? on_debug : nullptr, nullptr, nullptr,
                                nullptr, nullptr);
  if (!ctx) {
    fprintf(stderr, "bs_maskgen_new failed for %s\n", o.model.c_str());
    return 1;
  }

  int rc = 0;
  for (int n = 0; n < o.frames; n++) {
    int64_t t0 = now_ns();
    if (src) {
      if (!read_raw_frame(src, cam.data(), cam.size())) {
        fprintf(stderr, "source read failed at frame %d\n", n);
        rc = 1;
        break;
      }
    } else {
      test_pattern(n, o.width, o.height, cam.data());
    }
    int64_t t1 = now_ns();
    if (!bs_maskgen_process(ctx, cam.data(), mask.data())) {
      fprintf(stderr, "bs_maskgen_process failed at frame %d\n", n);
      rc = 1;
      break;
    }
    int64_t t2 = now_ns();
    if (maskout && fwrite(mask.data(), 1, mask.size(), maskout) != mask.size()) {
      fprintf(stderr, "mask dump write failed: %s\n", strerror(errno));
      rc = 1;
      break;
    }
    alpha_blend(bg.data(), cam.data(), mask.data(), o.width, o.height,
                comp.data());
    flip_image(comp.data(), o.width, o.height, 3, o.flip_h, o.flip_v);
    bgr_to_yuyv(comp.data(), o.width, o.height, yuyv.data());
    int64_t t3 = now_ns();
    if (lb_fd >= 0) {
      if (bsio_loopback_write(lb_fd, yuyv.data(), int64_t(yuyv.size())) != 0) {
        fprintf(stderr, "loopback write failed: %s\n", strerror(errno));
        rc = 1;
        break;
      }
    } else if (out && fwrite(yuyv.data(), 1, yuyv.size(), out) != yuyv.size()) {
      fprintf(stderr, "sink write failed: %s\n", strerror(errno));
      rc = 1;
      break;
    }
    int64_t t4 = now_ns();
    if (o.debug)  // per-frame stage line, like app/deepseg.cc:702-719
      fprintf(stderr,
              "frame %4d  grab %8" PRId64 " ns  mask %8" PRId64
              " ns  post %8" PRId64 " ns  sink %8" PRId64 " ns  %.1f fps\n",
              n, t1 - t0, t2 - t1, t3 - t2, t4 - t3, 1e9 / double(t4 - t0));
  }

  bs_maskgen_delete(ctx);
  if (maskout) fclose(maskout);
  if (out) fclose(out);
  if (lb_fd >= 0) bsio_loopback_free(lb_fd);
  if (src) fclose(src);
  return rc;
}
