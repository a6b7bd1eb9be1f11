// bsio: native host I/O shim for backscrub-tpu.
//
// TPU-native equivalent of the reference's videoio layer
// (videoio/loopback.cc — v4l2loopback sink) plus a V4L2 mmap-streaming
// capture source (the reference used OpenCV's CAP_V4L2 backend,
// app/deepseg.cc:543).  The device pipeline runs in XLA; this shim only
// moves bytes between kernel V4L2 buffers and the staging buffers the JAX
// runtime uploads from, double-buffer friendly.
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).

#include <cerrno>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <fcntl.h>
#include <sys/ioctl.h>
#include <sys/mman.h>
#include <unistd.h>

#ifdef __linux__
#include <linux/videodev2.h>
#define BSIO_HAVE_V4L2 1
#else
#define BSIO_HAVE_V4L2 0
#endif

extern "C" {

// ---------------------------------------------------------------------------
// v4l2loopback sink (videoio/loopback.cc equivalent)

// Open the loopback device with an explicit pixel format (fourcc as a
// little-endian u32, e.g. 'YUYV', 'NV12', 'YU12'/I420), STREAMON.
// Returns fd >= 0, or -errno.
int bsio_loopback_init_fmt(const char *device, int width, int height,
                           uint32_t fourcc) {
#if BSIO_HAVE_V4L2
  int fd = open(device, O_RDWR | O_CLOEXEC);
  if (fd < 0) return -errno;

  struct v4l2_capability cap;
  std::memset(&cap, 0, sizeof(cap));
  if (ioctl(fd, VIDIOC_QUERYCAP, &cap) < 0) {
    int e = errno; close(fd); return -e;
  }

  uint32_t bytesperline, sizeimage;
  // SRGB for YUYV keeps reference parity (videoio/loopback.cc sets SRGB);
  // the 4:2:0 packs are explicitly BT.601 limited range, so advertise
  // SMPTE170M or colorimetry-honoring consumers decode with wrong range.
  uint32_t colorspace = V4L2_COLORSPACE_SRGB;
  switch (fourcc) {
    case V4L2_PIX_FMT_YUYV:
      bytesperline = width * 2;
      sizeimage = width * height * 2;
      break;
    case V4L2_PIX_FMT_NV12:
    case V4L2_PIX_FMT_YUV420:  // 'YU12' = I420
      bytesperline = width;    // luma plane stride; planes are contiguous
      sizeimage = width * height * 3 / 2;
      colorspace = V4L2_COLORSPACE_SMPTE170M;
      break;
    case V4L2_PIX_FMT_BGR24:
    case V4L2_PIX_FMT_RGB24:
      bytesperline = width * 3;
      sizeimage = width * height * 3;
      break;
    case V4L2_PIX_FMT_MJPEG:
      // compressed: sizeimage is the per-frame maximum; JFIF is full-range.
      // 4 bytes/px headroom — high-quality (-p jpegq:95+) or high-entropy
      // frames can exceed 2 bytes/px and must not be truncated.
      bytesperline = 0;
      sizeimage = width * height * 4;
      colorspace = V4L2_COLORSPACE_JPEG;
      break;
    default:
      close(fd);
      return -EINVAL;
  }

  struct v4l2_format fmt;
  std::memset(&fmt, 0, sizeof(fmt));
  fmt.type = V4L2_BUF_TYPE_VIDEO_OUTPUT;
  fmt.fmt.pix.width = width;
  fmt.fmt.pix.height = height;
  fmt.fmt.pix.pixelformat = fourcc;
  fmt.fmt.pix.field = V4L2_FIELD_NONE;
  fmt.fmt.pix.bytesperline = bytesperline;
  fmt.fmt.pix.sizeimage = sizeimage;
  fmt.fmt.pix.colorspace = colorspace;
  if (ioctl(fd, VIDIOC_S_FMT, &fmt) < 0) {
    int e = errno; close(fd); return -e;
  }

  int type = V4L2_BUF_TYPE_VIDEO_OUTPUT;
  // STREAMON may be unsupported on some v4l2loopback builds; ignore failure
  // the same way a plain write()-based sink would.
  ioctl(fd, VIDIOC_STREAMON, &type);
  return fd;
#else
  (void)device; (void)width; (void)height; (void)fourcc;
  return -ENOSYS;
#endif
}

// Open the loopback device, set YUYV output format (2 bytes/px), STREAMON.
// Returns fd >= 0, or -errno.
int bsio_loopback_init(const char *device, int width, int height) {
#if BSIO_HAVE_V4L2
  return bsio_loopback_init_fmt(device, width, height, V4L2_PIX_FMT_YUYV);
#else
  (void)device; (void)width; (void)height;
  return -ENOSYS;
#endif
}

// Write a full frame, looping over short writes (app/deepseg.cc:683-690).
// Returns 0 on success, -errno on failure.
int bsio_loopback_write(int fd, const uint8_t *data, int64_t size) {
  int64_t left = size;
  const uint8_t *p = data;
  while (left > 0) {
    ssize_t n = write(fd, p, (size_t)left);
    if (n < 0) {
      if (errno == EINTR) continue;
      return -errno;
    }
    if (n == 0) return -EIO;  // no progress; errno may be stale here
    left -= n;
    p += n;
  }
  return 0;
}

// STREAMOFF + close (videoio/loopback.cc:83-101).
int bsio_loopback_free(int fd) {
#if BSIO_HAVE_V4L2
  int type = V4L2_BUF_TYPE_VIDEO_OUTPUT;
  ioctl(fd, VIDIOC_STREAMOFF, &type);
#endif
  return close(fd) < 0 ? -errno : 0;
}

// ---------------------------------------------------------------------------
// V4L2 capture source (mmap streaming, latest-frame-wins)

#define BSIO_MAX_BUFFERS 4

typedef struct {
  int fd;
  int n_buffers;
  void *bufs[BSIO_MAX_BUFFERS];
  size_t lens[BSIO_MAX_BUFFERS];
  uint32_t pixelformat;
  int width, height;
} bsio_cap_t;

// Open a capture device, negotiate fourcc+geometry, start mmap streaming.
// fourcc==0 keeps the driver default.  Returns handle or NULL.
void *bsio_cap_open(const char *device, int *width, int *height,
                    uint32_t fourcc) {
#if BSIO_HAVE_V4L2
  int fd = open(device, O_RDWR | O_CLOEXEC);
  if (fd < 0) return nullptr;

  struct v4l2_format fmt;
  std::memset(&fmt, 0, sizeof(fmt));
  fmt.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
  if (ioctl(fd, VIDIOC_G_FMT, &fmt) < 0) { close(fd); return nullptr; }
  if (*width > 0) fmt.fmt.pix.width = *width;
  if (*height > 0) fmt.fmt.pix.height = *height;
  if (fourcc) fmt.fmt.pix.pixelformat = fourcc;
  fmt.fmt.pix.field = V4L2_FIELD_NONE;
  if (ioctl(fd, VIDIOC_S_FMT, &fmt) < 0) { close(fd); return nullptr; }
  // adopt whatever the driver granted (app/deepseg.cc:554-561 behavior)
  *width = fmt.fmt.pix.width;
  *height = fmt.fmt.pix.height;

  struct v4l2_requestbuffers req;
  std::memset(&req, 0, sizeof(req));
  req.count = BSIO_MAX_BUFFERS;
  req.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
  req.memory = V4L2_MEMORY_MMAP;
  if (ioctl(fd, VIDIOC_REQBUFS, &req) < 0 || req.count < 1) {
    close(fd); return nullptr;
  }
  // Drivers may grant MORE buffers than requested (vb2 min_buffers_needed);
  // queueing only a subset of the allocated buffers is legal, but indexing
  // past bufs[BSIO_MAX_BUFFERS] is not.
  if (req.count > BSIO_MAX_BUFFERS) req.count = BSIO_MAX_BUFFERS;

  bsio_cap_t *c = new bsio_cap_t();
  c->fd = fd;
  c->n_buffers = (int)req.count;
  c->pixelformat = fmt.fmt.pix.pixelformat;
  c->width = *width;
  c->height = *height;

  // Unwind helper: munmap everything mapped so far, then free the handle —
  // a failed open in a retry loop must not leak mappings.
  auto fail = [&]() -> void * {
    for (int j = 0; j < c->n_buffers; ++j)
      if (c->bufs[j] && c->bufs[j] != MAP_FAILED) munmap(c->bufs[j], c->lens[j]);
    delete c;
    close(fd);
    return nullptr;
  };

  for (int i = 0; i < c->n_buffers; ++i) {
    struct v4l2_buffer buf;
    std::memset(&buf, 0, sizeof(buf));
    buf.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
    buf.memory = V4L2_MEMORY_MMAP;
    buf.index = i;
    if (ioctl(fd, VIDIOC_QUERYBUF, &buf) < 0) return fail();
    c->bufs[i] = mmap(nullptr, buf.length, PROT_READ | PROT_WRITE,
                      MAP_SHARED, fd, buf.m.offset);
    c->lens[i] = buf.length;
    if (c->bufs[i] == MAP_FAILED) return fail();
    ioctl(fd, VIDIOC_QBUF, &buf);
  }
  int type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
  if (ioctl(fd, VIDIOC_STREAMON, &type) < 0) return fail();
  return c;
#else
  (void)device; (void)width; (void)height; (void)fourcc;
  return nullptr;
#endif
}

uint32_t bsio_cap_pixelformat(void *h) {
  return h ? ((bsio_cap_t *)h)->pixelformat : 0;
}

// Dequeue the newest available frame into out (latest-frame-wins: drain the
// queue, keep only the most recent — the kernel-side analog of the
// reference's frame_next overwrite, app/deepseg.cc:272-277).
// Returns payload bytes, or -errno.
int64_t bsio_cap_grab(void *h, uint8_t *out, int64_t out_size) {
#if BSIO_HAVE_V4L2
  bsio_cap_t *c = (bsio_cap_t *)h;
  struct v4l2_buffer buf;
  std::memset(&buf, 0, sizeof(buf));
  buf.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
  buf.memory = V4L2_MEMORY_MMAP;
  if (ioctl(c->fd, VIDIOC_DQBUF, &buf) < 0) return -errno;

  // drain any further ready buffers, re-queueing stale ones
  for (;;) {
    struct v4l2_buffer peek;
    std::memset(&peek, 0, sizeof(peek));
    peek.type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
    peek.memory = V4L2_MEMORY_MMAP;
    int fl = fcntl(c->fd, F_GETFL);
    fcntl(c->fd, F_SETFL, fl | O_NONBLOCK);
    int r = ioctl(c->fd, VIDIOC_DQBUF, &peek);
    fcntl(c->fd, F_SETFL, fl);
    if (r < 0) break;
    ioctl(c->fd, VIDIOC_QBUF, &buf);  // stale
    buf = peek;
  }

  int64_t n = (int64_t)buf.bytesused;
  if (n > out_size) n = out_size;
  std::memcpy(out, c->bufs[buf.index], (size_t)n);
  ioctl(c->fd, VIDIOC_QBUF, &buf);
  return n;
#else
  (void)h; (void)out; (void)out_size;
  return -ENOSYS;
#endif
}

int bsio_cap_close(void *h) {
#if BSIO_HAVE_V4L2
  if (!h) return 0;
  bsio_cap_t *c = (bsio_cap_t *)h;
  int type = V4L2_BUF_TYPE_VIDEO_CAPTURE;
  ioctl(c->fd, VIDIOC_STREAMOFF, &type);
  for (int i = 0; i < c->n_buffers; ++i)
    if (c->bufs[i]) munmap(c->bufs[i], c->lens[i]);
  close(c->fd);
  delete c;
#endif
  return 0;
}

// ---------------------------------------------------------------------------
// misc

const char *bsio_version(void) { return "bsio 0.1.0"; }

}  // extern "C"
