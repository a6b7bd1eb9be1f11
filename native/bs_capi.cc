// bs_capi: C-compatible maskgen API backed by the TPU pipeline.
//
// Preserves the opaque-context contract of the reference library
// (lib/libbackscrub.h: bs_tensorflow_version, bs_maskgen_new/process/delete
// with nullable stage callbacks) so third-party hosts (e.g. OBS plugins)
// can link one shared object and get TPU-accelerated masks.  The reference
// header passes cv::Mat&; this ABI uses raw BGR u8 buffers + geometry so no
// OpenCV link dependency leaks into consumers — a deliberate narrowing of
// the surface, with the same data reachable from a cv::Mat's .data pointer.
//
// Implementation embeds a CPython interpreter (Py_Initialize) and drives
// backscrub_tpu.pipeline.maskgen.MaskGen.  All XLA compute stays on device;
// this file only marshals frames in and masks out.

#include <Python.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>

namespace {

struct bs_ctx {
  PyObject *maskgen = nullptr;     // backscrub_tpu MaskGen instance
  PyObject *process = nullptr;     // bound process method
  size_t width = 0, height = 0;
  void (*ondebug)(void *, const char *) = nullptr;
  void (*onprep)(void *) = nullptr;
  void (*oninfer)(void *) = nullptr;
  void (*onmask)(void *) = nullptr;
  void *caller_ctx = nullptr;
};

std::once_flag g_py_once;

void ensure_python() {
  std::call_once(g_py_once, [] {
    if (!Py_IsInitialized()) {
      Py_InitializeEx(0);
      // Release the GIL acquired by Py_Initialize so callers on any thread
      // can take it with PyGILState_Ensure.
      PyEval_SaveThread();
    }
  });
}

void dbg(bs_ctx *c, const char *msg) {
  if (c && c->ondebug)
    c->ondebug(c->caller_ctx, msg);
}

// Fetch and format the current Python error into a static buffer.
std::string py_error() {
  PyObject *type, *value, *tb;
  PyErr_Fetch(&type, &value, &tb);
  std::string out = "python error";
  if (value) {
    PyObject *s = PyObject_Str(value);
    if (s) {
      const char *utf8 = PyUnicode_AsUTF8(s);  // NULL if not UTF-8 encodable
      if (utf8) out = utf8;
      else PyErr_Clear();
      Py_DECREF(s);
    }
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(tb);
  return out;
}

}  // namespace

extern "C" {

const char *bs_tensorflow_version(void) {
  // API parity with lib/libbackscrub.cc:150; reports the JAX runtime.
  static char buf[128] = {0};
  if (!buf[0]) {
    ensure_python();
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *mod = PyImport_ImportModule("jax");
    if (mod) {
      PyObject *v = PyObject_GetAttrString(mod, "__version__");
      if (v) {
        snprintf(buf, sizeof(buf), "jax-%s", PyUnicode_AsUTF8(v));
        Py_DECREF(v);
      }
      Py_DECREF(mod);
    }
    if (!buf[0]) {
      PyErr_Clear();
      snprintf(buf, sizeof(buf), "jax-unavailable");
    }
    PyGILState_Release(g);
  }
  return buf;
}

// Extended constructor: `options` is a comma-separated -p-style string
// ("refine:guided,morph:open:3,u8exact,no-bilateral") parsed by
// backscrub_tpu.pipeline.maskgen.parse_capi_options, so native consumers
// reach the same beyond-parity pipeline the Python CLI exposes.  An unknown
// option fails construction (NULL + ondebug message), never silently drops.
void *bs_maskgen_new_ex(const char *modelname, size_t threads, size_t width,
                        size_t height, const char *options,
                        void (*ondebug)(void *, const char *),
                        void (*onprep)(void *), void (*oninfer)(void *),
                        void (*onmask)(void *), void *caller_ctx) {
  (void)threads;  // XLA owns device compute; accepted for API parity
  ensure_python();
  PyGILState_STATE g = PyGILState_Ensure();
  bs_ctx *c = new bs_ctx();
  c->width = width;
  c->height = height;
  c->ondebug = ondebug;
  c->onprep = onprep;
  c->oninfer = oninfer;
  c->onmask = onmask;
  c->caller_ctx = caller_ctx;

  PyObject *mod = PyImport_ImportModule("backscrub_tpu.pipeline.maskgen");
  if (!mod) {
    dbg(c, ("bs_maskgen_new: " + py_error()).c_str());
    PyGILState_Release(g);
    delete c;
    return nullptr;
  }
  // maskgen_for_capi wraps the raw callback pointers into Python callables
  // and picks staged (fused=False) mode when onprep/oninfer are non-null, so
  // ALL stage hooks of the reference contract fire (lib/libbackscrub.h:24-30,
  // invoked at lib/libbackscrub.cc:303,311,363).  With only onmask/ondebug
  // set, the fully fused single-dispatch path is kept.
  PyObject *factory = PyObject_GetAttrString(mod, "maskgen_for_capi");
  Py_DECREF(mod);
  PyObject *obj = factory
      ? PyObject_CallFunction(factory, "sllsKKKKK", modelname, (long)width,
                              (long)height, options ? options : "",
                              (unsigned long long)(uintptr_t)ondebug,
                              (unsigned long long)(uintptr_t)onprep,
                              (unsigned long long)(uintptr_t)oninfer,
                              (unsigned long long)(uintptr_t)onmask,
                              (unsigned long long)(uintptr_t)caller_ctx)
      : nullptr;
  Py_XDECREF(factory);
  if (!obj) {
    dbg(c, ("bs_maskgen_new: " + py_error()).c_str());
    PyGILState_Release(g);
    delete c;
    return nullptr;
  }
  c->maskgen = obj;
  c->process = PyObject_GetAttrString(obj, "process_bytes");
  if (!c->process) {
    dbg(c, ("bs_maskgen_new: " + py_error()).c_str());
    Py_DECREF(obj);
    PyGILState_Release(g);
    delete c;
    return nullptr;
  }
  PyGILState_Release(g);
  return c;
}

// Reference-shape constructor (lib/libbackscrub.h:31-39): no options.
void *bs_maskgen_new(const char *modelname, size_t threads, size_t width,
                     size_t height,
                     void (*ondebug)(void *, const char *),
                     void (*onprep)(void *), void (*oninfer)(void *),
                     void (*onmask)(void *), void *caller_ctx) {
  return bs_maskgen_new_ex(modelname, threads, width, height, "", ondebug,
                           onprep, oninfer, onmask, caller_ctx);
}

void bs_maskgen_delete(void *context) {
  if (!context) return;
  bs_ctx *c = (bs_ctx *)context;
  PyGILState_STATE g = PyGILState_Ensure();
  Py_XDECREF(c->process);
  Py_XDECREF(c->maskgen);
  PyGILState_Release(g);
  delete c;
}

// frame: BGR u8, height*width*3 bytes, row-major.  mask out: height*width u8.
bool bs_maskgen_process(void *context, const uint8_t *frame, uint8_t *mask) {
  if (!context) return false;
  bs_ctx *c = (bs_ctx *)context;
  PyGILState_STATE g = PyGILState_Ensure();

  PyObject *bytes = PyBytes_FromStringAndSize(
      (const char *)frame, (Py_ssize_t)(c->width * c->height * 3));
  PyObject *res = bytes ? PyObject_CallFunction(c->process, "Oll", bytes,
                                                (long)c->height,
                                                (long)c->width)
                        : nullptr;
  Py_XDECREF(bytes);
  if (!res) {
    dbg(c, ("bs_maskgen_process: " + py_error()).c_str());
    PyGILState_Release(g);
    return false;
  }
  // Stage callbacks (onprep/oninfer/onmask) fire from inside the Python
  // pipeline (maskgen_for_capi wiring) — no C-side duplicate here.

  char *buf = nullptr;
  Py_ssize_t len = 0;
  if (PyBytes_AsStringAndSize(res, &buf, &len) == 0 &&
      (size_t)len == c->width * c->height) {
    std::memcpy(mask, buf, (size_t)len);
    Py_DECREF(res);
    PyGILState_Release(g);
    return true;
  }
  Py_DECREF(res);
  dbg(c, "bs_maskgen_process: bad mask payload");
  PyGILState_Release(g);
  return false;
}

}  // extern "C"
