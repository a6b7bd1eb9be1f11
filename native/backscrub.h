/* backscrub-tpu C API.
 *
 * Drop-in equivalent of the reference lib/libbackscrub.h contract
 * (opaque maskgen context + nullable stage callbacks), with raw BGR u8
 * buffers instead of cv::Mat so consumers need no OpenCV link.
 * Link against libbackscrub.so (embeds a Python interpreter driving the
 * TPU pipeline).  The backscrub_tpu package must be importable by the
 * embedded interpreter — install it, or set PYTHONPATH to the repository
 * root before loading this library.
 */

#ifndef BACKSCRUB_TPU_H
#define BACKSCRUB_TPU_H

#include <stdbool.h>
#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* Runtime version string (JAX runtime; name kept for API parity). */
const char *bs_tensorflow_version(void);

/* Create a mask generation context.
 * modelname: .tflite path or name resolvable via BACKSCRUB_PATH.
 * Env knobs: BACKSCRUB_TPU_PLATFORM=cpu|tpu selects the backend;
 * BACKSCRUB_U8_EXACT=1 makes the mask post stages byte-exact with the
 * reference binary's OpenCV u8 fixed-point path.
 * threads:   accepted for compatibility; XLA manages device compute.
 * width/height: camera frame geometry.
 * Callbacks (nullable): ondebug(msg), onprep/oninfer/onmask stage hooks,
 * all firing per frame in reference order (lib/libbackscrub.cc:303,311,363).
 * Passing a non-null onprep or oninfer selects the staged pipeline (three
 * dispatches with host-visible stage boundaries, ~identical masks); with
 * only onmask/ondebug set, the whole frame runs as one fused dispatch.
 * Returns NULL on failure. */
void *bs_maskgen_new(const char *modelname, size_t threads, size_t width,
                     size_t height,
                     void (*ondebug)(void *ctx, const char *msg),
                     void (*onprep)(void *ctx), void (*oninfer)(void *ctx),
                     void (*onmask)(void *ctx), void *caller_ctx);

/* Extended constructor: identical to bs_maskgen_new plus an `options`
 * string — comma-separated tokens mirroring the CLI -p namespace, so a
 * native consumer reaches the full pipeline:
 *   "refine:guided"                       edge-aware mask refinement
 *   "morph:<erode|dilate|open|close>[:k]" mask morphology (odd k, def 3)
 *   "u8exact"                             byte-exact OpenCV u8 post stages
 *   "no-bilateral"                        skip the bilateral prefilter
 * e.g. "refine:guided,morph:open:3".  NULL or "" = defaults.  An unknown
 * token fails construction (NULL return + ondebug message). */
void *bs_maskgen_new_ex(const char *modelname, size_t threads, size_t width,
                        size_t height, const char *options,
                        void (*ondebug)(void *ctx, const char *msg),
                        void (*onprep)(void *ctx), void (*oninfer)(void *ctx),
                        void (*onmask)(void *ctx), void *caller_ctx);

void bs_maskgen_delete(void *context);

/* frame: height*width*3 BGR u8; mask out: height*width u8
 * (0 = person / keep camera pixel, 255 = background / replace). */
bool bs_maskgen_process(void *context, const uint8_t *frame, uint8_t *mask);

#ifdef __cplusplus
}
#endif

#endif /* BACKSCRUB_TPU_H */
