#!/usr/bin/env python3
"""Cross-model distillation: teach Meet-lite from MLKit's masks.

End-to-end demonstration of the training subsystem on real data:

1. harvest frames from a video (the reference's animated backgrounds work),
2. label them with a TEACHER model (MLKit selfie, 256x256),
3. fine-tune the STUDENT (Meet lite, 96x160) on the teacher's soft masks
   with the mesh Trainer, checkpointing as it goes,
4. resume from the checkpoint, keep training,
5. export the tuned student back to .tflite and report agreement.

Usage: python examples/distill.py [steps] [out.tflite]
(CPU is fine: JAX_PLATFORMS=cpu python examples/distill.py)
"""

import os
import sys

import numpy as np

sys.path.insert(0, ".")


def harvest_frames(n=8, size=(160, 96)):
    """Frames from the repo-owned synthetic assets (tools/gen_assets.py),
    resized to the student input."""
    import cv2
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, "tools"))
    from gen_assets import ensure_assets
    portrait, video, _ = ensure_assets()
    paths = [portrait, video]
    frames = []
    for p in paths:
        cap = cv2.VideoCapture(p)
        while cap.isOpened() and len(frames) < n:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(cv2.resize(f, size))
        cap.release()
        if len(frames) >= n:
            break
    while len(frames) < n:  # pad by brightness-jittering
        f = frames[len(frames) % max(len(frames), 1)]
        frames.append(np.clip(f.astype(np.int16) + 20, 0, 255).astype(np.uint8))
    return np.stack(frames[:n])


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/segm_lite_distilled.tflite"

    import cv2
    import jax.numpy as jnp
    from backscrub_tpu.graph.executor import load_model
    from backscrub_tpu.models.specs import resolve_model_path, spec_for_model
    from backscrub_tpu.tflite.export import export_params_to_tflite
    from backscrub_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from backscrub_tpu.train.trainer import Trainer, TrainConfig

    teacher_path = resolve_model_path(
        "selfiesegmentation_mlkit-256x256-2021_01_19-v1215.f16.tflite")
    student_path = resolve_model_path("segm_lite_v681.tflite")
    teacher = load_model(teacher_path)
    student = load_model(student_path)

    # data: frames at student geometry; teacher labels at teacher geometry
    frames = harvest_frames(8)                       # (8, 96, 160, 3) BGR u8
    x_student = frames[..., ::-1].astype(np.float32) / 255.0  # RGB norm
    x_teacher = np.stack([cv2.resize(f[..., ::-1], (256, 256)) for f in frames]
                         ).astype(np.float32) / 255.0
    probs = np.asarray(teacher(x_teacher))[..., 0]   # (8, 256, 256)
    targets = np.stack([cv2.resize(p, (160, 96)) for p in probs])  # soft labels

    def agreement(params):
        logits = np.asarray(student.raw_fn(params, jnp.asarray(x_student)))
        pred = logits[..., 1] > logits[..., 0]
        return float((pred == (targets > 0.5)).mean())

    tr = Trainer(student, spec_for_model(student_path),
                 config=TrainConfig(learning_rate=5e-4))
    before = agreement(tr.params)

    ck = "/tmp/distill_ck.npz"
    half = steps // 2
    for i in range(half):
        loss = tr.step(x_student, targets)
    save_checkpoint(ck, tr.params, tr.opt_state, step=half)
    print(f"step {half}: loss {loss:.4f} (checkpoint saved)")

    # resume from the checkpoint (simulating a restart) and finish
    params2, opt2, start = load_checkpoint(ck, tr.params, tr.opt_state)
    import jax
    tr.params = {k: jnp.asarray(v) for k, v in params2.items()}
    tr.opt_state = jax.tree_util.tree_map(jnp.asarray, opt2)
    for i in range(start, steps):
        loss = tr.step(x_student, targets)
    after = agreement(tr.params)
    metrics = tr.evaluate(x_student, targets)  # decode-rule-exact val IoU
    print(f"step {steps}: loss {loss:.4f}")
    print(f"teacher-agreement: {before:.1%} -> {after:.1%}; "
          f"val IoU (deployed decode) {metrics['iou']:.3f}")

    n = export_params_to_tflite(student_path, student,
                                {k: np.asarray(v) for k, v in tr.params.items()},
                                out_path)
    print(f"exported {n} tensors -> {out_path} (loads in TFLite and here)")


if __name__ == "__main__":
    main()
