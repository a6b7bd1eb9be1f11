"""Fine-tuning/retraining of segmentation models on TPU meshes.

The reference only documents offline retraining (models/retrain.md, C10 in
SURVEY.md §2.2) via external TensorFlow tooling.  Because our executor keeps
weights as a params pytree and the traced graph is pure JAX, every loaded
.tflite model is directly differentiable — so retraining is first-class
here: optax optimizer, cross-entropy/BCE segmentation losses, and a pjit
train step with data parallelism over the ``data`` mesh axis, tensor
parallelism over ``model``, and optional spatial partitioning of the image
height (XLA SPMD inserts conv halo exchanges automatically).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    import optax
except ImportError:  # pragma: no cover
    optax = None

from ..graph.executor import CompiledModel
from ..models.specs import ModelSpec
from ..parallel.mesh import param_sharding_spec
from ..pipeline.decode import decode_val


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    spatial_shard: bool = False   # shard image H over the "model" axis too (sp)


def person_probability(out, spec: ModelSpec):
    """Model head output -> per-pixel person probability in [0, 1]."""
    if spec.decode == "two_channel":
        return jax.nn.softmax(out, axis=-1)[..., 1]
    if spec.decode == "argmax_not_background":
        return 1.0 - jax.nn.softmax(out, axis=-1)[..., 0]
    if spec.decode == "argmax_person":
        return jax.nn.softmax(out, axis=-1)[..., spec.person_class]
    if spec.decode == "threshold":
        return out[..., 0]
    raise ValueError(f"no probability decode for rule {spec.decode!r}")


def segmentation_loss(spec: ModelSpec):
    """Loss matched to each model family's output head.

    - two_channel (Meet): softmax cross-entropy over the 2 logits
    - threshold (MLKit/BodyPix): binary cross-entropy on the prob/logit map
    - argmax_person (DeepLab): softmax cross-entropy over 21 classes
    """
    def loss_fn(out, target):
        # target: (..., H, W) float person-probability in [0, 1]
        if spec.decode == "two_channel":
            logp = jax.nn.log_softmax(out, axis=-1)
            return -jnp.mean(target * logp[..., 1] + (1 - target) * logp[..., 0])
        if spec.decode == "argmax_not_background":
            # multiclass head, class 0 = background: person target maximizes
            # P(any non-background class) = 1 - softmax(out)[..., 0]
            logp = jax.nn.log_softmax(out, axis=-1)
            log_bg = logp[..., 0]
            log_fg = jnp.log1p(-jnp.exp(jnp.clip(log_bg, a_max=-1e-6)))
            return -jnp.mean(target * log_fg + (1 - target) * log_bg)
        if spec.decode == "argmax_person":
            logp = jax.nn.log_softmax(out, axis=-1)
            person = logp[..., spec.person_class]
            other = jax.nn.logsumexp(
                jnp.delete(out, spec.person_class, axis=-1, assume_unique_indices=True),
                axis=-1) - jax.nn.logsumexp(out, axis=-1)
            return -jnp.mean(target * person + (1 - target) * other)
        if spec.decode != "threshold":
            raise ValueError(f"no training loss for decode rule {spec.decode!r}")
        # threshold heads emit probabilities (post-sigmoid) — clamped BCE
        p = jnp.clip(out[..., 0], 1e-6, 1 - 1e-6)
        return -jnp.mean(target * jnp.log(p) + (1 - target) * jnp.log1p(-p))
    return loss_fn


class Trainer:
    """pjit train step over a (data, model) mesh.

    ``batch`` = (frames_f32 (N,H,W,3) normalized, target_person (N,H,W)).
    """

    def __init__(self, model: CompiledModel, spec: ModelSpec,
                 mesh: Optional[Mesh] = None, config: TrainConfig = TrainConfig()):
        if optax is None:
            raise RuntimeError("optax unavailable")
        if any(str(v.dtype) == "int8" for v in model.params.values()):
            raise ValueError(
                "model was loaded with int8 quantized weights — quantization "
                "is inference-only; load with quantize=None for training")
        self.model = model
        self.spec = spec
        self.mesh = mesh
        self.cfg = config
        self.tx = (optax.adamw(config.learning_rate, weight_decay=config.weight_decay)
                   if config.weight_decay else optax.adam(config.learning_rate))
        loss_core = segmentation_loss(spec)

        def loss_fn(params, x, y):
            out = model.raw_fn(params, x)
            return loss_core(out.astype(jnp.float32), y)

        def train_step(params, opt_state, x, y):
            loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        def eval_step(params, x, y):
            out = model.raw_fn(params, x).astype(jnp.float32)
            loss = loss_core(out, y)
            # predicted person set via the DEPLOYED decode rule (0 = person,
            # pipeline/decode.py), so this IoU measures the mask the serving
            # pipeline will actually produce — same criterion as the golden
            # tests, not a generic 0.5 threshold
            pred = decode_val(out, spec) == 0
            tgt = y > 0.5
            inter = jnp.sum(pred & tgt)
            union = jnp.sum(pred | tgt)
            iou = jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1))
            return loss, iou

        if mesh is not None:
            pspec = {k: NamedSharding(mesh, param_sharding_spec(k, v, mesh))
                     for k, v in model.params.items()}
            hdim = "model" if config.spatial_shard else None
            xs = NamedSharding(mesh, P("data", hdim, None, None))
            ys = NamedSharding(mesh, P("data", hdim, None))
            self.param_shardings = pspec
            self._step = jax.jit(
                train_step,
                in_shardings=(pspec, None, xs, ys),
                out_shardings=(pspec, None, None),
                donate_argnums=(0, 1),
            )
            self._eval = jax.jit(eval_step, in_shardings=(pspec, xs, ys))
            self.x_sharding, self.y_sharding = xs, ys
        else:
            self._step = jax.jit(train_step, donate_argnums=(0, 1))
            self._eval = jax.jit(eval_step)
            self.param_shardings = None
            self.x_sharding = self.y_sharding = None

        # Materialize trainable params in f32: f16-stored weights would give
        # f16 optimizer moments, and adam's eps underflows half precision.
        self.params = {k: (v.astype(jnp.float32)
                           if jnp.issubdtype(v.dtype, jnp.floating) else v)
                       for k, v in model.params.items()}
        if mesh is not None:
            self.params = {k: jax.device_put(v, self.param_shardings[k])
                           for k, v in self.params.items()}
        self.opt_state = self.tx.init(self.params)

    def step(self, x, y) -> float:
        """One optimizer step; returns the scalar loss."""
        if self.x_sharding is not None:
            x = jax.device_put(jnp.asarray(x), self.x_sharding)
            y = jax.device_put(jnp.asarray(y), self.y_sharding)
        self.params, self.opt_state, loss = self._step(self.params, self.opt_state,
                                                       jnp.asarray(x), jnp.asarray(y))
        return float(loss)

    def evaluate(self, x, y) -> dict:
        """Validation metrics on a batch: {'loss', 'iou'}.  The IoU compares
        the target (person where y > 0.5) with the mask the DEPLOYED decode
        rule produces (pipeline/decode.py decode_val == 0) — the train-time
        analog of the golden-test IoU gate, not a generic 0.5 threshold."""
        if self.x_sharding is not None:
            x = jax.device_put(jnp.asarray(x), self.x_sharding)
            y = jax.device_put(jnp.asarray(y), self.y_sharding)
        loss, iou = self._eval(self.params, jnp.asarray(x), jnp.asarray(y))
        return {"loss": float(loss), "iou": float(iou)}
