"""Per-model mask decode + temporal EMA.

Reference: the three decode loops at ``lib/libbackscrub.cc:317-361``.  All
produce ``val`` in {0, 255} (0 = person / keep camera pixel, 255 =
background / replace) and fold it into a running 8-bit mask with the bit
trick

    out = (val & 0xE0) | (out >> 3)

i.e. the new frame contributes the top 3 bits (0 or 224) and the previous
mask decays by /8 — a ~3-frame exponential blend carried as device state.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.specs import ModelSpec


def decode_val(model_out, spec: ModelSpec):
    """Model output tensor (..., H, W, C) -> u8 val mask (..., H, W) in {0, 255}."""
    if spec.decode == "argmax_person":
        # lib/libbackscrub.cc:318-332 — person class index wins => 0
        person = jnp.argmax(model_out, axis=-1) == spec.person_class
    elif spec.decode == "threshold":
        # lib/libbackscrub.cc:333-341 — prob > threshold => person
        person = model_out[..., 0] > spec.threshold
    elif spec.decode == "two_channel":
        # lib/libbackscrub.cc:342-357 — softmax(p0,p1), p1 wins => person.
        # softmax is monotone: p0 < p1  <=>  logit0 < logit1.
        person = model_out[..., 0] < model_out[..., 1]
    elif spec.decode == "argmax_not_background":
        # multiclass heads (class 0 = background): any other class wins
        person = jnp.argmax(model_out, axis=-1) != 0
    else:
        raise ValueError(f"unknown decode rule {spec.decode!r}")
    return jnp.where(person, jnp.uint8(0), jnp.uint8(255))


def ema_update(prev_u8, val_u8):
    """(val & 0xE0) | (prev >> 3)  — lib/libbackscrub.cc:330,339,355."""
    return ((val_u8 & jnp.uint8(0xE0)) | (prev_u8 >> 3)).astype(jnp.uint8)
