"""Lowering registry: TFLite op kind -> JAX lowering function.

Each lowering has signature ``lower(ctx, node) -> None`` and is responsible
for reading its inputs through ``ctx`` and writing its outputs.  ``ctx``
(:class:`backscrub_tpu.graph.executor.LoweringCtx`) hides whether an input is
a traced activation or a weight passed in through the params pytree.
"""

from __future__ import annotations

from typing import Callable, Dict

LOWERINGS: Dict[str, Callable] = {}


def register(*names: str):
    def deco(fn):
        for n in names:
            LOWERINGS[n] = fn
        return fn
    return deco


def get_lowering(kind: str):
    try:
        return LOWERINGS[kind]
    except KeyError:
        raise NotImplementedError(
            f"TFLite op {kind!r} has no TPU lowering; "
            f"supported: {sorted(LOWERINGS)}"
        ) from None
