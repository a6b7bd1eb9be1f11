"""Write (fine-tuned) params back into a ``.tflite`` flatbuffer.

Completes the retrain story (reference: models/retrain.md + the
TFJS->TFLite converter tooling under models/body-pix/): after fine-tuning
with :class:`backscrub_tpu.train.trainer.Trainer`, the updated weights are
patched into a byte-for-byte copy of the original model file — same graph,
same shapes, new weights — loadable by TFLite, by this framework, and by
the reference binary.

Weight buffers are patched in place (flatbuffer payloads are
fixed-size), with each param mapped back through the inverse of the layout
transform its lowering applied (HWIO -> OHWI etc., recorded in
``CompiledModel.weight_meta``).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..graph.executor import CompiledModel


def _buffer_view(model_buf: bytearray, schema_model, buffer_index: int) -> np.ndarray:
    """A writable u8 numpy view of one flatbuffer buffer payload."""
    b = schema_model.Buffers(buffer_index)
    assert b.DataLength() > 0, "cannot patch an empty buffer"
    # GetVectorAsNumpy returns a view into the bytearray backing the model
    view = b.DataAsNumpy()
    assert view.base is not None, "expected a view, got a copy"
    return view


def export_params_to_tflite(original_path: str, model: CompiledModel,
                            params: Dict[str, np.ndarray], out_path: str) -> int:
    """Patch ``params`` into a copy of ``original_path``; returns the number
    of tensors written.

    f16-stored weights (the DEQUANTIZE models) are round-tripped back to
    f16; training happened in f32, so this is a precision-truncating cast.
    """
    from tensorflow.lite.python import schema_py_generated as sg

    with open(original_path, "rb") as f:
        buf = bytearray(f.read())
    m = sg.Model.GetRootAsModel(buf, 0)

    graphs = model.graph.subgraphs or [model.graph]
    n = 0
    for key, meta in model.weight_meta.items():
        if key not in params:
            continue
        sub = meta.get("subgraph", 0)
        g = m.Subgraphs(sub)
        aliases = graphs[sub].aliases
        idx = meta["tensor_index"]
        idx = aliases.get(idx, idx)  # folded dequant output -> f16 storage
        t = g.Tensors(idx)
        bidx = t.Buffer()
        if bidx <= 0 or m.Buffers(bidx).DataLength() == 0:
            continue  # folded tensor without its own storage (e.g. dequant output)
        arr = np.asarray(params[key])
        if arr.dtype == np.int8 and key + "__scale" in params:
            # runtime-quantized kernel: dequantize back to the file's dtype
            arr = arr.astype(np.float32) * np.asarray(params[key + "__scale"],
                                                      np.float32)
        inv = meta.get("inverse")
        if inv is not None:
            arr = inv(arr)
        arr = np.ascontiguousarray(arr, dtype=meta["dtype"])
        view = _buffer_view(buf, m, bidx)
        raw = arr.view(np.uint8).reshape(-1)
        if raw.size != view.size:
            raise ValueError(
                f"{key}: payload {raw.size}B != buffer {view.size}B")
        view[:] = raw
        n += 1

    with open(out_path, "wb") as f:
        f.write(bytes(buf))
    return n
