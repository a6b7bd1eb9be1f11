"""Compile a :class:`GraphIR` into a single jitted JAX function.

Where the reference walks the graph op-by-op through the TFLite interpreter
(``lib/libbackscrub.cc:307`` -> ``Interpreter::Invoke``), we trace the whole
graph once into one XLA program: every conv lands on the MXU, elementwise
ops fuse into their producers, and there is no per-op dispatch overhead.

Weights are carried in a params pytree (living in HBM as device arrays)
rather than baked into the executable, so they are shared across jit
specializations (batch sizes, shardings) and can be donated/re-sharded.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..tflite.ir import GraphIR
from ..ops.registry import get_lowering
# Import for lowering registration side effects.
from ..ops import (conv as _conv, elementwise as _ew, pool as _pool,  # noqa: F401
                   misc as _misc, shape_ops as _shape, extended as _ext,
                   control_flow as _cf)


class LoweringCtx:
    """Per-trace state handed to op lowerings.

    ``get(i)`` returns the traced value of tensor ``i`` (activation or
    constant); ``get_const(i, prepare=...)`` routes a constant through the
    params pytree after an optional one-time numpy layout transform;
    ``const_value(i)`` returns the raw numpy value of a constant needed at
    trace time (shapes, axes, paddings).
    """

    def __init__(self, graph: GraphIR, params: Dict[str, jnp.ndarray],
                 prepared: Dict[str, np.ndarray], compute_dtype, precision,
                 acc_dtype, weight_meta: Optional[Dict[str, Any]] = None,
                 all_graphs: Optional[List[GraphIR]] = None,
                 sub_index: int = 0):
        self.graph = graph
        self.params = params          # traced param leaves (inside jit)
        self.prepared = prepared      # build-time numpy store (first trace only)
        self.env: Dict[int, Any] = {}
        self.compute_dtype = compute_dtype
        self.acc_dtype = acc_dtype
        self.precision = precision
        # key -> dict(tensor_index, subgraph, inverse, dtype): how to map a
        # (possibly fine-tuned) param back into the .tflite weight layout
        self.weight_meta = weight_meta if weight_meta is not None else {}
        # trace-time known values for shape-plumbing ops (SHAPE ->
        # STRIDED_SLICE -> PACK -> RESHAPE chains emitted by the converter);
        # shapes are static under XLA, so these fold at trace time
        self.static_vals: Dict[int, np.ndarray] = {}
        # control flow: WHILE/IF reference other subgraphs by index
        self.all_graphs = all_graphs if all_graphs is not None else graph.subgraphs
        self.sub_index = sub_index

    def key(self, idx: int) -> str:
        # subgraph tensors live in a separate key namespace
        return f"t{idx}" if self.sub_index == 0 else f"s{self.sub_index}t{idx}"

    def subgraph_fn(self, sub_idx: int):
        """A traceable fn(tuple_of_values) -> tuple_of_outputs executing the
        given subgraph, sharing this trace's params/prepared/weight_meta."""
        if self.all_graphs is None:
            raise ValueError("model has no subgraphs (WHILE/IF need them)")
        sub = self.all_graphs[sub_idx]

        def run(vals):
            ctx = LoweringCtx(sub, self.params, self.prepared,
                              self.compute_dtype, self.precision,
                              self.acc_dtype, self.weight_meta,
                              all_graphs=self.all_graphs, sub_index=sub_idx)
            vals = vals if isinstance(vals, (tuple, list)) else (vals,)
            for idx, v in zip(sub.inputs, vals):
                ctx.env[idx] = v  # dtypes flow through unchanged (loop counters!)
            for node in sub.nodes:
                get_lowering(node.kind)(ctx, node)
            outs = tuple(ctx.get(i) for i in sub.outputs)
            return outs

        return run

    def get(self, idx: int):
        if idx in self.env:
            return self.env[idx]
        # prepared membership first: weight payloads may have been freed from
        # the IR after the first trace (build_model releases them)
        if self.key(idx) in self.prepared or self.graph.tensor(idx).is_constant:
            return self.get_const(idx)
        raise KeyError(f"tensor {self.graph.tensor(idx)!r} referenced before definition")

    def get_const(self, idx: int, prepare: Optional[Callable] = None,
                  inverse: Optional[Callable] = None,
                  variant: str = ""):
        # `variant` keys layout-transformed copies separately, so one tensor
        # shared by consumers with different prepare transforms (e.g. a
        # weight feeding both a CONV_2D and a TRANSPOSE_CONV) never serves
        # the wrong layout
        key = self.key(idx) + (f"@{variant}" if variant else "")
        if key not in self.prepared:
            t = self.graph.tensor(idx)
            if not t.is_constant:
                # Activation fed to a weight slot (rare); fall back to env.
                return self.get(idx)
            arr = t.data
            # storage dtype is the payload dtype (f16 for dequant-folded
            # weights), not the IR tensor's logical dtype
            self.weight_meta[key] = dict(tensor_index=idx, inverse=inverse,
                                         dtype=arr.dtype, subgraph=self.sub_index)
            if prepare is not None:
                arr = prepare(arr)
            # Keep f16 storage; cast at use site (exact widening on load).
            if arr.dtype == np.float16 and self.compute_dtype != jnp.bfloat16:
                store = arr
            elif np.issubdtype(arr.dtype, np.floating):
                store = arr.astype(self.compute_dtype)
            else:
                store = arr
            self.prepared[key] = np.ascontiguousarray(store)
        store = self.params if key in self.params else None
        val = store[key] if store is not None else jnp.asarray(self.prepared[key])
        skey = key + "__scale"
        scale = (store.get(skey) if store is not None
                 else (jnp.asarray(self.prepared[skey]) if skey in self.prepared else None))
        if scale is not None and jnp.issubdtype(val.dtype, jnp.signedinteger):
            # int8 per-channel quantized kernel: dequantize on the fly
            return val.astype(self.compute_dtype) * scale.astype(self.compute_dtype)
        if jnp.issubdtype(val.dtype, jnp.floating) and val.dtype != self.compute_dtype:
            val = val.astype(self.compute_dtype)
        return val

    def const_value(self, idx: int) -> np.ndarray:
        if idx in self.static_vals:
            return self.static_vals[idx]
        t = self.graph.tensor(idx)
        if not t.is_constant:
            raise ValueError(f"tensor {t!r} must be a build-time constant")
        return t.data

    def maybe_static(self, idx: int) -> Optional[np.ndarray]:
        """Trace-time value if known (constant or folded shape math)."""
        if idx in self.static_vals:
            return self.static_vals[idx]
        t = self.graph.tensor(idx)
        return t.data if t.is_constant else None

    def set_static(self, idx: int, value: np.ndarray):
        self.static_vals[idx] = np.asarray(value)
        self.env[idx] = jnp.asarray(value)

    def set(self, idx: int, val):
        self.env[idx] = val


@dataclasses.dataclass
class CompiledModel:
    """A TFLite graph compiled to one jitted NHWC function.

    ``fn(params, x)`` maps a float input batch (N,H,W,C) to the model's
    output tensor(s).  ``params`` is a flat dict of weight arrays.
    """

    graph: GraphIR
    params: Dict[str, jnp.ndarray]
    fn: Callable                      # (params, x) -> y  (jitted)
    raw_fn: Callable                  # untraced version, for sharding wrappers
    input_shape: tuple
    output_shape: tuple
    compute_dtype: Any
    weight_meta: Dict[str, Any] = dataclasses.field(default_factory=dict)
    # host-side staging copy of the prepared weights (the same store raw_fn
    # closes over) — lets partial re-traces (pipeline/edge.py span fns) run
    # after build_model released the IR's weight payloads
    host_params: Optional[Dict[str, np.ndarray]] = None
    precision_setting: Any = None
    quantize_mode: Optional[str] = None

    def __call__(self, x, params: Optional[Dict[str, jnp.ndarray]] = None):
        return self.fn(params if params is not None else self.params, x)


def fold_constants(graph: GraphIR) -> GraphIR:
    """Propagate constants through DEQUANTIZE/RESHAPE nodes.

    The f16 models (Meet full/lite, MLKit selfie) wrap every weight in a
    DEQUANTIZE node (SURVEY.md §2.2: DEQUANT x110).  Folding turns the
    dequantize output into a constant tensor holding the f16 payload, so conv
    lowerings see real constants and can apply their build-time layout
    transforms; the f16->f32 widening happens exactly on parameter load.
    """
    nodes: List = []
    aliases = dict(graph.aliases)
    for node in graph.nodes:
        if node.kind == "DEQUANTIZE" and graph.tensor(node.inputs[0]).is_constant:
            t_in, t_out = graph.tensor(node.inputs[0]), graph.tensor(node.outputs[0])
            t_out.data = t_in.data  # keep f16 storage; cast at use
            aliases[t_out.index] = aliases.get(t_in.index, t_in.index)
            continue
        if node.kind == "RESHAPE" and graph.tensor(node.inputs[0]).is_constant:
            t_in, t_out = graph.tensor(node.inputs[0]), graph.tensor(node.outputs[0])
            shape = node.options.get("new_shape") or graph.tensor(node.inputs[1]).data.reshape(-1)
            t_out.data = t_in.data.reshape([int(s) for s in shape])
            aliases[t_out.index] = aliases.get(t_in.index, t_in.index)
            continue
        nodes.append(node)
    return dataclasses.replace(graph, nodes=nodes, aliases=aliases)


def _trace(graph: GraphIR, params, prepared, x, compute_dtype, precision,
           acc_dtype, weight_meta=None, all_graphs=None):
    ctx = LoweringCtx(graph, params, prepared, compute_dtype, precision,
                      acc_dtype, weight_meta, all_graphs=all_graphs)
    xs = x if isinstance(x, (tuple, list)) else (x,)
    if len(graph.inputs) != len(xs):
        raise ValueError(f"graph has {len(graph.inputs)} inputs, got {len(xs)}")
    for idx, xv in zip(graph.inputs, xs):
        ctx.set(idx, xv.astype(compute_dtype)
                if jnp.issubdtype(xv.dtype, jnp.floating) else xv)
    for node in graph.nodes:
        get_lowering(node.kind)(ctx, node)
    outs = [ctx.get(i) for i in graph.outputs]
    return outs[0] if len(outs) == 1 else tuple(outs)


def build_model(graph: GraphIR, compute_dtype=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
                acc_dtype=jnp.float32, jit: bool = True,
                quantize: Optional[str] = None) -> CompiledModel:
    """Build a CompiledModel from IR.

    compute_dtype=jnp.bfloat16 gives the fast path (MXU-native); float32 with
    ``Precision.HIGHEST`` gives the parity path used by the golden tests
    (IoU >= 0.99 vs TFLite CPU, SURVEY.md §4).  quantize="int8" stores conv/
    dense kernels as symmetric per-channel int8 (quant/ptq.py), dequantized
    on the fly — ~4x less weight traffic.
    """
    all_graphs = None
    if graph.subgraphs is not None:
        # fold every subgraph; index 0 stays the main graph
        all_graphs = [fold_constants(g) for g in graph.subgraphs]
        graph = all_graphs[0]
        graph.subgraphs = all_graphs
    else:
        graph = fold_constants(graph)
    prepared: Dict[str, np.ndarray] = {}

    # Populate `prepared` with one eager numpy trace (abstract eval): run the
    # trace with eval_shape so get_const registers every weight without
    # touching the device.
    def _in_spec(i):
        t = graph.tensor(i)
        dt = compute_dtype if np.issubdtype(t.dtype, np.floating) else t.dtype
        return jax.ShapeDtypeStruct(tuple(t.shape), dt)

    in_t = graph.tensor(graph.inputs[0])
    if len(graph.inputs) == 1:
        x_spec = _in_spec(graph.inputs[0])
    else:
        x_spec = tuple(_in_spec(i) for i in graph.inputs)
    weight_meta: Dict[str, Any] = {}
    jax.eval_shape(partial(_trace, graph, {}, prepared,
                           compute_dtype=compute_dtype, precision=precision,
                           acc_dtype=acc_dtype, weight_meta=weight_meta,
                           all_graphs=all_graphs), x_spec)

    if quantize == "int8":
        from ..quant.ptq import boundary_keys, quantize_params
        qparams, scales = quantize_params(prepared, weight_meta,
                                          exclude=boundary_keys(graph))
        prepared = dict(qparams)
        prepared.update({k + "__scale": v for k, v in scales.items()})

    params = {k: jnp.asarray(v) for k, v in prepared.items()}

    # Release the IR's copy of the weight payloads: they now live on device
    # (params) with a host staging copy in `prepared`.  Small constants
    # consumed at trace time (axes/shapes/paddings via const_value) are NOT
    # in weight_meta and keep their data.
    for meta in weight_meta.values():
        g = (all_graphs[meta.get("subgraph", 0)] if all_graphs is not None
             else graph)
        idx = meta["tensor_index"]
        g.tensor(idx).data = None
        alias = g.aliases.get(idx)
        if alias is not None:
            g.tensor(alias).data = None

    def raw_fn(p, x):
        return _trace(graph, p, dict(prepared), x, compute_dtype, precision,
                      acc_dtype, all_graphs=all_graphs)

    fn = jax.jit(raw_fn) if jit else raw_fn
    out_t = graph.tensor(graph.outputs[0])
    return CompiledModel(
        graph=graph, params=params, fn=fn, raw_fn=raw_fn,
        input_shape=tuple(in_t.shape), output_shape=tuple(out_t.shape),
        compute_dtype=compute_dtype, weight_meta=weight_meta,
        host_params=prepared, precision_setting=precision,
        quantize_mode=quantize,
    )


def load_model(path: str, **kwargs) -> CompiledModel:
    """Convenience: path -> CompiledModel."""
    from ..tflite.loader import load_tflite
    return build_model(load_tflite(path), **kwargs)
