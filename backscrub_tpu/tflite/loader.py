"""Parse a ``.tflite`` flatbuffer into :class:`~backscrub_tpu.tflite.ir.GraphIR`.

Uses the flatbuffer schema classes that ship inside TensorFlow
(``tensorflow.lite.python.schema_py_generated``); no TFLite interpreter is
involved.  This replaces ``FlatBufferModel::BuildFromFile`` +
``InterpreterBuilder`` in the reference (``lib/libbackscrub.cc:190-217``).

Weight buffers are materialized as numpy arrays.  Models that store weights
as float16 and DEQUANTIZE at load time (the Meet and MLKit selfie models,
110 DEQUANTIZE nodes each) keep their f16 payloads in the IR; the executor
folds the dequantize into an exact f16->f32 cast at trace time.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Optional

import numpy as np

from .ir import GraphIR, NodeIR, TensorIR, TENSOR_TYPE_TO_NP


def _schema():
    from tensorflow.lite.python import schema_py_generated as sg
    return sg


def _builtin_op_names() -> Dict[int, str]:
    sg = _schema()
    return {
        v: k for k, v in vars(sg.BuiltinOperator).items()
        if isinstance(v, int) and not k.startswith("_")
    }


# TFLite schema enums (stable across schema versions).
PADDING_SAME = 0
PADDING_VALID = 1
PADDING_NAMES = {0: "SAME", 1: "VALID"}
ACTIVATION_NAMES = {0: "NONE", 1: "RELU", 2: "RELU_N1_TO_1", 3: "RELU6", 4: "TANH", 5: "SIGN_BIT"}


def _init_options(sg, cls_name: str, op) -> Optional[Any]:
    """Instantiate the builtin-options table of an operator, if present."""
    tab = op.BuiltinOptions()
    if tab is None:
        return None
    cls = getattr(sg, cls_name, None)
    if cls is None:
        return None
    obj = cls()
    obj.Init(tab.Bytes, tab.Pos)
    return obj


def _parse_builtin_options(sg, op, op_name: str) -> Dict[str, Any]:
    """Extract the option fields we care about for the supported op set."""
    o: Dict[str, Any] = {}

    def act(v):
        return ACTIVATION_NAMES.get(v, "NONE")

    if op_name == "CONV_2D":
        t = _init_options(sg, "Conv2DOptions", op)
        if t:
            o = dict(padding=PADDING_NAMES[t.Padding()],
                     stride_h=t.StrideH(), stride_w=t.StrideW(),
                     dilation_h=t.DilationHFactor(), dilation_w=t.DilationWFactor(),
                     activation=act(t.FusedActivationFunction()))
    elif op_name == "DEPTHWISE_CONV_2D":
        t = _init_options(sg, "DepthwiseConv2DOptions", op)
        if t:
            o = dict(padding=PADDING_NAMES[t.Padding()],
                     stride_h=t.StrideH(), stride_w=t.StrideW(),
                     dilation_h=t.DilationHFactor(), dilation_w=t.DilationWFactor(),
                     depth_multiplier=t.DepthMultiplier(),
                     activation=act(t.FusedActivationFunction()))
    elif op_name in ("AVERAGE_POOL_2D", "MAX_POOL_2D"):
        t = _init_options(sg, "Pool2DOptions", op)
        if t:
            o = dict(padding=PADDING_NAMES[t.Padding()],
                     stride_h=t.StrideH(), stride_w=t.StrideW(),
                     filter_h=t.FilterHeight(), filter_w=t.FilterWidth(),
                     activation=act(t.FusedActivationFunction()))
    elif op_name in ("ADD", "SUB", "MUL", "DIV"):
        t = _init_options(sg, op_name.capitalize() + "Options", op)
        o = dict(activation=act(t.FusedActivationFunction()) if t else "NONE")
    elif op_name == "CONCATENATION":
        t = _init_options(sg, "ConcatenationOptions", op)
        if t:
            o = dict(axis=t.Axis(), activation=act(t.FusedActivationFunction()))
    elif op_name == "FULLY_CONNECTED":
        t = _init_options(sg, "FullyConnectedOptions", op)
        if t:
            o = dict(activation=act(t.FusedActivationFunction()),
                     keep_num_dims=bool(t.KeepNumDims()))
    elif op_name == "RESIZE_BILINEAR":
        t = _init_options(sg, "ResizeBilinearOptions", op)
        if t:
            o = dict(align_corners=bool(t.AlignCorners()),
                     half_pixel_centers=bool(t.HalfPixelCenters()))
    elif op_name == "RESHAPE":
        t = _init_options(sg, "ReshapeOptions", op)
        if t and t.NewShapeLength():
            o = dict(new_shape=[t.NewShape(i) for i in range(t.NewShapeLength())])
    elif op_name == "SOFTMAX":
        t = _init_options(sg, "SoftmaxOptions", op)
        if t:
            o = dict(beta=t.Beta())
    elif op_name == "PAD":
        pass  # paddings come as a constant input tensor
    elif op_name in ("MEAN", "SUM", "REDUCE_MAX", "REDUCE_MIN", "REDUCE_PROD"):
        t = _init_options(sg, "ReducerOptions", op)
        if t:
            o = dict(keep_dims=bool(t.KeepDims()))
    elif op_name in ("SPACE_TO_DEPTH", "DEPTH_TO_SPACE"):
        t = _init_options(sg, op_name.title().replace("_", "") + "Options", op)
        if t:
            o = dict(block_size=t.BlockSize())
    elif op_name == "MIRROR_PAD":
        t = _init_options(sg, "MirrorPadOptions", op)
        if t:
            o = dict(mode=t.Mode())
    elif op_name == "GATHER":
        t = _init_options(sg, "GatherOptions", op)
        if t:
            o = dict(axis=t.Axis())
    elif op_name == "RESIZE_NEAREST_NEIGHBOR":
        t = _init_options(sg, "ResizeNearestNeighborOptions", op)
        if t:
            o = dict(align_corners=bool(t.AlignCorners()),
                     half_pixel_centers=bool(t.HalfPixelCenters()))
    elif op_name == "LEAKY_RELU":
        t = _init_options(sg, "LeakyReluOptions", op)
        if t:
            o = dict(alpha=t.Alpha())
    elif op_name == "STRIDED_SLICE":
        t = _init_options(sg, "StridedSliceOptions", op)
        if t:
            o = dict(begin_mask=t.BeginMask(), end_mask=t.EndMask(),
                     ellipsis_mask=t.EllipsisMask(), new_axis_mask=t.NewAxisMask(),
                     shrink_axis_mask=t.ShrinkAxisMask())
    elif op_name == "PACK":
        t = _init_options(sg, "PackOptions", op)
        if t:
            o = dict(axis=t.Axis(), values_count=t.ValuesCount())
    elif op_name == "UNPACK":
        t = _init_options(sg, "UnpackOptions", op)
        if t:
            o = dict(axis=t.Axis(), num=t.Num())
    elif op_name == "WHILE":
        t = _init_options(sg, "WhileOptions", op)
        if t:
            o = dict(cond_subgraph=t.CondSubgraphIndex(),
                     body_subgraph=t.BodySubgraphIndex())
    elif op_name == "IF":
        t = _init_options(sg, "IfOptions", op)
        if t:
            o = dict(then_subgraph=t.ThenSubgraphIndex(),
                     else_subgraph=t.ElseSubgraphIndex())
    elif op_name == "BATCH_MATMUL":
        t = _init_options(sg, "BatchMatMulOptions", op)
        if t:
            o = dict(adj_x=bool(t.AdjX()), adj_y=bool(t.AdjY()))
    elif op_name == "CUMSUM":
        t = _init_options(sg, "CumsumOptions", op)
        if t:
            o = dict(exclusive=bool(t.Exclusive()), reverse=bool(t.Reverse()))
    elif op_name == "ONE_HOT":
        t = _init_options(sg, "OneHotOptions", op)
        if t:
            o = dict(axis=t.Axis())
    elif op_name == "TRANSPOSE_CONV":
        t = _init_options(sg, "TransposeConvOptions", op)
        if t:
            o = dict(padding=PADDING_NAMES[t.Padding()],
                     stride_h=t.StrideH(), stride_w=t.StrideW())
    return o


def _parse_custom_options(custom_code: str, data: Optional[bytes]) -> Dict[str, Any]:
    """Parse custom-op option payloads.

    ``Convolution2DTransposeBias`` (MediaPipe) stores a raw C struct
    ``TfLiteTransposeConvParams`` — three little-endian int32s:
    ``{TfLitePadding padding; int stride_width; int stride_height;}``
    (consumed at ``lib/transpose_conv_bias.cc:199-212`` in the reference).
    TfLitePadding: 0=unknown, 1=SAME, 2=VALID.
    """
    if custom_code == "Convolution2DTransposeBias" and data and len(data) >= 12:
        padding, stride_w, stride_h = struct.unpack_from("<iii", data, 0)
        return dict(
            padding={0: "UNKNOWN", 1: "SAME", 2: "VALID"}.get(padding, "UNKNOWN"),
            stride_w=stride_w,
            stride_h=stride_h,
        )
    return dict(raw=bytes(data) if data else b"")


def load_tflite(path: str, subgraph: int = 0) -> GraphIR:
    """Load a ``.tflite`` file into a :class:`GraphIR`.

    The main graph carries all other subgraphs in ``.subgraphs`` (WHILE/IF
    bodies reference them by index)."""
    with open(path, "rb") as f:
        buf = f.read()
    return load_tflite_bytes(buf, name=path, subgraph=subgraph)


def load_tflite_bytes(buf: bytes, name: str = "<bytes>", subgraph: int = 0) -> GraphIR:
    """Parse one parse of the flatbuffer; when loading the main graph of a
    multi-subgraph model, all subgraphs are built from the same parse."""
    sg = _schema()
    model = sg.Model.GetRootAsModel(bytearray(buf), 0)
    op_names = _builtin_op_names()

    # Operator codes: prefer BuiltinCode, fall back to DeprecatedBuiltinCode
    # (older files store codes < 127 only in the deprecated field).
    codes: List[Dict[str, Any]] = []
    for i in range(model.OperatorCodesLength()):
        oc = model.OperatorCodes(i)
        code = max(oc.BuiltinCode(), oc.DeprecatedBuiltinCode())
        custom = oc.CustomCode()
        codes.append({
            "name": op_names.get(code, f"UNKNOWN_{code}"),
            "custom": custom.decode() if custom is not None else None,
        })

    gir = _load_subgraph(sg, model, codes, subgraph, name)
    if subgraph == 0 and model.SubgraphsLength() > 1:
        # control-flow bodies (WHILE/IF reference subgraphs by index)
        gir.subgraphs = [gir] + [
            _load_subgraph(sg, model, codes, i, f"{name}#{i}")
            for i in range(1, model.SubgraphsLength())
        ]
    return gir


def _load_subgraph(sg, model, codes, subgraph: int, name: str) -> GraphIR:
    g = model.Subgraphs(subgraph)

    tensors: List[TensorIR] = []
    for ti in range(g.TensorsLength()):
        t = g.Tensors(ti)
        shape = tuple(int(t.Shape(j)) for j in range(t.ShapeLength()))
        dtype = TENSOR_TYPE_TO_NP.get(t.Type(), np.float32)
        data = None
        bidx = t.Buffer()
        if bidx > 0:
            b = model.Buffers(bidx)
            if b.DataLength() > 0:
                raw = b.DataAsNumpy()
                data = np.frombuffer(raw.tobytes(), dtype=dtype)
                if shape:
                    data = data.reshape(shape)
                # Dynamic-range quantized weights (int8/uint8 constants with
                # per-channel scales): dequantize on load, so the graph runs
                # as float — TFLite's own float fallback for such models.
                q = t.Quantization()
                if (q is not None and q.ScaleLength() > 0
                        and np.issubdtype(data.dtype, np.integer)):
                    scales = np.array([q.Scale(i) for i in range(q.ScaleLength())],
                                      np.float32)
                    zps = np.array([q.ZeroPoint(i) for i in range(q.ZeroPointLength())],
                                   np.int64) if q.ZeroPointLength() else np.zeros(1, np.int64)
                    qdim = q.QuantizedDimension()
                    bshape = [1] * data.ndim
                    if scales.size > 1:
                        bshape[qdim] = scales.size
                    data = ((data.astype(np.float32)
                             - zps.reshape(bshape if zps.size > 1 else [1] * data.ndim))
                            * scales.reshape(bshape)).astype(np.float32)
                    dtype = np.float32
        tname = t.Name()
        tensors.append(TensorIR(
            index=ti,
            name=tname.decode() if tname is not None else f"t{ti}",
            shape=shape,
            dtype=dtype,
            data=data,
        ))

    nodes: List[NodeIR] = []
    for oi in range(g.OperatorsLength()):
        op = g.Operators(oi)
        code = codes[op.OpcodeIndex()]
        op_name = code["name"]
        custom_code = code["custom"]
        inputs = [int(op.Inputs(j)) for j in range(op.InputsLength())]
        outputs = [int(op.Outputs(j)) for j in range(op.OutputsLength())]
        if custom_code is not None:
            co = op.CustomOptionsAsNumpy()
            raw = co.tobytes() if not isinstance(co, int) else None
            options = _parse_custom_options(custom_code, raw)
            nodes.append(NodeIR(op="CUSTOM", inputs=inputs, outputs=outputs,
                                options=options, custom_code=custom_code))
        else:
            options = _parse_builtin_options(sg, op, op_name)
            nodes.append(NodeIR(op=op_name, inputs=inputs, outputs=outputs,
                                options=options))

    gname = g.Name()
    return GraphIR(
        name=gname.decode() if gname is not None else name,
        tensors=tensors,
        nodes=nodes,
        inputs=[int(g.Inputs(i)) for i in range(g.InputsLength())],
        outputs=[int(g.Outputs(i)) for i in range(g.OutputsLength())],
        description=(model.Description() or b"").decode(errors="replace"),
    )
