"""Tiny ONNX-graph executor on jax.numpy (serves the MDX-Net dereverb's
opaque ONNX models, reference mdxnet.py Predictor, without onnxruntime).

Covers the conv-net op set (Conv/ConvTranspose/BatchNorm/InstanceNorm/
GroupNorm, elementwise, pooling, Gemm/MatMul, Reshape/Transpose/Concat/
Slice/Pad, Resize-nearest).  Unknown ops raise with the op name so coverage
gaps surface immediately.  Tensors are NCHW exactly as ONNX specifies; XLA
re-layouts internally.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from tpu_rvc.ckpt.onnx_reader import DTYPE, OnnxGraph, OnnxNode, load_onnx

_UNARY = {"Neg": jnp.negative, "Exp": jnp.exp, "Log": jnp.log,
          "Sin": jnp.sin, "Cos": jnp.cos, "Sqrt": jnp.sqrt,
          "Reciprocal": lambda x: 1.0 / x, "Abs": jnp.abs,
          "Sign": jnp.sign, "Floor": jnp.floor, "Ceil": jnp.ceil,
          "Round": jnp.round, "Erf": jax.scipy.special.erf,
          "Not": jnp.logical_not, "Softplus": jax.nn.softplus,
          "Gelu": jax.nn.gelu}
_BINARY = {"Pow": jnp.power, "Equal": jnp.equal, "Greater": jnp.greater,
           "GreaterOrEqual": jnp.greater_equal, "Less": jnp.less,
           "LessOrEqual": jnp.less_equal, "And": jnp.logical_and,
           "Or": jnp.logical_or, "Xor": jnp.logical_xor,
           "Max": jnp.maximum, "Min": jnp.minimum}


def _conv(x, w, b, node: OnnxNode, transpose=False):
    spatial = x.ndim - 2
    strides = tuple(node.attr("strides", [1] * spatial))
    dil = tuple(node.attr("dilations", [1] * spatial))
    group = int(node.attr("group", 1))
    pads = node.attr("pads", [0] * (2 * spatial))
    pad_pairs = [(int(pads[i]), int(pads[i + spatial]))
                 for i in range(spatial)]
    if not transpose:
        # ONNX conv weight: (out, in/group, *k) -> jax IO spec via dim numbers
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NCHW", "OIHW", "NCHW") if spatial == 2
            else ("NCH", "OIH", "NCH"))
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), strides, pad_pairs, rhs_dilation=dil,
            dimension_numbers=dn, feature_group_count=group)
    else:
        # ConvTranspose weight: (in, out/group, *k)
        out_pads = node.attr("output_padding", [0] * spatial)
        k = w.shape[2:]
        w_f = jnp.flip(w, axis=tuple(range(2, w.ndim)))
        w_f = jnp.swapaxes(w_f, 0, 1)  # (out/group, in, *k)
        if group != 1:
            raise NotImplementedError("grouped ConvTranspose")
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w_f.shape, ("NCHW", "OIHW", "NCHW") if spatial == 2
            else ("NCH", "OIH", "NCH"))
        tp = [(int(k[i]) - 1 - pad_pairs[i][0],
               int(k[i]) - 1 - pad_pairs[i][1] + int(out_pads[i]))
              for i in range(spatial)]
        y = jax.lax.conv_general_dilated(
            x, w_f.astype(x.dtype), (1,) * spatial, tp,
            lhs_dilation=strides, dimension_numbers=dn)
    if b is not None:
        y = y + b.reshape((1, -1) + (1,) * spatial).astype(y.dtype)
    return y


def _pool(x, node: OnnxNode, op):
    spatial = x.ndim - 2
    k = tuple(node.attr("kernel_shape"))
    strides = tuple(node.attr("strides", list(k)))
    pads = node.attr("pads", [0] * (2 * spatial))
    pad_pairs = [(0, 0), (0, 0)] + [(int(pads[i]), int(pads[i + spatial]))
                                    for i in range(spatial)]
    window = (1, 1) + k
    strides_full = (1, 1) + strides
    if op == "max":
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, window,
                                     strides_full, pad_pairs)
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides_full,
                              pad_pairs)
    return s / np.prod(k)


# ONNX inputs that must stay concrete at jit-trace time (shapes, axes,
# slice bounds) — op_type -> input positions
_STRUCTURAL = {"Reshape": (1,), "Slice": (1, 2, 3, 4), "Expand": (1,),
               "Tile": (1,), "CumSum": (1,), "Split": (1,), "Pad": (1,),
               "Resize": (2, 3), "ReduceSum": (1,), "ReduceMax": (1,),
               "ReduceMin": (1,), "ReduceProd": (1,), "ReduceMean": (1,),
               "Unsqueeze": (1,), "Squeeze": (1,), "Range": (0, 1, 2)}


class OnnxModule:
    """Executable ONNX graph: module(input_arrays...) -> outputs.

    Eager by default (each op dispatches separately — fine on CPU, terrible
    through a remote-attached device).  `.jit()` returns a callable that
    compiles the whole graph into ONE XLA program with the float weights
    passed as arguments (remote compile services cap request bodies, so
    weights must not be baked into the graph as constants — see
    CLAUDE.md); structural initializers (shapes/axes/slice bounds) stay
    baked in as required for tracing."""

    def __init__(self, graph: OnnxGraph):
        self.graph = graph
        structural = set()
        for node in graph.nodes:
            for i in _STRUCTURAL.get(node.op_type, ()):
                if i < len(node.inputs):
                    structural.add(node.inputs[i])
        # structural initializers stay numpy (concrete under jit tracing)
        self.params: Dict[str, Any] = {
            k: (np.asarray(v) if k in structural else jnp.asarray(v))
            for k, v in graph.initializers.items()}
        self._jitted = None

    @classmethod
    def from_file(cls, path: str) -> "OnnxModule":
        return cls(load_onnx(path))

    def _run(self, env: Dict[str, Any]):
        for node in self.graph.nodes:
            ins = [env[i] if i else None for i in node.inputs]
            out = self._exec(node, ins, env)
            if isinstance(out, (list, tuple)):
                for name, val in zip(node.outputs, out):
                    env[name] = val
            else:
                env[node.outputs[0]] = out
        outs = [env[o] for o in self.graph.outputs]
        return outs[0] if len(outs) == 1 else outs

    def __call__(self, *args, **named):
        env: Dict[str, Any] = dict(self.params)
        for name, val in zip(self.graph.inputs, args):
            env[name] = jnp.asarray(val)
        env.update({k: jnp.asarray(v) for k, v in named.items()})
        return self._run(env)

    def jit(self):
        """Whole-graph jitted callable: fn(*inputs) -> outputs."""
        if self._jitted is None:
            weight_names = [k for k, v in self.params.items()
                            if isinstance(v, jax.Array)]
            weights = tuple(self.params[k] for k in weight_names)
            in_names = list(self.graph.inputs)

            @jax.jit
            def run(weights, args):
                env = {k: v for k, v in self.params.items()
                       if not isinstance(v, jax.Array)}
                env.update(zip(weight_names, weights))
                env.update(zip(in_names, args))
                return self._run(env)

            self._jitted = lambda *args: run(weights, args)
        return self._jitted

    def _exec(self, node: OnnxNode, ins: List, env: Dict):
        op = node.op_type
        if op == "Conv":
            return _conv(ins[0], ins[1], ins[2] if len(ins) > 2 else None, node)
        if op == "ConvTranspose":
            return _conv(ins[0], ins[1], ins[2] if len(ins) > 2 else None,
                         node, transpose=True)
        if op == "BatchNormalization":
            x, g, b, mean, var = ins[:5]
            eps = node.attr("epsilon", 1e-5)
            shape = (1, -1) + (1,) * (x.ndim - 2)
            return ((x - mean.reshape(shape)) *
                    jax.lax.rsqrt(var.reshape(shape) + eps) *
                    g.reshape(shape) + b.reshape(shape))
        if op == "InstanceNormalization":
            x, g, b = ins[:3]
            eps = node.attr("epsilon", 1e-5)
            axes = tuple(range(2, x.ndim))
            mu = jnp.mean(x, axes, keepdims=True)
            var = jnp.var(x, axes, keepdims=True)
            shape = (1, -1) + (1,) * (x.ndim - 2)
            return ((x - mu) * jax.lax.rsqrt(var + eps) * g.reshape(shape)
                    + b.reshape(shape))
        if op == "GroupNormalization":
            x, g, b = ins[:3]
            ng = int(node.attr("num_groups"))
            eps = node.attr("epsilon", 1e-5)
            B, C = x.shape[:2]
            xg = x.reshape((B, ng, C // ng) + x.shape[2:])
            axes = tuple(range(2, xg.ndim))
            mu = jnp.mean(xg, axes, keepdims=True)
            var = jnp.var(xg, axes, keepdims=True)
            xn = ((xg - mu) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
            shape = (1, -1) + (1,) * (x.ndim - 2)
            return xn * g.reshape(shape) + b.reshape(shape)
        if op == "Relu":
            return jax.nn.relu(ins[0])
        if op == "LeakyRelu":
            return jax.nn.leaky_relu(ins[0], node.attr("alpha", 0.01))
        if op == "Elu":
            return jax.nn.elu(ins[0], node.attr("alpha", 1.0))
        if op == "Sigmoid":
            return jax.nn.sigmoid(ins[0])
        if op == "Tanh":
            return jnp.tanh(ins[0])
        if op == "Clip":
            lo = ins[1] if len(ins) > 2 and ins[1] is not None else \
                node.attr("min", -jnp.inf)
            hi = ins[2] if len(ins) > 2 and ins[2] is not None else \
                node.attr("max", jnp.inf)
            return jnp.clip(ins[0], lo, hi)
        if op in ("Add", "Sub", "Mul", "Div"):
            f = {"Add": jnp.add, "Sub": jnp.subtract, "Mul": jnp.multiply,
                 "Div": jnp.divide}[op]
            return f(ins[0], ins[1])
        if op == "MatMul":
            return ins[0] @ ins[1]
        if op == "Gemm":
            a, b = ins[0], ins[1]
            if node.attr("transA", 0):
                a = a.T
            if node.attr("transB", 0):
                b = b.T
            y = node.attr("alpha", 1.0) * (a @ b)
            if len(ins) > 2 and ins[2] is not None:
                y = y + node.attr("beta", 1.0) * ins[2]
            return y
        if op == "Concat":
            return jnp.concatenate([i for i in ins if i is not None],
                                   axis=int(node.attr("axis")))
        if op == "Reshape":
            shape = [int(s) for s in np.asarray(ins[1])]
            return jnp.reshape(ins[0], shape)
        if op == "Transpose":
            return jnp.transpose(ins[0], node.attr("perm"))
        if op == "Unsqueeze":
            axes = (node.attr("axes") or
                    [int(a) for a in np.asarray(ins[1])])
            y = ins[0]
            for a in sorted(axes):
                y = jnp.expand_dims(y, a)
            return y
        if op == "Squeeze":
            axes = (node.attr("axes") or
                    ([int(a) for a in np.asarray(ins[1])]
                     if len(ins) > 1 else None))
            return jnp.squeeze(ins[0], tuple(axes) if axes else None)
        if op == "Slice":
            starts = [int(s) for s in np.asarray(ins[1])]
            ends = [int(s) for s in np.asarray(ins[2])]
            axes = ([int(s) for s in np.asarray(ins[3])] if len(ins) > 3
                    else list(range(len(starts))))
            steps = ([int(s) for s in np.asarray(ins[4])] if len(ins) > 4
                     else [1] * len(starts))
            idx = [slice(None)] * ins[0].ndim
            for s, e, a, st in zip(starts, ends, axes, steps):
                idx[a] = slice(s, None if e >= (1 << 62) else e, st)
            return ins[0][tuple(idx)]
        if op == "Pad":
            pads = [int(s) for s in np.asarray(ins[1])] if len(ins) > 1 \
                else node.attr("pads")
            n = ins[0].ndim
            cval = 0.0
            if len(ins) > 2 and ins[2] is not None:
                cval = ins[2]
            y = ins[0]
            pos = [(max(pads[i], 0), max(pads[i + n], 0)) for i in range(n)]
            if any(p != (0, 0) for p in pos):
                y = jnp.pad(y, pos, constant_values=cval)
            # negative pads crop (ONNX Pad opset>=11 semantics)
            if any(pads[i] < 0 or pads[i + n] < 0 for i in range(n)):
                idx = tuple(
                    slice(max(-pads[i], 0),
                          y.shape[i] - max(-pads[i + n], 0))
                    for i in range(n))
                y = y[idx]
            return y
        if op == "MaxPool":
            return _pool(ins[0], node, "max")
        if op == "AveragePool":
            return _pool(ins[0], node, "avg")
        if op == "GlobalAveragePool":
            return jnp.mean(ins[0], axis=tuple(range(2, ins[0].ndim)),
                            keepdims=True)
        if op == "Identity":
            return ins[0]
        if op == "Constant":
            return jnp.asarray(node.attr("value"))
        if op == "Softmax":
            return jax.nn.softmax(ins[0], axis=int(node.attr("axis", -1)))
        if op in _UNARY:
            return _UNARY[op](ins[0])
        if op in ("Max", "Min") and len(ins) != 2:
            f = jnp.maximum if op == "Max" else jnp.minimum
            y = ins[0]
            for x in ins[1:]:
                y = f(y, x)
            return y
        if op in _BINARY:
            return _BINARY[op](ins[0], ins[1])
        if op == "Where":
            return jnp.where(ins[0], ins[1], ins[2])
        if op == "Cast":
            dt = np.dtype(DTYPE[int(node.attr("to"))])
            if dt == np.int64 and not jax.config.jax_enable_x64:
                dt = np.dtype(np.int32)  # jax canonicalizes anyway
            return ins[0].astype(dt)
        if op == "Expand":
            shape = [int(s) for s in np.asarray(ins[1])]
            # ONNX Expand: mutual numpy broadcast of x and shape
            return jnp.broadcast_to(
                ins[0], np.broadcast_shapes(ins[0].shape, tuple(shape)))
        if op == "Einsum":
            return jnp.einsum(node.attr("equation"), *ins)
        if op == "CumSum":
            axis = int(np.asarray(ins[1]).reshape(()))
            y = ins[0]
            if node.attr("reverse", 0):
                y = jnp.flip(y, axis)
            y = jnp.cumsum(y, axis)
            if node.attr("exclusive", 0):
                y = jnp.roll(y, 1, axis).at[(slice(None),) * (axis % y.ndim)
                                            + (0,)].set(0)
            if node.attr("reverse", 0):
                y = jnp.flip(y, axis)
            return y
        if op == "Mod":
            if node.attr("fmod", 0):
                return jnp.fmod(ins[0], ins[1])
            return jnp.mod(ins[0], ins[1])
        if op == "Gather":
            axis = int(node.attr("axis", 0))
            return jnp.take(ins[0], ins[1].astype(jnp.int32), axis=axis)
        if op == "GatherND":
            if int(node.attr("batch_dims", 0)) != 0:
                raise NotImplementedError("GatherND batch_dims")
            idx = ins[1].astype(jnp.int32)
            return ins[0][tuple(jnp.moveaxis(idx, -1, 0))]
        if op == "ScatterND":
            data, idx, upd = ins[0], ins[1].astype(jnp.int32), ins[2]
            red = node.attr("reduction", "none")
            loc = tuple(jnp.moveaxis(idx, -1, 0))
            if red == "add":
                return data.at[loc].add(upd)
            if red in ("none", None):
                return data.at[loc].set(upd)
            raise NotImplementedError(f"ScatterND reduction {red}")
        if op == "Split":
            axis = int(node.attr("axis", 0))
            sizes = node.attr("split")
            if sizes is None and len(ins) > 1 and ins[1] is not None:
                sizes = [int(s) for s in np.asarray(ins[1])]
            offs = np.cumsum([0] + list(sizes))
            return [jax.lax.slice_in_dim(ins[0], int(offs[i]),
                                         int(offs[i + 1]), axis=axis)
                    for i in range(len(sizes))]
        if op in ("ReduceSum", "ReduceMax", "ReduceMin", "ReduceProd",
                  "ReduceMean"):
            axes = node.attr("axes")
            if axes is None and len(ins) > 1 and ins[1] is not None:
                axes = [int(a) for a in np.asarray(ins[1])]
            keep = bool(node.attr("keepdims", 1))
            f = {"ReduceSum": jnp.sum, "ReduceMax": jnp.max,
                 "ReduceMin": jnp.min, "ReduceProd": jnp.prod,
                 "ReduceMean": jnp.mean}[op]
            ax = tuple(axes) if axes else None
            return f(ins[0], axis=ax, keepdims=keep)
        if op in ("ArgMax", "ArgMin"):
            axis = int(node.attr("axis", 0))
            keep = bool(node.attr("keepdims", 1))
            f = jnp.argmax if op == "ArgMax" else jnp.argmin
            y = f(ins[0], axis=axis)
            return jnp.expand_dims(y, axis) if keep else y
        if op == "Range":
            return jnp.arange(int(np.asarray(ins[0])),
                              int(np.asarray(ins[1])),
                              int(np.asarray(ins[2])))
        if op == "Shape":
            return jnp.asarray(ins[0].shape, jnp.int64)
        if op == "Flatten":
            ax = int(node.attr("axis", 1))
            return ins[0].reshape((int(np.prod(ins[0].shape[:ax])), -1))
        if op == "Tile":
            return jnp.tile(ins[0], [int(r) for r in np.asarray(ins[1])])
        if op == "Resize":
            scales = np.asarray(ins[2]) if len(ins) > 2 and ins[2] is not None \
                else None
            x = ins[0]
            if scales is None or scales.size == 0:
                sizes = [int(s) for s in np.asarray(ins[3])]
            else:
                sizes = [int(round(d * s)) for d, s in
                         zip(x.shape, np.asarray(scales))]
            mode = node.attr("mode", "nearest")
            method = "nearest" if "nearest" in str(mode) else "linear"
            return jax.image.resize(x, sizes, method=method)
        raise NotImplementedError(f"ONNX op not supported: {op}")
