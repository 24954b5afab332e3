"""jaxpr -> ONNX converter (C47, reference rvc/onnx/exporter.py role).

The reference exports its synthesizer with torch.onnx.export at opset 17
with an external noise input `rnd` (rvc/onnx/exporter.py:6-51).  The
TPU-native equivalent traces a jitted JAX function to a jaxpr and maps each
primitive to ONNX ops, producing a standard opset-17 model — usable by any
ONNX runtime, and executable in-repo by `tpu_rvc.models.onnx_exec` (which
doubles as the round-trip parity oracle in tests).

Design:
  1. the full program is flattened: nested `jit`/`custom_jvp`/`remat` call
     eqns are inlined so one linear eqn list remains;
  2. dead-code elimination drops unused chains (e.g. PRNG seeding on the
     deterministic export path);
  3. constant folding: any eqn whose inputs are all compile-time constants
     (weights, iota index grids, im2col weight shuffles) is evaluated
     eagerly and becomes an initializer — exactly what torch tracing does;
  4. the remaining eqns are emitted as ONNX nodes.  Shapes are static
     (the XLA compilation model); dynamic_axes annotations are cosmetic
     dim_params on the value_infos, kept for API parity.

Gather/scatter use the generic transpose+GatherND/ScatterND lowering; the
dimension-number patterns that appear in tpu_rvc graphs (embeddings,
banded relative attention shuffles) are all covered by it.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import core as jcore

from .onnx_reader import encode_model, encode_node, ONNX_DTYPE

try:  # jax >= 0.6 moved Literal
    from jax._src.core import Literal
except Exception:  # pragma: no cover
    from jax.core import Literal  # type: ignore

_FOLD_LIMIT = 64 * 1024 * 1024  # max elements*4 bytes folded into an initializer

# primitives inlined by flattening (their param holding the sub-jaxpr)
_CALL_PRIMS = {
    "pjit": "jaxpr", "jit": "jaxpr", "closed_call": "call_jaxpr",
    "custom_jvp_call": "call_jaxpr", "custom_vjp_call": "call_jaxpr",
    "custom_vjp_call_jaxpr": "fun_jaxpr", "remat": "jaxpr",
    "checkpoint": "jaxpr", "remat2": "jaxpr",
}

# primitives that are pure pass-throughs
_IDENTITY_PRIMS = {"stop_gradient", "copy", "reduce_precision",
                   "optimization_barrier"}


class _Ref:
    """A value flowing through the flattened program."""
    __slots__ = ("const", "name", "aval")

    def __init__(self, const=None, name=None, aval=None):
        self.const = const          # np.ndarray if compile-time constant
        self.name = name            # ONNX tensor name once emitted
        self.aval = aval

    @property
    def is_const(self):
        return self.const is not None


class _FlatEqn:
    __slots__ = ("prim", "invals", "outrefs", "params")

    def __init__(self, prim, invals, outrefs, params):
        self.prim = prim
        self.invals = invals
        self.outrefs = outrefs
        self.params = params


def _flatten(jaxpr: jcore.Jaxpr, consts: Sequence, args: Sequence[_Ref],
             eqns: List[_FlatEqn]) -> List[_Ref]:
    env: Dict[Any, _Ref] = {}

    def read(v) -> _Ref:
        if isinstance(v, Literal):
            return _Ref(const=np.asarray(v.val), aval=v.aval)
        return env[v]

    for var, c in zip(jaxpr.constvars, consts):
        env[var] = _Ref(const=np.asarray(c), aval=var.aval)
    for var, a in zip(jaxpr.invars, args):
        env[var] = a

    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        invals = [read(v) for v in eqn.invars]
        if name in _CALL_PRIMS:
            sub = eqn.params[_CALL_PRIMS[name]]
            if hasattr(sub, "jaxpr"):  # ClosedJaxpr
                outs = _flatten(sub.jaxpr, sub.consts, invals, eqns)
            else:  # open Jaxpr
                outs = _flatten(sub, (), invals, eqns)
            for var, ref in zip(eqn.outvars, outs):
                env[var] = ref
        elif name in _IDENTITY_PRIMS:
            env[eqn.outvars[0]] = invals[0]
        else:
            outrefs = [_Ref(aval=v.aval) for v in eqn.outvars]
            eqns.append(_FlatEqn(eqn.primitive, invals, outrefs, eqn.params))
            for var, ref in zip(eqn.outvars, outrefs):
                env[var] = ref
    return [read(v) for v in jaxpr.outvars]


def _dce(eqns: List[_FlatEqn], outputs: List[_Ref]) -> List[_FlatEqn]:
    live = {id(r) for r in outputs}
    kept: List[_FlatEqn] = []
    for eqn in reversed(eqns):
        if any(id(r) in live for r in eqn.outrefs):
            kept.append(eqn)
            live.update(id(r) for r in eqn.invals)
    kept.reverse()
    return kept


def _fold(eqn: _FlatEqn) -> bool:
    """Evaluate an all-constant eqn eagerly; returns True on success."""
    if not all(r.is_const for r in eqn.invals):
        return False
    n_out = sum(int(np.prod(r.aval.shape)) for r in eqn.outrefs)
    if n_out > _FOLD_LIMIT:
        return False
    try:
        vals = eqn.prim.bind(*[jnp.asarray(r.const) for r in eqn.invals],
                             **eqn.params)
    except Exception:
        return False
    if not isinstance(vals, (list, tuple)):
        vals = [vals]
    for ref, val in zip(eqn.outrefs, vals):
        ref.const = np.asarray(val)
    return True


class _Builder:
    def __init__(self):
        self.nodes: List[bytes] = []
        self.initializers: Dict[str, np.ndarray] = {}
        self._n = 0
        self._const_names: Dict[int, str] = {}

    def fresh(self, hint="v") -> str:
        self._n += 1
        return f"{hint}_{self._n}"

    def const(self, arr: np.ndarray, hint="c") -> str:
        arr = np.asarray(arr)
        if arr.dtype == np.bool_:
            pass
        elif arr.dtype not in ONNX_DTYPE:
            arr = arr.astype(np.float32)
        # dedup small constants by value; big tensors by identity only
        # (hash-of-bytes collisions would silently alias distinct weights,
        # so the full key is kept for the small ones)
        if arr.nbytes <= 1 << 16:
            key = (arr.tobytes(), str(arr.dtype), arr.shape)
        else:
            key = id(arr)
        if key in self._const_names:
            return self._const_names[key]
        name = self.fresh(hint)
        self.initializers[name] = arr
        self._const_names[key] = name
        return name

    def node(self, op: str, inputs: List[str], n_out: int = 1,
             outputs: Optional[List[str]] = None, **attrs) -> List[str]:
        if outputs is None:
            outputs = [self.fresh(op.lower()) for _ in range(n_out)]
        self.nodes.append(encode_node(op, inputs, outputs, **attrs))
        return outputs

    def read(self, ref: _Ref) -> str:
        """ONNX name for a ref, materializing constants as initializers."""
        if ref.name is None:
            if not ref.is_const:
                raise ValueError("value used before definition")
            ref.name = self.const(ref.const)
        return ref.name


def _np_dtype(aval) -> np.dtype:
    return np.dtype(aval.dtype)


def _elem_type(dtype) -> int:
    d = np.dtype(dtype)
    if d not in ONNX_DTYPE:
        raise NotImplementedError(f"ONNX export: unsupported dtype {d}")
    return ONNX_DTYPE[d]


# ---------------------------------------------------------------------------
# per-primitive emitters
# ---------------------------------------------------------------------------

_BINOP = {"add": "Add", "sub": "Sub", "mul": "Mul", "div": "Div",
          "max": "Max", "min": "Min", "pow": "Pow",
          "and": "And", "or": "Or", "xor": "Xor"}
_UNOP = {"neg": "Neg", "exp": "Exp", "log": "Log", "tanh": "Tanh",
         "logistic": "Sigmoid", "sin": "Sin", "cos": "Cos", "abs": "Abs",
         "sign": "Sign", "floor": "Floor", "ceil": "Ceil", "sqrt": "Sqrt",
         "erf": "Erf", "not": "Not", "is_finite": None}
_CMP = {"eq": "Equal", "gt": "Greater", "lt": "Less",
        "ge": "GreaterOrEqual", "le": "LessOrEqual"}


def _i64(b: _Builder, vals) -> str:
    return b.const(np.asarray(vals, np.int64))


def _emit(b: _Builder, eqn: _FlatEqn) -> None:
    prim = eqn.prim.name
    p = eqn.params
    ins = eqn.invals
    outs = eqn.outrefs
    out_shape = tuple(outs[0].aval.shape) if outs else ()

    def names():
        return [b.read(r) for r in ins]

    def set_out(name: str, i=0):
        outs[i].name = name

    if prim in _BINOP:
        set_out(b.node(_BINOP[prim], names())[0])
    elif prim in _CMP:
        set_out(b.node(_CMP[prim], names())[0])
    elif prim == "ne":
        e = b.node("Equal", names())[0]
        set_out(b.node("Not", [e])[0])
    elif prim in _UNOP and _UNOP[prim]:
        set_out(b.node(_UNOP[prim], names())[0])
    elif prim == "rsqrt":
        s = b.node("Sqrt", names())[0]
        set_out(b.node("Reciprocal", [s])[0])
    elif prim == "square":
        x = names()[0]
        set_out(b.node("Mul", [x, x])[0])
    elif prim == "log1p":
        one = b.const(np.ones((), _np_dtype(ins[0].aval)))
        s = b.node("Add", [names()[0], one])[0]
        set_out(b.node("Log", [s])[0])
    elif prim == "erfc":
        one = b.const(np.ones((), _np_dtype(ins[0].aval)))
        e = b.node("Erf", names())[0]
        set_out(b.node("Sub", [one, e])[0])
    elif prim == "expm1":
        one = b.const(np.ones((), _np_dtype(ins[0].aval)))
        e = b.node("Exp", names())[0]
        set_out(b.node("Sub", [e, one])[0])
    elif prim == "integer_pow":
        y = b.const(np.asarray(p["y"], _np_dtype(ins[0].aval)))
        set_out(b.node("Pow", [names()[0], y])[0])
    elif prim == "rem":
        set_out(b.node("Mod", names(), fmod=1)[0])
    elif prim == "round":
        meth = str(p.get("rounding_method", ""))
        x = names()[0]
        if "AWAY" in meth.upper():
            half = b.const(np.asarray(0.5, _np_dtype(ins[0].aval)))
            ax = b.node("Abs", [x])[0]
            fl = b.node("Floor", [b.node("Add", [ax, half])[0]])[0]
            sg = b.node("Sign", [x])[0]
            set_out(b.node("Mul", [sg, fl])[0])
        else:
            set_out(b.node("Round", [x])[0])
    elif prim == "clamp":
        lo, x, hi = names()
        m = b.node("Min", [x, hi])[0]
        set_out(b.node("Max", [m, lo])[0])
    elif prim == "convert_element_type":
        set_out(b.node("Cast", names(), to=_elem_type(p["new_dtype"]))[0])
    elif prim == "select_n":
        pred, *cases = ins
        pn = b.read(pred)
        if np.dtype(pred.aval.dtype) == np.bool_ and len(cases) == 2:
            set_out(b.node("Where", [pn, b.read(cases[1]),
                                     b.read(cases[0])])[0])
        else:
            acc = b.read(cases[-1])
            for i in range(len(cases) - 2, -1, -1):
                iv = b.const(np.asarray(i, _np_dtype(pred.aval)))
                cond = b.node("Equal", [pn, iv])[0]
                acc = b.node("Where", [cond, b.read(cases[i]), acc])[0]
            set_out(acc)
    elif prim == "reshape":
        x = names()[0]
        if p.get("dimensions") is not None:
            x = b.node("Transpose", [x], perm=list(p["dimensions"]))[0]
        set_out(b.node("Reshape", [x, _i64(b, out_shape)])[0])
    elif prim == "squeeze":
        set_out(b.node("Reshape", [names()[0], _i64(b, out_shape)])[0])
    elif prim == "expand_dims":
        set_out(b.node("Reshape", [names()[0], _i64(b, out_shape)])[0])
    elif prim == "transpose":
        set_out(b.node("Transpose", names(),
                       perm=list(p["permutation"]))[0])
    elif prim == "broadcast_in_dim":
        x = ins[0]
        bd = p["broadcast_dimensions"]
        mid = [1] * len(out_shape)
        for i, d in enumerate(bd):
            mid[d] = x.aval.shape[i]
        xn = b.read(x)
        if tuple(mid) != tuple(x.aval.shape):
            xn = b.node("Reshape", [xn, _i64(b, mid)])[0]
        if tuple(mid) == out_shape:
            set_out(xn)
        else:
            set_out(b.node("Expand", [xn, _i64(b, out_shape)])[0])
    elif prim == "concatenate":
        set_out(b.node("Concat", names(), axis=int(p["dimension"]))[0])
    elif prim == "split":
        axis = int(p["axis"])
        sizes = [int(s) for s in p["sizes"]]
        out_names = b.node("Split", [names()[0], _i64(b, sizes)],
                           n_out=len(sizes), axis=axis)
        for i, n in enumerate(out_names):
            set_out(n, i)
    elif prim == "rev":
        dims = list(p["dimensions"])
        x = ins[0]
        starts = [x.aval.shape[d] - 1 for d in dims]
        ends = [-(x.aval.shape[d] + 1) for d in dims]
        set_out(b.node("Slice", [names()[0], _i64(b, starts), _i64(b, ends),
                                 _i64(b, dims), _i64(b, [-1] * len(dims))])[0])
    elif prim == "slice":
        starts = [int(s) for s in p["start_indices"]]
        ends = [int(e) for e in p["limit_indices"]]
        strides = p.get("strides")
        steps = [int(s) for s in strides] if strides else [1] * len(starts)
        axes = list(range(len(starts)))
        set_out(b.node("Slice", [names()[0], _i64(b, starts), _i64(b, ends),
                                 _i64(b, axes), _i64(b, steps)])[0])
    elif prim == "pad":
        x, val = ins
        cfg = p["padding_config"]
        if any(i != 0 for _, _, i in cfg):
            raise NotImplementedError("ONNX export: interior padding")
        pads = [lo for lo, _, _ in cfg] + [hi for _, hi, _ in cfg]
        set_out(b.node("Pad", [b.read(x), _i64(b, pads), b.read(val)],
                       mode="constant")[0])
    elif prim == "dynamic_slice":
        x, *starts = ins
        sizes = [int(s) for s in p["slice_sizes"]]
        if all(s.is_const for s in starts):
            st = [int(np.clip(int(s.const), 0, d - sz)) for s, d, sz in
                  zip(starts, x.aval.shape, sizes)]
            en = [a + s for a, s in zip(st, sizes)]
            set_out(b.node("Slice", [b.read(x), _i64(b, st), _i64(b, en),
                                     _i64(b, range(len(sizes)))])[0])
        else:
            parts = []
            for s in starts:
                sn = b.node("Cast", [b.read(s)], to=7)[0]
                parts.append(b.node("Reshape", [sn, _i64(b, [1])])[0])
            st = b.node("Concat", parts, axis=0)[0]
            hi = _i64(b, [d - sz for d, sz in zip(x.aval.shape, sizes)])
            lo = _i64(b, [0] * len(sizes))
            st = b.node("Max", [b.node("Min", [st, hi])[0], lo])[0]
            en = b.node("Add", [st, _i64(b, sizes)])[0]
            set_out(b.node("Slice", [b.read(x), st, en,
                                     _i64(b, range(len(sizes)))])[0])
    elif prim == "iota":
        dt = np.dtype(p["dtype"])
        arr = np.broadcast_to(
            np.arange(p["shape"][p["dimension"]], dtype=dt).reshape(
                [-1 if i == p["dimension"] else 1
                 for i in range(len(p["shape"]))]), p["shape"])
        set_out(b.const(np.ascontiguousarray(arr)))
    elif prim == "cumsum":
        ax = b.const(np.asarray(p["axis"], np.int64))
        set_out(b.node("CumSum", [names()[0], ax],
                       reverse=int(bool(p.get("reverse"))))[0])
    elif prim in ("reduce_sum", "reduce_max", "reduce_min", "reduce_prod"):
        axes = list(p["axes"])
        x = names()[0]
        if prim == "reduce_sum":
            set_out(b.node("ReduceSum", [x, _i64(b, axes)], keepdims=0)[0])
        else:
            op = {"reduce_max": "ReduceMax", "reduce_min": "ReduceMin",
                  "reduce_prod": "ReduceProd"}[prim]
            set_out(b.node(op, [x], axes=axes, keepdims=0)[0])
    elif prim in ("reduce_and", "reduce_or"):
        x = b.node("Cast", names(), to=6)[0]
        op = "ReduceMin" if prim == "reduce_and" else "ReduceMax"
        r = b.node(op, [x], axes=list(p["axes"]), keepdims=0)[0]
        set_out(b.node("Cast", [r], to=9)[0])
    elif prim in ("argmax", "argmin"):
        (axis,) = p["axes"]
        op = "ArgMax" if prim == "argmax" else "ArgMin"
        r = b.node(op, names(), axis=int(axis), keepdims=0)[0]
        set_out(b.node("Cast", [r], to=_elem_type(p["index_dtype"]))[0])
    elif prim == "dot_general":
        _emit_dot_general(b, eqn)
    elif prim == "conv_general_dilated":
        _emit_conv(b, eqn)
    elif prim == "gather":
        _emit_gather(b, eqn)
    elif prim in ("scatter-add", "scatter"):
        _emit_scatter(b, eqn)
    elif prim == "sort":
        raise NotImplementedError("ONNX export: sort")
    else:
        raise NotImplementedError(f"ONNX export: primitive `{prim}` "
                                  f"(shapes {[r.aval.shape for r in ins]})")


def _emit_dot_general(b: _Builder, eqn: _FlatEqn) -> None:
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs, rhs = eqn.invals
    ln, rn = lhs.aval.ndim, rhs.aval.ndim
    letters = iter("abcdefghijklmnopqrstuvwxyz")
    l_sub = [""] * ln
    r_sub = [""] * rn
    for i, j in zip(lb, rb):
        c = next(letters)
        l_sub[i] = c
        r_sub[j] = c
    for i, j in zip(lc, rc):
        c = next(letters)
        l_sub[i] = c
        r_sub[j] = c
    out = [l_sub[i] for i in lb]
    for i in range(ln):
        if not l_sub[i]:
            l_sub[i] = next(letters)
            out.append(l_sub[i])
    for j in range(rn):
        if not r_sub[j]:
            r_sub[j] = next(letters)
            out.append(r_sub[j])
    eqs = f"{''.join(l_sub)},{''.join(r_sub)}->{''.join(out)}"
    a, bb = b.read(lhs), b.read(rhs)
    res = b.node("Einsum", [a, bb], equation=eqs)[0]
    out_dt = np.dtype(eqn.outrefs[0].aval.dtype)
    if out_dt != np.result_type(lhs.aval.dtype, rhs.aval.dtype):
        res = b.node("Cast", [res], to=_elem_type(out_dt))[0]
    eqn.outrefs[0].name = res


def _transpose_ref(b: _Builder, ref: _Ref, perm) -> str:
    """Transpose, folding on constants."""
    if list(perm) == list(range(ref.aval.ndim)):
        return b.read(ref)
    if ref.is_const:
        return b.const(np.ascontiguousarray(np.transpose(ref.const, perm)))
    return b.node("Transpose", [b.read(ref)], perm=list(perm))[0]


def _emit_conv(b: _Builder, eqn: _FlatEqn) -> None:
    p = eqn.params
    lhs, rhs = eqn.invals
    dn = p["dimension_numbers"]
    strides = [int(s) for s in p["window_strides"]]
    pads = [(int(lo), int(hi)) for lo, hi in p["padding"]]
    lhs_dil = [int(d) for d in (p.get("lhs_dilation") or [])]
    rhs_dil = [int(d) for d in (p.get("rhs_dilation") or [])]
    groups = int(p.get("feature_group_count", 1))
    if int(p.get("batch_group_count", 1)) != 1:
        raise NotImplementedError("ONNX export: batch_group_count")
    spatial = len(strides)

    x = _transpose_ref(b, lhs, list(dn.lhs_spec))
    # handle negative padding by pre-slicing
    if any(lo < 0 or hi < 0 for lo, hi in pads):
        x_shape = [lhs.aval.shape[d] for d in dn.lhs_spec]
        starts, ends, axes = [], [], []
        new_pads = []
        for i, (lo, hi) in enumerate(pads):
            s = max(0, -lo)
            e = x_shape[2 + i] - max(0, -hi)
            if s or e != x_shape[2 + i]:
                starts.append(s)
                ends.append(e)
                axes.append(2 + i)
            new_pads.append((max(lo, 0), max(hi, 0)))
        x = b.node("Slice", [x, _i64(b, starts), _i64(b, ends),
                             _i64(b, axes)])[0]
        pads = new_pads

    onnx_pads = [lo for lo, _ in pads] + [hi for _, hi in pads]
    transposed = any(d != 1 for d in lhs_dil)
    if transposed:
        if any(s != 1 for s in strides):
            raise NotImplementedError("ONNX export: conv with both "
                                      "lhs_dilation and strides")
        if any(d != 1 for d in rhs_dil):
            raise NotImplementedError("ONNX export: dilated ConvTranspose")
        if groups != 1:
            raise NotImplementedError("ONNX export: grouped ConvTranspose")
        # weight OI*k -> flip spatial, swap to IO*k
        if rhs.is_const:
            w = np.transpose(rhs.const, list(dn.rhs_spec))
            w = np.flip(w, axis=tuple(range(2, w.ndim)))
            w = np.ascontiguousarray(np.swapaxes(w, 0, 1))
            wn = b.const(w)
            kshape = w.shape[2:]
        else:
            wn = _transpose_ref(b, rhs, list(dn.rhs_spec))
            kshape = [rhs.aval.shape[d] for d in dn.rhs_spec][2:]
            starts = [k - 1 for k in kshape]
            ends = [-(k + 1) for k in kshape]
            axes = list(range(2, 2 + spatial))
            wn = b.node("Slice", [wn, _i64(b, starts), _i64(b, ends),
                                  _i64(b, axes), _i64(b, [-1] * spatial)])[0]
            wn = b.node("Transpose", [wn],
                        perm=[1, 0] + list(range(2, 2 + spatial)))[0]
        ct_pads = ([k - 1 - lo for k, (lo, _) in zip(kshape, pads)] +
                   [k - 1 - hi for k, (_, hi) in zip(kshape, pads)])
        if any(q < 0 for q in ct_pads):
            raise NotImplementedError("ONNX export: ConvTranspose negative pad")
        y = b.node("ConvTranspose", [x, wn], strides=lhs_dil,
                   pads=ct_pads, group=1)[0]
    else:
        wn = _transpose_ref(b, rhs, list(dn.rhs_spec))
        y = b.node("Conv", [x, wn], strides=strides, pads=onnx_pads,
                   dilations=rhs_dil or [1] * spatial, group=groups)[0]
    # y is NC*spatial; out_spec[i] = the jax output axis holding NC* dim i,
    # so jax axis a reads y axis perm[a] with perm[out_spec[i]] = i
    out_spec = list(dn.out_spec)
    perm = [0] * len(out_spec)
    for ncs_pos, jax_axis in enumerate(out_spec):
        perm[jax_axis] = ncs_pos
    if perm != list(range(len(perm))):
        y = b.node("Transpose", [y], perm=perm)[0]
    eqn.outrefs[0].name = y


def _gather_pattern(operand_shape, dnums, slice_sizes):
    """Classify a gather/scatter dim-numbers layout.

    Returns (idx_dims, full_dims) where idx_dims are operand dims indexed
    pointwise (slice size 1, collapsed) in start_index_map order and
    full_dims are operand dims taken whole, or None if unsupported."""
    sim = list(dnums.start_index_map)
    collapsed = set(getattr(dnums, "collapsed_slice_dims", ()) or
                    getattr(dnums, "inserted_window_dims", ()))
    if getattr(dnums, "operand_batching_dims", ()):
        return None
    full = []
    for d in range(len(operand_shape)):
        if d in sim:
            if slice_sizes is not None and slice_sizes[d] != 1:
                return None
            if d not in collapsed:
                return None
        else:
            if slice_sizes is not None and slice_sizes[d] != operand_shape[d]:
                return None
            if d in collapsed:
                return None
            full.append(d)
    return sim, full


def _emit_gather(b: _Builder, eqn: _FlatEqn) -> None:
    operand, indices = eqn.invals
    dn = eqn.params["dimension_numbers"]
    slice_sizes = eqn.params["slice_sizes"]
    pat = _gather_pattern(operand.aval.shape, dn, slice_sizes)
    if pat is None:
        raise NotImplementedError(
            f"ONNX export: gather pattern {dn} sizes {slice_sizes}")
    idx_dims, full_dims = pat
    k = len(idx_dims)
    batch_shape = tuple(indices.aval.shape[:-1])

    data = _transpose_ref(b, operand, idx_dims + full_dims)
    idx = b.read(indices)
    if np.dtype(indices.aval.dtype) != np.int64:
        idx = b.node("Cast", [idx], to=7)[0]
    g = b.node("GatherND", [data, idx])[0]
    # g axes: batch_shape + full_dims-sized; jax output places full dims at
    # offset_dims positions, batch dims at the rest (in order)
    offset = list(dn.offset_dims)
    out_rank = len(batch_shape) + len(full_dims)
    perm_target = []  # for each output axis, which g axis feeds it
    bi = 0
    for pos in range(out_rank):
        if pos in offset:
            perm_target.append(len(batch_shape) + offset.index(pos))
        else:
            perm_target.append(bi)
            bi += 1
    if perm_target != list(range(out_rank)):
        g = b.node("Transpose", [g], perm=perm_target)[0]
    eqn.outrefs[0].name = g


def _emit_scatter(b: _Builder, eqn: _FlatEqn) -> None:
    operand, indices, updates = eqn.invals
    dn = eqn.params["dimension_numbers"]
    prim = eqn.prim.name
    reduction = "add" if prim == "scatter-add" else "none"
    idx_dims = list(dn.scatter_dims_to_operand_dims)
    inserted = set(dn.inserted_window_dims)
    if (getattr(dn, "operand_batching_dims", ()) or
            set(idx_dims) != inserted):
        raise NotImplementedError(f"ONNX export: scatter pattern {dn}")
    full_dims = [d for d in range(operand.aval.ndim) if d not in inserted]
    uw = list(dn.update_window_dims)
    batch_rank = updates.aval.ndim - len(uw)

    data = _transpose_ref(b, operand, idx_dims + full_dims)
    # updates: window dims at uw positions map to full_dims in order;
    # ONNX wants (batch..., full...)
    upd_perm = [d for d in range(updates.aval.ndim) if d not in uw] + uw
    upd = _transpose_ref(b, updates, upd_perm)
    idx = b.read(indices)
    if np.dtype(indices.aval.dtype) != np.int64:
        idx = b.node("Cast", [idx], to=7)[0]
    s = b.node("ScatterND", [data, idx, upd], reduction=reduction)[0]
    # transpose back: data was permuted by idx_dims+full_dims
    perm = idx_dims + full_dims
    inv = [0] * len(perm)
    for pos, d in enumerate(perm):
        inv[d] = pos
    if inv != list(range(len(perm))):
        s = b.node("Transpose", [s], perm=inv)[0]
    eqn.outrefs[0].name = s


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def export_fn_to_onnx(
    fn,
    params,
    example_inputs: Sequence,
    input_names: Sequence[str],
    output_names: Sequence[str],
    dynamic_axes: Optional[Dict[str, Sequence[int]]] = None,
    input_dtype_overrides: Optional[Dict[str, np.dtype]] = None,
) -> bytes:
    """Trace `fn(params, *inputs)` and serialize it as an ONNX model.

    `params` (a pytree of weights) is baked into the graph as initializers;
    `example_inputs` define the graph inputs.  Returns serialized
    ModelProto bytes (opset 17, matching reference rvc/onnx/exporter.py:46).
    `dynamic_axes` maps an input/output name to axes annotated with
    dim_params — cosmetic on an XLA-derived static graph, kept for
    reference-API parity.
    """
    closed = jax.make_jaxpr(fn)(params, *example_inputs)
    flat_params = jax.tree_util.tree_leaves(params)
    n_params = len(flat_params)

    args: List[_Ref] = []
    for i, var in enumerate(closed.jaxpr.invars):
        if i < n_params:
            args.append(_Ref(const=np.asarray(flat_params[i]), aval=var.aval))
        else:
            args.append(_Ref(aval=var.aval))
    in_refs = args[n_params:]
    if len(in_refs) != len(input_names):
        raise ValueError(f"{len(input_names)} input names for "
                         f"{len(in_refs)} graph inputs")
    for ref, name in zip(in_refs, input_names):
        ref.name = name

    eqns: List[_FlatEqn] = []
    out_refs = _flatten(closed.jaxpr, closed.consts, args, eqns)
    eqns = _dce(eqns, out_refs)

    b = _Builder()
    # Inputs whose DECLARED dtype differs from the traced dtype get an
    # entry Cast (e.g. int64 graph inputs cast to jax's canonical int32 —
    # reference consumers feed int64, rvc/onnx/infer.py:60-66).
    decl_types = {}
    for ref, name in zip(in_refs, input_names):
        ext = (input_dtype_overrides or {}).get(name)
        if ext is not None and np.dtype(ext) != np.dtype(ref.aval.dtype):
            decl_types[name] = _elem_type(np.dtype(ext))
            ref.name = b.node("Cast", [name],
                              to=_elem_type(ref.aval.dtype))[0]
    for eqn in eqns:
        if not _fold(eqn):
            _emit(b, eqn)

    if len(out_refs) != len(output_names):
        raise ValueError(f"{len(output_names)} output names for "
                         f"{len(out_refs)} graph outputs")
    final_outs = []
    for ref, name in zip(out_refs, output_names):
        src = b.read(ref)
        b.node("Identity", [src], outputs=[name])
        final_outs.append(name)

    dyn = dynamic_axes or {}

    def vinfo(ref: _Ref, name: str):
        shape = list(ref.aval.shape)
        for ax in dyn.get(name, ()):
            shape[ax] = f"{name}_dim{ax}"
        return (name, decl_types.get(name, _elem_type(ref.aval.dtype)),
                tuple(shape))

    return encode_model(
        b.nodes, b.initializers,
        [vinfo(r, n) for r, n in zip(in_refs, input_names)],
        [vinfo(r, n) for r, n in zip(out_refs, output_names)],
        opset=17)


def export_synthesizer_onnx(synth, variables, *, T: int = 200,
                            path: Optional[str] = None,
                            spk_mix: bool = False,
                            reference_layout: bool = False) -> bytes:
    """Export a synthesizer to ONNX with the reference's I/O contract
    (rvc/onnx/exporter.py:24-28,34-47): inputs phone/phone_lengths/pitch/
    pitchf/ds/rnd -> audio, noise supplied externally via `rnd`.

    Contract parity notes vs the torch exporter:
    - integer inputs (phone_lengths/pitch/ds) are DECLARED int64 exactly
      like the reference (its consumer rvc/onnx/infer.py:60-66 feeds
      int64); an entry Cast narrows them to the graph's int32.
    - by default rnd is channel-last (1, T, inter_channels) — the tpu_rvc
      layout convention — where the torch reference uses (1, 192, T).

    reference_layout=True removes that divergence for drop-in use by
    existing RVC ONNX consumers: `rnd` becomes (1, inter_channels, T) and
    `audio` (1, 1, samples) via boundary transposes, and the model carries
    the reference exporter's exact dynamic-axis annotations (phone dim 1,
    pitch dim 1, pitchf dim 1, rnd dim 2 — rvc/onnx/exporter.py:40-45).
    NOTE the payload graph is still compiled at the exported T (the XLA
    static-shape model); export one model per length bucket and pad to the
    bucket, as tpu_rvc's own OnnxRVC consumer does (pipeline/onnx_infer.py).

    spk_mix=True exports the speaker-mix variant (reference
    rvc/onnx/synthesizer.py:60 construct_spkmixmap): the `ds` input
    becomes float32 (1, T, n_speakers) per-frame mixing weights over the
    speaker embedding table instead of an int id, so consumers can morph
    between speakers mid-utterance."""
    inter = synth.inter_channels
    if reference_layout and spk_mix:
        raise ValueError("reference_layout applies to the reference's "
                         "exporter contract; the spk_mix variant is a "
                         "tpu_rvc extension with no reference layout")

    if spk_mix:
        S = synth.spk_embed_dim
        if synth.use_f0:
            def fwd(variables, phone, phone_lengths, pitch, pitchf, ds, rnd):
                return synth.apply(variables, phone, phone_lengths, ds,
                                   pitch, pitchf, noise=rnd,
                                   method=synth.infer_mix)
            inputs = (
                jnp.zeros((1, T, synth.encoder_dim), jnp.float32),
                jnp.asarray([T], jnp.int32),
                jnp.zeros((1, T), jnp.int32),
                jnp.zeros((1, T), jnp.float32),
                jnp.zeros((1, T, S), jnp.float32),
                jnp.zeros((1, T, inter), jnp.float32),
            )
            input_names = ["phone", "phone_lengths", "pitch", "pitchf",
                           "ds", "rnd"]
        else:
            def fwd(variables, phone, phone_lengths, ds, rnd):
                return synth.apply(variables, phone, phone_lengths, ds,
                                   noise=rnd, method=synth.infer_mix)
            inputs = (
                jnp.zeros((1, T, synth.encoder_dim), jnp.float32),
                jnp.asarray([T], jnp.int32),
                jnp.zeros((1, T, S), jnp.float32),
                jnp.zeros((1, T, inter), jnp.float32),
            )
            input_names = ["phone", "phone_lengths", "ds", "rnd"]
        int64_in = {n: np.int64 for n in input_names
                    if n in ("phone_lengths", "pitch")}
        data = export_fn_to_onnx(fwd, variables, inputs, input_names,
                                 ["audio"],
                                 input_dtype_overrides=int64_in)
        if path is not None:
            with open(path, "wb") as f:
                f.write(data)
        return data

    # boundary adapters for reference_layout: rnd arrives channel-first,
    # audio leaves channel-first (torch Conv1d layout, exporter.py:16,
    # synthesizer.py:84 `o = self.dec(...)` (B, 1, samples))
    def _rnd_in(rnd):
        return jnp.transpose(rnd, (0, 2, 1)) if reference_layout else rnd

    def _audio_out(audio):
        return jnp.transpose(audio, (0, 2, 1)) if reference_layout else audio

    rnd_shape = (1, inter, T) if reference_layout else (1, T, inter)

    if synth.use_f0:
        def fwd(variables, phone, phone_lengths, pitch, pitchf, ds, rnd):
            return _audio_out(synth.apply(
                variables, phone, phone_lengths, ds, pitch,
                pitchf, noise=_rnd_in(rnd), noise_scale=1.0,
                deterministic=True, method=synth.infer))
        inputs = (
            jnp.zeros((1, T, synth.encoder_dim), jnp.float32),
            jnp.asarray([T], jnp.int32),
            jnp.zeros((1, T), jnp.int32),
            jnp.zeros((1, T), jnp.float32),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros(rnd_shape, jnp.float32),
        )
        input_names = ["phone", "phone_lengths", "pitch", "pitchf", "ds",
                       "rnd"]
    else:
        def fwd(variables, phone, phone_lengths, ds, rnd):
            return _audio_out(synth.apply(
                variables, phone, phone_lengths, ds,
                noise=_rnd_in(rnd), noise_scale=1.0,
                deterministic=True, method=synth.infer))
        inputs = (
            jnp.zeros((1, T, synth.encoder_dim), jnp.float32),
            jnp.asarray([T], jnp.int32),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros(rnd_shape, jnp.float32),
        )
        input_names = ["phone", "phone_lengths", "ds", "rnd"]

    # Default: no dynamic_axes — the graph IS static (XLA compilation
    # model); Reshape shapes hard-code T, so advertising dynamic dims would
    # mislead consumers.  Export one model per length bucket instead (the
    # pipeline's approach).  reference_layout mode carries the reference
    # exporter's annotations verbatim for ecosystem tooling that keys on
    # them (rvc/onnx/exporter.py:40-45); the bucket-padding caveat is in
    # the docstring.
    dyn = None
    if reference_layout:
        dyn = {"phone": [1], "pitchf": [1], "rnd": [2]}
        if synth.use_f0:
            dyn["pitch"] = [1]
    int64_in = {n: np.int64 for n in input_names
                if n in ("phone_lengths", "pitch", "ds")}
    data = export_fn_to_onnx(fwd, variables, inputs, input_names, ["audio"],
                             dynamic_axes=dyn,
                             input_dtype_overrides=int64_in)
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data


def export_hubert_onnx(hubert, variables, *, n_samples: int = 16000 * 5,
                       path: Optional[str] = None) -> bytes:
    """Export the HuBERT/ContentVec encoder to ONNX — the role of the
    reference's downloaded `vec-{256,768}-layer-{9,12}.onnx` assets
    (consumed at rvc/onnx/infer.py:28-46).  Input `wav` is (1, n_samples)
    float32 at 16 kHz; output channel-last features."""
    def fwd(variables, wav):
        return hubert.apply(variables, wav)

    wav = jnp.zeros((1, n_samples), jnp.float32)
    data = export_fn_to_onnx(fwd, variables, [wav], ["wav"], ["feats"])
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data
