"""jaxpr -> ONNX graph converter.

Traces a JAX function with ``jax.make_jaxpr`` and lowers the jaxpr to an
ONNX ``ModelProto`` (default opset 16, same as the reference's torch
export, reference modules/diff/diffusion_V2.py:252-352).

Design:

- **Constant folding**: any equation whose inputs are all compile-time
  constants (closed-over params, tables, iota, ...) is evaluated with JAX
  at export time; only the data-dependent spine becomes ONNX nodes.
  Model weights therefore appear as initializers feeding Conv/MatMul
  directly, like a torch export.
- **Pseudo-broadcast**: ``broadcast_in_dim`` lowers to a Reshape that
  inserts singleton axes; ONNX elementwise ops then broadcast natively.
  Ops that need the full extent (Concat, Conv, MatMul, outputs, ...)
  materialize via Expand on demand.  This keeps graphs lean and — more
  importantly — keeps the time axis dynamic: a broadcast materialized at
  trace-shape would freeze it.
- **Dynamic axes**: the caller marks input axes dynamic (reference-style
  ``dynamic_axes``).  Dim symbols are propagated through ops; Reshape
  targets use the ONNX 0/-1 conventions, and shape tensors needed by
  Expand are assembled at runtime from ``Shape`` of a registered carrier
  tensor.  tests/test_onnx_export.py proves artifacts evaluate correctly
  at lengths different from the traced length.
- **Control flow**: ``scan`` is unrolled (static trip counts only);
  pjit/custom_jvp/custom_vjp/remat calls are inlined.

Scope: the op set covers this repo's exported models (encoder, DiffNet
denoiser, PLMS pred/after stages, HiFi-GAN-family vocoders).  Anything
else raises ``NotImplementedError`` naming the primitive.
"""

from __future__ import annotations

from itertools import zip_longest
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import proto as P
from .builder import GraphBuilder, onnx_dtype

# ---------------------------------------------------------------------------

_INT64_MAX = 2**63 - 1


class Val:
    """A jaxpr value during conversion.

    Either a compile-time constant (``arr`` set; may be a zero-stride
    broadcast view) or a symbolic tensor (``name`` set).  ``dshape`` is the
    logical shape — ints or dim-symbol strings; ``pshape`` is the physical
    shape actually flowing through the ONNX graph (may contain singleton
    axes where ``dshape`` has full extents: pseudo-broadcast).
    """

    __slots__ = ("arr", "name", "dshape", "pshape", "dtype")

    def __init__(self, *, arr=None, name=None, dshape=None, pshape=None,
                 dtype=None):
        self.arr = arr
        self.name = name
        if arr is not None:
            self.dshape = tuple(arr.shape)
            self.pshape = tuple(arr.shape)
            self.dtype = arr.dtype
        else:
            self.dshape = tuple(dshape)
            self.pshape = tuple(pshape if pshape is not None else dshape)
            self.dtype = np.dtype(dtype)

    @property
    def is_const(self) -> bool:
        return self.arr is not None

    def __repr__(self):
        if self.is_const:
            return f"Const({self.arr.shape}, {self.arr.dtype})"
        return f"Sym({self.name}, {self.dshape}, phys={self.pshape})"


def _merge_dim(a, b):
    if a == b:
        return a
    if isinstance(a, str) and isinstance(b, str):
        # same extent at trace time (jax checked); keep the first symbol
        return a
    if isinstance(a, str):
        # symbol vs concrete: jax already checked the extents are
        # broadcast-compatible at trace time; keep the symbol
        return a
    if isinstance(b, str):
        return b
    if a == 1:
        return b
    if b == 1:
        return a
    raise ValueError(f"incompatible broadcast dims {a} vs {b}")


def broadcast_dshapes(*shapes) -> Tuple:
    out = []
    for dims in zip_longest(*[reversed(s) for s in shapes], fillvalue=1):
        d = 1
        for x in dims:
            d = _merge_dim(d, x)
        out.append(d)
    return tuple(reversed(out))


def _strip_broadcast(arr: np.ndarray) -> np.ndarray:
    """Collapse zero-stride axes to size 1 (undo np.broadcast_to)."""
    idx = tuple(slice(0, 1) if s == 0 and n > 1 else slice(None)
                for s, n in zip(arr.strides, arr.shape))
    return np.ascontiguousarray(arr[idx])


class Converter:
    def __init__(self, builder: GraphBuilder):
        self.b = builder
        # dim symbol -> (tensor_name, axis) whose Shape carries the value
        self.dim_registry: Dict[str, Tuple[str, int]] = {}
        self._sym_counter = 0

    # -- value plumbing ----------------------------------------------------

    def fresh_sym(self, hint="d", trace_size: int = -1) -> str:
        self._sym_counter += 1
        name = f"{hint}{self._sym_counter}"
        if trace_size >= 0:
            _SYMBOL_SIZES[name] = int(trace_size)
        return name

    def register_dims(self, val: Val):
        if val.is_const:
            return
        for ax, d in enumerate(val.dshape):
            if isinstance(d, str) and d not in self.dim_registry \
                    and val.pshape[ax] == d:
                self.dim_registry[d] = (val.name, ax)

    def sym(self, name, dshape, dtype, pshape=None) -> Val:
        v = Val(name=name, dshape=dshape, pshape=pshape, dtype=dtype)
        self.register_dims(v)
        return v

    def const_name(self, val: Val, hint="const") -> str:
        """Materialize a const fully and return its initializer name."""
        return self.b.add_initializer(np.ascontiguousarray(val.arr), hint=hint)

    def name_of(self, val: Val, hint="const") -> str:
        """Name of a (physical) tensor for ops that broadcast natively."""
        if not val.is_const:
            return val.name
        base = _strip_broadcast(val.arr)
        return self.b.add_initializer(base, hint=hint)

    def dim_value_tensor(self, d) -> str:
        """[1]-shaped int64 tensor holding dim ``d`` (static or dynamic)."""
        if isinstance(d, str):
            if d not in self.dim_registry:
                raise NotImplementedError(
                    f"dynamic dim {d} has no registered carrier tensor")
            src, ax = self.dim_registry[d]
            shp = self.b.add_node("Shape", [src])[0]
            idx = self.b.add_initializer(np.asarray([ax], np.int64), hint="ax")
            return self.b.add_node("Gather", [shp, idx], axis=0)[0]
        return self.b.add_initializer(np.asarray([int(d)], np.int64), hint="dim")

    def shape_tensor(self, dshape) -> str:
        parts = [self.dim_value_tensor(d) for d in dshape]
        if len(parts) == 1:
            return parts[0]
        return self.b.add_node("Concat", parts, axis=0)[0]

    def materialize(self, val: Val, hint="t") -> Val:
        """Return a Val whose physical shape equals its logical shape."""
        if val.is_const:
            return val
        if val.pshape == val.dshape:
            return val
        shape = self.shape_tensor(val.dshape)
        out = self.b.add_node("Expand", [val.name, shape])[0]
        return self.sym(out, val.dshape, val.dtype)

    def mat_name(self, val: Val, hint="t") -> str:
        if val.is_const:
            return self.const_name(val, hint)
        return self.materialize(val).name

    # -- reshape with dynamic dims ----------------------------------------

    def emit_reshape(self, val: Val, target_dshape) -> Val:
        val = self.materialize(val)
        static = []
        dyn_positions = []
        for i, d in enumerate(target_dshape):
            if isinstance(d, str):
                if i < len(val.dshape) and val.dshape[i] == d:
                    static.append(0)  # ONNX: copy input dim i
                else:
                    dyn_positions.append(i)
                    static.append(-1)
            else:
                static.append(int(d))
        if static.count(-1) <= 1:
            shape = self.b.add_initializer(np.asarray(static, np.int64),
                                           hint="shape")
        else:
            shape = self.shape_tensor(target_dshape)
        name = self.name_of(val)
        out = self.b.add_node("Reshape", [name, shape])[0]
        return self.sym(out, target_dshape, val.dtype)

    # -- jaxpr traversal ---------------------------------------------------

    def run_jaxpr(self, jaxpr, consts: Sequence[Val],
                  invals: Sequence[Val]) -> List[Val]:
        env: Dict = {}

        def write(var, val):
            env[var] = val

        def read(var) -> Val:
            from jax._src.core import Literal
            if isinstance(var, Literal):
                return Val(arr=np.asarray(var.val))
            return env[var]

        for var, v in zip(jaxpr.constvars, consts):
            write(var, v)
        for var, v in zip(jaxpr.invars, invals):
            write(var, v)

        for eqn in jaxpr.eqns:
            ins = [read(v) for v in eqn.invars]
            name = eqn.primitive.name
            outs = None
            if all(v.is_const for v in ins):
                try:
                    outs = self._fold(eqn, ins)
                except Exception:
                    outs = None  # fall through to the symbolic lowering
            if outs is None:
                handler = getattr(self, f"p_{name}", None)
                if handler is None:
                    raise NotImplementedError(
                        f"no ONNX lowering for primitive '{name}'")
                outs = handler(eqn, ins)
            if not isinstance(outs, (list, tuple)):
                outs = [outs]
            for var, val in zip(eqn.outvars, outs):
                write(var, val)
        return [read(v) for v in jaxpr.outvars]

    def _fold(self, eqn, ins) -> List[Val]:
        if eqn.primitive.name == "broadcast_in_dim":
            # keep broadcasts as zero-stride views; a later _strip_broadcast
            # stores only the small base array in the file
            arr = ins[0].arr
            shape = tuple(int(s) for s in eqn.params["shape"])
            bdims = eqn.params["broadcast_dimensions"]
            view = arr.reshape([arr.shape[bdims.index(i)] if i in bdims else 1
                                for i in range(len(shape))])
            return [Val(arr=np.broadcast_to(view, shape))]
        vals = [np.ascontiguousarray(v.arr) for v in ins]
        out = eqn.primitive.bind(*vals, **eqn.params)
        if not isinstance(out, (list, tuple)):
            out = [out]
        return [Val(arr=np.asarray(o)) for o in out]

    # -- inlined higher-order primitives ----------------------------------

    def _inline_closed(self, closed, invals) -> List[Val]:
        consts = [Val(arr=np.asarray(c)) for c in closed.consts]
        return self.run_jaxpr(closed.jaxpr, consts, invals)

    def p_jit(self, eqn, ins):
        return self._inline_closed(eqn.params["jaxpr"], ins)

    p_pjit = p_jit

    def p_closed_call(self, eqn, ins):
        return self._inline_closed(eqn.params["call_jaxpr"], ins)

    def p_custom_jvp_call(self, eqn, ins):
        return self._inline_closed(eqn.params["call_jaxpr"], ins)

    def p_custom_vjp_call(self, eqn, ins):
        return self._inline_closed(eqn.params["call_jaxpr"], ins)

    def p_remat(self, eqn, ins):
        jx = eqn.params["jaxpr"]
        return self.run_jaxpr(jx, [], ins)

    p_checkpoint = p_remat

    def p_stop_gradient(self, eqn, ins):
        return ins

    def p_copy(self, eqn, ins):
        return ins

    def p_sharding_constraint(self, eqn, ins):
        return ins

    def p_scan(self, eqn, ins):
        pr = eqn.params
        n_const, n_carry = pr["num_consts"], pr["num_carry"]
        length = int(pr["length"])
        closed = pr["jaxpr"]
        consts = list(ins[:n_const])
        carry = list(ins[n_const:n_const + n_carry])
        xs = list(ins[n_const + n_carry:])
        order = range(length - 1, -1, -1) if pr["reverse"] else range(length)
        ys_acc: Optional[List[List[Val]]] = None
        for i in order:
            x_i = [self._index0(x, i) for x in xs]
            outs = self._inline_closed(closed, consts + carry + x_i)
            carry = outs[:n_carry]
            ys = outs[n_carry:]
            if ys_acc is None:
                ys_acc = [[] for _ in ys]
            for acc, y in zip(ys_acc, ys):
                if pr["reverse"]:
                    acc.insert(0, y)
                else:
                    acc.append(y)
        stacked = [self._stack0(acc) for acc in (ys_acc or [])]
        return carry + stacked

    def _index0(self, val: Val, i: int) -> Val:
        if val.is_const:
            return Val(arr=np.asarray(val.arr[i]))
        idx = self.b.add_initializer(np.asarray(i, np.int64), hint="i")
        out = self.b.add_node("Gather", [self.materialize(val).name, idx],
                              axis=0)[0]
        return self.sym(out, val.dshape[1:], val.dtype)

    def _stack0(self, vals: List[Val]) -> Val:
        if all(v.is_const for v in vals):
            return Val(arr=np.stack([v.arr for v in vals]))
        names = []
        for v in vals:
            v = self.materialize(v)
            axes = self.b.add_initializer(np.asarray([0], np.int64), hint="ax")
            names.append(self.b.add_node(
                "Unsqueeze", [self.mat_name(v), axes])[0])
        out = self.b.add_node("Concat", names, axis=0)[0]
        first = vals[0]
        return self.sym(out, (len(vals),) + tuple(first.dshape), first.dtype)

    # -- elementwise -------------------------------------------------------

    def _ew(self, op: str, ins: List[Val], out_dtype=None, **attrs) -> Val:
        names = [self.name_of(v) for v in ins]
        out = self.b.add_node(op, names, **attrs)[0]
        dshape = broadcast_dshapes(*[v.dshape for v in ins])
        pshape = broadcast_dshapes(*[v.pshape for v in ins])
        dtype = out_dtype or ins[0].dtype
        return self.sym(out, dshape, dtype, pshape=pshape)

    def p_add(self, eqn, ins):
        return self._ew("Add", ins)

    def p_sub(self, eqn, ins):
        return self._ew("Sub", ins)

    def p_mul(self, eqn, ins):
        return self._ew("Mul", ins)

    def p_div(self, eqn, ins):
        return self._ew("Div", ins)

    def p_pow(self, eqn, ins):
        return self._ew("Pow", ins)

    def p_max(self, eqn, ins):
        return self._ew("Max", ins)

    def p_min(self, eqn, ins):
        return self._ew("Min", ins)

    def p_rem(self, eqn, ins):
        return self._ew("Mod", ins, fmod=1)

    def p_and(self, eqn, ins):
        return self._ew("And", ins)

    def p_or(self, eqn, ins):
        return self._ew("Or", ins)

    def p_not(self, eqn, ins):
        return self._ew("Not", ins)

    def p_neg(self, eqn, ins):
        return self._ew("Neg", ins)

    def p_abs(self, eqn, ins):
        return self._ew("Abs", ins)

    def p_sign(self, eqn, ins):
        return self._ew("Sign", ins)

    def p_floor(self, eqn, ins):
        return self._ew("Floor", ins)

    def p_ceil(self, eqn, ins):
        return self._ew("Ceil", ins)

    def p_exp(self, eqn, ins):
        return self._ew("Exp", ins)

    def p_log(self, eqn, ins):
        return self._ew("Log", ins)

    def p_sqrt(self, eqn, ins):
        return self._ew("Sqrt", ins)

    def p_rsqrt(self, eqn, ins):
        s = self._ew("Sqrt", ins)
        one = Val(arr=np.asarray(1.0, ins[0].dtype))
        return self._ew("Div", [one, s])

    def p_logistic(self, eqn, ins):
        return self._ew("Sigmoid", ins)

    def p_tanh(self, eqn, ins):
        return self._ew("Tanh", ins)

    def p_sin(self, eqn, ins):
        return self._ew("Sin", ins)

    def p_cos(self, eqn, ins):
        return self._ew("Cos", ins)

    def p_erf(self, eqn, ins):
        return self._ew("Erf", ins)

    def p_log1p(self, eqn, ins):
        one = Val(arr=np.asarray(1.0, ins[0].dtype))
        return self._ew("Log", [self._ew("Add", [ins[0], one])])

    def p_expm1(self, eqn, ins):
        one = Val(arr=np.asarray(1.0, ins[0].dtype))
        return self._ew("Sub", [self._ew("Exp", ins), one])

    def p_is_finite(self, eqn, ins):
        # emitted graphs should not contain this; map conservatively
        x = ins[0]
        inf = Val(arr=np.asarray(np.inf, x.dtype))
        a = self._ew("Less", [self._ew("Abs", [x]), inf], out_dtype=np.bool_)
        return a

    def p_square(self, eqn, ins):
        return self._ew("Mul", [ins[0], ins[0]])

    def p_integer_pow(self, eqn, ins):
        y = int(eqn.params["y"])
        if y == 2:
            return self._ew("Mul", [ins[0], ins[0]])
        exp = Val(arr=np.asarray(float(y), ins[0].dtype))
        return self._ew("Pow", [ins[0], exp])

    def p_round(self, eqn, ins):
        from jax._src.lax.lax import RoundingMethod
        if eqn.params.get("rounding_method") == RoundingMethod.TO_NEAREST_EVEN:
            return self._ew("Round", ins)
        # away-from-zero: sign(x) * floor(|x| + 0.5)
        half = Val(arr=np.asarray(0.5, ins[0].dtype))
        mag = self._ew("Floor", [self._ew("Add", [self._ew("Abs", ins), half])])
        return self._ew("Mul", [self._ew("Sign", ins), mag])

    def p_clamp(self, eqn, ins):
        lo, x, hi = ins
        return self._ew("Min", [self._ew("Max", [x, lo]), hi])

    def p_nextafter(self, eqn, ins):
        raise NotImplementedError("nextafter has no ONNX equivalent")

    # comparisons ----------------------------------------------------------
    def p_eq(self, eqn, ins):
        return self._ew("Equal", ins, out_dtype=np.bool_)

    def p_ne(self, eqn, ins):
        e = self._ew("Equal", ins, out_dtype=np.bool_)
        return self._ew("Not", [e], out_dtype=np.bool_)

    def p_gt(self, eqn, ins):
        return self._ew("Greater", ins, out_dtype=np.bool_)

    def p_lt(self, eqn, ins):
        return self._ew("Less", ins, out_dtype=np.bool_)

    def p_ge(self, eqn, ins):
        return self._ew("GreaterOrEqual", ins, out_dtype=np.bool_)

    def p_le(self, eqn, ins):
        return self._ew("LessOrEqual", ins, out_dtype=np.bool_)

    def p_select_n(self, eqn, ins):
        pred, *cases = ins
        if len(cases) == 2 and pred.dtype == np.bool_:
            # select_n(pred, on_false, on_true); Where picks arg1 when true
            return self._ew("Where", [pred, cases[1], cases[0]],
                            out_dtype=cases[0].dtype)
        out = cases[-1]
        for k in range(len(cases) - 2, -1, -1):
            kv = Val(arr=np.asarray(k, pred.dtype))
            m = self._ew("Equal", [pred, kv], out_dtype=np.bool_)
            out = self._ew("Where", [m, cases[k], out],
                           out_dtype=cases[0].dtype)
        return out

    def p_convert_element_type(self, eqn, ins):
        to = np.dtype(eqn.params["new_dtype"])
        out = self.b.add_node("Cast", [self.name_of(ins[0])],
                              to=onnx_dtype(to))[0]
        return self.sym(out, ins[0].dshape, to, pshape=ins[0].pshape)

    # shape ops ------------------------------------------------------------
    def p_reshape(self, eqn, ins):
        target = tuple(int(s) for s in eqn.params["new_sizes"])
        dtarget = _propagate_reshape_symbols(ins[0].dshape, target)
        return self.emit_reshape(ins[0], dtarget)

    def p_squeeze(self, eqn, ins):
        dims = set(int(d) for d in eqn.params["dimensions"])
        dtarget = tuple(d for i, d in enumerate(ins[0].dshape)
                        if i not in dims)
        return self.emit_reshape(ins[0], dtarget)

    def p_expand_dims(self, eqn, ins):
        v = ins[0]
        nd_out = len(v.dshape) + len(eqn.params["dimensions"])
        dims = sorted(int(d) % nd_out for d in eqn.params["dimensions"])
        dtarget = list(v.dshape)
        for d in dims:
            dtarget.insert(d, 1)
        return self.emit_reshape(v, tuple(dtarget))

    def p_transpose(self, eqn, ins):
        perm = [int(p) for p in eqn.params["permutation"]]
        v = ins[0]
        out = self.b.add_node("Transpose", [self.name_of(v)], perm=perm)[0]
        return self.sym(out, tuple(v.dshape[p] for p in perm), v.dtype,
                        pshape=tuple(v.pshape[p] for p in perm))

    def p_rev(self, eqn, ins):
        v = self.materialize(ins[0])
        axes = [int(a) for a in eqn.params["dimensions"]]
        starts = self.b.add_initializer(
            np.asarray([-1] * len(axes), np.int64), hint="st")
        ends = self.b.add_initializer(
            np.asarray([-_INT64_MAX] * len(axes), np.int64), hint="en")
        axs = self.b.add_initializer(np.asarray(axes, np.int64), hint="ax")
        steps = self.b.add_initializer(
            np.asarray([-1] * len(axes), np.int64), hint="sp")
        out = self.b.add_node("Slice",
                              [self.mat_name(v), starts, ends, axs, steps])[0]
        return self.sym(out, v.dshape, v.dtype)

    def p_concatenate(self, eqn, ins):
        axis = int(eqn.params["dimension"])
        names = [self.mat_name(v) for v in ins]
        out = self.b.add_node("Concat", names, axis=axis)[0]
        dshape = list(ins[0].dshape)
        tot = 0
        dynamic = False
        for v in ins:
            d = v.dshape[axis]
            if isinstance(d, str):
                dynamic = True
            tot += _trace_size(v, axis)
        if dynamic:
            dshape[axis] = self.fresh_sym("cat", tot)
        else:
            dshape[axis] = tot
        for i, d in enumerate(dshape):
            if i != axis:
                dshape[i] = broadcast_dshapes(
                    *[(v.dshape[i],) for v in ins])[0]
        res = self.sym(out, tuple(dshape), ins[0].dtype)
        return res

    def p_slice(self, eqn, ins):
        v = self.materialize(ins[0])
        starts = [int(s) for s in eqn.params["start_indices"]]
        limits = [int(s) for s in eqn.params["limit_indices"]]
        strides = eqn.params["strides"]
        strides = ([1] * len(starts) if strides is None
                   else [int(s) for s in strides])
        dshape = []
        ends_emit = []
        for ax, (st, en, sp) in enumerate(zip(starts, limits, strides)):
            d = v.dshape[ax]
            if isinstance(d, str):
                ts = _trace_size(v, ax)
                if st == 0 and sp == 1 and en == ts:
                    # full slice keeps the symbol
                    ends_emit.append(_INT64_MAX)
                    dshape.append(d)
                    continue
                # Partial slice on a dynamic axis: a static limit is
                # interpreted END-RELATIVE (en == ts-k means x[..., :-k] for
                # every runtime length), while the start stays absolute —
                # the convention of every [k:], [:-k], [k:-j] window slice
                # over a time axis (e.g. the sine-source wrap correction,
                # vocoders/generator.py). An absolute-limit slice of a
                # dynamic axis (keep exactly the first en elements
                # regardless of length) cannot be distinguished at trace
                # time and is not used by the exported graphs.
                ends_emit.append(_INT64_MAX if en >= ts else en - ts)
                new_ts = max(0, -(-(en - st) // sp))
                dshape.append(self.fresh_sym("sl", new_ts))
                continue
            ends_emit.append(en)
            dshape.append(max(0, -(-(en - st) // sp)))
        st_t = self.b.add_initializer(np.asarray(starts, np.int64), hint="st")
        en_t = self.b.add_initializer(np.asarray(ends_emit, np.int64), hint="en")
        ax_t = self.b.add_initializer(
            np.asarray(range(len(starts)), np.int64), hint="ax")
        sp_t = self.b.add_initializer(np.asarray(strides, np.int64), hint="sp")
        out = self.b.add_node("Slice",
                              [self.mat_name(v), st_t, en_t, ax_t, sp_t])[0]
        return self.sym(out, tuple(dshape), v.dtype)

    def p_split(self, eqn, ins):
        v = self.materialize(ins[0])
        axis = int(eqn.params["axis"])
        sizes = [int(s) for s in eqn.params["sizes"]]
        outs = []
        pos = 0
        n = len(v.dshape)
        for s in sizes:
            st = self.b.add_initializer(np.asarray([pos], np.int64), hint="st")
            en = self.b.add_initializer(
                np.asarray([pos + s], np.int64), hint="en")
            ax = self.b.add_initializer(np.asarray([axis], np.int64), hint="ax")
            o = self.b.add_node("Slice", [self.mat_name(v), st, en, ax])[0]
            dshape = list(v.dshape)
            dshape[axis] = s
            outs.append(self.sym(o, tuple(dshape), v.dtype))
            pos += s
        return outs

    def p_pad(self, eqn, ins):
        v = self.materialize(ins[0])
        cval = ins[1]
        cfg = eqn.params["padding_config"]
        if any(int(i) != 0 for _, _, i in cfg):
            raise NotImplementedError("interior padding -> use ConvTranspose")
        lo = [int(l) for l, _, _ in cfg]
        hi = [int(h) for _, h, _ in cfg]
        if any(x < 0 for x in lo + hi):
            # negative padding = slice; jax allows it, our graphs don't use it
            raise NotImplementedError("negative pad")
        pads = self.b.add_initializer(np.asarray(lo + hi, np.int64),
                                      hint="pads")
        cn = self.const_name(cval) if cval.is_const else self.mat_name(cval)
        out = self.b.add_node("Pad", [self.mat_name(v), pads, cn])[0]
        dshape = []
        for ax, d in enumerate(v.dshape):
            if isinstance(d, str):
                if lo[ax] == 0 and hi[ax] == 0:
                    dshape.append(d)
                else:
                    dshape.append(self.fresh_sym(
                        "padded", _trace_size(v, ax) + lo[ax] + hi[ax]))
            else:
                dshape.append(d + lo[ax] + hi[ax])
        res = self.sym(out, tuple(dshape), v.dtype)
        return res

    def p_broadcast_in_dim(self, eqn, ins):
        v = ins[0]
        shape = tuple(int(s) for s in eqn.params["shape"])
        bdims = [int(b) for b in eqn.params["broadcast_dimensions"]]
        # physical: place operand dims at bdims, 1s elsewhere
        ptarget = [1] * len(shape)
        dtarget = [1] * len(shape)
        for opi, outi in enumerate(bdims):
            ptarget[outi] = v.pshape[opi]
            dtarget[outi] = v.dshape[opi]
        # logical target: static param value wins where operand had size 1
        for i in range(len(shape)):
            if dtarget[i] == 1 and shape[i] != 1:
                dtarget[i] = shape[i]
        reshaped = self.emit_reshape(
            Val(name=v.name, dshape=v.pshape, dtype=v.dtype)
            if not v.is_const else v,
            tuple(ptarget))
        return self.sym(reshaped.name, tuple(dtarget), v.dtype,
                        pshape=tuple(ptarget))

    def p_iota(self, eqn, ins):
        shape = tuple(int(s) for s in eqn.params["shape"])
        dim = int(eqn.params["dimension"])
        dtype = np.dtype(eqn.params["dtype"])
        n = shape[dim]
        arr = np.arange(n, dtype=dtype).reshape(
            [n if i == dim else 1 for i in range(len(shape))])
        return Val(arr=np.broadcast_to(arr, shape))

    # reductions -----------------------------------------------------------
    def _reduce(self, op, eqn, ins, out_dtype=None):
        v = self.materialize(ins[0])
        axes = [int(a) for a in eqn.params["axes"]]
        if op == "ReduceSum":
            # opset 13+: axes as input tensor
            ax_t = self.b.add_initializer(np.asarray(axes, np.int64),
                                          hint="ax")
            out = self.b.add_node(op, [self.mat_name(v), ax_t], keepdims=0)[0]
        else:
            # ReduceMax/Min/Mean take axes as an attribute until opset 18
            out = self.b.add_node(op, [self.mat_name(v)], axes=axes,
                                  keepdims=0)[0]
        dshape = tuple(d for i, d in enumerate(v.dshape) if i not in axes)
        return self.sym(out, dshape, out_dtype or v.dtype)

    def p_reduce_sum(self, eqn, ins):
        return self._reduce("ReduceSum", eqn, ins)

    def p_reduce_max(self, eqn, ins):
        return self._reduce("ReduceMax", eqn, ins)

    def p_reduce_min(self, eqn, ins):
        return self._reduce("ReduceMin", eqn, ins)

    def p_reduce_and(self, eqn, ins):
        v = ins[0]
        as_int = self.sym(
            self.b.add_node("Cast", [self.name_of(v)],
                            to=onnx_dtype(np.int32))[0],
            v.dshape, np.int32, pshape=v.pshape)
        red = self._reduce("ReduceMin", eqn, [as_int])
        zero = Val(arr=np.asarray(0, np.int32))
        return self._ew("Greater", [red, zero], out_dtype=np.bool_)

    def p_reduce_or(self, eqn, ins):
        v = ins[0]
        as_int = self.sym(
            self.b.add_node("Cast", [self.name_of(v)],
                            to=onnx_dtype(np.int32))[0],
            v.dshape, np.int32, pshape=v.pshape)
        red = self._reduce("ReduceMax", eqn, [as_int])
        zero = Val(arr=np.asarray(0, np.int32))
        return self._ew("Greater", [red, zero], out_dtype=np.bool_)

    def p_cumsum(self, eqn, ins):
        v = self.materialize(ins[0])
        axis = self.b.add_initializer(
            np.asarray(int(eqn.params["axis"]), np.int64), hint="ax")
        out = self.b.add_node("CumSum", [self.mat_name(v), axis],
                              reverse=int(bool(eqn.params.get("reverse", False))))[0]
        return self.sym(out, v.dshape, v.dtype)

    # contractions ---------------------------------------------------------
    def p_dot_general(self, eqn, ins):
        (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
        lhs, rhs = ins
        if lb or rb:
            raise NotImplementedError("batched dot_general not needed yet")
        lfree = [i for i in range(len(lhs.dshape)) if i not in lc]
        rfree = [i for i in range(len(rhs.dshape)) if i not in rc]
        out_dshape = tuple([lhs.dshape[i] for i in lfree] +
                           [rhs.dshape[i] for i in rfree])
        # fast path: lhs [..., K] @ rhs [K, N] with natural layouts
        if (list(lc) == [len(lhs.dshape) - 1] and list(rc) == [0]
                and len(rhs.dshape) == 2):
            out = self.b.add_node(
                "MatMul", [self.mat_name(lhs), self.mat_name(rhs)])[0]
            return self.sym(out, out_dshape, lhs.dtype)
        # general: lhs -> [M, K]; rhs -> [K, N]; MatMul; reshape
        lperm = lfree + list(lc)
        rperm = list(rc) + rfree
        l2 = self._transpose_val(lhs, lperm)
        r2 = self._transpose_val(rhs, rperm)
        K = [lhs.dshape[i] for i in lc]
        M = [lhs.dshape[i] for i in lfree]
        N = [rhs.dshape[i] for i in rfree]
        l2 = self.emit_reshape(l2, (_flat(M), _flat(K)))
        r2 = self.emit_reshape(r2, (_flat(K), _flat(N)))
        mm = self.b.add_node("MatMul", [self.mat_name(l2), self.mat_name(r2)])[0]
        flat = self.sym(mm, (_flat(M), _flat(N)), lhs.dtype)
        return self.emit_reshape(flat, out_dshape)

    def _transpose_val(self, v: Val, perm) -> Val:
        if list(perm) == list(range(len(v.dshape))):
            return v
        if v.is_const:
            return Val(arr=np.transpose(v.arr, perm))
        v = self.materialize(v)
        out = self.b.add_node("Transpose", [v.name], perm=list(perm))[0]
        return self.sym(out, tuple(v.dshape[p] for p in perm), v.dtype)

    def p_conv_general_dilated(self, eqn, ins):
        pr = eqn.params
        dn = pr["dimension_numbers"]
        lhs, rhs = ins
        if pr["batch_group_count"] != 1:
            raise NotImplementedError("batch_group_count > 1")
        spatial = len(pr["window_strides"])
        lhs_perm = [dn.lhs_spec[0], dn.lhs_spec[1]] + list(dn.lhs_spec[2:])
        rhs_perm = [dn.rhs_spec[0], dn.rhs_spec[1]] + list(dn.rhs_spec[2:])
        x = self._transpose_val(lhs, lhs_perm)   # [N, C, *sp]
        w = self._transpose_val(rhs, rhs_perm)   # [O, I/g, *sp]
        pads = [int(p[0]) for p in pr["padding"]] + \
               [int(p[1]) for p in pr["padding"]]
        if all(int(d) == 1 for d in pr["lhs_dilation"]):
            out = self.b.add_node(
                "Conv", [self.mat_name(x), self.mat_name(w)],
                strides=[int(s) for s in pr["window_strides"]],
                dilations=[int(d) for d in pr["rhs_dilation"]],
                pads=pads, group=int(pr["feature_group_count"]))[0]
            k = [(int(w.dshape[2 + i]) - 1) * int(pr["rhs_dilation"][i]) + 1
                 for i in range(spatial)]
            out_c = w.dshape[0]
        else:
            # lhs_dilation = fractional stride = ConvTranspose.
            # jax convention: w is still [O, I, *sp] after our transpose with
            # flipped? conv_general_dilated computes correlation; ONNX
            # ConvTranspose needs [I, O/g, *sp] and flipped kernels.
            if any(int(s) != 1 for s in pr["window_strides"]):
                raise NotImplementedError("conv with both dilations")
            if not w.is_const:
                raise NotImplementedError("ConvTranspose with dynamic kernel")
            strides = [int(d) for d in pr["lhs_dilation"]]
            wk = np.flip(np.transpose(np.ascontiguousarray(w.arr),
                                      (1, 0) + tuple(range(2, 2 + spatial))),
                         axis=tuple(range(2, 2 + spatial)))
            kname = self.b.add_initializer(np.ascontiguousarray(wk), hint="wt")
            k = [int(w.dshape[2 + i]) for i in range(spatial)]
            # jax pads the dilated input with (k-1-lo, k-1-hi); ONNX
            # ConvTranspose pads = k-1-lo on both ends of the FULL output
            ct_pads = [k[i] - 1 - int(pr["padding"][i][0])
                       for i in range(spatial)] + \
                      [k[i] - 1 - int(pr["padding"][i][1])
                       for i in range(spatial)]
            if any(p < 0 for p in ct_pads):
                raise NotImplementedError("ConvTranspose negative pad")
            if int(pr["feature_group_count"]) != 1:
                # the [I, O/g] swap below is only valid ungrouped
                raise NotImplementedError("grouped ConvTranspose")
            out = self.b.add_node(
                "ConvTranspose", [self.mat_name(x), kname],
                strides=strides, pads=ct_pads)[0]
            # after rhs_perm, w is [O, I, *sp]: out channels are dim 0
            # (conv_general_dilated with lhs_dilation is still a plain
            # correlation; only the ONNX *weight layout* is transposed)
            out_c = w.dshape[0]
        # output spatial dims
        plain = all(int(dd) == 1 for dd in pr["lhs_dilation"])
        osp = []
        for i in range(spatial):
            d_in = x.dshape[2 + i]
            kk = int(w.dshape[2 + i])
            lo = int(pr["padding"][i][0])
            hi = int(pr["padding"][i][1])
            if plain:
                st = int(pr["window_strides"][i])
                dd = int(pr["rhs_dilation"][i])
                keff = (kk - 1) * dd + 1

                def out_sz(n):
                    return (n + lo + hi - keff) // st + 1
            else:
                up = int(pr["lhs_dilation"][i])

                def out_sz(n):
                    return (n - 1) * up + kk - (kk - 1 - lo) - (kk - 1 - hi)
            if isinstance(d_in, str):
                trace_in = _trace_size(x, 2 + i)
                if plain and out_sz(trace_in) == trace_in and \
                        int(pr["window_strides"][i]) == 1:
                    osp.append(d_in)  # SAME-style conv keeps the symbol
                else:
                    osp.append(self.fresh_sym("sp", out_sz(trace_in)))
            else:
                osp.append(out_sz(d_in))
        res_ncw = self.sym(out, tuple([x.dshape[0], out_c] + osp), lhs.dtype)
        # back to jax out_spec layout
        inv = _inverse_perm([dn.out_spec[0], dn.out_spec[1]] +
                            list(dn.out_spec[2:]))
        return self._transpose_val(res_ncw, inv)

    # gather ---------------------------------------------------------------
    def p_gather(self, eqn, ins):
        dn = eqn.params["dimension_numbers"]
        slice_sizes = tuple(int(s) for s in eqn.params["slice_sizes"])
        operand, idx = ins
        if dn.operand_batching_dims or dn.start_indices_batching_dims:
            raise NotImplementedError("batched gather")
        if len(dn.start_index_map) != 1:
            raise NotImplementedError("multi-dim gather")
        a = dn.start_index_map[0]
        if dn.collapsed_slice_dims != (a,):
            raise NotImplementedError("gather with uncollapsed index dim")
        for j, s in enumerate(slice_sizes):
            if j != a and s != _trace_size(operand, j):
                raise NotImplementedError("gather with partial slices")
        nb = len(idx.dshape) - 1  # index batch dims (trailing dim is 1)
        out_rank = len(operand.dshape) - 1 + nb
        expect_offsets = tuple(list(range(a)) +
                               list(range(a + nb, out_rank)))
        if tuple(dn.offset_dims) != expect_offsets:
            raise NotImplementedError(
                f"gather offset dims {dn.offset_dims} != {expect_offsets}")
        # squeeze the trailing index coordinate dim
        axes = self.b.add_initializer(np.asarray([-1], np.int64), hint="ax")
        idx_name = self.b.add_node(
            "Squeeze", [self.mat_name(idx), axes])[0]
        out = self.b.add_node(
            "Gather", [self.mat_name(operand), idx_name], axis=a)[0]
        dshape = (tuple(operand.dshape[:a]) + tuple(idx.dshape[:-1]) +
                  tuple(operand.dshape[a + 1:]))
        return self.sym(out, dshape, operand.dtype)

    def p_dynamic_slice(self, eqn, ins):
        raise NotImplementedError(
            "dynamic_slice: restructure the exported function to use static "
            "slices (bucketed shapes)")


_NEVER_FOLD = set()


def _flat(dims) -> int:
    out = 1
    for d in dims:
        if isinstance(d, str):
            return "*".join(str(x) for x in dims)
        out *= d
    return out


def _trace_size(val: Val, ax: int) -> int:
    """The concrete traced extent of axis ax (symbols shadow the concrete
    extent recorded in _SYMBOL_SIZES at creation)."""
    d = val.dshape[ax]
    if isinstance(d, int):
        return d
    return _SYMBOL_SIZES.get(d, -1)


def _dim_trace(d) -> int:
    return d if isinstance(d, int) else _SYMBOL_SIZES.get(d, -1)


_SYMBOL_SIZES: Dict[str, int] = {}


def _inverse_perm(perm):
    inv = [0] * len(perm)
    for i, p in enumerate(perm):
        inv[p] = i
    return inv


def _propagate_reshape_symbols(in_dshape, out_static) -> Tuple:
    """Carry dim symbols through a reshape.

    Groups input and output dims by equal running products of the traced
    extents.  A 1:1 group carries its symbol; a many:1 group containing a
    symbol becomes a fresh composite symbol; a 1:many split of a symbolic
    dim is rejected (would silently freeze the dynamic axis).
    """
    ins = list(in_dshape)
    outs = [int(o) for o in out_static]
    if not any(isinstance(d, str) for d in ins):
        return tuple(outs)
    result = list(outs)
    i = j = 0
    while i < len(ins) and j < len(outs):
        gi, gj = [i], [j]
        pi, pj = _dim_trace(ins[i]), outs[j]
        while pi != pj:
            if pi < pj:
                i += 1
                if i >= len(ins):
                    break
                gi.append(i)
                pi *= _dim_trace(ins[i])
            else:
                j += 1
                if j >= len(outs):
                    break
                gj.append(j)
                pj *= outs[j]
        if pi != pj:
            break
        syms = [ins[k] for k in gi if isinstance(ins[k], str)]
        if syms:
            if len(gj) == 1 and len(gi) == 1:
                result[gj[0]] = ins[gi[0]]
            elif len(gj) == 1:
                name = _fresh_merged(pj)
                result[gj[0]] = name
            else:
                raise NotImplementedError(
                    "reshape splits a dynamic axis; restructure the "
                    f"exported function ({in_dshape} -> {out_static})")
        i += 1
        j += 1
    return tuple(result)


_MERGE_COUNTER = [0]


def _fresh_merged(trace_size: int) -> str:
    _MERGE_COUNTER[0] += 1
    name = f"m{_MERGE_COUNTER[0]}"
    _SYMBOL_SIZES[name] = int(trace_size)
    return name


# ---------------------------------------------------------------------------


def export_onnx(fn, example_args, *, input_names: Sequence[str],
                output_names: Sequence[str], graph_name: str = "graph",
                dynamic_axes: Optional[Dict[str, Sequence[int]]] = None,
                input_casts: Optional[Dict[str, int]] = None,
                opset: int = 16, doc: str = "") -> bytes:
    """Export ``fn(*example_args)`` to ONNX ModelProto bytes.

    :param fn: function of positional array arguments (close over params
        with functools.partial; they become initializers).
    :param input_names: one name per flat array argument.
    :param output_names: one name per flat output.
    :param dynamic_axes: {input_name: [axis, ...]} marked dynamic, matching
        the reference's torch.onnx export convention.
    :param input_casts: {input_name: TensorProto dtype} to declare a graph
        input with a wider dtype than the traced one (e.g. INT64 mel2ph on
        an int32 trace); a Cast node converts at ingestion.
    """
    import jax

    global _SYMBOL_SIZES
    _SYMBOL_SIZES = {}
    dynamic_axes = dynamic_axes or {}
    input_casts = input_casts or {}

    closed = jax.make_jaxpr(fn)(*example_args)
    flat_args = example_args
    if len(closed.jaxpr.invars) != len(flat_args):
        raise ValueError("example_args must be flat arrays (close over "
                         "pytrees with functools.partial)")
    if len(input_names) != len(flat_args):
        raise ValueError("need one input name per argument")

    b = GraphBuilder(graph_name, opset=opset)
    conv = Converter(b)

    invals = []
    for name, arg in zip(input_names, flat_args):
        arr = np.asarray(arg)
        dyn = set(dynamic_axes.get(name, ()))
        dshape = []
        vi_dims = []
        for ax, n in enumerate(arr.shape):
            if ax in dyn:
                symname = f"{name}_dyn_{ax}"
                dshape.append(symname)
                _SYMBOL_SIZES[symname] = int(n)
                vi_dims.append(symname)
            else:
                dshape.append(int(n))
                vi_dims.append(int(n))
        declared = input_casts.get(name)
        if declared is not None:
            b.add_input(name, declared, vi_dims)
            cast = b.add_node("Cast", [name], to=onnx_dtype(arr.dtype),
                              outputs=[f"{name}_cast"])[0]
            invals.append(conv.sym(cast, tuple(dshape), arr.dtype))
        else:
            b.add_input(name, onnx_dtype(arr.dtype), vi_dims)
            invals.append(conv.sym(name, tuple(dshape), arr.dtype))

    consts = [Val(arr=np.asarray(c)) for c in closed.consts]
    outs = conv.run_jaxpr(closed.jaxpr, consts, invals)

    if len(output_names) != len(outs):
        raise ValueError(
            f"{len(outs)} outputs traced, {len(output_names)} names given")
    for name, val in zip(output_names, outs):
        if val.is_const:
            init = b.add_initializer(np.ascontiguousarray(val.arr))
            final = b.add_node("Identity", [init], outputs=[name])[0]
            dims = list(val.dshape)
            dtype = val.dtype
        else:
            val = conv.materialize(val)
            b.add_node("Identity", [val.name], outputs=[name])
            dims = [d if isinstance(d, int) else str(d) for d in val.dshape]
            dtype = val.dtype
        b.add_output(name, onnx_dtype(dtype), dims)

    return b.model_bytes(doc=doc)
