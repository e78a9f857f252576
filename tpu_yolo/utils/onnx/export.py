"""jaxpr -> ONNX converter.

Converts the traced inference jaxpr of the YOLO forward (BN folded,
f32) into an ONNX graph — the JAX-native equivalent of the reference's
torch.onnx.export (reference utils/util.py:47-73). Unlike a hand-built
layer walker, tracing the jaxpr guarantees the exported graph is the
same program the framework executes (any jittable f32 function with
static shapes and the primitive subset below exports).

Conventions:
  * The ONNX input is NCHW float32 in [0, 1] ("images"), matching the
    reference artifact's layout; a leading Transpose feeds the NHWC
    graph. The output is the decoded (B, A, 4+nc) tensor ("output").
  * Param leaves become named initializers; conv kernels are
    pre-transposed HWIO -> OIHW at export time so Conv consumes them
    directly.
  * Every eqn whose inputs are all statically known (params, consts,
    literals) is constant-folded at export into a new initializer —
    anchors, strides, dtype casts of weights, etc. never become nodes.

Supported-op contract: `supported_primitives()` returns the exact jax
primitive set the converter maps (one `p_<name>` handler each);
call-like primitives (pjit / custom_jvp / remat) are inlined, and any
eqn whose inputs are all static folds away regardless of support. A
graph outside the contract fails loudly BEFORE any bytes are written,
listing every offending primitive in one error (not just the first),
so porting a new model is a single fix-the-list pass. The matrix of
differential tests (all six zoo sizes + 1280px, dynamic batch, vs the
JAX forward through the first-party interpreter) lives in
tests/test_onnx_export.py.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax._src.core import Literal

from tpu_yolo.core.config import ModelConfig
from tpu_yolo.models import yolov11
from tpu_yolo.utils.onnx import wire
from tpu_yolo.utils.onnx.wire import (attr_int, attr_ints, node, tensor,
                                      value_info)


class _Graph:
    """Accumulates ONNX nodes/initializers with fresh value names."""

    def __init__(self):
        self.nodes = []
        self.inits = []
        self._n = 0
        self._init_names = set()

    def fresh(self, hint="t"):
        self._n += 1
        return f"{hint}_{self._n}"

    def add(self, op, inputs, outputs=None, attrs=(), hint=None):
        out = outputs or [self.fresh(hint or op.lower())]
        self.nodes.append(node(op, inputs, out, name=self.fresh("n"),
                               attrs=attrs))
        return out[0]

    def init(self, arr, name=None, hint="c"):
        name = name or self.fresh(hint)
        assert name not in self._init_names, name
        self._init_names.add(name)
        self.inits.append(tensor(name, np.asarray(arr)))
        return name

    def const_i64(self, values, hint="i"):
        return self.init(np.asarray(values, np.int64), hint=hint)


def _perm_name(g, x, perm):
    return g.add("Transpose", [x], attrs=[attr_ints("perm", perm)],
                 hint="tr")


def _reshape(g, x, shape):
    return g.add("Reshape", [x, g.const_i64(shape, hint="shape")],
                 hint="rs")


class _Converter:
    def __init__(self, batch_sentinel: int | None = None):
        self.g = _Graph()
        self.names = {}       # jaxpr Var -> onnx value name
        self.consts = {}      # jaxpr Var -> np.ndarray (statically known)
        self.const_hints = {}  # jaxpr Var -> initializer name hint
        # dynamic batch: the graph is traced at a sentinel batch size
        # (a prime that divides no other dim in the network); any shape
        # entry divisible by it is batch-dependent (batch merged with
        # head counts in attention reshapes appears as sentinel*m) and
        # is rebuilt at RUNTIME from Shape(images). _batch_ref is a
        # shared one-slot box so inlined sub-jaxpr converters reuse the
        # same Shape/Gather nodes.
        self.batch_sentinel = batch_sentinel
        self._batch_ref = [None]

    def _batch_dim(self) -> str:
        """i64[1] runtime batch size (lazy Shape(images) -> Gather[0])."""
        if self._batch_ref[0] is None:
            shp = self.g.add("Shape", ["images"], hint="shp")
            self._batch_ref[0] = self.g.add(
                "Gather", [shp, self.g.const_i64([0])],
                attrs=[attr_int("axis", 0)], hint="bdim")
        return self._batch_ref[0]

    def _is_batch(self, d: int) -> bool:
        b0 = self.batch_sentinel
        return bool(b0) and d > 0 and d % b0 == 0

    def shape_operand(self, dims) -> str:
        """i64 shape tensor for Reshape/Expand: static const when no
        entry is batch-dependent, else a Concat of static runs and
        batch*m pieces computed from the runtime batch dim."""
        dims = [int(d) for d in dims]
        if not any(self._is_batch(d) for d in dims):
            return self.g.const_i64(dims, hint="shape")
        parts, run = [], []

        def flush():
            if run:
                parts.append(self.g.const_i64(list(run)))
                run.clear()

        for d in dims:
            if self._is_batch(d):
                flush()
                m = d // self.batch_sentinel
                b = self._batch_dim()
                parts.append(b if m == 1 else self.g.add(
                    "Mul", [b, self.g.const_i64([m])], hint="bmul"))
            else:
                run.append(d)
        flush()
        if len(parts) == 1:
            return parts[0]
        return self.g.add("Concat", parts, attrs=[attr_int("axis", 0)],
                          hint="dynshape")

    def rs(self, x: str, shape) -> str:
        """Reshape via shape_operand (batch-polymorphic)."""
        return self.g.add("Reshape", [x, self.shape_operand(shape)],
                          hint="rs")

    def sym_dims(self, shape):
        """value_info dims with batch-dependent entries as dim_params."""
        return [(("batch" if d // self.batch_sentinel == 1
                  else f"batch*{d // self.batch_sentinel}")
                 if self._is_batch(d) else int(d)) for d in shape]

    # -- value access ------------------------------------------------------
    def known(self, v):
        return isinstance(v, Literal) or v in self.consts

    def value(self, v) -> np.ndarray:
        return np.asarray(v.val if isinstance(v, Literal) else self.consts[v])

    def name(self, v) -> str:
        """ONNX value name for an input var; materializes constants."""
        if isinstance(v, Literal):
            return self.g.init(np.asarray(v.val), hint="lit")
        if v in self.names:
            return self.names[v]
        # a folded constant used by a non-foldable eqn -> initializer,
        # keeping the param path as its name when it is a param leaf
        n = self.g.init(self.consts[v], name=self.const_hints.get(v))
        self.names[v] = n
        return n

    # -- conversion --------------------------------------------------------
    def run(self, jaxpr, consts, param_leaves: dict):
        """param_leaves: {var: (name, np.ndarray)} for initializer vars."""
        for var, cv in zip(jaxpr.constvars, consts):
            self.consts[var] = np.asarray(cv)
        for var, (pname, arr) in param_leaves.items():
            self.consts[var] = np.asarray(arr)
            self.const_hints[var] = pname
        self.convert_eqns(jaxpr.eqns)
        return self.g

    def convert_eqns(self, eqns):
        eqns = list(eqns)
        for i, eqn in enumerate(eqns):
            prim = eqn.primitive.name
            # inline call-like primitives (pjit, custom_jvp, remat, ...)
            inner = None
            if "jaxpr" in eqn.params:
                inner = eqn.params["jaxpr"]
            elif "call_jaxpr" in eqn.params:
                inner = eqn.params["call_jaxpr"]
            if inner is not None and prim not in ("scan", "while", "cond"):
                closed = inner if hasattr(inner, "jaxpr") else None
                ij = closed.jaxpr if closed else inner
                iconsts = closed.consts if closed else []
                sub = _Converter(batch_sentinel=self.batch_sentinel)
                sub.g = self.g
                sub.g_shared = True
                sub._batch_ref = self._batch_ref  # share lazy Shape node
                for var, cv in zip(ij.constvars, iconsts):
                    sub.consts[var] = np.asarray(cv)
                n_const = len(ij.invars) - len(eqn.invars)
                assert n_const == 0, f"{prim}: unexpected extra invars"
                for iv, ov in zip(ij.invars, eqn.invars):
                    if self.known(ov):
                        sub.consts[iv] = self.value(ov)
                    else:
                        sub.names[iv] = self.name(ov)
                sub.convert_eqns(ij.eqns)
                for outer, innerv in zip(eqn.outvars, ij.outvars):
                    if sub.known(innerv):
                        self.consts[outer] = sub.value(innerv)
                    else:
                        self.names[outer] = sub.name(innerv)
                continue

            if all(self.known(v) for v in eqn.invars):
                self.fold(eqn)
                continue
            handler = getattr(self, f"p_{prim}", None)
            if handler is None:
                # Scan the rest of the graph so ONE failure reports the
                # COMPLETE set of offending primitives (a user porting a
                # new model fixes them all in one pass instead of
                # replaying export per missing op). Remaining eqns whose
                # inputs happen to be static would really fold — the
                # scan is a conservative superset and says so.
                missing = {}

                def _walk(eqs):
                    for e2 in eqs:
                        sub = (e2.params.get("jaxpr")
                               or e2.params.get("call_jaxpr"))
                        if sub is not None:  # call-like: recurse into
                            ij = getattr(sub, "jaxpr", sub)  # the body
                            _walk(ij.eqns)
                            continue
                        p2 = e2.primitive.name
                        if getattr(self, f"p_{p2}", None) is None:
                            missing.setdefault(p2, str(e2))

                _walk([eqn] + list(eqns[i + 1:]))
                detail = "\n".join(f"  {p}: {s[:200]}"
                                   for p, s in sorted(missing.items()))
                raise NotImplementedError(
                    f"ONNX export: {len(missing)} unsupported "
                    f"primitive(s) in the graph (first failure: "
                    f"'{prim}'; statically-foldable occurrences later "
                    f"in the graph may be false positives):\n{detail}")
            handler(eqn)

    def fold(self, eqn):
        """Evaluate an all-static eqn on CPU and record the results."""
        vals = [self.value(v) for v in eqn.invars]
        with jax.default_device(jax.devices("cpu")[0]):
            out = eqn.primitive.bind(*map(jnp.asarray, vals), **eqn.params)
        outs = out if eqn.primitive.multiple_results else [out]
        for var, val in zip(eqn.outvars, outs):
            self.consts[var] = np.asarray(val)
        # keep a param leaf's name through 1:1 folds (dtype casts etc.)
        if (len(eqn.invars) == 1 and len(eqn.outvars) == 1
                and eqn.invars[0] in self.const_hints):
            self.const_hints[eqn.outvars[0]] = \
                self.const_hints[eqn.invars[0]]

    # -- elementwise -------------------------------------------------------
    def _binop(self, eqn, op):
        a, b = (self.name(v) for v in eqn.invars)
        self.names[eqn.outvars[0]] = self.g.add(op, [a, b])

    def p_add(self, eqn):
        self._binop(eqn, "Add")

    def p_sub(self, eqn):
        self._binop(eqn, "Sub")

    def p_mul(self, eqn):
        self._binop(eqn, "Mul")

    def p_div(self, eqn):
        self._binop(eqn, "Div")

    def p_max(self, eqn):
        self._binop(eqn, "Max")

    def p_min(self, eqn):
        self._binop(eqn, "Min")

    def p_pow(self, eqn):
        self._binop(eqn, "Pow")

    def _unop(self, eqn, op):
        self.names[eqn.outvars[0]] = self.g.add(op, [self.name(eqn.invars[0])])

    def p_logistic(self, eqn):
        self._unop(eqn, "Sigmoid")

    def p_tanh(self, eqn):
        self._unop(eqn, "Tanh")

    def p_exp(self, eqn):
        self._unop(eqn, "Exp")

    def p_log(self, eqn):
        self._unop(eqn, "Log")

    def p_neg(self, eqn):
        self._unop(eqn, "Neg")

    def p_sqrt(self, eqn):
        self._unop(eqn, "Sqrt")

    def p_rsqrt(self, eqn):
        s = self.g.add("Sqrt", [self.name(eqn.invars[0])])
        self.names[eqn.outvars[0]] = self.g.add("Reciprocal", [s])

    def p_abs(self, eqn):
        self._unop(eqn, "Abs")

    def p_floor(self, eqn):
        self._unop(eqn, "Floor")

    def p_sign(self, eqn):
        self._unop(eqn, "Sign")

    def p_is_finite(self, eqn):
        raise NotImplementedError("is_finite has no ONNX mapping")

    def p_integer_pow(self, eqn):
        x = self.name(eqn.invars[0])
        y = int(eqn.params["y"])
        if y == 2:
            out = self.g.add("Mul", [x, x])
        elif y == -1:
            out = self.g.add("Reciprocal", [x])
        else:
            e = self.g.init(np.float32(y), hint="exp")
            out = self.g.add("Pow", [x, e])
        self.names[eqn.outvars[0]] = out

    def p_select_n(self, eqn):
        assert len(eqn.invars) == 3, "select_n with >2 cases"
        pred, a, b = (self.name(v) for v in eqn.invars)
        # select_n picks cases[0] when pred is 0/False -> Where(pred, b, a)
        self.names[eqn.outvars[0]] = self.g.add("Where", [pred, b, a])

    def _cmp(self, eqn, op, swap=False):
        a, b = (self.name(v) for v in eqn.invars)
        if swap:
            a, b = b, a
        self.names[eqn.outvars[0]] = self.g.add(op, [a, b])

    def p_eq(self, eqn):
        self._cmp(eqn, "Equal")

    def p_lt(self, eqn):
        self._cmp(eqn, "Less")

    def p_le(self, eqn):
        self._cmp(eqn, "LessOrEqual")

    def p_gt(self, eqn):
        self._cmp(eqn, "Greater")

    def p_ge(self, eqn):
        self._cmp(eqn, "GreaterOrEqual")

    def p_ne(self, eqn):
        eqv = self.g.add("Equal", [self.name(v) for v in eqn.invars])
        self.names[eqn.outvars[0]] = self.g.add("Not", [eqv])

    def p_and(self, eqn):
        self._binop(eqn, "And")

    def p_or(self, eqn):
        self._binop(eqn, "Or")

    def p_not(self, eqn):
        self._unop(eqn, "Not")

    def p_clamp(self, eqn):
        lo, x, hi = eqn.invars
        out = self.g.add("Max", [self.name(x), self.name(lo)])
        out = self.g.add("Min", [out, self.name(hi)])
        self.names[eqn.outvars[0]] = out

    def p_stop_gradient(self, eqn):
        self.names[eqn.outvars[0]] = self.name(eqn.invars[0])

    def p_copy(self, eqn):
        self.names[eqn.outvars[0]] = self.name(eqn.invars[0])

    def p_convert_element_type(self, eqn):
        to = wire.NP_TO_ONNX[np.dtype(eqn.params["new_dtype"])]
        self.names[eqn.outvars[0]] = self.g.add(
            "Cast", [self.name(eqn.invars[0])],
            attrs=[attr_int("to", to)], hint="cast")

    # -- shape ops ---------------------------------------------------------
    def p_transpose(self, eqn):
        self.names[eqn.outvars[0]] = _perm_name(
            self.g, self.name(eqn.invars[0]), eqn.params["permutation"])

    def p_reshape(self, eqn):
        assert eqn.params.get("dimensions") is None
        self.names[eqn.outvars[0]] = self.rs(
            self.name(eqn.invars[0]), eqn.params["new_sizes"])

    def p_squeeze(self, eqn):
        self.names[eqn.outvars[0]] = self.rs(
            self.name(eqn.invars[0]), eqn.outvars[0].aval.shape)

    def p_expand_dims(self, eqn):
        self.names[eqn.outvars[0]] = self.rs(
            self.name(eqn.invars[0]), eqn.outvars[0].aval.shape)

    def p_broadcast_in_dim(self, eqn):
        x = self.name(eqn.invars[0])
        shape = eqn.params["shape"]
        bdims = eqn.params["broadcast_dimensions"]
        in_shape = eqn.invars[0].aval.shape
        mid = [1] * len(shape)
        for i, d in enumerate(bdims):
            mid[d] = in_shape[i]
        if tuple(mid) != tuple(in_shape):
            x = self.rs(x, mid)
        if tuple(mid) != tuple(shape):
            x = self.g.add(
                "Expand", [x, self.shape_operand(shape)], hint="ex")
        self.names[eqn.outvars[0]] = x

    def p_concatenate(self, eqn):
        self.names[eqn.outvars[0]] = self.g.add(
            "Concat", [self.name(v) for v in eqn.invars],
            attrs=[attr_int("axis", eqn.params["dimension"])], hint="cat")

    def p_slice(self, eqn):
        starts = eqn.params["start_indices"]
        in_shape = eqn.invars[0].aval.shape
        # full-extent ends become INT64-huge (the ONNX clamp idiom) so a
        # "take everything" slice stays correct when the dim is the
        # runtime batch
        ends = [int(2 ** 62) if e >= in_shape[i] else int(e)
                for i, e in enumerate(eqn.params["limit_indices"])]
        strides = eqn.params["strides"] or (1,) * len(starts)
        axes = list(range(len(starts)))
        self.names[eqn.outvars[0]] = self.g.add(
            "Slice",
            [self.name(eqn.invars[0]), self.g.const_i64(starts),
             self.g.const_i64(ends), self.g.const_i64(axes),
             self.g.const_i64(strides)], hint="sl")

    def p_rev(self, eqn):
        # Slice with negative steps
        dims = eqn.params["dimensions"]
        shp = eqn.invars[0].aval.shape
        starts = [shp[d] - 1 for d in dims]
        ends = [-(shp[d] + 1) for d in dims]
        self.names[eqn.outvars[0]] = self.g.add(
            "Slice",
            [self.name(eqn.invars[0]), self.g.const_i64(starts),
             self.g.const_i64(ends), self.g.const_i64(dims),
             self.g.const_i64([-1] * len(dims))], hint="rev")

    # -- reductions --------------------------------------------------------
    def p_reduce_sum(self, eqn):
        self.names[eqn.outvars[0]] = self.g.add(
            "ReduceSum",
            [self.name(eqn.invars[0]), self.g.const_i64(eqn.params["axes"])],
            attrs=[attr_int("keepdims", 0)], hint="rsum")

    def _reduce_attr(self, eqn, op):
        # opset 17: ReduceMax/Min/Mean take axes as an attribute
        self.names[eqn.outvars[0]] = self.g.add(
            op, [self.name(eqn.invars[0])],
            attrs=[attr_ints("axes", eqn.params["axes"]),
                   attr_int("keepdims", 0)], hint="red")

    def p_reduce_max(self, eqn):
        self._reduce_attr(eqn, "ReduceMax")

    def p_reduce_min(self, eqn):
        self._reduce_attr(eqn, "ReduceMin")

    # -- the heavy ops -----------------------------------------------------
    def p_conv_general_dilated(self, eqn):
        p = eqn.params
        dn = p["dimension_numbers"]
        assert dn.lhs_spec == (0, 3, 1, 2) or dn == ((0, 3, 1, 2),) * 3, dn
        # jax stores specs as (batch, feature, *spatial) index tuples;
        # our convs are NHWC/HWIO/NHWC (ops/nn.py conv2d)
        lhs_spec, rhs_spec, out_spec = dn
        assert lhs_spec == (0, 3, 1, 2), f"unexpected lhs layout {lhs_spec}"
        assert rhs_spec == (3, 2, 0, 1), f"unexpected rhs layout {rhs_spec}"
        assert out_spec == (0, 3, 1, 2), f"unexpected out layout {out_spec}"
        assert p["lhs_dilation"] == (1, 1), "transposed conv not supported"

        x, w = eqn.invars
        xn = _perm_name(self.g, self.name(x), (0, 3, 1, 2))  # NHWC->NCHW
        if self.known(w):
            if not hasattr(self, "_conv_w"):
                self._conv_w = {}
            if w not in self._conv_w:
                self._conv_w[w] = self.g.init(
                    np.transpose(self.value(w), (3, 2, 0, 1)),
                    name=self.const_hints.get(w), hint="w")
            wn = self._conv_w[w]
        else:
            wn = _perm_name(self.g, self.name(w), (3, 2, 0, 1))
        (pt, pb), (pl, pr) = p["padding"]
        attrs = [
            attr_ints("strides", p["window_strides"]),
            attr_ints("pads", [pt, pl, pb, pr]),
            attr_ints("dilations", p["rhs_dilation"]),
            attr_int("group", p["feature_group_count"]),
        ]
        y = self.g.add("Conv", [xn, wn], attrs=attrs, hint="conv")
        self.names[eqn.outvars[0]] = _perm_name(self.g, y, (0, 2, 3, 1))

    def p_reduce_window_max(self, eqn):
        p = eqn.params
        wd, ws = p["window_dimensions"], p["window_strides"]
        pad = p["padding"]
        assert wd[0] == wd[3] == 1 and ws[0] == ws[3] == 1, "NHWC pool only"
        assert pad[0] == pad[3] == (0, 0)
        xn = _perm_name(self.g, self.name(eqn.invars[0]), (0, 3, 1, 2))
        (pt, pb), (pl, pr) = pad[1], pad[2]
        y = self.g.add("MaxPool", [xn], attrs=[
            attr_ints("kernel_shape", wd[1:3]),
            attr_ints("strides", ws[1:3]),
            attr_ints("pads", [pt, pl, pb, pr]),
        ], hint="pool")
        self.names[eqn.outvars[0]] = _perm_name(self.g, y, (0, 2, 3, 1))

    def p_dot_general(self, eqn):
        (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
        lhs, rhs = eqn.invars
        lshape, rshape = lhs.aval.shape, rhs.aval.shape

        def arrange(v, shape, batch, contract, contract_last):
            free = [d for d in range(len(shape))
                    if d not in batch and d not in contract]
            perm = (list(batch) + free + list(contract) if contract_last
                    else list(batch) + list(contract) + free)
            n = self.name(v)
            if perm != list(range(len(shape))):
                n = _perm_name(self.g, n, perm)
            bs = [shape[d] for d in batch]
            fs = [shape[d] for d in free]
            cs = [shape[d] for d in contract]
            tgt = (bs + [int(np.prod(fs or [1])), int(np.prod(cs or [1]))]
                   if contract_last else
                   bs + [int(np.prod(cs or [1])), int(np.prod(fs or [1]))])
            n = self.rs(n, tgt)
            return n, bs, fs

        ln, bs, lfs = arrange(lhs, lshape, lb, lc, True)
        rn, _, rfs = arrange(rhs, rshape, rb, rc, False)
        mm = self.g.add("MatMul", [ln, rn], hint="mm")
        out_shape = bs + lfs + rfs
        self.names[eqn.outvars[0]] = self.rs(mm, out_shape)

    def p_split(self, eqn):
        sizes = eqn.params["sizes"]
        axis = eqn.params["axis"]
        outs = [self.g.fresh("sp") for _ in eqn.outvars]
        self.g.add("Split",
                   [self.name(eqn.invars[0]), self.g.const_i64(sizes)],
                   outputs=outs, attrs=[attr_int("axis", axis)])
        for var, n in zip(eqn.outvars, outs):
            self.names[var] = n

    def p_iota(self, eqn):
        p = eqn.params
        arr = np.asarray(
            jax.lax.broadcasted_iota(p["dtype"], p["shape"], p["dimension"]))
        self.consts[eqn.outvars[0]] = arr

    def p_pad(self, eqn):
        p = eqn.params["padding_config"]
        assert all(i == 0 for _, _, i in p), "interior pad unsupported"
        starts = [lo for lo, _, _ in p]
        ends = [hi for _, hi, _ in p]
        pads = self.g.const_i64(starts + ends)
        self.names[eqn.outvars[0]] = self.g.add(
            "Pad", [self.name(eqn.invars[0]), pads,
                    self.name(eqn.invars[1])], hint="pad")


# Dynamic-batch trace sentinel: a prime that divides no other dimension
# in the network family (channels are powers-of-two multiples of 8/16,
# spatial dims multiples of 32, anchor counts 21*size^2/1024) — any
# traced dim divisible by it is batch-dependent.
def supported_primitives() -> list[str]:
    """The export contract: sorted jax primitive names with a converter
    handler. Any jittable f32 static-shape function composed of these
    (plus inlined call-like primitives and statically-foldable eqns)
    exports to a stock opset-17 ONNX graph."""
    return sorted(n[2:] for n in dir(_Converter) if n.startswith("p_"))


_BATCH_SENTINEL = 13


def export_onnx(params, cfg: ModelConfig, input_size: int, path: str,
                batch: int = 1, dynamic_batch: bool = True):
    """Export the BN-folded eval forward (decode included, no NMS) to an
    ONNX file at `path`. Input "images": (batch, 3, S, S) f32 in [0,1]
    (NCHW like the reference artifact); output "output": (batch, A,
    4+nc) pixel xywh + class probabilities. Returns metadata dict.

    dynamic_batch=True (default) emits the batch axis as a dim_param
    like the reference artifact (utils/util.py:47-66 dynamic_axes):
    the graph is traced at a sentinel batch and every batch-dependent
    Reshape/Expand target is rebuilt at runtime from Shape(images), so
    ONE file serves any batch size (anchors stay static per input
    size). `batch` then only matters for dynamic_batch=False."""
    params = yolov11.fold_batchnorm(params)

    def fwd(p, img):
        x = jnp.transpose(img, (0, 2, 3, 1))
        return yolov11.forward(p, x, cfg, train=False)

    b0 = _BATCH_SENTINEL if dynamic_batch else batch
    spec = jax.ShapeDtypeStruct((b0, 3, input_size, input_size),
                                jnp.float32)
    closed = jax.make_jaxpr(fwd)(params, spec)
    jaxpr = closed.jaxpr

    flat, _ = jax.tree_util.tree_flatten(params)
    paths, _ = jax.tree_util.tree_flatten_with_path(params)
    leaf_names = ["/".join(str(getattr(k, "key", k)) for k in kp)
                  for kp, _ in paths]
    n_params = len(flat)
    assert len(jaxpr.invars) == n_params + 1

    conv = _Converter(
        batch_sentinel=_BATCH_SENTINEL if dynamic_batch else None)
    param_leaves = {
        var: (leaf_names[i], np.asarray(flat[i], np.float32))
        for i, var in enumerate(jaxpr.invars[:n_params])}
    conv.names[jaxpr.invars[n_params]] = "images"
    conv.run(jaxpr, closed.consts, param_leaves)

    outv = jaxpr.outvars[0]
    out_name = conv.name(outv)
    conv.g.add("Identity", [out_name], outputs=["output"])

    if dynamic_batch:
        in_dims = ["batch", 3, input_size, input_size]
        out_dims = conv.sym_dims(outv.aval.shape)
    else:
        in_dims = (batch, 3, input_size, input_size)
        out_dims = outv.aval.shape
    g = wire.graph(
        "tpu_yolo", conv.g.nodes,
        inputs=[value_info("images", wire.F32, in_dims)],
        outputs=[value_info("output", wire.F32, out_dims)],
        initializers=conv.g.inits)
    blob = wire.model(g)
    with open(path, "wb") as f:
        f.write(blob)
    return {
        "path": path, "bytes": len(blob), "opset": 17,
        "input": f"float32[{','.join(str(d) for d in in_dims)}]",
        "output": f"float32{list(out_dims)}",
        "nodes": len(conv.g.nodes), "initializers": len(conv.g.inits),
    }
