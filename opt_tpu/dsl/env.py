"""The energy-file environment: every name an energy function can use.

Parity with the reference's optlib environment (reference: API/src/lib.t:8-135,
bound as the file env at o.t:1334-1341).  Energy definitions are plain Python
callables receiving this environment object, or Python files executed with
these names as globals (opt_tpu.problem_from_file).
"""

from __future__ import annotations

import math

from . import expr as E
from .spec import ProblemSpec, SampledImage, GraphSlot


class EnergyEnv:
    """DSL namespace handed to energy functions.

    Example (poisson_image_editing, reference:
    examples/poisson_image_editing/poisson_image_editing.t):

        def poisson(O):
            W, H = O.Dim("W", 0), O.Dim("H", 1)
            X = O.Unknown("X", O.opt_float4, (W, H), 0)
            T = O.Array("T", O.opt_float4, (W, H), 1)
            M = O.Array("M", O.opt_float, (W, H), 2)
            O.UsePreconditioner(False)
            O.Exclude(O.Not(O.eq(M(0, 0), 0)))
            for x, y in O.Stencil([(1, 0), (-1, 0), (0, 1), (0, -1)]):
                e = (X(0, 0) - X(x, y)) - (T(0, 0) - T(x, y))
                O.Energy(O.Select(O.InBounds(x, y), e, 0))
    """

    def __init__(self, spec: ProblemSpec, dims):
        self._spec = spec
        self._dims = dims  # positional sizes (list) and/or dict by name

        # element-type names for parity with the reference (o.t:3286-3294)
        self.opt_float = 1
        self.float_ = 1
        self.uint8 = 1
        self.int32 = 1
        self.opt_double = 1
        for i in range(2, 13):
            setattr(self, f"opt_float{i}", i)
            setattr(self, f"float{i}", i)
            setattr(self, f"opt_double{i}", i)
            setattr(self, f"double{i}", i)

        # math / comparison surface re-exported from expr
        self.Select = E.select
        self.Vector = E.Vector
        self.sqrt = E.sqrt
        self.Sqrt = E.sqrt
        self.sin = E.sin
        self.cos = E.cos
        self.tan = E.tan
        self.asin = E.asin
        self.acos = E.acos
        self.atan = E.atan
        self.atan2 = E.atan2
        self.sinh = E.sinh
        self.cosh = E.cosh
        self.tanh = E.tanh
        self.exp = E.exp
        self.log = E.log
        self.log10 = E.log10
        self.abs = E.abs_
        self.pow = E.pow_
        self.less = E.less
        self.greater = E.greater
        self.lesseq = E.lesseq
        self.greatereq = E.greatereq
        self.eq = E.eq
        self.and_ = E.and_
        self.or_ = E.or_
        self.Not = E.not_
        self.not_ = E.not_
        self.pi = math.pi

        self._lp_counter = 1

    # -- dim/size resolution ------------------------------------------------

    def _size_for(self, name, index):
        if isinstance(self._dims, dict):
            if name in self._dims:
                return self._dims[name]
            raise KeyError(f"dimension {name!r} not provided in plan dims")
        try:
            return self._dims[index]
        except IndexError:
            raise KeyError(
                f"dimension index {index} (for {name!r}) outside the "
                f"{len(self._dims)} plan dims"
            ) from None

    # -- declaration surface (lib.t:8-135) ----------------------------------

    def Dim(self, name, index):
        return self._spec.dim(name, index, self._size_for(name, index))

    def Unknown(self, name, typ, dims, idx=None):
        return self._spec.image(name, typ, dims, idx, is_unknown=True)

    def Array(self, name, typ, dims, idx=None):
        return self._spec.image(name, typ, dims, idx, is_unknown=False)

    Image = Array

    def ComputedArray(self, name, dims, exp):
        exprs = (
            exp.expressions() if isinstance(exp, E.ExpVector) else [exp]
        )
        return self._spec.computed_image(name, dims, exprs)

    ComputedImage = ComputedArray

    def Param(self, name, typ=None, idx=None):
        # reference signature: Param("w_fitSqrt", float, 5); typ is ignored
        if idx is None and isinstance(typ, int):
            idx = typ
        return self._spec.param(name, idx).expr()

    def Graph(self, name, *args):
        """Parity with both reference spellings (o.t:1663):
        Graph("G", {E}, "v0", {N}, 7, "v1", {N}, 8) and
        Graph("G", 6, "v0", {N}, 7, "v1", {N}, 8)."""
        args = list(args)
        edge_dim = None
        if args and not isinstance(args[0], str):
            first = args.pop(0)
            if isinstance(first, (list, tuple)):
                edge_dim = first[0]
            elif hasattr(first, "size"):
                edge_dim = first
            # a bare int is the legacy bind index: skip it
        slots = []
        i = 0
        while i < len(args):
            sname = args[i]
            assert isinstance(sname, str), f"expected slot name, got {sname!r}"
            dims = args[i + 1]
            if isinstance(dims, (list, tuple)):
                ispace = self._spec.ispace(dims)
            else:
                ispace = self._spec.ispace([dims])
            i += 2
            if i < len(args) and not isinstance(args[i], str):
                i += 1  # skip legacy bind index
            slots.append((sname, ispace))
        return self._spec.graph(name, edge_dim, slots)

    def Energy(self, *terms):
        self._spec.energy(*terms)

    def Exclude(self, e):
        self._spec.exclude(e)

    def UsePreconditioner(self, v):
        self._spec.use_preconditioner = bool(v)

    # -- bounds / index access ----------------------------------------------

    def InBounds(self, *offsets):
        return E.BoundsAccess(offsets, offsets)

    def InBoundsExpanded(self, *args):
        *offsets, expand = args
        mins = tuple(o - expand for o in offsets)
        maxs = tuple(o + expand for o in offsets)
        return E.BoundsAccess(mins, maxs)

    def Index(self, dim):
        return E.IndexValue(dim, 0)

    def SampledImage(self, image, dx=None, dy=None):
        def as_image(v):
            if v is None or isinstance(v, SampledImage):
                return v
            return SampledImage(v)

        if isinstance(image, SampledImage):
            return image
        dxh = as_image(dx)
        dyh = as_image(dy)
        return SampledImage(
            image,
            dxh.image if dxh else None,
            dyh.image if dyh else None,
        )

    # -- vector helpers (lib.t:46-123) ---------------------------------------

    @staticmethod
    def All(v):
        if not isinstance(v, E.ExpVector):
            return E.toexp(v)
        r = None
        for c in v.data:
            r = c if r is None else E.and_(r, c)
        return r

    @staticmethod
    def And(*args):
        r = E.toexp(1)
        for a in args:
            r = E.and_(r, a)
        return r

    @staticmethod
    def Or(*args):
        r = E.toexp(0)
        for a in args:
            r = E.or_(r, a)
        return r

    @staticmethod
    def Matrix3x3Mul(m, v):
        return E.Vector(
            m(0) * v(0) + m(1) * v(1) + m(2) * v(2),
            m(3) * v(0) + m(4) * v(1) + m(5) * v(2),
            m(6) * v(0) + m(7) * v(1) + m(8) * v(2),
        )

    @staticmethod
    def Dot3(a, b):
        return a(0) * b(0) + a(1) * b(1) + a(2) * b(2)

    @staticmethod
    def normalize(v):
        return v / E.sqrt(EnergyEnv.Dot3(v, v))

    @staticmethod
    def length(a, b):
        d = a - b
        return E.sqrt(EnergyEnv.Dot3(d, d))

    @staticmethod
    def Slice(im, s, e):
        """A channel-range view of an image handle (lib.t:72-83)."""

        class _SliceView:
            def __call__(self, *args):
                v = im(*args)
                if s + 1 == e:
                    return v(s)
                return E.ExpVector([v(i) for i in range(s, e)])

        return _SliceView()

    @staticmethod
    def Rotate2D(angle, v):
        ca, sa = E.cos(angle), E.sin(angle)
        return E.Vector(ca * v(0) - sa * v(1), sa * v(0) + ca * v(1))

    @staticmethod
    def Rotate3D(a, v):
        alpha, beta, gamma = a(0), a(1), a(2)
        ca, cb, cg = E.cos(alpha), E.cos(beta), E.cos(gamma)
        sa, sb, sg = E.sin(alpha), E.sin(beta), E.sin(gamma)
        m = E.Vector(
            cg * cb,
            -sg * ca + cg * sb * sa,
            sg * sa + cg * sb * ca,
            sg * cb,
            cg * ca + sg * sb * sa,
            -cg * sa + sg * sb * ca,
            -sb,
            cb * sa,
            cb * ca,
        )
        return EnergyEnv.Matrix3x3Mul(m, v)

    @staticmethod
    def Stencil(lst):
        return list(tuple(o) for o in lst)

    @staticmethod
    def L_2_norm(v):
        if isinstance(v, E.ExpVector):
            return E.sqrt(v.dot(v))
        return E.abs_(v)

    def L_p(self, val, val_const, p, dims):
        """IRLS robust-norm helper (lib.t:113-123): weight sqrt(C) with
        C = (||val_const|| + eps)^(p-2), materialized as a ComputedArray in
        the reference; inlined here (see ComputedImage docstring)."""
        dist_const = self.L_2_norm(val_const)
        eps = 0.0000001
        C = E.pow_(dist_const + eps, p - 2)
        sqrtC = E.sqrt(C)
        ca = self.ComputedArray(
            f"L_p{self._lp_counter}", dims, sqrtC
        )
        self._lp_counter += 1
        zeros = (0,) * len(dims)
        return ca(*zeros) * val

    def Result(self):
        return self._spec

    def namespace(self):
        """Dict of DSL names for exec-style energy files."""
        ns = {}
        for k in dir(self):
            if not k.startswith("_"):
                ns[k] = getattr(self, k)
        # reference energy files say `Param("w", float, 5)`, `Array(.., uint8, ..)`
        for t in ("float", "double", "uint8", "int32", "uint32"):
            ns[t] = 1
        return ns
