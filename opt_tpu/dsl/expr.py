"""Symbolic scalar expressions for the energy DSL.

This is a *recording* layer only. Unlike the reference's hash-consed autodiff
engine (reference: API/src/ad.t), it performs no symbolic differentiation and
no algebraic simplification: expressions are evaluated into JAX arrays
(opt_tpu/compile/evaluate.py) and all derivatives come from
``jax.linearize`` / ``jax.linear_transpose``.  Hash-consing, polynomial
re-simplification, condition factoring, and register-minimizing scheduling
(ad.t:153-303,902,1027; o.t:2143-2295) are intentionally absent -- XLA's CSE,
fusion, and scheduling replace them.

Expression surface kept for parity with the reference DSL (ad.t:840-890,
lib.t:8-135): arithmetic ops, sqrt/sin/cos/exp/log/pow/abs/trig, comparisons
(less/greater/lesseq/greatereq/eq), boolean ops (and_/or_/not_), select, and
fixed-size channel vectors (ExpVector, ad.t:310-341).
"""

from __future__ import annotations


class Exp:
    """Base class of all scalar expression nodes."""

    __slots__ = ()

    # -- arithmetic operator overloading (mirrors ad.t:463-466) --
    def __add__(self, o):
        return Apply("add", (self, toexp(o)))

    def __radd__(self, o):
        return Apply("add", (toexp(o), self))

    def __sub__(self, o):
        return Apply("sub", (self, toexp(o)))

    def __rsub__(self, o):
        return Apply("sub", (toexp(o), self))

    def __mul__(self, o):
        if isinstance(o, ExpVector):
            return o.__rmul__(self)
        return Apply("mul", (self, toexp(o)))

    def __rmul__(self, o):
        return Apply("mul", (toexp(o), self))

    def __truediv__(self, o):
        return Apply("div", (self, toexp(o)))

    def __rtruediv__(self, o):
        return Apply("div", (toexp(o), self))

    def __pow__(self, o):
        return Apply("pow", (self, toexp(o)))

    def __neg__(self):
        return Apply("neg", (self,))

    def dot(self, o):
        """Scalar 'dot' for parity with vector API."""
        return self * o

    def sum(self):
        return self


class Const(Exp):
    __slots__ = ("value",)

    def __init__(self, value):
        self.value = float(value)

    def __repr__(self):
        return f"Const({self.value})"


class Apply(Exp):
    """Application of a primitive op to argument expressions."""

    __slots__ = ("op", "args")

    def __init__(self, op, args):
        self.op = op
        self.args = tuple(args)

    def __repr__(self):
        return f"{self.op}({', '.join(map(repr, self.args))})"


# ---------------------------------------------------------------------------
# Leaf nodes.  The handles they point at (images, params, graphs) are defined
# in opt_tpu/dsl/spec.py; expr.py treats them as opaque.
# ---------------------------------------------------------------------------


class Offset:
    """Static stencil offset in index-space order (x fastest, as o.t:529)."""

    __slots__ = ("data",)

    def __init__(self, data):
        self.data = tuple(int(d) for d in data)

    def shift(self, o):
        assert len(o) == len(self.data)
        return Offset(tuple(a + b for a, b in zip(self.data, o)))

    def invert(self):
        return Offset(tuple(-a for a in self.data))

    def is_zero(self):
        return all(d == 0 for d in self.data)

    def __eq__(self, o):
        return isinstance(o, Offset) and self.data == o.data

    def __hash__(self):
        return hash(("Offset", self.data))

    def __repr__(self):
        return f"Offset{self.data}"


class GraphElement:
    """Access through a graph hyper-edge slot (o.t:208 Index=GraphElement)."""

    __slots__ = ("graph", "slot")

    def __init__(self, graph, slot):
        self.graph = graph
        self.slot = slot

    def __eq__(self, o):
        return (
            isinstance(o, GraphElement)
            and self.graph is o.graph
            and self.slot == o.slot
        )

    def __hash__(self):
        return hash(("GraphElement", id(self.graph), self.slot))

    def __repr__(self):
        return f"{self.graph.name}.{self.slot}"


class ImageAccess(Exp):
    """One channel of an image read at an Offset or GraphElement."""

    __slots__ = ("image", "index", "channel")

    def __init__(self, image, index, channel):
        self.image = image
        self.index = index
        self.channel = int(channel)

    def key(self):
        return (self.image.name, self.index, self.channel)

    def __repr__(self):
        return f"{self.image.name}({self.index})[{self.channel}]"


class BoundsAccess(Exp):
    """InBounds / InBoundsExpanded test (o.t:1790-1803).

    True at index p iff for every dim i: p_i >= -min_i and p_i < size_i - max_i.
    """

    __slots__ = ("mins", "maxs")

    def __init__(self, mins, maxs):
        self.mins = tuple(int(m) for m in mins)
        self.maxs = tuple(int(m) for m in maxs)

    def shift(self, o):
        return BoundsAccess(
            tuple(a + b for a, b in zip(self.mins, o)),
            tuple(a + b for a, b in zip(self.maxs, o)),
        )

    def __repr__(self):
        return f"InBounds[{self.mins},{self.maxs}]"


class IndexValue(Exp):
    """The index coordinate along one dim, as a float (o.t Index(i))."""

    __slots__ = ("dim", "shift_")

    def __init__(self, dim, shift_=0):
        self.dim = int(dim)
        self.shift_ = int(shift_)

    def __repr__(self):
        return f"Index({self.dim})+{self.shift_}"


class ParamValue(Exp):
    """A scalar problem parameter (o.t ParamValue)."""

    __slots__ = ("param",)

    def __init__(self, param):
        self.param = param

    def __repr__(self):
        return f"Param({self.param.name})"


class ComputedAccess(Exp):
    """Read of a ComputedArray channel at a static offset.

    The reference materializes ComputedArrays into buffers during
    ``precompute`` (once per linearization point) and reads them back with
    guarded loads (o.t:3131-3153, 1686-1719; re-run per step at
    solverGPUGaussNewton.t:1876,2242).  This node gives the evaluator the
    same choice: materialize the defining expression once per evaluation
    context and read shifted views of the buffer (the hot solve path), or
    inline the shifted defining expression (``expanded()``) where the
    leaf-partials machinery needs to see through it (diag(J^T J) /
    materialized-J).
    """

    __slots__ = ("cimage", "channel", "offset", "_expanded")

    def __init__(self, cimage, channel, offset):
        self.cimage = cimage
        self.channel = int(channel)
        self.offset = tuple(int(o) for o in offset)
        self._expanded = None

    def expanded(self):
        """The inline (shifted defining expression) view, cached."""
        if self._expanded is None:
            self._expanded = shiftexp(
                self.cimage.exprs[self.channel], self.offset
            )
        return self._expanded

    def key(self):
        return ("computed", self.cimage.name, self.channel, self.offset)

    def __repr__(self):
        off = ",".join(map(str, self.offset))
        return f"{self.cimage.name}[{self.channel}]({off})"


class SampledAccess(Exp):
    """Bilinear image sample at continuous expression coordinates.

    Derivatives w.r.t. the coordinates come from user-supplied derivative
    images, mirroring ad.sampledimage (o.t:3259-3282).
    """

    __slots__ = ("simage", "channel", "coords")

    def __init__(self, simage, channel, coords):
        self.simage = simage
        self.channel = int(channel)
        self.coords = tuple(coords)

    def __repr__(self):
        return f"Sample({self.simage.image.name})[{self.channel}]"


def toexp(v):
    if isinstance(v, Exp):
        return v
    if isinstance(v, (int, float)):
        return Const(v)
    if isinstance(v, bool):
        return Const(1.0 if v else 0.0)
    raise TypeError(f"expected an expression, got {type(v)}: {v!r}")


def tovec(v):
    """Coerce to ExpVector (singletons stay scalar-like with one channel)."""
    if isinstance(v, ExpVector):
        return v
    return ExpVector([toexp(v)])


# ---------------------------------------------------------------------------
# ExpVector: fixed-size channel vector (ad.t:310-341, util.Vector analogue)
# ---------------------------------------------------------------------------


def _broadcast(a, b):
    """Yield pairs of scalar exprs, broadcasting scalars over vectors."""
    av = isinstance(a, ExpVector)
    bv = isinstance(b, ExpVector)
    if av and bv:
        if len(a.data) != len(b.data):
            raise ValueError(
                f"channel mismatch: {len(a.data)} vs {len(b.data)}"
            )
        return list(zip(a.data, b.data))
    if av:
        be = toexp(b)
        return [(x, be) for x in a.data]
    ae = toexp(a)
    return [(ae, y) for y in b.data]


class ExpVector:
    """A fixed-length vector of scalar expressions with elementwise ops."""

    __slots__ = ("data",)

    def __init__(self, data):
        self.data = [toexp(d) for d in data]

    # channel access: both v(i) and v[i], matching the reference's v(i)
    def __call__(self, i):
        return self.data[i]

    def __getitem__(self, i):
        if isinstance(i, slice):
            return ExpVector(self.data[i])
        return self.data[i]

    def __len__(self):
        return len(self.data)

    def size(self):
        return len(self.data)

    def expressions(self):
        return list(self.data)

    def _map2(self, o, op):
        return ExpVector([Apply(op, (x, y)) for x, y in _broadcast(self, o)])

    def _rmap2(self, o, op):
        return ExpVector([Apply(op, (y, x)) for x, y in _broadcast(self, o)])

    def __add__(self, o):
        return self._map2(o, "add")

    def __radd__(self, o):
        return self._rmap2(o, "add")

    def __sub__(self, o):
        return self._map2(o, "sub")

    def __rsub__(self, o):
        return self._rmap2(o, "sub")

    def __mul__(self, o):
        return self._map2(o, "mul")

    def __rmul__(self, o):
        return self._rmap2(o, "mul")

    def __truediv__(self, o):
        return self._map2(o, "div")

    def __rtruediv__(self, o):
        return self._rmap2(o, "div")

    def __pow__(self, o):
        return self._map2(o, "pow")

    def __neg__(self):
        return ExpVector([-x for x in self.data])

    def dot(self, o):
        pairs = _broadcast(self, o)
        acc = None
        for x, y in pairs:
            t = x * y
            acc = t if acc is None else acc + t
        return acc

    def sum(self):
        acc = None
        for x in self.data:
            acc = x if acc is None else acc + x
        return acc

    def __repr__(self):
        return f"Vector({', '.join(map(repr, self.data))})"


# ---------------------------------------------------------------------------
# elementwise math / comparison helpers (vector-aware)
# ---------------------------------------------------------------------------


def _unary(op):
    def f(x):
        if isinstance(x, ExpVector):
            return ExpVector([Apply(op, (toexp(c),)) for c in x.data])
        return Apply(op, (toexp(x),))

    f.__name__ = op
    return f


def _binary(op):
    def f(a, b):
        if isinstance(a, ExpVector) or isinstance(b, ExpVector):
            return ExpVector([Apply(op, (x, y)) for x, y in _broadcast(a, b)])
        return Apply(op, (toexp(a), toexp(b)))

    f.__name__ = op
    return f


sqrt = _unary("sqrt")
sin = _unary("sin")
cos = _unary("cos")
tan = _unary("tan")
asin = _unary("asin")
acos = _unary("acos")
atan = _unary("atan")
sinh = _unary("sinh")
cosh = _unary("cosh")
tanh = _unary("tanh")
asinh = _unary("asinh")
acosh = _unary("acosh")
exp = _unary("exp")
log = _unary("log")
log10 = _unary("log10")
abs_ = _unary("abs")
not_ = _unary("not_")

pow_ = _binary("pow")
atan2 = _binary("atan2")
and_ = _binary("and_")
or_ = _binary("or_")
less = _binary("less")
greater = _binary("greater")
lesseq = _binary("lesseq")
greatereq = _binary("greatereq")
eq = _binary("eq")


def select(cond, a, b):
    """ad.select parity: elementwise select; scalars broadcast against
    whichever of cond/a/b is a vector."""
    n = None
    for v in (cond, a, b):
        if isinstance(v, ExpVector):
            if n is not None and len(v.data) != n:
                raise ValueError("select channel mismatch")
            n = len(v.data)
    if n is None:
        return Apply("select", (toexp(cond), toexp(a), toexp(b)))

    def chan(v, i):
        return v.data[i] if isinstance(v, ExpVector) else toexp(v)

    return ExpVector(
        [
            Apply("select", (chan(cond, i), chan(a, i), chan(b, i)))
            for i in range(n)
        ]
    )


def Vector(*args):
    """ad.Vector parity: build an ExpVector from scalars."""
    flat = []
    for a in args:
        if isinstance(a, ExpVector):
            flat.extend(a.data)
        else:
            flat.append(toexp(a))
    return ExpVector(flat)


# ---------------------------------------------------------------------------
# traversal / structural utilities
# ---------------------------------------------------------------------------


def visit(e, fn, seen=None):
    """Call fn on every node of the DAG once (cf. Exp:visit in ad.t)."""
    if seen is None:
        seen = set()
    if id(e) in seen:
        return
    seen.add(id(e))
    fn(e)
    if isinstance(e, Apply):
        for a in e.args:
            visit(a, fn, seen)
    elif isinstance(e, SampledAccess):
        for a in e.coords:
            visit(a, fn, seen)


def shiftexp(e, offset, memo=None):
    """Re-center an expression by a static offset (o.t:1819-1824).

    Every ImageAccess / BoundsAccess / IndexValue leaf is shifted; graph
    accesses cannot be shifted.
    """
    if memo is None:
        memo = {}
    r = memo.get(id(e))
    if r is not None:
        return r
    if isinstance(e, Apply):
        r = Apply(e.op, tuple(shiftexp(a, offset, memo) for a in e.args))
    elif isinstance(e, ImageAccess):
        assert isinstance(e.index, Offset), "cannot shift graph accesses"
        r = ImageAccess(e.image, e.index.shift(offset), e.channel)
    elif isinstance(e, ComputedAccess):
        r = ComputedAccess(
            e.cimage, e.channel,
            tuple(a + b for a, b in zip(e.offset, offset)),
        )
    elif isinstance(e, BoundsAccess):
        r = e.shift(offset)
    elif isinstance(e, IndexValue):
        shift_list = list(offset)
        r = IndexValue(e.dim, e.shift_ + shift_list[e.dim])
    elif isinstance(e, SampledAccess):
        r = SampledAccess(
            e.simage,
            e.channel,
            tuple(shiftexp(c, offset, memo) for c in e.coords),
        )
    else:
        r = e
    memo[id(e)] = r
    return r
