"""Problem specification handles: Dim / Image / Param / Graph / ProblemSpec.

Mirrors the registration model of the reference (reference: API/src/o.t:
ProblemSpec o.t:251-474, ProblemSpecAD o.t:1572-1741) with the mechanics
replaced: instead of staging Terra structs, handles record symbolic accesses
(opt_tpu/dsl/expr.py) that later evaluate to JAX arrays.

Array-layout convention: an image over dims (W, H) is stored as a JAX array
of shape (H, W, C) -- dim 0 of the DSL (W, the x axis) is the *last* spatial
axis, matching the reference's linearization ``linear = y*W + x``
(o.t:560-575).  For dims (W, H, D) the shape is (D, H, W, C); for (N,) it is
(N, C).
"""

from __future__ import annotations

from . import expr as E


class Dim:
    """A named problem dimension with its size bound at plan time
    (reference: Opt_ProblemPlan dims array, Opt.h:49-51, o.t:1351-1400)."""

    __slots__ = ("name", "index", "size")

    def __init__(self, name, index, size):
        self.name = name
        self.index = int(index)
        self.size = int(size)

    def __repr__(self):
        return f"Dim({self.name}={self.size})"


class IndexSpace:
    """An index space: ordered tuple of Dims (o.t IndexSpace, o.t:529-641)."""

    __slots__ = ("dims",)

    def __init__(self, dims):
        self.dims = tuple(dims)

    @property
    def ndims(self):
        return len(self.dims)

    @property
    def shape(self):
        """Array spatial shape: reversed dim order (x axis last)."""
        return tuple(d.size for d in reversed(self.dims))

    def zero_offset(self):
        return E.Offset((0,) * len(self.dims))

    def key(self):
        return tuple(d.name for d in self.dims)

    def __eq__(self, o):
        return isinstance(o, IndexSpace) and self.key() == o.key()

    def __hash__(self):
        return hash(("IndexSpace", self.key()))

    def __repr__(self):
        return f"IndexSpace({', '.join(map(repr, self.dims))})"


def _channels_of(typ):
    """Accept channel counts in the reference's spelling or as plain ints."""
    if isinstance(typ, int):
        return typ
    if isinstance(typ, str):
        t = typ.strip()
        if t in ("uint8", "int8", "int32", "uint32", "int64", "bool"):
            return 1  # integral mask types become 1-channel floats
        for prefix in ("opt_float", "opt_double", "float", "double"):
            if t.startswith(prefix):
                rest = t[len(prefix):]
                return int(rest) if rest else 1
        raise ValueError(f"unknown element type {typ!r}")
    raise TypeError(f"expected channel count or type name, got {typ!r}")


class Image:
    """An image/array handle: Unknown or constant Array
    (reference: ProblemSpecAD:Image o.t:1591-1660)."""

    __slots__ = ("name", "ispace", "channels", "idx", "is_unknown", "spec")

    def __init__(self, name, ispace, channels, idx, is_unknown, spec):
        self.name = name
        self.ispace = ispace
        self.channels = int(channels)
        self.idx = idx
        self.is_unknown = is_unknown
        self.spec = spec

    def __call__(self, *args):
        """Read at an Offset, a graph slot, or (offsets..., channel)
        (the optional trailing channel arg mirrors o.t:1776-1786)."""
        if args and isinstance(args[0], GraphSlot):
            slot = args[0]
            index = E.GraphElement(slot.graph, slot.name)
            rest = args[1:]
        else:
            nd = self.ispace.ndims
            if len(args) == nd + 1:
                index = E.Offset(args[:nd])
                rest = args[nd:]
            elif len(args) == nd:
                index = E.Offset(args)
                rest = ()
            else:
                raise ValueError(
                    f"{self.name}: expected {nd} offsets "
                    f"(+ optional channel), got {len(args)}"
                )
        if rest:
            (c,) = rest
            if not (0 <= int(c) < self.channels):
                raise ValueError(f"{self.name}: channel {c} out of range")
            return E.ImageAccess(self, index, int(c))
        chans = [E.ImageAccess(self, index, c) for c in range(self.channels)]
        if self.channels == 1:
            return chans[0]
        return E.ExpVector(chans)

    def __repr__(self):
        kind = "Unknown" if self.is_unknown else "Array"
        return f"{kind}({self.name}:{self.channels}ch)"


class ComputedImage:
    """ComputedArray: a named expression over the grid
    (reference: ProblemSpecAD:ComputedImage o.t:1686-1719).

    The reference materializes these into buffers during ``precompute``
    (re-run whenever the unknowns change, solverGPUGaussNewton.t:1876,2242)
    and differentiates residuals through the stored buffers.  Accesses
    yield ComputedAccess nodes; the evaluator materializes the defining
    expression once per context and reads shifted views on the solve path
    (matching the reference), while diag(J^T J)/materialized-J expand the
    inline view so leaf partials see through to the unknowns
    (compile/evaluate.py, compile/terms.py).
    """

    __slots__ = ("name", "ispace", "exprs")

    def __init__(self, name, ispace, exprs):
        self.name = name
        self.ispace = ispace
        self.exprs = [E.toexp(x) for x in exprs]

    @property
    def channels(self):
        return len(self.exprs)

    def __call__(self, *offsets):
        off = tuple(int(o) for o in offsets)
        if len(off) != self.ispace.ndims:
            raise ValueError(f"{self.name}: offset rank mismatch")
        nodes = [
            E.ComputedAccess(self, c, off) for c in range(len(self.exprs))
        ]
        if len(nodes) == 1:
            return nodes[0]
        return E.ExpVector(nodes)


class SampledImage:
    """Bilinearly sampled image with optional user-supplied derivative images
    (reference: ad.sampledimage o.t:3259-3282)."""

    __slots__ = ("image", "dx", "dy")

    def __init__(self, image, dx=None, dy=None):
        assert image.ispace.ndims == 2, "sampled images must be 2D"
        self.image = image
        self.dx = dx
        self.dy = dy

    def __call__(self, x, y, c=None):
        coords = (E.toexp(x), E.toexp(y))
        if c is not None or self.image.channels == 1:
            return E.SampledAccess(self, c or 0, coords)
        return E.ExpVector(
            [
                E.SampledAccess(self, i, coords)
                for i in range(self.image.channels)
            ]
        )


class Param:
    """A scalar problem parameter (o.t ProblemParam / ScalarParam)."""

    __slots__ = ("name", "idx")

    def __init__(self, name, idx):
        self.name = name
        self.idx = idx

    def expr(self):
        return E.ParamValue(self)


class GraphSlot:
    __slots__ = ("graph", "name", "ispace")

    def __init__(self, graph, name, ispace):
        self.graph = graph
        self.name = name
        self.ispace = ispace


class Graph:
    """Hyper-edge set: named vertex-index slots over an edge dim
    (reference: ProblemSpecAD:Graph o.t:1663-1684, OptGraph.h).

    Note: no __slots__ -- slot names become attributes (G.v0, G.v1, ...).
    """

    def __init__(self, name, edge_dim, slots):
        self.name = name
        self.edge_dim = edge_dim
        self.slots = {}
        for sname, ispace in slots:
            slot = GraphSlot(self, sname, ispace)
            self.slots[sname] = slot
            setattr(self, sname, slot)

    def __repr__(self):
        return f"Graph({self.name}: {list(self.slots)})"


class ProblemSpec:
    """Collects everything an energy file declares (o.t ProblemSpecAD)."""

    def __init__(self):
        self.dims = {}  # name -> Dim
        self.images = {}  # name -> Image (unknowns and arrays)
        self.computed = {}  # name -> ComputedImage
        self.params = {}  # name -> Param
        self.graphs = {}  # name -> Graph
        self.terms = []  # scalar residual Exps (flattened channels)
        self.excludes = []  # scalar Exps
        self.use_preconditioner = True

    # -- registration, called by the env (opt_tpu/dsl/env.py) --

    def dim(self, name, index, size):
        d = self.dims.get(name)
        if d is None:
            d = Dim(name, index, size)
            self.dims[name] = d
        return d

    def ispace(self, dims):
        return IndexSpace(dims)

    def image(self, name, typ, dims, idx, is_unknown):
        channels = _channels_of(typ)
        im = Image(
            name, self.ispace(dims), channels, idx, is_unknown, self
        )
        if name in self.images:
            # The reference allows re-binding the same buffer under a new
            # name (const views, intrinsic_image_decomposition.t:7); each
            # handle keeps its own idx so data binding stays by-name.
            pass
        self.images[name] = im
        return im

    def computed_image(self, name, dims, exprs):
        ci = ComputedImage(name, self.ispace(dims), exprs)
        self.computed[name] = ci
        return ci

    def param(self, name, idx):
        p = Param(name, idx)
        self.params[name] = p
        return p

    def graph(self, name, edge_dim, slots):
        g = Graph(name, edge_dim, slots)
        self.graphs[name] = g
        return g

    def energy(self, *terms):
        """Flatten ExpVector terms into scalar residual channels
        (extractresidualterms, o.t:3155-3169)."""
        for t in terms:
            if isinstance(t, E.ExpVector):
                self.terms.extend(t.expressions())
            else:
                self.terms.append(E.toexp(t))

    def exclude(self, e):
        self.excludes.append(E.toexp(e))

    @property
    def unknowns(self):
        return {n: im for n, im in self.images.items() if im.is_unknown}
