"""Residual-term classification.

Mirrors classifyexpression / toenergyspecs (reference: API/src/o.t:2669-2716):
each scalar residual is assigned to either the index space of the images it
reads (centered) or to a graph (edge-mapped), and centered residuals that
read out-of-bounds stencil offsets are auto-wrapped in
``select(InBounds(bbox), residual, 0)`` unless the user supplied an explicit
InBounds guard (bboxforexpression, o.t:1664-1684).
"""

from __future__ import annotations

from ..dsl import expr as E


class TermGroup:
    """All residual channels mapped over one domain (o.t EnergySpec)."""

    def __init__(self, kind, ispace=None, graph=None):
        self.kind = kind  # 'centered' | 'graph'
        self.ispace = ispace
        self.graph = graph
        self.exprs = []
        # deduped unknown leaf accesses: list of (img, index, channel) keys,
        # with a representative ImageAccess each (for diag(J^T J))
        self.unknown_leaves = []
        self._seen_leaves = set()

    def domain_key(self):
        if self.kind == "centered":
            return ("centered", self.ispace.key())
        return ("graph", self.graph.name)

    def add(self, exp, leaves):
        self.exprs.append(exp)
        for a in leaves:
            k = a.key()
            if k not in self._seen_leaves:
                self._seen_leaves.add(k)
                self.unknown_leaves.append(a)

    def __repr__(self):
        return (
            f"TermGroup({self.kind}, {len(self.exprs)} residual channels, "
            f"{len(self.unknown_leaves)} unknown leaves)"
        )


def _analyze(exp):
    """Walk a residual: find unknown accesses, classification, bbox, guards."""
    unknown_accesses = []
    seen = set()
    classification = {"value": None}
    uses_bounds = {"value": False}
    bbox = {"min": None, "max": None}

    def on_node(a):
        if isinstance(a, E.ImageAccess):
            img = a.image
            if img.is_unknown:
                k = a.key()
                if k not in seen:
                    seen.add(k)
                    unknown_accesses.append(a)
            if isinstance(a.index, E.Offset):
                cls = ("centered", img.ispace)
                off = a.index.data
                if bbox["min"] is None:
                    bbox["min"] = list(off)
                    bbox["max"] = list(off)
                else:
                    bbox["min"] = [min(m, o) for m, o in zip(bbox["min"], off)]
                    bbox["max"] = [max(m, o) for m, o in zip(bbox["max"], off)]
            else:
                g = a.index.graph
                cls = ("graph", g)
            prev = classification["value"]
            if prev is None:
                classification["value"] = cls
            else:
                pk, pv = prev
                ck, cv = cls
                same = pk == ck and (
                    (pk == "graph" and pv is cv)
                    or (pk == "centered" and pv == cv)
                )
                if not same:
                    raise ValueError(
                        "residual contains image reads from multiple domains"
                    )
        elif isinstance(a, E.ComputedAccess):
            # classification/leaves/bbox must see through the buffer to
            # the composed unknown taps (the inline view)
            E.visit(a.expanded(), on_node)
        elif isinstance(a, E.BoundsAccess):
            uses_bounds["value"] = True
        elif isinstance(a, E.SampledAccess):
            # sampling reads are dynamically guarded inside bilinear_sample
            pass

    E.visit(exp, on_node)
    if classification["value"] is None:
        raise ValueError("residual must actually use some image")
    return classification["value"], unknown_accesses, uses_bounds["value"], bbox


def classify_terms(spec):
    """Group residual channels into TermGroups (toenergyspecs parity)."""
    groups = {}
    for exp in spec.terms:
        (kind, target), leaves, uses_bounds, bbox = _analyze(exp)
        if kind == "centered":
            nd = target.ndims
            if not uses_bounds and bbox["min"] is not None:
                bmin = [min(0, m) for m in bbox["min"]]
                bmax = [max(0, m) for m in bbox["max"]]
                if any(m != 0 for m in bmin) or any(m != 0 for m in bmax):
                    # zero-out residuals whose stencil leaves the domain
                    # (classifyexpression, o.t:2704-2708)
                    guard = E.BoundsAccess(tuple(bmin), tuple(bmax))
                    exp = E.Apply("select", (guard, exp, E.Const(0.0)))
            key = ("centered", target.key())
            if key not in groups:
                groups[key] = TermGroup("centered", ispace=target)
        else:
            key = ("graph", target.name)
            if key not in groups:
                groups[key] = TermGroup("graph", graph=target)
        groups[key].add(exp, leaves)
    return list(groups.values())


def classify_excludes(spec):
    """Exclusion predicates grouped by index space (o.t:3213-3215).

    Returns dict: ispace key -> list of exprs.  Graph-domain excludes are
    not supported (the reference never uses them; graph kernels default to
    exclude=false, o.t:457-458)."""
    out = {}
    for exp in spec.excludes:
        (kind, target), _, _, _ = _analyze(exp)
        if kind != "centered":
            raise ValueError("Exclude() must be a centered expression")
        out.setdefault(target.key(), []).append(exp)
    return out
