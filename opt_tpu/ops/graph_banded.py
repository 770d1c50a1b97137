"""Banded one-hot graph gather/scatter engine (MXU-native).

TPU XLA row-gathers and segment-sum scatters cost ~250 us each at 60k
rows (~4 ns/row) -- they serialize on the sparse-index path and dominate
graph-domain solves (arap ~1.36 ms per PCG iteration in round 1;
see docs/ROUND3_TODO.md).  This module replaces them with dense block matmuls the MXU
executes at full rate, playing the role of the reference's hand-written
atomic scatter kernels (reference: API/src/backend_cuda.t:366-445 and
examples/arap_mesh_deformation/src/WarpingSolver.cu).

Scheme
------
1. Reverse-Cuthill-McKee reorder the vertices so every edge's endpoints
   are within a small bandwidth `bw` of each other.
2. Sort edges by slot-0 vertex and tile them into per-vertex-block groups
   of EB edges (padded).  With block size VB >= bw, every endpoint of an
   edge in block b lies in the 3-block window [(b-1)VB, (b+2)VB).
3. Gather = (EB x 3VB) one-hot  @  (3VB x C) window, generated on the fly
   from an iota comparison; scatter is the transposed matmul, with the
   3-block window overlap-added back.  Both run on the MXU.
4. Exactness: bf16 matmuls would round the values, so each f32 operand is
   split into three scaled bf16 planes packed along the channel axis
   (hi + mid/2^8 + lo/2^16) and recombined after the matmul -- gathers are
   bit-exact, scatters accumulate in the MXU's f32 accumulator (same error
   class as f32 atomics).  `optimization_barrier` guards stop XLA's
   excess-precision pass from folding the f32->bf16->f32 round-trips away
   (measured: without barriers the split collapses to plain bf16).

`linear_call` pairs gather/scatter as each other's transposes, so the
solver's `jax.linearize` / `jax.linear_transpose` J/J^T machinery routes
through the banded kernels in both directions.

Measured (v5e, 10370-vertex / 62208-edge subdivided armadillo, C=8):
full JtJp-style apply (2 gathers + 2 scatters) 189 us vs 1067 us for
take/segment_sum -- 5.7x; gathers bit-exact vs jnp.take.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.custom_derivatives import linear_call

LANE = 128
SUBLANE = 8


def _roundup(v, m):
    return ((v + m - 1) // m) * m


# ---------------------------------------------------------------------------
# host-side planning
# ---------------------------------------------------------------------------


class GraphBandPlan:
    """Per-graph edge tiling (shared vertex permutation lives in
    VertexBanding)."""

    __slots__ = ("name", "vb", "n_vblk", "eb", "ep", "n_edges",
                 "loc", "pad_mask", "edge_perm")

    def __init__(self, name, vb, n_vblk, eb, n_edges, loc, pad_mask,
                 edge_perm):
        self.name = name
        self.vb = vb
        self.n_vblk = n_vblk
        self.eb = eb
        self.ep = n_vblk * eb
        self.n_edges = n_edges
        self.loc = loc              # slot -> (n_vblk, eb) int32, -1 = pad
        self.pad_mask = pad_mask    # (ep,) bool, True = real edge
        self.edge_perm = edge_perm  # (n_edges,) position of edge i in ep


class VertexBanding:
    """RCM vertex permutation + per-graph edge tilings for one vertex
    index space."""

    __slots__ = ("n_verts", "perm", "inv_perm", "vb", "bandwidth", "graphs")

    def __init__(self, n_verts, perm, inv_perm, vb, bandwidth, graphs):
        self.n_verts = n_verts
        self.perm = perm          # new position i holds old vertex perm[i]
        self.inv_perm = inv_perm  # old vertex v now sits at inv_perm[v]
        self.vb = vb
        self.bandwidth = bandwidth
        self.graphs = graphs      # gname -> GraphBandPlan


def plan_vertex_banding(graphs_np, n_verts, max_bandwidth=2048,
                        min_edges=2048, force=False):
    """Plan banding for one vertex space, or None if unprofitable.

    graphs_np: gname -> {slot: (E,) int index array} (all on this space).
    force: skip the profitability thresholds (tests / explicit opt-in).
    """
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    total_edges = sum(
        len(next(iter(slots.values()))) for slots in graphs_np.values()
    )
    if not force and (total_edges < min_edges or n_verts < 256):
        return None

    # union adjacency over every slot pair of every graph
    rows, cols = [], []
    for slots in graphs_np.values():
        arrs = [np.asarray(a, np.int64) for a in slots.values()]
        for i in range(len(arrs)):
            for j in range(i + 1, len(arrs)):
                rows.append(arrs[i])
                cols.append(arrs[j])
    if not rows:
        return None
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    adj = csr_matrix(
        (np.ones(len(r), np.float32), (r, c)), shape=(n_verts, n_verts)
    )
    perm = np.asarray(reverse_cuthill_mckee(adj, symmetric_mode=False),
                      np.int64)
    inv = np.empty(n_verts, np.int64)
    inv[perm] = np.arange(n_verts)
    bw = int(np.abs(inv[r] - inv[c]).max()) if len(r) else 0
    if not force and bw > max_bandwidth:
        return None
    vb = max(LANE, _roundup(max(bw, 1), LANE))

    n_vblk = (n_verts + vb - 1) // vb
    plans = {}
    for gname, slots in graphs_np.items():
        snames = list(slots)
        s0 = inv[np.asarray(slots[snames[0]], np.int64)]
        order = np.argsort(s0, kind="stable")
        e_sorted = {sn: inv[np.asarray(slots[sn], np.int64)][order]
                    for sn in snames}
        key0 = e_sorted[snames[0]]
        starts = np.searchsorted(key0, np.arange(n_vblk) * vb)
        ends = np.searchsorted(key0, np.arange(1, n_vblk + 1) * vb)
        n_edges = len(key0)
        eb = int(_roundup(max(int((ends - starts).max()), 1), SUBLANE))
        loc = {}
        for sn in snames:
            lc = np.full((n_vblk, eb), -1, np.int32)
            vals = e_sorted[sn]
            for b in range(n_vblk):
                s, e = starts[b], ends[b]
                lc[b, : e - s] = vals[s:e] - (b - 1) * vb
            loc[sn] = lc
        pad = np.zeros((n_vblk, eb), bool)
        for b in range(n_vblk):
            pad[b, : ends[b] - starts[b]] = True
        # where each original edge landed in the padded layout
        edge_perm = np.empty(n_edges, np.int64)
        pos = np.flatnonzero(pad.reshape(-1))
        edge_perm[order] = pos
        plans[gname] = GraphBandPlan(
            gname, vb, n_vblk, eb, n_edges, loc, pad.reshape(-1), edge_perm
        )
    return VertexBanding(n_verts, perm, inv, vb, bw, plans)


@jax.tree_util.register_pytree_node_class
class DeviceBanding:
    """Device-side banding for one graph: loc index arrays + pad mask are
    pytree leaves; the tiling geometry is static aux data (so it stays a
    Python int under jit instead of being traced)."""

    def __init__(self, loc, pad_mask, vb, n_vblk, eb, n_verts):
        self.loc = loc            # slot -> (n_vblk, eb) int32
        self.pad_mask = pad_mask  # (n_vblk*eb,) bool
        self.vb = vb
        self.n_vblk = n_vblk
        self.eb = eb
        self.n_verts = n_verts

    def meta(self):
        return dict(vb=self.vb, n_vblk=self.n_vblk, eb=self.eb,
                    n_verts=self.n_verts)

    def tree_flatten(self):
        return (
            (self.loc, self.pad_mask),
            (self.vb, self.n_vblk, self.eb, self.n_verts),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)


# ---------------------------------------------------------------------------
# device ops
# ---------------------------------------------------------------------------

_BAR = jax.lax.optimization_barrier


def _split3(x):
    """f32 -> three scaled bf16 planes on the channel axis (exact to
    ~2^-26 relative; see module docstring for the barrier rationale)."""
    hi = _BAR(x.astype(jnp.bfloat16))
    r1 = x - hi.astype(jnp.float32)
    mid = _BAR((r1 * 256.0).astype(jnp.bfloat16))
    r2 = r1 - mid.astype(jnp.float32) * (1.0 / 256.0)
    lo = _BAR((r2 * 65536.0).astype(jnp.bfloat16))
    return jnp.concatenate([hi, mid, lo], axis=-1)


def _recomb(out, c):
    return (out[..., :c] + out[..., c:2 * c] * (1.0 / 256.0)
            + out[..., 2 * c:] * (1.0 / 65536.0))


def _windows(pb):
    """(n_vblk, VB, C) -> (n_vblk, 3VB, C) neighbor-block windows."""
    z = jnp.zeros_like(pb[:1])
    up = jnp.concatenate([pb[1:], z], 0)
    dn = jnp.concatenate([z, pb[:-1]], 0)
    return jnp.concatenate([dn, pb, up], 1)


def _gather_impl(loc, values, *, vb, n_vblk, eb, n_verts):
    c = values.shape[-1]
    pb = jnp.pad(values, ((0, n_vblk * vb - n_verts), (0, 0)))
    pb = pb.reshape(n_vblk, vb, c)
    ws = _split3(_windows(pb))

    def blk(locb, wb):
        oh = (locb[:, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (eb, 3 * vb), 1)
              ).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            oh, wb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return _recomb(out, c)

    return jax.vmap(blk)(loc, ws).reshape(n_vblk * eb, c)


def _scatter_impl(loc, edges, *, vb, n_vblk, eb, n_verts):
    c = edges.shape[-1]
    es = _split3(edges.reshape(n_vblk, eb, c))

    def blk(locb, ebk):
        oh = (locb[:, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (eb, 3 * vb), 1)
              ).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            oh, ebk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return _recomb(out, c)

    w = jax.vmap(blk)(loc, es)  # (n_vblk, 3VB, C) window contributions
    z = jnp.zeros_like(w[:1, :vb])
    mid = w[:, vb:2 * vb]
    from_up = jnp.concatenate([w[1:, :vb], z], 0)
    from_dn = jnp.concatenate([z, w[:-1, 2 * vb:]], 0)
    return (mid + from_up + from_dn).reshape(-1, c)[:n_verts]


def banded_gather(loc, values, *, vb, n_vblk, eb, n_verts):
    """values (n_verts, C) f32 -> padded edge rows (n_vblk*eb, C).

    Bit-exact vs jnp.take; pad rows (loc == -1) come back zero.  Linear in
    `values`, transposing to `banded_scatter`."""
    meta = dict(vb=vb, n_vblk=n_vblk, eb=eb, n_verts=n_verts)

    def fwd(res, v):
        return _gather_impl(res, v, **meta)

    def bwd(res, ct):
        return _scatter_impl(res, ct, **meta)

    return linear_call(fwd, bwd, loc, values)


def banded_scatter(loc, edges, *, vb, n_vblk, eb, n_verts):
    """Padded edge rows (n_vblk*eb, C) f32 -> summed (n_verts, C).

    Duplicate targets accumulate in the MXU's f32 accumulator (same error
    class as f32 atomic adds).  Pad rows are dropped (one-hot of -1 is the
    zero row).  Linear in `edges`, transposing to `banded_gather`."""
    meta = dict(vb=vb, n_vblk=n_vblk, eb=eb, n_verts=n_verts)

    def fwd(res, e):
        return _scatter_impl(res, e, **meta)

    def bwd(res, ct):
        return _gather_impl(res, ct, **meta)

    return linear_call(fwd, bwd, loc, edges)
