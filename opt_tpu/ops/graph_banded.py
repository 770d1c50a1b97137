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
    VertexBanding).

    Two layouts:
      'balanced' -- edges sorted by slot-0 vertex, tiled into per-vertex-
        block groups of eb edges; every slot gathers/scatters via one-hot
        matmuls.
      'ell' -- edges stored at row v*deg + k keyed by their PRIMARY slot's
        vertex v (fixed-degree ELL padding).  The primary slot's gather is
        then a pure broadcast and its scatter a dense row-sum (no one-hot
        at all); only the other slots pay the one-hot matmul.  Chosen when
        (n_slots-1) * n_verts * deg one-hot rows beat the balanced
        n_slots * n_vblk * eb (true for near-regular meshes: for a
        symmetrized triangle mesh it halves the MXU work of a 2-slot
        J^T J apply).
    """

    __slots__ = ("name", "vb", "n_vblk", "eb", "ep", "n_edges",
                 "loc", "pad_mask", "edge_perm", "layout", "primary_slot",
                 "deg")

    def __init__(self, name, vb, n_vblk, eb, n_edges, loc, pad_mask,
                 edge_perm, layout="balanced", primary_slot=None, deg=0):
        self.name = name
        self.vb = vb
        self.n_vblk = n_vblk
        self.eb = eb
        self.ep = n_vblk * eb
        self.n_edges = n_edges
        self.loc = loc              # slot -> (n_vblk, eb) int32, -1 = pad
        self.pad_mask = pad_mask    # (ep,) bool, True = real edge
        self.edge_perm = edge_perm  # (n_edges,) position of edge i in ep
        self.layout = layout
        self.primary_slot = primary_slot  # 'ell': the broadcast/sum slot
        self.deg = deg                    # 'ell': rows per vertex


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
        plans[gname] = _plan_graph_layout(
            gname, slots, inv, n_verts, vb, n_vblk
        )
    return VertexBanding(n_verts, perm, inv, vb, bw, plans)


def _plan_graph_layout(gname, slots, inv, n_verts, vb, n_vblk):
    """Pick balanced vs ELL layout for one graph and build its tiling."""
    snames = list(slots)
    perm_slots = {sn: inv[np.asarray(slots[sn], np.int64)] for sn in snames}
    n_edges = len(perm_slots[snames[0]])

    # balanced layout geometry (sorted by slot 0, per-vertex-block tiles)
    s0 = perm_slots[snames[0]]
    order_bal = np.argsort(s0, kind="stable")
    key0 = s0[order_bal]
    starts = np.searchsorted(key0, np.arange(n_vblk) * vb)
    ends = np.searchsorted(key0, np.arange(1, n_vblk + 1) * vb)
    eb_bal = int(_roundup(max(int((ends - starts).max()), 1), SUBLANE))
    work_bal = len(snames) * n_vblk * eb_bal

    # best ELL candidate: one-hot work = (n_slots-1) * n_vblk * vb * deg
    ell_sn, ell_deg = None, 0
    for sn in snames:
        deg = int(np.bincount(perm_slots[sn], minlength=n_verts).max()) \
            if n_edges else 1
        deg = max(deg, 1)
        if ell_sn is None or deg < ell_deg:
            ell_sn, ell_deg = sn, deg
    work_ell = (len(snames) - 1) * n_vblk * vb * ell_deg

    import os

    forced = os.environ.get("OPT_TPU_GRAPH_LAYOUT", "auto")
    use_ell = work_ell < work_bal if forced == "auto" else forced == "ell"
    if use_ell:
        eb = vb * ell_deg
        sp = perm_slots[ell_sn]
        order = np.argsort(sp, kind="stable")
        sv = sp[order]
        vstarts = np.searchsorted(sv, np.arange(n_verts))
        k = np.arange(n_edges, dtype=np.int64) - vstarts[sv]
        rows = sv * ell_deg + k  # global padded row of each sorted edge
        loc = {}
        for sn in snames:
            lc = np.full(n_vblk * eb, -1, np.int32)
            vals = perm_slots[sn][order]
            blk = rows // eb
            lc[rows] = (vals - (blk - 1) * vb).astype(np.int32)
            loc[sn] = lc.reshape(n_vblk, eb)
        pad = np.zeros(n_vblk * eb, bool)
        pad[rows] = True
        edge_perm = np.empty(n_edges, np.int64)
        edge_perm[order] = rows
        return GraphBandPlan(
            gname, vb, n_vblk, eb, n_edges, loc, pad, edge_perm,
            layout="ell", primary_slot=ell_sn, deg=ell_deg,
        )

    eb = eb_bal
    loc = {}
    for sn in snames:
        lc = np.full((n_vblk, eb), -1, np.int32)
        vals = perm_slots[sn][order_bal]
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
    edge_perm[order_bal] = pos
    return GraphBandPlan(
        gname, vb, n_vblk, eb, n_edges, loc, pad.reshape(-1), edge_perm
    )


@jax.tree_util.register_pytree_node_class
class DeviceBanding:
    """Device-side banding for one graph: loc index arrays + pad mask are
    pytree leaves; the tiling geometry is static aux data (so it stays a
    Python int under jit instead of being traced)."""

    def __init__(self, loc, pad_mask, vb, n_vblk, eb, n_verts,
                 layout="balanced", primary_slot=None, deg=0):
        self.loc = loc            # slot -> (n_vblk, eb) int32
        self.pad_mask = pad_mask  # (n_vblk*eb,) bool
        self.vb = vb
        self.n_vblk = n_vblk
        self.eb = eb
        self.n_verts = n_verts
        self.layout = layout
        self.primary_slot = primary_slot
        self.deg = deg

    def meta(self):
        return dict(vb=self.vb, n_vblk=self.n_vblk, eb=self.eb,
                    n_verts=self.n_verts)

    def tree_flatten(self):
        return (
            (self.loc, self.pad_mask),
            (self.vb, self.n_vblk, self.eb, self.n_verts,
             self.layout, self.primary_slot, self.deg),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)


# ---------------------------------------------------------------------------
# device ops
# ---------------------------------------------------------------------------

_BAR = jax.lax.optimization_barrier


def _trunc_bf16(x):
    """Truncate f32 to bf16 via integer bits (the top 16 bits of an f32
    ARE its bf16 truncation, for any sign/subnormal).  Pure bit ops: the
    XLA excess-precision pass cannot fold this back to f32 the way it
    folds convert(f32->bf16->f32) round-trips, so no optimization_barrier
    is needed -- and without barriers the whole split fuses into the
    one-hot dot's operand instead of materializing three planes (the
    barrier version measured ~40 extra us/PCG-iteration of fusion
    boundaries on the flagship arap solve)."""
    xi = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        (xi >> jnp.uint32(16)).astype(jnp.uint16), jnp.bfloat16
    )


def _split3(x):
    """f32 -> three scaled bf16 planes on the channel axis; exact:
    x == hi + mid/2^8 + lo/2^16 bit-for-bit (truncating Dekker-style
    split, 8 mantissa bits per plane) for all normal f32 and zeros;
    f32 subnormals (<1.2e-38) lose their last mantissa-field bit."""
    hi = _trunc_bf16(x)
    r1 = x - hi.astype(jnp.float32)
    mid = _trunc_bf16(r1 * 256.0)
    r2 = r1 - mid.astype(jnp.float32) * (1.0 / 256.0)
    lo = _trunc_bf16(r2 * 65536.0)
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


_ONEHOT_TAG = [0]


def _next_tag(operand):
    """Tag making each one-hot generation structurally unique AND
    data-dependent on its dot's other operand.

    XLA CSEs identical one-hot subexpressions; a one-hot with two fusion
    consumers (a gather dot and a scatter dot on the same loc, or the
    primal and tangent gathers sharing one linear_call trace) gets
    MATERIALIZED to HBM, and every banded op then pays a ~48 MB read
    (measured ~59 us/op vs ~21 us when each dot fuses its own
    iota-compare).  Comparing (loc - tag) == (iota - tag) is the same
    one-hot but a distinct expression; deriving tag from the operand
    (0 * operand[0,0] behind an optimization_barrier, so it cannot fold
    to a shared constant) keeps it unique per invocation."""
    import os

    mode = os.environ.get("OPT_TPU_ONEHOT_TAG", "static")
    if mode == "none":
        return 0
    _ONEHOT_TAG[0] = (_ONEHOT_TAG[0] + 1) % 1024
    if mode == "dynamic":
        first = operand.reshape(-1)[0]
        dyn = _BAR(first * 0).astype(jnp.int32)
        return _ONEHOT_TAG[0] + dyn
    return _ONEHOT_TAG[0]


def _use_pallas_onehot():
    """OPT_TPU_ONEHOT=pallas routes one-hot matmuls through the Pallas
    kernels (ops/onehot_pallas.py).  Off by default: measured ~68 us per
    gather vs ~21 us for XLA's own fused iota-compare+dot once CSE
    materialization is defeated (_next_tag); kept as the measured record
    of the in-VMEM one-hot design."""
    import os

    return os.environ.get("OPT_TPU_ONEHOT", "xla") == "pallas"


def _gather_impl(loc, values, *, vb, n_vblk, eb, n_verts):
    c = values.shape[-1]
    pb = jnp.pad(values, ((0, n_vblk * vb - n_verts), (0, 0)))
    pb = pb.reshape(n_vblk, vb, c)
    ws = _split3(_windows(pb))

    if _use_pallas_onehot():
        from .onehot_pallas import onehot_gather_blocks

        out = onehot_gather_blocks(loc, ws)
        return _recomb(out, c)

    t = _next_tag(values)

    def blk(locb, wb):
        oh = ((locb[:, None] - t) ==
              (jax.lax.broadcasted_iota(jnp.int32, (eb, 3 * vb), 1) - t)
              ).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            oh, wb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return _recomb(out, c)

    return jax.vmap(blk)(loc, ws)


def _scatter_impl(loc, edges, *, vb, n_vblk, eb, n_verts):
    c = edges.shape[-1]
    es = _split3(edges)

    if _use_pallas_onehot():
        from .onehot_pallas import onehot_scatter_windows

        w = _recomb(onehot_scatter_windows(loc, es, 3 * vb), c)
    else:
        t = _next_tag(edges)

        def blk(locb, ebk):
            oh = ((locb[:, None] - t) ==
                  (jax.lax.broadcasted_iota(jnp.int32, (eb, 3 * vb), 1) - t)
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
    """values (n_verts, C) f32 -> BLOCKED padded edge rows (n_vblk, eb, C).

    Edge-domain arrays stay in the blocked 2-D tiling everywhere (the
    evaluator computes graph residual fields as (n_vblk, eb)); flattening
    to (n_vblk*eb, C) forces a sublane->lane relayout copy that profiled
    at ~45 us x2 per PCG iteration on the flagship arap solve.

    Bit-exact vs jnp.take; pad rows (loc == -1) come back zero.  Linear in
    `values`, transposing to `banded_scatter`."""
    meta = dict(vb=vb, n_vblk=n_vblk, eb=eb, n_verts=n_verts)

    def fwd(res, v):
        return _gather_impl(res, v, **meta)

    def bwd(res, ct):
        return _scatter_impl(res, ct, **meta)

    return linear_call(fwd, bwd, loc, values)


def banded_scatter(loc, edges, *, vb, n_vblk, eb, n_verts):
    """BLOCKED padded edge rows (n_vblk, eb, C) f32 -> summed (n_verts, C).

    Duplicate targets accumulate in the MXU's f32 accumulator (same error
    class as f32 atomic adds).  Pad rows are dropped (one-hot of -1 is the
    zero row).  Linear in `edges`, transposing to `banded_gather`."""
    meta = dict(vb=vb, n_vblk=n_vblk, eb=eb, n_verts=n_verts)

    def fwd(res, e):
        return _scatter_impl(res, e, **meta)

    def bwd(res, ct):
        return _gather_impl(res, ct, **meta)

    return linear_call(fwd, bwd, loc, edges)


# ---------------------------------------------------------------------------
# ELL primary-slot ops: gather = broadcast, scatter = row-sum (no one-hot)
# ---------------------------------------------------------------------------


def _ell_gather_impl(values, *, vb, n_vblk, deg, n_verts):
    c = values.shape[-1]
    pb = jnp.pad(values, ((0, n_vblk * vb - n_verts), (0, 0)))
    out = jnp.broadcast_to(
        pb.reshape(n_vblk, vb, 1, c), (n_vblk, vb, deg, c)
    )
    return out.reshape(n_vblk, vb * deg, c)


def _ell_scatter_impl(edges, *, vb, n_vblk, deg, n_verts):
    c = edges.shape[-1]
    s = edges.reshape(n_vblk, vb, deg, c).sum(axis=2)
    return s.reshape(n_vblk * vb, c)[:n_verts]


def ell_gather(values, *, vb, n_vblk, deg, n_verts):
    """Primary-slot ELL gather: vertex values (n_verts, C) broadcast to
    their deg BLOCKED edge rows (n_vblk, vb*deg, C).  NOTE: unlike
    banded_gather, PAD rows receive the vertex VALUE, not zero -- residual
    evaluation masks pad rows via GraphBandPlan.pad_mask, so nothing real
    flows from them.  Linear; transposes to ell_scatter (row-sum)."""
    meta = dict(vb=vb, n_vblk=n_vblk, deg=deg, n_verts=n_verts)

    def fwd(_, v):
        return _ell_gather_impl(v, **meta)

    def bwd(_, ct):
        return _ell_scatter_impl(ct, **meta)

    return linear_call(fwd, bwd, (), values)


def ell_scatter(edges, *, vb, n_vblk, deg, n_verts):
    """Primary-slot ELL scatter: per-vertex dense sum over the deg edge
    rows (the per-thread shadow-buffer reduction of backend_cpu_mt.t,
    without any indexed writes).  Callers must have zeroed pad rows
    (everything scattered is derived from pad-masked residual fields).
    Linear; transposes to ell_gather."""
    meta = dict(vb=vb, n_vblk=n_vblk, deg=deg, n_verts=n_verts)

    def fwd(_, e):
        return _ell_scatter_impl(e, **meta)

    def bwd(_, ct):
        return _ell_gather_impl(ct, **meta)

    return linear_call(fwd, bwd, (), edges)


# ---------------------------------------------------------------------------
# slot dispatch (the only entry points solvers/evaluators should use)
# ---------------------------------------------------------------------------


def slot_gather(band, slot, values):
    """Gather vertex `values` (n_verts, C) to this graph's padded edge
    rows for `slot`, choosing the layout-appropriate engine."""
    if band.layout == "ell" and slot == band.primary_slot:
        return ell_gather(
            values, vb=band.vb, n_vblk=band.n_vblk, deg=band.deg,
            n_verts=band.n_verts,
        )
    return banded_gather(band.loc[slot], values, **band.meta())


def slots_gather(band, slots, values):
    """Gather `values` (n_verts, C) to edge rows for EVERY slot at once:
    all one-hot slots share ONE stacked dot (their locs concatenated
    along the row axis against the same 3-block window), so a 2-slot
    J^T J apply costs one gather dot + one scatter dot per iteration
    instead of two of each (same MACs, half the dot/fusion count).
    Returns {slot: (n_vblk, eb, C) blocked rows}."""
    oh_slots = [
        s for s in slots
        if not (band.layout == "ell" and s == band.primary_slot)
    ]
    out = {}
    if band.layout == "ell" and band.primary_slot in slots:
        out[band.primary_slot] = ell_gather(
            values, vb=band.vb, n_vblk=band.n_vblk, deg=band.deg,
            n_verts=band.n_verts,
        )
    if len(oh_slots) == 1:
        out[oh_slots[0]] = banded_gather(
            band.loc[oh_slots[0]], values, **band.meta()
        )
    elif oh_slots:
        loc_stack = jnp.concatenate(
            [band.loc[s] for s in oh_slots], axis=1
        )
        meta = band.meta()
        meta["eb"] = band.eb * len(oh_slots)
        rows = banded_gather(loc_stack, values, **meta)
        for i, s in enumerate(oh_slots):
            out[s] = rows[:, i * band.eb:(i + 1) * band.eb]
    return out


def slot_scatter(band, slot, edges):
    """Sum blocked edge rows (n_vblk, eb, C) onto their `slot` vertices."""
    if band.layout == "ell" and slot == band.primary_slot:
        return ell_scatter(
            edges, vb=band.vb, n_vblk=band.n_vblk, deg=band.deg,
            n_verts=band.n_verts,
        )
    return banded_scatter(band.loc[slot], edges, **band.meta())
