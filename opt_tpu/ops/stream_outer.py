"""Strip-mined (streamed) OUTER-step evaluation for huge grids.

StreamSolverHBM keeps the PCG inner loop's memory bounded (row-tile
windows inside one Pallas kernel), but the nonlinear OUTER step -- cost,
b = -JtF, diag(JtJ), and LM's model cost -- still evaluated the energy
over the whole grid in one XLA program.  At 8192^2 that program's
evaluator temporaries exceed HBM (measured on v5e: 33.4 GB needed vs
15.75 GB -- dozens of whole-grid per-term planes plus remat copies), so
the engine could not reach the sizes its inner loop supports.

This module evaluates the same quantities in STRIPS along array axis 0
(rows of a 2-D grid; D-slabs of a 3-D volume) with a stencil halo,
exactly like the kernel streams the inner loop (and like the
reference's per-kernel launches bound their working set,
solverGPUGaussNewton.t PCGInit1/computeCost):

* windows of (S + 2r) rows are sliced STRAIGHT OFF the unpadded
  arrays with a clamped dynamic-slice start; the two boundary strips
  roll the clamp shift away and mask out-of-grid rows to zero
  (matching shift_read's boundary zero-fill).  No whole-grid padded
  copy is ever made: the earlier zero-pad-then-slice plumbing kept
  nU+nC whole-volume padded DUPLICATES alive (XLA hoists the
  loop-invariant data-image pads out of the outer while loop), which
  is what pushed 384^3 classic past HBM (measured 16.74 of 15.75 GB,
  six hoisted 217 MB pads in the allocation list);
* each window evaluates through a window-shaped ProblemFunctions with
  ``real_shapes`` = the logical grid and traced ``coord_offsets``, so
  InBounds / Index / real-domain tests use GLOBAL coordinates (the same
  construction ops/stream_solver.py uses inside the kernel);
* per-term quantities are masked to the strip's CENTER rows before any
  reduction or adjoint, so every term is counted exactly once; adjoint
  row spill (reach <= radius) stays inside the window and overlapping
  windows accumulate into an unpadded full-grid buffer sequentially.

The result is a drop-in for the ProblemFunctions surface that
solver/core.make_solver touches on the matrix-free + pcg_backend path
(cost / linearize+jtf / diag_jtj / model_cost / masks).  ``linearize``
returns an (x, data) token instead of whole-grid closures -- with a
pcg_backend the solver never applies J itself, and jtf/model_cost
re-derive what they need per strip.

Per-strip float summation order differs from the fused whole-grid
evaluation, so costs match at f32-rounding level (tests pin 1e-5), not
bit-exactly -- same contract as the streamed inner loop.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..compile.plan_fns import ProblemFunctions
from ..dsl import expr as E
from ..dsl.env import EnergyEnv
from ..dsl.spec import ProblemSpec

# Whole-grid outer evaluation measured working on v5e (15.75 GB HBM) at
# 4096^2 and OOMing at 8192^2; route anything strictly larger than
# 4096^2 through the strips.  OPT_TPU_STREAM_CHUNKED_OUTER=1/0 forces.
AUTO_CHUNKED_OUTER_MIN_PIXELS = 4096 * 4096 + 1

# 3-D: MEASURED on v5e (round 3) -- the whole-volume outer step OOMs
# HBM at 192^3 (19.21 GB wanted vs 15.75; 78.5% allocator
# fragmentation around three whole-volume copies of the stacked
# (n_terms, D, H, W) residual field), while 128^3 runs whole-grid
# fine.  Volumes strictly larger than 128^3 strip-mine over D-slabs.
AUTO_CHUNKED_OUTER_MIN_VOXELS = 128 * 128 * 128 + 1

# Strip size target in ELEMENTS per strip (not rows): bounds per-strip
# evaluator temporaries to a fixed budget regardless of rank -- a 2-D
# 8192-wide grid gets 256-row strips (the measured 8192^2 config), a
# 320^3 volume gets 20-plane D-slabs (each slab row is a whole (H, W)
# plane).  Strips stay wide enough that per-strip dispatch is
# negligible against the streamed PCG loop.
STRIP_TARGET_ELEMS = 256 * 8192


def supports_chunked_outer(plan):
    """Gate: pure 2-D/3-D single-index-space grid energies without
    graphs, ComputedArrays, or SampledImages (the only spec features
    whose evaluation is not axis-0-local in the simple windowed
    sense)."""
    spec = plan.spec
    if spec.graphs or spec.computed:
        return False
    keys = {im.ispace.key() for im in spec.images.values()}
    if len(keys) != 1:
        return False
    shape = next(iter(spec.images.values())).ispace.shape
    if len(shape) not in (2, 3):
        return False
    found = [False]

    def on(a):
        if isinstance(a, E.SampledAccess):
            found[0] = True

    for t in list(spec.terms) + list(spec.excludes):
        E.visit(t, on)
    return not found[0]


def chunked_outer_enabled(plan):
    env = os.environ.get("OPT_TPU_STREAM_CHUNKED_OUTER")
    if env == "0":
        return False
    if not supports_chunked_outer(plan):
        return False
    if env == "1":
        return True
    shape = next(iter(plan.spec.images.values())).ispace.shape
    if len(shape) == 3:
        return (shape[0] * shape[1] * shape[2]
                >= AUTO_CHUNKED_OUTER_MIN_VOXELS)
    return shape[0] * shape[1] >= AUTO_CHUNKED_OUTER_MIN_PIXELS


def _pick_strip(H, radius, target_rows):
    """Largest divisor of H <= target_rows (and >= 1); strips must
    also cover the stencil reach so adjoints stay in-window."""
    best = 1
    for s in range(1, min(H, max(target_rows, 1)) + 1):
        if H % s == 0:
            best = s
    return max(best, radius, 1)


class ChunkedOuterFuncs:
    """ProblemFunctions facade evaluating outer-step quantities in
    axis-0 strips (2-D rows / 3-D D-slabs; see module docstring).
    Only valid together with a SolverConfig.pcg_backend (linearize
    returns a token, not closures) and
    config.use_materialized_jacobian=False."""

    def __init__(self, plan, strip=None):
        base = plan.funcs
        assert supports_chunked_outer(plan), "chunked outer: unsupported spec"
        self.base = base
        self.dtype = base.dtype
        self.use_preconditioner = base.use_preconditioner
        self.unknown_shapes = base.unknown_shapes
        self.aliases = base.aliases
        shape = next(iter(plan.spec.images.values())).ispace.shape
        self.H = shape[0]          # strip axis extent (rows / D-slabs)
        self.rest = tuple(shape[1:])

        from .stream_solver import _stencil_radius_axis

        self.r = _stencil_radius_axis(plan.spec, 0)
        rest_elems = 1
        for e in self.rest:
            rest_elems *= e
        S = strip or _pick_strip(
            self.H, self.r, STRIP_TARGET_ELEMS // rest_elems)
        assert self.H % S == 0 and S >= max(self.r, 1), (S, self.H, self.r)
        # Clamped window reads need the window to fit the slice space.
        # At real chunked-outer sizes S + 2r << H and this is 0; tiny
        # grids (tests, forced strips) bottom-pad each plane by the
        # shortfall so the clamp math stays uniform.
        self._bot_pad = max(0, S + 2 * self.r - self.H)
        self.S = S
        self.n_strips = self.H // S

        # window-shaped spec: re-run the energy with the row dim set to
        # the window height (same construction as StreamSolver.__init__)
        dims_ext = list(plan.dims)
        dims_ext[-1] = S + 2 * self.r
        spec_w = ProblemSpec()
        env = EnergyEnv(spec_w, dims_ext)
        from ..runtime.api import _run_energy

        _run_energy(plan.problem.energy, env)
        real_shapes = {
            im.ispace.key(): im.ispace.shape
            for im in plan.spec.images.values()
        }
        self.wfuncs = ProblemFunctions(
            spec_w, base.dtype, real_shapes=real_shapes
        )
        # static center-rows mask over the window's row axis
        rows = S + 2 * self.r
        m = jnp.zeros((rows,), bool).at[self.r : self.r + S].set(True)
        self._center = m

    # -- whole-grid surfaces delegated (cheap / mask-only) ----------------

    def unknown_masks(self, x, data):
        return self.base.unknown_masks(x, data)

    def mask_unknown_tree(self, tree, masks):
        return self.base.mask_unknown_tree(tree, masks)

    # -- strip plumbing ---------------------------------------------------
    #
    # Every full-height array in the strip path is a CHANNEL PLANE
    # (H, W): on v5e, channel-last (H, W, 1) carries through the
    # strided-slice/update loop got assigned layout {2,1,0} (channel
    # minor-most), whose (8,128) tiling pads the degenerate dim 1->128
    # -- a single 8192^2 plane then wants 32 GiB and the compile OOMs.
    # Planes sidestep the trap; windows re-stack channel-last per strip
    # (small: (S+2r, W, C)) for the evaluator.
    #
    # Window reads are CLAMPED slices off the unpadded planes: the
    # wanted rows are [g0-r, g0+S+r); the dynamic-slice start clamps
    # to [0, H-rows], and the residual shift (nonzero only for the
    # first/last strips) is rolled away with out-of-grid rows masked
    # to zero.  Interior strips take the slice verbatim (shift 0, the
    # roll/mask fuse to a copy/no-op); nothing whole-grid is ever
    # duplicated.

    def _planes(self, arr):
        return [arr[..., c] for c in range(arr.shape[-1])]

    def _split(self, x, data):
        xp = {n: self._planes(v) for n, v in x.items()}
        dp = {n: self._planes(v) for n, v in data["images"].items()}
        return xp, dp

    def _win_coords(self, g0):
        rows = self.S + 2 * self.r
        start = g0 - self.r
        s0 = jnp.clip(start, 0, self.H + self._bot_pad - rows)
        return rows, start, s0, start - s0   # shift in [-r, r]

    def _bpad(self, p):
        if not self._bot_pad:
            return p
        return jnp.pad(
            p, ((0, self._bot_pad),) + ((0, 0),) * (p.ndim - 1)
        )

    def _window_plane(self, p, g0):
        """Rows [g0-r, g0+S+r) of the grid, zero-filled outside it."""
        rows, start, s0, shift = self._win_coords(g0)
        w = jax.lax.dynamic_slice_in_dim(self._bpad(p), s0, rows, axis=0)
        w = jnp.roll(w, -shift, axis=0)
        gi = jnp.arange(rows) + start
        valid = (gi >= 0) & (gi < self.H)
        return jnp.where(
            valid.reshape((-1,) + (1,) * (p.ndim - 1)), w, 0
        )

    def _window(self, planes, g0):
        return jnp.stack(
            [self._window_plane(p, g0) for p in planes], axis=-1
        )

    def _windows(self, xp, dp, data, g0):
        xw = {n: self._window(v, g0) for n, v in xp.items()}
        dw = {
            "images": {n: self._window(v, g0) for n, v in dp.items()},
            "params": data["params"],
            "graph_indices": {},
        }
        # global coordinate of the window's local row 0
        self.wfuncs.coord_offsets = (g0 - self.r,) + (0,) * len(self.rest)
        return xw, dw

    def _acc_add(self, plane, g0, upd):
        """plane[grid rows of the window] += upd, on the UNPADDED
        (H, *rest) accumulator plane (sequential strips make the
        overlapping read-modify-write exact).  upd is in window
        coords (row i = grid row g0-r+i); rolling by the clamp shift
        re-aligns it to the clamped slice, and the wrap mask drops
        both the wrapped entries and the adjoint spill into
        out-of-grid rows (reach <= r, so it never passes the clamp)."""
        rows, start, s0, shift = self._win_coords(g0)
        upd = jnp.roll(upd, shift, axis=0)
        src = jnp.arange(rows) - shift
        valid = (src >= 0) & (src < rows)
        upd = jnp.where(
            valid.reshape((-1,) + (1,) * (upd.ndim - 1)), upd, 0
        )
        win = jax.lax.dynamic_slice_in_dim(plane, s0, rows, axis=0)
        return jax.lax.dynamic_update_slice_in_dim(
            plane, win + upd, s0, axis=0
        )   # rows landing in the bottom pad are sliced off at the end

    def _center_zero(self, f):
        """Zero non-center strip rows of a (C, rows, *rest) stacked
        field (axis 1 is the strip axis)."""
        m = self._center.reshape((1, -1) + (1,) * (f.ndim - 2))
        return jnp.where(m, f, 0.0)

    def _foreach_strip(self, body, carry):
        def step(s, c):
            return body(s * self.S, c)

        return jax.lax.fori_loop(0, self.n_strips, step, carry)

    # -- cost -------------------------------------------------------------

    def cost(self, x, data):
        xp, dp = self._split(x, data)
        wf = self.wfuncs

        def body(g0, total):
            xw, dw = self._windows(xp, dp, data, g0)
            fields = wf.residual_fields(xw, dw, masked=True)
            for f in jax.tree_util.tree_leaves(fields):
                fc = self._center_zero(f)
                total = total + 0.5 * jnp.sum(fc * fc)
            return total

        return self._foreach_strip(body, jnp.zeros((), self.dtype))

    # -- linearization token ---------------------------------------------

    def linearize(self, x, data):
        """Token-based: the pcg_backend path only consumes r0/jt through
        jtf() and r0/jvp through model_cost(), both re-derived per strip
        here.  Whole-grid closures would hold exactly the temporaries
        this module exists to avoid."""
        return (x, data), None, None

    def jtf(self, r0_token, jt):
        x, data = r0_token
        xp, dp = self._split(x, data)
        wf = self.wfuncs
        acc = {
            n: [
                jnp.zeros(
                    (self.H + self._bot_pad,) + self.rest, self.dtype
                )
                for _ in range(s[-1])
            ]
            for n, s in self.unknown_shapes.items()
        }

        def body(g0, acc):
            xw, dw = self._windows(xp, dp, data, g0)
            fn = lambda xx: wf.residuals_solve(xx, dw)
            r0w, jvp_fn = jax.linearize(fn, xw)
            r0c = jax.tree_util.tree_map(self._center_zero, r0w)
            jt_fn = jax.linear_transpose(jvp_fn, xw)
            (g,) = jt_fn(r0c)
            return {
                n: [
                    self._acc_add(plane, g0, g[n][..., c])
                    for c, plane in enumerate(chans)
                ]
                for n, chans in acc.items()
            }

        acc = self._foreach_strip(body, acc)
        return {
            n: jnp.stack([p[: self.H] for p in chans], axis=-1)
            for n, chans in acc.items()
        }

    # -- diag(JtJ) --------------------------------------------------------

    def diag_jtj(self, x, data):
        xp, dp = self._split(x, data)
        wf = self.wfuncs
        r = self.r
        acc = {
            n: [
                jnp.zeros(
                    (self.H + self._bot_pad,) + s[1:-1], self.dtype
                )
                for _ in range(s[-1])
            ]
            for n, s in self.unknown_shapes.items()
        }

        def body(g0, acc):
            xw, dw = self._windows(xp, dp, data, g0)
            rows = self.S + 2 * r
            upd = {
                n: [jnp.zeros((rows,) + self.rest, self.dtype)
                    for _ in chans]
                for n, chans in acc.items()
            }
            for g, leaves, D in wf.leaf_partials(xw, dw):
                for a, d in zip(leaves, D):
                    assert isinstance(a.index, E.Offset), (
                        "chunked outer covers grid leaves only"
                    )
                    d2 = jnp.sum(d * d, axis=0)
                    m = self._center.reshape((-1,) + (1,) * (d2.ndim - 1))
                    d2 = jnp.where(m, d2, 0.0)
                    contrib = wf._scatter(d2, a.index.data)
                    upd[a.image.name][a.channel] = (
                        upd[a.image.name][a.channel] + contrib
                    )
            return {
                n: [
                    self._acc_add(plane, g0, upd[n][c])
                    for c, plane in enumerate(chans)
                ]
                for n, chans in acc.items()
            }

        acc = self._foreach_strip(body, acc)
        return {
            n: jnp.stack([p[: self.H] for p in chans], axis=-1)
            for n, chans in acc.items()
        }

    # -- LM model cost ----------------------------------------------------

    def model_cost(self, r0_token, jvp_fn, delta, x, data):
        xp, dp = self._split(x, data)
        deltap = {n: self._planes(v) for n, v in delta.items()}
        wf = self.wfuncs

        def body(g0, total):
            xw, dw = self._windows(xp, dp, data, g0)
            dxw = {n: self._window(v, g0) for n, v in deltap.items()}
            fn = lambda xx: wf.residuals_solve(xx, dw)
            r0w, jvp_w = jax.linearize(fn, xw)
            jd = jvp_w(dxw)
            for g, f0, fd in zip(wf.groups, r0w, jd):
                f = jax.tree_util.tree_map(jnp.add, f0, fd)
                m = wf.exclude_mask(g.ispace.key(), xw, dw)
                if m is not None:
                    f = jax.tree_util.tree_map(
                        lambda v: jnp.where(m[None], 0.0, v), f
                    )
                for leaf in jax.tree_util.tree_leaves(f):
                    lc = self._center_zero(leaf)
                    total = total + 0.5 * jnp.sum(lc * lc)
            return total

        return self._foreach_strip(body, jnp.zeros((), self.dtype))
