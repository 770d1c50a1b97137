"""Whole-PCG-in-VMEM kernel for banded graph problems.

The XLA banded path (ops/graph_banded.py) runs the graph PCG loop as
~19 fusions per iteration; at arap-10k scale that measures 144 us per
iteration against a ~60 us work floor (one-hot generation is the only
real cost).  A full whole-solve Pallas port is blocked on autodiff
plumbing (`linear_call` has no Mosaic lowering, and linearize-through-
scan would materialize the one-hots), so this kernel sidesteps autodiff
entirely: the solver's pcg_backend hook (solver/core.py) provides the
hat-space system once per outer iteration, the backend materializes the
per-leaf partial fields D_a = dr/da with the EXISTING leaf_partials
machinery (the "materialized Jacobian" form, sparse/materialize.py),
and the kernel then runs the complete PCG loop with every vector
VMEM-resident, applying

    J p   = sum_a D_a * gather_{slot(a)}(p)[chan(a)]
    J^T v = sum_a scatter_{slot(a)}(D_a * v)

with gathers/scatters as explicit f32 one-hot matmuls per vertex block
(bit-exact: each one-hot row selects one value; f32 dots need no
split-bf16 trick, and writing both directions by hand needs no
transpose rule).  One lax.fori over edge blocks performs the whole
apply; there is no HBM traffic between iterations and no per-iteration
dispatch.

Like the reference's materialized-JTJ mode this trades recomputation of
the energy's nonlinearities for stored weights (reference:
solverGPUGaussNewton.t:1532-1757).  Supports GN and LM (in-kernel
Q/zeta exit + periodic exact residual recomputation, trust region in
solver/core via pcg_backend); eligible for f32 banded graph problems
whose state + partial fields fit VMEM (~10k-vertex class; needs the
raised Mosaic scoped-vmem limit).

MEASURED RESULT (v5e, arap 10k 8x100): 2809 ms vs the XLA banded
path's 135.8 ms -- ~20x SLOWER.  Mosaic schedules the handwritten
fori-over-blocks apply far worse than XLA pipelines its fused
iota-compare one-hot dots, the same pattern as every previous
in-kernel-compute experiment here (ops/pcg_pallas.py 88x,
ops/onehot_pallas.py 3x, the VMEM-state stream engine at small
grids).  Where Pallas DOES win on this toolchain is DMA orchestration
(ops/stream_solver.StreamSolverHBM at 4096^2 grids).  Kept correct and
tested as the measured record of the no-autodiff in-kernel design;
opt-in via the GraphPcgKernel class only, never auto-selected.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dsl import expr as E
from ..solver.core import SolverConfig, make_solver

VMEM_BUDGET_BYTES = 48 * 1024 * 1024


def _plan_meta(plan):
    """Static structure of the apply, or None if unsupported.

    Returns dict with:
      unk: [(name, channel)] -> flat unknown-channel index
      graph_groups: per graph term group:
        gname, n_eblk, eb, slots (ordered slot names),
        leaves: [(slot_idx, unk_flat_idx)]  (one per leaf access)
        n_res: residual channels
      fit_groups: per centered group: leaves [(unk_flat_idx)], n_res
    """
    funcs = plan.funcs
    spec = plan.spec
    if funcs.dtype != jnp.float32:
        return None
    if not spec.graphs:
        return None
    keys = {im.ispace.key() for im in spec.images.values()
            if im.ispace.ndims == 1}
    # single shared 1-D vertex space for every image
    allkeys = {im.ispace.key() for im in spec.images.values()}
    if len(allkeys) != 1 or len(keys) != 1:
        return None
    if funcs.excludes:
        return None
    unk = []
    for n in sorted(funcs.unknown_shapes):
        for c in range(funcs.unknown_shapes[n][-1]):
            unk.append((n, c))
    uidx = {nc: i for i, nc in enumerate(unk)}
    graph_groups, fit_groups = [], []
    for g in funcs.groups:
        leaves = g.unknown_leaves
        if not leaves:
            continue
        if g.kind == "graph":
            slots = list(g.graph.slots)
            sidx = {s: i for i, s in enumerate(slots)}
            ls = []
            for a in leaves:
                if not hasattr(a.index, "slot"):
                    return None
                ls.append((sidx[a.index.slot],
                           uidx[(a.image.name, a.channel)]))
            graph_groups.append(dict(
                gname=g.graph.name, slots=slots, leaves=ls,
                n_res=len(g.exprs),
            ))
        else:
            ls = []
            for a in leaves:
                if not isinstance(a.index, E.Offset) or any(
                    int(o) != 0 for o in a.index.data
                ):
                    return None  # only pointwise vertex terms
                ls.append(uidx[(a.image.name, a.channel)])
            fit_groups.append(dict(leaves=ls, n_res=len(g.exprs)))
    if not graph_groups:
        return None
    return dict(unk=unk, graph_groups=graph_groups,
                fit_groups=fit_groups)


def supports(plan):
    """Eligible: f32 banded graph problem (ell/balanced layouts), all
    centered terms pointwise on the vertex space, VMEM estimate OK."""
    meta = _plan_meta(plan)
    if meta is None:
        return False
    banding = getattr(plan, "_active_banding", None)
    if not banding:
        return False
    (vb,) = banding.values()
    vbs = set()
    for gg in meta["graph_groups"]:
        gp = vb.graphs.get(gg["gname"])
        if gp is None or gp.layout == "tiled":
            return False
        vbs.add(gp.vb)
    if len(vbs) != 1:
        return False
    return _estimate_vmem(plan, meta, vb) <= VMEM_BUDGET_BYTES


def _common_vb(meta, vb):
    return vb.graphs[meta["graph_groups"][0]["gname"]].vb


def _estimate_vmem(plan, meta, vb):
    n_unk = len(meta["unk"])
    VB = _common_vb(meta, vb)
    npad = (-(-vb.n_verts // VB) + 2) * VB  # +2 window pad blocks
    state = 8 * n_unk * npad * 4  # p r delta ap ps sq scs b
    d_bytes = 0
    for gg in meta["graph_groups"]:
        gp = vb.graphs[gg["gname"]]
        d_bytes += (len(gg["leaves"]) * gg["n_res"] + 2 * len(gg["slots"])
                    ) * gp.n_eblk * gp.eb * 4
        # one-hot scratch per block
        d_bytes += gp.eb * 3 * gp.vb * 4
    for fg in meta["fit_groups"]:
        d_bytes += len(fg["leaves"]) * fg["n_res"] * npad * 4
    return state + d_bytes


class GraphPcgKernel:
    """pcg_backend running the whole banded-graph PCG loop in one
    VMEM-resident Pallas kernel."""

    def __init__(self, plan):
        assert supports(plan), "plan not eligible for the graph kernel"
        self.plan = plan
        self.meta = _plan_meta(plan)
        (self.vb,) = plan._active_banding.values()
        self.n_unk = len(self.meta["unk"])
        self.lm = plan.config.uses_lambda
        self._kern = {}

    # -- backend ------------------------------------------------------------

    def as_pcg_backend(self, interpret=None):
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        plan = self.plan
        funcs = plan.funcs
        meta = self.meta
        vb = self.vb
        VB = _common_vb(meta, vb)
        n_vblk = -(-vb.n_verts // VB)
        npad = (n_vblk + 2) * VB  # one window-pad block each side
        n_unk = self.n_unk
        lm = self.lm

        def to_planes(tree):
            """unknown dict (N, C) -> (n_unk, npad) stacked rows, with
            the window pad block on each side."""
            rows = []
            for n, c in meta["unk"]:
                v = tree[n][..., c]
                rows.append(jnp.pad(v, (VB, npad - VB - v.shape[0])))
            return jnp.stack(rows)

        def backend(x, data, sq, scs, b_hat, sp):
            # per-outer: leaf partial fields (blocked edge layout for
            # graph groups, (C_res, N) for pointwise vertex groups)
            Dg, Df, locs = [], [], []
            git = iter(meta["graph_groups"])
            fit = iter(meta["fit_groups"])
            for g, leaves, D in funcs.leaf_partials(x, data):
                if g.kind == "graph":
                    gg = next(git)
                    band = data["graph_banding"][gg["gname"]]
                    # (n_leaves*C_res, n_eblk, eb)
                    Dg.append(jnp.concatenate([d for d in D], axis=0))
                    locs.append(jnp.stack(
                        [band.loc[s] for s in gg["slots"]]))
                else:
                    fg = next(fit)
                    # (n_leaves*C_res, N) -> padded rows
                    planes = jnp.concatenate([d for d in D], axis=0)
                    Df.append(jnp.pad(
                        planes,
                        ((0, 0), (VB, npad - VB - planes.shape[1]))))
            args = [
                to_planes(sq),
                to_planes(scs) if lm else None,
                to_planes(b_hat),
            ]
            args = [a for a in args if a is not None]
            ctl_i = jnp.stack([
                jnp.asarray(sp["lIterations"], jnp.int32),
                jnp.asarray(sp["residual_reset_period"], jnp.int32),
            ]).reshape(2, 1)
            ctl_f = jnp.asarray(
                sp["q_tolerance"], jnp.float32).reshape(1, 1)
            kern = self._build(interpret)
            d_rows = kern(*args, *Dg, *locs, *Df, ctl_i, ctl_f)
            out = {}
            for i, (n, c) in enumerate(meta["unk"]):
                nverts = funcs.unknown_shapes[n][0]
                col = d_rows[i, VB : VB + nverts]
                out.setdefault(n, []).append(col)
            return {
                n: jnp.stack(cols, axis=-1) for n, cols in out.items()
            }

        return backend

    # -- kernel -------------------------------------------------------------

    def _build(self, interpret):
        if interpret in self._kern:
            return self._kern[interpret]
        meta = self.meta
        vb = self.vb
        VB = _common_vb(meta, vb)
        n_vblk = -(-vb.n_verts // VB)
        npad = (n_vblk + 2) * VB
        n_unk = self.n_unk
        lm = self.lm
        ggs = meta["graph_groups"]
        fgs = meta["fit_groups"]
        n_gg = len(ggs)
        n_fg = len(fgs)

        def kernel(*refs):
            i = 0
            sqr = refs[i]; i += 1
            scsr = None
            if lm:
                scsr = refs[i]; i += 1
            br = refs[i]; i += 1
            Dg = [refs[i + k] for k in range(n_gg)]; i += n_gg
            locs = [refs[i + k] for k in range(n_gg)]; i += n_gg
            Df = [refs[i + k] for k in range(n_fg)]; i += n_fg
            ctl_i = refs[i]; i += 1
            ctl_f = refs[i]; i += 1
            d_out = refs[i]; i += 1
            # scratch
            p_s = refs[i]; i += 1
            r_s = refs[i]; i += 1
            ap_s = refs[i]; i += 1
            ps_s = refs[i]; i += 1
            L = ctl_i[0, 0]
            period = ctl_i[1, 0]
            q_tol = ctl_f[0, 0]

            sq = sqr[...]
            b = br[...]
            scs = scsr[...] if lm else None

            def apply_A(p_ref, out_ref):
                """out = S (JtJ [+ CtC]) S p, reading p from p_ref."""
                pv = p_ref[...]
                ps = sq * pv  # (n_unk, npad)
                ps_s[...] = ps
                rows = [jnp.zeros((npad,), jnp.float32)
                        for _ in range(n_unk)]
                # pointwise vertex terms
                for fg, D in zip(fgs, Df):
                    Dv = D[...]
                    for cr in range(fg["n_res"]):
                        t = jnp.zeros((npad,), jnp.float32)
                        for li, ui in enumerate(fg["leaves"]):
                            t = t + Dv[li * fg["n_res"] + cr] * ps[ui]
                        for li, ui in enumerate(fg["leaves"]):
                            rows[ui] = rows[ui] + (
                                Dv[li * fg["n_res"] + cr] * t)
                out_ref[...] = jnp.stack(rows)
                # graph terms: one fori over edge blocks per group
                for gg, D, loc in zip(ggs, Dg, locs):
                    gp = vb.graphs[gg["gname"]]
                    eb, n_eblk = gp.eb, gp.n_eblk
                    n_res = gg["n_res"]
                    slots = gg["slots"]
                    n_slots = len(slots)
                    # channels gathered per slot (dedup)
                    slot_chans = [sorted({ui for si, ui in gg["leaves"]
                                          if si == s})
                                  for s in range(n_slots)]
                    # NOTE: the ELL primary slot COULD gather by pure
                    # broadcast / scatter by row-sum, but the required
                    # (VB, deg) <-> (eb,) flattens are lane-affecting
                    # reshapes Mosaic cannot lower ("unsupported shape
                    # cast"); both slots use one-hot dots instead
                    ell_slot = -1
                    deg = gp.deg

                    def blk(bi, _):
                        base = bi * VB  # window start in padded rows
                        iota = jax.lax.broadcasted_iota(
                            jnp.int32, (eb, 3 * VB), 1)
                        # one-hots for every non-primary slot; the ELL
                        # primary is a pure broadcast/row-sum pair
                        ohs = {
                            s: (loc[s, bi][:, None] == iota).astype(
                                jnp.float32)
                            for s in range(n_slots) if s != ell_slot
                        }
                        # gather: window rows x channels, one dot/slot
                        gat = {}
                        for s in range(n_slots):
                            chs = slot_chans[s]
                            if not chs:
                                continue
                            if s == ell_slot:
                                for ui in chs:
                                    ctr = ps_s[ui, pl.ds(base + VB, VB)]
                                    gat[(s, ui)] = jnp.broadcast_to(
                                        ctr[:, None], (VB, deg)
                                    ).reshape(eb)
                                continue
                            win = jnp.stack(
                                [ps_s[ui, pl.ds(base, 3 * VB)]
                                 for ui in chs], axis=-1)
                            rows = jax.lax.dot_general(
                                ohs[s], win, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                            for j, ui in enumerate(chs):
                                gat[(s, ui)] = rows[:, j]
                        Db = D[:, bi]  # (n_leaves*n_res, eb)
                        # tangent then cotangent per residual channel
                        cot = {}
                        for cr in range(n_res):
                            t = jnp.zeros((eb,), jnp.float32)
                            for li, (si, ui) in enumerate(gg["leaves"]):
                                t = t + Db[li * n_res + cr] * gat[
                                    (si, ui)]
                            for li, (si, ui) in enumerate(gg["leaves"]):
                                key = (si, ui)
                                c = Db[li * n_res + cr] * t
                                cot[key] = (
                                    c if key not in cot else cot[key] + c
                                )
                        # scatter: transposed dot per one-hot slot;
                        # ELL primary scatters as a per-vertex row sum
                        # (pad rows carry zero partials)
                        for s in range(n_slots):
                            chs = [ui for ui in slot_chans[s]
                                   if (s, ui) in cot]
                            if not chs:
                                continue
                            if s == ell_slot:
                                for ui in chs:
                                    rs = cot[(s, ui)].reshape(
                                        VB, deg).sum(axis=1)
                                    sl = pl.ds(base + VB, VB)
                                    out_ref[ui, sl] = (
                                        out_ref[ui, sl] + rs)
                                continue
                            f = jnp.stack(
                                [cot[(s, ui)] for ui in chs], axis=-1)
                            wout = jax.lax.dot_general(
                                ohs[s], f, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                            for j, ui in enumerate(chs):
                                cur = out_ref[ui, pl.ds(base, 3 * VB)]
                                out_ref[ui, pl.ds(base, 3 * VB)] = (
                                    cur + wout[:, j])
                        return 0

                    jax.lax.fori_loop(0, n_eblk, blk, 0)
                out = sq * out_ref[...]
                if lm:
                    out = out + scs * pv
                out_ref[...] = out

            # ---- init ------------------------------------------------
            r_s[...] = b
            p_s[...] = b
            d_out[...] = jnp.zeros((n_unk, npad), jnp.float32)
            an0 = jnp.sum(b * b)

            def body(carry):
                it, an, Q0, brk = carry
                apply_A(p_s, ap_s)
                pv, apv = p_s[...], ap_s[...]
                pap = jnp.sum(pv * apv)
                alpha = jnp.where(pap != 0.0, an / jnp.where(
                    pap != 0.0, pap, 1.0), 0.0)
                dv = d_out[...] + alpha * pv
                d_out[...] = dv
                rv = r_s[...] - alpha * apv

                if lm:
                    def reset(_):
                        apply_A(d_out, ap_s)
                        return b - ap_s[...]

                    rv = jax.lax.cond(
                        ((it + 1) % period) == 0, reset,
                        lambda _: rv, None)
                r_s[...] = rv
                bn = jnp.sum(rv * rv)
                if lm:
                    Q1 = 0.5 * jnp.sum(dv * (rv + b))
                    zeta = (it + 1).astype(jnp.float32) * jnp.where(
                        Q1 != 0.0, (Q1 - Q0) / jnp.where(
                            Q1 != 0.0, Q1, 1.0), 0.0)
                    brk = zeta < q_tol
                    Q0 = Q1
                beta = jnp.where(an != 0.0, bn / jnp.where(
                    an != 0.0, an, 1.0), 0.0)
                p_s[...] = rv + beta * p_s[...]
                return it + 1, bn, Q0, brk

            jax.lax.while_loop(
                lambda c: (c[0] < L) & (~c[3]), body,
                (jnp.int32(0), an0, jnp.float32(0.0),
                 jnp.asarray(False)),
            )

        vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
        n_in = (2 if not lm else 3) + 2 * n_gg + n_fg
        scratch = [pltpu.VMEM((n_unk, npad), jnp.float32)] * 4
        kern = pl.pallas_call(
            kernel,
            in_specs=[vspec] * n_in + [sspec, sspec],
            out_specs=vspec,
            out_shape=jax.ShapeDtypeStruct((n_unk, npad), jnp.float32),
            scratch_shapes=scratch,
            # Mosaic's default scoped-vmem limit is 16 MB; the physical
            # budget is far larger and the D fields legitimately need
            # more (measured: arap-10k missed the default by 396 KB)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )
        self._kern[interpret] = kern
        return kern

    # -- harness-compatible whole solve -------------------------------------

    def solve(self, inputs, interpret=None):
        plan = self.plan
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        key = ("solve", interpret)
        if key not in self._kern:
            base = plan.config
            cfg = SolverConfig(
                uses_lambda=base.uses_lambda,
                guarded_invert_type=base.guarded_invert_type,
                jacobi_scaling=base.jacobi_scaling,
                pcg_variant="classic",
                pcg_backend=self.as_pcg_backend(interpret),
            )
            fns = make_solver(plan.funcs, cfg)
            self._kern[key] = jax.jit(fns[4])
        full = self._kern[key]
        x, data = plan.bind(inputs)
        sp = plan._sp_device()
        sp["nIterations"] = jnp.asarray(
            int(plan.solver_params["nIterations"]), jnp.int32)
        st = full(x, data, sp)
        return {"x": st["x"], "final_cost": float(st["prev_cost"])}
