"""Multi-chip streamed PCG: per-shard Pallas apply under shard_map.

The single-chip streamed engine (ops/stream_solver.StreamSolverHBM) runs
the WHOLE linear solve inside one Pallas kernel, which cannot reach
other chips (no collectives mid-kernel on this toolchain).  This module
shards the >VMEM regime the way the reference's multi-device launcher
shards its per-kernel solver (reference: API/src/backend_cpu_mt.t:698-944
-- each thread owns a contiguous row block, kernels launch per block,
reductions merge across threads):

* each device owns a contiguous row SLAB of the grid (1-D mesh);
* the inner-PCG A-apply is ONE Pallas kernel launch per device per
  iteration: a streamed row-tile sweep over the locally materialized
  (slab + 2*halo) window -- the same tile/window/evaluator machinery as
  StreamSolverHBM's sweep 1, with global coordinates entering through an
  SMEM row-offset scalar;
* the p-halo rows move by `lax.ppermute` before each apply and the PCG
  scalars reduce with `lax.psum` (the reference's shadow-buffer exchange
  + ReduceVar roles);
* every outer-iteration decision stays in solver/core (the backend is a
  SolverConfig.pcg_backend), with psum_axis making the outer cost /
  JtF reductions global.

Correctness structure (same redundant-compute choice as parallel/halo.py
and the reference's boundary rows): the apply evaluates residuals over
the whole extended slab and CROPS the center rows, so every surviving
JtJp contribution only reads exchanged (valid) data; residuals whose
support leaks past the extended slab contribute only to cropped rows.

LM runs on the same per-shard apply: the hat-space CtC diagonal
(scs = S^2*ctc, a purely local elementwise term) is added OUTSIDE the
kernel, and the shard-level loop is the reference's classic PCG with
the Q/zeta early exit and the periodic exact residual replacement
(solverGPUGaussNewton.t:713-719, :738-813, :2211-2220), all scalars
psum'd -- the same structure ops/stream_solver.py runs in-kernel
single-chip.  The reference runs its full GN+LM matrix on every
backend (examples/test_final_cost.py:84-95); so does this one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compile.plan_fns import ProblemFunctions
from ..dsl import expr as E
from ..dsl.env import EnergyEnv
from ..dsl.spec import ProblemSpec
from ..ops.stream_solver import (
    LANE,
    SUBLANE,
    _roundup,
    _stencil_radius_axis0,
)
from ..solver.core import tmap


def supports(plan, mesh):
    """Eligibility: 1-D mesh, GN or LM, one 2-D f32 grid ispace, no
    SampledImage, lane-aligned width, slab rows sublane-aligned and
    >= the halo."""
    if mesh.devices.ndim != 1:
        return False  # row slabs shard over ONE mesh axis
    if plan.spec.graphs:
        return False
    if plan.funcs.dtype != jnp.float32:
        return False
    keys = {im.ispace.key() for im in plan.spec.images.values()}
    if len(keys) != 1:
        return False
    for g in plan.funcs.groups:
        if g.kind != "centered" or g.ispace.ndims != 2:
            return False
    has_sampled = [False]

    def _chk(a):
        if isinstance(a, E.SampledAccess):
            has_sampled[0] = True

    for exp in plan.spec.terms:
        E.visit(exp, _chk)
    if has_sampled[0]:
        return False
    H, W = next(iter(plan.spec.images.values())).ispace.shape
    n_dev = mesh.devices.size
    if W % LANE or H % n_dev:
        return False
    n_local = H // n_dev
    r = _stencil_radius_axis0(plan.spec)
    he = _roundup(max(2 * r, 1), SUBLANE)
    return n_local % SUBLANE == 0 and n_local >= he


class ShardedStreamEngine:
    """Per-shard streamed apply + shard_map-level hat-space PCG."""

    def __init__(self, plan, mesh, tile=None):
        assert supports(plan, mesh), (
            "plan/mesh not eligible for the sharded stream engine"
        )
        self.plan = plan
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.n_dev = int(mesh.devices.size)
        funcs = plan.funcs
        H, W = next(iter(plan.spec.images.values())).ispace.shape
        self.H, self.W = H, W
        self.n_local = H // self.n_dev
        r = _stencil_radius_axis0(plan.spec)
        # slab exchange halo (>= 2*radius, sublane-aligned) and window
        # DMA halo -- both cover J^T(J p)'s 2r reach
        self.he = _roundup(max(2 * r, 1), SUBLANE)
        self.h = self.he
        self.H_s = self.n_local + 2 * self.he      # extended slab rows
        cap = tile or 32
        T = None
        t = min(cap, self.H_s)
        while t >= SUBLANE:
            if self.H_s % t == 0 and t >= self.h:
                T = t
                break
            t -= SUBLANE
        assert T is not None, "no feasible tile for the extended slab"
        self.tile = T
        self.n_tiles = self.H_s // T

        # tile-window ProblemFunctions: window rows = T + 2h, with
        # GLOBAL real shapes so bounds/Index tests use global coords
        dims_ext = list(plan.dims)
        dims_ext[-1] = T + 2 * self.h
        spec_t = ProblemSpec()
        env = EnergyEnv(spec_t, dims_ext)
        from ..runtime.api import _run_energy

        _run_energy(plan.problem.energy, env)
        real_shapes = {
            im.ispace.key(): im.ispace.shape
            for im in plan.spec.images.values()
        }
        self.tfuncs = ProblemFunctions(
            spec_t, funcs.dtype, real_shapes=real_shapes, kernel_safe=True
        )
        self.unknown_names = sorted(funcs.unknown_shapes)
        self.const_names = sorted(
            n for n, im in plan.spec.images.items()
            if not im.is_unknown and n not in funcs.aliases
        )
        self.param_names = sorted(plan.spec.params)
        self.chans = {
            n: plan.spec.images[n].channels
            for n in self.unknown_names + self.const_names
        }

    # -- the per-shard apply kernel ----------------------------------------

    def build_apply_kernel(self, interpret):
        """pallas_call computing A_hat p = S J^T J S p over the extended
        slab: ins (nIn, H_s+2h, W) = [x | consts | sqp], p (nU, H_s+2h, W)
        (both h-padded), row0 the slab's global row offset (SMEM), out
        (nU, H_s, W).  One serial streamed tile sweep -- the multi-chip
        dryrun runs in interpret mode; real multi-chip perf would add
        the double-buffering of StreamSolverHBM.apply_sweep."""
        T, h, W = self.tile, self.h, self.W
        un, cn, pn = self.unknown_names, self.const_names, self.param_names
        chans = self.chans
        tf = self.tfuncs
        n_tiles = self.n_tiles
        nU = sum(chans[n] for n in un)
        nC = sum(chans[n] for n in cn)
        nIn = 2 * nU + nC
        WIN = T + 2 * h
        H_s = self.H_s

        def kernel(ins_any, p_any, pref, rref, out_any, insw, pw, sem):
            params = {name: pref[k, 0] for k, name in enumerate(pn)}
            row0 = rref[0, 0]

            def tile_body(t, _):
                t0 = t * T
                cps = [
                    pltpu.make_async_copy(
                        ins_any.at[:, pl.ds(t0, WIN)], insw, sem),
                    pltpu.make_async_copy(
                        p_any.at[:, pl.ds(t0, WIN)], pw, sem),
                ]
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()
                j = 0
                x_win = {}
                for n in un:
                    x_win[n] = [insw[j + c] for c in range(chans[n])]
                    j += chans[n]
                imgs = {}
                for n in cn:
                    imgs[n] = [insw[j + c] for c in range(chans[n])]
                    j += chans[n]
                sq_win = [insw[j + k] for k in range(nU)]
                data_win = {"images": imgs, "params": params,
                            "graph_indices": {}}
                pv = [pw[k] for k in range(nU)]
                k = 0
                p_sc = {}
                for n in un:
                    pwn = []
                    for c in range(chans[n]):
                        pwn.append(sq_win[k] * pv[k])
                        k += 1
                    p_sc[n] = pwn
                tf.coord_offsets = (row0 + t0 - h, 0)
                fn = lambda xx: tf.residuals_solve(xx, data_win)
                _, jvp_fn = jax.linearize(fn, x_win)
                jt_fn = jax.linear_transpose(jvp_fn, x_win)
                (grad,) = jt_fn(jvp_fn(p_sc))
                aps = []
                k = 0
                for n in un:
                    for c in range(chans[n]):
                        aps.append(sq_win[k][h:h + T]
                                   * grad[n][c][h:h + T])
                        k += 1
                pw[:, pl.ds(0, T)] = jnp.stack(aps)
                cp = pltpu.make_async_copy(
                    pw.at[:, pl.ds(0, T)],
                    out_any.at[:, pl.ds(t0, T)], sem)
                cp.start(); cp.wait()
                return 0

            jax.lax.fori_loop(0, n_tiles, tile_body, 0)

        any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
        scratch = [
            pltpu.VMEM((nIn, WIN, W), jnp.float32),
            pltpu.VMEM((nU, WIN, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]
        return pl.pallas_call(
            kernel,
            in_specs=[any_spec, any_spec, sspec, sspec],
            out_specs=any_spec,
            out_shape=jax.ShapeDtypeStruct((nU, H_s, W), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )

    # -- the shard_map-level backend ---------------------------------------

    def as_pcg_backend(self, interpret=None, variant="pipelined"):
        """SolverConfig.pcg_backend running INSIDE shard_map: hat-space
        PCG whose A-apply is the per-shard kernel, scalars psum'd over
        the mesh axis, halos ppermuted per apply.

        variant='pipelined' (default, Ghysels & Vanroose as in
        solver/core.pcg_pipelined with M=I): both reductions use only
        the previous iteration's vectors, so on real multi-chip
        hardware the psum latency overlaps the halo-exchanged apply --
        the variant's original purpose.  'classic' keeps the two-barrier
        loop for comparison."""
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        kern = self.build_apply_kernel(interpret)
        un, cn, pn = self.unknown_names, self.const_names, self.param_names
        chans = self.chans
        he, h, n_local = self.he, self.h, self.n_local
        nU = sum(chans[n] for n in un)
        ax = self.axis
        n_dev = self.n_dev

        def ext(a):
            """(n_local, W) local plane -> (H_s, W) with neighbor rows
            (edge devices zero-fill, matching global zero-pad)."""
            up = jax.lax.ppermute(
                a[-he:], ax, perm=[(i, i + 1) for i in range(n_dev - 1)]
            )
            dn = jax.lax.ppermute(
                a[:he], ax, perm=[(i + 1, i) for i in range(n_dev - 1)]
            )
            return jnp.concatenate([up, a, dn], axis=0)

        def pad(a):
            return jnp.pad(a, ((h, h), (0, 0)))

        def planes(arr):
            return [arr[..., c] for c in range(arr.shape[-1])]

        def psum(v):
            return jax.lax.psum(v, ax)

        def backend(x, data, sq, scs, b_hat, sp):
            L = jnp.asarray(sp["lIterations"], jnp.int32)
            stack = []
            for n in un:
                stack += [pad(ext(p)) for p in planes(x[n])]
            for n in cn:
                stack += [pad(ext(p)) for p in planes(data["images"][n])]
            for n in un:
                stack += [pad(ext(p)) for p in planes(sq[n])]
            ins = jnp.stack(stack)
            pvals = jnp.stack(
                [jnp.asarray(data["params"][n], jnp.float32)
                 for n in pn]
            ).reshape(-1, 1) if pn else jnp.zeros((1, 1), jnp.float32)
            row0 = (
                jax.lax.axis_index(ax).astype(jnp.int32) * n_local - he
            ).reshape(1, 1)

            def A(p):
                pe = jnp.stack(
                    [pad(ext(pp)) for n in un for pp in planes(p[n])]
                )
                ap = kern(ins, pe, pvals, row0)[:, he:he + n_local]
                out, k = {}, 0
                for n in un:
                    c = chans[n]
                    out[n] = jnp.stack(
                        [ap[k + j] for j in range(c)], axis=-1)
                    k += c
                if scs is not None:
                    # hat-space LM diagonal: + S^2*ctc (x) p -- purely
                    # local, so it stays outside the kernel
                    out = tmap(
                        lambda o, c_, pp: o + c_ * pp, out, scs, p)
                return out

            lm = None
            if scs is not None:
                lm = {
                    "period": jnp.asarray(
                        sp["residual_reset_period"], jnp.int32),
                    "q_tol": jnp.asarray(
                        sp["q_tolerance"], jnp.float32),
                }
            return _shard_pcg(variant, A, psum, b_hat, L, lm)

        return backend


def _tdot(a, b):
    return sum(
        jnp.sum(x * y) for x, y in zip(
            jax.tree_util.tree_leaves(a),
            jax.tree_util.tree_leaves(b))
    )


def _shard_pcg(variant, A, psum, b_hat, L, lm=None):
    """The shard-level hat-space PCG loops shared by the 2-D and 3-D
    engines: variant='pipelined' (Ghysels & Vanroose with M=I -- both
    psums read only the previous iteration's vectors, so on real
    multi-chip hardware their latency overlaps the halo-exchanged
    apply) or 'classic' (two barriers) for comparison.

    lm (dict period/q_tol, or None) switches to the LM loop -- always
    classic, like the single-chip engines: the Q/zeta early exit
    (q = 0.5 delta.(r+b), zeta = (i+1)(Q1-Q0)/Q1 < q_tol,
    solverGPUGaussNewton.t:713-719, :2211-2220) and the exact residual
    replacement r = b - A delta every `period` iterations (:738-813),
    with all dots psum'd so every device takes the same branch."""

    def sdiv(a, b):
        return jnp.where(
            b != 0.0, a / jnp.where(b != 0.0, b, 1.0), 0.0)

    if lm is not None:
        return _shard_pcg_lm(A, psum, b_hat, L, lm["period"],
                             lm["q_tol"], sdiv)

    r0 = b_hat
    if variant == "pipelined":
        # M = I collapses u=r, q=s, m=w of core.pcg_pipelined
        w0 = A(r0)
        zl = tmap(jnp.zeros_like, r0)
        carry0 = {
            "delta": zl, "r": r0, "w": w0,
            "z": zl, "s": zl, "p": zl,
            "gamma": jnp.float32(0.0),
            "alpha": jnp.float32(1.0),
            "i": jnp.asarray(0, jnp.int32),
        }

        def body(c):
            i = c["i"]
            # both reductions read only last iteration's r/w:
            # their psums overlap the apply below on a real mesh
            gamma = psum(_tdot(c["r"], c["r"]))
            dd = psum(_tdot(c["w"], c["r"]))
            n = A(c["w"])
            first = i == 0
            beta = jnp.where(first, 0.0, sdiv(gamma, c["gamma"]))
            denom = dd - beta * sdiv(gamma, c["alpha"])
            alpha = jnp.where(
                first, sdiv(gamma, dd), sdiv(gamma, denom))
            z = tmap(lambda nn, zz: nn + beta * zz, n, c["z"])
            s = tmap(lambda ww, ss: ww + beta * ss,
                     c["w"], c["s"])
            p = tmap(lambda rr, pp: rr + beta * pp,
                     c["r"], c["p"])
            return {
                "delta": tmap(
                    lambda pp, d: d + alpha * pp, p, c["delta"]),
                "r": tmap(
                    lambda ss, rr: rr - alpha * ss, s, c["r"]),
                "w": tmap(
                    lambda zz, ww: ww - alpha * zz, z, c["w"]),
                "z": z, "s": s, "p": p,
                "gamma": gamma, "alpha": alpha,
                "i": i + 1,
            }

        out = jax.lax.while_loop(
            lambda c: c["i"] < L, body, carry0)
        return out["delta"]

    an0 = psum(_tdot(r0, r0))
    carry0 = {
        "delta": tmap(jnp.zeros_like, r0),
        "r": r0, "p": r0, "an": an0,
        "i": jnp.asarray(0, jnp.int32),
    }

    def body(c):
        Ap = A(c["p"])
        pap = psum(_tdot(c["p"], Ap))
        alpha = sdiv(c["an"], pap)
        delta = tmap(
            lambda p_, d: d + alpha * p_, c["p"], c["delta"])
        r = tmap(lambda ap, rr: rr - alpha * ap, Ap, c["r"])
        bn = psum(_tdot(r, r))
        beta = sdiv(bn, c["an"])
        p = tmap(lambda rr, pp: rr + beta * pp, r, c["p"])
        return {"delta": delta, "r": r, "p": p, "an": bn,
                "i": c["i"] + 1}

    out = jax.lax.while_loop(
        lambda c: c["i"] < L, body, carry0)
    return out["delta"]


def _shard_pcg_lm(A, psum, b_hat, L, period, q_tol, sdiv):
    """Classic hat-space PCG with LM's Q/zeta exit and periodic exact
    residual replacement (the shard-level port of solver/core.pcg_loop's
    uses_lambda branch; M = I because Jacobi scaling is folded into S).
    A already includes the scs = S^2*ctc diagonal."""
    r0 = b_hat
    an0 = psum(_tdot(r0, r0))
    carry0 = {
        "delta": tmap(jnp.zeros_like, r0),
        "r": r0, "p": r0, "an": an0,
        "Q0": jnp.float32(0.0),
        "i": jnp.asarray(0, jnp.int32),
        "brk": jnp.asarray(False),
    }

    def body(c):
        i = c["i"]
        Ap = A(c["p"])
        pap = psum(_tdot(c["p"], Ap))
        alpha = sdiv(c["an"], pap)
        delta = tmap(lambda pp, d: d + alpha * pp, c["p"], c["delta"])

        def reset_branch(_):
            # r = b - A delta exactly (solverGPUGaussNewton.t:2128-2139)
            return tmap(jnp.subtract, b_hat, A(delta))

        def normal_branch(_):
            return tmap(lambda ap, rr: rr - alpha * ap, Ap, c["r"])

        r = jax.lax.cond(
            ((i + 1) % period) == 0, reset_branch, normal_branch, None)
        bn = psum(_tdot(r, r))
        beta = sdiv(bn, c["an"])
        p = tmap(lambda rr, pp: rr + beta * pp, r, c["p"])

        Q1 = 0.5 * psum(_tdot(delta, tmap(jnp.add, r, b_hat)))
        zeta = (i + 1).astype(jnp.float32) * sdiv(Q1 - c["Q0"], Q1)
        return {
            "delta": delta, "r": r, "p": p, "an": bn,
            "Q0": Q1, "i": i + 1, "brk": zeta < q_tol,
        }

    out = jax.lax.while_loop(
        lambda c: (c["i"] < L) & (~c["brk"]), body, carry0)
    return out["delta"]


def supports3d(plan, mesh):
    """3-D eligibility: GN or LM, one 3-D f32 grid ispace, no
    SampledImage, W lane-aligned, H sublane-aligned, D divisible into
    slabs >= the exchange halo (D is the Mosaic-untiled axis, so the
    halo needs no alignment -- unlike the 2-D engine's sublane rows)."""
    if mesh.devices.ndim != 1:
        return False  # D slabs shard over ONE mesh axis
    if plan.spec.graphs:
        return False
    if plan.funcs.dtype != jnp.float32:
        return False
    keys = {im.ispace.key() for im in plan.spec.images.values()}
    if len(keys) != 1:
        return False
    for g in plan.funcs.groups:
        if g.kind != "centered" or g.ispace.ndims != 3:
            return False
    has_sampled = [False]

    def _chk(a):
        if isinstance(a, E.SampledAccess):
            has_sampled[0] = True

    for exp in plan.spec.terms:
        E.visit(exp, _chk)
    if has_sampled[0]:
        return False
    D, H, W = next(iter(plan.spec.images.values())).ispace.shape
    n_dev = mesh.devices.size
    if W % LANE or H % SUBLANE or D % n_dev:
        return False
    n_local = D // n_dev
    from ..ops.stream3d import _stencil_radius_axis as _sra

    he = max(2 * _sra(plan.spec, 0), 1)
    return n_local >= he


class ShardedStream3D:
    """Per-shard two-axis-tiled streamed apply for 3-D grids under
    shard_map: each device owns a D-slab (1-D mesh), p-halo PLANES move
    by ppermute before each apply, and the apply runs one Pallas kernel
    per device per iteration over the locally materialized
    (slab + 2*he) volume -- the 3-D counterpart of ShardedStreamEngine,
    sharing its shard-level pipelined/classic/LM PCG loops; reference
    role: backend_cpu_mt.t:698-944."""

    def __init__(self, plan, mesh, tile_d=None, tile_h=None):
        assert supports3d(plan, mesh), (
            "plan/mesh not eligible for the 3-D sharded stream engine"
        )
        self.plan = plan
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.n_dev = int(mesh.devices.size)
        funcs = plan.funcs
        D, H, W = next(iter(plan.spec.images.values())).ispace.shape
        self.D, self.H, self.W = D, H, W
        self.n_local = D // self.n_dev
        from ..ops.stream3d import _stencil_radius_axis as _sra

        self.he = max(2 * _sra(plan.spec, 0), 1)   # untiled: exact halo
        self.h_d = self.he
        self.h_h = _roundup(max(2 * _sra(plan.spec, 1), 1), SUBLANE)
        self.D_s = self.n_local + 2 * self.he      # extended slab depth
        # tiles over (extended slab depth) x H; smallest counts that
        # divide, capped so tiny dryrun shapes stay one window
        cap_d = tile_d or 8
        T_d = None
        t = min(cap_d, self.D_s)
        while t >= 1:
            if self.D_s % t == 0:
                T_d = t
                break
            t -= 1
        cap_h = tile_h or 64
        T_h = None
        t = min(cap_h, H)
        while t >= SUBLANE:
            if H % t == 0 and t >= self.h_h:
                T_h = t
                break
            t -= SUBLANE
        assert T_d is not None and T_h is not None, (
            "no feasible tile pair for the extended slab"
        )
        self.tile_d, self.tile_h = T_d, T_h
        self.n_td = self.D_s // T_d
        self.n_th = H // T_h

        WIN_d = T_d + 2 * self.h_d
        WIN_h = T_h + 2 * self.h_h
        dims_ext = list(plan.dims)
        dims_ext[-1] = WIN_d
        dims_ext[-2] = WIN_h
        spec_t = ProblemSpec()
        env = EnergyEnv(spec_t, dims_ext)
        from ..runtime.api import _run_energy

        _run_energy(plan.problem.energy, env)
        real_shapes = {
            im.ispace.key(): im.ispace.shape
            for im in plan.spec.images.values()
        }
        self.tfuncs = ProblemFunctions(
            spec_t, funcs.dtype, real_shapes=real_shapes, kernel_safe=True
        )
        self.unknown_names = sorted(funcs.unknown_shapes)
        self.const_names = sorted(
            n for n, im in plan.spec.images.items()
            if not im.is_unknown and n not in funcs.aliases
        )
        self.param_names = sorted(plan.spec.params)
        self.chans = {
            n: plan.spec.images[n].channels
            for n in self.unknown_names + self.const_names
        }

    def build_apply_kernel(self, interpret):
        """pallas_call computing A_hat p = S J^T J S p over the extended
        slab: ins/p (n, D_s+2h_d, H+2h_h, W) channel planes, row0 the
        slab's global depth offset (SMEM), out (nU, D_s, H, W).  One
        serial (n_td x n_th) tile sweep; the dryrun runs interpret."""
        T_d, T_h = self.tile_d, self.tile_h
        h_d, h_h, W = self.h_d, self.h_h, self.W
        H = self.H
        un, cn, pn = self.unknown_names, self.const_names, self.param_names
        chans = self.chans
        tf = self.tfuncs
        n_td, n_th = self.n_td, self.n_th
        nU = sum(chans[n] for n in un)
        nC = sum(chans[n] for n in cn)
        nIn = 2 * nU + nC
        WIN_d, WIN_h = T_d + 2 * h_d, T_h + 2 * h_h
        D_s = self.D_s

        def kernel(ins_any, p_any, pref, rref, out_any, insw, pw, sem):
            params = {name: pref[k, 0] for k, name in enumerate(pn)}
            row0 = rref[0, 0]

            def tile_body(t, _):
                td = t // n_th
                th = t % n_th
                d0 = td * T_d
                r0 = pl.multiple_of(th * T_h, SUBLANE)
                cps = [
                    pltpu.make_async_copy(
                        ins_any.at[:, pl.ds(d0, WIN_d),
                                   pl.ds(r0, WIN_h)], insw, sem),
                    pltpu.make_async_copy(
                        p_any.at[:, pl.ds(d0, WIN_d),
                                 pl.ds(r0, WIN_h)], pw, sem),
                ]
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()
                j = 0
                x_win = {}
                for n in un:
                    x_win[n] = [insw[j + c] for c in range(chans[n])]
                    j += chans[n]
                imgs = {}
                for n in cn:
                    imgs[n] = [insw[j + c] for c in range(chans[n])]
                    j += chans[n]
                sq_win = [insw[j + k] for k in range(nU)]
                data_win = {"images": imgs, "params": params,
                            "graph_indices": {}}
                pv = [pw[k] for k in range(nU)]
                k = 0
                p_sc = {}
                for n in un:
                    pwn = []
                    for c in range(chans[n]):
                        pwn.append(sq_win[k] * pv[k])
                        k += 1
                    p_sc[n] = pwn
                tf.coord_offsets = (row0 + d0 - h_d, r0 - h_h, 0)
                fn = lambda xx: tf.residuals_solve(xx, data_win)
                _, jvp_fn = jax.linearize(fn, x_win)
                jt_fn = jax.linear_transpose(jvp_fn, x_win)
                (grad,) = jt_fn(jvp_fn(p_sc))
                aps = []
                k = 0
                for n in un:
                    for c in range(chans[n]):
                        aps.append(
                            sq_win[k][h_d:h_d + T_d, h_h:h_h + T_h]
                            * grad[n][c][h_d:h_d + T_d, h_h:h_h + T_h])
                        k += 1
                pw[:, pl.ds(0, T_d), pl.ds(0, T_h)] = jnp.stack(aps)
                cp = pltpu.make_async_copy(
                    pw.at[:, pl.ds(0, T_d), pl.ds(0, T_h)],
                    out_any.at[:, pl.ds(d0, T_d), pl.ds(r0, T_h)], sem)
                cp.start(); cp.wait()
                return 0

            jax.lax.fori_loop(0, n_td * n_th, tile_body, 0)

        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
        scratch = [
            pltpu.VMEM((nIn, WIN_d, WIN_h, W), jnp.float32),
            pltpu.VMEM((nU, WIN_d, WIN_h, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]
        return pl.pallas_call(
            kernel,
            in_specs=[any_spec, any_spec, sspec, sspec],
            out_specs=any_spec,
            out_shape=jax.ShapeDtypeStruct((nU, D_s, H, W), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )

    def as_pcg_backend(self, interpret=None, variant="pipelined"):
        """Shard-level hat-space PCG with the per-shard 3-D apply; same
        pipelined/classic loops as the 2-D engine (_shard_pcg)."""
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        kern = self.build_apply_kernel(interpret)
        un, cn, pn = self.unknown_names, self.const_names, self.param_names
        chans = self.chans
        he, h_d, h_h = self.he, self.h_d, self.h_h
        n_local = self.n_local
        nU = sum(chans[n] for n in un)
        ax = self.axis
        n_dev = self.n_dev

        def ext(a):
            """(n_local, H, W) local volume -> (D_s, H, W) with neighbor
            planes (edge devices zero-fill, matching global zero-pad)."""
            up = jax.lax.ppermute(
                a[-he:], ax, perm=[(i, i + 1) for i in range(n_dev - 1)]
            )
            dn = jax.lax.ppermute(
                a[:he], ax, perm=[(i + 1, i) for i in range(n_dev - 1)]
            )
            return jnp.concatenate([up, a, dn], axis=0)

        def pad(a):
            return jnp.pad(a, ((h_d, h_d), (h_h, h_h), (0, 0)))

        def planes(arr):
            return [arr[..., c] for c in range(arr.shape[-1])]

        def psum(v):
            return jax.lax.psum(v, ax)

        def backend(x, data, sq, scs, b_hat, sp):
            L = jnp.asarray(sp["lIterations"], jnp.int32)
            stack = []
            for n in un:
                stack += [pad(ext(p)) for p in planes(x[n])]
            for n in cn:
                stack += [pad(ext(p)) for p in planes(data["images"][n])]
            for n in un:
                stack += [pad(ext(p)) for p in planes(sq[n])]
            ins = jnp.stack(stack)
            pvals = jnp.stack(
                [jnp.asarray(data["params"][n], jnp.float32)
                 for n in pn]
            ).reshape(-1, 1) if pn else jnp.zeros((1, 1), jnp.float32)
            row0 = (
                jax.lax.axis_index(ax).astype(jnp.int32) * n_local - he
            ).reshape(1, 1)

            def A(p):
                pe = jnp.stack(
                    [pad(ext(pp)) for n in un for pp in planes(p[n])]
                )
                ap = kern(ins, pe, pvals, row0)[:, he:he + n_local]
                out, k = {}, 0
                for n in un:
                    c = chans[n]
                    out[n] = jnp.stack(
                        [ap[k + j] for j in range(c)], axis=-1)
                    k += c
                if scs is not None:
                    out = tmap(
                        lambda o, c_, pp: o + c_ * pp, out, scs, p)
                return out

            lm = None
            if scs is not None:
                lm = {
                    "period": jnp.asarray(
                        sp["residual_reset_period"], jnp.int32),
                    "q_tol": jnp.asarray(
                        sp["q_tolerance"], jnp.float32),
                }
            return _shard_pcg(variant, A, psum, b_hat, L, lm)

        return backend


def make_sharded_stream3d_solver(plan, mesh, interpret=None, tile_d=None,
                                 tile_h=None, variant="pipelined"):
    """full_solve under shard_map with the 3-D per-shard streamed apply
    (outer iterations via ShardedGridFuncs, like make_sharded_stream_solver)."""
    from .halo import make_halo_solver

    eng = ShardedStream3D(plan, mesh, tile_d=tile_d, tile_h=tile_h)
    return make_halo_solver(
        plan, mesh, pcg_backend=eng.as_pcg_backend(interpret, variant)
    )


def solve_sharded_stream3d(plan, inputs, mesh, n_iterations=None,
                           interpret=None, tile_d=None, tile_h=None,
                           variant="pipelined"):
    """Full solve with the multi-chip 3-D streamed engine; returns the
    final cost (replicated scalar)."""
    from . import mesh as pmesh

    x, data = plan.bind(inputs, graph_mode="take")
    solve, _, _ = make_sharded_stream3d_solver(
        plan, mesh, interpret=interpret, tile_d=tile_d, tile_h=tile_h,
        variant=variant)
    x, data = pmesh.shard_problem(plan, x, data, mesh)
    sp = plan._sp_device()
    sp["nIterations"] = jnp.asarray(
        int(n_iterations or plan.solver_params["nIterations"]), jnp.int32
    )
    with mesh:
        st = jax.jit(solve)(x, data, sp)
        jax.block_until_ready(st)
    plan._state = st
    plan._data = data
    return float(st["prev_cost"])


def make_sharded_stream_solver(plan, mesh, interpret=None, tile=None,
                               variant="pipelined"):
    """full_solve under shard_map with the streamed per-shard apply:
    outer iterations via ShardedGridFuncs (cost/JtF/diag psum over the
    mesh), inner PCG via ShardedStreamEngine.as_pcg_backend."""
    from .halo import make_halo_solver

    eng = ShardedStreamEngine(plan, mesh, tile=tile)
    return make_halo_solver(
        plan, mesh, pcg_backend=eng.as_pcg_backend(interpret, variant)
    )


def solve_sharded_stream(plan, inputs, mesh, n_iterations=None,
                         interpret=None, tile=None, variant="pipelined"):
    """Full solve with the multi-chip streamed engine; returns the final
    cost (replicated scalar).  The stream_hbm counterpart of
    parallel.halo.solve_sharded_halo."""
    from . import mesh as pmesh

    x, data = plan.bind(inputs, graph_mode="take")
    solve, _, _ = make_sharded_stream_solver(
        plan, mesh, interpret=interpret, tile=tile, variant=variant)
    x, data = pmesh.shard_problem(plan, x, data, mesh)
    sp = plan._sp_device()
    sp["nIterations"] = jnp.asarray(
        int(n_iterations or plan.solver_params["nIterations"]), jnp.int32
    )
    with mesh:
        st = jax.jit(solve)(x, data, sp)
        jax.block_until_ready(st)
    plan._state = st
    plan._data = data
    return float(st["prev_cost"])
