"""Streamed-constant tiled PCG engine: larger-than-VMEM grid solves.

The whole-solve VMEM engine (ops/vmem_solver.py) needs problem + work
vectors + evaluator temporaries resident at once, capping it around
192^2-sized grids.  This engine keeps only the PCG STATE VECTORS
(p / r / delta / Ap) resident in VMEM across iterations inside ONE
Pallas kernel per outer iteration, and STREAMS the per-iteration
constants -- the linearization point, the constant images, and the
scaled preconditioner -- from HBM in row-tile windows with a stencil
halo.  It is the role of the reference's hand-written per-example CUDA
solvers at flagship sizes (reference: examples/image_warping/src/,
examples/poisson_image_editing/src/PatchSolverWarping.cu -- block-
resident iterations), built on the measured Mosaic capabilities:
dynamic-start VMEM slices, ANY->VMEM DMA inside lax.fori, and
fori-inside-while nesting.

Math: PCG runs in the symmetrically Jacobi-preconditioned space
x_hat = D^-1/2 x with D = diag(JtJ) guarded-inverted, so

    A_hat = D^1/2 (JtJ) D^1/2,   M_hat = I,   z == r

and the preconditioner disappears from the inner sweeps (no extra
resident planes, no extra HBM reads).  Excluded unknowns get
sqrt_pre = 0, which zeroes their rows/columns of A_hat and their
residuals/updates -- exactly the unknown-side masking of the fused
solver.  Algebraically this is the same PCG as solver/core.py; float
rounding differs (scaled recurrences), which GN's outer correction
absorbs (tests pin cost agreement at rtol 1e-4).

Per PCG iteration, one in-kernel tile sweep recomputes the matrix-free
JtJp on each (tile + 2*radius)-row window via the SAME traced evaluator
(jax.linearize + transpose, kernel_safe mode) the fused path uses --
like the reference's PCGStep1, the per-pixel partials are recomputed
from the streamed linearization point each apply.  Bounds / Index /
real-domain tests evaluate at global coordinates through
ProblemFunctions.coord_offsets (the window's traced row offset).

Per-iteration HBM traffic = (unknown + const + sqrt_pre channels) x
(tile+2h)/tile plane reads; everything else stays in VMEM.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compile.plan_fns import ProblemFunctions
from ..compile import evaluate as ev
from ..dsl import expr as E
from ..dsl.env import EnergyEnv
from ..dsl.spec import ProblemSpec
from ..solver.core import guarded_invert, tmap

LANE = 128
SUBLANE = 8


def _stencil_radius_axis(spec, axis):
    """Max |offset| along array axis (axis 0 = last declared dim)."""
    radius = 0
    nd = None
    for im in spec.images.values():
        nd = im.ispace.ndims
        break

    def on_node(a):
        nonlocal radius
        if isinstance(a, E.ImageAccess) and isinstance(a.index, E.Offset):
            off = a.index.data
            radius = max(radius, abs(int(off[nd - 1 - axis])))
        elif isinstance(a, E.ComputedAccess):
            E.visit(a.expanded(), on_node)

    for exp in list(spec.terms) + list(spec.excludes):
        E.visit(exp, on_node)
    return radius


def _stencil_radius_axis0(spec):
    """Max |offset| along array axis 0 (= last declared dim)."""
    return _stencil_radius_axis(spec, 0)


def _has_sampled(spec):
    """True if any energy term reads a SampledImage (ineligible for the
    streamed engines: bilinear gathers have no windowed form)."""
    found = [False]

    def _chk(a):
        if isinstance(a, E.SampledAccess):
            found[0] = True

    for exp in spec.terms:
        E.visit(exp, _chk)
    return found[0]


def supports(plan, tile=32, state_in="vmem", variant="classic"):
    """Eligibility: GN, one 2-D grid ispace, f32, aligned sizes.

    state_in='vmem' (StreamSolver) keeps the PCG state vectors resident;
    'hbm' (StreamSolverHBM) streams them too, so only window/tile
    buffers count against VMEM and arbitrarily large grids qualify.
    'hbm' also supports LM (in-kernel Q/zeta exit + residual reset;
    the trust region runs in solver/core via the pcg_backend hook).
    variant='pipelined' drops the classic kernel's nC >= nU stage-
    aliasing requirement (its state tiles have dedicated buffers)."""
    if plan.config.uses_lambda and state_in != "hbm":
        return False
    if plan.funcs.dtype != jnp.float32:
        return False
    if plan.spec.graphs:
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
    shape = next(iter(plan.spec.images.values())).ispace.shape
    H, W = shape
    if W % LANE or H % tile:
        return False
    r = _stencil_radius_axis0(plan.spec)
    h = _roundup(max(2 * r, 1), SUBLANE)
    if h > tile:
        return False
    if state_in == "hbm" and variant != "pipelined":
        # 3 of the 4 stacked tile stages alias insw plane-groups
        # (StreamSolverHBM classic kernel) -> need nIn = 2*nU + nC >= 3*nU
        funcs = plan.funcs
        nU = sum(s[-1] for s in funcs.unknown_shapes.values())
        nC = sum(
            im.channels for n, im in plan.spec.images.items()
            if not im.is_unknown and n not in funcs.aliases
        )
        if nC < nU:
            return False
    est = _estimate_vmem(plan, tile, h, H, W, state_in=state_in,
                         variant=variant)
    budget = (_hbm_budget_bytes(variant) if state_in == "hbm"
              else VMEM_BUDGET_BYTES)
    return est <= budget


def _hbm_tile_search(plan, max_tile=None, variant="classic"):
    """(tile, fuse_beta) for StreamSolverHBM, or (None, False).

    Divisor-aware: walks T down from the cap in SUBLANE steps keeping
    H % T == 0 under the modeled VMEM budget, preferring the fused
    beta-step when it does not force a smaller tile (measured: 4096^2
    T=16 unfused 10.4 s vs T=8 fused 12.6 s; 2048^2 T=32 fused 2.36 s
    vs unfused 2.45 s).  The cap tracks a near-constant tile COUNT ~64
    (docs/ROOFLINE.md).  variant='pipelined' sizes the one-sweep PCG
    kernel (fuse_beta meaningless there, returned False)."""
    if not plan.spec.images or plan.spec.graphs:
        return None, False
    shape = next(iter(plan.spec.images.values())).ispace.shape
    if len(shape) != 2:
        return None, False
    H, W = shape
    if max_tile:
        cap = max_tile
    elif variant == "pipelined":
        # measured on v5e: tile count ~32 (T=64 at 2048^2 and 4096^2)
        # beats count ~64 (1147 vs 1213 ms, 4716 vs 4820 ms); T > 64
        # unmeasured, so capped
        cap = min(64, max(32, _roundup(H // 32, SUBLANE)))
    else:
        cap = max(32, _roundup(H // 64, SUBLANE))
    r = _stencil_radius_axis0(plan.spec)
    h = _roundup(max(2 * r, 1), SUBLANE)

    def best_tile(fuse):
        t = cap
        while t >= h:
            if H % t == 0 and _estimate_vmem(
                plan, t, h, H, W, "hbm", fuse, variant
            ) <= _hbm_budget_bytes(variant):
                return t
            t -= SUBLANE
        return None

    if variant == "pipelined":
        return best_tile(False), False
    tf_, tn = best_tile(True), best_tile(False)
    if tf_ is not None and (tn is None or tf_ >= tn):
        return tf_, True
    if tn is not None:
        return tn, False
    return None, False


def supports_hbm(plan, max_tile=None):
    """Eligibility for StreamSolverHBM with the constructor's own
    divisor-aware tile search (advisor r2: a fixed tile=16 gate rejected
    grids like H=1000 that have a valid smaller divisor tile).  GN plans
    qualify through either variant (the pipelined kernel has no
    nC >= nU constraint); LM qualifies through the classic kernel
    (the constructor's default) though the pipelined kernel also
    runs LM on request (variant= / OPT_TPU_STREAM_LM_PIPE)."""
    if not plan.config.uses_lambda:
        t, _ = _hbm_tile_search(plan, max_tile, variant="pipelined")
        if t is not None and supports(plan, t, "hbm", "pipelined"):
            return True
    t, _ = _hbm_tile_search(plan, max_tile)
    return t is not None and supports(plan, t, "hbm")


# pixel count above which Plan.solve(engine="auto") routes eligible grid
# problems to StreamSolverHBM: calibrated on v5e (docs/ROOFLINE.md --
# XLA keeps PCG carries (partly) VMEM-resident through 1024^2 and wins
# there for GN; the streamed engine wins from 2048^2 up).  LM's XLA
# program is much heavier, so its crossover sits far lower: measured
# stream wins at 512^2 (91.7 vs 106.4 ms) and 1024^2 (323.1 vs
# 456.6 ms) while XLA still wins at 256^2 (47.6 vs 53.1 ms) -- all
# 8x100, docs/sweep_tpu_r3.csv.
AUTO_STREAM_MIN_PIXELS = 2048 * 2048
AUTO_STREAM_MIN_PIXELS_LM = 512 * 512

VMEM_BUDGET_BYTES = 14 * 1024 * 1024
TEMP_PLANES_FACTOR = 4
# HBM-state engine: temps live only inside sweep1's windowed linearize;
# factor calibrated against the measured Mosaic compile boundary on v5e
# (4096^2: unfused T=16 compiles, fused T=16 and unfused T=32 do not;
# 2048^2 fused T=32 and 4096^2 fused T=8 compile)
HBM_TEMP_PLANES_FACTOR = 1.6
# raised Mosaic scoped-vmem limit (compiler_params vmem_limit_bytes);
# the physical budget is far above the 16 MB default (v5e has 128 MB
# VMEM/core).  OPT_TPU_STREAM_VMEM_MB overrides the modeled budget
# (limit tracks it +16 MB) for tile-size experiments.
import os as _os

_VMEM_MB_ENV = _os.environ.get("OPT_TPU_STREAM_VMEM_MB")
# Per-variant defaults: the classic three-sweep kernel was calibrated at
# 48 MB; the pipelined one-sweep kernel verified 88 MB working on v5e
# hardware (4096^2 T=64, docs/sweep_tpu_r3.csv) and its larger tiles
# measured faster (T=64 beats T=32 at both 2048^2 and 4096^2).
_VMEM_MB_DEFAULT = {"classic": 48, "pipelined": 88}


def _hbm_budget_bytes(variant="classic"):
    mb = int(_VMEM_MB_ENV) if _VMEM_MB_ENV else _VMEM_MB_DEFAULT.get(
        variant, 48)
    return mb * 1024 * 1024


def _hbm_limit_bytes(variant="classic"):
    return _hbm_budget_bytes(variant) + 16 * 1024 * 1024


# OPT_TPU_STREAM_WSTAGE=1: pipelined kernel stages its per-tile state/w
# writes through dedicated buffers so the write DMAs overlap the next
# tile's compute (waited one buffer-set cycle later).  Costs 2x6xnU tile
# buffers of VMEM -- pair with a raised OPT_TPU_STREAM_VMEM_MB.
# Measured NEGATIVE on v5e (2048^2 T=64: 1164 vs 1147 ms; 4096^2 T=32:
# 4810 vs 4820 ms -- docs/ROOFLINE.md); kept as a recorded experiment,
# off by default.
_WSTAGE = _os.environ.get("OPT_TPU_STREAM_WSTAGE", "0") == "1"


def _roundup(v, m):
    return ((v + m - 1) // m) * m


def _estimate_vmem(plan, tile, h, H, W, state_in="vmem",
                   fuse_beta=False, variant="classic"):
    """Resident state + windows + a temp model (factor per residual
    channel on the window shape, as calibrated for the VMEM engine).
    state_in='hbm': the state vectors are streamed, so only their
    window/tile buffers count.  variant='pipelined' (one-sweep
    PCG): per buffer set one ins window + one w window + the stacked
    5-vector state tile."""
    funcs = plan.funcs
    nU = sum(s[-1] for s in funcs.unknown_shapes.values())
    nC = sum(
        im.channels for n, im in plan.spec.images.items()
        if not im.is_unknown and n not in funcs.aliases
    )
    win_rows = tile + 2 * h
    n_res = sum(
        len(g.exprs) for g in funcs.groups if g.kind == "centered"
    )
    if state_in == "hbm" and variant == "pipelined":
        lm = plan.config.uses_lambda
        nIn = 2 * nU + nC + (nU if lm else 0)  # x | consts | sqp [| scs]
        windows = 2 * (nIn + nU) * win_rows * W * 4   # ins + w (A+B)
        # z/s/p/delta/r (A+B); LM adds a b tile per set (Q accumulation)
        state = 2 * (6 if lm else 5) * nU * tile * W * 4
        if _WSTAGE:
            state += 2 * 6 * nU * tile * W * 4        # write stages (A+B)
        temps = int(HBM_TEMP_PLANES_FACTOR * n_res * win_rows * W * 4)
    elif state_in == "hbm":
        # window buffers are DOUBLE-BUFFERED (pipelined apply sweep);
        # tile stages alias window heads; temps calibrated against the
        # measured Mosaic compile boundary
        state = 2 * nU * win_rows * W * 4      # p windows (A+B)
        if fuse_beta:
            state += 2 * nU * win_rows * W * 4  # r windows (A+B)
        if plan.config.uses_lambda:
            state += 2 * nU * win_rows * W * 4  # scs windows (A+B)
        temps = int(HBM_TEMP_PLANES_FACTOR * n_res * win_rows * W * 4)
        windows = 2 * (nU * 2 + nC) * win_rows * W * 4   # ins (A+B)
    else:
        state = nU * ((H + 2 * h) + 3 * H) * W * 4      # p, r, Ap, delta
        temps = TEMP_PLANES_FACTOR * n_res * win_rows * W * 4
        windows = (nU * 2 + nC) * win_rows * W * 4       # x, sqp, consts
    return state + windows + temps


class StreamSolver:
    """Full GN solve with the tiled streamed-constant PCG kernel."""

    STATE_IN = "vmem"

    def __init__(self, plan, tile=32):
        assert supports(plan, tile, self.STATE_IN,
                        getattr(self, "variant", "classic")), (
            "plan not eligible for this stream solver"
        )
        self.plan = plan
        self.tile = tile
        funcs = plan.funcs
        shape = next(iter(plan.spec.images.values())).ispace.shape
        self.H, self.W = shape
        self.radius = _stencil_radius_axis0(plan.spec)
        # sublane-aligned halo: every dynamic VMEM slice start must be a
        # provable multiple of 8 (Mosaic), so tiles and halos are 8-aligned
        self.h = _roundup(max(2 * self.radius, 1), SUBLANE)
        self.n_tiles = self.H // tile

        # tile-window ProblemFunctions (kernel_safe channel planes)
        dims_ext = list(plan.dims)
        dims_ext[-1] = tile + 2 * self.h
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
        self._kern_cache = {}

    # -- kernel -----------------------------------------------------------------

    def _build_kernel(self, n_lin, interpret):
        T, h, H, W = self.tile, self.h, self.H, self.W
        un, cn, pn = self.unknown_names, self.const_names, self.param_names
        chans = self.chans
        tf = self.tfuncs
        n_tiles = self.n_tiles
        nU = sum(chans[n] for n in un)  # unknown channel planes

        def kernel(*refs):
            i = 0
            x_any = {}
            for n in un:
                x_any[n] = [refs[i + k] for k in range(chans[n])]
                i += chans[n]
            c_any = {}
            for n in cn:
                c_any[n] = [refs[i + k] for k in range(chans[n])]
                i += chans[n]
            sqp_any = [refs[i + k] for k in range(nU)]
            i += nU
            r0_any = [refs[i + k] for k in range(nU)]
            i += nU
            pref = refs[i]; i += 1  # SMEM params
            outs = refs[i : i + nU]; i += nU
            # scratch
            p_buf = refs[i : i + nU]; i += nU          # (H+2h, W)
            r_buf = refs[i : i + nU]; i += nU          # (H, W)
            ap_buf = refs[i : i + nU]; i += nU         # (H, W)
            xw = {}
            for n in un:
                xw[n] = refs[i : i + chans[n]]; i += chans[n]
            cw = {}
            for n in cn:
                cw[n] = refs[i : i + chans[n]]; i += chans[n]
            sqw = refs[i : i + nU]; i += nU            # (T+2h, W)
            sem = refs[i]; i += 1

            params = {name: pref[k, 0] for k, name in enumerate(pn)}

            def dma_start(src, dst, start, rows):
                cp = pltpu.make_async_copy(
                    src.at[pl.ds(start, rows)], dst, sem
                )
                cp.start()
                return cp

            # ---- init: r = r0_hat, p = [0-pad | r0_hat | 0-pad] ----------
            for k in range(nU):
                p_buf[k][...] = jnp.zeros((H + 2 * h, W), jnp.float32)
            an0 = jnp.float32(0.0)

            # staging buffer sqw is (T+2h, W); DMA T rows into its head
            def init_tile2(t, an):
                t0 = t * T
                for k in range(nU):
                    cp = pltpu.make_async_copy(
                        r0_any[k].at[pl.ds(t0, T)],
                        sqw[k].at[pl.ds(0, T)], sem,
                    )
                    cp.start()
                    cp.wait()
                    v = sqw[k][0:T]
                    r_buf[k][pl.ds(t0, T)] = v
                    p_buf[k][pl.ds(t0 + h, T)] = v
                    an = an + jnp.sum(v * v)
                return an

            an0 = jax.lax.fori_loop(0, n_tiles, init_tile2, an0)
            for k in range(nU):
                outs[k][...] = jnp.zeros((H, W), jnp.float32)

            # ---- PCG loop -------------------------------------------------
            def sweep1(t, pap):
                t0 = t * T
                # issue every window DMA for this tile, then wait once --
                # serialized start/wait pairs were latency-bound
                cps = []
                for n in un:
                    for c, ref in enumerate(x_any[n]):
                        cps.append(dma_start(ref, xw[n][c], t0, T + 2 * h))
                for n in cn:
                    for c, ref in enumerate(c_any[n]):
                        cps.append(dma_start(ref, cw[n][c], t0, T + 2 * h))
                for k in range(nU):
                    cps.append(dma_start(sqp_any[k], sqw[k], t0, T + 2 * h))
                for cp in cps:
                    cp.wait()

                x_win = {
                    n: [xw[n][c][...] for c in range(chans[n])] for n in un
                }
                data_win = {
                    "images": {
                        n: [cw[n][c][...] for c in range(chans[n])]
                        for n in cn
                    },
                    "params": params,
                    "graph_indices": {},
                }
                sq_win = [sqw[k][...] for k in range(nU)]

                # scaled direction: D^1/2 p_hat on the window
                k = 0
                p_sc = {}
                for n in un:
                    pw = []
                    for c in range(chans[n]):
                        pw.append(
                            sq_win[k] * p_buf[k][pl.ds(t0, T + 2 * h)]
                        )
                        k += 1
                    p_sc[n] = pw

                tf.coord_offsets = (t0 - h, 0)
                fn = lambda xx: tf.residuals_solve(xx, data_win)
                _, jvp_fn = jax.linearize(fn, x_win)
                jt_fn = jax.linear_transpose(jvp_fn, x_win)
                (grad,) = jt_fn(jvp_fn(p_sc))

                k = 0
                for n in un:
                    for c in range(chans[n]):
                        ap = (
                            sq_win[k][h : h + T]
                            * grad[n][c][h : h + T]
                        )
                        ap_buf[k][pl.ds(t0, T)] = ap
                        pap = pap + jnp.sum(
                            ap * p_buf[k][pl.ds(t0 + h, T)]
                        )
                        k += 1
                return pap

            def body(carry):
                it, an = carry
                pap = jax.lax.fori_loop(0, n_tiles, sweep1, jnp.float32(0.0))
                alpha = jnp.where(pap != 0.0, an / jnp.where(
                    pap != 0.0, pap, 1.0), 0.0)

                def upd(t, bn):
                    t0 = t * T
                    for k in range(nU):
                        pv = p_buf[k][pl.ds(t0 + h, T)]
                        outs[k][pl.ds(t0, T)] = (
                            outs[k][pl.ds(t0, T)] + alpha * pv
                        )
                        rv = (
                            r_buf[k][pl.ds(t0, T)]
                            - alpha * ap_buf[k][pl.ds(t0, T)]
                        )
                        r_buf[k][pl.ds(t0, T)] = rv
                        bn = bn + jnp.sum(rv * rv)
                    return bn

                bn = jax.lax.fori_loop(0, n_tiles, upd, jnp.float32(0.0))
                beta = jnp.where(an != 0.0, bn / jnp.where(
                    an != 0.0, an, 1.0), 0.0)

                def upd_p(t, _):
                    t0 = t * T
                    for k in range(nU):
                        p_buf[k][pl.ds(t0 + h, T)] = (
                            r_buf[k][pl.ds(t0, T)]
                            + beta * p_buf[k][pl.ds(t0 + h, T)]
                        )
                    return 0

                jax.lax.fori_loop(0, n_tiles, upd_p, 0)
                return it + 1, bn

            jax.lax.while_loop(
                lambda c: c[0] < n_lin, body, (jnp.int32(0), an0)
            )

        # ---- pallas_call wiring ------------------------------------------
        any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
        n_any = (
            sum(chans[n] for n in un)
            + sum(chans[n] for n in cn)
            + 2 * nU
        )
        scratch = (
            [pltpu.VMEM((H + 2 * h, W), jnp.float32)] * nU      # p
            + [pltpu.VMEM((H, W), jnp.float32)] * nU            # r
            + [pltpu.VMEM((H, W), jnp.float32)] * nU            # Ap
            + [pltpu.VMEM((T + 2 * h, W), jnp.float32)]
            * sum(chans[n] for n in un)                          # x windows
            + [pltpu.VMEM((T + 2 * h, W), jnp.float32)]
            * sum(chans[n] for n in cn)                          # c windows
            + [pltpu.VMEM((T + 2 * h, W), jnp.float32)] * nU    # sqp windows
            + [pltpu.SemaphoreType.DMA]
        )
        return pl.pallas_call(
            kernel,
            in_specs=[any_spec] * n_any + [sspec],
            out_specs=tuple([vspec] * nU),
            out_shape=tuple(
                [jax.ShapeDtypeStruct((H, W), jnp.float32)] * nU
            ),
            scratch_shapes=scratch,
            interpret=interpret,
        )

    # -- whole solve -------------------------------------------------------------

    def _whole_solve(self, n_outer, n_lin, interpret):
        plan = self.plan
        funcs = plan.funcs
        un, cn = self.unknown_names, self.const_names
        chans = self.chans
        h, H, W = self.h, self.H, self.W
        kern = self._build_kernel(n_lin, interpret)
        ginv = functools.partial(
            guarded_invert, kind=plan.config.guarded_invert_type,
            dtype=funcs.dtype,
        )

        def pad_plane(a):
            return jnp.pad(a, ((h, h), (0, 0)))

        def planes(arr):
            return [arr[..., c] for c in range(arr.shape[-1])]

        def outer_step(x, data, pvals):
            masks = funcs.unknown_masks(x, data)
            r0, jvp_fn, jt_fn = funcs.linearize(x, data)
            neg_jtf = tmap(lambda v: -v, funcs.jtf(r0, jt_fn))
            diag = funcs.diag_jtj(x, data)
            if funcs.use_preconditioner:
                pre = tmap(ginv, diag)
            else:
                pre = tmap(jnp.ones_like, diag)
            # sqrt-scaled preconditioner; excluded unknowns -> 0, which
            # zeroes their rows/cols of A_hat and all their updates
            sq = {}
            for n in un:
                s = jnp.sqrt(pre[n])
                m = masks[n]
                if m is not None:
                    s = jnp.where(m, 0.0, s)
                sq[n] = s
            r0_hat = {
                n: sq[n] * neg_jtf[n] for n in un
            }

            args = []
            for n in un:
                args += [pad_plane(p) for p in planes(x[n])]
            for n in cn:
                args += [pad_plane(p) for p in planes(data["images"][n])]
            for n in un:
                args += [pad_plane(p) for p in planes(sq[n])]
            for n in un:
                args += planes(r0_hat[n])
            args.append(pvals)
            outs = kern(*args)

            k = 0
            x_new = {}
            for n in un:
                c = chans[n]
                d_hat = jnp.stack(outs[k : k + c], axis=-1)
                k += c
                x_new[n] = x[n] + sq[n] * d_hat
            new_cost = funcs.cost(x_new, data)
            return x_new, new_cost

        def whole(x, data, pvals):
            cost0 = funcs.cost(x, data)

            def body(i, carry):
                x, _ = carry
                return outer_step(x, data, pvals)

            x_fin, cost = jax.lax.fori_loop(
                0, n_outer, body, (x, cost0)
            )
            return x_fin, cost

        return whole

    def solve(self, inputs, interpret=None):
        plan = self.plan
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        x, data = plan.bind(inputs)
        n_outer = int(plan.solver_params["nIterations"])
        n_lin = int(plan.solver_params["lIterations"])
        key = (n_outer, n_lin, interpret)
        if key not in self._kern_cache:
            self._kern_cache[key] = jax.jit(
                self._whole_solve(n_outer, n_lin, interpret)
            )
        fn = self._kern_cache[key]

        def host_param(n):
            v = inputs.get(n, data["params"].get(n))
            return float(v)

        pvals = jnp.asarray(
            [[host_param(n)] for n in self.param_names] or [[0.0]],
            jnp.float32,
        )
        x_new, cost = fn(x, data, pvals)
        return {"x": x_new, "final_cost": float(cost)}


class StreamSolverHBM(StreamSolver):
    """Fully-streamed variant for larger-than-VMEM grids.

    StreamSolver keeps p/r/Ap/delta resident in VMEM, which caps it near
    ~256^2; past that, the XLA path streams every one of its ~18 loop
    fusions over HBM (4096^2 image_warping measured 13.6 ms/PCG
    iteration -- ~7x the HBM roofline, each fusion a full-vector pass).
    Here the state vectors ALSO live in HBM (workspace outputs in ANY
    memory) and every sweep DMAs row-tile windows through small VMEM
    buffers, so one PCG iteration costs three streamed passes:

      sweep1  read  [x|consts|sqp] + p windows; write Ap      (JtJp)
      sweep2  read  p, r, Ap, delta; write r, delta           (axpys, bn)
      sweep3  read  r, p; write p                             (beta step)

    All same-role planes are STACKED along a leading axis so each group
    moves in ONE strided DMA (a v1 with per-plane copies measured
    DMA-issue-bound: ~28 copies per sweep-1 tile put it only at parity
    with XLA at 4096^2).  Same hat-space math and masking as
    StreamSolver (see module docstring).  Runs as solver/core's
    pcg_backend, so BOTH GN and LM work: the kernel adds the CtC
    diagonal, the Q/zeta exit, and the periodic exact residual reset
    in LM mode, while the trust region stays in core.  Reference role:
    the hand-written large-grid CUDA solvers
    (examples/image_warping/src/, PatchSolverWarping.cu).
    """

    STATE_IN = "hbm"

    def __init__(self, plan, tile=None, variant=None):
        """tile: maximum row-tile height (None = auto cap); the
        constructor picks the largest feasible T <= tile and, for the
        classic variant, whether to fuse the beta-step (fusing saves a
        streamed pass but costs nU extra r-window buffers; at VMEM-tight
        sizes a LARGER unfused tile measured faster: 4096^2 T=16 unfused
        10.4 s vs T=8 fused 12.6 s, while 2048^2 T=32 fused 2.36 s vs
        unfused 2.45 s).

        variant: 'pipelined' (GN default) runs the Ghysels-Vanroose
        one-sweep PCG (one reduction barrier per iteration); 'classic'
        the three-sweep loop (LM always classic: the Q/zeta exit and
        residual reset are defined on it).  OPT_TPU_STREAM_VARIANT
        overrides."""
        import os

        lm = plan.config.uses_lambda
        want = variant or os.environ.get("OPT_TPU_STREAM_VARIANT", "auto")
        pick = None
        lm_pipe = os.environ.get("OPT_TPU_STREAM_LM_PIPE", "0") == "1"
        if want == "pipelined" or (want == "auto"
                                   and (not lm or lm_pipe)):
            # GN default: the one-sweep pipelined-PCG kernel (one
            # reduction barrier per iteration vs classic's two); falls
            # back to classic when its larger buffer set finds no tile.
            # LM runs pipelined only on request (variant= or
            # OPT_TPU_STREAM_LM_PIPE=1): measured SLOWER than classic
            # on v5e (2048^2 8x100: 1405.1 vs 1285.6 ms,
            # docs/sweep_tpu_r3.csv) -- the exact residual
            # replacement's 3 extra passes per reset (+0.3 sweeps/iter
            # at period 10) plus the per-sweep b-tile read outweigh
            # the saved barrier sweep.
            pick, _ = _hbm_tile_search(plan, tile, variant="pipelined")
        if pick is not None:
            self.variant = "pipelined"
            self.fuse_beta = False
        else:
            self.variant = "classic"
            pick, fuse = _hbm_tile_search(plan, tile)
            if pick is None:
                self.fuse_beta = False
                r = _stencil_radius_axis0(plan.spec)
                pick = _roundup(max(2 * r, 1), SUBLANE)  # supports() rejects
            else:
                self.fuse_beta = fuse
        super().__init__(plan, pick)

    def _build_backend_kernel(self, interpret):
        """The inner-PCG kernel behind SolverConfig.pcg_backend.

        Solves  S (JtJ [+ CtC]) S d_hat = b_hat  entirely in-kernel with
        the state vectors in HBM workspaces; LM mode (uses_lambda) adds
        the scs = S^2*ctc diagonal term to the apply, the Q/zeta early
        exit, and the exact residual recomputation every
        residual_reset_period iterations (r = b - A*delta, via a second
        apply sweep under lax.cond).  L / period / q_tol arrive as SMEM
        scalars so set_solver_parameter stays live without a rebuild."""
        T, h, H, W = self.tile, self.h, self.H, self.W
        un, cn, pn = self.unknown_names, self.const_names, self.param_names
        chans = self.chans
        tf = self.tfuncs
        n_tiles = self.n_tiles
        nU = sum(chans[n] for n in un)
        nC = sum(chans[n] for n in cn)
        lm = self.plan.config.uses_lambda
        nIn = nU + nC + nU + (nU if lm else 0)
        fuse = self.fuse_beta

        def kernel(ins_any, b_any, pref, ctl_i, ctl_f,
                   d_any, p_any, r_any, ap_any, insw, pw, insw2, pw2,
                   *rest):
            if fuse:
                rw, rw2, sem, sem2 = rest
            else:
                sem, sem2 = rest
                rw = rw2 = None
            params = {name: pref[k, 0] for k, name in enumerate(pn)}
            L = ctl_i[0, 0]
            period = ctl_i[1, 0]
            q_tol = ctl_f[0, 0]

            # (nU, T, W) tile stages carved from the window buffers;
            # b selects the A/B buffer set for double-buffered sweeps
            # (stage 4 fits because supports() requires nC >= nU)
            def st_ref(j, b=0):
                iw = insw if b == 0 else insw2
                pwx = pw if b == 0 else pw2
                if j == 3:
                    return pwx.at[:, pl.ds(0, T)]
                jj = 3 if j == 4 else j  # stage 3 lives in pw
                return iw.at[pl.ds(jj * nU, nU), pl.ds(0, T)]

            def st_get(j, b=0):
                iw = insw if b == 0 else insw2
                pwx = pw if b == 0 else pw2
                if j == 3:
                    return pwx[:, 0:T]
                jj = 3 if j == 4 else j
                return iw[jj * nU:(jj + 1) * nU, 0:T]

            def st_set(j, v, b=0):
                iw = insw if b == 0 else insw2
                pwx = pw if b == 0 else pw2
                if j == 3:
                    pwx[:, pl.ds(0, T)] = v
                else:
                    jj = 3 if j == 4 else j
                    iw[pl.ds(jj * nU, nU), pl.ds(0, T)] = v

            def _sem(b):
                return sem if b == 0 else sem2

            def trd(any_ref, j, start, b=0):
                cp = pltpu.make_async_copy(
                    any_ref.at[:, pl.ds(start, T)], st_ref(j, b),
                    _sem(b))
                cp.start()
                return cp

            def trd2(any_ref, j, off, start, b=0):
                cp = pltpu.make_async_copy(
                    any_ref.at[pl.ds(off, nU), pl.ds(start, T)],
                    st_ref(j, b), _sem(b))
                cp.start()
                return cp

            def twr(j, any_ref, start, b=0):
                cp = pltpu.make_async_copy(
                    st_ref(j, b), any_ref.at[:, pl.ds(start, T)],
                    _sem(b))
                cp.start()
                return cp

            # ---- init: delta = 0, r = [0|b_hat|0], p slots zero/b ----
            st_set(0, jnp.zeros((nU, T, W), jnp.float32))

            def zero_tile(t, _):
                t0 = t * T
                twr(0, d_any, t0 + h).wait()
                for s in range(2 if fuse else 1):
                    cp = pltpu.make_async_copy(
                        st_ref(0),
                        p_any.at[pl.ds(s * nU, nU),
                                 pl.ds(t0 + h, T)], sem)
                    cp.start(); cp.wait()
                return 0

            jax.lax.fori_loop(0, n_tiles, zero_tile, 0)
            halo_tgts = [(p_any, 0), (r_any, 0), (d_any, 0)]
            if fuse:
                halo_tgts.append((p_any, nU))
            for tgt, off in halo_tgts:
                cp = pltpu.make_async_copy(
                    insw.at[pl.ds(0, nU), pl.ds(0, h)],
                    tgt.at[pl.ds(off, nU), pl.ds(0, h)], sem)
                cp.start(); cp.wait()
                cp = pltpu.make_async_copy(
                    insw.at[pl.ds(0, nU), pl.ds(0, h)],
                    tgt.at[pl.ds(off, nU), pl.ds(H + h, h)], sem)
                cp.start(); cp.wait()

            def init_tile(t, an):
                t0 = t * T
                trd(b_any, 3, t0).wait()
                v = st_get(3)
                an = an + jnp.sum(v * v)
                c1 = twr(3, r_any, t0 + h)
                if not fuse:
                    c2 = twr(3, p_any, t0 + h)
                    c2.wait()
                c1.wait()
                return an

            an0 = jax.lax.fori_loop(0, n_tiles, init_tile, jnp.float32(0.0))

            # ---- apply sweep: Ap (or A*delta) -------------------------
            WIN = T + 2 * h

            def apply_sweep(src_any, src_off, sl_new, beta, with_beta):
                """One streamed pass computing A_hat * src into ap_any,
                DOUBLE-BUFFERED: while one tile computes, the other
                buffer set's window DMAs are in flight (the serial
                wait->compute->wait version measured DMA-latency-bound).
                with_beta: also form p_new = r + beta*p_old on the
                window and write its center to slot sl_new.  Returns
                sum(src_used * A src_used)."""
                bufs = ((insw, pw, rw, sem), (insw2, pw2, rw2, sem2))
                n_pairs = n_tiles // 2

                def reads(b, t0):
                    iw, pwx, rwx, sm = bufs[b]
                    cps = [
                        pltpu.make_async_copy(
                            ins_any.at[:, pl.ds(t0, WIN)], iw, sm),
                        pltpu.make_async_copy(
                            src_any.at[pl.ds(src_off, nU),
                                       pl.ds(t0, WIN)], pwx, sm),
                    ]
                    if with_beta:
                        cps.append(pltpu.make_async_copy(
                            r_any.at[:, pl.ds(t0, WIN)], rwx, sm))
                    return cps

                def start_reads(b, t0):
                    for cp in reads(b, t0):
                        cp.start()

                def wait_reads(b, t0):
                    for cp in reads(b, t0):
                        cp.wait()

                def compute(b, t0, acc):
                    iw, pwx, rwx, sm = bufs[b]
                    if with_beta:
                        pwx[...] = rwx[...] + beta * pwx[...]

                    j = 0
                    x_win = {}
                    for n in un:
                        x_win[n] = [iw[j + c] for c in range(chans[n])]
                        j += chans[n]
                    imgs = {}
                    for n in cn:
                        imgs[n] = [iw[j + c] for c in range(chans[n])]
                        j += chans[n]
                    sq_win = [iw[j + k] for k in range(nU)]
                    j += nU
                    scs_win = (
                        [iw[j + k] for k in range(nU)] if lm else None
                    )
                    data_win = {
                        "images": imgs,
                        "params": params,
                        "graph_indices": {},
                    }

                    pwv = [pwx[k] for k in range(nU)]
                    k = 0
                    p_sc = {}
                    for n in un:
                        pwn = []
                        for c in range(chans[n]):
                            pwn.append(sq_win[k] * pwv[k])
                            k += 1
                        p_sc[n] = pwn

                    tf.coord_offsets = (t0 - h, 0)
                    fn = lambda xx: tf.residuals_solve(xx, data_win)
                    _, jvp_fn = jax.linearize(fn, x_win)
                    jt_fn = jax.linear_transpose(jvp_fn, x_win)
                    (grad,) = jt_fn(jvp_fn(p_sc))

                    aps = []
                    k = 0
                    for n in un:
                        for c in range(chans[n]):
                            ap = (
                                sq_win[k][h : h + T]
                                * grad[n][c][h : h + T]
                            )
                            if lm:
                                ap = ap + (
                                    scs_win[k][h : h + T]
                                    * pwv[k][h : h + T]
                                )
                            acc = acc + jnp.sum(ap * pwv[k][h : h + T])
                            aps.append(ap)
                            k += 1
                    if with_beta:
                        cp = pltpu.make_async_copy(
                            pwx.at[:, pl.ds(h, T)],
                            p_any.at[pl.ds(sl_new, nU),
                                     pl.ds(t0 + h, T)], sm)
                        cp.start(); cp.wait()
                    pwx[:, pl.ds(0, T)] = jnp.stack(aps)
                    cp = pltpu.make_async_copy(
                        pwx.at[:, pl.ds(0, T)],
                        ap_any.at[:, pl.ds(t0, T)], sm)
                    cp.start(); cp.wait()
                    return acc

                if n_tiles % 2:
                    # odd tile count: serial fallback
                    def tile(t, acc):
                        t0 = t * T
                        start_reads(0, t0)
                        wait_reads(0, t0)
                        return compute(0, t0, acc)

                    return jax.lax.fori_loop(
                        0, n_tiles, tile, jnp.float32(0.0))

                start_reads(0, 0)

                def pair(k2, acc):
                    tA = (2 * k2) * T
                    tB = (2 * k2 + 1) * T
                    start_reads(1, tB)
                    wait_reads(0, tA)
                    acc = compute(0, tA, acc)
                    # prefetch the next pair's first tile; clamp the
                    # PAIR INDEX (Mosaic cannot prove row offsets
                    # divisible through a minimum, but idx * 2T it can)
                    nk = jnp.minimum(k2 + 1, n_pairs - 1)
                    start_reads(0, nk * (2 * T))
                    wait_reads(1, tB)
                    acc = compute(1, tB, acc)
                    return acc

                acc = jax.lax.fori_loop(
                    0, n_pairs, pair, jnp.float32(0.0))
                # the dangling final prefetch
                wait_reads(0, (n_pairs - 1) * 2 * T)
                return acc

            def body(carry):
                it, an, beta, Q0, brk = carry
                sl_new = (it % 2) * nU
                sl_old = (nU - sl_new) if fuse else 0
                if fuse:
                    pap = apply_sweep(p_any, sl_old, sl_new, beta, True)
                else:
                    pap = apply_sweep(p_any, 0, 0, beta, False)
                alpha = jnp.where(pap != 0.0, an / jnp.where(
                    pap != 0.0, pap, 1.0), 0.0)
                p_slot = sl_new if fuse else 0

                def u_cps(b, t0):
                    # UNSTARTED copy descriptors (started by u_start,
                    # waited by reconstruction in u_wait)
                    cps = [
                        pltpu.make_async_copy(
                            d_any.at[:, pl.ds(t0 + h, T)],
                            st_ref(0, b), _sem(b)),
                        pltpu.make_async_copy(
                            r_any.at[:, pl.ds(t0 + h, T)],
                            st_ref(1, b), _sem(b)),
                        pltpu.make_async_copy(
                            ap_any.at[:, pl.ds(t0, T)],
                            st_ref(2, b), _sem(b)),
                        pltpu.make_async_copy(
                            p_any.at[pl.ds(p_slot, nU),
                                     pl.ds(t0 + h, T)],
                            st_ref(3, b), _sem(b)),
                    ]
                    if lm:
                        cps.append(pltpu.make_async_copy(
                            b_any.at[:, pl.ds(t0, T)],
                            st_ref(4, b), _sem(b)))
                    return cps

                def u_start(b, t0):
                    for cp in u_cps(b, t0):
                        cp.start()

                def u_wait(b, t0):
                    for cp in u_cps(b, t0):
                        cp.wait()

                def u_compute(b, t0, acc):
                    bn, qd = acc
                    dv = st_get(0, b) + alpha * st_get(3, b)
                    st_set(0, dv, b)
                    rv = st_get(1, b) - alpha * st_get(2, b)
                    st_set(1, rv, b)
                    bn = bn + jnp.sum(rv * rv)
                    c1 = twr(0, d_any, t0 + h, b)
                    c2 = twr(1, r_any, t0 + h, b)
                    c1.wait(); c2.wait()
                    if lm:
                        qd = qd + jnp.sum(dv * (rv + st_get(4, b)))
                    return bn, qd

                if n_tiles % 2:
                    def upd(t, acc):
                        t0 = t * T
                        u_start(0, t0)
                        u_wait(0, t0)
                        return u_compute(0, t0, acc)

                    bn, qd = jax.lax.fori_loop(
                        0, n_tiles, upd,
                        (jnp.float32(0.0), jnp.float32(0.0)))
                else:
                    n_pairs2 = n_tiles // 2
                    u_start(0, 0)  # prologue

                    def u_pair(k2, acc):
                        tA = (2 * k2) * T
                        tB = (2 * k2 + 1) * T
                        u_start(1, tB)
                        u_wait(0, tA)
                        acc = u_compute(0, tA, acc)
                        nk = jnp.minimum(k2 + 1, n_pairs2 - 1)
                        u_start(0, nk * (2 * T))
                        u_wait(1, tB)
                        acc = u_compute(1, tB, acc)
                        return acc

                    bn, qd = jax.lax.fori_loop(
                        0, n_pairs2, u_pair,
                        (jnp.float32(0.0), jnp.float32(0.0)))
                    u_wait(0, (n_pairs2 - 1) * 2 * T)

                if lm:
                    def reset_branch(_):
                        # r = b - A delta, exactly (solver/core.py
                        # reset_branch; solverGPUGaussNewton.t:2128-2139)
                        apply_sweep(d_any, 0, 0, jnp.float32(0.0), False)

                        def fix(t, acc):
                            bn2, qd2 = acc
                            t0 = t * T
                            cps = [trd(b_any, 1, t0),
                                   trd(ap_any, 2, t0),
                                   trd(d_any, 0, t0 + h)]
                            for cp in cps:
                                cp.wait()
                            bv = st_get(1)
                            rv = bv - st_get(2)
                            st_set(1, rv)
                            twr(1, r_any, t0 + h).wait()
                            bn2 = bn2 + jnp.sum(rv * rv)
                            qd2 = qd2 + jnp.sum(st_get(0) * (rv + bv))
                            return bn2, qd2

                        return jax.lax.fori_loop(
                            0, n_tiles, fix,
                            (jnp.float32(0.0), jnp.float32(0.0)))

                    do_reset = ((it + 1) % period) == 0
                    bn, qd = jax.lax.cond(
                        do_reset, reset_branch,
                        lambda _: (bn, qd), None)
                    Q1 = 0.5 * qd
                    zeta = (it + 1).astype(jnp.float32) * jnp.where(
                        Q1 != 0.0, (Q1 - Q0) / jnp.where(
                            Q1 != 0.0, Q1, 1.0), 0.0)
                    brk = zeta < q_tol
                    Q0 = Q1
                beta_next = jnp.where(an != 0.0, bn / jnp.where(
                    an != 0.0, an, 1.0), 0.0)

                if not fuse:
                    def upd_p(t, _):
                        t0 = t * T
                        cps = [trd(r_any, 1, t0 + h),
                               trd2(p_any, 3, 0, t0 + h)]
                        for cp in cps:
                            cp.wait()
                        st_set(3, st_get(1) + beta_next * st_get(3))
                        twr(3, p_any, t0 + h).wait()
                        return 0

                    jax.lax.fori_loop(0, n_tiles, upd_p, 0)
                return it + 1, bn, beta_next, Q0, brk

            jax.lax.while_loop(
                lambda c: (c[0] < L) & (~c[4]), body,
                (jnp.int32(0), an0, jnp.float32(0.0), jnp.float32(0.0),
                 jnp.asarray(False)),
            )

        any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
        win = T + 2 * h
        scratch = [
            pltpu.VMEM((nIn, win, W), jnp.float32),      # input windows A
            pltpu.VMEM((nU, win, W), jnp.float32),       # p/src windows A
            pltpu.VMEM((nIn, win, W), jnp.float32),      # input windows B
            pltpu.VMEM((nU, win, W), jnp.float32),       # p/src windows B
        ]
        if fuse:
            scratch.append(
                pltpu.VMEM((nU, win, W), jnp.float32))   # r windows A
            scratch.append(
                pltpu.VMEM((nU, win, W), jnp.float32))   # r windows B
        scratch.append(pltpu.SemaphoreType.DMA)
        scratch.append(pltpu.SemaphoreType.DMA)
        n_pslots = 2 if fuse else 1
        out_shapes = (
            jax.ShapeDtypeStruct((nU, H + 2 * h, W), jnp.float32),   # delta
            jax.ShapeDtypeStruct(
                (n_pslots * nU, H + 2 * h, W), jnp.float32),         # p ws
            jax.ShapeDtypeStruct((nU, H + 2 * h, W), jnp.float32),   # r ws
            jax.ShapeDtypeStruct((nU, H, W), jnp.float32),           # Ap ws
        )
        return pl.pallas_call(
            kernel,
            in_specs=[any_spec, any_spec, sspec, sspec, sspec],
            out_specs=(any_spec,) * 4,
            out_shape=out_shapes,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_hbm_limit_bytes("classic")),
            interpret=interpret,
        )

    # -- pipelined (one-barrier) variant -----------------------------------

    def _build_pipelined_kernel(self, interpret):
        """One-sweep-per-iteration pipelined PCG (Ghysels & Vanroose
        2014; the same recurrences as solver/core.pcg_pipelined) in the
        hat space, where M = I makes u=r, q=s, m=w and the
        preconditioner vanishes:

            gamma_i = <r_i, r_i>,  dd_i = <w_i, r_i>   (both accumulated
                                                        during sweep i-1)
            n = A_hat w_i                              (the only apply)
            z = n + beta z;   s = w + beta s;   p = r + beta p
            delta += alpha p; r -= alpha s;     w -= alpha z

        Classic PCG needs two reduction barriers per iteration (alpha
        after the apply sweep, beta after the update sweep), forcing at
        least two streamed passes; here BOTH dots depend only on the
        previous sweep's outputs, so ONE double-buffered pass per
        iteration reads [ins window | w window | stacked 5-vector state
        tile] and writes the updated state + the ping-ponged w (w needs
        an A/B slot pair: its halo rows are read by neighbouring tiles'
        apply windows in the same sweep).  The recurrences round
        differently from classic PCG; GN's outer correction absorbs it
        (tests pin cost parity at rtol 1e-4).

        LM mode (uses_lambda) adds, on the same one-barrier loop:
        the scs = S^2*ctc diagonal in the apply, per-sweep Q
        accumulation qd = <delta_new, r_new + b> (one extra b-tile
        read), the zeta = (i+1)(Q1-Q0)/Q1 < q_tol early exit, and the
        periodic exact residual REPLACEMENT r = b - A delta every
        residual_reset_period iterations (solverGPUGaussNewton.t's
        reset on the pipelined recurrences: Cools/Vanroose-style --
        replace r and w = A r exactly, let the p/s/z recurrences
        continue).  A reset costs three extra passes (delta -> haloed
        scratch; apply delta + replace r; apply r for w/dd), using the
        free w slot as scratch and flipping the slot parity so the
        recomputed w lands where the next sweep reads.

        Reference role: the hand-tuned large-grid CUDA solvers
        (examples/image_warping/src/, PatchSolverWarping.cu)."""
        T, h, H, W = self.tile, self.h, self.H, self.W
        un, cn, pn = self.unknown_names, self.const_names, self.param_names
        chans = self.chans
        tf = self.tfuncs
        n_tiles = self.n_tiles
        nU = sum(chans[n] for n in un)
        nC = sum(chans[n] for n in cn)
        lm = self.plan.config.uses_lambda
        nIn = 2 * nU + nC + (nU if lm else 0)
        WIN = T + 2 * h
        Z, S, Pp, D, R = 0, nU, 2 * nU, 3 * nU, 4 * nU
        B_sb = 5 * nU           # b tile rows in the state buffers (LM)
        NSB = 6 * nU if lm else 5 * nU

        ws_on = _WSTAGE

        def kernel(*refs):
            if lm:
                (ins_any, b_any, pref, ctl_i, ctl_f,
                 st_any, w_any, insw, ww, sb, insw2, ww2, sb2,
                 *rest) = refs
            else:
                (ins_any, b_any, pref, ctl_i,
                 st_any, w_any, insw, ww, sb, insw2, ww2, sb2,
                 *rest) = refs
                ctl_f = None
            if ws_on:
                wsA, wsB, wsemA, wsemB, sem, sem2 = rest
                wstg = ((wsA, wsemA), (wsB, wsemB))
            else:
                sem, sem2 = rest
                wstg = None
            params = {name: pref[k, 0] for k, name in enumerate(pn)}
            L = ctl_i[0, 0]
            if lm:
                period = ctl_i[1, 0]
                q_tol = ctl_f[0, 0]
            bufs = ((insw, ww, sb, sem), (insw2, ww2, sb2, sem2))

            def _sdiv(a, bb):
                return jnp.where(
                    bb != 0.0, a / jnp.where(bb != 0.0, bb, 1.0), 0.0)

            # ---- staging: r=b, z=s=p=delta=0, w slot0=[0|b|0] --------
            # (z/s/p must be ZEROED, not left as workspace garbage:
            # beta=0 at it=0 would still propagate NaN bit patterns)
            sb[pl.ds(0, nU)] = jnp.zeros((nU, T, W), jnp.float32)

            def stage(t, an):
                t0 = t * T
                cp = pltpu.make_async_copy(
                    b_any.at[:, pl.ds(t0, T)],
                    sb.at[pl.ds(nU, nU)], sem)
                cp.start(); cp.wait()
                v = sb[nU:2 * nU]
                an = an + jnp.sum(v * v)
                cps = [
                    pltpu.make_async_copy(
                        sb.at[pl.ds(nU, nU)],
                        st_any.at[pl.ds(R, nU), pl.ds(t0, T)], sem),
                    pltpu.make_async_copy(
                        sb.at[pl.ds(nU, nU)],
                        w_any.at[pl.ds(0, nU), pl.ds(t0 + h, T)], sem),
                ]
                for blk in (Z, S, Pp, D):
                    cps.append(pltpu.make_async_copy(
                        sb.at[pl.ds(0, nU)],
                        st_any.at[pl.ds(blk, nU), pl.ds(t0, T)], sem))
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()
                return an

            gamma0 = jax.lax.fori_loop(
                0, n_tiles, stage, jnp.float32(0.0))
            for off in (0, nU):        # zero halo rows of BOTH w slots
                for row0 in (0, H + h):
                    cp = pltpu.make_async_copy(
                        sb.at[pl.ds(0, nU), pl.ds(0, h)],
                        w_any.at[pl.ds(off, nU), pl.ds(row0, h)], sem)
                    cp.start(); cp.wait()

            # ---- the one sweep ---------------------------------------
            # mode: 'iter'    -- the per-iteration recurrence sweep
            #       'init'    -- w = A src (prologue w_0 = A b; LM reset
            #                    pass C recomputing w = A r); acc = dd
            #       'reset_r' -- LM reset pass B: src windows hold
            #                    delta, compute r = b - A delta, write
            #                    it to st R rows AND the dst w slot
            #                    (haloed scratch for pass C); acc =
            #                    (gamma, qd)
            def make_sweep(mode):
                is_init = mode == "init"
                stride = T if n_tiles % 2 else 2 * T

                def ws_cps(b, t0, dst_off):
                    """Write-stage DMA descriptors for tile t0 (started
                    in compute, waited one buffer-set cycle later and in
                    the sweep epilogue)."""
                    # Re-assert tile alignment: t0 arrives here as
                    # `loop_t0 - stride` captured through a lax.cond
                    # branch, which strips Mosaic's divisibility
                    # provenance and fails the memref_slice tiling
                    # proof ("tile index in dimension 1 is divisible
                    # by the tiling (8)") at compile time.
                    t0 = pl.multiple_of(t0, T)
                    wsx, wsm = wstg[b]
                    return [
                        pltpu.make_async_copy(
                            wsx.at[pl.ds(0, 5 * nU)],
                            st_any.at[:, pl.ds(t0, T)], wsm),
                        pltpu.make_async_copy(
                            wsx.at[pl.ds(5 * nU, nU)],
                            w_any.at[pl.ds(dst_off, nU),
                                     pl.ds(t0 + h, T)], wsm),
                    ]

                def ws_wait(b, t0, dst_off):
                    for cp in ws_cps(b, t0, dst_off):
                        cp.wait()

                def reads(b, t0, src_off):
                    iw, wwx, sbx, sm = bufs[b]
                    cps = [
                        pltpu.make_async_copy(
                            ins_any.at[:, pl.ds(t0, WIN)], iw, sm),
                        pltpu.make_async_copy(
                            w_any.at[pl.ds(src_off, nU),
                                     pl.ds(t0, WIN)], wwx, sm),
                    ]
                    if mode == "iter":
                        cps.append(pltpu.make_async_copy(
                            st_any.at[:, pl.ds(t0, T)],
                            sbx.at[pl.ds(0, 5 * nU)], sm))
                    if lm and mode in ("iter", "reset_r"):
                        cps.append(pltpu.make_async_copy(
                            b_any.at[:, pl.ds(t0, T)],
                            sbx.at[pl.ds(B_sb, nU)], sm))
                    return cps

                def start_reads(b, t0, src_off):
                    for cp in reads(b, t0, src_off):
                        cp.start()

                def wait_reads(b, t0, src_off):
                    for cp in reads(b, t0, src_off):
                        cp.wait()

                def compute(b, t0, dst_off, alpha, beta, acc):
                    if mode == "iter" and lm:
                        gam, ddd, qdd = acc
                    else:
                        gam, ddd = acc
                    iw, wwx, sbx, sm = bufs[b]
                    j = 0
                    x_win = {}
                    for n in un:
                        x_win[n] = [iw[j + c] for c in range(chans[n])]
                        j += chans[n]
                    imgs = {}
                    for n in cn:
                        imgs[n] = [iw[j + c] for c in range(chans[n])]
                        j += chans[n]
                    sq_win = [iw[j + k] for k in range(nU)]
                    scs_win = (
                        [iw[j + nU + k] for k in range(nU)]
                        if lm else None)
                    data_win = {"images": imgs, "params": params,
                                "graph_indices": {}}
                    wv = [wwx[k] for k in range(nU)]
                    k = 0
                    p_sc = {}
                    for n in un:
                        pwn = []
                        for c in range(chans[n]):
                            pwn.append(sq_win[k] * wv[k])
                            k += 1
                        p_sc[n] = pwn
                    tf.coord_offsets = (t0 - h, 0)
                    fn = lambda xx: tf.residuals_solve(xx, data_win)
                    _, jvp_fn = jax.linearize(fn, x_win)
                    jt_fn = jax.linear_transpose(jvp_fn, x_win)
                    (grad,) = jt_fn(jvp_fn(p_sc))
                    aps = []
                    k = 0
                    for n in un:
                        for c in range(chans[n]):
                            ap = (sq_win[k][h:h + T]
                                  * grad[n][c][h:h + T])
                            if lm:  # + scs diagonal (hat-space CtC)
                                ap = ap + (scs_win[k][h:h + T]
                                           * wv[k][h:h + T])
                            aps.append(ap)
                            k += 1
                    n_arr = jnp.stack(aps)                 # (nU, T, W)
                    wc = jnp.stack(
                        [wv[k][h:h + T] for k in range(nU)])
                    if is_init:
                        ddd = ddd + jnp.sum(n_arr * wc)
                        wwx[:, pl.ds(0, T)] = n_arr        # w_0 = A b
                        cp = pltpu.make_async_copy(
                            wwx.at[:, pl.ds(0, T)],
                            w_any.at[pl.ds(dst_off, nU),
                                     pl.ds(t0 + h, T)], sm)
                        cp.start(); cp.wait()
                        return gam, ddd
                    if mode == "reset_r":
                        # src windows held delta, n_arr = A delta;
                        # acc here is (gamma, qd)
                        bt = sbx[B_sb:B_sb + nU]
                        rv = bt - n_arr
                        gam = gam + jnp.sum(rv * rv)
                        ddd = ddd + jnp.sum(wc * (rv + bt))
                        wwx[:, pl.ds(0, T)] = rv
                        cps = [
                            pltpu.make_async_copy(
                                wwx.at[:, pl.ds(0, T)],
                                st_any.at[pl.ds(R, nU),
                                          pl.ds(t0, T)], sm),
                            pltpu.make_async_copy(
                                wwx.at[:, pl.ds(0, T)],
                                w_any.at[pl.ds(dst_off, nU),
                                         pl.ds(t0 + h, T)], sm),
                        ]
                        for cp in cps:
                            cp.start()
                        for cp in cps:
                            cp.wait()
                        return gam, ddd
                    zb = sbx[Z:Z + nU]
                    ss = sbx[S:S + nU]
                    pp = sbx[Pp:Pp + nU]
                    db = sbx[D:D + nU]
                    rr = sbx[R:R + nU]
                    z_new = n_arr + beta * zb
                    s_new = wc + beta * ss
                    p_new = rr + beta * pp
                    d_new = db + alpha * p_new
                    r_new = rr - alpha * s_new
                    w_new = wc - alpha * z_new
                    gam = gam + jnp.sum(r_new * r_new)
                    ddd = ddd + jnp.sum(w_new * r_new)
                    if lm:  # Q sequence: qd = <delta_new, r_new + b>
                        qdd = qdd + jnp.sum(
                            d_new * (r_new + sbx[B_sb:B_sb + nU]))
                    out_acc = (gam, ddd, qdd) if lm else (gam, ddd)
                    if ws_on:
                        # stage into dedicated buffers; this tile's
                        # write DMAs fly through the OTHER buffer set's
                        # compute and are waited on the next reuse of
                        # this stage (and in the sweep epilogue)
                        wsx, _wsm = wstg[b]
                        jax.lax.cond(
                            t0 >= stride,
                            lambda _: (ws_wait(b, t0 - stride, dst_off),
                                       0)[1],
                            lambda _: 0, None)
                        wsx[pl.ds(Z, nU)] = z_new
                        wsx[pl.ds(S, nU)] = s_new
                        wsx[pl.ds(Pp, nU)] = p_new
                        wsx[pl.ds(D, nU)] = d_new
                        wsx[pl.ds(R, nU)] = r_new
                        wsx[pl.ds(5 * nU, nU)] = w_new
                        for cp in ws_cps(b, t0, dst_off):
                            cp.start()
                        return out_acc
                    sbx[pl.ds(Z, nU)] = z_new
                    sbx[pl.ds(S, nU)] = s_new
                    sbx[pl.ds(Pp, nU)] = p_new
                    sbx[pl.ds(D, nU)] = d_new
                    sbx[pl.ds(R, nU)] = r_new
                    wwx[:, pl.ds(0, T)] = w_new
                    cps = [
                        pltpu.make_async_copy(
                            sbx.at[pl.ds(0, 5 * nU)],
                            st_any.at[:, pl.ds(t0, T)], sm),
                        pltpu.make_async_copy(
                            wwx.at[:, pl.ds(0, T)],
                            w_any.at[pl.ds(dst_off, nU),
                                     pl.ds(t0 + h, T)], sm),
                    ]
                    for cp in cps:
                        cp.start()
                    for cp in cps:
                        cp.wait()
                    return out_acc

                def sweep(src_off, dst_off, alpha, beta):
                    n_acc = 3 if (lm and mode == "iter") else 2
                    zero = (jnp.float32(0.0),) * n_acc
                    ws_drain = ws_on and mode == "iter"
                    if n_tiles % 2:
                        def tile(t, acc):
                            t0 = t * T
                            start_reads(0, t0, src_off)
                            wait_reads(0, t0, src_off)
                            return compute(
                                0, t0, dst_off, alpha, beta, acc)

                        acc = jax.lax.fori_loop(
                            0, n_tiles, tile, zero)
                        if ws_drain:
                            # drain the final tile's staged writes
                            ws_wait(0, (n_tiles - 1) * T, dst_off)
                        return acc

                    n_pairs = n_tiles // 2
                    start_reads(0, 0, src_off)

                    def pair(k2, acc):
                        tA = (2 * k2) * T
                        tB = (2 * k2 + 1) * T
                        start_reads(1, tB, src_off)
                        wait_reads(0, tA, src_off)
                        acc = compute(0, tA, dst_off, alpha, beta, acc)
                        nk = jnp.minimum(k2 + 1, n_pairs - 1)
                        start_reads(0, nk * (2 * T), src_off)
                        wait_reads(1, tB, src_off)
                        acc = compute(1, tB, dst_off, alpha, beta, acc)
                        return acc

                    acc = jax.lax.fori_loop(0, n_pairs, pair, zero)
                    wait_reads(0, (n_pairs - 1) * 2 * T, src_off)
                    if ws_drain:
                        # drain the last pair's staged writes before the
                        # next sweep's reads can touch those rows
                        ws_wait(0, (n_tiles - 2) * T, dst_off)
                        ws_wait(1, (n_tiles - 1) * T, dst_off)
                    return acc

                return sweep

            init_sweep = make_sweep("init")
            iter_sweep = make_sweep("iter")

            # prologue: w_0 = A_hat r_0 -> slot 1, dd_0 = <w_0, r_0>
            _, dd0 = init_sweep(0, nU, jnp.float32(0.0), jnp.float32(0.0))

            zero_f = jnp.float32(0.0)
            if not lm:
                def body(carry):
                    it, gamma, dd, gamma_prev, alpha_prev = carry
                    first = it == 0
                    beta = jnp.where(first, 0.0,
                                     _sdiv(gamma, gamma_prev))
                    denom = dd - beta * _sdiv(gamma, alpha_prev)
                    alpha = jnp.where(first, _sdiv(gamma, dd),
                                      _sdiv(gamma, denom))
                    src = nU * ((it + 1) % 2)
                    dst = nU * (it % 2)
                    g2, dd2 = iter_sweep(src, dst, alpha, beta)
                    return it + 1, g2, dd2, gamma, alpha

                jax.lax.while_loop(
                    lambda c: c[0] < L, body,
                    (jnp.int32(0), gamma0, dd0, zero_f,
                     jnp.float32(1.0)),
                )
                return

            reset_r_sweep = make_sweep("reset_r")

            def copy_delta(scr_off):
                """Reset pass A: stage delta (st D rows, no halo) into
                the free w slot, whose halo rows are still zero from
                the initial staging (all sweep writes touch only the
                t0+h center rows)."""
                def tile(t, _):
                    t0 = t * T
                    cp = pltpu.make_async_copy(
                        st_any.at[pl.ds(D, nU), pl.ds(t0, T)],
                        sb.at[pl.ds(0, nU)], sem)
                    cp.start(); cp.wait()
                    cp = pltpu.make_async_copy(
                        sb.at[pl.ds(0, nU)],
                        w_any.at[pl.ds(scr_off, nU),
                                 pl.ds(t0 + h, T)], sem)
                    cp.start(); cp.wait()
                    return 0

                jax.lax.fori_loop(0, n_tiles, tile, 0)

            def body(carry):
                (it, gamma, dd, gamma_prev, alpha_prev,
                 Q0, brk, flip) = carry
                first = it == 0
                beta = jnp.where(first, 0.0, _sdiv(gamma, gamma_prev))
                denom = dd - beta * _sdiv(gamma, alpha_prev)
                alpha = jnp.where(first, _sdiv(gamma, dd),
                                  _sdiv(gamma, denom))
                src = nU * ((it + 1 + flip) % 2)
                dst = nU * ((it + flip) % 2)
                g2, dd2, qd = iter_sweep(src, dst, alpha, beta)

                def reset_branch(_):
                    # exact residual replacement (Cools/Vanroose-style
                    # on the one-barrier recurrences; classic contract:
                    # solverGPUGaussNewton.t:2128-2139): r = b - A
                    # delta and w = A r recomputed exactly, p/s/z
                    # recurrences continue.  Slot dance: after the
                    # sweep, src is free -> stage delta there (A);
                    # apply it, replace r into st R AND dst's center
                    # rows as haloed scratch (B); apply dst, write the
                    # fresh w back into src (C) and FLIP the parity so
                    # the next sweep reads it from there.
                    copy_delta(src)
                    gr, qr = reset_r_sweep(src, dst, zero_f, zero_f)
                    _, ddr = init_sweep(dst, src, zero_f, zero_f)
                    return gr, ddr, qr, flip ^ 1

                do_reset = ((it + 1) % period) == 0
                g2, dd2, qd, flip = jax.lax.cond(
                    do_reset, reset_branch,
                    lambda _: (g2, dd2, qd, flip), None)
                Q1 = 0.5 * qd
                zeta = (it + 1).astype(jnp.float32) * _sdiv(
                    Q1 - Q0, Q1)
                brk = zeta < q_tol
                return (it + 1, g2, dd2, gamma, alpha, Q1, brk, flip)

            jax.lax.while_loop(
                lambda c: (c[0] < L) & (~c[6]), body,
                (jnp.int32(0), gamma0, dd0, zero_f, jnp.float32(1.0),
                 zero_f, jnp.asarray(False), jnp.int32(0)),
            )

        any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
        scratch = [
            pltpu.VMEM((nIn, WIN, W), jnp.float32),   # ins windows A
            pltpu.VMEM((nU, WIN, W), jnp.float32),    # w windows A
            pltpu.VMEM((NSB, T, W), jnp.float32),     # state [+b] tiles A
            pltpu.VMEM((nIn, WIN, W), jnp.float32),   # ins windows B
            pltpu.VMEM((nU, WIN, W), jnp.float32),    # w windows B
            pltpu.VMEM((NSB, T, W), jnp.float32),     # state [+b] tiles B
        ]
        if ws_on:
            scratch += [
                pltpu.VMEM((6 * nU, T, W), jnp.float32),  # write stage A
                pltpu.VMEM((6 * nU, T, W), jnp.float32),  # write stage B
                pltpu.SemaphoreType.DMA,                  # wsemA
                pltpu.SemaphoreType.DMA,                  # wsemB
            ]
        scratch += [
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
        out_shapes = (
            jax.ShapeDtypeStruct((5 * nU, H, W), jnp.float32),  # z|s|p|d|r
            jax.ShapeDtypeStruct((2 * nU, H + 2 * h, W),
                                 jnp.float32),                  # w A/B
        )
        return pl.pallas_call(
            kernel,
            in_specs=[any_spec, any_spec, sspec, sspec]
            + ([sspec] if lm else []),
            out_specs=(any_spec,) * 2,
            out_shape=out_shapes,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_hbm_limit_bytes("pipelined")),
            interpret=interpret,
        )

    def _pipelined_backend(self, interpret):
        """pcg_backend callable over the pipelined kernel (GN and LM)."""
        kern = self._build_pipelined_kernel(interpret)
        un, cn = self.unknown_names, self.const_names
        chans = self.chans
        h = self.h
        pn = self.param_names
        nU = sum(chans[n] for n in un)
        lm = self.plan.config.uses_lambda

        def pad_plane(a):
            return jnp.pad(a, ((h, h), (0, 0)))

        def planes(arr):
            return [arr[..., c] for c in range(arr.shape[-1])]

        def backend(x, data, sq, scs, b_hat, sp):
            stack = []
            for n in un:
                stack += [pad_plane(p) for p in planes(x[n])]
            for n in cn:
                stack += [pad_plane(p) for p in planes(data["images"][n])]
            for n in un:
                stack += [pad_plane(p) for p in planes(sq[n])]
            if lm:
                for n in un:
                    stack += [pad_plane(p) for p in planes(scs[n])]
            ins = jnp.stack(stack)
            b = jnp.stack([p for n in un for p in planes(b_hat[n])])
            pvals = jnp.stack(
                [jnp.asarray(data["params"][n], jnp.float32)
                 for n in pn]
            ).reshape(-1, 1) if pn else jnp.zeros((1, 1), jnp.float32)
            if lm:
                ctl_i = jnp.stack([
                    jnp.asarray(sp["lIterations"], jnp.int32),
                    jnp.asarray(sp["residual_reset_period"], jnp.int32),
                ]).reshape(2, 1)
                ctl_f = jnp.asarray(
                    sp["q_tolerance"], jnp.float32).reshape(1, 1)
                st, _ = kern(ins, b, pvals, ctl_i, ctl_f)
            else:
                ctl_i = jnp.asarray(
                    sp["lIterations"], jnp.int32).reshape(1, 1)
                st, _ = kern(ins, b, pvals, ctl_i)
            out = {}
            k = 0
            for n in un:
                c = chans[n]
                out[n] = jnp.stack(
                    [st[3 * nU + k + j] for j in range(c)], axis=-1)
                k += c
            return out

        return backend

    # -- SolverConfig.pcg_backend hook -------------------------------------

    def as_pcg_backend(self, interpret=None):
        """Callable for SolverConfig.pcg_backend: solver/core's step_fn
        delegates the inner PCG solve to the streamed kernel and keeps
        every outer-iteration decision (GN/LM trust region, costs).
        Dispatches to the pipelined one-sweep kernel (GN default;
        opt-in for LM) or the classic three-sweep kernel per
        self.variant."""
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        if self.variant == "pipelined":
            return self._pipelined_backend(interpret)
        kern = self._build_backend_kernel(interpret)
        un, cn = self.unknown_names, self.const_names
        chans = self.chans
        h, H = self.h, self.H
        pn = self.param_names
        lm = self.plan.config.uses_lambda

        def pad_plane(a):
            return jnp.pad(a, ((h, h), (0, 0)))

        def planes(arr):
            return [arr[..., c] for c in range(arr.shape[-1])]

        def backend(x, data, sq, scs, b_hat, sp):
            stack = []
            for n in un:
                stack += [pad_plane(p) for p in planes(x[n])]
            for n in cn:
                stack += [pad_plane(p) for p in planes(data["images"][n])]
            for n in un:
                stack += [pad_plane(p) for p in planes(sq[n])]
            if lm:
                for n in un:
                    stack += [pad_plane(p) for p in planes(scs[n])]
            ins = jnp.stack(stack)
            b = jnp.stack([p for n in un for p in planes(b_hat[n])])
            pvals = jnp.stack(
                [jnp.asarray(data["params"][n], jnp.float32)
                 for n in pn]
            ).reshape(-1, 1) if pn else jnp.zeros((1, 1), jnp.float32)
            ctl_i = jnp.stack([
                jnp.asarray(sp["lIterations"], jnp.int32),
                jnp.asarray(sp["residual_reset_period"], jnp.int32),
            ]).reshape(2, 1)
            ctl_f = jnp.asarray(
                sp["q_tolerance"], jnp.float32).reshape(1, 1)
            d_pad, _, _, _ = kern(ins, b, pvals, ctl_i, ctl_f)
            out = {}
            k = 0
            for n in un:
                c = chans[n]
                out[n] = jnp.stack(
                    [d_pad[k + j][h : H + h] for j in range(c)], axis=-1
                )
                k += c
            return out

        return backend

    # -- harness-compatible whole solve ------------------------------------

    def solve(self, inputs, interpret=None, donate_inputs=False):
        """Full solve through solver/core with the streamed inner loop
        (GN and LM).

        donate_inputs=True: the caller relinquishes any device arrays in
        `inputs` -- they are donated (consumed) without the defensive
        copy, saving their full footprint at HBM-capacity-bound sizes
        (8192^2 LM does NOT fit while a second input copy is held)."""
        from ..solver.core import SolverConfig, make_solver
        from .stream_outer import chunked_outer_enabled

        plan = self.plan
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        # Past the chunked-outer threshold the solve is HBM-capacity
        # bound (8192^2 LM: 20.8 GB un-donated peak vs 15.75 GB on v5e,
        # measured via compile memory_analysis); donating x+data lets
        # buffer assignment reuse their ~2 GB as temps and alias the x
        # output.  TPU only (CPU ignores donation with a warning).
        chunked = chunked_outer_enabled(plan)
        donate = (not interpret) and chunked
        # key must carry `chunked` separately: on CPU (interpret) donate
        # is always False, but the outer funcs still differ
        key = ("backend", interpret, donate, chunked)
        if key not in self._kern_cache:
            base = plan.config
            cfg = SolverConfig(
                uses_lambda=base.uses_lambda,
                guarded_invert_type=base.guarded_invert_type,
                jacobi_scaling=base.jacobi_scaling,
                pcg_variant="classic",
                pcg_backend=self.as_pcg_backend(interpret),
            )
            from .stream_outer import ChunkedOuterFuncs

            # past ~4096^2 the whole-grid OUTER step (cost/JtF/diag)
            # itself exceeds HBM; evaluate it in row strips instead
            # (ops/stream_outer.py -- measured: 8192^2 needs 33.4 GB
            # whole-grid vs 15.75 GB on v5e)
            funcs = ChunkedOuterFuncs(plan) if chunked else plan.funcs
            fns = make_solver(funcs, cfg)
            self._kern_cache[key] = jax.jit(
                fns[4], donate_argnums=(0, 1) if donate else ())
        full = self._kern_cache[key]
        if donate and not donate_inputs:
            # bind() no-copies device-array inputs; donation would
            # consume the caller's buffers, so break the aliasing first
            inputs = {
                k: (jnp.array(v, copy=True)
                    if isinstance(v, jax.Array) else v)
                for k, v in inputs.items()
            }
        x, data = plan.bind(inputs)
        sp = plan._sp_device()
        sp["nIterations"] = jnp.asarray(
            int(plan.solver_params["nIterations"]), jnp.int32)
        st = full(x, data, sp)
        return {"x": st["x"], "final_cost": float(st["prev_cost"])}
