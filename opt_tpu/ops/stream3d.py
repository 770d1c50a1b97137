"""Streamed HBM-state PCG engine for 3-D (volumetric) grids.

The 2-D engine (ops/stream_solver.StreamSolverHBM) tiles rows of a
(H, W) grid; its halo is a few W-rows, so halo traffic is negligible.
A 3-D grid tiled the same way (along D only) pays a halo of FULL
(H, W) planes per window: at 256^3 one channel-plane is 256 KB, so a
2*radius halo around a feasible tile more than doubles the streamed
traffic and the window set does not fit VMEM at any tile.  This engine
therefore tiles TWO axes:

    D  (array axis 0, Mosaic-UNTILED)   -> exact halo h_d = 2r, any
                                           tile size (no alignment)
    H  (array axis 1, sublane axis)     -> halo h_h = roundup(2r, 8),
                                           tile multiple of 8
    W  (array axis 2, lane axis)        -> whole rows, zero-padded
                                           to the next lane multiple

Windows are (T_d + 2h_d, T_h + 2h_h, W) channel planes; the evaluator
is the SAME traced ProblemFunctions machinery as the 2-D engine
(kernel_safe channel planes; bounds / Index at global coordinates via
coord_offsets = (d0 - h_d, r0 - h_h, 0)); validated against the
whole-grid jax.linearize/transpose apply in
examples/probe_3d_window2.py.

TWO PCG kernels share the tile grid and evaluator (_apply_tile):

* 'pipelined' (default while it fits HBM): the one-barrier Ghysels &
  Vanroose recurrence of StreamSolverHBM._build_pipelined_kernel --
  both reductions use the previous sweep's vectors, so each iteration
  is ONE double-buffered pass reading [ins window | w window | stacked
  5-vector state tile] and writing the updated state + the ping-ponged
  w (A/B slot pair: w halo rows are read by neighbouring tiles in the
  same sweep).  LM runs on the same one-barrier loop (scs diagonal in
  the apply, per-sweep Q accumulation, zeta exit, periodic exact
  residual replacement with slot-parity flip -- the 2-D pipelined-LM
  design), with the trust region in solver/core via the pcg_backend
  hook.
* 'classic' (the CAPACITY variant, auto-selected when the pipelined
  state no longer fits HBM): three sweeps per iteration (apply /
  update / p-update) with only 4 hat-space state fields and NO w
  ping-pong -- p windows read straight off the single haloed p buffer
  because p is never written during the apply sweep.  4 fewer
  whole-volume fields = ~5.4 GB at 384^3 for the 6-channel volumetric
  ARAP, which is exactly what the pipelined variant OOMed by
  (docs/ROUND3_TODO.md #13); it unlocks 384^3 at the cost of two extra
  reduction barriers per iteration.  PROVEN on hardware round 5: 8x100
  GN in 41.1 s, final cost 270.733 (docs/sweep_tpu_r5.csv), after the
  r5 HBM diet (per-array packing, b aliased into st, in-kernel delta
  descale, donate-every-solve -- see ROOFLINE.md "384^3 runs").

Same hat-space math as the 2-D engine: PCG runs on
A_hat = S (JtJ) S with S = sqrt(guarded_invert(diag JtJ)), excluded
unknowns get S = 0.  Reference role: the hand-written volumetric CUDA
solver (reference: examples/volumetric_mesh_deformation/src/).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compile.plan_fns import ProblemFunctions
from ..dsl.env import EnergyEnv
from ..dsl.spec import ProblemSpec
from .stream_solver import (
    LANE,
    SUBLANE,
    HBM_TEMP_PLANES_FACTOR,
    _has_sampled,
    _hbm_budget_bytes,
    _hbm_limit_bytes,
    _roundup,
    _stencil_radius_axis,
)

# whole-volume HBM gate: the engine keeps ins + w A/B + the 5-vector
# state + b in HBM (nIn + 8*nU channel fields) and solve()'s OUTER step
# (cost/JtF/diag) runs whole-grid on XLA through 128^3 -- its
# temporaries are modeled as ~12 extra f32 per unknown channel per
# voxel, but the MEASURED whole-volume limit is far tighter (192^3
# OOMed v5e with 78.5% allocator fragmentation), so past 128^3 the
# D-slab strip-mined outer (ops/stream_outer.py) engages and only the
# engine's HBM state counts.  OPT_TPU_HBM_GB overrides for other
# parts.
import os as _os

HBM_BYTES = int(
    float(_os.environ.get("OPT_TPU_HBM_GB", "15.75")) * 1024**3
)
OUTER_F32_PER_UNKNOWN_CHANNEL = 12

# auto-engine crossover (docs/sweep_tpu_r3.csv, v5e 8x100): the engine
# beats fused XLA at every measured volume -- GN 64^3 396.1 vs
# 472.2 ms (1.19x), 128^3 1477.6 vs 3950.3 ms (2.67x); LM 64^3 478.3
# vs 571.8 ms (1.20x), 128^3 1842.7 vs 4754.1 ms (2.58x).  Below 64^3
# is unmeasured (and small volumes are where XLA's VMEM-resident
# carries and the fixed relay dispatch favour the fused program, cf.
# the 2-D crossover), so auto routes GN and LM volumes >= 64^3 voxels
# here and leaves smaller ones on XLA.
AUTO_STREAM3D_MIN_VOXELS = 64 ** 3


def _n_res_channels(funcs):
    return sum(
        len(g.exprs) for g in funcs.groups if g.kind == "centered"
    )


def _estimate_vmem3d(plan, T_d, T_h, h_d, h_h, W, variant="pipelined"):
    funcs = plan.funcs
    lm = plan.config.uses_lambda
    nU = sum(s[-1] for s in funcs.unknown_shapes.values())
    nC = sum(
        im.channels for n, im in plan.spec.images.items()
        if not im.is_unknown and n not in funcs.aliases
    )
    nIn = 2 * nU + nC + (nU if lm else 0)   # x | consts | sqp [| scs]
    WIN_d, WIN_h = T_d + 2 * h_d, T_h + 2 * h_h
    win_elems = WIN_d * WIN_h * W
    windows = 2 * (nIn + nU) * win_elems * 4   # ins + w/p (A+B)
    if variant == "classic":
        # d|r|ap + p center [+ b] tiles (A+B)
        state = 2 * (5 if lm else 4) * nU * T_d * T_h * W * 4
    else:
        # z|s|p|d|r [+ b] tiles (A+B)
        state = 2 * (6 if lm else 5) * nU * T_d * T_h * W * 4
    temps = int(
        HBM_TEMP_PLANES_FACTOR * _n_res_channels(funcs) * win_elems * 4
    )
    return windows + state + temps


def _tile_search3d(plan, max_tile_d=None, max_tile_h=None,
                   variant="pipelined"):
    """Feasible (T_d, T_h) minimizing the halo traffic amplification
    (WIN_d/T_d)*(WIN_h/T_h) under the VMEM budget; ties break
    toward fewer tiles.  Returns (T_d, T_h) or None.  Both variants
    use the larger 'pipelined' VMEM budget key (their window sets are
    the same size; classic's state tiles are smaller)."""
    shape = next(iter(plan.spec.images.values())).ispace.shape
    if len(shape) != 3:
        return None
    D, H, W = shape
    Hp, Wp = _roundup(H, SUBLANE), _roundup(W, LANE)
    r_d = _stencil_radius_axis(plan.spec, 0)
    r_h = _stencil_radius_axis(plan.spec, 1)
    h_d = max(2 * r_d, 1)
    h_h = _roundup(max(2 * r_h, 1), SUBLANE)
    budget = _hbm_budget_bytes("pipelined")
    best = None
    for T_d in range(1, min(D, max_tile_d or 64) + 1):
        if D % T_d:
            continue
        for T_h in range(SUBLANE, min(Hp, max_tile_h or 256) + 1,
                         SUBLANE):
            if Hp % T_h or T_h < h_h:
                continue
            if _estimate_vmem3d(plan, T_d, T_h, h_d, h_h, Wp,
                                variant) > budget:
                continue
            amp = ((T_d + 2 * h_d) / T_d) * ((T_h + 2 * h_h) / T_h)
            n_tiles = (D // T_d) * (Hp // T_h)
            key = (amp, n_tiles)
            if best is None or key < best[0]:
                best = (key, (T_d, T_h))
    return best[1] if best else None


def _structural3d(plan):
    """Variant-independent eligibility: GN or LM, one 3-D f32 grid
    ispace, no graphs/SampledImage."""
    if plan.spec.graphs:
        return False
    if plan.funcs.dtype != jnp.float32:
        return False
    if not plan.spec.images:
        return False
    keys = {im.ispace.key() for im in plan.spec.images.values()}
    if len(keys) != 1:
        return False
    for g in plan.funcs.groups:
        if g.kind != "centered" or g.ispace.ndims != 3:
            return False
    return not _has_sampled(plan.spec)


def _hbm_fits3d(plan, variant):
    """HBM gate for one variant: the engine's resident field count per
    PADDED voxel (H pads to sublanes, W to lanes; zero-filled pads are
    masked by real_domain_mask) plus the whole-volume XLA outer step's
    modeled temporaries below the chunked-outer threshold."""
    D, H, W = next(iter(plan.spec.images.values())).ispace.shape
    Hp, Wp = _roundup(H, SUBLANE), _roundup(W, LANE)
    funcs = plan.funcs
    lm = plan.config.uses_lambda
    nU = sum(s[-1] for s in funcs.unknown_shapes.values())
    nC = sum(
        im.channels for n, im in plan.spec.images.items()
        if not im.is_unknown and n not in funcs.aliases
    )
    nIn = 2 * nU + nC + (nU if lm else 0)
    if variant == "classic":
        # ins + b + p (haloed) + st d|r|ap [+ the haloed reset scratch]
        f32_per_voxel = nIn + (6 if lm else 5) * nU
    else:
        # ins + b + w A/B (haloed) + st z|s|p|d|r
        f32_per_voxel = nIn + 8 * nU
    from .stream_outer import chunked_outer_enabled

    if not chunked_outer_enabled(plan):
        # whole-volume XLA outer step: model its evaluator temporaries;
        # past 128^3 the D-slab strip-mined outer (ops/stream_outer.py)
        # engages instead and only the engine's HBM state counts.
        # MEASURED (v5e, round 3): the whole-volume outer OOMs HBM at
        # 192^3 already -- XLA wants 19.21 GB of which 15.09 GB is
        # allocator FRAGMENTATION (unpadded temps only 3.09 GB; three
        # 756 MB copies of the stacked (21, D, H, W) residual field
        # dominate) -- so the auto threshold sits at the largest
        # measured-working size, not at this model's prediction
        f32_per_voxel += OUTER_F32_PER_UNKNOWN_CHANNEL * nU
    else:
        # at strip-mined-outer sizes the channel-last ORIGINALS (the
        # x and data-image arrays the user bound) stay resident at the
        # XLA level alongside the kernel's stacked+haloed copies: data
        # images live for the whole solve, x/delta/sq planes overlap
        # the kernel state during each outer step.  Without this
        # charge the model called 384^3 pipelined feasible at 13.9 GB
        # against a measured compile OOM (18.71 of 15.75 GB with the
        # old padded-duplicate outer; 16.74 after, still over).
        f32_per_voxel += nU + nC
    return D * Hp * Wp * 4 * f32_per_voxel <= 0.9 * HBM_BYTES


def _pick_variant3d(plan):
    """'pipelined' (one barrier/iter, measured fastest) while its 8
    hat-space state fields fit HBM; 'classic' (three sweeps/iter, 4
    state fields, no w ping-pong) past that -- the capacity variant
    that unlocks 384^3 (pipelined OOMed at compile: 18.71 GB wanted of
    15.75, docs/ROUND3_TODO.md #13; classic measured 41.1 s for 8x100
    GN at 384^3, docs/sweep_tpu_r5.csv).  OPT_TPU_STREAM3D_VARIANT
    overrides."""
    env = _os.environ.get("OPT_TPU_STREAM3D_VARIANT")
    if env in ("pipelined", "classic"):
        return env
    if _hbm_fits3d(plan, "pipelined"):
        return "pipelined"
    if _hbm_fits3d(plan, "classic"):
        return "classic"
    return None


def _eligible3d(plan, variant=None):
    if not _structural3d(plan):
        return False
    if variant is None:
        return _pick_variant3d(plan) is not None
    return _hbm_fits3d(plan, variant)


def supports3d(plan, max_tile_d=None, max_tile_h=None):
    """Eligibility: structural + an HBM-fitting variant plus a feasible
    tile pair under the VMEM budget."""
    if not _structural3d(plan):
        return False
    variant = _pick_variant3d(plan)
    return (variant is not None
            and _tile_search3d(plan, max_tile_d, max_tile_h,
                               variant) is not None)


class StreamSolver3D:
    """Two-axis-tiled streamed HBM-state pipelined PCG for 3-D grids."""

    def __init__(self, plan, tile_d=None, tile_h=None, variant=None):
        if variant is None:
            variant = _pick_variant3d(plan) if _structural3d(plan) else None
        if variant is None or not _eligible3d(plan, variant):
            raise ValueError(
                "plan not eligible for the 3-D streamed engine (needs "
                "GN or LM, one 3-D f32 grid ispace, no graphs/"
                "SampledImage, volume under the HBM gate for the "
                "pipelined or classic variant)"
            )
        pick = _tile_search3d(plan, tile_d, tile_h, variant)
        if pick is None:
            raise ValueError(
                "no feasible (T_d, T_h) tile pair under the VMEM budget"
            )
        self.plan = plan
        self.variant = variant
        funcs = plan.funcs
        D, H, W = next(iter(plan.spec.images.values())).ispace.shape
        self.D, self.H, self.W = D, H, W
        # hardware-aligned padded extents: H pads to sublanes, W to
        # lanes; pads are zero-filled and residuals on them masked by
        # real_domain_mask (real_shapes below keeps TRUE global sizes)
        self.Hp = _roundup(H, SUBLANE)
        self.Wp = _roundup(W, LANE)
        self.tile_d, self.tile_h = pick
        self.h_d = max(2 * _stencil_radius_axis(plan.spec, 0), 1)
        self.h_h = _roundup(
            max(2 * _stencil_radius_axis(plan.spec, 1), 1), SUBLANE
        )
        self.n_td = D // self.tile_d
        self.n_th = self.Hp // self.tile_h
        self.n_tiles = self.n_td * self.n_th

        # tile-window ProblemFunctions: window dims (WIN_d, WIN_h, Wp)
        # with GLOBAL real shapes so bounds/Index use global coords
        WIN_d = self.tile_d + 2 * self.h_d
        WIN_h = self.tile_h + 2 * self.h_h
        dims_ext = list(plan.dims)        # [W, H, D] declared order
        dims_ext[0] = self.Wp
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
        self._kern_cache = {}

    # -- shared tile apply ---------------------------------------------------

    def _apply_tile(self, iw, wv, params, d0, r0):
        """A_hat apply on ONE tile: from an ins window `iw` (VMEM ref,
        (nIn, WIN_d, WIN_h, W) channel planes [x | consts | sq | scs])
        and a source window plane list `wv` (nU of (WIN_d, WIN_h, W)),
        compute the hat-space JtJ [+ scs] application on the tile CENTER
        and return (n_arr, wc): the (nU, T_d, T_h, W) result and the
        cropped source center.  Shared by the pipelined and classic
        kernels (the evaluator machinery is identical; only the PCG
        recurrence differs)."""
        un, cn = self.unknown_names, self.const_names
        chans = self.chans
        tf = self.tfuncs
        h_d, h_h = self.h_d, self.h_h
        T_d, T_h = self.tile_d, self.tile_h
        lm = self.plan.config.uses_lambda
        nU = sum(chans[n] for n in un)
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
        scs_win = [iw[j + nU + k] for k in range(nU)] if lm else None
        data_win = {"images": imgs, "params": params,
                    "graph_indices": {}}
        k = 0
        p_sc = {}
        for n in un:
            pwn = []
            for c in range(chans[n]):
                pwn.append(sq_win[k] * wv[k])
                k += 1
            p_sc[n] = pwn
        tf.coord_offsets = (d0 - h_d, r0 - h_h, 0)
        fn = lambda xx: tf.residuals_solve(xx, data_win)
        _, jvp_fn = jax.linearize(fn, x_win)
        jt_fn = jax.linear_transpose(jvp_fn, x_win)
        (grad,) = jt_fn(jvp_fn(p_sc))
        aps = []
        k = 0
        for n in un:
            for c in range(chans[n]):
                ap = (
                    sq_win[k][h_d:h_d + T_d, h_h:h_h + T_h]
                    * grad[n][c][h_d:h_d + T_d, h_h:h_h + T_h])
                if lm:  # + scs diagonal (hat-space CtC)
                    ap = ap + (
                        scs_win[k][h_d:h_d + T_d, h_h:h_h + T_h]
                        * wv[k][h_d:h_d + T_d, h_h:h_h + T_h])
                aps.append(ap)
                k += 1
        n_arr = jnp.stack(aps)              # (nU, T_d, T_h, W)
        wc = jnp.stack(
            [wv[k][h_d:h_d + T_d, h_h:h_h + T_h] for k in range(nU)])
        return n_arr, wc

    # -- the pipelined kernel ----------------------------------------------

    def _build_pipelined_kernel(self, interpret):
        """Pipelined PCG over the (n_td x n_th) tile grid; see the
        module docstring.  w arrives as a ZERO-INITIALIZED input aliased
        to its output workspace (its edge halos must read 0 and staging
        only writes tile centers -- the 2-D kernel zero-fills halo rows
        in-kernel instead, which for 3-D would need full-plane fills).

        LM (uses_lambda) mirrors the 2-D pipelined-LM kernel
        (stream_solver._build_pipelined_kernel): the scs = S^2*ctc
        diagonal joins the apply, Q accumulates per sweep from an extra
        b tile, zeta = (i+1)(Q1-Q0)/Q1 < q_tol exits early, and the
        periodic exact residual REPLACEMENT (r = b - A delta, w = A r)
        runs as three extra passes with a slot-parity flip."""
        T_d, T_h = self.tile_d, self.tile_h
        h_d, h_h = self.h_d, self.h_h
        D, H, W = self.D, self.Hp, self.Wp   # kernel works on PADDED extents
        un, cn, pn = self.unknown_names, self.const_names, self.param_names
        chans = self.chans
        tf = self.tfuncs
        n_th = self.n_th
        n_tiles = self.n_tiles
        nU = sum(chans[n] for n in un)
        nC = sum(chans[n] for n in cn)
        lm = self.plan.config.uses_lambda
        nIn = 2 * nU + nC + (nU if lm else 0)
        # HBM ins arrive SPLIT: per-iteration dyn planes (x | sq [| scs])
        # and the loop-invariant const planes (hoisted by pcg_prepare);
        # the VMEM window keeps the [x | consts | sq | scs] layout
        # _apply_tile expects, refilled by two/three DMAs per tile
        nDyn = (3 if lm else 2) * nU
        WIN_d, WIN_h = T_d + 2 * h_d, T_h + 2 * h_h
        Z, S, Pp, Dd, R = 0, nU, 2 * nU, 3 * nU, 4 * nU
        B_sb = 5 * nU           # b tile rows in the state buffers (LM)
        NSB = 6 * nU if lm else 5 * nU

        def coords(t):
            """Flat tile index -> (d0, r0) in UNPADDED grid coords; r0
            carries a sublane-divisibility proof (multiply by the
            literal T_h; Mosaic cannot recover it through // or %)."""
            td = t // n_th
            th = t % n_th
            return td * T_d, pl.multiple_of(th * T_h, SUBLANE)

        def kernel(*refs):
            rl = list(refs)
            ins_any = rl.pop(0)
            cins_any = rl.pop(0) if nC else None
            if lm:
                (b_any, w_in, pref, ctl_i, ctl_f,
                 st_any, w_any, insw, ww, sb, insw2, ww2, sb2,
                 sem, sem2) = rl
            else:
                (b_any, w_in, pref, ctl_i,
                 st_any, w_any, insw, ww, sb, insw2, ww2, sb2,
                 sem, sem2) = rl
                ctl_f = None
            del w_in  # aliased to w_any
            params = {name: pref[k, 0] for k, name in enumerate(pn)}
            L = ctl_i[0, 0]
            if lm:
                period = ctl_i[1, 0]
                q_tol = ctl_f[0, 0]
            bufs = ((insw, ww, sb, sem), (insw2, ww2, sb2, sem2))

            def _sdiv(a, bb):
                return jnp.where(
                    bb != 0.0, a / jnp.where(bb != 0.0, bb, 1.0), 0.0)

            # ---- staging: r=b, z=s=p=delta=0, w slot0 center=b -------
            sb[pl.ds(0, nU)] = jnp.zeros((nU, T_d, T_h, W), jnp.float32)

            def stage(t, an):
                d0, r0 = coords(t)
                cp = pltpu.make_async_copy(
                    b_any.at[:, pl.ds(d0, T_d), pl.ds(r0, T_h)],
                    sb.at[pl.ds(nU, nU)], sem)
                cp.start(); cp.wait()
                v = sb[nU:2 * nU]
                an = an + jnp.sum(v * v)
                cps = [
                    pltpu.make_async_copy(
                        sb.at[pl.ds(nU, nU)],
                        st_any.at[pl.ds(R, nU), pl.ds(d0, T_d),
                                  pl.ds(r0, T_h)], sem),
                    pltpu.make_async_copy(
                        sb.at[pl.ds(nU, nU)],
                        w_any.at[pl.ds(0, nU), pl.ds(d0 + h_d, T_d),
                                 pl.ds(r0 + h_h, T_h)], sem),
                ]
                for blk in (Z, S, Pp, Dd):
                    cps.append(pltpu.make_async_copy(
                        sb.at[pl.ds(0, nU)],
                        st_any.at[pl.ds(blk, nU), pl.ds(d0, T_d),
                                  pl.ds(r0, T_h)], sem))
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()
                return an

            gamma0 = jax.lax.fori_loop(
                0, n_tiles, stage, jnp.float32(0.0))

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

                def reads(b, d0, r0, src_off):
                    iw, wwx, sbx, sm = bufs[b]
                    cps = [
                        pltpu.make_async_copy(
                            ins_any.at[pl.ds(0, nU), pl.ds(d0, WIN_d),
                                       pl.ds(r0, WIN_h)],
                            iw.at[pl.ds(0, nU)], sm),
                        pltpu.make_async_copy(
                            ins_any.at[pl.ds(nU, nDyn - nU),
                                       pl.ds(d0, WIN_d),
                                       pl.ds(r0, WIN_h)],
                            iw.at[pl.ds(nU + nC, nDyn - nU)], sm),
                        pltpu.make_async_copy(
                            w_any.at[pl.ds(src_off, nU),
                                     pl.ds(d0, WIN_d),
                                     pl.ds(r0, WIN_h)], wwx, sm),
                    ]
                    if nC:
                        cps.append(pltpu.make_async_copy(
                            cins_any.at[:, pl.ds(d0, WIN_d),
                                        pl.ds(r0, WIN_h)],
                            iw.at[pl.ds(nU, nC)], sm))
                    if mode == "iter":
                        cps.append(pltpu.make_async_copy(
                            st_any.at[:, pl.ds(d0, T_d), pl.ds(r0, T_h)],
                            sbx.at[pl.ds(0, 5 * nU)], sm))
                    if lm and mode in ("iter", "reset_r"):
                        cps.append(pltpu.make_async_copy(
                            b_any.at[:, pl.ds(d0, T_d), pl.ds(r0, T_h)],
                            sbx.at[pl.ds(B_sb, nU)], sm))
                    return cps

                def start_reads(b, d0, r0, src_off):
                    for cp in reads(b, d0, r0, src_off):
                        cp.start()

                def wait_reads(b, d0, r0, src_off):
                    for cp in reads(b, d0, r0, src_off):
                        cp.wait()

                def compute(b, d0, r0, dst_off, alpha, beta, acc):
                    if mode == "iter" and lm:
                        gam, ddd, qdd = acc
                    else:
                        gam, ddd = acc
                    iw, wwx, sbx, sm = bufs[b]
                    wv = [wwx[k] for k in range(nU)]
                    n_arr, wc = self._apply_tile(iw, wv, params, d0, r0)
                    if is_init:
                        ddd = ddd + jnp.sum(n_arr * wc)
                        wwx[:, pl.ds(0, T_d), pl.ds(0, T_h)] = n_arr
                        cp = pltpu.make_async_copy(
                            wwx.at[:, pl.ds(0, T_d), pl.ds(0, T_h)],
                            w_any.at[pl.ds(dst_off, nU),
                                     pl.ds(d0 + h_d, T_d),
                                     pl.ds(r0 + h_h, T_h)], sm)
                        cp.start(); cp.wait()
                        return gam, ddd
                    if mode == "reset_r":
                        # src windows held delta, n_arr = A delta;
                        # acc here is (gamma, qd)
                        bt = sbx[B_sb:B_sb + nU]
                        rv = bt - n_arr
                        gam = gam + jnp.sum(rv * rv)
                        ddd = ddd + jnp.sum(wc * (rv + bt))
                        wwx[:, pl.ds(0, T_d), pl.ds(0, T_h)] = rv
                        cps = [
                            pltpu.make_async_copy(
                                wwx.at[:, pl.ds(0, T_d), pl.ds(0, T_h)],
                                st_any.at[pl.ds(R, nU), pl.ds(d0, T_d),
                                          pl.ds(r0, T_h)], sm),
                            pltpu.make_async_copy(
                                wwx.at[:, pl.ds(0, T_d), pl.ds(0, T_h)],
                                w_any.at[pl.ds(dst_off, nU),
                                         pl.ds(d0 + h_d, T_d),
                                         pl.ds(r0 + h_h, T_h)], sm),
                        ]
                        for cp in cps:
                            cp.start()
                        for cp in cps:
                            cp.wait()
                        return gam, ddd
                    zb = sbx[Z:Z + nU]
                    ss = sbx[S:S + nU]
                    pp = sbx[Pp:Pp + nU]
                    db = sbx[Dd:Dd + nU]
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
                    sbx[pl.ds(Z, nU)] = z_new
                    sbx[pl.ds(S, nU)] = s_new
                    sbx[pl.ds(Pp, nU)] = p_new
                    sbx[pl.ds(Dd, nU)] = d_new
                    sbx[pl.ds(R, nU)] = r_new
                    wwx[:, pl.ds(0, T_d), pl.ds(0, T_h)] = w_new
                    cps = [
                        pltpu.make_async_copy(
                            sbx.at[pl.ds(0, 5 * nU)],
                            st_any.at[:, pl.ds(d0, T_d), pl.ds(r0, T_h)],
                            sm),
                        pltpu.make_async_copy(
                            wwx.at[:, pl.ds(0, T_d), pl.ds(0, T_h)],
                            w_any.at[pl.ds(dst_off, nU),
                                     pl.ds(d0 + h_d, T_d),
                                     pl.ds(r0 + h_h, T_h)], sm),
                    ]
                    for cp in cps:
                        cp.start()
                    for cp in cps:
                        cp.wait()
                    return out_acc

                def sweep(src_off, dst_off, alpha, beta):
                    n_acc = 3 if (lm and mode == "iter") else 2
                    zero = (jnp.float32(0.0),) * n_acc
                    if n_tiles % 2:
                        def tile(t, acc):
                            d0, r0 = coords(t)
                            start_reads(0, d0, r0, src_off)
                            wait_reads(0, d0, r0, src_off)
                            return compute(
                                0, d0, r0, dst_off, alpha, beta, acc)

                        return jax.lax.fori_loop(0, n_tiles, tile, zero)

                    n_pairs = n_tiles // 2
                    start_reads(0, *coords(0), src_off)

                    def pair(k2, acc):
                        dA, rA = coords(2 * k2)
                        dB, rB = coords(2 * k2 + 1)
                        start_reads(1, dB, rB, src_off)
                        wait_reads(0, dA, rA, src_off)
                        acc = compute(
                            0, dA, rA, dst_off, alpha, beta, acc)
                        nk = jnp.minimum(k2 + 1, n_pairs - 1)
                        start_reads(0, *coords(nk * 2), src_off)
                        wait_reads(1, dB, rB, src_off)
                        acc = compute(
                            1, dB, rB, dst_off, alpha, beta, acc)
                        return acc

                    acc = jax.lax.fori_loop(0, n_pairs, pair, zero)
                    wait_reads(0, *coords((n_pairs - 1) * 2), src_off)
                    return acc

                return sweep

            init_sweep = make_sweep("init")
            iter_sweep = make_sweep("iter")

            # final descale d *= sq at tile centers (see the classic
            # kernel's descale: lets the caller never touch ins/sq
            # after the kernel)
            def descale():
                def tile(t, _):
                    d0, r0 = coords(t)
                    cps = [
                        pltpu.make_async_copy(
                            st_any.at[pl.ds(Dd, nU), pl.ds(d0, T_d),
                                      pl.ds(r0, T_h)],
                            sb.at[pl.ds(0, nU)], sem),
                        pltpu.make_async_copy(
                            ins_any.at[pl.ds(nU, nU),
                                       pl.ds(d0 + h_d, T_d),
                                       pl.ds(r0 + h_h, T_h)],
                            sb.at[pl.ds(nU, nU)], sem),
                    ]
                    for cp in cps:
                        cp.start()
                    for cp in cps:
                        cp.wait()
                    sb[pl.ds(0, nU)] = sb[0:nU] * sb[nU:2 * nU]
                    cp = pltpu.make_async_copy(
                        sb.at[pl.ds(0, nU)],
                        st_any.at[pl.ds(Dd, nU), pl.ds(d0, T_d),
                                  pl.ds(r0, T_h)], sem)
                    cp.start(); cp.wait()
                    return 0

                jax.lax.fori_loop(0, n_tiles, tile, 0)

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
                descale()
                return

            reset_r_sweep = make_sweep("reset_r")

            def copy_delta(scr_off):
                """Reset pass A: stage delta (st Dd rows, no halo) into
                the free w slot, whose halo region is still zero from
                the zero-initialized input (all sweep writes touch only
                tile centers)."""
                def tile(t, _):
                    d0, r0 = coords(t)
                    cp = pltpu.make_async_copy(
                        st_any.at[pl.ds(Dd, nU), pl.ds(d0, T_d),
                                  pl.ds(r0, T_h)],
                        sb.at[pl.ds(0, nU)], sem)
                    cp.start(); cp.wait()
                    cp = pltpu.make_async_copy(
                        sb.at[pl.ds(0, nU)],
                        w_any.at[pl.ds(scr_off, nU),
                                 pl.ds(d0 + h_d, T_d),
                                 pl.ds(r0 + h_h, T_h)], sem)
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
                    # exact residual replacement (the 2-D pipelined-LM
                    # slot dance, stream_solver.py; classic contract:
                    # solverGPUGaussNewton.t:2128-2139): after the
                    # sweep src is free -> stage delta there (A); apply
                    # it, replace r into st R AND dst's center rows as
                    # haloed scratch (B); apply dst, write the fresh
                    # w back into src (C) and FLIP the parity so the
                    # next sweep reads it from there.
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
            descale()

        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
        scratch = [
            pltpu.VMEM((nIn, WIN_d, WIN_h, W), jnp.float32),  # ins A
            pltpu.VMEM((nU, WIN_d, WIN_h, W), jnp.float32),   # w A
            pltpu.VMEM((NSB, T_d, T_h, W), jnp.float32),      # state A
            pltpu.VMEM((nIn, WIN_d, WIN_h, W), jnp.float32),  # ins B
            pltpu.VMEM((nU, WIN_d, WIN_h, W), jnp.float32),   # w B
            pltpu.VMEM((NSB, T_d, T_h, W), jnp.float32),      # state B
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
        out_shapes = (
            jax.ShapeDtypeStruct((5 * nU, D, H, W), jnp.float32),
            jax.ShapeDtypeStruct(
                (2 * nU, D + 2 * h_d, H + 2 * h_h, W), jnp.float32),
        )
        return pl.pallas_call(
            kernel,
            in_specs=[any_spec] + ([any_spec] if nC else [])
            + [any_spec, any_spec, sspec, sspec]
            + ([sspec] if lm else []),
            out_specs=(any_spec,) * 2,
            out_shape=out_shapes,
            # w_in -> w workspace (index shifts when the const-plane
            # input is present)
            input_output_aliases={(3 if nC else 2): 1},
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_hbm_limit_bytes("pipelined")),
            interpret=interpret,
        )

    # -- the classic (capacity) kernel ---------------------------------------

    def _build_classic_kernel(self, interpret):
        """Classic three-sweep PCG over the tile grid -- the CAPACITY
        variant: 4 hat-space state fields (delta | r | ap in one
        unhaloed st buffer, plus ONE haloed p) instead of the pipelined
        kernel's 8 (z|s|p|d|r + the w A/B ping-pong), saving
        4 fields x nU channels x D*Hp*Wp*4 B -- ~5.4 GB at 384^3 for the
        6-channel volumetric ARAP, which is what the pipelined variant
        OOMed by (18.71 GB wanted of 15.75, docs/ROUND3_TODO.md #13).

        Per iteration (the recurrence of parallel/stream_shard._shard_pcg
        classic / solver/core's XLA loop):
          sweep A: ap = A_hat p per tile (evaluator apply on p windows
                   read straight off the single haloed p buffer -- no
                   ping-pong: p is never written during the sweep),
                   den = sum(p.ap)
          sweep B: delta += alpha p, r -= alpha ap, bn = sum(r.r)
                   (LM also qd = sum(delta.(r+b)))
          sweep C: p = r + beta p        (beta needs the full bn)
        LM adds the Q/zeta exit and the periodic exact residual
        replacement r = b - A delta (solverGPUGaussNewton.t:713-719,
        :738-813, :2128-2139): delta stages into a dedicated zero-edged
        haloed scratch, one apply pass recomputes r/bn/qd; p is NOT
        recomputed (beta then p = r + beta p_old, exactly the classic
        loop's reset semantics)."""
        T_d, T_h = self.tile_d, self.tile_h
        h_d, h_h = self.h_d, self.h_h
        D, H, W = self.D, self.Hp, self.Wp   # kernel works on PADDED extents
        un, cn, pn = self.unknown_names, self.const_names, self.param_names
        chans = self.chans
        n_th = self.n_th
        n_tiles = self.n_tiles
        nU = sum(chans[n] for n in un)
        nC = sum(chans[n] for n in cn)
        lm = self.plan.config.uses_lambda
        nIn = 2 * nU + nC + (nU if lm else 0)
        # split HBM ins (dyn x|sq[|scs] + hoisted const planes), same
        # contract as the pipelined kernel
        nDyn = (3 if lm else 2) * nU
        WIN_d, WIN_h = T_d + 2 * h_d, T_h + 2 * h_h
        # st_any blocks and sb (VMEM state-tile) slots
        Dd, R, AP = 0, nU, 2 * nU
        P_s, B_s = 3 * nU, 4 * nU
        NSB = 5 * nU if lm else 4 * nU

        def coords(t):
            td = t // n_th
            th = t % n_th
            return td * T_d, pl.multiple_of(th * T_h, SUBLANE)

        def kernel(*refs):
            rl = list(refs)
            ins_any = rl.pop(0)
            cins_any = rl.pop(0) if nC else None
            if lm:
                (b_any, p_in, scr_in, pref, ctl_i, ctl_f,
                 st_any, p_any, scr_any,
                 insw, pw, sb, insw2, pw2, sb2, sem, sem2) = rl
            else:
                # GN: no separate b input -- b arrives pre-placed in
                # the aliased st input's R rows (zeros | b | zeros)
                (st_in, p_in, pref, ctl_i,
                 st_any, p_any,
                 insw, pw, sb, insw2, pw2, sb2, sem, sem2) = rl
                ctl_f = scr_any = b_any = None
                del st_in  # aliased to st_any
            del p_in  # aliased to p_any
            params = {name: pref[k, 0] for k, name in enumerate(pn)}
            L = ctl_i[0, 0]
            if lm:
                del scr_in  # aliased to scr_any
                period = ctl_i[1, 0]
                q_tol = ctl_f[0, 0]
            bufs = ((insw, pw, sb, sem), (insw2, pw2, sb2, sem2))

            def _sdiv(a, bb):
                return jnp.where(
                    bb != 0.0, a / jnp.where(bb != 0.0, bb, 1.0), 0.0)

            def pair_loop(reads, compute, zero):
                """Double-buffered tile sweep: reads(b, d0, r0) builds
                the copy set, compute(b, d0, r0, acc) consumes buffer b
                (same A/B overlap structure as the pipelined sweep)."""
                def start_reads(b, d0, r0):
                    for cp in reads(b, d0, r0):
                        cp.start()

                def wait_reads(b, d0, r0):
                    for cp in reads(b, d0, r0):
                        cp.wait()

                if n_tiles % 2:
                    def tile(t, acc):
                        d0, r0 = coords(t)
                        start_reads(0, d0, r0)
                        wait_reads(0, d0, r0)
                        return compute(0, d0, r0, acc)

                    return jax.lax.fori_loop(0, n_tiles, tile, zero)

                n_pairs = n_tiles // 2
                start_reads(0, *coords(0))

                def pair(k2, acc):
                    dA, rA = coords(2 * k2)
                    dB, rB = coords(2 * k2 + 1)
                    start_reads(1, dB, rB)
                    wait_reads(0, dA, rA)
                    acc = compute(0, dA, rA, acc)
                    nk = jnp.minimum(k2 + 1, n_pairs - 1)
                    start_reads(0, *coords(nk * 2))
                    wait_reads(1, dB, rB)
                    acc = compute(1, dB, rB, acc)
                    return acc

                acc = jax.lax.fori_loop(0, n_pairs, pair, zero)
                wait_reads(0, *coords((n_pairs - 1) * 2))
                return acc

            # ---- staging: p center = b, st D = 0, R = b; an0 = <b,b> --
            if lm:
                sb[pl.ds(0, nU)] = jnp.zeros(
                    (nU, T_d, T_h, W), jnp.float32)

                def stage(t, an):
                    d0, r0 = coords(t)
                    cp = pltpu.make_async_copy(
                        b_any.at[:, pl.ds(d0, T_d), pl.ds(r0, T_h)],
                        sb.at[pl.ds(R, nU)], sem)
                    cp.start(); cp.wait()
                    v = sb[R:R + nU]
                    an = an + jnp.sum(v * v)
                    cps = [
                        pltpu.make_async_copy(
                            sb.at[pl.ds(R, nU)],
                            st_any.at[pl.ds(R, nU), pl.ds(d0, T_d),
                                      pl.ds(r0, T_h)], sem),
                        pltpu.make_async_copy(
                            sb.at[pl.ds(R, nU)],
                            p_any.at[:, pl.ds(d0 + h_d, T_d),
                                     pl.ds(r0 + h_h, T_h)], sem),
                        pltpu.make_async_copy(
                            sb.at[pl.ds(0, nU)],
                            st_any.at[pl.ds(Dd, nU), pl.ds(d0, T_d),
                                      pl.ds(r0, T_h)], sem),
                        # AP rows zeroed too: sweep A overwrites them,
                        # but uninitialized output rows would leak
                        # garbage if L == 0
                        pltpu.make_async_copy(
                            sb.at[pl.ds(0, nU)],
                            st_any.at[pl.ds(AP, nU), pl.ds(d0, T_d),
                                      pl.ds(r0, T_h)], sem),
                    ]
                    for cp in cps:
                        cp.start()
                    for cp in cps:
                        cp.wait()
                    return an
            else:
                # GN: d/ap rows arrive pre-zeroed and r rows = b via
                # the aliased st input -- stage only seeds the p
                # workspace centers and accumulates an0 = <b, b>
                def stage(t, an):
                    d0, r0 = coords(t)
                    cp = pltpu.make_async_copy(
                        st_any.at[pl.ds(R, nU), pl.ds(d0, T_d),
                                  pl.ds(r0, T_h)],
                        sb.at[pl.ds(R, nU)], sem)
                    cp.start(); cp.wait()
                    v = sb[R:R + nU]
                    an = an + jnp.sum(v * v)
                    cp = pltpu.make_async_copy(
                        sb.at[pl.ds(R, nU)],
                        p_any.at[:, pl.ds(d0 + h_d, T_d),
                                 pl.ds(r0 + h_h, T_h)], sem)
                    cp.start(); cp.wait()
                    return an

            an0 = jax.lax.fori_loop(0, n_tiles, stage, jnp.float32(0.0))

            # ---- sweep A: ap = A_hat src, den = <src, ap> -------------
            # src_any: p_any normally; the LM reset re-runs it on the
            # delta-staged scratch
            def make_apply_sweep(src_any):
                def reads(b, d0, r0):
                    iw, pwx, sbx, sm = bufs[b]
                    cps = [
                        pltpu.make_async_copy(
                            ins_any.at[pl.ds(0, nU), pl.ds(d0, WIN_d),
                                       pl.ds(r0, WIN_h)],
                            iw.at[pl.ds(0, nU)], sm),
                        pltpu.make_async_copy(
                            ins_any.at[pl.ds(nU, nDyn - nU),
                                       pl.ds(d0, WIN_d),
                                       pl.ds(r0, WIN_h)],
                            iw.at[pl.ds(nU + nC, nDyn - nU)], sm),
                        pltpu.make_async_copy(
                            src_any.at[:, pl.ds(d0, WIN_d),
                                       pl.ds(r0, WIN_h)], pwx, sm),
                    ]
                    if nC:
                        cps.append(pltpu.make_async_copy(
                            cins_any.at[:, pl.ds(d0, WIN_d),
                                        pl.ds(r0, WIN_h)],
                            iw.at[pl.ds(nU, nC)], sm))
                    return cps

                def compute(b, d0, r0, den):
                    iw, pwx, sbx, sm = bufs[b]
                    wv = [pwx[k] for k in range(nU)]
                    n_arr, pc = self._apply_tile(iw, wv, params, d0, r0)
                    den = den + jnp.sum(n_arr * pc)
                    sbx[pl.ds(AP, nU)] = n_arr
                    cp = pltpu.make_async_copy(
                        sbx.at[pl.ds(AP, nU)],
                        st_any.at[pl.ds(AP, nU), pl.ds(d0, T_d),
                                  pl.ds(r0, T_h)], sm)
                    cp.start(); cp.wait()
                    return den

                return lambda: pair_loop(reads, compute,
                                         jnp.float32(0.0))

            apply_sweep = make_apply_sweep(p_any)

            # ---- sweep B: delta += alpha p, r -= alpha ap -------------
            def update_sweep(alpha):
                def reads(b, d0, r0):
                    iw, pwx, sbx, sm = bufs[b]
                    cps = [
                        pltpu.make_async_copy(
                            st_any.at[:, pl.ds(d0, T_d), pl.ds(r0, T_h)],
                            sbx.at[pl.ds(0, 3 * nU)], sm),
                        pltpu.make_async_copy(
                            p_any.at[:, pl.ds(d0 + h_d, T_d),
                                     pl.ds(r0 + h_h, T_h)],
                            sbx.at[pl.ds(P_s, nU)], sm),
                    ]
                    if lm:
                        cps.append(pltpu.make_async_copy(
                            b_any.at[:, pl.ds(d0, T_d), pl.ds(r0, T_h)],
                            sbx.at[pl.ds(B_s, nU)], sm))
                    return cps

                def compute(b, d0, r0, acc):
                    iw, pwx, sbx, sm = bufs[b]
                    d_new = sbx[Dd:Dd + nU] + alpha * sbx[P_s:P_s + nU]
                    r_new = sbx[R:R + nU] - alpha * sbx[AP:AP + nU]
                    if lm:
                        bn, qd = acc
                        qd = qd + jnp.sum(
                            d_new * (r_new + sbx[B_s:B_s + nU]))
                    else:
                        (bn,) = acc
                    bn = bn + jnp.sum(r_new * r_new)
                    sbx[pl.ds(Dd, nU)] = d_new
                    sbx[pl.ds(R, nU)] = r_new
                    cp = pltpu.make_async_copy(
                        sbx.at[pl.ds(0, 2 * nU)],
                        st_any.at[pl.ds(0, 2 * nU), pl.ds(d0, T_d),
                                  pl.ds(r0, T_h)], sm)
                    cp.start(); cp.wait()
                    return (bn, qd) if lm else (bn,)

                zero = ((jnp.float32(0.0),) * 2 if lm
                        else (jnp.float32(0.0),))
                return pair_loop(reads, compute, zero)

            # ---- sweep C: p = r + beta * p ----------------------------
            def p_sweep(beta):
                def reads(b, d0, r0):
                    iw, pwx, sbx, sm = bufs[b]
                    return [
                        pltpu.make_async_copy(
                            st_any.at[pl.ds(R, nU), pl.ds(d0, T_d),
                                      pl.ds(r0, T_h)],
                            sbx.at[pl.ds(R, nU)], sm),
                        pltpu.make_async_copy(
                            p_any.at[:, pl.ds(d0 + h_d, T_d),
                                     pl.ds(r0 + h_h, T_h)],
                            sbx.at[pl.ds(P_s, nU)], sm),
                    ]

                def compute(b, d0, r0, acc):
                    iw, pwx, sbx, sm = bufs[b]
                    p_new = (sbx[R:R + nU]
                             + beta * sbx[P_s:P_s + nU])
                    sbx[pl.ds(P_s, nU)] = p_new
                    cp = pltpu.make_async_copy(
                        sbx.at[pl.ds(P_s, nU)],
                        p_any.at[:, pl.ds(d0 + h_d, T_d),
                                 pl.ds(r0 + h_h, T_h)], sm)
                    cp.start(); cp.wait()
                    return acc

                return pair_loop(reads, compute, (jnp.float32(0.0),))

            # ---- final descale: d *= sq (tile centers) ----------------
            # delta leaves the kernel already un-scaled (delta = sq *
            # d_hat), so the caller never touches ins/sq again after the
            # kernel -- post-kernel sq slices materialized six 216 MB
            # planes at 384^3 and kept ins alive past the kernel (the r5
            # probe's residual OOM driver)
            def descale():
                def tile(t, _):
                    d0, r0 = coords(t)
                    cps = [
                        pltpu.make_async_copy(
                            st_any.at[pl.ds(Dd, nU), pl.ds(d0, T_d),
                                      pl.ds(r0, T_h)],
                            sb.at[pl.ds(0, nU)], sem),
                        pltpu.make_async_copy(
                            ins_any.at[pl.ds(nU, nU),
                                       pl.ds(d0 + h_d, T_d),
                                       pl.ds(r0 + h_h, T_h)],
                            sb.at[pl.ds(R, nU)], sem),
                    ]
                    for cp in cps:
                        cp.start()
                    for cp in cps:
                        cp.wait()
                    sb[pl.ds(0, nU)] = sb[0:nU] * sb[R:R + nU]
                    cp = pltpu.make_async_copy(
                        sb.at[pl.ds(0, nU)],
                        st_any.at[pl.ds(Dd, nU), pl.ds(d0, T_d),
                                  pl.ds(r0, T_h)], sem)
                    cp.start(); cp.wait()
                    return 0

                jax.lax.fori_loop(0, n_tiles, tile, 0)

            if not lm:
                def body(carry):
                    it, an = carry
                    den = apply_sweep()
                    alpha = _sdiv(an, den)
                    (bn,) = update_sweep(alpha)
                    beta = _sdiv(bn, an)
                    p_sweep(beta)
                    return it + 1, bn

                jax.lax.while_loop(
                    lambda c: c[0] < L, body, (jnp.int32(0), an0))
                descale()
                return

            # ---- LM: Q/zeta exit + periodic exact residual reset ------
            reset_apply = make_apply_sweep(scr_any)

            def copy_delta():
                """Stage delta (st Dd rows) into the scratch's centers;
                its halo edges stay zero from the zero-initialized
                aliased input (sweeps only ever write tile centers)."""
                def tile(t, _):
                    d0, r0 = coords(t)
                    cp = pltpu.make_async_copy(
                        st_any.at[pl.ds(Dd, nU), pl.ds(d0, T_d),
                                  pl.ds(r0, T_h)],
                        sb.at[pl.ds(0, nU)], sem)
                    cp.start(); cp.wait()
                    cp = pltpu.make_async_copy(
                        sb.at[pl.ds(0, nU)],
                        scr_any.at[:, pl.ds(d0 + h_d, T_d),
                                   pl.ds(r0 + h_h, T_h)], sem)
                    cp.start(); cp.wait()
                    return 0

                jax.lax.fori_loop(0, n_tiles, tile, 0)

            def reset_replace():
                """r = b - A delta per tile (the apply already ran into
                st AP rows via reset_apply); recompute bn and qd from
                the replaced r."""
                def reads(b, d0, r0):
                    iw, pwx, sbx, sm = bufs[b]
                    return [
                        pltpu.make_async_copy(
                            st_any.at[:, pl.ds(d0, T_d), pl.ds(r0, T_h)],
                            sbx.at[pl.ds(0, 3 * nU)], sm),
                        pltpu.make_async_copy(
                            b_any.at[:, pl.ds(d0, T_d), pl.ds(r0, T_h)],
                            sbx.at[pl.ds(B_s, nU)], sm),
                    ]

                def compute(b, d0, r0, acc):
                    iw, pwx, sbx, sm = bufs[b]
                    bn, qd = acc
                    bt = sbx[B_s:B_s + nU]
                    r_new = bt - sbx[AP:AP + nU]   # AP holds A delta
                    bn = bn + jnp.sum(r_new * r_new)
                    qd = qd + jnp.sum(sbx[Dd:Dd + nU] * (r_new + bt))
                    sbx[pl.ds(R, nU)] = r_new
                    cp = pltpu.make_async_copy(
                        sbx.at[pl.ds(R, nU)],
                        st_any.at[pl.ds(R, nU), pl.ds(d0, T_d),
                                  pl.ds(r0, T_h)], sm)
                    cp.start(); cp.wait()
                    return bn, qd

                return pair_loop(
                    reads, compute,
                    (jnp.float32(0.0), jnp.float32(0.0)))

            zero_f = jnp.float32(0.0)

            def body(carry):
                it, an, Q0, brk = carry
                den = apply_sweep()
                alpha = _sdiv(an, den)
                bn, qd = update_sweep(alpha)

                def reset_branch(_):
                    # exact residual replacement (classic contract,
                    # solverGPUGaussNewton.t:2128-2139): delta -> scr,
                    # A delta -> st AP rows, r = b - A delta; p is NOT
                    # recomputed (p = r + beta p_old below)
                    copy_delta()
                    reset_apply()
                    return reset_replace()

                do_reset = ((it + 1) % period) == 0
                bn, qd = jax.lax.cond(
                    do_reset, reset_branch, lambda _: (bn, qd), None)
                beta = _sdiv(bn, an)
                p_sweep(beta)
                Q1 = 0.5 * qd
                zeta = (it + 1).astype(jnp.float32) * _sdiv(Q1 - Q0, Q1)
                return it + 1, bn, Q1, zeta < q_tol

            jax.lax.while_loop(
                lambda c: (c[0] < L) & (~c[3]), body,
                (jnp.int32(0), an0, zero_f, jnp.asarray(False)))
            descale()

        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
        scratch = [
            pltpu.VMEM((nIn, WIN_d, WIN_h, W), jnp.float32),  # ins A
            pltpu.VMEM((nU, WIN_d, WIN_h, W), jnp.float32),   # p win A
            pltpu.VMEM((NSB, T_d, T_h, W), jnp.float32),      # state A
            pltpu.VMEM((nIn, WIN_d, WIN_h, W), jnp.float32),  # ins B
            pltpu.VMEM((nU, WIN_d, WIN_h, W), jnp.float32),   # p win B
            pltpu.VMEM((NSB, T_d, T_h, W), jnp.float32),      # state B
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
        haloed = jax.ShapeDtypeStruct(
            (nU, D + 2 * h_d, H + 2 * h_h, W), jnp.float32)
        out_shapes = (
            jax.ShapeDtypeStruct((3 * nU, D, H, W), jnp.float32),
            haloed,                                 # p workspace
        ) + ((haloed,) if lm else ())               # LM reset scratch
        ci = 1 if nC else 0      # const-plane input shifts indices
        aliases = {2 + ci: 1}                       # p_in -> p_any
        if lm:
            aliases[3 + ci] = 2                     # scr_in -> scr_any
        else:
            aliases[1 + ci] = 0                     # st_in -> st_any
        return pl.pallas_call(
            kernel,
            in_specs=[any_spec] + ([any_spec] if nC else [])
            + [any_spec, any_spec]
            + ([any_spec] if lm else [])
            + [sspec, sspec]
            + ([sspec] if lm else []),
            out_specs=(any_spec,) * (3 if lm else 2),
            out_shape=out_shapes,
            input_output_aliases=aliases,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_hbm_limit_bytes("pipelined")),
            interpret=interpret,
        )

    # -- SolverConfig.pcg_backend hook --------------------------------------

    def as_pcg_backend(self, interpret=None):
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        classic = self.variant == "classic"
        kern = (self._build_classic_kernel(interpret) if classic
                else self._build_pipelined_kernel(interpret))
        un, cn = self.unknown_names, self.const_names
        chans = self.chans
        h_d, h_h = self.h_d, self.h_h
        pn = self.param_names
        nU = sum(chans[n] for n in un)
        D, H, W = self.D, self.H, self.W
        Hp, Wp = self.Hp, self.Wp
        # delta lives in st rows [3nU:4nU] (pipelined: z|s|p|d|r) or
        # [0:nU] (classic: d|r|ap)
        d_off = 0 if classic else 3 * nU

        pack = self._pad_haloed_stack

        def pack_hw(a):
            # (D, H, W, C) -> (C, D, Hp, Wp): alignment pads only
            return jnp.pad(jnp.moveaxis(a, -1, 0),
                           ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W)))

        lm = self.plan.config.uses_lambda

        # loop-invariant const-image planes (SolverConfig.pcg_prepare):
        # keeping them out of the per-iteration ins stack shrank the
        # largest HLO temp from 4.0 GB to 2.7 GB at 384^3 and removed
        # the per-body const relayout copies (the compile-OOM driver:
        # 47.5% fragmentation, 17.37 of 15.75 GB measured)
        prepare = self.as_pcg_prepare()

        def backend(x, data, sq, scs, b_hat, sp, prepared=None):
            # one moveaxis+pad per ARRAY, not one squeeze+pad per
            # channel: the per-channel path materialized twelve 216 MB
            # single-plane temps at 384^3 (measured in the r5 compile
            # probe: 17.37 of 15.75 GB, 52.2% fragmentation OOM)
            parts = [pack(x[n]) for n in un] + [pack(sq[n]) for n in un]
            if lm:
                parts += [pack(scs[n]) for n in un]
            ins = jnp.concatenate(parts, axis=0)
            cins = prepared if prepared is not None else prepare(data)
            cargs = [cins] if cins is not None else []
            # b_hat = sq * b fused into the pack (takes_raw_b): the
            # multiply joins the concat/pad fusion instead of
            # materializing a standalone whole-volume b_hat pytree
            b = jnp.concatenate(
                [pack_hw(sq[n] * b_hat[n]) for n in un], axis=0)
            w0 = jnp.zeros(
                ((1 if classic else 2) * nU,
                 D + 2 * h_d, Hp + 2 * h_h, Wp), jnp.float32)
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
                if classic:
                    st = kern(ins, *cargs, b, w0, jnp.zeros_like(w0),
                              pvals, ctl_i, ctl_f)[0]
                else:
                    st, _ = kern(ins, *cargs, b, w0, pvals, ctl_i,
                                 ctl_f)
            else:
                ctl_i = jnp.asarray(
                    sp["lIterations"], jnp.int32).reshape(1, 1)
                if classic:
                    # GN classic: b rides INSIDE the aliased st input
                    # (zeros | b | zeros = the d | r | ap init) -- the
                    # kernel reads r0 = b in place, so no separate b
                    # buffer exists (1.27 GB at 384^3, r5 HBM diet)
                    st0 = jnp.pad(b, ((nU, nU),) + ((0, 0),) * 3)
                    st, _ = kern(ins, *cargs, st0, w0, pvals, ctl_i)
                else:
                    st, _ = kern(ins, *cargs, b, w0, pvals, ctl_i)
            # st d rows already hold delta = sq * d_hat (the kernels'
            # final descale sweep reads sq off their own ins rows), so
            # the standalone sq pytree dies before the kernel launches
            # AND ins dies at kernel end -- no post-kernel sq slices
            # (six 216 MB planes at 384^3; see solver/core's
            # returns_delta branch)
            out = {}
            k = 0
            for n in un:
                c = chans[n]
                out[n] = jnp.moveaxis(
                    st[d_off + k:d_off + k + c, :, :H, :W], 0, -1)
                k += c
            return out

        backend.returns_delta = True
        backend.takes_raw_b = True
        return backend

    def _pad_haloed_stack(self, a):
        """(D, H, W, C) -> (C, D+2h_d, Hp+2h_h, Wp): window halo on
        (D, H) plus hardware alignment pads, one transpose + one pad
        per ARRAY.  Shared by as_pcg_backend (dyn planes) and
        as_pcg_prepare (const planes): the two stacks MUST pad
        identically for the per-tile DMAs to read matching voxels."""
        return jnp.pad(jnp.moveaxis(a, -1, 0),
                       ((0, 0), (self.h_d, self.h_d),
                        (self.h_h, self.h_h + self.Hp - self.H),
                        (0, self.Wp - self.W)))

    def as_pcg_prepare(self):
        """SolverConfig.pcg_prepare companion to as_pcg_backend: the
        loop-invariant const-plane stack, materialized once per solve
        outside the outer while loop."""
        cn = self.const_names
        pack = self._pad_haloed_stack

        def prepare(data):
            if not cn:
                return None
            return jnp.concatenate(
                [pack(data["images"][n]) for n in cn], axis=0)

        return prepare

    # -- harness-compatible whole solve --------------------------------------

    def solve(self, inputs, interpret=None, donate_inputs=False):
        """Full solve (GN or LM) through solver/core with the streamed
        3-D inner loop; the outer step (cost/JtF/diag/trust region)
        runs whole-grid on XLA through 128^3 and strip-mines over
        D-slabs past that (ops/stream_outer.py -- the whole-volume
        evaluation measured OOM at 192^3 on v5e, 78.5% fragmentation;
        same trap as 8192^2).

        At chunked-outer volumes x+data are DONATED into the jitted
        solve (the 8192^2-LM capacity treatment, see
        stream_solver.StreamSolverHBM.solve); donate_inputs=True skips
        the defensive device-copy when the caller relinquishes their
        device arrays."""
        from ..solver.core import SolverConfig, make_solver
        from .stream_outer import chunked_outer_enabled

        plan = self.plan
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        chunked = chunked_outer_enabled(plan)
        donate = (not interpret) and chunked
        # `chunked` in the key: on CPU (interpret) donate is always
        # False but the outer funcs still differ
        key = ("backend", interpret, donate, chunked)
        if key not in self._kern_cache:
            base = plan.config
            cfg = SolverConfig(
                uses_lambda=base.uses_lambda,
                guarded_invert_type=base.guarded_invert_type,
                jacobi_scaling=base.jacobi_scaling,
                pcg_variant="classic",
                pcg_backend=self.as_pcg_backend(interpret),
                pcg_prepare=self.as_pcg_prepare(),
            )
            from .stream_outer import ChunkedOuterFuncs

            funcs = ChunkedOuterFuncs(plan) if chunked else plan.funcs
            fns = make_solver(funcs, cfg)
            self._kern_cache[key] = jax.jit(
                fns[4], donate_argnums=(0, 1) if donate else ())
        full = self._kern_cache[key]
        if donate and not donate_inputs:
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
