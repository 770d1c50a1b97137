"""Whole-solve-in-VMEM Pallas execution of the generic solver.

Generalizes the hand-written poisson kernel (opt_tpu/ops/poisson_pallas.py)
to ANY centered (grid) energy: the complete Gauss-Newton or
Levenberg-Marquardt solve -- residual evaluation, linearization,
diag(J^T J), the PCG loop, and the outer iterations -- runs inside ONE
Pallas kernel with every image and work vector resident in VMEM.  The HBM
cost of the entire solve is one read of the inputs and one write of the
results; there is no HBM traffic between iterations.

This works because the solver stack is pure jnp/lax: the kernel body loads
the refs into values and calls the same `full_solve_fn` the jitted XLA
path uses (opt_tpu/solver/core.py), so numerics match up to float
reassociation.  It is the TPU analogue of the reference's block/patch
solvers (PatchSolverWarping.cu) taken to the limit: one v5e core's ~16 MB
VMEM holds entire golden-size problems.

Mosaic requires lane/sublane-aligned shapes for in-kernel shifts, so the
problem is embedded in a padded grid (W -> multiple of 128, H -> multiple
of 8).  Padded cells are excluded unknowns with zeroed residual rows and
REAL-domain bounds semantics (ProblemFunctions.real_shapes), so results
equal the unpadded solve exactly.

Restrictions (callers should check `supports(plan)`):
 * centered (grid) energies with >= 2 spatial dims;
 * estimated VMEM footprint under budget.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compile.plan_fns import ProblemFunctions
from ..dsl.env import EnergyEnv
from ..dsl.spec import ProblemSpec
from ..solver.core import make_solver

# Mosaic stack-allocates evaluator temporaries (residual fields, tangent
# planes, transpose scratch) beyond the counted image/work-vector buffers.
# estimate_vmem_bytes models them as TEMP_PLANES_FACTOR live planes per
# residual channel on the residual index space.  Calibration datapoints
# (v5e, PADDED estimates as supports() computes them):
# - under Mosaic's DEFAULT 16 MB scoped-vmem ceiling (rounds 1-4, the
#   old 14 MB budget): image_warping fits at 192^2 (est 12.4 MB) and
#   OOMs at 256^2 (17.3 MB) -- factor 4 classifies both correctly;
# - round 5, with vmem_limit_bytes raised to VMEM_LIMIT_BYTES:
#   image_warping 256^2 (est 16.5 MB) AND the 512^2 flagship (est
#   66 MB) both compile and run, each 1.4x FASTER than the fused XLA
#   solve at the reference config (examples/probe_vmem512.py,
#   docs/sweep_tpu_r5.csv) -- the first engine to beat XLA at the
#   512^2 headline (VMEM-residency for the whole solve: one HBM read
#   in, one write out).
# - round 5 again: intrinsic_image_decomposition 512^2 (est 107.0 MB,
#   the largest estimate probed) compiles and runs 2.29x over XLA
#   (examples/probe_vmem_more.py) -- the un-modeled stack slack at the
#   112 MB limit is under 5 MB, so the budget keeps only that margin.
# An over-optimistic admit costs one wasted compile attempt, not a
# crash: Plan.solve's auto route falls back to the XLA program when
# the kernel build fails (runtime/api.py).
VMEM_BUDGET_BYTES = 108 * 1024 * 1024
TEMP_PLANES_FACTOR = 4

# auto-engine crossover (runtime/api.Plan._pick_engine): route GN f32
# grids >= this to the vmem engine on TPU -- 256^2 measured 2.21x and
# the 512^2 flagship 1.92x over fused XLA (docs/sweep_tpu_r5.csv);
# below 256^2 the win is unmeasured and XLA's dispatch is already sub-
# 40 ms, so auto stays conservative.
AUTO_VMEM_MIN_PIXELS = 256 * 256

# Mosaic's 16 MB scoped-vmem ceiling is only the DEFAULT; the streamed
# engines verified 64 MB (graph kernel) and 112 MB (StreamSolverHBM
# T=32 at 8192^2) compiling and running on v5e (CLAUDE.md Pallas
# constraints).  The kernel requests this limit so the budget above can
# be raised past 16 MB; OPT_TPU_VMEM_BUDGET_MB overrides the budget for
# calibration probes (examples/probe_vmem512.py).
VMEM_LIMIT_BYTES = 112 * 1024 * 1024


def _budget_bytes():
    import os

    env = os.environ.get("OPT_TPU_VMEM_BUDGET_MB")
    if env:
        return int(float(env) * 1024 * 1024)
    return VMEM_BUDGET_BYTES


def _roundup(v, m):
    return ((v + m - 1) // m) * m


def _padded_dim_sizes(spec, dims_positional):
    """dim index -> padded size: lanes (ispace dims[0]) to 128, sublanes
    (dims[1]) to 8."""
    out = dict(enumerate(dims_positional))
    for im in spec.images.values():
        ds = im.ispace.dims
        if len(ds) >= 2:
            out[ds[0].index] = _roundup(out[ds[0].index], 128)
            out[ds[1].index] = _roundup(out[ds[1].index], 8)
    return out


def estimate_vmem_bytes(funcs, uses_lambda=True):
    """Images + work vectors (GN: x,delta,r,p,pre,Ap; LM adds ssq,b),
    plus a model of Mosaic's stack-allocated evaluator temporaries:
    TEMP_PLANES_FACTOR live planes per residual channel on its index
    space (see the calibration note at VMEM_BUDGET_BYTES)."""
    img_elems = 0
    for im in funcs.spec.images.values():
        if im.name in funcs.aliases:
            continue
        img_elems += math.prod(im.ispace.shape) * im.channels
    unk_elems = sum(math.prod(s) for s in funcs.unknown_shapes.values())
    n_vec = 8 if uses_lambda else 6
    temp_elems = 0
    for g in funcs.groups:
        if g.kind == "centered":
            temp_elems += (
                TEMP_PLANES_FACTOR
                * len(g.exprs)
                * math.prod(g.ispace.shape)
            )
    itemsize = jnp.dtype(funcs.dtype).itemsize
    return itemsize * (img_elems + n_vec * unk_elems + temp_elems)


def supports(plan):
    funcs = plan.funcs
    if funcs.spec.graphs:
        return False
    for g in funcs.groups:
        if g.kind != "centered" or g.ispace.ndims < 2:
            return False
    # SampledImage reads at dynamic coordinates: Mosaic has no dynamic
    # gather, so the kernel cannot compile (the auto-route fallback
    # would catch it, but only after a wasted compile attempt)
    from ..dsl import expr as E

    found = [False]

    def _chk(a):
        if isinstance(a, E.SampledAccess):
            found[0] = True

    for exp in funcs.spec.terms:
        E.visit(exp, _chk)
    if found[0]:
        return False
    # budget estimated on padded sizes
    padded = _padded_dim_sizes(plan.spec, list(plan.dims))
    scale = 1.0
    for d in plan.spec.dims.values():
        if padded[d.index] != d.size:
            scale *= padded[d.index] / d.size
    est = estimate_vmem_bytes(funcs, plan.config.uses_lambda) * scale
    if est > _budget_bytes():
        return False
    return True


class VmemSolver:
    """Run a plan's whole solve inside one Pallas kernel."""

    def __init__(self, plan):
        assert supports(plan), "problem not eligible for the VMEM solver"
        self.plan = plan
        dims = list(plan.dims)
        padded = _padded_dim_sizes(plan.spec, dims)
        self.padded_dims = [padded[i] for i in range(len(dims))]

        # re-run the energy on the padded dims; attach real-shape info
        spec = ProblemSpec()
        env = EnergyEnv(spec, self.padded_dims)
        from ..runtime.api import _run_energy

        _run_energy(plan.problem.energy, env)
        real_shapes = {}
        for im in plan.spec.images.values():
            real_shapes[im.ispace.key()] = im.ispace.shape
        pf = ProblemFunctions(spec, plan.funcs.dtype,
                              real_shapes=real_shapes, kernel_safe=True)
        self.funcs = pf
        (_, _, _, _, self.full_solve_fn) = make_solver(pf, plan.config)

        self.unknown_names = sorted(pf.unknown_shapes)
        self.const_names = sorted(
            n for n, im in pf.spec.images.items()
            if not im.is_unknown and n not in pf.aliases
        )
        self.param_names = sorted(pf.spec.params)
        self.sp_float_names = sorted(
            k for k in plan.solver_params
            if k not in ("nIterations", "lIterations",
                         "residual_reset_period")
        )
        self._compiled = {}

    # -- kernel ----------------------------------------------------------------

    def _build(self, n_outer, n_lin, reset_period, interpret):
        pf = self.funcs
        un, cn, pn = self.unknown_names, self.const_names, self.param_names
        spn = self.sp_float_names
        full_solve = self.full_solve_fn

        # channel-plane representation: one (spatial) ref per channel
        # (Mosaic cannot slice non-zero channels from channel-last arrays)
        def chans_of(name):
            im = pf.spec.images[name]
            return im.channels, im.ispace.shape

        def kernel(*refs):
            i = 0
            x = {}
            for name in un:
                c, _ = chans_of(name)
                x[name] = [refs[i + k][...] for k in range(c)]
                i += c
            images = {}
            for name in cn:
                c, _ = chans_of(name)
                images[name] = [refs[i + k][...] for k in range(c)]
                i += c
            pref = refs[i]; i += 1
            params = {name: pref[k, 0] for k, name in enumerate(pn)}
            spref = refs[i]; i += 1
            sp = {name: spref[k, 0] for k, name in enumerate(spn)}
            sp["nIterations"] = jnp.int32(n_outer)
            sp["lIterations"] = jnp.int32(n_lin)
            sp["residual_reset_period"] = jnp.int32(reset_period)
            data = {"images": images, "params": params,
                    "graph_indices": {}}

            st = full_solve(x, data, sp)

            outs = refs[i:]
            k = 0
            for name in un:
                c, _ = chans_of(name)
                for ch in range(c):
                    outs[k][...] = st["x"][name][ch]
                    k += 1
            outs[k][0, 0] = st["prev_cost"]

        vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
        n_in = sum(chans_of(n)[0] for n in un + cn)
        out_shapes = []
        for name in un:
            c, spatial = chans_of(name)
            out_shapes += [
                jax.ShapeDtypeStruct(spatial, pf.dtype)
            ] * c
        n_out_planes = len(out_shapes)
        out_shapes.append(jax.ShapeDtypeStruct((1, 1), pf.dtype))

        return pl.pallas_call(
            kernel,
            in_specs=[vspec] * n_in + [sspec, sspec],
            out_specs=tuple([vspec] * n_out_planes + [sspec]),
            out_shape=tuple(out_shapes),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT_BYTES),
            interpret=interpret,
        )

    # -- host API ----------------------------------------------------------------

    def _pad(self, name, arr):
        im = self.funcs.spec.images[name]
        want = im.ispace.shape + (im.channels,)
        pads = [(0, w - s) for w, s in zip(want, arr.shape)]
        if all(p == (0, 0) for p in pads):
            return arr
        return jnp.pad(arr, pads)

    def _crop(self, name, arr):
        real = self.plan.funcs.unknown_shapes[name]
        return arr[tuple(slice(0, s) for s in real)]

    def solve(self, inputs, interpret=None):
        plan = self.plan
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        x, data = plan.bind(inputs)
        n_outer = int(plan.solver_params["nIterations"])
        n_lin = int(plan.solver_params["lIterations"])
        reset = int(plan.solver_params["residual_reset_period"])
        key = (n_outer, n_lin, reset, interpret)
        if key not in self._compiled:
            kern = self._build(n_outer, n_lin, reset, interpret)

            # one dispatch: pad + channel split + kernel + stack/crop
            # (host-side per-op dispatches through the remote relay cost
            # milliseconds each; see docs/PALLAS_NOTES.md)
            def whole(x, images, pvals, spvals):
                def planes(name, arr):
                    p = self._pad(name, arr)
                    return [p[..., c] for c in range(p.shape[-1])]

                args = []
                for n in self.unknown_names:
                    args += planes(n, x[n])
                for n in self.const_names:
                    args += planes(n, images[n])
                args += [pvals, spvals]
                out = kern(*args)
                x_new = {}
                k = 0
                for n in self.unknown_names:
                    c = self.funcs.spec.images[n].channels
                    stacked = jnp.stack(out[k : k + c], axis=-1)
                    x_new[n] = self._crop(n, stacked)
                    k += c
                return x_new, out[k][0, 0]

            self._compiled[key] = jax.jit(whole)
        fn = self._compiled[key]

        dtype = self.funcs.dtype

        def host_param(n):
            # prefer the raw input (python float) -- float() on a bound
            # device scalar would force a host round-trip per call
            v = inputs.get(n, data["params"].get(n))
            return float(v)

        pvals = jnp.asarray(
            [[host_param(n)] for n in self.param_names] or [[0.0]], dtype,
        )
        spvals = jnp.asarray(
            [[float(plan.solver_params[n])] for n in self.sp_float_names],
            dtype,
        )
        x_new, cost = fn(x, data["images"], pvals, spvals)
        return {"x": x_new, "final_cost": float(cost)}
