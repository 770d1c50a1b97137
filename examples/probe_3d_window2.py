"""Probe 2: TWO-AXIS (D,H)-tiled 3-D windows for the streamed engine.

The D-only tiling of probe_3d_window.py is VMEM-infeasible at 256^3
(each halo plane is a full H x W slab), so the production design tiles
both D (untiled axis, exact halo 2r) and H (sublane axis, halo rounded
to 8): windows are (T_d + 2*h_d, T_h + 2*h_h, W) channel planes,
coord_offsets = (d0, h0, 0), and the JtJp center crop is
[h_d:h_d+T_d, h_h:h_h+T_h].  Validates the windowing math in interpret
mode; run with OPT_TPU_PROBE_TPU=1 (solo!) to compile on hardware.

Run:  python examples/probe_3d_window2.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

ON_TPU = os.environ.get("OPT_TPU_PROBE_TPU") == "1"
if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import opt_tpu
from opt_tpu import energies
from opt_tpu.compile.plan_fns import ProblemFunctions
from opt_tpu.dsl.env import EnergyEnv
from opt_tpu.dsl.spec import ProblemSpec
from opt_tpu.runtime.api import _run_energy

D, H, W = (32, 32, 128) if ON_TPU else (16, 16, 16)
state = opt_tpu.NewState()
plan = state.problem_plan(
    state.problem_define(
        energies.ALL_ENERGIES["volumetric_mesh_deformation"],
        "gaussNewtonGPU"),
    [W, H, D],
)

rng = np.random.RandomState(0)
ii, jj, kk = np.meshgrid(np.arange(D), np.arange(H), np.arange(W),
                         indexing="ij")
grid = np.stack([ii, jj, kk], axis=-1).astype(np.float32)
cons = np.full_like(grid, -np.inf)
cons[:, 0] = grid[:, 0]
cons[:, -1] = grid[:, -1] + np.float32(1.5)
inputs = {
    "Offset": grid + 0.01 * rng.randn(*grid.shape).astype(np.float32),
    "UrShape": grid.copy(),
    "Angle": 0.01 * rng.randn(*grid.shape).astype(np.float32),
    "Constraints": cons.astype(np.float32),
    "w_fitSqrt": np.sqrt(1.0),
    "w_regSqrt": np.sqrt(0.5),
}
x, data = plan.bind(inputs)

funcs = plan.funcs
un = sorted(funcs.unknown_shapes)
cn = sorted(n for n, im in plan.spec.images.items()
            if not im.is_unknown and n not in funcs.aliases)
pn = sorted(plan.spec.params)
chans = {n: plan.spec.images[n].channels for n in un + cn}
nU = sum(chans[n] for n in un)
nC = sum(chans[n] for n in cn)

# --- reference whole-grid JtJp ------------------------------------------
p_vec = {n: jnp.asarray(rng.randn(*np.asarray(x[n]).shape),
                        jnp.float32) for n in un}
fn = lambda xx: funcs.residuals_solve(xx, data)
_, jvp_fn = jax.linearize(fn, x)
jt_fn = jax.linear_transpose(jvp_fn, x)
(ref_grad,) = jt_fn(jvp_fn(p_vec))

# --- two-axis tile-window funcs -------------------------------------------
r = 1
h_d = max(2 * r, 1)              # D: untiled axis, exact halo
h_h = 8                           # H: sublane axis, halo rounded to 8
T_d, T_h = (4, 16) if ON_TPU else (4, 8)  # T_d=4: proves UNALIGNED
# dynamic starts on the untiled D axis (dim 1 of the rank-4 buffers)
WIN_d, WIN_h = T_d + 2 * h_d, T_h + 2 * h_h
dims_ext = list(plan.dims)       # [W, H, D]
dims_ext[-1] = WIN_d
dims_ext[-2] = WIN_h
spec_t = ProblemSpec()
env = EnergyEnv(spec_t, dims_ext)
_run_energy(plan.problem.energy, env)
real_shapes = {im.ispace.key(): im.ispace.shape
               for im in plan.spec.images.values()}
tfuncs = ProblemFunctions(spec_t, funcs.dtype, real_shapes=real_shapes,
                          kernel_safe=True)

n_td, n_th = D // T_d, H // T_h
nIn = nU + nC

def pad_plane(a):
    return jnp.pad(a, ((h_d, h_d), (h_h, h_h)) + ((0, 0),) * (a.ndim - 2))

def planes(arr):
    return [arr[..., c] for c in range(arr.shape[-1])]

stack = []
for n in un:
    stack += [pad_plane(p) for p in planes(x[n])]
for n in cn:
    stack += [pad_plane(p) for p in planes(data["images"][n])]
ins = jnp.stack(stack)                 # (nIn, D+2h_d, H+2h_h, W)
pstk = jnp.stack([pad_plane(p) for n in un for p in planes(p_vec[n])])
pvals = jnp.stack([jnp.asarray(data["params"][n], jnp.float32)
                   for n in pn]).reshape(-1, 1)


def kernel(ins_any, p_any, pref, out_any, insw, pw, sem):
    params = {name: pref[k, 0] for k, name in enumerate(pn)}

    def tile_body(t, _):
        td = t // n_th
        th = t % n_th
        d0 = td * T_d
        r0 = th * T_h
        cps = [
            pltpu.make_async_copy(
                ins_any.at[:, pl.ds(d0, WIN_d), pl.ds(r0, WIN_h)],
                insw, sem),
            pltpu.make_async_copy(
                p_any.at[:, pl.ds(d0, WIN_d), pl.ds(r0, WIN_h)],
                pw, sem),
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
        data_win = {"images": imgs, "params": params, "graph_indices": {}}
        pv = {}
        k = 0
        for n in un:
            pv[n] = [pw[k + c] for c in range(chans[n])]
            k += chans[n]
        tfuncs.coord_offsets = (d0 - h_d, r0 - h_h, 0)
        f = lambda xx: tfuncs.residuals_solve(xx, data_win)
        _, jf = jax.linearize(f, x_win)
        jt = jax.linear_transpose(jf, x_win)
        (grad,) = jt(jf(pv))
        aps = []
        for n in un:
            for c in range(chans[n]):
                aps.append(
                    grad[n][c][h_d:h_d + T_d, h_h:h_h + T_h])
        pw[:, pl.ds(0, T_d), pl.ds(0, T_h)] = jnp.stack(aps)
        cp = pltpu.make_async_copy(
            pw.at[:, pl.ds(0, T_d), pl.ds(0, T_h)],
            out_any.at[:, pl.ds(d0, T_d), pl.ds(r0, T_h)], sem)
        cp.start(); cp.wait()
        return 0

    jax.lax.fori_loop(0, n_td * n_th, tile_body, 0)


any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
out = pl.pallas_call(
    kernel,
    in_specs=[any_spec, any_spec, sspec],
    out_specs=any_spec,
    out_shape=jax.ShapeDtypeStruct((nU, D, H, W), jnp.float32),
    scratch_shapes=[
        pltpu.VMEM((nIn, WIN_d, WIN_h, W), jnp.float32),
        pltpu.VMEM((nU, WIN_d, WIN_h, W), jnp.float32),
        pltpu.SemaphoreType.DMA,
    ],
    compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=88 * 1024 * 1024),
    interpret=not ON_TPU,
)(ins, pstk, pvals)

k = 0
ok = True
for n in un:
    for c in range(chans[n]):
        got = np.asarray(out[k])
        want = np.asarray(ref_grad[n][..., c])
        err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-30)
        print(f"{n}[{c}]: rel err {err:.2e}")
        ok &= err < (1e-4 if ON_TPU else 1e-5)
        k += 1
print("PROBE 3D TWO-AXIS WINDOW:", "PASS" if ok else "FAIL")
