"""Probe: 3-D (volumetric) tile-window evaluator for the streamed engine.

Validates, in Pallas interpret mode on CPU, that the StreamSolverHBM
window machinery generalizes to 3-D grids: windows are (WIN, H, W)
channel planes tiled along D (array axis 0 = last declared dim), halo
h = 2*radius, coord_offsets = (d0, 0, 0), and the windowed
JtJp matches the whole-grid linearize/transpose apply.

Run:  python examples/probe_3d_window.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

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

side = 16
D = H = W = side
state = opt_tpu.NewState()
plan = state.problem_plan(
    state.problem_define(
        energies.ALL_ENERGIES["volumetric_mesh_deformation"],
        "gaussNewtonGPU"),
    [W, H, D],
)

rng = np.random.RandomState(0)
grid = np.stack(np.meshgrid(*[np.arange(side, dtype=np.float32)] * 3,
                            indexing="ij"), axis=-1)
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
print("unknowns", un, "consts", cn, "nU", nU, "nC", nC)

# --- reference whole-grid JtJp ------------------------------------------
p_vec = {n: jnp.asarray(rng.randn(*np.asarray(x[n]).shape),
                        jnp.float32) for n in un}
fn = lambda xx: funcs.residuals_solve(xx, data)
_, jvp_fn = jax.linearize(fn, x)
jt_fn = jax.linear_transpose(jvp_fn, x)
(ref_grad,) = jt_fn(jvp_fn(p_vec))

# --- tile-window funcs ----------------------------------------------------
T, r = 4, 1
h = max(2 * r, 1)          # NO sublane roundup: D is the untiled axis
WIN = T + 2 * h
dims_ext = list(plan.dims)
dims_ext[-1] = WIN
spec_t = ProblemSpec()
env = EnergyEnv(spec_t, dims_ext)
_run_energy(plan.problem.energy, env)
real_shapes = {im.ispace.key(): im.ispace.shape
               for im in plan.spec.images.values()}
tfuncs = ProblemFunctions(spec_t, funcs.dtype, real_shapes=real_shapes,
                          kernel_safe=True)

n_tiles = D // T
nIn = nU + nC

def pad_plane(a):
    return jnp.pad(a, ((h, h),) + ((0, 0),) * (a.ndim - 1))

def planes(arr):
    return [arr[..., c] for c in range(arr.shape[-1])]

stack = []
for n in un:
    stack += [pad_plane(p) for p in planes(x[n])]
for n in cn:
    stack += [pad_plane(p) for p in planes(data["images"][n])]
ins = jnp.stack(stack)                       # (nIn, D+2h, H, W)
pstk = jnp.stack([pad_plane(p) for n in un for p in planes(p_vec[n])])
pvals = jnp.stack([jnp.asarray(data["params"][n], jnp.float32)
                   for n in pn]).reshape(-1, 1)


def kernel(ins_any, p_any, pref, out_any, insw, pw, sem):
    params = {name: pref[k, 0] for k, name in enumerate(pn)}

    def tile_body(t, _):
        t0 = t * T
        cps = [
            pltpu.make_async_copy(ins_any.at[:, pl.ds(t0, WIN)], insw, sem),
            pltpu.make_async_copy(p_any.at[:, pl.ds(t0, WIN)], pw, sem),
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
        tfuncs.coord_offsets = (t0 - h, 0, 0)
        f = lambda xx: tfuncs.residuals_solve(xx, data_win)
        _, jf = jax.linearize(f, x_win)
        jt = jax.linear_transpose(jf, x_win)
        (grad,) = jt(jf(pv))
        aps = []
        for n in un:
            for c in range(chans[n]):
                aps.append(grad[n][c][h:h + T])
        pw[:, pl.ds(0, T)] = jnp.stack(aps)
        cp = pltpu.make_async_copy(
            pw.at[:, pl.ds(0, T)], out_any.at[:, pl.ds(t0, T)], sem)
        cp.start(); cp.wait()
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
out = pl.pallas_call(
    kernel,
    in_specs=[any_spec, any_spec, sspec],
    out_specs=any_spec,
    out_shape=jax.ShapeDtypeStruct((nU, D, H, W), jnp.float32),
    scratch_shapes=[
        pltpu.VMEM((nIn, WIN, H, W), jnp.float32),
        pltpu.VMEM((nU, WIN, H, W), jnp.float32),
        pltpu.SemaphoreType.DMA,
    ],
    interpret=True,
)(ins, pstk, pvals)

k = 0
ok = True
for n in un:
    for c in range(chans[n]):
        got = np.asarray(out[k])
        want = np.asarray(ref_grad[n][..., c])
        err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-30)
        print(f"{n}[{c}]: rel err {err:.2e}")
        ok &= err < 1e-5
        k += 1
print("PROBE 3D WINDOW:", "PASS" if ok else "FAIL")
