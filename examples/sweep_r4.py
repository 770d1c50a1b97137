"""Round-4 TPU sweeps (results tracked in docs/sweep_tpu_r4.csv).

Subcommands (run ONE at a time -- only one process may own the TPU):

  classic3d [sides...]   the classic (capacity) 3-D kernel vs the
                         pipelined default: parity + time at sizes both
                         run, then the sizes only classic fits
                         (384^3 -- the round-3 measured per-chip
                         ceiling, docs/ROUND3_TODO.md #13)
  vol_lm [sides...]      volumetric LM past 128^3 (VERDICT r3 weak #3:
                         auto-engine claims the route with zero
                         on-hardware evidence past 128^3)

Timing protocol (CLAUDE.md): warmup solve, then fresh (perturbed)
unknowns per rep, scalar fetched to host; min over reps.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def vol_inputs(side, seed=0):
    rng = np.random.RandomState(seed)
    n = side
    ii, jj, kk = np.meshgrid(
        np.arange(n, dtype=np.float32),
        np.arange(n, dtype=np.float32),
        np.arange(n, dtype=np.float32),
        indexing="ij",
    )
    grid = np.stack([ii, jj, kk], axis=-1)
    cons = np.full_like(grid, -np.inf)
    cons[:, 0] = grid[:, 0]
    cons[:, n - 1] = grid[:, n - 1] + np.array([2.5, -2.5, 0.0],
                                               np.float32)
    return {
        "Offset": grid + 0.01 * rng.randn(*grid.shape).astype(np.float32),
        "UrShape": grid.copy(),
        "Angle": np.zeros_like(grid),
        "Constraints": cons.astype(np.float32),
        "w_fitSqrt": np.sqrt(1.0),
        "w_regSqrt": np.sqrt(0.05),
    }


def make_plan(side, kind="gaussNewtonGPU", n_outer=8, n_lin=100):
    import opt_tpu
    from opt_tpu import energies

    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(
            energies.ALL_ENERGIES["volumetric_mesh_deformation"], kind),
        [side] * 3,
    )
    plan.set_solver_parameter("nIterations", n_outer)
    plan.set_solver_parameter("lIterations", n_lin)
    return plan


def time_engine(eng, inputs, reps=2, donate=False):
    import jax
    import jax.numpy as jnp

    if donate:
        # capacity-bound sizes: EVERY solve (warmup included) donates
        # its own freshly-uploaded inputs and drops the previous
        # outputs first -- at 384^3 the non-donated warmup held a
        # defensive 2.53 GB input copy alongside the program and the
        # run OOM'd (RESOURCE_EXHAUSTED) even though the compile fit
        def fresh(rep):
            d = {k: (jnp.asarray(v) if isinstance(v, np.ndarray)
                     else v) for k, v in inputs.items()}
            d["Offset"] = d["Offset"] + np.float32(rep * 1e-6)
            jax.block_until_ready(d["Offset"])
            return d

        out = eng.solve(fresh(0), donate_inputs=True)  # warmup+compile
        cost = out["final_cost"]
        del out  # release the 1.27 GB solution before re-uploading
        di = fresh(1)
        t0 = time.perf_counter()
        out = eng.solve(di, donate_inputs=True)
        ms = (time.perf_counter() - t0) * 1e3
        return ms, cost

    dev = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
           for k, v in inputs.items()}
    out = eng.solve(dict(dev))           # warmup + compile
    cost = out["final_cost"]
    times = []
    for rep in range(1, reps + 1):
        di = dict(dev)
        di["Offset"] = dev["Offset"] + np.float32(rep * 1e-6)
        jax.block_until_ready(di["Offset"])
        t0 = time.perf_counter()
        out = eng.solve(di)
        times.append((time.perf_counter() - t0) * 1e3)
    return min(times), cost


def cmd_classic3d(sides):
    from opt_tpu.ops.stream3d import StreamSolver3D, _pick_variant3d

    for side in sides:
        plan = make_plan(side)
        auto = _pick_variant3d(plan)
        print(f"# {side}^3 GN 8x100: auto variant = {auto}", flush=True)
        for variant in ("pipelined", "classic"):
            plan_v = make_plan(side)
            try:
                eng = StreamSolver3D(plan_v, variant=variant)
            except ValueError as e:
                print(f"volumetric,{side},stream3d_{variant},"
                      f"gaussNewtonGPU,8,100,INELIGIBLE,{e}", flush=True)
                continue
            donate = side >= 320  # capacity-bound: one input copy only
            try:
                ms, cost = time_engine(eng, vol_inputs(side),
                                       donate=donate)
                print(f"volumetric,{side},stream3d_{variant}"
                      f"_t{eng.tile_d}x{eng.tile_h},gaussNewtonGPU,"
                      f"8,100,{ms:.1f},{cost:.6g}", flush=True)
            except Exception as e:
                print(f"volumetric,{side},stream3d_{variant},"
                      f"gaussNewtonGPU,8,100,FAILED,{e!r:.200}",
                      flush=True)


def cmd_vol_lm(sides):
    from opt_tpu.ops.stream3d import StreamSolver3D, _pick_variant3d

    for side in sides:
        plan = make_plan(side, kind="LMGPU")
        variant = _pick_variant3d(plan)
        print(f"# {side}^3 LM 8x100: auto variant = {variant}",
              flush=True)
        try:
            eng = StreamSolver3D(plan)
        except ValueError as e:
            print(f"volumetric,{side},stream3d_lm,LMGPU,8,100,"
                  f"INELIGIBLE,{e}", flush=True)
            continue
        donate = side >= 256  # LM ins carries scs too: tighter than GN
        try:
            ms, cost = time_engine(eng, vol_inputs(side), donate=donate)
            print(f"volumetric,{side},stream3d_{eng.variant}"
                  f"_t{eng.tile_d}x{eng.tile_h}_lm,LMGPU,8,100,"
                  f"{ms:.1f},{cost:.6g}", flush=True)
        except Exception as e:
            print(f"volumetric,{side},stream3d_lm,LMGPU,8,100,FAILED,"
                  f"{e!r:.200}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["classic3d", "vol_lm"])
    ap.add_argument("sides", nargs="*", type=int,
                    default=None)
    args = ap.parse_args()
    sides = args.sides or {"classic3d": [128, 384],
                           "vol_lm": [192, 256]}[args.cmd]
    if args.cmd == "classic3d":
        cmd_classic3d(sides)
    else:
        cmd_vol_lm(sides)


if __name__ == "__main__":
    main()
