"""Round-3 TPU sweeps (results tracked in docs/sweep_tpu_r3.csv).

Subcommands (run ONE at a time -- only one process may own the TPU):

  large_grid [sizes...]   pipelined streamed HBM engine vs XLA at
                          1024/2048/4096 (VERDICT r2 #1/#4)
  materialized [sizes...] matfree vs materialized vs fused JTJ at scale
                          (VERDICT r2 #5; the fork DEFAULTS to
                          materialized+fused, solverGPUGaussNewton.t:29-39)
  graph_mat               materialized/fused on arap graphs 10k/50k
  graph_boundary          tiled-layout work-model gate rows near the
                          take crossover (VERDICT r2 #7)

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


def warp_inputs(W, H, seed=0):
    rng = np.random.RandomState(seed)
    ur = rng.randn(H, W, 2).astype(np.float32)
    cons = np.full((H, W, 2), -1.0, np.float32)
    cons[::20, :] = np.abs(rng.randn(H, W, 2).astype(np.float32))[::20, :]
    return {
        "Offset": np.zeros((H, W, 2), np.float32),
        "Angle": np.zeros((H, W, 1), np.float32),
        "UrShape": ur,
        "Constraints": cons,
        "Mask": np.zeros((H, W, 1), np.float32),
        "w_fitSqrt": np.sqrt(0.5),
        "w_regSqrt": np.sqrt(2.0),
    }


def _plan(energy_name, dims, kind="gaussNewtonGPU", **state_kwargs):
    import opt_tpu
    from opt_tpu import energies

    state = opt_tpu.NewState(**state_kwargs)
    return state.problem_plan(
        state.problem_define(energies.ALL_ENERGIES[energy_name], kind),
        dims,
    )


def time_xla(plan, inputs, n_outer, n_lin, perturb="Offset", reps=2):
    import jax
    import jax.numpy as jnp

    plan.set_solver_parameter("nIterations", n_outer)
    plan.set_solver_parameter("lIterations", n_lin)
    x, data = plan.bind(inputs)
    sp = plan._sp_device()
    sp["nIterations"] = jnp.asarray(n_outer, jnp.int32)
    st = plan._full_solve_fn(x, data, sp)
    cost = float(st["prev_cost"])
    times = []
    for rep in range(1, reps + 1):
        xr = dict(x)
        xr[perturb] = x[perturb] + np.float32(rep * 1e-6)
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        st = plan._full_solve_fn(xr, data, sp)
        cost = float(st["prev_cost"])
        times.append((time.perf_counter() - t0) * 1e3)
    return min(times), cost


def time_engine(eng, inputs, perturb="Offset", reps=2):
    import jax
    import jax.numpy as jnp

    dev = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
           for k, v in inputs.items()}
    out = eng.solve(dev)  # warmup + compile
    cost = out["final_cost"]
    out = None  # 8192^2: keeping the previous solve's x alive pushed
    times = []  # the next solve over the HBM limit (ResourceExhausted)
    for rep in range(1, reps + 1):
        di = dict(dev)
        di[perturb] = dev[perturb] + np.float32(rep * 1e-6)
        jax.block_until_ready(di[perturb])
        t0 = time.perf_counter()
        out = eng.solve(di)
        cost = out["final_cost"]
        times.append((time.perf_counter() - t0) * 1e3)
        out = None
    return min(times), cost


def row(problem, size, mode, kind, n_outer, n_lin, ms, cost):
    print(f"{problem},{size},{mode},{kind},{n_outer},{n_lin},"
          f"{ms:.1f},{cost:.6g}", flush=True)


def cmd_large_grid(sizes, modes):
    from opt_tpu.ops.stream_solver import StreamSolverHBM

    n_outer, n_lin = 8, 100
    for size in sizes:
        inputs = warp_inputs(size, size)
        if "xla" in modes:
            plan = _plan("image_warping", [size, size])
            ms, cost = time_xla(plan, inputs, n_outer, n_lin)
            row("image_warping", size, "xla", "gaussNewtonGPU",
                n_outer, n_lin, ms, cost)
        for variant in ("pipelined", "classic"):
            if variant not in modes:
                continue
            plan = _plan("image_warping", [size, size])
            plan.set_solver_parameter("nIterations", n_outer)
            plan.set_solver_parameter("lIterations", n_lin)
            tile = int(os.environ.get("OPT_TPU_SWEEP_TILE", "0")) or None
            eng = StreamSolverHBM(plan, tile=tile, variant=variant)
            ms, cost = time_engine(eng, inputs)
            tag = (f"stream_hbm_t{eng.tile}_{eng.variant}"
                   + ("_fused" if eng.fuse_beta else "")
                   + ("_ws" if os.environ.get(
                       "OPT_TPU_STREAM_WSTAGE") == "1" else ""))
            row("image_warping", size, tag, "gaussNewtonGPU",
                n_outer, n_lin, ms, cost)


def cmd_large_grid_lm(sizes, modes):
    """LM flavour of large_grid: XLA vs the streamed classic kernel
    (the measured LM default; pipelined LM recorded slower,
    docs/ROUND3_TODO.md #10)."""
    from opt_tpu.ops.stream_solver import StreamSolverHBM

    n_outer, n_lin = 8, 100
    for size in sizes:
        inputs = warp_inputs(size, size)
        if "xla" in modes:
            plan = _plan("image_warping", [size, size], kind="LMGPU")
            try:
                ms, cost = time_xla(plan, inputs, n_outer, n_lin)
                row("image_warping", size, "xla_lm", "LMGPU",
                    n_outer, n_lin, ms, cost)
            except Exception as e:
                print(f"# xla_lm@{size} failed: {e!r:.150}",
                      file=sys.stderr, flush=True)
        for variant in ("classic", "pipelined"):
            if variant not in modes:
                continue
            plan = _plan("image_warping", [size, size], kind="LMGPU")
            plan.set_solver_parameter("nIterations", n_outer)
            plan.set_solver_parameter("lIterations", n_lin)
            tile = int(os.environ.get("OPT_TPU_SWEEP_TILE", "0")) or None
            eng = StreamSolverHBM(plan, tile=tile, variant=variant)
            ms, cost = time_engine(eng, inputs)
            tag = (f"stream_hbm_t{eng.tile}_{eng.variant}"
                   + ("_fused" if eng.fuse_beta else "") + "_lm")
            row("image_warping", size, tag, "LMGPU",
                n_outer, n_lin, ms, cost)


def volumetric_inputs(side, seed=0):
    """Synthetic side^3 ARAP volume: rest grid + pinned bottom layer and
    a twisted top layer (same construction shape as the example app,
    examples/volumetric_mesh_deformation.py, at benchmark scale)."""
    rng = np.random.RandomState(seed)
    n = side
    ii, jj, kk = np.meshgrid(
        np.arange(n, dtype=np.float32),
        np.arange(n, dtype=np.float32),
        np.arange(n, dtype=np.float32),
        indexing="ij",
    )
    grid = np.stack([ii, jj, kk], axis=-1)  # (D, H, W, 3)
    cons = np.full_like(grid, -np.inf)
    cons[:, 0, :, :] = grid[:, 0, :, :]
    top = grid[:, n - 1, :, :]
    cons[:, n - 1, :, :] = top + np.array([2.5, -2.5, 0.0], np.float32)
    return {
        "Offset": grid + 0.01 * rng.randn(*grid.shape).astype(np.float32),
        "UrShape": grid.copy(),
        "Angle": np.zeros_like(grid),
        "Constraints": cons.astype(np.float32),
        "w_fitSqrt": np.sqrt(1.0),
        "w_regSqrt": np.sqrt(0.05),
    }


def cmd_volumetric(sides):
    """3D-grid scaling: fused XLA vs the two-axis-tiled streamed engine
    (ops/stream3d.py; unaligned sides lane-pad, e.g. 192 -> 256 lanes
    at +33% streamed traffic)."""
    from opt_tpu.ops.stream3d import StreamSolver3D, supports3d

    n_outer, n_lin = 8, 100
    for side in sides:
        inputs = volumetric_inputs(side)
        plan = _plan("volumetric_mesh_deformation", [side, side, side])
        try:
            ms, cost = time_xla(plan, inputs, n_outer, n_lin)
            row("volumetric", f"{side}^3", "xla", "gaussNewtonGPU",
                n_outer, n_lin, ms, cost)
        except Exception as e:
            print(f"# volumetric@{side} xla failed: {e!r:.150}",
                  file=sys.stderr, flush=True)
        plan = _plan("volumetric_mesh_deformation", [side, side, side])
        plan.set_solver_parameter("nIterations", n_outer)
        plan.set_solver_parameter("lIterations", n_lin)
        if not supports3d(plan):
            print(f"# volumetric@{side}: stream3d ineligible",
                  file=sys.stderr, flush=True)
            continue
        try:
            td = int(os.environ.get("OPT_TPU_SWEEP_TILE_D", "0")) or None
            th = int(os.environ.get("OPT_TPU_SWEEP_TILE_H", "0")) or None
            eng = StreamSolver3D(plan, tile_d=td, tile_h=th)
            ms, cost = time_engine(eng, inputs)
            row("volumetric", f"{side}^3",
                f"stream3d_t{eng.tile_d}x{eng.tile_h}_pipelined",
                "gaussNewtonGPU", n_outer, n_lin, ms, cost)
        except Exception as e:
            print(f"# volumetric@{side} stream3d failed: {e!r:.150}",
                  file=sys.stderr, flush=True)


def cmd_volumetric_lm(sides):
    """LM flavour of the volumetric sweep: fused XLA vs the 3-D
    streamed engine's pipelined-LM loop (scs apply, in-sweep Q, zeta
    exit, periodic exact residual replacement)."""
    from opt_tpu.ops.stream3d import StreamSolver3D, supports3d

    n_outer, n_lin = 8, 100
    for side in sides:
        inputs = volumetric_inputs(side)
        plan = _plan("volumetric_mesh_deformation", [side, side, side],
                     kind="LMGPU")
        try:
            ms, cost = time_xla(plan, inputs, n_outer, n_lin)
            row("volumetric", f"{side}^3", "xla_lm", "LMGPU",
                n_outer, n_lin, ms, cost)
        except Exception as e:
            print(f"# volumetric_lm@{side} xla failed: {e!r:.150}",
                  file=sys.stderr, flush=True)
        plan = _plan("volumetric_mesh_deformation", [side, side, side],
                     kind="LMGPU")
        plan.set_solver_parameter("nIterations", n_outer)
        plan.set_solver_parameter("lIterations", n_lin)
        if not supports3d(plan):
            print(f"# volumetric_lm@{side}: stream3d ineligible",
                  file=sys.stderr, flush=True)
            continue
        try:
            td = int(os.environ.get("OPT_TPU_SWEEP_TILE_D", "0")) or None
            th = int(os.environ.get("OPT_TPU_SWEEP_TILE_H", "0")) or None
            eng = StreamSolver3D(plan, tile_d=td, tile_h=th)
            ms, cost = time_engine(eng, inputs)
            row("volumetric", f"{side}^3",
                f"stream3d_t{eng.tile_d}x{eng.tile_h}_pipelined_lm",
                "LMGPU", n_outer, n_lin, ms, cost)
        except Exception as e:
            print(f"# volumetric_lm@{side} stream3d failed: {e!r:.150}",
                  file=sys.stderr, flush=True)


def cmd_materialized(sizes):
    n_outer, n_lin = 8, 100
    for size in sizes:
        inputs = warp_inputs(size, size)
        for mode, kw in (
            ("matfree", {}),
            ("materialized", {"use_materialized_jacobian": True}),
            ("fused", {"use_materialized_jacobian": True,
                       "use_fused_jtj": True}),
        ):
            plan = _plan("image_warping", [size, size], **kw)
            try:
                ms, cost = time_xla(plan, inputs, n_outer, n_lin)
            except Exception as e:
                print(f"# {mode}@{size} failed: {e!r:.150}",
                      file=sys.stderr, flush=True)
                continue
            row("image_warping", size, mode, "gaussNewtonGPU",
                n_outer, n_lin, ms, cost)


def tri_grid_graph(w, h):
    vid = np.arange(w * h).reshape(h, w)
    pairs = [
        (vid[:, :-1].ravel(), vid[:, 1:].ravel()),
        (vid[:-1, :].ravel(), vid[1:, :].ravel()),
        (vid[:-1, :-1].ravel(), vid[1:, 1:].ravel()),
    ]
    v0 = np.concatenate([a for a, b in pairs] + [b for a, b in pairs])
    v1 = np.concatenate([b for a, b in pairs] + [a for a, b in pairs])
    return v0.astype(np.int32), v1.astype(np.int32)


def arap_inputs(N, v0, v1, seed=0):
    rng = np.random.RandomState(seed)
    ur = rng.randn(N, 3).astype(np.float32)
    cons = np.full((N, 3), -1e7, np.float32)
    sel = rng.choice(N, max(4, N // 50), replace=False)
    cons[sel] = ur[sel] + 0.1
    return {
        "Offset": ur.copy(), "Angle": np.zeros((N, 3), np.float32),
        "UrShape": ur, "Constraints": cons,
        "w_fitSqrt": 2.0, "w_regSqrt": 1.0,
        "G": {"v0": v0, "v1": v1},
    }


def cmd_graph_mat(side_sizes):
    n_outer, n_lin = 8, 100
    for side in side_sizes:
        v0, v1 = tri_grid_graph(side, side)
        N, E = side * side, len(v0)
        inputs = arap_inputs(N, v0, v1)
        for mode, kw in (
            ("matfree_banded", {}),
            ("matfree_take", {"graph_mode": "take"}),
            ("materialized", {"use_materialized_jacobian": True}),
            ("fused", {"use_materialized_jacobian": True,
                       "use_fused_jtj": True}),
        ):
            plan = _plan("arap_mesh_deformation", [N, E], **kw)
            try:
                ms, cost = time_xla(plan, inputs, n_outer, n_lin)
            except Exception as e:
                print(f"# {mode}@{N}v failed: {e!r:.150}",
                      file=sys.stderr, flush=True)
                continue
            row("arap_trigrid", f"{N}v_{E}e", mode, "gaussNewtonGPU",
                n_outer, n_lin, ms, cost)


def band_chord_graph(n, band, n_chords, seed=3):
    """Band-local edges + random chords: the tiled-layout regime near
    the work-model boundary (docs/ROUND3_TODO.md #6)."""
    rng = np.random.RandomState(seed)
    i = np.arange(n - 1)
    v0 = [i, i[: n - band] ]
    v1 = [i + 1, i[: n - band] + band]
    c0 = rng.randint(0, n, n_chords)
    c1 = rng.randint(0, n, n_chords)
    v0 = np.concatenate(v0 + [c0, c1])
    v1 = np.concatenate(v1 + [c1, c0])
    keep = v0 != v1
    return v0[keep].astype(np.int32), v1[keep].astype(np.int32)


def cmd_graph_boundary(chord_counts):
    n_outer, n_lin = 8, 100
    n = 30720
    for n_chords in chord_counts:
        v0, v1 = band_chord_graph(n, 15, n_chords)
        N, E = n, len(v0)
        inputs = arap_inputs(N, v0, v1)
        for mode, kw in (
            ("auto", {}),
            ("take", {"graph_mode": "take"}),
            ("banded_forced", {"graph_mode": "banded"}),
        ):
            plan = _plan("arap_mesh_deformation", [N, E], **kw)
            try:
                ms, cost = time_xla(plan, inputs, n_outer, n_lin)
            except Exception as e:
                print(f"# {mode}@{n_chords}ch failed: {e!r:.150}",
                      file=sys.stderr, flush=True)
                continue
            row("arap_bandchord", f"{N}v_{E}e_{n_chords}ch", mode,
                "gaussNewtonGPU", n_outer, n_lin, ms, cost)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["large_grid", "large_grid_lm",
                                   "materialized", "graph_mat",
                                   "graph_boundary", "volumetric",
                                   "volumetric_lm"])
    p.add_argument("args", nargs="*", type=int)
    p.add_argument("--modes", default="xla,pipelined")
    a = p.parse_args()
    print("problem,size,mode,kind,n_outer,n_linear,ms,final_cost",
          flush=True)
    if a.cmd == "large_grid":
        cmd_large_grid(a.args or [2048, 4096],
                       set(a.modes.split(",")))
    elif a.cmd == "large_grid_lm":
        cmd_large_grid_lm(a.args or [2048, 4096],
                          set(a.modes.split(",")))
    elif a.cmd == "volumetric":
        cmd_volumetric(a.args or [64, 128, 192])
    elif a.cmd == "volumetric_lm":
        cmd_volumetric_lm(a.args or [128])
    elif a.cmd == "materialized":
        cmd_materialized(a.args or [1024, 2048, 4096])
    elif a.cmd == "graph_mat":
        cmd_graph_mat(a.args or [102, 224])
    elif a.cmd == "graph_boundary":
        cmd_graph_boundary(a.args or [4000, 8000, 16000])


if __name__ == "__main__":
    main()
