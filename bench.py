"""Benchmark: image_warping at 512x512 (the reference's canonical perf
config, BASELINE.md: cat512, nonLinearIter=8, linearIter=400).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}

value: wall-clock ms for the full solve (8 GN outer iterations x 400 PCG
iterations, matrix-free) via the fastest eligible engine, run entirely
on device after one warmup solve.

vs_baseline: measured same-hardware ratio -- the fused XLA program's
wall-clock for the SAME config divided by value (the XLA path is the
oracle every engine holds cost parity with, so this is the honest
baseline now that both run on one chip; VERDICT r3 weak #6/next #8).
1.0 means the XLA program IS the fastest engine at this size.

The reference's only in-repo absolute anchor -- image_warping PCGStep1
averaging ~24 ms on the fork author's CPU
(reference: API/src/solverGPUGaussNewton.t:1926-1933), i.e. a
whole-solve floor of 8*400*24 = 76800 ms there -- is reported as a
stderr comment (cpu_anchor_vs), NOT as vs_baseline: it extrapolates
across machines and must not be read as a GPU comparison.
"""

import json
import sys
import time

import numpy as np


def warp_inputs(W, H, seed=0):
    rng = np.random.RandomState(seed)
    ur = rng.randn(H, W, 2).astype(np.float32)
    cons = np.full((H, W, 2), -1.0, np.float32)
    # constraint band: ~5% of pixels pinned to mutually inconsistent targets
    # (keeps the optimum nonzero so divergence would be visible in the cost)
    cons[::20, :] = np.abs(rng.randn(H, W, 2).astype(np.float32))[::20, :]
    mask = np.zeros((H, W, 1), np.float32)
    return {
        "Offset": np.zeros((H, W, 2), np.float32),
        "Angle": np.zeros((H, W, 1), np.float32),
        "UrShape": ur,
        "Constraints": cons,
        "Mask": mask,
        "w_fitSqrt": np.sqrt(0.5),
        "w_regSqrt": np.sqrt(2.0),
    }


def main():
    import jax
    import jax.numpy as jnp
    import opt_tpu
    from opt_tpu import energies

    W = H = 512
    n_outer, n_linear = 8, 400

    state = opt_tpu.NewState()
    problem = state.problem_define(
        energies.image_warping, "gaussNewtonGPU"
    )
    plan = state.problem_plan(problem, [W, H])
    plan.set_solver_parameter("nIterations", n_outer)
    plan.set_solver_parameter("lIterations", n_linear)

    inputs = warp_inputs(W, H)
    x, data = plan.bind(inputs)
    sp = plan._sp_device()
    sp["nIterations"] = jnp.asarray(n_outer, jnp.int32)

    def run():
        st = plan._full_solve_fn(x, data, sp)
        jax.block_until_ready(st)
        return st

    st = run()  # warmup + compile
    final_cost = float(st["prev_cost"])
    assert np.isfinite(final_cost), f"bench diverged: {final_cost}"

    # fresh (perturbed) unknowns per rep: identical-input reruns can be
    # served from a cache by the remote-TPU relay and report ~0 ms
    times = []
    for rep in range(1, 4):
        x_rep = dict(x)
        x_rep["Offset"] = x["Offset"] + np.float32(rep * 1e-6)
        jax.block_until_ready(x_rep)
        t0 = time.perf_counter()
        st = plan._full_solve_fn(x_rep, data, sp)
        _ = float(st["prev_cost"])  # host fetch = honest completion
        times.append((time.perf_counter() - t0) * 1e3)
    xla_ms = float(min(times))

    # candidate engines at this size: the whole-solve-in-VMEM kernel is
    # the only one auto doesn't already route (stream_hbm's GN crossover
    # is 2048^2, docs/sweep_tpu_r3.csv); take the fastest that holds
    # cost parity so `value` is the best the framework delivers
    value, engine_name, vmem_note = xla_ms, "xla", ""
    try:
        from opt_tpu.ops import vmem_solver

        if vmem_solver.supports(plan):
            eng = vmem_solver.VmemSolver(plan)
            # device-resident reps, like the xla timing above: the host
            # numpy path would charge the ~40-60 MB/s relay transfer to
            # the engine (CLAUDE.md timing protocol)
            dev_in = {k: (jnp.asarray(v) if isinstance(v, np.ndarray)
                          else v) for k, v in inputs.items()}
            out = eng.solve(dict(dev_in))  # warmup + compile
            assert abs(out["final_cost"] - final_cost) <= (
                1e-4 * abs(final_cost)
            ), f"vmem cost {out['final_cost']} != xla {final_cost}"
            tv = []
            for rep in (1, 2):
                di = dict(dev_in)
                di["Offset"] = dev_in["Offset"] + np.float32(rep * 1e-6)
                jax.block_until_ready(di["Offset"])
                t0 = time.perf_counter()
                out = eng.solve(di)  # final_cost fetch inside
                tv.append((time.perf_counter() - t0) * 1e3)
            vmem_note = f" vmem_ms={min(tv):.1f}"
            if min(tv) < value:
                value, engine_name = float(min(tv)), "vmem"
        else:
            vmem_note = " vmem=unsupported"
    except Exception as e:
        vmem_note = f" vmem_failed={e!r:.80}"

    cpu_anchor_ms = 8 * 400 * 24.0  # see module docstring
    print(
        json.dumps(
            {
                "metric": "image_warping_512_gn_solve(8x400)",
                "value": round(value, 1),
                "unit": "ms",
                "vs_baseline": round(xla_ms / value, 2),
                "baseline": "xla_same_config_ms",
                "xla_ms": round(xla_ms, 1),
                "engine": engine_name,
            }
        )
    )
    print(
        f"# backend={jax.default_backend()} final_cost={final_cost:.6f} "
        f"xla_times_ms={[round(t,1) for t in times]}{vmem_note} "
        f"engine={engine_name} "
        f"cpu_anchor_vs={cpu_anchor_ms / value:.0f}x (reference author's "
        f"CPU extrapolation, solverGPUGaussNewton.t:1926-1933 -- NOT a "
        f"GPU comparison)",
        file=sys.stderr,
    )

    # auxiliary metrics (stderr; the stdout contract stays one JSON line)
    try:
        aux_arap(sys.stderr)
    except Exception as e:
        print(f"# arap aux bench failed: {e!r:.120}", file=sys.stderr)
    try:
        aux_sfs(sys.stderr)
    except Exception as e:
        print(f"# sfs aux bench failed: {e!r:.120}", file=sys.stderr)
    try:
        aux_large_grid(sys.stderr)
    except Exception as e:
        print(f"# large-grid aux bench failed: {e!r:.120}",
              file=sys.stderr)
    try:
        aux_chunked_outer(sys.stderr)
    except Exception as e:
        print(f"# chunked-outer aux bench failed: {e!r:.120}",
              file=sys.stderr)
    try:
        aux_volumetric(sys.stderr)
    except Exception as e:
        print(f"# volumetric aux bench failed: {e!r:.120}",
              file=sys.stderr)
    try:
        aux_vmem_lm(sys.stderr)
    except Exception as e:
        print(f"# vmem-lm aux bench failed: {e!r:.120}",
              file=sys.stderr)
    try:
        aux_solve_many(sys.stderr)
    except Exception as e:
        print(f"# solve_many aux bench failed: {e!r:.120}",
              file=sys.stderr)


def tri_grid_graph(w, h):
    """Triangulated-grid mesh edges, both orientations (deterministic
    stand-in for the reference's PLY meshes -- same ~6-neighbor topology
    real arap workloads have)."""
    vid = np.arange(w * h).reshape(h, w)
    pairs = [
        (vid[:, :-1].ravel(), vid[:, 1:].ravel()),
        (vid[:-1, :].ravel(), vid[1:, :].ravel()),
        (vid[:-1, :-1].ravel(), vid[1:, 1:].ravel()),
    ]
    v0 = np.concatenate([a for a, b in pairs] + [b for a, b in pairs])
    v1 = np.concatenate([b for a, b in pairs] + [a for a, b in pairs])
    return v0.astype(np.int32), v1.astype(np.int32)


def aux_arap(err):
    """Graph-domain auxiliary benchmark: arap ~10k vertices / ~62k mesh
    edges (banded MXU graph engine active in auto mode)."""
    import jax
    import jax.numpy as jnp
    import opt_tpu
    from opt_tpu import energies

    W = H = 102
    v0, v1 = tri_grid_graph(W, H)
    N, E = W * H, len(v0)
    rng = np.random.RandomState(0)
    ur = rng.randn(N, 3).astype(np.float32)
    cons = np.full((N, 3), -1e7, np.float32)
    sel = rng.choice(N, 200, replace=False)
    cons[sel] = ur[sel] + 0.1
    inputs = {
        "Offset": ur.copy(), "Angle": np.zeros((N, 3), np.float32),
        "UrShape": ur, "Constraints": cons,
        "w_fitSqrt": 2.0, "w_regSqrt": 1.0,
        "G": {"v0": v0, "v1": v1},
    }
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.arap_mesh_deformation,
                             "gaussNewtonGPU"), [N, E],
    )
    plan.set_solver_parameter("nIterations", 8)
    plan.set_solver_parameter("lIterations", 100)
    x, data = plan.bind(inputs)
    sp = plan._sp_device()
    sp["nIterations"] = jnp.asarray(8, jnp.int32)
    st = plan._full_solve_fn(x, data, sp)
    _ = float(st["prev_cost"])
    times = []
    for rep in (1, 2, 3):
        xr = dict(x)
        xr["Offset"] = x["Offset"] + np.float32(rep * 1e-6)
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        st = plan._full_solve_fn(xr, data, sp)
        c = float(st["prev_cost"])
        times.append((time.perf_counter() - t0) * 1e3)
    print(
        f"# aux arap_10k_gn_solve(8x100): {min(times):.1f} ms "
        f"final_cost={c:.6g}", file=err,
    )


def aux_large_grid(err):
    """2048^2 image_warping 8x100: the past-VMEM-carry regime where the
    streamed HBM engine beats the XLA path (docs/ROOFLINE.md) -- tracks
    both so a regression in either shows up in BENCH_r{N}.json's stderr
    (VERDICT r2 weak #2)."""
    import jax
    import jax.numpy as jnp
    import opt_tpu
    from opt_tpu import energies
    from opt_tpu.ops.stream_solver import StreamSolverHBM

    W = H = 2048
    n_outer, n_lin = 8, 100
    inputs = warp_inputs(W, H)
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.image_warping, "gaussNewtonGPU"),
        [W, H],
    )
    plan.set_solver_parameter("nIterations", n_outer)
    plan.set_solver_parameter("lIterations", n_lin)

    # fused XLA path
    x, data = plan.bind(inputs)
    sp = plan._sp_device()
    sp["nIterations"] = jnp.asarray(n_outer, jnp.int32)
    st = plan._full_solve_fn(x, data, sp)
    cost_xla = float(st["prev_cost"])
    t_xla = []
    for rep in (1, 2):
        xr = dict(x)
        xr["Offset"] = x["Offset"] + np.float32(rep * 1e-6)
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        st = plan._full_solve_fn(xr, data, sp)
        _ = float(st["prev_cost"])
        t_xla.append((time.perf_counter() - t0) * 1e3)

    # streamed HBM engine (what Plan.solve(engine="auto") picks here)
    assert plan._pick_engine("auto") == "stream_hbm"
    eng = StreamSolverHBM(plan)
    dev = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
           for k, v in inputs.items()}
    out = eng.solve(dev)  # warmup + compile
    cost_eng = out["final_cost"]
    t_eng = []
    for rep in (1, 2):
        di = dict(dev)
        di["Offset"] = dev["Offset"] + np.float32(rep * 1e-6)
        jax.block_until_ready(di["Offset"])
        t0 = time.perf_counter()
        out = eng.solve(di)  # final_cost fetch = honest completion
        t_eng.append((time.perf_counter() - t0) * 1e3)
    ratio = min(t_xla) / min(t_eng)
    print(
        f"# aux image_warping_2048_gn_solve(8x100): "
        f"stream_hbm={min(t_eng):.1f} ms (T={eng.tile} {eng.variant}"
        f"{'+fused' if eng.fuse_beta else ''}) xla={min(t_xla):.1f} ms "
        f"speedup={ratio:.2f}x cost_eng={cost_eng:.4f} "
        f"cost_xla={cost_xla:.4f}", file=err,
    )

    # LM flavour through the auto route (stream since round 3: classic
    # kernel 1285.6 ms vs XLA 3041.9 ms at this size, sweep_tpu_r3.csv)
    plan_lm = state.problem_plan(
        state.problem_define(energies.image_warping, "LMGPU"), [W, H])
    plan_lm.set_solver_parameter("nIterations", n_outer)
    plan_lm.set_solver_parameter("lIterations", n_lin)
    assert plan_lm._pick_engine("auto") == "stream_hbm"
    eng_lm = StreamSolverHBM(plan_lm)
    out = eng_lm.solve(dev)  # warmup + compile
    cost_lm = out["final_cost"]
    t_lm = []
    for rep in (1, 2):
        di = dict(dev)
        di["Offset"] = dev["Offset"] + np.float32(rep * 1e-6)
        jax.block_until_ready(di["Offset"])
        t0 = time.perf_counter()
        out = eng_lm.solve(di)
        t_lm.append((time.perf_counter() - t0) * 1e3)
    print(
        f"# aux image_warping_2048_lm_solve(8x100): "
        f"stream_hbm={min(t_lm):.1f} ms (T={eng_lm.tile} "
        f"{eng_lm.variant}{'+fused' if eng_lm.fuse_beta else ''}) "
        f"cost={cost_lm:.4f}", file=err,
    )


def aux_chunked_outer(err):
    """2048^2 GN through the STRIP-MINED outer step (ops/stream_outer.
    ChunkedOuterFuncs, forced via OPT_TPU_STREAM_CHUNKED_OUTER=1) vs the
    whole-grid outer on the same streamed engine.  8192^2 and >=192^3 run
    ONLY through this machinery (docs/ROOFLINE.md) but are too slow for
    the driver bench, so this line is the regression guard for the
    only-engine-that-runs regime (VERDICT r3 weak #1 / next #3).  Cost
    parity is asserted in-script: the strip-mined evaluation sums
    cost/JtF over row strips, so tolerance is f32 reduction-order only."""
    import os

    import jax
    import jax.numpy as jnp
    import opt_tpu
    from opt_tpu import energies
    from opt_tpu.ops.stream_solver import StreamSolverHBM

    W = H = 2048
    n_outer, n_lin = 8, 100
    inputs = warp_inputs(W, H)
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.image_warping, "gaussNewtonGPU"),
        [W, H],
    )
    plan.set_solver_parameter("nIterations", n_outer)
    plan.set_solver_parameter("lIterations", n_lin)
    eng = StreamSolverHBM(plan)
    prev = os.environ.get("OPT_TPU_STREAM_CHUNKED_OUTER")
    try:
        os.environ["OPT_TPU_STREAM_CHUNKED_OUTER"] = "0"
        out = eng.solve(inputs)
        cost_whole = out["final_cost"]

        os.environ["OPT_TPU_STREAM_CHUNKED_OUTER"] = "1"
        out = eng.solve(inputs)  # warmup + compile (chunked program)
        cost_chunked = out["final_cost"]
        assert abs(cost_chunked - cost_whole) <= 2e-4 * abs(cost_whole), (
            f"chunked-outer cost {cost_chunked} != whole-grid "
            f"{cost_whole} (rtol 2e-4)"
        )
        times = []
        for rep in (1, 2):
            di = dict(inputs)
            di["Offset"] = inputs["Offset"] + np.float32(rep * 1e-6)
            t0 = time.perf_counter()
            out = eng.solve(di)
            times.append((time.perf_counter() - t0) * 1e3)
    finally:
        if prev is None:
            os.environ.pop("OPT_TPU_STREAM_CHUNKED_OUTER", None)
        else:
            os.environ["OPT_TPU_STREAM_CHUNKED_OUTER"] = prev
    print(
        f"# aux image_warping_2048_gn_chunked_outer(8x100): "
        f"{min(times):.1f} ms cost={cost_chunked:.4f} "
        f"(whole-grid outer cost={cost_whole:.4f}, parity rtol 2e-4 OK)",
        file=err,
    )


def aux_volumetric(err):
    """128^3 volumetric ARAP 8x100: the 3-D streamed engine
    (ops/stream3d.py) vs the fused XLA path -- tracks the new 3-D
    regime so BENCH_r{N}.json's stderr catches a regression (or a
    Mosaic compile break) in either."""
    import jax
    import jax.numpy as jnp
    import opt_tpu
    from opt_tpu import energies
    from opt_tpu.ops.stream3d import StreamSolver3D

    side, n_outer, n_lin = 128, 8, 100
    rng = np.random.RandomState(0)
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
    inputs = {
        "Offset": grid + 0.01 * rng.randn(*grid.shape).astype(np.float32),
        "UrShape": grid.copy(),
        "Angle": np.zeros_like(grid),
        "Constraints": cons.astype(np.float32),
        "w_fitSqrt": np.sqrt(1.0),
        "w_regSqrt": np.sqrt(0.05),
    }
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(
            energies.ALL_ENERGIES["volumetric_mesh_deformation"],
            "gaussNewtonGPU"), [side] * 3,
    )
    plan.set_solver_parameter("nIterations", n_outer)
    plan.set_solver_parameter("lIterations", n_lin)

    x, data = plan.bind(inputs)
    sp = plan._sp_device()
    sp["nIterations"] = jnp.asarray(n_outer, jnp.int32)
    st = plan._full_solve_fn(x, data, sp)
    cost_xla = float(st["prev_cost"])
    t_xla = []
    for rep in (1, 2):
        xr = dict(x)
        xr["Offset"] = x["Offset"] + np.float32(rep * 1e-6)
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        st = plan._full_solve_fn(xr, data, sp)
        _ = float(st["prev_cost"])
        t_xla.append((time.perf_counter() - t0) * 1e3)

    eng = StreamSolver3D(plan)
    dev = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
           for k, v in inputs.items()}
    out = eng.solve(dev)  # warmup + compile
    cost_eng = out["final_cost"]
    t_eng = []
    for rep in (1, 2):
        di = dict(dev)
        di["Offset"] = dev["Offset"] + np.float32(rep * 1e-6)
        jax.block_until_ready(di["Offset"])
        t0 = time.perf_counter()
        out = eng.solve(di)
        t_eng.append((time.perf_counter() - t0) * 1e3)
    print(
        f"# aux volumetric_128_gn_solve(8x100): "
        f"stream3d={min(t_eng):.1f} ms (T=({eng.tile_d},{eng.tile_h})) "
        f"xla={min(t_xla):.1f} ms speedup={min(t_xla)/min(t_eng):.2f}x "
        f"cost_eng={cost_eng:.6g} cost_xla={cost_xla:.6g}", file=err,
    )

    # the CLASSIC (capacity) kernel -- the only path to >= 384^3 -- gets
    # its own driver-visible regression line with in-script parity so it
    # cannot silently rot between rounds (VERDICT r4 next #4)
    engc = StreamSolver3D(plan, variant="classic")
    out = engc.solve(dict(dev))  # warmup + compile
    cost_c = float(out["final_cost"])
    t_c = []
    for rep in (3, 4):
        di = dict(dev)
        di["Offset"] = dev["Offset"] + np.float32(rep * 1e-6)
        jax.block_until_ready(di["Offset"])
        t0 = time.perf_counter()
        out = engc.solve(di)
        t_c.append((time.perf_counter() - t0) * 1e3)
    ok = abs(cost_c - cost_xla) <= 2e-4 * abs(cost_xla)
    print(
        f"# aux volumetric_128_gn_classic(8x100): "
        f"stream3d_classic={min(t_c):.1f} ms "
        f"(T=({engc.tile_d},{engc.tile_h})) cost={cost_c:.6g} "
        f"(parity vs xla {'OK' if ok else 'FAIL'} rtol 2e-4)", file=err,
    )
    assert ok, f"classic 3-D kernel lost parity: {cost_c} vs {cost_xla}"


def aux_sfs(err):
    """shape_from_shading at the reference perf config (nonLinearIter=60,
    linearIter=10, examples/shape_from_shading/src/main.cpp:64-65) on the
    reference dataset -- the second north-star workload (BASELINE.md)."""
    import os

    import jax
    import jax.numpy as jnp
    import opt_tpu
    from opt_tpu import energies
    from opt_tpu.io.imagedump import read_imagedump

    data_dir = os.environ.get(
        "OPT_TPU_DATA", "/root/reference/examples/data"
    )
    prefix = os.path.join(data_dir, "shape_from_shading", "default")
    if not os.path.exists(prefix + "_initialUnknown.imagedump"):
        print("# aux sfs: dataset not found; skipped", file=err)
        return
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "examples"))
    from shape_from_shading import load_sfs_parameters

    init_unknown = read_imagedump(prefix + "_initialUnknown.imagedump")
    target_depth = read_imagedump(prefix + "_targetDepth.imagedump")
    target_intensity = read_imagedump(
        prefix + "_targetIntensity.imagedump")
    edge_masks = read_imagedump(prefix + "_maskEdgeMap.imagedump")
    H, W = init_unknown.shape[:2]
    inputs = {
        "X": init_unknown.copy(),
        "D_i": target_depth,
        "Im": target_intensity,
        "edgeMaskR": edge_masks[:H, :, 0].astype(np.float32)[..., None],
        "edgeMaskC": edge_masks[H:, :, 0].astype(np.float32)[..., None],
        **load_sfs_parameters(prefix + ".SFSSolverParameters"),
    }
    n_outer, n_lin = 60, 10
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.shape_from_shading,
                             "gaussNewtonGPU"), [W, H],
    )
    plan.set_solver_parameter("nIterations", n_outer)
    plan.set_solver_parameter("lIterations", n_lin)
    x, data = plan.bind(inputs)
    sp = plan._sp_device()
    sp["nIterations"] = jnp.asarray(n_outer, jnp.int32)
    st = plan._full_solve_fn(x, data, sp)
    _ = float(st["prev_cost"])
    times = []
    for rep in (1, 2, 3):
        xr = dict(x)
        xr["X"] = x["X"] + np.float32(rep * 1e-5)
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        st = plan._full_solve_fn(xr, data, sp)
        c = float(st["prev_cost"])
        times.append((time.perf_counter() - t0) * 1e3)
    print(
        f"# aux sfs_{W}x{H}_gn_solve(60x10): {min(times):.1f} ms "
        f"final_cost={c:.6g}", file=err,
    )



def aux_vmem_lm(err):
    """512^2 LM 8x400 through the round-5 auto route: the whole-solve
    VMEM kernel (3.61x over fused XLA measured, docs/sweep_tpu_r5.csv;
    also beats the r3 streamed engine it displaced in the routing
    order).  Parity asserted in-script so the LM-through-the-kernel
    path cannot silently rot between rounds."""
    import jax
    import jax.numpy as jnp
    import opt_tpu
    from opt_tpu import energies

    W = H = 512
    n_outer, n_lin = 8, 400
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.image_warping, "LMGPU"), [W, H])
    plan.set_solver_parameter("nIterations", n_outer)
    plan.set_solver_parameter("lIterations", n_lin)
    if jax.default_backend() == "tpu":
        assert plan._pick_engine("auto") == "vmem", (
            "512^2 LM must auto-route to the VMEM kernel on TPU")
    inputs = warp_inputs(W, H)
    dev = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
           for k, v in inputs.items()}

    # fused XLA reference (cost + time)
    x, data = plan.bind(inputs)
    sp = plan._sp_device()
    sp["nIterations"] = jnp.asarray(n_outer, jnp.int32)
    st = plan._full_solve_fn(x, data, sp)
    cost_xla = float(st["prev_cost"])
    t_xla = []
    for rep in (1, 2):
        xr = dict(x)
        xr["Offset"] = x["Offset"] + np.float32(rep * 1e-6)
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        st = plan._full_solve_fn(xr, data, sp)
        _ = float(st["prev_cost"])
        t_xla.append((time.perf_counter() - t0) * 1e3)

    from opt_tpu.ops import vmem_solver

    eng = vmem_solver.VmemSolver(plan)
    out = eng.solve(dict(dev))  # warmup + compile
    cost_v = float(out["final_cost"])
    ok = abs(cost_v - cost_xla) <= 2e-4 * abs(cost_xla)
    t_v = []
    for rep in (1, 2):
        di = dict(dev)
        di["Offset"] = dev["Offset"] + np.float32(rep * 1e-6)
        jax.block_until_ready(di["Offset"])
        t0 = time.perf_counter()
        out = eng.solve(di)
        t_v.append((time.perf_counter() - t0) * 1e3)
    print(
        f"# aux image_warping_512_lm_vmem(8x400): vmem={min(t_v):.1f} ms "
        f"xla={min(t_xla):.1f} ms speedup={min(t_xla)/min(t_v):.2f}x "
        f"cost_vmem={cost_v:.4f} cost_xla={cost_xla:.4f}", file=err,
    )
    assert ok, f"vmem LM lost parity: {cost_v} vs {cost_xla}"


def aux_solve_many(err):
    """Batched serving mode (Plan.solve_many): 64 independent 128^2
    image_warping solves in ONE vmapped dispatch vs 64 sequential
    dispatches -- tracks the measured 2.3x throughput win in the
    dispatch-dominated small-grid regime (docs/sweep_tpu_r3.csv;
    crossover: batching LOSES past ~512^2 where batched PCG carries
    exceed VMEM residency)."""
    import jax
    import jax.numpy as jnp
    import opt_tpu
    from opt_tpu import energies

    S, N, n_outer, n_lin = 128, 64, 8, 100
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.image_warping, "gaussNewtonGPU"),
        [S, S])
    plan.set_solver_parameter("nIterations", n_outer)
    plan.set_solver_parameter("lIterations", n_lin)
    batch = [warp_inputs(S, S, seed=s) for s in range(N)]

    x, data = plan.bind(batch[0])
    sp = plan._sp_device()
    sp["nIterations"] = jnp.asarray(n_outer, jnp.int32)
    _ = float(plan._full_solve_fn(x, data, sp)["prev_cost"])  # warm solo
    solo = []
    for rep in (1, 2):
        t0 = time.perf_counter()
        for s in range(N):
            xs, ds = plan.bind(batch[s])
            xs["Offset"] = xs["Offset"] + np.float32(rep * 1e-6)
            _ = float(plan._full_solve_fn(xs, ds, sp)["prev_cost"])
        solo.append((time.perf_counter() - t0) * 1e3)

    costs = plan.solve_many(batch)  # warm batched
    bt = []
    for rep in (1, 2):
        b2 = [dict(b) for b in batch]
        for b in b2:
            b["Offset"] = b["Offset"] + np.float32(rep * 1e-6)
        t0 = time.perf_counter()
        plan.solve_many(b2)
        bt.append((time.perf_counter() - t0) * 1e3)
    s_ms, b_ms = min(solo), min(bt)
    print(
        f"# aux solve_many_128x64(8x100): batched={b_ms:.1f} ms "
        f"({b_ms / N:.2f}/prob) solo_loop={s_ms:.1f} ms "
        f"speedup={s_ms / b_ms:.2f}x cost0={costs[0]:.6g}", file=err,
    )

if __name__ == "__main__":
    main()

