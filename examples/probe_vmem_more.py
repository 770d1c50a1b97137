"""Probe: VMEM whole-solve coverage beyond the flagship.

Measures the engine vs fused XLA (device-resident reps, CLAUDE.md
protocol) on workloads the round-5 auto-route could now touch:

  sfs          shape_from_shading 640x480 at the reference perf config
               (60x10) -- the second north-star workload
  warp_lm      image_warping 512^2 LMGPU 8x400 (LM through the kernel
               is unmeasured; auto keeps LM on xla until this says
               otherwise)
  poisson      poisson_image_editing 256^2 / 384^2 GN 8x100

Run alone -- owns the TPU.
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OPT_TPU_VMEM_BUDGET_MB", "112")

import numpy as np  # noqa: E402

import opt_tpu  # noqa: E402
from opt_tpu import energies  # noqa: E402
from opt_tpu.ops import vmem_solver  # noqa: E402


def run_case(tag, energy, dims, inputs, kind="gaussNewtonGPU",
             n_outer=8, n_lin=100, perturb="X"):
    import jax
    import jax.numpy as jnp

    state = opt_tpu.NewState()
    plan = state.problem_plan(state.problem_define(energy, kind), dims)
    plan.set_solver_parameter("nIterations", n_outer)
    plan.set_solver_parameter("lIterations", n_lin)
    est = vmem_solver.estimate_vmem_bytes(
        plan.funcs, plan.config.uses_lambda) / 2**20
    sup = vmem_solver.supports(plan)
    print(f"# {tag} {kind} {n_outer}x{n_lin}: estimate {est:.1f} MB "
          f"supports={sup}", flush=True)
    if not sup:
        return
    dev = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
           for k, v in inputs.items()}
    ref = plan.solve(dict(dev), engine="xla")
    xs = []
    for rep in (1, 2):
        di = dict(dev)
        di[perturb] = dev[perturb] + np.float32(rep * 1e-6)
        jax.block_until_ready(di[perturb])
        t0 = time.perf_counter()
        plan.solve(di, engine="xla")
        xs.append((time.perf_counter() - t0) * 1e3)
    try:
        eng = vmem_solver.VmemSolver(plan)
        out = eng.solve(dict(dev))
        cost_v = float(out["final_cost"])
        ts = []
        for rep in (1, 2):
            di = dict(dev)
            di[perturb] = dev[perturb] + np.float32(rep * 1e-6)
            jax.block_until_ready(di[perturb])
            t0 = time.perf_counter()
            out = eng.solve(di)
            ts.append((time.perf_counter() - t0) * 1e3)
        ok = abs(cost_v - ref) <= 2e-4 * abs(ref)
        print(f"{tag},{kind},{n_outer},{n_lin},{min(ts):.1f},"
              f"{cost_v:.6g},parity={'OK' if ok else 'FAIL'},"
              f"xla_cost={ref:.6g},"
              f"xla_ms={min(xs):.1f},speedup={min(xs)/min(ts):.2f}x",
              flush=True)
    except Exception:
        traceback.print_exc()
        print(f"{tag},{kind},{n_outer},{n_lin},FAILED", flush=True)


which = sys.argv[1:] or ["sfs", "warp_lm", "poisson"]

if "sfs" in which:
    from opt_tpu.io.imagedump import read_imagedump

    data_dir = os.environ.get("OPT_TPU_DATA",
                              "/root/reference/examples/data")
    prefix = os.path.join(data_dir, "shape_from_shading", "default")
    if os.path.exists(prefix + "_initialUnknown.imagedump"):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from shape_from_shading import load_sfs_parameters

        init_unknown = read_imagedump(
            prefix + "_initialUnknown.imagedump")
        H, W = init_unknown.shape[:2]
        edge_masks = read_imagedump(prefix + "_maskEdgeMap.imagedump")
        inputs = {
            "X": init_unknown.copy(),
            "D_i": read_imagedump(prefix + "_targetDepth.imagedump"),
            "Im": read_imagedump(
                prefix + "_targetIntensity.imagedump"),
            "edgeMaskR": edge_masks[:H, :, 0].astype(
                np.float32)[..., None],
            "edgeMaskC": edge_masks[H:, :, 0].astype(
                np.float32)[..., None],
            **load_sfs_parameters(prefix + ".SFSSolverParameters"),
        }
        run_case(f"sfs_{W}x{H}", energies.shape_from_shading, [W, H],
                 inputs, n_outer=60, n_lin=10)
    else:
        print("# sfs dataset not found; skipped", flush=True)

if "warp_lm" in which:
    from bench import warp_inputs

    run_case("image_warping_512", energies.image_warping, [512, 512],
             warp_inputs(512, 512), kind="LMGPU", n_outer=8,
             n_lin=400, perturb="Offset")

if "warp_lm_256" in which:
    from bench import warp_inputs

    run_case("image_warping_256", energies.image_warping, [256, 256],
             warp_inputs(256, 256), kind="LMGPU", n_outer=8,
             n_lin=100, perturb="Offset")

if "intrinsic" in which:
    # multi-unknown (r 3ch + s 1ch), r_const alias, L_p IRLS pow --
    # the remaining auto-routed 2-D energy shape never measured
    # through the kernel
    def intrinsic_inputs(W, H, seed=3):
        rng = np.random.RandomState(seed)
        im = rng.rand(H, W, 3).astype(np.float32) + 0.1
        return {"r": np.log(im) * 0.5, "s": np.zeros((H, W, 1), np.float32),
                "i": np.log(im),
                "w_fitSqrt": np.float32(np.sqrt(500.0)),
                "w_regSqrtAlbedo": np.float32(np.sqrt(1000.0)),
                "w_regSqrtShading": np.float32(np.sqrt(10000.0)),
                "pNorm": np.float32(0.8)}

    run_case("intrinsic_512", energies.intrinsic_image_decomposition,
             [512, 512], intrinsic_inputs(512, 512), perturb="r")

if "poisson" in which:
    def poisson_inputs(W, H, seed=1):
        rng = np.random.RandomState(seed)
        t0 = rng.rand(H, W, 4).astype(np.float32)
        mask = np.ones((H, W, 1), np.float32)
        mask[H // 4: -H // 4, W // 4: -W // 4] = 0
        return {"X": rng.rand(H, W, 4).astype(np.float32),
                "T": t0, "M": mask}

    for s in (256, 384):
        run_case(f"poisson_{s}", energies.poisson_image_editing,
                 [s, s], poisson_inputs(s, s))

if "poisson512" in which:
    def poisson_inputs(W, H, seed=1):
        rng = np.random.RandomState(seed)
        t0 = rng.rand(H, W, 4).astype(np.float32)
        mask = np.ones((H, W, 1), np.float32)
        mask[H // 4: -H // 4, W // 4: -W // 4] = 0
        return {"X": rng.rand(H, W, 4).astype(np.float32),
                "T": t0, "M": mask}

    run_case("poisson_512", energies.poisson_image_editing,
             [512, 512], poisson_inputs(512, 512))
