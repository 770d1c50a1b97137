"""Probe: whole-solve-in-VMEM engine past the stale 14 MB budget.

VERDICT r4 weak #7: the VMEM budget (vmem_solver.VMEM_BUDGET_BYTES) was
calibrated before 64-112 MB scoped-vmem was proven to compile and run on
v5e (CLAUDE.md Pallas constraints); 512^2 image_warping estimates 69 MB
padded and was never tried.  This probe measures the vmem engine vs the
fused XLA program at 256^2 and 512^2 (the flagship config 8x400 at
512^2; 8x100 at 256^2) with parity asserted.

Run alone -- owns the TPU.  Timing protocol per CLAUDE.md: warmup, fresh
perturbed unknowns per rep, scalar fetched to host, min over reps.
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["OPT_TPU_VMEM_BUDGET_MB"] = "112"

import numpy as np  # noqa: E402

from bench import warp_inputs  # noqa: E402

import opt_tpu  # noqa: E402
from opt_tpu import energies  # noqa: E402
from opt_tpu.ops import vmem_solver  # noqa: E402

sizes = [int(a) for a in sys.argv[1:]] or [256, 512]

for side in sizes:
    n_outer = 8
    n_lin = 400 if side >= 512 else 100
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.image_warping, "gaussNewtonGPU"),
        [side, side],
    )
    plan.set_solver_parameter("nIterations", n_outer)
    plan.set_solver_parameter("lIterations", n_lin)
    inputs = warp_inputs(side, side)

    est = vmem_solver.estimate_vmem_bytes(plan.funcs, False) / 2**20
    print(f"# {side}^2 GN {n_outer}x{n_lin}: vmem estimate {est:.1f} MB "
          f"(unpadded), supports={vmem_solver.supports(plan)}", flush=True)

    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402

    # device-resident inputs, perturbed on device per rep: the host
    # numpy path pays the ~40-60 MB/s relay transfer per solve, which
    # is not the engine's cost (CLAUDE.md timing protocol)
    dev = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
           for k, v in inputs.items()}
    ref = plan.solve(dict(dev), engine="xla")
    xs = []
    for rep in (1, 2):
        di = dict(dev)
        di["Offset"] = dev["Offset"] + np.float32(rep * 1e-6)
        jax.block_until_ready(di["Offset"])
        t0 = time.perf_counter()
        plan.solve(di, engine="xla")
        xs.append((time.perf_counter() - t0) * 1e3)
    print(f"# xla: {min(xs):.1f} ms cost={ref:.4f}", flush=True)

    try:
        eng = vmem_solver.VmemSolver(plan)
        out = eng.solve(dict(dev))
        cost_v = float(out["final_cost"])
        ts = []
        for rep in (1, 2):
            di = dict(dev)
            di["Offset"] = dev["Offset"] + np.float32(rep * 1e-6)
            jax.block_until_ready(di["Offset"])
            t0 = time.perf_counter()
            out = eng.solve(di)
            ts.append((time.perf_counter() - t0) * 1e3)
        ok = abs(cost_v - ref) <= 1e-4 * abs(ref)
        print(f"image_warping,{side},vmem,gaussNewtonGPU,{n_outer},"
              f"{n_lin},{min(ts):.1f},{cost_v:.6g},parity={'OK' if ok else 'FAIL'}"
              f",xla_ms={min(xs):.1f},speedup={min(xs)/min(ts):.2f}x",
              flush=True)
    except Exception:
        traceback.print_exc()
        print(f"image_warping,{side},vmem,gaussNewtonGPU,{n_outer},"
              f"{n_lin},FAILED", flush=True)
