"""LM at 8192^2 through the public Plan.solve auto-engine path.

GN 8192^2 is measured (21.4 s 8x100, docs/sweep_tpu_r3.csv); this
probes the LM counterpart: classic streamed kernel (scs/Q/zeta in-
kernel) + the strip-mined chunked outer step.  Neither the fused XLA
program (32.7 GB at compile) nor the reference GPU backend can run
this size at all.

Usage: python -u examples/probe_8192_lm.py  (TPU; single-tenant!)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import warp_inputs  # noqa: E402


def main():
    import opt_tpu
    from opt_tpu import energies

    S, n_outer, n_lin = 8192, 8, 100
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.image_warping, "LMGPU"), [S, S])
    plan.set_solver_parameter("nIterations", n_outer)
    plan.set_solver_parameter("lIterations", n_lin)
    print("engine:", plan._pick_engine("auto"), flush=True)
    inputs = warp_inputs(S, S)

    t0 = time.perf_counter()
    c0 = plan.solve(inputs)  # compile + warm
    print(f"warm solve (incl compile): {time.perf_counter()-t0:.1f} s "
          f"final_cost={c0:.6g}", flush=True)
    times = []
    for rep in (1, 2):
        inputs["Offset"] = inputs["Offset"] + np.float32(rep * 1e-6)
        t0 = time.perf_counter()
        c = plan.solve(inputs)
        times.append((time.perf_counter() - t0) * 1e3)
        print(f"rep {rep}: {times[-1]:.1f} ms cost={c:.6g}", flush=True)
    print(f"BEST: {min(times):.1f} ms LM 8x{n_lin} at {S}^2", flush=True)


if __name__ == "__main__":
    main()
