"""Probe: solo-loop solve_many lanes through the VMEM kernel (round 5).

At batch x pixels past the batching win region the auto guardrail
routes solve_many to the sequential solo loop; each lane now takes the
whole-solve VMEM kernel when eligible.  Measures 512^2 x 4 GN 8x100
(the measured 0.53x batched regime, docs/sweep_tpu_r3.csv): xla lanes
vs vmem lanes, parity per lane.

Run alone -- owns the TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import opt_tpu  # noqa: E402
from opt_tpu import energies  # noqa: E402
from bench import warp_inputs  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

S, N, n_outer, n_lin = 512, 4, 8, 100
state = opt_tpu.NewState()
plan = state.problem_plan(
    state.problem_define(energies.image_warping, "gaussNewtonGPU"), [S, S])
plan.set_solver_parameter("nIterations", n_outer)
plan.set_solver_parameter("lIterations", n_lin)
batch = [warp_inputs(S, S, seed=s) for s in range(N)]

assert plan._pick_engine("auto") == "vmem", "512^2 must route vmem on TPU"

# both paths through the SAME public surface (solve_many's solo loop,
# host-numpy inputs per lane -- the serving call pattern); the only
# difference is the per-lane engine, toggled via OPT_TPU_ENGINE
def time_solo(tag):
    costs = plan.solve_many(batch)  # warmup + compile
    ts = []
    for rep in (1, 2):
        b2 = [dict(b) for b in batch]
        for b in b2:
            b["Offset"] = b["Offset"] + np.float32(rep * 1e-6)
        t0 = time.perf_counter()
        plan.solve_many(b2)
        ts.append((time.perf_counter() - t0) * 1e3)
    return costs, min(ts)

os.environ["OPT_TPU_ENGINE"] = "xla"
assert plan._pick_engine("auto") == "xla"
costs_xla, xla_ms = time_solo("xla")
del os.environ["OPT_TPU_ENGINE"]
assert plan._pick_engine("auto") == "vmem"
costs_v, v_ms = time_solo("vmem")
t_xla, t_v = [xla_ms], [v_ms]

ok = all(abs(a - b) <= 2e-4 * abs(a) for a, b in zip(costs_xla, costs_v))
print(f"solve_many_512x{N}_solo,{n_outer},{n_lin},"
      f"vmem_lanes={min(t_v):.1f}ms,xla_lanes={min(t_xla):.1f}ms,"
      f"speedup={min(t_xla)/min(t_v):.2f}x,parity={'OK' if ok else 'FAIL'},"
      f"cost0={costs_v[0]:.6g}", flush=True)
