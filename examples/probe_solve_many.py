"""Measure Plan.solve_many batched throughput on the real TPU.

Sequential solves of small grids are dispatch-dominated (~28 ms fixed
relay round-trip per dispatch, docs/ROOFLINE.md); one vmapped dispatch
over N lanes pays it once and fills the chip.  Prints ms/problem for
solo vs batched at several (size, batch) points.

Usage: python -u examples/probe_solve_many.py   (TPU; single-tenant!)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import warp_inputs  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import opt_tpu
    from opt_tpu import energies

    n_outer, n_linear = 8, 100
    for S, N in [(128, 64), (256, 16), (512, 8)]:
        state = opt_tpu.NewState()
        plan = state.problem_plan(
            state.problem_define(energies.image_warping,
                                 "gaussNewtonGPU"), [S, S])
        plan.set_solver_parameter("nIterations", n_outer)
        plan.set_solver_parameter("lIterations", n_linear)

        batch = [warp_inputs(S, S, seed=s) for s in range(N)]

        # solo path timing (full_solve dispatch per problem)
        x, data = plan.bind(batch[0])
        sp = plan._sp_device()
        sp["nIterations"] = jnp.asarray(n_outer, jnp.int32)
        st = plan._full_solve_fn(x, data, sp)  # compile + warm
        solo_cost0 = float(st["prev_cost"])
        solo = []
        for rep in (1, 2):
            t0 = time.perf_counter()
            for s in range(N):
                xs, ds = plan.bind(batch[s])
                xs["Offset"] = xs["Offset"] + np.float32(rep * 1e-6)
                st = plan._full_solve_fn(xs, ds, sp)
                _ = float(st["prev_cost"])
            solo.append((time.perf_counter() - t0) * 1e3)

        # batched path (one vmapped dispatch)
        costs = plan.solve_many(batch)  # compile + warm
        assert all(np.isfinite(c) for c in costs)
        assert abs(costs[0] - solo_cost0) <= 1e-4 * abs(solo_cost0), (
            costs[0], solo_cost0)
        bt = []
        for rep in (1, 2):
            b2 = [dict(b) for b in batch]
            for b in b2:
                b["Offset"] = b["Offset"] + np.float32(rep * 1e-6)
            t0 = time.perf_counter()
            plan.solve_many(b2)
            bt.append((time.perf_counter() - t0) * 1e3)

        s_ms, b_ms = min(solo), min(bt)
        print(f"{S}^2 x{N}: solo {s_ms:8.1f} ms ({s_ms/N:7.2f}/prob)  "
              f"batched {b_ms:8.1f} ms ({b_ms/N:7.2f}/prob)  "
              f"speedup {s_ms/b_ms:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
