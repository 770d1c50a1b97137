"""LM at 8192^2 through the public Plan.solve auto-engine path.

GN 8192^2 is measured (21.4 s 8x100, docs/sweep_tpu_r3.csv); this
probes the LM counterpart: classic streamed kernel (scs/Q/zeta in-
kernel) + the strip-mined chunked outer step.  Neither the fused XLA
program (32.7 GB at compile) nor the reference GPU backend can run
this size at all.

Run with OPT_TPU_STREAM_VMEM_MB=112 (T=32; the default 48 MB budget
gives T=8 = 1024 issue-bound tiles/sweep, measured 191 s vs 118 s).

--device: build the inputs ON DEVICE and pass
solve(donate_inputs=True) -- the production serving shape.  The relay
moves host->device at only ~40-60 MB/s, so the default host-numpy mode
pays ~40-60 s uploading the 2 GB input set per fresh solve; the
device-donated mode measured 74.7-84.5 s total (vs ~108 s host).
NOTE: a HELD device-resident copy of the inputs does not fit -- the
solve occupies ~all of HBM; donation (relinquishing the buffers) is
required at this size.

Usage: python -u examples/probe_8192_lm.py [--device]  (TPU; single-tenant!)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import warp_inputs  # noqa: E402


def dev_inputs(S, seed):
    """warp_inputs built on device (no host transfer)."""
    import jax
    import jax.numpy as jnp

    k = jax.random.PRNGKey(seed)
    ur = jax.random.normal(k, (S, S, 2), jnp.float32)
    cons = jnp.full((S, S, 2), -1.0, jnp.float32)
    band = jnp.abs(jax.random.normal(jax.random.fold_in(k, 1),
                                     (S // 20 + 1, S, 2), jnp.float32))
    cons = cons.at[::20, :].set(band[: cons[::20].shape[0]])
    return {
        "Offset": jnp.zeros((S, S, 2), jnp.float32),
        "Angle": jnp.zeros((S, S, 1), jnp.float32),
        "UrShape": ur,
        "Constraints": cons,
        "Mask": jnp.zeros((S, S, 1), jnp.float32),
        "w_fitSqrt": float(np.sqrt(0.5)),
        "w_regSqrt": float(np.sqrt(2.0)),
    }


def main():
    import jax
    import opt_tpu
    from opt_tpu import energies

    device = "--device" in sys.argv
    S, n_outer, n_lin = 8192, 8, 100
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.image_warping, "LMGPU"), [S, S])
    plan.set_solver_parameter("nIterations", n_outer)
    plan.set_solver_parameter("lIterations", n_lin)
    print("engine:", plan._pick_engine("auto"), flush=True)

    def solve(rep):
        if device:
            d = dev_inputs(S, rep)
            jax.block_until_ready(d)
            t0 = time.perf_counter()
            c = plan.solve(d, donate_inputs=True)
        else:
            inputs = warp_inputs(S, S)
            inputs["Offset"] = inputs["Offset"] + np.float32(rep * 1e-6)
            t0 = time.perf_counter()
            c = plan.solve(inputs)
        return (time.perf_counter() - t0) * 1e3, c

    t0 = time.perf_counter()
    _, c0 = solve(0)  # compile + warm
    print(f"warm solve (incl compile): {time.perf_counter()-t0:.1f} s "
          f"final_cost={c0:.6g}", flush=True)
    times = []
    for rep in (1, 2):
        dt, c = solve(rep)
        times.append(dt)
        print(f"rep {rep}: {dt:.1f} ms cost={c:.6g}", flush=True)
    print(f"BEST: {min(times):.1f} ms LM 8x{n_lin} at {S}^2 "
          f"({'device-donated' if device else 'host'} inputs)",
          flush=True)


if __name__ == "__main__":
    main()
