"""Pallas fused PCG update kernel: correctness vs plain-JAX formulas."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import opt_tpu
from opt_tpu.ops.pcg_pallas import fused_pcg_update
from tests.test_solver_dense import warp_energy, warp_inputs


@pytest.mark.parametrize("n", [7, 1024, 40000])
@pytest.mark.parametrize("uses_lambda", [False, True])
def test_fused_update_matches_reference(n, uses_lambda):
    rng = np.random.RandomState(n)
    f32 = lambda: jnp.asarray(rng.randn(n).astype(np.float32))
    p, ap, delta, r, pre, b = (f32() for _ in range(6))
    alpha = jnp.float32(0.37)
    d2, r2, z2, bn, q = fused_pcg_update(
        alpha, p, ap, delta, r, pre, b, uses_lambda=uses_lambda,
        interpret=True,
    )
    dref = delta + alpha * p
    rref = r - alpha * ap
    zref = pre * rref
    np.testing.assert_allclose(d2, dref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(r2, rref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(z2, zref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(bn), float(jnp.vdot(zref, rref)),
                               rtol=1e-4)
    if uses_lambda:
        np.testing.assert_allclose(
            float(q), float(0.5 * jnp.vdot(dref, rref + b)), rtol=1e-4
        )


def test_solver_with_pallas_pcg_matches():
    inputs = warp_inputs(6, 5, seed=8)

    def run(use_pallas):
        state = opt_tpu.NewState(use_pallas=use_pallas)
        plan = state.problem_plan(
            state.problem_define(warp_energy, "gaussNewtonGPU"), [6, 5]
        )
        plan.set_solver_parameter("nIterations", 2)
        plan.set_solver_parameter("lIterations", 6)
        plan.init(inputs)
        while plan.step():
            pass
        return plan.final_cost()

    assert run(True) == pytest.approx(run(False), rel=1e-5)
