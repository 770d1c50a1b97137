"""Materialized-Jacobian mode parity.

The analogue of the reference's matarg matrix (test_final_cost.py:93-96):
matrix-free vs materialized J^T J vs fused J^T J must agree on final cost.
Also validates the CSR export (dumpJ parity) against jax.jacfwd.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import opt_tpu
from tests.test_solver_dense import (
    arap_graph_energy,
    arap_inputs,
    warp_energy,
    warp_inputs,
)

CONFIGS = [
    (False, False),  # matrix-free
    (True, False),  # materialized J
    (True, True),  # materialized + fused J^T J
]


def run_cfg(energy, inputs, dims, kind, mat, fused, n=2, l_it=6):
    state = opt_tpu.NewState(
        use_materialized_jacobian=mat, use_fused_jtj=fused
    )
    plan = state.problem_plan(state.problem_define(energy, kind), dims)
    plan.set_solver_parameter("nIterations", n)
    plan.set_solver_parameter("lIterations", l_it)
    plan.init(inputs)
    while plan.step():
        pass
    return plan.final_cost()


@pytest.mark.parametrize("kind", ["gaussNewtonGPU", "LMGPU"])
def test_materialization_matrix_grid(kind):
    inputs = warp_inputs(6, 5, seed=2)
    costs = [
        run_cfg(warp_energy, inputs, [6, 5], kind, m, f)
        for m, f in CONFIGS
    ]
    for c in costs[1:]:
        assert c == pytest.approx(costs[0], rel=1e-5), costs


def test_materialization_matrix_graph():
    inputs = arap_inputs(6, seed=5)
    costs = [
        run_cfg(arap_graph_energy, inputs, [6, 12], "gaussNewtonGPU", m, f)
        for m, f in CONFIGS
    ]
    for c in costs[1:]:
        assert c == pytest.approx(costs[0], rel=1e-5), costs


def test_csr_export_matches_dense_jacobian():
    """dumpJ parity: the exported CSR equals jax.jacfwd of the flattened
    residuals."""
    from jax.flatten_util import ravel_pytree
    from opt_tpu.sparse.materialize import MaterializedJacobian

    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(warp_energy, "gaussNewtonGPU"), [5, 4]
    )
    x, data = plan.bind(warp_inputs(5, 4, seed=9))
    mat = MaterializedJacobian(plan.funcs, x, data)
    J = mat.to_scipy_csr(data).toarray()

    xf, unravel = ravel_pytree(x)

    def resid_flat(v):
        fields = plan.funcs.residuals_solve(unravel(v), data)
        return jnp.concatenate([f.reshape(-1) for f in fields])

    Jref = np.asarray(jax.jacfwd(resid_flat)(xf))
    np.testing.assert_allclose(J, Jref, rtol=1e-4, atol=1e-5)


def test_validate_csr():
    """CSR validity checker (solverGPUGaussNewton.t:1679-1701 parity):
    the exported J passes; corrupted structures are flagged."""
    from opt_tpu.sparse.materialize import MaterializedJacobian, validate_csr

    state = opt_tpu.NewState(use_materialized_jacobian=True)
    plan = state.problem_plan(
        state.problem_define(warp_energy, "gaussNewtonGPU"), [5, 4])
    x, data = plan.bind(warp_inputs(5, 4, seed=9))
    J = MaterializedJacobian(plan.funcs, x, data).to_scipy_csr(data)
    assert validate_csr(J) == []

    # corrupt: unsorted colInd within a row
    bad = J.copy()
    row = slice(bad.indptr[0], bad.indptr[1])
    if bad.indptr[1] - bad.indptr[0] > 1:
        bad.indices[row] = bad.indices[row][::-1]
        errs = validate_csr(bad)
        assert any("sorted" in e for e in errs)

    # corrupt: out-of-range column index
    bad2 = J.copy()
    bad2.indices[0] = J.shape[1] + 5
    errs = validate_csr(bad2)
    assert any("out of range" in e for e in errs)
