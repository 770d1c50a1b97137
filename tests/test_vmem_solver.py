"""Whole-solve-in-VMEM Pallas solver vs the standard jitted path."""

import numpy as np
import pytest

import opt_tpu
from opt_tpu.ops import vmem_solver
from tests.test_solver_dense import warp_energy, warp_inputs
from tests.test_poisson_pallas import make_inputs as poisson_inputs
from opt_tpu import energies


def run_generic(energy, dims, kind, inputs, n, l):
    state = opt_tpu.NewState()
    plan = state.problem_plan(state.problem_define(energy, kind), dims)
    plan.set_solver_parameter("nIterations", n)
    plan.set_solver_parameter("lIterations", l)
    plan.init(inputs)
    while plan.step():
        pass
    return plan


@pytest.mark.parametrize("kind", ["gaussNewtonGPU", "LMGPU"])
def test_vmem_solver_matches_generic_warp(kind):
    inputs = warp_inputs(8, 6, seed=31)
    plan = run_generic(warp_energy, [8, 6], kind, inputs, 2, 6)
    want = plan.final_cost()
    assert vmem_solver.supports(plan)
    vs = vmem_solver.VmemSolver(plan)
    got = vs.solve(inputs)
    assert got["final_cost"] == pytest.approx(want, rel=1e-5)
    for n, arr in plan.unknowns().items():
        np.testing.assert_allclose(
            got["x"][n], arr, rtol=1e-4, atol=1e-5, err_msg=n
        )


def test_vmem_solver_matches_generic_poisson():
    inputs = poisson_inputs(32, 20)
    plan = run_generic(
        energies.poisson_image_editing, [32, 20], "gaussNewtonGPU",
        inputs, 1, 25,
    )
    want = plan.final_cost()
    assert vmem_solver.supports(plan)
    got = vmem_solver.VmemSolver(plan).solve(inputs)
    assert got["final_cost"] == pytest.approx(want, rel=1e-5)


def test_vmem_solver_rejects_graphs_and_big():
    from tests.test_solver_dense import arap_graph_energy, arap_inputs

    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(arap_graph_energy, "gaussNewtonGPU"), [6, 12]
    )
    assert not vmem_solver.supports(plan)


def test_plan_solve_vmem_engine():
    inputs = warp_inputs(8, 6, seed=31)
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(warp_energy, "gaussNewtonGPU"), [8, 6]
    )
    plan.set_solver_parameter("nIterations", 2)
    plan.set_solver_parameter("lIterations", 6)
    want = run_generic(warp_energy, [8, 6], "gaussNewtonGPU", inputs, 2, 6
                       ).final_cost()
    got = plan.solve(inputs, engine="vmem")
    assert got == pytest.approx(want, rel=1e-5)
    assert plan.final_cost() == pytest.approx(want, rel=1e-5)
