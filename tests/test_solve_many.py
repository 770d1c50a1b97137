"""Batched multi-problem solve (Plan.solve_many): N independent problem
instances in ONE vmapped dispatch, optionally data-parallel over a mesh.

Contract: each lane's final cost matches solving that instance alone at
f32 tolerance -- including LM, whose per-lane early exits must keep
single-problem semantics under vmap's while_loop masking.
"""

import numpy as np
import pytest

import opt_tpu
from tests.test_solver_dense import warp_energy, warp_inputs


def _solo_costs(kind, inputs_list, W, H, n, l):
    costs = []
    for inp in inputs_list:
        state = opt_tpu.NewState()
        plan = state.problem_plan(
            state.problem_define(warp_energy, kind), [W, H]
        )
        plan.set_solver_parameter("nIterations", n)
        plan.set_solver_parameter("lIterations", l)
        costs.append(plan.solve(inp))
    return costs


@pytest.mark.parametrize("kind,n,l", [
    ("gaussNewtonGPU", 3, 7),
    ("LMGPU", 6, 5),     # long enough that lanes exit at different iters
])
def test_solve_many_matches_solo(kind, n, l):
    W, H = 9, 7
    inputs_list = [warp_inputs(W, H, seed=s) for s in (0, 1, 2)]
    # make lane 1 converge much earlier (LM: exercises per-lane done)
    inputs_list[1]["Offset"] = 1e-4 * inputs_list[1]["Offset"]
    inputs_list[1]["Angle"] = 1e-4 * inputs_list[1]["Angle"]
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(warp_energy, kind), [W, H]
    )
    plan.set_solver_parameter("nIterations", n)
    plan.set_solver_parameter("lIterations", l)
    costs = plan.solve_many(inputs_list)
    solo = _solo_costs(kind, inputs_list, W, H, n, l)
    np.testing.assert_allclose(costs, solo, rtol=2e-5)
    # batched unknowns are retrievable per lane and finite
    x0 = plan.batch_unknowns(0)
    assert set(x0) == {"Offset", "Angle"}
    assert all(np.isfinite(v).all() for v in x0.values())


def test_solve_many_sharded_mesh():
    """Data-parallel serving: batch axis sharded over the 8-device CPU
    mesh; parity with the unsharded batch."""
    from opt_tpu.parallel import mesh as pmesh

    W, H = 9, 7
    inputs_list = [warp_inputs(W, H, seed=s) for s in range(8)]
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(warp_energy, "gaussNewtonGPU"), [W, H]
    )
    plan.set_solver_parameter("nIterations", 2)
    plan.set_solver_parameter("lIterations", 6)
    m = pmesh.make_mesh(8)
    costs = plan.solve_many(inputs_list, mesh=m)
    solo = _solo_costs("gaussNewtonGPU", inputs_list, W, H, 2, 6)
    np.testing.assert_allclose(costs, solo, rtol=2e-5)


def test_solve_many_rejects_graphs_and_bad_batch():
    from tests.test_solver_dense import arap_graph_energy, arap_inputs

    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(arap_graph_energy, "gaussNewtonGPU"), [6, 12]
    )
    with pytest.raises(NotImplementedError):
        plan.solve_many([arap_inputs(6)])

    from opt_tpu.parallel import mesh as pmesh

    W, H = 9, 7
    plan2 = opt_tpu.NewState().problem_plan(
        opt_tpu.NewState().problem_define(warp_energy, "gaussNewtonGPU"),
        [W, H],
    )
    with pytest.raises(ValueError):
        plan2.solve_many(
            [warp_inputs(W, H, seed=s) for s in range(3)],
            mesh=pmesh.make_mesh(8),
        )
