"""Whole-PCG-in-VMEM graph kernel (ops/graph_pcg_kernel.py): parity with
the XLA banded path in interpret mode.  A measured-slower engine kept as
the record of the no-autodiff in-kernel design (see module docstring)."""

import numpy as np
import pytest

import opt_tpu
from opt_tpu import energies
from opt_tpu.ops import graph_pcg_kernel as gpk


def _tri_grid(w, h):
    vid = np.arange(w * h).reshape(h, w)
    pairs = [(vid[:, :-1].ravel(), vid[:, 1:].ravel()),
             (vid[:-1, :].ravel(), vid[1:, :].ravel()),
             (vid[:-1, :-1].ravel(), vid[1:, 1:].ravel())]
    v0 = np.concatenate([a for a, b in pairs] + [b for a, b in pairs])
    v1 = np.concatenate([b for a, b in pairs] + [a for a, b in pairs])
    return v0.astype(np.int32), v1.astype(np.int32)


def _inputs(N, v0, v1, seed=0):
    rng = np.random.RandomState(seed)
    ur = rng.randn(N, 3).astype(np.float32)
    cons = np.full((N, 3), -1e7, np.float32)
    sel = rng.choice(N, max(4, N // 16), replace=False)
    cons[sel] = ur[sel] + 0.1
    return {"Offset": ur.copy(), "Angle": np.zeros((N, 3), np.float32),
            "UrShape": ur, "Constraints": cons,
            "w_fitSqrt": 2.0, "w_regSqrt": 1.0,
            "G": {"v0": v0, "v1": v1}}


@pytest.mark.parametrize("kind", ["gaussNewtonGPU", "LMGPU"])
def test_graph_kernel_matches_xla(kind):
    W = H = 20
    v0, v1 = _tri_grid(W, H)
    N, E = W * H, len(v0)
    inputs = _inputs(N, v0, v1)

    st = opt_tpu.NewState(graph_mode="banded")
    ref = st.problem_plan(
        st.problem_define(energies.arap_mesh_deformation, kind), [N, E])
    ref.set_solver_parameter("nIterations", 4)
    ref.set_solver_parameter("lIterations", 15)
    ref.init(inputs)
    while ref.step():
        pass
    ref_cost = ref.final_cost()

    st2 = opt_tpu.NewState(graph_mode="banded")
    plan = st2.problem_plan(
        st2.problem_define(energies.arap_mesh_deformation, kind), [N, E])
    plan.set_solver_parameter("nIterations", 4)
    plan.set_solver_parameter("lIterations", 15)
    plan.bind(inputs)
    assert gpk.supports(plan)
    out = gpk.GraphPcgKernel(plan).solve(inputs)
    # near-zero optimum amplifies relative drift (f32 reassociation in
    # the hat space), same slack as the banded-vs-take golden
    assert out["final_cost"] == pytest.approx(ref_cost, rel=1e-3)


def test_graph_kernel_rejects_grid():
    from tests.test_solver_dense import warp_energy, warp_inputs

    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(warp_energy, "gaussNewtonGPU"), [16, 16])
    plan.bind(warp_inputs(16, 16, seed=3))
    assert not gpk.supports(plan)
