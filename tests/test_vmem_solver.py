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


def _sfs_inputs(W, H, seed=7):
    rng = np.random.RandomState(seed)
    depth = 1.0 + 0.1 * rng.rand(H, W).astype(np.float32)
    depth[:, :3] = 0.0  # invalid band exercises Exclude/depth_valid
    return {
        "X": (depth + 0.01 * rng.rand(H, W).astype(np.float32))[..., None],
        "D_i": depth[..., None],
        "Im": rng.rand(H, W).astype(np.float32)[..., None],
        "edgeMaskR": (rng.rand(H, W) > 0.2).astype(np.uint8)[..., None],
        "edgeMaskC": (rng.rand(H, W) > 0.2).astype(np.uint8)[..., None],
        "w_p": np.float32(1.0), "w_s": np.float32(2.0),
        "w_g": np.float32(0.5),
        "f_x": np.float32(100.0), "f_y": np.float32(100.0),
        "u_x": np.float32(W / 2), "u_y": np.float32(H / 2),
        **{f"L_{k}": np.float32(0.1 * k) for k in range(1, 10)},
    }


def test_kernel_safe_funcs_match_default_sfs():
    """kernel_safe (roll-shift, channel-plane) evaluation of the real
    SFS energy — ComputedArray chain rule, Index() coords, Exclude,
    uint8 masks — matches the default funcs to f32 rounding at the
    same x.  This is the TIGHT semantic check for the VMEM kernel on
    SFS; whole-solve final costs legitimately drift more (see
    test_vmem_solver_sfs_within_sensitivity)."""
    import jax.numpy as jnp
    from opt_tpu.compile.plan_fns import ProblemFunctions

    W, H = 32, 16
    inputs = _sfs_inputs(W, H)
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.shape_from_shading,
                             "gaussNewtonGPU"), [W, H])
    x0, data0 = plan.bind(inputs)
    pf1 = ProblemFunctions(plan.spec, plan.funcs.dtype, kernel_safe=True)
    x1 = {"X": [jnp.asarray(x0["X"][..., 0])]}
    data1 = {
        "images": {k: [v[..., c] for c in range(v.shape[-1])]
                   for k, v in data0["images"].items()},
        "params": data0["params"], "graph_indices": {},
    }
    c0 = float(plan.funcs.cost(x0, data0))
    c1 = float(pf1.cost(x1, data1))
    assert c1 == pytest.approx(c0, rel=1e-5)
    r0, _, jt0 = plan.funcs.linearize(x0, data0)
    r1, _, jt1 = pf1.linearize(x1, data1)
    for a, b in zip(r0, r1):
        np.testing.assert_allclose(
            np.asarray(a).ravel(), np.asarray(b).ravel(),
            rtol=1e-6, atol=1e-6)
    g0 = np.asarray(plan.funcs.jtf(r0, jt0)["X"]).ravel()
    g1 = np.asarray(jnp.stack(pf1.jtf(r1, jt1)["X"], -1)).ravel()
    np.testing.assert_allclose(g0, g1, rtol=1e-4, atol=2e-4)
    d0 = np.asarray(plan.funcs.diag_jtj(x0, data0)["X"]).ravel()
    d1 = np.asarray(jnp.stack(pf1.diag_jtj(x1, data1)["X"], -1)).ravel()
    np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-5)


def test_vmem_solver_sfs_within_sensitivity():
    """Whole-solve SFS through the VMEM kernel (interpret mode).

    SFS is chaotically sensitive mid-convergence: a 1e-6 input
    perturbation through the PLAIN XLA engine moves the 4x10 final
    cost by ~1.1e-3 relative (measured on this config), so kernel-vs-
    xla final costs cannot be pinned at the golden 1e-5 — the funcs-
    level test above pins semantics instead, and this test bounds the
    end-to-end drift by the problem's own sensitivity envelope
    (measured: 3.3e-4 unpadded, 1.9e-3 lane-padded; docs/GUIDE.md
    tolerance table)."""
    W, H = 32, 16
    inputs = _sfs_inputs(W, H)
    plan = run_generic(energies.shape_from_shading, [W, H],
                       "gaussNewtonGPU", inputs, 2, 6)
    want = plan.final_cost()
    assert vmem_solver.supports(plan)
    got = vmem_solver.VmemSolver(plan).solve(inputs)
    assert got["final_cost"] == pytest.approx(want, rel=5e-3)


def test_vmem_solver_rejects_graphs_and_big():
    from tests.test_solver_dense import arap_graph_energy, arap_inputs

    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(arap_graph_energy, "gaussNewtonGPU"), [6, 12]
    )
    assert not vmem_solver.supports(plan)


def test_plan_solve_vmem_falls_back_to_xla(monkeypatch):
    """The budget is a MODEL of Mosaic's stack allocation: a kernel
    that fails past it must not break the solve -- Plan.solve warns
    and reruns on the fused XLA program (runtime/api.py fallback;
    this is what makes the optimistic 108 MB budget safe)."""
    import warnings

    inputs = warp_inputs(8, 6, seed=31)
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(warp_energy, "gaussNewtonGPU"), [8, 6]
    )
    plan.set_solver_parameter("nIterations", 2)
    plan.set_solver_parameter("lIterations", 6)
    want = plan.solve(dict(inputs), engine="xla")

    def boom(self, *a, **k):
        raise RuntimeError("synthetic Mosaic compile failure")

    monkeypatch.setattr(vmem_solver.VmemSolver, "solve", boom)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = plan.solve(dict(inputs), engine="vmem")
    assert got == pytest.approx(want, rel=1e-5)
    assert any("falling back to xla" in str(x.message) for x in w)


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
