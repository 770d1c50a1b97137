"""Hand-written whole-solve Pallas CG vs the generic solver (poisson)."""

import numpy as np
import pytest

import opt_tpu
from opt_tpu import energies
from opt_tpu.ops.poisson_pallas import PoissonPallasSolver


def make_inputs(W, H, seed=0):
    rng = np.random.RandomState(seed)
    base = (255 * rng.rand(H, W, 4)).astype(np.float32)
    base[..., 3] = 255.0
    target = (255 * rng.rand(H, W, 4)).astype(np.float32)
    target[..., 3] = 255.0
    mask = np.full((H, W, 1), 255.0, np.float32)
    mask[: H // 3] = 0.0  # top third excluded (M != 0 means excluded)
    mask[H // 3 :] = 0.0
    # solved region: interior box
    m = np.full((H, W, 1), 255.0, np.float32)  # excluded by default
    m[3 : H - 3, 4 : W - 4] = 0.0  # free
    return {"X": base, "T": target, "M": m}


def test_pallas_cg_matches_generic_gn_step():
    W, H = 40, 24
    inputs = make_inputs(W, H)
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.poisson_image_editing,
                             "gaussNewtonGPU"),
        [W, H],
    )
    L = 30
    plan.set_solver_parameter("nIterations", 1)
    plan.set_solver_parameter("lIterations", L)
    plan.init(inputs)
    plan.step()
    generic = plan.final_cost()

    hand = PoissonPallasSolver(plan).solve(inputs, n_iters=L)
    # per-channel CG step sizes make the hand-tuned solve at least as
    # good per iteration as the generic joint-alpha CG, and both
    # approach the same linear solution
    assert hand["final_cost"] <= generic * (1 + 1e-6)
    assert hand["final_cost"] == pytest.approx(generic, rel=0.05)


def test_pallas_cg_exact_parity_single_channel():
    """With one channel, per-channel CG == the generic joint CG exactly."""

    def poisson1(O):
        W, H = O.Dim("W", 0), O.Dim("H", 1)
        X = O.Unknown("X", O.opt_float, (W, H), 0)
        T = O.Array("T", O.opt_float, (W, H), 1)
        M = O.Array("M", O.opt_float, (W, H), 2)
        O.UsePreconditioner(False)
        O.Exclude(O.Not(O.eq(M(0, 0), 0)))
        for x, y in O.Stencil([(1, 0), (-1, 0), (0, 1), (0, -1)]):
            e = (X(0, 0) - X(x, y)) - (T(0, 0) - T(x, y))
            O.Energy(O.Select(O.InBounds(x, y), e, 0))

    W, H = 40, 24
    full = make_inputs(W, H)
    inputs = {k: (v[..., :1] if k in ("X", "T") else v)
              for k, v in full.items()}
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(poisson1, "gaussNewtonGPU"), [W, H]
    )
    L = 25
    plan.set_solver_parameter("nIterations", 1)
    plan.set_solver_parameter("lIterations", L)
    plan.init(inputs)
    plan.step()
    generic = plan.final_cost()
    hand = PoissonPallasSolver(plan).solve(inputs, n_iters=L)
    assert hand["final_cost"] == pytest.approx(generic, rel=1e-4)
