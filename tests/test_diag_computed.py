"""diag(J^T J) through the ComputedArray chain rule vs a dense oracle.

The chain-rule leaf-partials path (plan_fns._leaf_partials_computed,
round 3) replaces the inline-expansion view for ComputedArray groups;
this pins it against sum-of-squared-J-columns from jax.jacfwd on a
small SFS-like energy (shading buffer with unknown taps at three
offsets, read at three residual taps)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import opt_tpu


def shading_energy(O):
    """Miniature shape_from_shading: ComputedArray over unknown reads,
    consumed at several offsets (reference:
    examples/shape_from_shading/shape_from_shading.t:1-89)."""
    W, H = O.Dim("W", 0), O.Dim("H", 1)
    X = O.Unknown("X", O.opt_float, (W, H), 0)
    Im = O.Array("Im", O.opt_float, (W, H), 1)
    n_x = X(0, -1) * (X(0, 0) - X(-1, 0))
    n_y = X(-1, 0) * (X(0, 0) - X(0, -1))
    B = O.ComputedArray("B", (W, H), n_x * n_x + 0.5 * n_y + X(0, 0))
    O.Energy(O.Select(O.InBoundsExpanded(0, 0, 1),
                      (B(0, 0) - B(1, 0)) - Im(0, 0), 0))
    O.Energy(O.Select(O.InBoundsExpanded(0, 0, 1),
                      (B(0, 0) - B(0, 1)) - Im(0, 1), 0))
    # a direct (non-computed) term sharing leaves with the taps
    O.Energy(0.3 * (X(0, 0) - Im(0, 0)))


def _oracle_diag(funcs, x, data):
    """sum_r J[r, v]^2 via dense jacfwd on the masked residuals."""
    def res(xv):
        fields = funcs.residuals_solve({"X": xv}, data)
        return jnp.concatenate(
            [jnp.ravel(f) for f in jax.tree_util.tree_leaves(fields)]
        )

    J = jax.jacfwd(res)(x["X"])          # (n_res, H, W, 1)
    return jnp.sum(J * J, axis=0)


def test_diag_matches_dense_oracle():
    W, H = 16, 12
    rng = np.random.RandomState(0)
    inputs = {
        "X": rng.rand(H, W, 1).astype(np.float32) + 0.5,
        "Im": rng.rand(H, W, 1).astype(np.float32),
    }
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(shading_energy, "gaussNewtonGPU"), [W, H])
    x, data = plan.bind(inputs)
    # the chain-rule path must actually engage for this group
    st = plan.funcs._computed_structure(plan.funcs.groups[0])
    assert st is not None and len(st[0]) == 3  # three distinct taps
    diag = plan.funcs.diag_jtj(x, data)["X"]
    oracle = _oracle_diag(plan.funcs, x, data)
    np.testing.assert_allclose(
        np.asarray(diag), np.asarray(oracle), rtol=2e-5, atol=1e-6)


def test_diag_chain_rule_matches_inline_sfs():
    """On the real SFS energy the chain-rule diag equals the inline
    view (both masked by the energy's bounds guards)."""
    from opt_tpu import energies
    import opt_tpu.compile.plan_fns as pf

    W, H = 16, 12
    rng = np.random.RandomState(1)
    inputs = {
        "X": (rng.rand(H, W, 1).astype(np.float32) + 1.0),
        "D_i": (rng.rand(H, W, 1).astype(np.float32) + 1.0),
        "Im": rng.rand(H, W, 1).astype(np.float32),
        "edgeMaskR": np.ones((H, W, 1), np.uint8),
        "edgeMaskC": np.ones((H, W, 1), np.uint8),
        "w_p": 1.0, "w_s": 0.5, "w_g": 0.3,
        "f_x": 10.0, "f_y": 10.0, "u_x": 8.0, "u_y": 6.0,
        **{f"L_{k}": 0.1 * k for k in range(1, 10)},
    }
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.shape_from_shading,
                             "gaussNewtonGPU"), [W, H])
    x, data = plan.bind(inputs)
    diag_chain = plan.funcs.diag_jtj(x, data)["X"]
    orig = pf.ProblemFunctions._leaf_partials_computed
    try:
        pf.ProblemFunctions._leaf_partials_computed = (
            lambda self, g, x_, d_: None)
        diag_inline = plan.funcs.diag_jtj(x, data)["X"]
    finally:
        pf.ProblemFunctions._leaf_partials_computed = orig
    np.testing.assert_allclose(
        np.asarray(diag_chain), np.asarray(diag_inline),
        rtol=2e-5, atol=1e-6)
