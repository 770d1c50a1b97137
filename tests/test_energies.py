"""Smoke tests: all ten reference energies build, plan, and step.

Golden-cost parity against BASELINE.md values is covered separately by the
example runners (tests/test_examples.py) once real datasets are wired up;
here we verify every DSL feature combination compiles and optimizes on
random inputs.
"""

import numpy as np
import pytest

import opt_tpu
from opt_tpu import energies


def grid_inputs(W, H, rng):
    return {
        "poisson_image_editing": lambda: {
            "X": rng.rand(H, W, 4),
            "T": rng.rand(H, W, 4),
            "M": (rng.rand(H, W, 1) > 0.7).astype(np.float32),
        },
        "image_warping": lambda: {
            "Offset": 0.1 * rng.randn(H, W, 2),
            "Angle": 0.05 * rng.randn(H, W, 1),
            "UrShape": rng.randn(H, W, 2),
            "Constraints": np.where(
                rng.rand(H, W, 2) > 0.8, rng.rand(H, W, 2), -1.0
            ),
            "Mask": (rng.rand(H, W, 1) > 0.9).astype(np.float32),
            "w_fitSqrt": 1.0,
            "w_regSqrt": 0.7,
        },
        "optical_flow": lambda: {
            "X": 0.3 * rng.randn(H, W, 2),
            "I": rng.rand(H, W, 1),
            "I_hat": rng.rand(H, W, 1),
            "I_hat_dx": 0.1 * rng.randn(H, W, 1),
            "I_hat_dy": 0.1 * rng.randn(H, W, 1),
            "w_fit": 1.0,
            "w_reg": 0.5,
        },
        "intrinsic_image_decomposition": lambda: {
            "r": rng.rand(H, W, 3),
            "r_const": rng.rand(H, W, 3),
            "i": rng.rand(H, W, 3),
            "s": rng.rand(H, W, 1),
            "w_fitSqrt": 1.0,
            "w_regSqrtAlbedo": 0.8,
            "w_regSqrtShading": 0.6,
            "pNorm": 0.8,
        },
        "shape_from_shading": lambda: {
            "X": 1.0 + 0.1 * rng.rand(H, W, 1),
            "D_i": 1.0 + 0.1 * rng.rand(H, W, 1),
            "Im": rng.rand(H, W, 1),
            "edgeMaskR": np.ones((H, W, 1)),
            "edgeMaskC": np.ones((H, W, 1)),
            "w_p": 1.0,
            "w_s": 0.5,
            "w_g": 0.3,
            "f_x": 100.0,
            "f_y": 100.0,
            "u_x": W / 2.0,
            "u_y": H / 2.0,
            **{f"L_{k}": 0.1 * k for k in range(1, 10)},
        },
    }


def graph_inputs(N, E, rng):
    # all four slots distinct per edge (real meshes have no degenerate
    # edges; normalize() of a zero vector is garbage in the reference too)
    v0 = rng.randint(0, N, size=E)
    v1 = (v0 + 1 + rng.randint(0, N - 3, size=E)) % N
    cons = np.where(rng.rand(N, 3) > 0.7, rng.rand(N, 3), -1e7)
    base = {
        "UrShape": rng.randn(N, 3),
        "Constraints": cons,
        "G": {"v0": v0, "v1": v1},
    }
    return {
        "arap_mesh_deformation": lambda: {
            **base,
            "Offset": rng.randn(N, 3),
            "Angle": 0.05 * rng.randn(N, 3),
            "w_fitSqrt": 1.0,
            "w_regSqrt": 0.8,
        },
        "cotangent_mesh_smoothing": lambda: {
            "X": rng.randn(N, 3),
            "A": rng.randn(N, 3),
            "w_fit": 1.0,
            "w_reg": 0.9,
            # ring mesh: v0=i, v1=i+1, prev/next neighbors -- all distinct
            "G": {
                "v0": np.arange(E) % N,
                "v1": (np.arange(E) + 1) % N,
                "v2": (np.arange(E) - 1) % N,
                "v3": (np.arange(E) + 2) % N,
            },
        },
        "embedded_mesh_deformation": lambda: {
            **base,
            "Offset": rng.randn(N, 3),
            "RotMatrix": np.tile(np.eye(3).reshape(9), (N, 1))
            + 0.01 * rng.randn(N, 9),
            "w_fitSqrt": 1.0,
            "w_regSqrt": 0.8,
            "w_rotSqrt": 0.5,
        },
        "robust_nonrigid_alignment": lambda: {
            **base,
            "Offset": rng.randn(N, 3),
            "Angle": 0.05 * rng.randn(N, 3),
            "RobustWeights": rng.rand(N, 1),
            "ConstraintNormals": rng.randn(N, 3),
            "w_fitSqrt": 1.0,
            "w_regSqrt": 0.8,
        },
    }


W, H = 8, 6
N, E = 10, 24

CASES = {}
_rng = np.random.RandomState(42)
CASES.update({k: (v, [W, H]) for k, v in grid_inputs(W, H, _rng).items()})
CASES.update({k: (v, [N, E]) for k, v in graph_inputs(N, E, _rng).items()})
CASES["volumetric_mesh_deformation"] = (
    lambda: {
        "Offset": _rng.randn(3, 4, 5, 3),
        "Angle": 0.05 * _rng.randn(3, 4, 5, 3),
        "UrShape": _rng.randn(3, 4, 5, 3),
        "Constraints": np.where(
            _rng.rand(3, 4, 5, 3) > 0.8, _rng.rand(3, 4, 5, 3), -1e7
        ),
        "w_fitSqrt": 1.0,
        "w_regSqrt": 0.8,
    },
    [5, 4, 3],  # dims (W, H, D) -> array shape (D=3, H=4, W=5, C)
)


@pytest.mark.parametrize("name", sorted(energies.ALL_ENERGIES))
@pytest.mark.parametrize("kind", ["gaussNewtonGPU", "LMGPU"])
def test_energy_builds_and_steps(name, kind):
    make_inputs, dims = CASES[name]
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.ALL_ENERGIES[name], kind), dims
    )
    plan.set_solver_parameter("nIterations", 2)
    plan.set_solver_parameter("lIterations", 4)
    inputs = make_inputs()
    plan.init(inputs)
    c0 = plan.final_cost()
    assert np.isfinite(c0), f"{name}: initial cost not finite"
    plan.step()
    c1 = plan.final_cost()
    assert np.isfinite(c1), f"{name}: cost not finite after step ({c1})"
    # GN on these well-posed random problems should not increase cost
    # dramatically; LM guarantees monotone published cost.
    if kind == "LMGPU":
        assert c1 <= c0 * (1 + 1e-6), f"{name}: LM cost increased {c0}->{c1}"
