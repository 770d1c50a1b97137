"""Strip-mined outer step (ops/stream_outer.py): parity of the chunked
cost / JtF / diag(JtJ) / model-cost evaluation against the whole-grid
ProblemFunctions, the eligibility gate, and the end-to-end streamed
solve with the chunked outer forced on."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import opt_tpu
from opt_tpu import energies
from opt_tpu.ops import stream_solver as ssv
from opt_tpu.ops.stream_outer import (
    ChunkedOuterFuncs,
    chunked_outer_enabled,
    supports_chunked_outer,
)

from test_stream_solver import _poisson_inputs, _warp_inputs, _xla_cost


def _plan(energy, dims, kind="gaussNewtonGPU"):
    state = opt_tpu.NewState()
    return state.problem_plan(state.problem_define(energy, kind), dims)


def _tree_close(a, b, rtol=2e-5, atol=1e-5):
    for n in a:
        np.testing.assert_allclose(
            np.asarray(a[n]), np.asarray(b[n]), rtol=rtol, atol=atol
        )


@pytest.mark.parametrize(
    "energy,inputs_fn",
    [
        (energies.image_warping, _warp_inputs),
        # poisson exercises Exclude() and UsePreconditioner(False)
        (energies.poisson_image_editing, _poisson_inputs),
    ],
    ids=["image_warping", "poisson_exclude"],
)
def test_chunked_outer_matches_funcs(energy, inputs_fn):
    W, H = 64, 48
    inputs = inputs_fn(W, H)
    # non-trivial linearization point
    rng = np.random.RandomState(2)
    plan = _plan(energy, [W, H])
    x, data = plan.bind(inputs)
    x = {n: v + 0.05 * rng.randn(*v.shape).astype(np.float32)
         for n, v in x.items()}
    assert supports_chunked_outer(plan)
    cf = ChunkedOuterFuncs(plan, strip=8)
    bf = plan.funcs

    assert float(cf.cost(x, data)) == pytest.approx(
        float(bf.cost(x, data)), rel=1e-5)

    r0, jvp, jt = bf.linearize(x, data)
    tok, jvp_c, jt_c = cf.linearize(x, data)
    assert jvp_c is None and jt_c is None
    _tree_close(bf.jtf(r0, jt), cf.jtf(tok, jt_c))
    _tree_close(bf.diag_jtj(x, data), cf.diag_jtj(x, data))

    delta = {n: jnp.asarray(
        0.01 * rng.randn(*v.shape).astype(np.float32))
        for n, v in x.items()}
    assert float(cf.model_cost(tok, None, delta, x, data)) == (
        pytest.approx(float(bf.model_cost(r0, jvp, delta, x, data)),
                      rel=1e-5))


def test_chunked_outer_gate():
    """Graphs, ComputedArrays, and SampledImages fall back to the
    whole-grid funcs; small grids do not auto-enable."""
    graph = _plan(energies.arap_mesh_deformation, [64, 128])
    assert not supports_chunked_outer(graph)
    small = _plan(energies.image_warping, [128, 64])
    assert supports_chunked_outer(small)
    assert not chunked_outer_enabled(small)  # below the OOM threshold
    big = _plan(energies.image_warping, [8192, 8192])
    assert chunked_outer_enabled(big)


@pytest.mark.parametrize("kind", ["gaussNewtonGPU", "LMGPU"])
def test_chunked_outer_solve_matches_xla(kind, monkeypatch):
    """End-to-end streamed solve with the strip-mined outer step forced
    on: same rtol-1e-4 cost contract as the other stream-engine
    tests."""
    monkeypatch.setenv("OPT_TPU_STREAM_CHUNKED_OUTER", "1")
    W, H = 128, 64
    inputs = _warp_inputs(W, H)
    plan = _plan(energies.image_warping, [W, H], kind)
    plan.set_solver_parameter("nIterations", 3)
    plan.set_solver_parameter("lIterations", 15)
    ref_cost, x_ref = _xla_cost(plan, inputs, 3)
    solver = ssv.StreamSolverHBM(plan)
    out = solver.solve(inputs)
    assert out["final_cost"] == pytest.approx(ref_cost, rel=1e-4)
    for n in x_ref:
        np.testing.assert_allclose(
            np.asarray(out["x"][n]), np.asarray(x_ref[n]),
            rtol=1e-3, atol=1e-4,
        )
