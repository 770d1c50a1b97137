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


def test_chunked_outer_cache_key(monkeypatch):
    """One engine instance solved with the chunked outer OFF then ON:
    the jit cache must compile two distinct programs (regression: the
    key lacked the chunked choice when donate=False, i.e. on CPU, so
    the second solve silently reused the whole-grid outer)."""
    W, H = 128, 64
    inputs = _warp_inputs(W, H)
    plan = _plan(energies.image_warping, [W, H])
    plan.set_solver_parameter("nIterations", 2)
    plan.set_solver_parameter("lIterations", 10)
    ref_cost, _ = _xla_cost(plan, inputs, 2)
    solver = ssv.StreamSolverHBM(plan)
    monkeypatch.setenv("OPT_TPU_STREAM_CHUNKED_OUTER", "0")
    out0 = solver.solve(inputs)
    monkeypatch.setenv("OPT_TPU_STREAM_CHUNKED_OUTER", "1")
    out1 = solver.solve(inputs)
    backend_keys = [k for k in solver._kern_cache if k[0] == "backend"]
    assert len(backend_keys) == 2, backend_keys
    assert out0["final_cost"] == pytest.approx(ref_cost, rel=1e-4)
    assert out1["final_cost"] == pytest.approx(ref_cost, rel=1e-4)


# -- 3-D volumetric (D-slab strips) ------------------------------------------

from test_stream3d import _vol_inputs, _plan as _plan3d  # noqa: E402


def test_chunked_outer_3d_matches_funcs():
    """3-D strips over D-slabs: cost / JtF / diag / model-cost parity
    against the whole-volume ProblemFunctions."""
    W, H, D = 16, 24, 12
    inputs = _vol_inputs(W, H, D)
    rng = np.random.RandomState(4)
    plan = _plan3d([W, H, D])
    x, data = plan.bind(inputs)
    x = {n: v + 0.05 * rng.randn(*v.shape).astype(np.float32)
         for n, v in x.items()}
    assert supports_chunked_outer(plan)
    cf = ChunkedOuterFuncs(plan, strip=4)
    bf = plan.funcs

    # per-element contract first: every window's center rows reproduce
    # the whole-volume residual field EXACTLY (debugged: they do; the
    # scalar costs then differ only by f32 reduction order)
    whole_f = np.asarray(jax.tree_util.tree_leaves(
        bf.residual_fields(x, data, masked=True))[0])
    xp, dp = cf._split(x, data)
    for s in range(cf.n_strips):
        g0 = s * cf.S
        xw, dw = cf._windows(xp, dp, data, g0)
        fw = np.asarray(jax.tree_util.tree_leaves(
            cf.wfuncs.residual_fields(xw, dw, masked=True))[0])
        np.testing.assert_array_equal(
            fw[:, cf.r:cf.r + cf.S], whole_f[:, g0:g0 + cf.S])

    # scalar cost: 96k-element f32 reductions in different orders spread
    # ~5e-5 rel around the f64-exact value (the whole-grid XLA reduce is
    # the furthest off); both paths must sit within that band
    exact = 0.5 * float(np.sum(whole_f.astype(np.float64) ** 2))
    assert float(cf.cost(x, data)) == pytest.approx(exact, rel=2e-4)
    assert float(bf.cost(x, data)) == pytest.approx(exact, rel=2e-4)

    r0, jvp, jt = bf.linearize(x, data)
    tok, jvp_c, jt_c = cf.linearize(x, data)
    _tree_close(bf.jtf(r0, jt), cf.jtf(tok, jt_c))
    _tree_close(bf.diag_jtj(x, data), cf.diag_jtj(x, data))

    delta = {n: jnp.asarray(
        0.01 * rng.randn(*v.shape).astype(np.float32))
        for n, v in x.items()}
    # same f32 reduction-order spread as cost (global scalar reduce)
    assert float(cf.model_cost(tok, None, delta, x, data)) == (
        pytest.approx(float(bf.model_cost(r0, jvp, delta, x, data)),
                      rel=2e-4))


def test_chunked_outer_3d_gate():
    """Volumes auto-enable past 128^3 (192^3 measured OOM whole-grid
    on v5e); small volumes support the strips but stay whole-grid."""
    small = _plan3d([16, 16, 16])
    assert supports_chunked_outer(small)
    assert not chunked_outer_enabled(small)
    at_edge = _plan3d([128, 128, 128])
    assert not chunked_outer_enabled(at_edge)  # measured working
    mid = _plan3d([192, 192, 192])
    assert chunked_outer_enabled(mid)          # measured OOM whole-grid
    big = _plan3d([320, 320, 320])
    assert chunked_outer_enabled(big)
    from opt_tpu.ops.stream3d import supports3d

    assert supports3d(mid)
    # 320^3 only fits the HBM gate BECAUSE the chunked outer engages
    assert supports3d(big)


@pytest.mark.parametrize("kind", ["gaussNewtonGPU", "LMGPU"])
def test_chunked_outer_3d_solve_matches_xla(kind, monkeypatch):
    """End-to-end 3-D streamed solve with the D-slab strip-mined outer
    forced on (interpret mode)."""
    monkeypatch.setenv("OPT_TPU_STREAM_CHUNKED_OUTER", "1")
    from opt_tpu.ops.stream3d import StreamSolver3D

    W, H, D = 16, 16, 8
    inputs = _vol_inputs(W, H, D)
    plan = _plan3d([W, H, D], kind)
    plan.set_solver_parameter("nIterations", 2)
    plan.set_solver_parameter("lIterations", 12)
    ref_cost = plan.solve(dict(inputs), engine="xla")
    solver = StreamSolver3D(plan)
    out = solver.solve(dict(inputs))
    assert out["final_cost"] == pytest.approx(ref_cost, rel=1e-4)
