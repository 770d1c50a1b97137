"""DSL construction + expression evaluation unit tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from opt_tpu.dsl import expr as E
from opt_tpu.dsl.env import EnergyEnv
from opt_tpu.dsl.spec import ProblemSpec
from opt_tpu.compile import evaluate as ev
from opt_tpu.compile.terms import classify_terms


def make_env(dims):
    spec = ProblemSpec()
    return spec, EnergyEnv(spec, dims)


def test_shift_read_2d():
    a = jnp.arange(12.0).reshape(3, 4)  # (H=3, W=4)
    # offset (dx=1, dy=0): out[y,x] = a[y, x+1], zero at x=W-1
    out = ev.shift_read(a, (1, 0))
    ref = np.zeros((3, 4))
    ref[:, :3] = np.asarray(a)[:, 1:]
    np.testing.assert_allclose(out, ref)
    # offset (dx=0, dy=-1): out[y,x] = a[y-1, x]
    out = ev.shift_read(a, (0, -1))
    ref = np.zeros((3, 4))
    ref[1:, :] = np.asarray(a)[:2, :]
    np.testing.assert_allclose(out, ref)


def test_shift_read_roundtrip_adjoint():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(5, 6))
    b = jnp.asarray(rng.randn(5, 6))
    for off in [(1, 0), (-2, 1), (0, 3), (-1, -1)]:
        # <shift_read(a, off), b> == <a, scatter_shift(b, off)>
        lhs = jnp.sum(ev.shift_read(a, off) * b)
        rhs = jnp.sum(a * ev.scatter_shift(b, off))
        assert abs(float(lhs) - float(rhs)) < 1e-5


def test_bounds_mask():
    m = ev.bounds_mask((3, 4), (1, 0), (1, 0))  # InBounds(1, 0) on W=4,H=3
    ref = np.zeros((3, 4), dtype=bool)
    ref[:, :3] = True  # x < W-1
    np.testing.assert_array_equal(np.asarray(m), ref)
    m = ev.bounds_mask((3, 4), (-1, -1), (-1, -1))  # InBounds(-1,-1)
    ref = np.zeros((3, 4), dtype=bool)
    ref[1:, 1:] = True
    np.testing.assert_array_equal(np.asarray(m), ref)


def test_simple_energy_eval():
    spec, O = make_env([4, 3])
    W, H = O.Dim("W", 0), O.Dim("H", 1)
    X = O.Unknown("X", O.opt_float, (W, H), 0)
    A = O.Array("A", O.opt_float, (W, H), 1)
    O.Energy(2.0 * (X(0, 0) - A(0, 0)))
    groups = classify_terms(spec)
    assert len(groups) == 1
    g = groups[0]
    assert g.kind == "centered"
    assert len(g.exprs) == 1
    assert len(g.unknown_leaves) == 1

    rng = np.random.RandomState(1)
    xv = jnp.asarray(rng.randn(3, 4, 1).astype(np.float32))
    av = jnp.asarray(rng.randn(3, 4, 1).astype(np.float32))
    ctx = ev.EvalContext(
        "grid", (3, 4), {"X": xv, "A": av}, {}, {}, jnp.float32
    )
    out = ctx.eval(g.exprs[0])
    np.testing.assert_allclose(
        np.asarray(out), 2.0 * (np.asarray(xv)[..., 0] - np.asarray(av)[..., 0]),
        rtol=1e-6,
    )


def test_stencil_term_auto_guard():
    """Unguarded stencil residuals are zeroed where the stencil leaves the
    domain (classifyexpression parity, o.t:2704-2708)."""
    spec, O = make_env([4, 1])
    W, H = O.Dim("W", 0), O.Dim("H", 1)
    X = O.Unknown("X", O.opt_float, (W, H), 0)
    O.Energy(X(0, 0) - X(1, 0))  # no explicit InBounds
    g = classify_terms(spec)[0]
    xv = jnp.asarray([[1.0, 2.0, 4.0, 8.0]]).reshape(1, 4, 1)
    ctx = ev.EvalContext("grid", (1, 4), {"X": xv}, {}, {}, jnp.float32)
    out = np.asarray(ctx.eval(g.exprs[0]))
    np.testing.assert_allclose(out, [[-1.0, -2.0, -4.0, 0.0]])


def test_explicit_inbounds_disables_auto_guard():
    """An explicit InBounds means no auto bbox (bboxforexpression,
    o.t:1680-1682): the user's guard is authoritative."""
    spec, O = make_env([3, 1])
    W, H = O.Dim("W", 0), O.Dim("H", 1)
    X = O.Unknown("X", O.opt_float, (W, H), 0)
    # deliberately vacuous guard: select on InBounds(0,0) which is always
    # true; the (1,0) read is NOT guarded, so it zero-fills at the edge
    O.Energy(O.Select(O.InBounds(0, 0), X(0, 0) - X(1, 0), 0))
    g = classify_terms(spec)[0]
    xv = jnp.asarray([[1.0, 2.0, 4.0]]).reshape(1, 3, 1)
    ctx = ev.EvalContext("grid", (1, 3), {"X": xv}, {}, {}, jnp.float32)
    out = np.asarray(ctx.eval(g.exprs[0]))
    # last pixel: X(1,0) reads OOB -> 0, residual = 4 - 0 = 4 (NOT zeroed)
    np.testing.assert_allclose(out, [[-1.0, -2.0, 4.0]])


def test_vector_ops_and_select():
    spec, O = make_env([2, 2])
    W, H = O.Dim("W", 0), O.Dim("H", 1)
    X = O.Unknown("X", O.opt_float2, (W, H), 0)
    v = X(0, 0)
    assert isinstance(v, E.ExpVector)
    d = v.dot(v)
    assert isinstance(d, E.Exp)
    s = O.Select(O.greater(v(0), 0), v, 0)
    assert isinstance(s, E.ExpVector)
    r = O.Rotate2D(v(0), v)
    assert len(r) == 2


def test_graph_term_classification():
    spec, O = make_env([5, 8])
    N = O.Dim("N", 0)
    NE = O.Dim("E", 1)
    X = O.Unknown("X", O.opt_float3, (N,), 0)
    G = O.Graph("G", (NE,), "v0", (N,), 1, "v1", (N,), 2)
    O.Energy(X(G.v0) - X(G.v1))
    groups = classify_terms(spec)
    assert len(groups) == 1
    assert groups[0].kind == "graph"
    assert len(groups[0].exprs) == 3  # float3 -> 3 channels
    assert len(groups[0].unknown_leaves) == 6


def test_mixed_domain_error():
    spec, O = make_env([5, 8])
    N = O.Dim("N", 0)
    NE = O.Dim("E", 1)
    X = O.Unknown("X", O.opt_float, (N,), 0)
    G = O.Graph("G", (NE,), "v0", (N,), 1)
    with pytest.raises(ValueError, match="multiple domains"):
        O.Energy(X(G.v0) - X(0))
        classify_terms(spec)
