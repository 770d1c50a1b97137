"""Unit tests for the expression evaluator's op table and guards."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opt_tpu.dsl import expr as E
from opt_tpu.compile import evaluate as ev


def _ctx(shape=(3, 4), **imgs):
    return ev.EvalContext("grid", shape, imgs, {}, {}, jnp.float32)


def _leaf(name, arr):
    class _Im:
        pass

    im = _Im()
    im.name = name
    im.is_unknown = False
    return im


def _img_access(name, ch=0, off=(0, 0)):
    im = _leaf(name, None)
    return E.ImageAccess(im, E.Offset(off), ch)


RNG = np.random.RandomState(0)
A = RNG.rand(3, 4, 1).astype(np.float32) + 0.5
B = RNG.rand(3, 4, 1).astype(np.float32) + 0.5


@pytest.mark.parametrize(
    "op,npfun",
    [
        ("add", np.add), ("sub", np.subtract), ("mul", np.multiply),
        ("div", np.divide), ("pow", np.power),
        ("atan2", np.arctan2),
    ],
)
def test_binary_ops(op, npfun):
    e = E.Apply(op, (_img_access("a"), _img_access("b")))
    out = _ctx(a=jnp.asarray(A), b=jnp.asarray(B)).eval(e)
    np.testing.assert_allclose(
        np.asarray(out), npfun(A[..., 0], B[..., 0]), rtol=1e-5
    )


@pytest.mark.parametrize(
    "op,npfun",
    [
        ("sqrt", np.sqrt), ("sin", np.sin), ("cos", np.cos),
        ("tan", np.tan), ("exp", np.exp), ("log", np.log),
        ("log10", np.log10), ("abs", np.abs), ("tanh", np.tanh),
        ("sinh", np.sinh), ("cosh", np.cosh), ("atan", np.arctan),
        ("asinh", np.arcsinh),
    ],
)
def test_unary_ops(op, npfun):
    e = E.Apply(op, (_img_access("a"),))
    out = _ctx(a=jnp.asarray(A)).eval(e)
    np.testing.assert_allclose(
        np.asarray(out), npfun(A[..., 0]), rtol=1e-5
    )


def test_comparisons_and_logic():
    a, b = _img_access("a"), _img_access("b")
    for op, npfun in [
        ("less", np.less), ("greater", np.greater),
        ("lesseq", np.less_equal), ("greatereq", np.greater_equal),
        ("eq", np.equal),
    ]:
        out = _ctx(a=jnp.asarray(A), b=jnp.asarray(B)).eval(
            E.Apply(op, (a, b))
        )
        np.testing.assert_array_equal(
            np.asarray(out), npfun(A[..., 0], B[..., 0])
        )
    c1 = E.Apply("greater", (a, b))
    c2 = E.Apply("less", (a, b))
    ctx = _ctx(a=jnp.asarray(A), b=jnp.asarray(B))
    np.testing.assert_array_equal(
        np.asarray(ctx.eval(E.Apply("or_", (c1, c2)))),
        (A[..., 0] > B[..., 0]) | (A[..., 0] < B[..., 0]),
    )
    np.testing.assert_array_equal(
        np.asarray(ctx.eval(E.Apply("not_", (c1,)))),
        ~(A[..., 0] > B[..., 0]),
    )
    # bool * bool is logical and (ad.and_ parity, ad.t:873)
    np.testing.assert_array_equal(
        np.asarray(ctx.eval(E.Apply("mul", (c1, c2)))),
        (A[..., 0] > B[..., 0]) & (A[..., 0] < B[..., 0]),
    )


def test_select_numeric_condition():
    a, b = _img_access("a"), _img_access("b")
    cond = E.Apply("sub", (a, a))  # zeros -> false everywhere
    out = _ctx(a=jnp.asarray(A), b=jnp.asarray(B)).eval(
        E.Apply("select", (cond, a, b))
    )
    np.testing.assert_allclose(np.asarray(out), B[..., 0])


def test_safe_grads_are_finite_at_singularities():
    for f, x in [
        (ev.safe_sqrt, 0.0),
        (ev.safe_log, 0.0),
        (lambda v: ev.safe_div(1.0, v), 0.0),
        (lambda v: ev.safe_pow(v, 0.5), 0.0),
    ]:
        g = jax.grad(lambda v: f(v))(jnp.float32(x))
        assert np.isfinite(float(g)), (f, x)


def test_index_value_and_inbounds_expanded():
    # Index(0) = x coordinate; InBoundsExpanded(0,0,1) excludes the border
    e = E.IndexValue(0, 0)
    out = _ctx().eval(e)
    np.testing.assert_array_equal(
        np.asarray(jnp.broadcast_to(out, (3, 4)))[0], [0, 1, 2, 3]
    )
    m = ev.bounds_mask((3, 4), (-1, -1), (1, 1))
    ref = np.zeros((3, 4), bool)
    ref[1:-1, 1:-1] = True
    np.testing.assert_array_equal(np.asarray(m), ref)


def test_bilinear_sample_matches_manual():
    img = jnp.asarray(RNG.rand(5, 6).astype(np.float32))
    x = jnp.asarray([1.25, 0.0, 4.9, -1.0, 6.2], jnp.float32)
    y = jnp.asarray([2.5, 0.0, 3.9, 2.0, 2.0], jnp.float32)
    out = np.asarray(ev.bilinear_sample(img, x, y))
    ref = []
    for xi, yi in zip(np.asarray(x), np.asarray(y)):
        x0, x1 = np.floor(xi), np.ceil(xi)
        y0, y1 = np.floor(yi), np.ceil(yi)
        xn, yn = xi - x0, yi - y0

        def get(xx, yy):
            if 0 <= xx < 6 and 0 <= yy < 5:
                return float(img[int(yy), int(xx)])
            return 0.0

        top = (1 - xn) * get(x0, y0) + xn * get(x1, y0)
        bot = (1 - xn) * get(x0, y1) + xn * get(x1, y1)
        ref.append((1 - yn) * top + yn * bot)
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_sampled_image_custom_derivatives():
    """SampledImage derivatives come from the user-supplied derivative
    images, not from differentiating the bilinear weights
    (ad.sampledimage parity, o.t:3276-3280)."""
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(6, 7).astype(np.float32))
    dx_img = jnp.asarray(rng.rand(6, 7).astype(np.float32))
    dy_img = jnp.asarray(rng.rand(6, 7).astype(np.float32))
    sample = ev.make_sampled_read(img, dx_img, dy_img)
    x = jnp.float32(2.3)
    y = jnp.float32(3.7)
    gx = jax.grad(lambda u: sample(u, y))(x)
    gy = jax.grad(lambda v: sample(x, v))(y)
    np.testing.assert_allclose(
        float(gx), float(ev.bilinear_sample(dx_img, x, y)), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(gy), float(ev.bilinear_sample(dy_img, x, y)), rtol=1e-5
    )


def test_computed_array_inlines_shifted_expression():
    from opt_tpu.dsl.spec import ProblemSpec
    from opt_tpu.dsl.env import EnergyEnv

    spec = ProblemSpec()
    O = EnergyEnv(spec, [5, 4])
    W, H = O.Dim("W", 0), O.Dim("H", 1)
    X = O.Unknown("X", O.opt_float, (W, H), 0)
    CA = O.ComputedArray("CA", (W, H), X(0, 0) * 2.0 + X(1, 0))
    e = CA(0, 1)  # shifted access inlines the shifted expression
    rng = np.random.RandomState(0)
    xv = jnp.asarray(rng.rand(4, 5, 1).astype(np.float32))
    ctx = ev.EvalContext("grid", (4, 5), {"X": xv}, {}, {}, jnp.float32)
    out = np.asarray(ctx.eval(e))
    ref = 2.0 * np.asarray(ev.shift_read(xv[..., 0], (0, 1))) + np.asarray(
        ev.shift_read(xv[..., 0], (1, 1))
    )
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_slice_helper():
    from opt_tpu.dsl.spec import ProblemSpec
    from opt_tpu.dsl.env import EnergyEnv

    spec = ProblemSpec()
    O = EnergyEnv(spec, [3, 3])
    W, H = O.Dim("W", 0), O.Dim("H", 1)
    X = O.Unknown("X", O.opt_float4, (W, H), 0)
    sl = O.Slice(X, 1, 3)
    v = sl(0, 0)
    assert isinstance(v, E.ExpVector) and len(v) == 2
    assert v(0).channel == 1 and v(1).channel == 2
    s1 = O.Slice(X, 2, 3)
    assert s1(0, 0).channel == 2  # single-channel slice returns scalar


def _rot3_numpy(alpha, beta, gamma):
    """R = Rz(gamma) @ Ry(beta) @ Rx(alpha) (evalR parity, lib.t:61-88)."""
    ca, cb, cg = np.cos([alpha, beta, gamma])
    sa, sb, sg = np.sin([alpha, beta, gamma])
    Rx = np.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]])
    Ry = np.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]])
    Rz = np.array([[cg, -sg, 0], [sg, cg, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def test_rotate3d_matches_numpy_euler():
    """Rotate3D = Rz(g)Ry(b)Rx(a) applied to v (lib.t evalR convention)."""
    from opt_tpu.dsl.spec import ProblemSpec
    from opt_tpu.dsl.env import EnergyEnv

    spec = ProblemSpec()
    O = EnergyEnv(spec, [2, 2])
    W, H = O.Dim("W", 0), O.Dim("H", 1)
    A = O.Unknown("A", O.opt_float3, (W, H), 0)
    V = O.Unknown("V", O.opt_float3, (W, H), 1)
    out = O.Rotate3D(A(0, 0), V(0, 0))

    rng = np.random.RandomState(7)
    angles = rng.uniform(-2, 2, (2, 2, 3)).astype(np.float32)
    vecs = rng.randn(2, 2, 3).astype(np.float32)
    ctx = ev.EvalContext(
        "grid", (2, 2), {"A": jnp.asarray(angles), "V": jnp.asarray(vecs)},
        {}, {}, jnp.float32,
    )
    got = np.stack([np.asarray(ctx.eval(out(i))) for i in range(3)], -1)
    for y in range(2):
        for x in range(2):
            ref = _rot3_numpy(*angles[y, x]) @ vecs[y, x]
            np.testing.assert_allclose(got[y, x], ref, rtol=2e-5, atol=1e-6)


def test_rotate2d_matches_numpy():
    from opt_tpu.dsl.spec import ProblemSpec
    from opt_tpu.dsl.env import EnergyEnv

    spec = ProblemSpec()
    O = EnergyEnv(spec, [3, 2])
    W, H = O.Dim("W", 0), O.Dim("H", 1)
    A = O.Unknown("A", O.opt_float, (W, H), 0)
    V = O.Unknown("V", O.opt_float2, (W, H), 1)
    out = O.Rotate2D(A(0, 0), V(0, 0))

    rng = np.random.RandomState(8)
    ang = rng.uniform(-3, 3, (2, 3, 1)).astype(np.float32)
    vecs = rng.randn(2, 3, 2).astype(np.float32)
    ctx = ev.EvalContext(
        "grid", (2, 3), {"A": jnp.asarray(ang), "V": jnp.asarray(vecs)},
        {}, {}, jnp.float32,
    )
    got = np.stack([np.asarray(ctx.eval(out(i))) for i in range(2)], -1)
    for y in range(2):
        for x in range(3):
            c, s = np.cos(ang[y, x, 0]), np.sin(ang[y, x, 0])
            ref = np.array([[c, -s], [s, c]]) @ vecs[y, x]
            np.testing.assert_allclose(got[y, x], ref, rtol=2e-5, atol=1e-6)


def test_lp_robust_norm_weight():
    """L_p (lib.t:113-123): returns sqrt((||v_const||+eps)^(p-2)) * v,
    with the weight treated as a constant for AD (IRLS)."""
    from opt_tpu.dsl.spec import ProblemSpec
    from opt_tpu.dsl.env import EnergyEnv

    spec = ProblemSpec()
    O = EnergyEnv(spec, [4, 3])
    W, H = O.Dim("W", 0), O.Dim("H", 1)
    Xv = O.Unknown("X", O.opt_float3, (W, H), 0)
    p = 0.8
    out = O.L_p(Xv(0, 0), Xv(0, 0), p, (W, H))

    rng = np.random.RandomState(5)
    xv = rng.rand(3, 4, 3).astype(np.float32) + 0.2
    ctx = ev.EvalContext("grid", (3, 4), {"X": jnp.asarray(xv)}, {}, {},
                         jnp.float32)
    got = np.stack([np.asarray(ctx.eval(out(i))) for i in range(3)], -1)
    norm = np.linalg.norm(xv, axis=-1, keepdims=True)
    ref = np.sqrt((norm + 1e-7) ** (p - 2)) * xv
    np.testing.assert_allclose(got, ref, rtol=3e-5)


def test_bounds_mask_3d():
    """InBounds semantics on a 3D index space: border of the expanded
    stencil excluded per axis."""
    m = ev.bounds_mask((4, 3, 5), (-1, 0, -2), (1, 0, 2))
    ref = np.zeros((4, 3, 5), bool)
    ref[2:-2, :, 1:-1] = True  # shape order (D,H,W) = dims reversed
    np.testing.assert_array_equal(np.asarray(m), ref)
