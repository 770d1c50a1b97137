"""3-D streamed HBM-state engine (ops/stream3d.py): parity with the
fused XLA solver in interpret mode (CPU).

The engine tiles TWO axes (D untiled / H sublane); the cases cover the
one-tile, even-tile (double-buffered pair loop) and odd-tile (serial
fallback) sweep paths, and the windowed evaluator's global-coordinate
bounds via a pinned-slab constraint field.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import opt_tpu
from opt_tpu import energies
from opt_tpu.ops.stream3d import StreamSolver3D, supports3d


def _vol_inputs(W, H, D, seed=0):
    rng = np.random.RandomState(seed)
    ii, jj, kk = np.meshgrid(
        np.arange(D), np.arange(H), np.arange(W), indexing="ij"
    )
    grid = np.stack([ii, jj, kk], axis=-1).astype(np.float32)
    cons = np.full_like(grid, -np.inf)
    cons[:, 0] = grid[:, 0]
    cons[:, -1] = grid[:, -1] + np.float32(1.5)
    return {
        "Offset": grid + 0.01 * rng.randn(*grid.shape).astype(np.float32),
        "UrShape": grid.copy(),
        "Angle": 0.01 * rng.randn(*grid.shape).astype(np.float32),
        "Constraints": cons.astype(np.float32),
        "w_fitSqrt": np.sqrt(1.0),
        "w_regSqrt": np.sqrt(0.5),
    }


def _plan(dims, kind="gaussNewtonGPU"):
    state = opt_tpu.NewState()
    return state.problem_plan(
        state.problem_define(
            energies.ALL_ENERGIES["volumetric_mesh_deformation"], kind
        ),
        dims,
    )


@pytest.fixture(scope="module")
def vol_case():
    W, H, D = 128, 16, 8
    plan = _plan([W, H, D])
    plan.set_solver_parameter("nIterations", 3)
    plan.set_solver_parameter("lIterations", 20)
    inputs = _vol_inputs(W, H, D)
    ref = plan.solve(dict(inputs), engine="xla")
    return plan, inputs, ref


@pytest.mark.parametrize(
    "tiles",
    [None, (4, 8), (2, 8), (4, 16)],
    ids=["auto_one_tile", "pairs_2x2", "pairs_4x2", "pairs_2x1"],
)
def test_stream3d_matches_xla(vol_case, tiles):
    plan, inputs, ref = vol_case
    kw = {} if tiles is None else {"tile_d": tiles[0], "tile_h": tiles[1]}
    eng = StreamSolver3D(plan, **kw)
    out = eng.solve(dict(inputs), interpret=True)
    np.testing.assert_allclose(out["final_cost"], ref, rtol=1e-4)


def test_stream3d_odd_tiles_serial():
    """Odd multi-tile count exercises the serial sweep fallback with
    real inter-tile halos."""
    W, H, D = 128, 16, 24
    plan = _plan([W, H, D])
    plan.set_solver_parameter("nIterations", 2)
    plan.set_solver_parameter("lIterations", 12)
    inputs = _vol_inputs(W, H, D)
    ref = plan.solve(dict(inputs), engine="xla")
    eng = StreamSolver3D(plan, tile_d=8, tile_h=16)
    assert eng.n_td * eng.n_th == 3
    out = eng.solve(dict(inputs), interpret=True)
    np.testing.assert_allclose(out["final_cost"], ref, rtol=1e-4)


def test_supports3d_gates():
    # LM runs on the pipelined loop too
    plan_lm = _plan([128, 16, 8], kind="LMGPU")
    assert supports3d(plan_lm)
    # misaligned W/H are PADDED, not rejected
    plan_w = _plan([96, 12, 8])
    assert supports3d(plan_w)
    # 2-D plans are the other engine's job
    state = opt_tpu.NewState()
    plan2d = state.problem_plan(
        state.problem_define(energies.image_warping, "gaussNewtonGPU"),
        [128, 64],
    )
    assert not supports3d(plan2d)


def test_stream3d_unaligned_padded():
    """W pads 96->128 lanes, H pads 20->24 sublanes; residuals on the
    pads are masked by real_domain_mask and padded unknowns stay frozen
    (sq = 0 there).  Multi-tile: T_h=8 -> 3 H-tiles incl. a pad-spanning
    one."""
    W, H, D = 96, 20, 8
    plan = _plan([W, H, D])
    plan.set_solver_parameter("nIterations", 2)
    plan.set_solver_parameter("lIterations", 12)
    inputs = _vol_inputs(W, H, D)
    ref = plan.solve(dict(inputs), engine="xla")
    eng = StreamSolver3D(plan, tile_d=4, tile_h=8)
    assert (eng.Hp, eng.Wp) == (24, 128) and eng.n_th == 3
    out = eng.solve(dict(inputs), interpret=True)
    np.testing.assert_allclose(out["final_cost"], ref, rtol=1e-4)


def test_stream3d_lm_matches_xla():
    """LM on the 3-D pipelined loop: scs diagonal, in-sweep Q
    accumulation, zeta exit, and the 3-pass exact residual replacement
    with slot-parity flip.  15 linear iterations with period 10
    exercises the reset branch; multi-tile exercises halos."""
    W, H, D = 128, 16, 8
    plan = _plan([W, H, D], kind="LMGPU")
    plan.set_solver_parameter("nIterations", 3)
    plan.set_solver_parameter("lIterations", 15)
    assert int(plan.solver_params["residual_reset_period"]) == 10
    inputs = _vol_inputs(W, H, D)
    ref = plan.solve(dict(inputs), engine="xla")
    eng = StreamSolver3D(plan, tile_d=4, tile_h=8)
    assert eng.n_td * eng.n_th == 4
    out = eng.solve(dict(inputs), interpret=True)
    np.testing.assert_allclose(out["final_cost"], ref, rtol=1e-4)


def test_stream3d_lm_no_reset_serial():
    """LM through the serial (odd tile count) sweep path with no reset
    inside the linear loop (period > lIterations)."""
    W, H, D = 128, 16, 24
    plan = _plan([W, H, D], kind="LMGPU")
    plan.set_solver_parameter("nIterations", 2)
    plan.set_solver_parameter("lIterations", 8)
    inputs = _vol_inputs(W, H, D)
    ref = plan.solve(dict(inputs), engine="xla")
    eng = StreamSolver3D(plan, tile_d=8, tile_h=16)
    assert eng.n_td * eng.n_th == 3
    out = eng.solve(dict(inputs), interpret=True)
    np.testing.assert_allclose(out["final_cost"], ref, rtol=1e-4)


def test_plan_solve_engine_dispatch(vol_case):
    """Plan.solve(engine="stream3d") routes to the 3-D engine and
    matches XLA; unsupported plans fall back to XLA silently."""
    plan, inputs, ref = vol_case
    got = plan.solve(dict(inputs), engine="stream3d")
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_stream3d_updates_unknowns(vol_case):
    plan, inputs, ref = vol_case
    eng = StreamSolver3D(plan, tile_d=4, tile_h=8)
    out = eng.solve(dict(inputs), interpret=True)
    x0 = plan.bind(dict(inputs))[0]
    moved = np.max(np.abs(
        np.asarray(out["x"]["Offset"]) - np.asarray(x0["Offset"])))
    assert moved > 1e-3  # the solve actually moved the volume


@pytest.mark.parametrize(
    "tiles",
    [None, (4, 8), (8, 16)],
    ids=["auto_one_tile", "pairs_2x2", "odd_serial"],
)
def test_stream3d_classic_matches_xla(tiles):
    """The classic (capacity) kernel: three sweeps/iter, 4 state
    fields, p windows off the single haloed buffer -- the variant that
    unlocks 384^3 (the pipelined state OOMed there,
    docs/ROUND3_TODO.md #13).  Parity across one-tile, paired and
    odd-serial sweeps."""
    W, H, D = 128, 16, 8 if tiles != (8, 16) else 24
    plan = _plan([W, H, D])
    plan.set_solver_parameter("nIterations", 3)
    plan.set_solver_parameter("lIterations", 20)
    inputs = _vol_inputs(W, H, D)
    ref = plan.solve(dict(inputs), engine="xla")
    kw = {} if tiles is None else {"tile_d": tiles[0], "tile_h": tiles[1]}
    eng = StreamSolver3D(plan, variant="classic", **kw)
    assert eng.variant == "classic"
    out = eng.solve(dict(inputs), interpret=True)
    np.testing.assert_allclose(out["final_cost"], ref, rtol=1e-4)


def _noconst_energy(O):
    """3-D energy with NO const images (nC==0): fit-to-constant plus
    forward-difference smoothness on one unknown.  Covers the stream3d
    backend's no-cins path (alias index 2, dyn copy split into two
    DMAs) that every volumetric_mesh_deformation case misses."""
    W, H, D = O.Dim("W", 0), O.Dim("H", 1), O.Dim("D", 2)
    X = O.Unknown("X", O.opt_float3, (W, H, D), 0)
    w_fitSqrt = O.Param("w_fitSqrt", 1)
    w_regSqrt = O.Param("w_regSqrt", 2)
    O.UsePreconditioner(True)
    O.Energy(w_fitSqrt * (X(0, 0, 0) - 0.5))
    for i, j, k in O.Stencil([(1, 0, 0), (0, 1, 0), (0, 0, 1)]):
        d = X(0, 0, 0) - X(i, j, k)
        O.Energy(w_regSqrt * O.Select(O.InBounds(i, j, k), d, 0.0))


@pytest.mark.parametrize("variant", ["pipelined", "classic"])
def test_stream3d_no_const_images(variant):
    """nC==0 parity in interpret mode on both kernel variants."""
    W, H, D = 128, 16, 8
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(_noconst_energy, "gaussNewtonGPU"),
        [W, H, D],
    )
    plan.set_solver_parameter("nIterations", 2)
    plan.set_solver_parameter("lIterations", 12)
    rng = np.random.RandomState(3)
    inputs = {
        "X": rng.rand(D, H, W, 3).astype(np.float32),
        "w_fitSqrt": np.sqrt(1.0),
        "w_regSqrt": np.sqrt(0.3),
    }
    ref = plan.solve(dict(inputs), engine="xla")
    eng = StreamSolver3D(plan, variant=variant)
    assert eng.const_names == [], "case must exercise nC==0"
    out = eng.solve(dict(inputs), interpret=True)
    np.testing.assert_allclose(out["final_cost"], ref, rtol=1e-4)


def test_stream3d_classic_lm_reset():
    """LM through the classic kernel: Q/zeta exit plus the periodic
    exact residual replacement (delta staged into the zero-edged
    scratch, one apply pass recomputes r/bn/qd; p NOT recomputed --
    the classic-loop reset semantics of stream_shard._shard_pcg_lm)."""
    W, H, D = 128, 16, 8
    plan = _plan([W, H, D], kind="LMGPU")
    plan.set_solver_parameter("nIterations", 2)
    plan.set_solver_parameter("lIterations", 12)
    plan.set_solver_parameter("residual_reset_period", 5)
    inputs = _vol_inputs(W, H, D)
    ref = plan.solve(dict(inputs), engine="xla")
    eng = StreamSolver3D(plan, tile_d=4, tile_h=8, variant="classic")
    assert eng.n_td * eng.n_th == 4
    out = eng.solve(dict(inputs), interpret=True)
    np.testing.assert_allclose(out["final_cost"], ref, rtol=1e-4)


def test_stream3d_variant_pick(monkeypatch):
    """Auto variant selection: pipelined while its 8 state fields fit
    the HBM gate, classic past that (the 384^3 regime), ineligible when
    even classic cannot fit; OPT_TPU_STREAM3D_VARIANT overrides."""
    from opt_tpu.ops.stream3d import (
        _hbm_fits3d, _pick_variant3d, supports3d as s3d)

    small = _plan([128, 16, 8])
    assert _pick_variant3d(small) == "pipelined"
    # 384^3 (the measured pipelined OOM, 18.71 GB of 15.75 incl. the
    # chunked outer's padded-duplicate planes): classic fits --
    # (18+5*6+12)*384^3*4 = 12.7 GiB vs pipelined's 16.5 over the
    # 14.17 GiB gate
    big = _plan([384, 384, 384])
    assert not _hbm_fits3d(big, "pipelined")
    assert _hbm_fits3d(big, "classic")
    assert _pick_variant3d(big) == "classic"
    assert s3d(big)
    eng = StreamSolver3D(big)
    assert eng.variant == "classic"
    # past even classic: 512^3 wants (18+30+12)*512^3*4 = 30 GiB
    huge = _plan([512, 512, 512])
    assert _pick_variant3d(huge) is None
    assert not s3d(huge)
    monkeypatch.setenv("OPT_TPU_STREAM3D_VARIANT", "classic")
    assert _pick_variant3d(small) == "classic"


def test_auto_engine_volumetric():
    """engine='auto' routes GN AND LM volumes >= 64^3 voxels to the
    3-D streamed engine (measured over fused XLA on v5e: GN 1.19x at
    64^3 / 2.67x at 128^3, LM 1.20x / 2.58x -- docs/sweep_tpu_r3.csv);
    small volumes stay on XLA."""
    big = _plan([64, 64, 64])
    assert big._pick_engine("auto") == "stream3d"
    small = _plan([32, 32, 32])
    assert small._pick_engine("auto") == "xla"
    lm = _plan([64, 64, 64], kind="LMGPU")
    assert lm._pick_engine("auto") == "stream3d"
    lm_small = _plan([32, 32, 32], kind="LMGPU")
    assert lm_small._pick_engine("auto") == "xla"
