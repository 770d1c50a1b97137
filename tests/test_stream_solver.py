"""Streamed-constant tiled PCG engine (ops/stream_solver.py): parity with
the fused XLA solver in interpret mode (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import opt_tpu
from opt_tpu import energies
from opt_tpu.ops import stream_solver as ssv


def _warp_inputs(W, H, seed=0):
    rng = np.random.RandomState(seed)
    ur = rng.randn(H, W, 2).astype(np.float32)
    cons = np.full((H, W, 2), -1.0, np.float32)
    cons[::10, :] = np.abs(rng.randn(H, W, 2).astype(np.float32))[::10, :]
    return {
        "Offset": np.zeros((H, W, 2), np.float32),
        "Angle": np.zeros((H, W, 1), np.float32),
        "UrShape": ur,
        "Constraints": cons,
        "Mask": np.zeros((H, W, 1), np.float32),
        "w_fitSqrt": np.sqrt(0.5),
        "w_regSqrt": np.sqrt(2.0),
    }


def _poisson_inputs(W, H, seed=1):
    rng = np.random.RandomState(seed)
    mask = np.ones((H, W, 1), np.float32)
    mask[H // 4: -H // 4, W // 4: -W // 4] = 0
    return {
        "X": rng.rand(H, W, 4).astype(np.float32),
        "T": rng.rand(H, W, 4).astype(np.float32),
        "M": mask,
    }


def _xla_cost(plan, inputs, n_outer):
    x, data = plan.bind(inputs)
    sp = plan._sp_device()
    sp["nIterations"] = jnp.asarray(n_outer, jnp.int32)
    st = plan._full_solve_fn(x, data, sp)
    return float(st["prev_cost"]), st["x"]


@pytest.mark.parametrize(
    "energy,inputs_fn",
    [
        (energies.image_warping, _warp_inputs),
        # poisson exercises Exclude() (masking folds into sqrt_pre = 0)
        # and UsePreconditioner(False)
        (energies.poisson_image_editing, _poisson_inputs),
    ],
    ids=["image_warping", "poisson_exclude"],
)
def test_stream_matches_xla(energy, inputs_fn):
    W, H = 128, 64
    inputs = inputs_fn(W, H)
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energy, "gaussNewtonGPU"), [W, H])
    plan.set_solver_parameter("nIterations", 3)
    plan.set_solver_parameter("lIterations", 15)
    assert ssv.supports(plan)
    ref_cost, x_ref = _xla_cost(plan, inputs, 3)
    out = ssv.StreamSolver(plan).solve(inputs)
    # scaled-space PCG reorders float ops; GN absorbs it
    assert out["final_cost"] == pytest.approx(ref_cost, rel=1e-4)
    for n in x_ref:
        np.testing.assert_allclose(
            np.asarray(out["x"][n]), np.asarray(x_ref[n]),
            rtol=1e-3, atol=1e-4,
        )


@pytest.mark.parametrize("fuse", [True, False], ids=["fused", "unfused"])
@pytest.mark.parametrize(
    "energy,inputs_fn",
    [
        (energies.image_warping, _warp_inputs),
        (energies.poisson_image_editing, _poisson_inputs),
    ],
    ids=["image_warping", "poisson_exclude"],
)
def test_stream_hbm_matches_xla(energy, inputs_fn, fuse):
    """Fully-streamed (HBM-state) classic variant: same parity contract,
    with and without the fused beta-step."""
    W, H = 128, 64
    inputs = inputs_fn(W, H)
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energy, "gaussNewtonGPU"), [W, H])
    plan.set_solver_parameter("nIterations", 3)
    plan.set_solver_parameter("lIterations", 15)
    assert ssv.supports(plan, tile=8, state_in="hbm")
    ref_cost, x_ref = _xla_cost(plan, inputs, 3)
    solver = ssv.StreamSolverHBM(plan, variant="classic")
    assert solver.variant == "classic"
    solver.fuse_beta = fuse
    out = solver.solve(inputs)
    assert out["final_cost"] == pytest.approx(ref_cost, rel=1e-4)
    for n in x_ref:
        np.testing.assert_allclose(
            np.asarray(out["x"][n]), np.asarray(x_ref[n]),
            rtol=1e-3, atol=1e-4,
        )


@pytest.mark.parametrize(
    "energy,inputs_fn",
    [
        (energies.image_warping, _warp_inputs),
        # poisson exercises Exclude() (masking folds into sqrt_pre = 0)
        # and UsePreconditioner(False)
        (energies.poisson_image_editing, _poisson_inputs),
    ],
    ids=["image_warping", "poisson_exclude"],
)
def test_stream_hbm_pipelined_matches_xla(energy, inputs_fn):
    """Pipelined one-sweep-per-iteration PCG (the GN default variant):
    same parity contract as classic."""
    W, H = 128, 64
    inputs = inputs_fn(W, H)
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energy, "gaussNewtonGPU"), [W, H])
    plan.set_solver_parameter("nIterations", 3)
    plan.set_solver_parameter("lIterations", 15)
    ref_cost, x_ref = _xla_cost(plan, inputs, 3)
    solver = ssv.StreamSolverHBM(plan)
    assert solver.variant == "pipelined"  # GN default
    out = solver.solve(inputs)
    assert out["final_cost"] == pytest.approx(ref_cost, rel=1e-4)
    for n in x_ref:
        np.testing.assert_allclose(
            np.asarray(out["x"][n]), np.asarray(x_ref[n]),
            rtol=1e-3, atol=1e-4,
        )


def test_stream_hbm_pipelined_odd_tiles():
    """Odd tile count exercises the serial (non-pair) sweep path."""
    W, H = 128, 24  # T=8 -> 3 tiles
    inputs = _warp_inputs(W, H)
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.image_warping, "gaussNewtonGPU"),
        [W, H])
    plan.set_solver_parameter("nIterations", 2)
    plan.set_solver_parameter("lIterations", 12)
    ref_cost, _ = _xla_cost(plan, inputs, 2)
    solver = ssv.StreamSolverHBM(plan, tile=8)
    assert solver.variant == "pipelined" and solver.n_tiles % 2 == 1
    out = solver.solve(inputs)
    assert out["final_cost"] == pytest.approx(ref_cost, rel=1e-4)


@pytest.mark.parametrize("fuse", [True, False], ids=["fused", "unfused"])
def test_stream_hbm_lm_matches_xla(fuse):
    """LM through the streamed backend: in-kernel Q/zeta exit and
    residual reset, trust region in solver/core via pcg_backend."""
    W, H = 128, 64
    inputs = _warp_inputs(W, H)
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.image_warping, "LMGPU"), [W, H])
    plan.set_solver_parameter("nIterations", 4)
    plan.set_solver_parameter("lIterations", 15)
    # exercise the in-kernel reset (period 10 < 15 linear iterations)
    assert int(plan.solver_params["residual_reset_period"]) == 10
    assert ssv.supports(plan, tile=8, state_in="hbm")
    ref_cost, x_ref = _xla_cost(plan, inputs, 4)
    solver = ssv.StreamSolverHBM(plan)
    solver.fuse_beta = fuse
    out = solver.solve(inputs)
    assert out["final_cost"] == pytest.approx(ref_cost, rel=1e-4)
    for n in x_ref:
        np.testing.assert_allclose(
            np.asarray(out["x"][n]), np.asarray(x_ref[n]),
            rtol=2e-3, atol=1e-4,
        )


def test_stream_hbm_lm_pipelined_matches_xla():
    """LM on the PIPELINED one-barrier kernel (opt-in via
    variant='pipelined'): scs diagonal in the apply, in-sweep Q
    accumulation, zeta exit, and the 3-pass exact residual
    replacement with slot-parity flip.  15 linear iterations with
    period 10 exercises the reset branch."""
    W, H = 128, 64
    inputs = _warp_inputs(W, H)
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.image_warping, "LMGPU"), [W, H])
    plan.set_solver_parameter("nIterations", 4)
    plan.set_solver_parameter("lIterations", 15)
    assert int(plan.solver_params["residual_reset_period"]) == 10
    ref_cost, x_ref = _xla_cost(plan, inputs, 4)
    solver = ssv.StreamSolverHBM(plan, variant="pipelined")
    assert solver.variant == "pipelined"
    out = solver.solve(inputs)
    assert out["final_cost"] == pytest.approx(ref_cost, rel=1e-4)
    for n in x_ref:
        np.testing.assert_allclose(
            np.asarray(out["x"][n]), np.asarray(x_ref[n]),
            rtol=2e-3, atol=1e-4,
        )


def test_stream_hbm_lm_pipelined_odd_tiles():
    """Pipelined LM through the serial (odd tile count) sweep path,
    no reset inside the linear loop (period > lIterations)."""
    W, H = 128, 24  # T=8 -> 3 tiles
    inputs = _warp_inputs(W, H)
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.image_warping, "LMGPU"), [W, H])
    plan.set_solver_parameter("nIterations", 2)
    plan.set_solver_parameter("lIterations", 8)
    ref_cost, _ = _xla_cost(plan, inputs, 2)
    solver = ssv.StreamSolverHBM(plan, tile=8, variant="pipelined")
    assert solver.variant == "pipelined" and solver.n_tiles % 2 == 1
    out = solver.solve(inputs)
    assert out["final_cost"] == pytest.approx(ref_cost, rel=1e-4)


def test_stream_hbm_supports_big():
    """HBM-state mode admits sizes the resident-state mode rejects."""
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.image_warping, "gaussNewtonGPU"),
        [4096, 4096])
    assert not ssv.supports(plan)
    assert ssv.supports(plan, tile=8, state_in="hbm")


def test_supports_hbm_divisor_aware():
    """The HBM gate searches divisor tiles: H=1000 has no tile-16 fit
    but T=8 divides it (advisor r2 finding)."""
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.image_warping, "gaussNewtonGPU"),
        [128, 1000])
    assert not ssv.supports(plan, tile=16, state_in="hbm")
    assert ssv.supports_hbm(plan)
    solver = ssv.StreamSolverHBM(plan)
    assert 1000 % solver.tile == 0


def test_supports_hbm_8192():
    """8192^2 stays solvable: the XLA fused program OOMs at compile
    (needs 32.7 GB vs 15.75 GB v5e HBM, /tmp chain-4 r3 record) but the
    streamed HBM engine is eligible and auto-picked there — it extends
    the solvable grid range past XLA's, not just past VMEM."""
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.image_warping, "gaussNewtonGPU"),
        [8192, 8192])
    assert ssv.supports_hbm(plan)
    assert plan._pick_engine("auto") == "stream_hbm"


def test_auto_engine_selection():
    """Plan.solve(engine='auto') routes >=2048^2 eligible grids to the
    streamed HBM engine and leaves small grids / graphs on XLA."""
    state = opt_tpu.NewState()
    big = state.problem_plan(
        state.problem_define(energies.image_warping, "gaussNewtonGPU"),
        [2048, 2048])
    assert big._pick_engine("auto") == "stream_hbm"
    small = state.problem_plan(
        state.problem_define(energies.image_warping, "gaussNewtonGPU"),
        [128, 64])
    assert small._pick_engine("auto") == "xla"
    graph = state.problem_plan(
        state.problem_define(energies.arap_mesh_deformation,
                             "gaussNewtonGPU"), [64, 128])
    assert graph._pick_engine("auto") == "xla"
    # explicit choice passes through untouched
    assert big._pick_engine("xla") == "xla"
    assert small._pick_engine("vmem") == "vmem"


def test_auto_engine_vmem_tpu_only(monkeypatch):
    """auto routes f32 grids >= 256^2 -- GN AND LM -- to the
    whole-solve-in-VMEM engine on TPU (GN 2.2x/1.9x, LM 3.6x at 512^2
    8x400, docs/sweep_tpu_r5.csv) but never on CPU (interpret mode
    would crawl).  The vmem check precedes the streamed HBM check, so
    512^2 LM (eligible for both) takes the measured-faster kernel;
    past the VMEM budget LM falls through to stream_hbm as before."""
    import jax

    state = opt_tpu.NewState()
    mk = lambda kind, dims: state.problem_plan(
        state.problem_define(energies.image_warping, kind), dims)
    mid = mk("gaussNewtonGPU", [256, 256])
    assert mid._pick_engine("auto") == "xla"      # CPU test backend
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert mid._pick_engine("auto") == "vmem"
    assert mk("gaussNewtonGPU", [512, 512])._pick_engine("auto") == "vmem"
    assert mk("LMGPU", [256, 256])._pick_engine("auto") == "vmem"
    assert mk("LMGPU", [512, 512])._pick_engine("auto") == "vmem"
    # past the VMEM budget: LM falls through to the streamed engine
    assert mk("LMGPU", [1024, 1024])._pick_engine("auto") == "stream_hbm"
    # below the measured crossover and past the budget: xla
    assert mk("gaussNewtonGPU", [128, 128])._pick_engine("auto") == "xla"
    assert mk("gaussNewtonGPU", [1024, 1024])._pick_engine("auto") == "xla"


def test_supports_rejects():
    state = opt_tpu.NewState()
    # LM rejected
    plan = state.problem_plan(
        state.problem_define(energies.image_warping, "LMGPU"), [128, 64])
    assert not ssv.supports(plan)
    # graph energies rejected
    plan = state.problem_plan(
        state.problem_define(energies.arap_mesh_deformation,
                             "gaussNewtonGPU"), [64, 128])
    assert not ssv.supports(plan)
    # unaligned width rejected
    plan = state.problem_plan(
        state.problem_define(energies.image_warping, "gaussNewtonGPU"),
        [100, 64])
    assert not ssv.supports(plan)
    # over-VMEM sizes rejected (512^2: resident state + temps > budget)
    plan = state.problem_plan(
        state.problem_define(energies.image_warping, "gaussNewtonGPU"),
        [512, 512])
    assert not ssv.supports(plan)


def test_pipelined_lifts_nc_ge_nu_constraint():
    """An energy with more unknown than constant planes is ineligible
    for the classic kernel's stage aliasing but solves through the
    pipelined variant (round 3)."""
    def big_unknown(O):
        W, H = O.Dim("W", 0), O.Dim("H", 1)
        X = O.Unknown("X", O.opt_float4, (W, H), 0)
        T = O.Array("T", O.opt_float, (W, H), 1)
        for x, y in ((1, 0), (0, 1)):
            O.Energy(O.Select(O.InBounds(x, y),
                              X(0, 0) - X(x, y), 0))
        O.Energy(0.5 * (O.Slice(X, 0, 1)(0, 0) - T(0, 0)))

    W, H = 128, 32
    rng = np.random.RandomState(3)
    inputs = {"X": rng.rand(H, W, 4).astype(np.float32),
              "T": rng.rand(H, W, 1).astype(np.float32)}
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(big_unknown, "gaussNewtonGPU"), [W, H])
    plan.set_solver_parameter("nIterations", 2)
    plan.set_solver_parameter("lIterations", 12)
    assert not ssv.supports(plan, tile=8, state_in="hbm")  # nC < nU
    assert ssv.supports_hbm(plan)  # pipelined path qualifies
    ref_cost, _ = _xla_cost(plan, inputs, 2)
    solver = ssv.StreamSolverHBM(plan)
    assert solver.variant == "pipelined"
    out = solver.solve(inputs)
    assert out["final_cost"] == pytest.approx(ref_cost, rel=1e-4)


def test_engine_env_override(monkeypatch):
    """OPT_TPU_ENGINE forces the auto-engine choice (ops escape hatch)."""
    state = opt_tpu.NewState()
    big = state.problem_plan(
        state.problem_define(energies.image_warping, "gaussNewtonGPU"),
        [2048, 2048])
    monkeypatch.setenv("OPT_TPU_ENGINE", "xla")
    assert big._pick_engine("auto") == "xla"
    monkeypatch.delenv("OPT_TPU_ENGINE")
    assert big._pick_engine("auto") == "stream_hbm"
    # explicit engine ignores the env var
    monkeypatch.setenv("OPT_TPU_ENGINE", "xla")
    assert big._pick_engine("stream_hbm") == "stream_hbm"


def test_auto_engine_lm_routes_stream():
    """LM plans route to the streamed engine from 512^2 up (sizes far
    below the GN threshold: LM's XLA program is heavier -- 512^2
    stream 91.7 ms vs XLA 106.4, 1024^2 323.1 vs 456.6, 2048^2 1285.6
    vs 3041.9, docs/sweep_tpu_r3.csv); 256^2 and below stay on XLA
    (47.6 vs 53.1 ms)."""
    state = opt_tpu.NewState()
    for size in (512, 1024, 2048):
        big = state.problem_plan(
            state.problem_define(energies.image_warping, "LMGPU"),
            [size, size])
        assert big._pick_engine("auto") == "stream_hbm"
    gn_mid = state.problem_plan(
        state.problem_define(energies.image_warping, "gaussNewtonGPU"),
        [1024, 1024])
    assert gn_mid._pick_engine("auto") == "xla"  # GN crossover is 2048^2
    small = state.problem_plan(
        state.problem_define(energies.image_warping, "LMGPU"),
        [256, 256])
    assert small._pick_engine("auto") == "xla"


def test_f64_falls_back_to_xla():
    """The streamed engines are f32-only (split-bf16 / Mosaic have no
    f64 path, docs/ARCHITECTURE.md Known deviations): a
    double_precision=True plan must fail every streamed gate and
    auto-route to the fused XLA program even past the crossovers."""
    from opt_tpu.ops import stream3d as s3d
    from opt_tpu.parallel import stream_shard as pss
    import jax

    state = opt_tpu.NewState(double_precision=True)
    plan = state.problem_plan(
        state.problem_define(energies.image_warping, "gaussNewtonGPU"),
        [2048, 2048])
    assert not ssv.supports_hbm(plan)
    assert plan._pick_engine("auto") == "xla"
    lm = state.problem_plan(
        state.problem_define(energies.image_warping, "LMGPU"),
        [1024, 1024])
    assert not ssv.supports_hbm(lm)
    assert lm._pick_engine("auto") == "xla"
    vol = state.problem_plan(
        state.problem_define(
            energies.ALL_ENERGIES["volumetric_mesh_deformation"],
            "gaussNewtonGPU"), [128, 128, 128])
    assert not s3d.supports3d(vol)
    assert vol._pick_engine("auto") == "xla"
    devs = np.array(jax.devices()[:8])
    mesh = jax.sharding.Mesh(devs, ("shard",))
    shard2d = state.problem_plan(
        state.problem_define(energies.image_warping, "gaussNewtonGPU"),
        [128, 64])
    assert not pss.supports(shard2d, mesh)
    assert not pss.supports3d(vol, mesh)


def test_donate_inputs_plumbing():
    """plan.solve(donate_inputs=True): on CPU (interpret mode) donation
    is inert, but the kwarg must plumb through to StreamSolverHBM.solve
    and produce the same cost as the default path.  (On TPU at
    chunked-outer sizes it skips the defensive input copy so the
    caller's relinquished device buffers are donated -- 8192^2 LM does
    not fit HBM while a second input copy is held; measured round 3.)"""
    W = H = 64
    inputs = _warp_inputs(W, H)
    state = opt_tpu.NewState()
    plan = state.problem_plan(
        state.problem_define(energies.image_warping, "gaussNewtonGPU"),
        [W, H])
    plan.set_solver_parameter("nIterations", 2)
    plan.set_solver_parameter("lIterations", 5)
    c_ref = plan.solve(inputs, engine="stream_hbm")
    # current_cost() after an engine solve binds _data LAZILY (the
    # eager re-bind cost a second full host->device transfer per solve)
    np.testing.assert_allclose(plan.current_cost(), c_ref, rtol=1e-5)
    c_don = plan.solve(inputs, engine="stream_hbm", donate_inputs=True)
    np.testing.assert_allclose(c_don, c_ref, rtol=1e-6)
    # device-array inputs survive on CPU (donation inert there)
    dev = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
           for k, v in inputs.items()}
    c_dev = plan.solve(dev, engine="stream_hbm", donate_inputs=True)
    np.testing.assert_allclose(c_dev, c_ref, rtol=1e-6)
