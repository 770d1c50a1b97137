"""Per-kernel profiled execution (collect_kernel_timing): reference
kernel names in the timing table, numerics matching the fused path."""

import numpy as np
import pytest

import opt_tpu
from opt_tpu import energies


def _warp_inputs(W, H, seed=0):
    rng = np.random.RandomState(seed)
    ur = rng.randn(H, W, 2).astype(np.float32)
    cons = np.full((H, W, 2), -1.0, np.float32)
    cons[0, : W // 4] = ur[0, : W // 4] + 0.5
    return {
        "Offset": np.zeros((H, W, 2), np.float32),
        "Angle": np.zeros((H, W, 1), np.float32),
        "UrShape": ur,
        "Constraints": cons,
        "Mask": np.zeros((H, W, 1), np.float32),
        "w_fitSqrt": np.sqrt(0.5),
        "w_regSqrt": np.sqrt(2.0),
    }


@pytest.mark.parametrize("kind", ["gaussNewtonGPU", "LMGPU"])
def test_profiled_matches_fused(kind):
    W = H = 24
    inputs = _warp_inputs(W, H)

    def solve(collect):
        state = opt_tpu.NewState(collect_kernel_timing=collect)
        plan = state.problem_plan(
            state.problem_define(energies.image_warping, kind), [W, H]
        )
        plan.set_solver_parameter("nIterations", 3)
        plan.set_solver_parameter("lIterations", 12)
        plan.init(inputs)
        while plan.step():
            pass
        return plan

    fused = solve(False)
    prof = solve(True)
    assert prof.final_cost() == pytest.approx(
        fused.final_cost(), rel=1e-5
    )

    # the reference per-kernel table: PCG kernels with counts
    rec = prof.timer.records
    for name in ("PCGInit1", "PCGStep1", "PCGStep2", "PCGStep3",
                 "PCGLinearUpdate", "computeCost"):
        assert name in rec, f"missing kernel row {name}"
    assert rec["PCGStep1"][0] == rec["PCGStep3"][0] >= 3
    assert rec["PCGInit1"][0] == 3
    if kind == "LMGPU":
        assert "computeModelCost" in rec
        assert "computeAdelta" in rec  # reset period 10 < 12 iterations

    # table renders with Count/Total/Average columns
    lines = []
    prof.timer.evaluate(out=lines.append)
    header = [l for l in lines if "Kernel" in l]
    assert header and "Count" in header[0] and "Average" in header[0]
    assert any(l.startswith("PCGStep1") for l in lines)
