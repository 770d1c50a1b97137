"""Output-parsing helpers (examples/outparse.py): the analogue of the
reference's outParse.py/TimingInfo.py extractors over the timing-table
contract (backend_cpu.t:245-312 format via opt_tpu/runtime/timing.py)."""

import io
import os
import sys
from contextlib import redirect_stdout

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
))

from outparse import parse_output, get_final_cost, get_overall_time  # noqa


SAMPLE = """\
final cost=861.7722167968750000
final cost=18.9921894073486328
--------------------------------------------------------
Kernel                                     Count   Total(ms)   Average(ms)
--------------------------------------------------------
init                                           1    1481.457     1481.4574
step_0                                         1    1850.243     1850.2427
step_1                                         2      56.300       28.1500
--------------------------------------------------------
TIMING init=1481.457 step_0=1850.243 step_1=56.300
Per-iter times ms (nonlinear): 647.009
"""


def test_parse_table_and_timing_line():
    info = parse_output(SAMPLE)
    assert info.kernel_names() == ["init", "step_0", "step_1"]
    assert info.count("step_1") == 2
    assert info.total_ms("init") == pytest.approx(1481.457)
    assert info.average_ms("step_1") == pytest.approx(28.15)
    assert info.timing == {"init": 1481.457, "step_0": 1850.243,
                           "step_1": 56.3}
    assert info.per_iter_ms == pytest.approx(647.009)
    assert get_overall_time(SAMPLE) == pytest.approx(
        1481.457 + 1850.243 + 56.3)


def test_final_cost_lines():
    info = parse_output(SAMPLE)
    assert info.final_costs == pytest.approx([861.772216796875,
                                              18.9921894073486328])
    assert get_final_cost(SAMPLE) == pytest.approx(18.9921894073486328)
    with pytest.raises(ValueError):
        parse_output("").final_cost


def test_parse_live_solver_output():
    """End-to-end: parse the real output of a timed verbose solve."""
    import opt_tpu

    def energy(O):
        W, H = O.Dim("W", 0), O.Dim("H", 1)
        X = O.Unknown("X", O.opt_float, (W, H), 0)
        T = O.Array("T", O.opt_float, (W, H), 1)
        O.Energy(X(0, 0) - T(0, 0))

    rng = np.random.RandomState(0)
    inputs = {"X": rng.rand(6, 8, 1).astype(np.float32),
              "T": rng.rand(6, 8, 1).astype(np.float32)}
    state = opt_tpu.NewState(collect_kernel_timing=True, verbosity=1)
    plan = state.problem_plan(
        state.problem_define(energy, "gaussNewtonGPU"), [8, 6])
    plan.set_solver_parameter("nIterations", 2)
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan.init(inputs)
        while plan.step():
            pass
    info = parse_output(buf.getvalue())
    assert "init" in info.kernel_names()
    assert any(n.startswith("step_") for n in info.kernel_names())
    assert info.final_cost == pytest.approx(plan.final_cost(), rel=1e-9)
    assert info.per_iter_ms is not None


def test_save_solver_results_csv_roundtrip(tmp_path):
    """ceresIterationComparison CSV contract (SolverIteration.h:28-65):
    per-solver cost/ms columns, rows padded to the longest series."""
    from common import save_solver_results, SolverIteration

    iters = {
        "Opt(GN)": [SolverIteration(10.0, 1.5), SolverIteration(5.0, 1.2)],
        "Ceres": [SolverIteration(9.0, 30.0)],
    }
    path = save_solver_results(str(tmp_path) + "/", "_float", iters, False)
    lines = open(path).read().strip().splitlines()
    header = lines[0].split(",")
    assert "Opt(GN) cost" in header and "Ceres ms" in header
    assert len(lines) == 3  # header + 2 rows (longest series)
    row2 = lines[2].split(",")
    # Ceres has only one iteration -> second row cells empty
    ceres_cost_col = header.index("Ceres cost")
    assert row2[ceres_cost_col] == ""
    gn_cost_col = header.index("Opt(GN) cost")
    assert float(row2[gn_cost_col]) == 5.0
