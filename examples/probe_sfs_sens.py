"""Probe: SFS final-cost sensitivity at the reference perf config.

The VMEM whole-solve kernel measured cost 78.3053 vs the fused XLA
program's 79.3504 at shape_from_shading 640x480 60x10 (1.3% apart,
kernel LOWER; probe_vmem_more.py, docs/sweep_tpu_r5.csv).  Before
reading that as an engine defect, measure the problem's own
sensitivity: run the SAME xla engine on inputs perturbed by 1e-6 /
2e-6 and record the final-cost spread.  SFS's normals (1/sqrt of
near-zero sums) amplify f32 rounding chaotically mid-convergence, so
any reduction-order change moves the trajectory; the question is
whether the engine difference exceeds the input-noise envelope.

Run alone -- owns the TPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import opt_tpu  # noqa: E402
from opt_tpu import energies  # noqa: E402
from opt_tpu.io.imagedump import read_imagedump  # noqa: E402

data_dir = os.environ.get("OPT_TPU_DATA", "/root/reference/examples/data")
prefix = os.path.join(data_dir, "shape_from_shading", "default")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from shape_from_shading import load_sfs_parameters  # noqa: E402

init_unknown = read_imagedump(prefix + "_initialUnknown.imagedump")
H, W = init_unknown.shape[:2]
edge_masks = read_imagedump(prefix + "_maskEdgeMap.imagedump")
inputs = {
    "X": init_unknown.copy(),
    "D_i": read_imagedump(prefix + "_targetDepth.imagedump"),
    "Im": read_imagedump(prefix + "_targetIntensity.imagedump"),
    "edgeMaskR": edge_masks[:H, :, 0].astype(np.float32)[..., None],
    "edgeMaskC": edge_masks[H:, :, 0].astype(np.float32)[..., None],
    **load_sfs_parameters(prefix + ".SFSSolverParameters"),
}

state = opt_tpu.NewState()
plan = state.problem_plan(
    state.problem_define(energies.shape_from_shading, "gaussNewtonGPU"),
    [W, H])
plan.set_solver_parameter("nIterations", 60)
plan.set_solver_parameter("lIterations", 10)

base = plan.solve(dict(inputs), engine="xla")
print(f"xla base cost: {base:.6f}", flush=True)
for eps in (1e-6, 2e-6, 1e-5):
    p = dict(inputs)
    p["X"] = inputs["X"] + np.float32(eps)
    c = plan.solve(p, engine="xla")
    print(f"xla X+{eps:g}: {c:.6f}  rel-vs-base {abs(c-base)/abs(base):.3e}",
          flush=True)
