"""Shape from shading example app.

Python port of the reference app setup (reference:
examples/shape_from_shading/src/main.cpp, SFSSolverInput.h,
TerraSolverParameters.h): default_* imagedumps (initial depth, target
depth, target intensity, stacked edge masks) plus the binary
.SFSSolverParameters struct (weights, camera intrinsics, 9 SH lighting
coefficients).  The reference's golden-cost suite does not cover SFS
(examples/test_final_cost.py:65, placeholder -1)."""

import struct

import numpy as np

from common import (
    CombinedSolver,
    CombinedSolverParameters,
    data_path,
    make_arg_parser,
    report_final_costs,
)

from opt_tpu.io.imagedump import read_imagedump, write_imagedump
from opt_tpu import energies


def load_sfs_parameters(path):
    """TerraSolverParameters binary layout (TerraSolverParameters.h:7-31):
    7 weight floats, fx fy ux uy, 4x4 deltaTransform, 9 lighting coeffs."""
    raw = open(path, "rb").read()
    f = struct.unpack_from("<27f", raw, 0)
    lighting = struct.unpack_from("<9f", raw, 27 * 4)
    return {
        "w_p": f[0],  # weightFitting
        "w_s": f[1],  # weightRegularizer
        "w_g": f[3],  # weightShading
        "f_x": f[7],
        "f_y": f[8],
        "u_x": f[9],
        "u_y": f[10],
        **{f"L_{k+1}": lighting[k] for k in range(9)},
    }


class SFSSolver(CombinedSolver):
    def __init__(self, inputs, params, backend, numthreads):
        super().__init__(params, backend, numthreads)
        self.inputs = inputs
        H, W = inputs["X"].shape[:2]
        self.dims = [W, H]
        self.add_opt_solvers(self.dims, energies.shape_from_shading)

    def combined_solve_init(self):
        self.m_problemParams = dict(self.inputs)

    def pre_single_solve(self):
        self.m_problemParams["X"] = self.inputs["X"].copy()

    def combined_solve_finalize(self):
        report_final_costs(
            "Shape From Shading",
            self.m_combinedSolverParameters,
            self.get_cost("Opt(GN)"),
            self.get_cost("Opt(LM)"),
        )

    def result(self):
        return self.m_problemParams["X"]


def run(argv=None):
    args = make_arg_parser().parse_args(argv)
    prefix = data_path("shape_from_shading/default")
    init_unknown = read_imagedump(prefix + "_initialUnknown.imagedump")
    target_depth = read_imagedump(prefix + "_targetDepth.imagedump")
    target_intensity = read_imagedump(prefix + "_targetIntensity.imagedump")
    edge_masks = read_imagedump(prefix + "_maskEdgeMap.imagedump")
    H = init_unknown.shape[0]
    maskR = edge_masks[:H, :, 0].astype(np.float32)[..., None]
    maskC = edge_masks[H:, :, 0].astype(np.float32)[..., None]

    sfs_params = load_sfs_parameters(prefix + ".SFSSolverParameters")
    inputs = {
        "X": init_unknown.copy(),
        "D_i": target_depth,
        "Im": target_intensity,
        "edgeMaskR": maskR,
        "edgeMaskC": maskC,
        **sfs_params,
    }
    params = CombinedSolverParameters.from_args(args)
    solver = SFSSolver(inputs, params, args.backend, args.numthreads)
    solver.solve_all()
    if not args.noOutput:
        write_imagedump("sfsOutput.imagedump",
                        solver.result().astype(np.float32))
    return solver


if __name__ == "__main__":
    run()
