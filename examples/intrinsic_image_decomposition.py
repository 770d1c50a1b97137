"""Intrinsic image decomposition example app.

Python port of the reference app setup (reference:
examples/intrinsic_image_decomposition/src/main.cpp and
src/CombinedSolver.h): ye_high2.png strided; r init = log2(chroma+0.01),
s init = log2(intensity+0.01), i = log2(rgb/255+0.01); w_fit=500,
w_regAlbedo=1000, w_regShading=10000, pNorm=0.8; r_const aliases the
unknown r (same bind index).  Golden final cost (stride 12, (1,1,1)):
3.31053e6 (examples/test_final_cost.py:61).
"""

import numpy as np

from common import (
    CombinedSolver,
    CombinedSolverParameters,
    data_path,
    make_arg_parser,
    report_final_costs,
)

from opt_tpu.io.png import read_png
from opt_tpu import energies


class IntrinsicSolver(CombinedSolver):
    def __init__(self, image, params, backend, numthreads):
        super().__init__(params, backend, numthreads)
        self.image = image  # (H, W, 3) float 0-255
        H, W = image.shape[:2]
        self.dims = [W, H]
        self.add_opt_solvers(
            self.dims, energies.intrinsic_image_decomposition
        )

    def _reset(self):
        EPS = 0.01
        v = self.image / 255.0
        intensity = v.mean(axis=-1, keepdims=True)
        chroma = v / intensity
        self.m_problemParams["i"] = np.log2(v + EPS).astype(np.float32)
        self.m_problemParams["r"] = np.log2(chroma + EPS).astype(np.float32)
        self.m_problemParams["s"] = np.log2(intensity + EPS).astype(
            np.float32
        )

    def combined_solve_init(self):
        self.m_problemParams["w_fitSqrt"] = np.sqrt(500.0)
        self.m_problemParams["w_regSqrtAlbedo"] = np.sqrt(1000.0)
        self.m_problemParams["w_regSqrtShading"] = np.sqrt(10000.0)
        self.m_problemParams["pNorm"] = 0.8
        self._reset()

    def pre_single_solve(self):
        self._reset()

    def combined_solve_finalize(self):
        report_final_costs(
            "Intrinsic Image Decomposition",
            self.m_combinedSolverParameters,
            self.get_cost("Opt(GN)"),
            self.get_cost("Opt(LM)"),
        )

    def result(self):
        return self.m_problemParams["r"], self.m_problemParams["s"]


def run(argv=None):
    args = make_arg_parser().parse_args(argv)
    name = "ye_high2.png" if args.file == 1 else "ye_high2_large.png"
    img = read_png(data_path(name)).astype(np.float32)
    st = args.stride
    tw, th = img.shape[1] // st, img.shape[0] // st
    img = img[: th * st : st, : tw * st : st, :3]  # C++ integer-division crop
    params = CombinedSolverParameters.from_args(args)
    solver = IntrinsicSolver(img, params, args.backend, args.numthreads)
    solver.solve_all()
    return solver


if __name__ == "__main__":
    run()
