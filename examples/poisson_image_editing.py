"""Poisson image editing example app.

Python port of the reference app setup (reference:
examples/poisson_image_editing/src/main.cpp and src/CombinedSolver.h):
strided load of poisson0/poisson1/poisson_mask, mask semantics
(white mask pixel -> M=0 -> solved region), alpha channel pinned to 255,
golden final cost at stride 4, iterations (1,1,1): 1530364.25
(examples/test_final_cost.py:62).
"""

import numpy as np

from common import (
    CombinedSolver,
    CombinedSolverParameters,
    data_path,
    make_arg_parser,
)

from opt_tpu.io.png import read_png, write_png
from opt_tpu import energies


def load_rgba_f32(path, stride):
    img = read_png(path).astype(np.float32)
    th, tw = img.shape[0] // stride, img.shape[1] // stride
    img = img[: th * stride : stride, : tw * stride : stride]
    H, W = img.shape[:2]
    out = np.empty((H, W, 4), np.float32)
    out[..., :3] = img[..., :3]
    out[..., 3] = 255.0
    return out


class PoissonSolver(CombinedSolver):
    def __init__(self, image, target, mask, params, backend, numthreads):
        super().__init__(params, backend, numthreads)
        self.image = image
        self.target = target
        self.mask = mask
        H, W = image.shape[:2]
        self.dims = [W, H]
        self.add_opt_solvers(self.dims, energies.poisson_image_editing)

    def combined_solve_init(self):
        self.m_problemParams = {
            "X": self.image.copy(),
            "T": self.target,
            "M": self.mask,
        }

    def pre_single_solve(self):
        self.m_problemParams["X"] = self.image.copy()

    def combined_solve_finalize(self):
        self.ceres_iteration_comparison(
            "Poisson Image Editing",
            self.m_combinedSolverParameters.optDoublePrecision,
        )

    def result(self):
        return self.m_problemParams["X"]


def run(argv=None):
    args = make_arg_parser().parse_args(argv)
    stride = args.stride

    if args.file == 1:
        f0, f1, fm = "poisson0.png", "poisson1.png", "poisson_mask.png"
    else:
        f0, f1, fm = (
            "poisson0_large.png",
            "poisson1_large.png",
            "poisson_mask_large.png",
        )

    image = load_rgba_f32(data_path(f0), stride)
    target = load_rgba_f32(data_path(f1), stride)

    mi = read_png(data_path(fm))
    th, tw = mi.shape[0] // stride, mi.shape[1] // stride
    mask_img = mi[: th * stride : stride, : tw * stride : stride]
    # main.cpp takes channel .x of the mask; CombinedSolver.h:78-79 maps
    # white (255) -> 0 (solved), everything else -> 255 (excluded)
    mask = np.where(
        mask_img[..., 0] == 255, 0.0, 255.0
    ).astype(np.float32)[..., None]

    params = CombinedSolverParameters.from_args(args)
    solver = PoissonSolver(
        image, target, mask, params, args.backend, args.numthreads
    )
    solver.solve_all()

    if not args.noOutput:
        res = solver.result()
        write_png("output.png", np.clip(res[..., :3], 0, 255))
    return solver


if __name__ == "__main__":
    run()
