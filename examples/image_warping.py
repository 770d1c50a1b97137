"""Image warping (2D ARAP) example app.

Python port of the reference app setup (reference:
examples/image_warping/src/main.cpp and src/CombinedSolver.h):
cat512 + mask + .constraints markers, border pixels self-pinned,
UrShape = pixel coords, Angle init 1e-5, w_fit=100, w_reg=0.01,
constraint interpolation alpha=(i+1)/numIter per outer iteration.
Golden final cost (defaults, (1,1,1)): 1774.3405
(examples/test_final_cost.py:60).
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


def load_constraints(path):
    """marker file: count, then 4 ints per marker (main.cpp:7-30)."""
    with open(path) as f:
        tokens = f.read().split()
    n = int(tokens[0])
    vals = list(map(int, tokens[1 : 1 + 4 * n]))
    return [vals[4 * k : 4 * k + 4] for k in range(n)]


class ImageWarpingSolver(CombinedSolver):
    def __init__(self, image_r32, image_color, mask, constraints, params,
                 backend, numthreads):
        super().__init__(params, backend, numthreads)
        self.image = image_r32
        self.image_color = image_color
        self.mask = mask  # (H, W) float; 0 = active
        self.constraints = constraints
        H, W = image_r32.shape
        self.dims = [W, H]
        self.add_opt_solvers(self.dims, energies.image_warping)

    def _reset(self):
        H, W = self.image.shape
        yy, xx = np.meshgrid(
            np.arange(H, dtype=np.float32),
            np.arange(W, dtype=np.float32),
            indexing="ij",
        )
        urshape = np.stack([xx, yy], axis=-1)  # {(float)x, (float)y}
        self.m_problemParams["UrShape"] = urshape
        self.m_problemParams["Offset"] = urshape.copy()
        self.m_problemParams["Angle"] = np.full(
            (H, W, 1), 1e-5, np.float32
        )
        self.m_problemParams["Mask"] = self.mask[..., None]
        self.set_constraint_image(1.0)

    def set_constraint_image(self, alpha):
        H, W = self.image.shape
        cons = np.full((H, W, 2), -1.0, np.float32)
        for x, y, cx, cy in self.constraints:
            if 0 <= x < W and 0 <= y < H and self.mask[y, x] == 0:
                cons[y, x, 0] = (1.0 - alpha) * x + alpha * cx
                cons[y, x, 1] = (1.0 - alpha) * y + alpha * cy
        self.m_problemParams["Constraints"] = cons

    def combined_solve_init(self):
        self.m_problemParams["w_fitSqrt"] = np.sqrt(100.0)
        self.m_problemParams["w_regSqrt"] = np.sqrt(0.01)
        self._reset()

    def pre_single_solve(self):
        self._reset()

    def pre_nonlinear_solve(self, i):
        alpha = (i + 1) / self.m_combinedSolverParameters.numIter
        self.set_constraint_image(alpha)

    def combined_solve_finalize(self):
        self.ceres_iteration_comparison(
            "Image Warping",
            self.m_combinedSolverParameters.optDoublePrecision,
        )


def run(argv=None):
    args = make_arg_parser().parse_args(argv)
    stride = args.stride

    if args.file == 1:
        base = "cat512"
    else:
        base = "cat4096"
    img = read_png(data_path(base + ".png")).astype(np.float32)
    mask_img = read_png(data_path(base + "_mask.png")).astype(np.float32)
    constraints = load_constraints(data_path(base + ".constraints"))

    th, tw = img.shape[0] // stride, img.shape[1] // stride
    img = img[: th * stride : stride, : tw * stride : stride]
    mask = mask_img[: th * stride : stride, : tw * stride : stride, 0]
    H, W = img.shape[:2]
    image_r32 = img[..., 0]  # main.cpp: imageR32 = imageColor.x
    image_color = img[..., :3]

    constraints = [[c // stride for c in row] for row in constraints]
    # border pixels pinned to themselves (main.cpp:163-178)
    for y in range(H):
        for x in range(W):
            if y == 0 or x == 0 or y == H - 1 or x == W - 1:
                constraints.append([x, y, x, y])

    params = CombinedSolverParameters.from_args(args)
    solver = ImageWarpingSolver(
        image_r32, image_color, mask, constraints, params,
        args.backend, args.numthreads,
    )
    solver.solve_all()

    if not args.noOutput:
        # warped output: sample colors at warped positions (nearest)
        off = solver.m_problemParams["Offset"]
        out = np.zeros((H, W, 3), np.float32)
        xi = np.clip(np.round(off[..., 0]).astype(int), 0, W - 1)
        yi = np.clip(np.round(off[..., 1]).astype(int), 0, H - 1)
        out[yi, xi] = image_color
        write_png("output_warped.png", out)
    return solver


if __name__ == "__main__":
    run()
