"""Optical flow example app.

Python port of the reference app setup (reference:
examples/optical_flow/src/main.cpp, src/CombinedSolver.h,
src/ImageHelper.h): dogdance0/1 converted to grayscale
((0.299R+0.587G+0.114B)/255, mLib baseImage.h:1461-1468), strided, then a
2-level scale-space (Gaussian sigma 5.0 then 1.0, boundary-renormalized
separable filter, kernel radius ceil(2 sigma)); flow init 0; w_reg=0.1 and
w_fit stepping 10 -> 30 -> 50 across solves (CombinedSolver.h:67-95).
Coarse level is solved first; the golden cost is the FIRST solve's final
cost: 0.52119255 at stride 16 (examples/test_final_cost.py:63).
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


def filter_gaussian(img, sigma):
    """Separable Gaussian with boundary renormalization
    (ImageHelper.h:73-115)."""
    radius = int(np.ceil(2.0 * sigma))
    k = np.exp(-(np.arange(radius + 1) ** 2) / (2.0 * sigma * sigma))
    kernel = np.concatenate([k[::-1], k[1:]]).astype(np.float32)
    H, W = img.shape

    def conv1d(a, axis):
        n = a.shape[axis]
        out = np.zeros_like(a)
        wsum = np.zeros_like(a)
        for off in range(-radius, radius + 1):
            wgt = kernel[abs(off) + 0] if False else k[abs(off)]
            src = np.roll(a, -off, axis=axis)
            valid = np.ones_like(a, dtype=bool)
            idx = np.arange(n) + off
            mask1d = (idx >= 0) & (idx < n)
            shape = [1, 1]
            shape[axis] = n
            valid = valid & mask1d.reshape(shape)
            out += np.where(valid, wgt * src, 0.0)
            wsum += np.where(valid, wgt, 0.0)
        return np.where(wsum > 0, out / wsum, out)

    res = conv1d(img.astype(np.float32), 1)  # x pass
    res = conv1d(res, 0)  # y pass
    return res


def compute_du(img):
    """3-row horizontal difference / 8, zero border (CombinedSolver.h:152)."""
    out = np.zeros_like(img)
    out[1:-1, 1:-1] = (
        -img[0:-2, 0:-2] - img[1:-1, 0:-2] - img[2:, 0:-2]
        + img[0:-2, 2:] + img[1:-1, 2:] + img[2:, 2:]
    ) / 8.0
    return out


def compute_dv(img):
    out = np.zeros_like(img)
    out[1:-1, 1:-1] = (
        -img[0:-2, 0:-2] - img[0:-2, 1:-1] - img[0:-2, 2:]
        + img[2:, 0:-2] + img[2:, 1:-1] + img[2:, 2:]
    ) / 8.0
    return out


class OpticalFlowSolver(CombinedSolver):
    NUM_LEVELS = 2
    SIGMAS = (1.0, 5.0)

    def __init__(self, source_gray, target_gray, params, backend,
                 numthreads):
        super().__init__(params, backend, numthreads)
        H, W = source_gray.shape
        self.dims = [W, H]
        self.levels = []
        for sigma in self.SIGMAS:
            src = filter_gaussian(source_gray, sigma)
            tar = filter_gaussian(target_gray, sigma)
            self.levels.append(
                {
                    "I": src[..., None],
                    "I_hat": tar[..., None],
                    "I_hat_dx": compute_du(tar)[..., None],
                    "I_hat_dy": compute_dv(tar)[..., None],
                    "X": np.zeros((H, W, 2), np.float32),
                }
            )
        self.add_opt_solvers(self.dims, energies.optical_flow)
        self.first_solve_cost = None

    def combined_solve_init(self):
        self.m_weightFit = 10.0
        weight_reg = 0.1
        self.m_fitStepSize = (50.0 - self.m_weightFit) / (
            self.m_combinedSolverParameters.numIter * self.NUM_LEVELS
        )
        self.m_problemParams["w_fit"] = np.sqrt(self.m_weightFit)
        self.m_problemParams["w_reg"] = np.sqrt(weight_reg)

    def pre_single_solve(self):
        for lv in self.levels:
            lv["X"] = np.zeros_like(lv["X"])

    def pre_nonlinear_solve(self, i):
        self.m_weightFit += self.m_fitStepSize
        self.m_problemParams["w_fit"] = np.sqrt(self.m_weightFit)

    def solve_all(self):
        """Hierarchical override (CombinedSolver.h:45-66): coarse->fine."""
        self.combined_solve_init()
        for s in self.m_solverInfo:
            for li in range(self.NUM_LEVELS - 1, -1, -1):
                lv = self.levels[li]
                if li < self.NUM_LEVELS - 1:
                    lv["X"] = self.levels[li + 1]["X"].copy()
                for key in ("X", "I", "I_hat", "I_hat_dx", "I_hat_dy"):
                    self.m_problemParams[key] = lv[key]
                self._single_solve(s)
                lv["X"] = self.m_problemParams["X"]
                if self.first_solve_cost is None:
                    self.first_solve_cost = s.get("final_cost")
        self.combined_solve_finalize()

    def combined_solve_finalize(self):
        report_final_costs(
            "Optical Flow",
            self.m_combinedSolverParameters,
            self.get_cost("Opt(GN)"),
            self.get_cost("Opt(LM)"),
        )

    def result(self):
        return self.levels[0]["X"]


def run(argv=None):
    args = make_arg_parser().parse_args(argv)
    if args.file == 1:
        src_f, tar_f = "dogdance0.png", "dogdance1.png"
    else:
        src_f, tar_f = "dogdance0_large.png", "dogdance1_large.png"

    def gray(path):
        img = read_png(data_path(path)).astype(np.float32)
        g = (
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        ) / 255.0
        return g.astype(np.float32)

    st = args.stride
    src = gray(src_f)
    tar = gray(tar_f)
    th, tw = src.shape[0] // st, src.shape[1] // st
    src = src[: th * st : st, : tw * st : st]
    tar = tar[: th * st : st, : tw * st : st]

    params = CombinedSolverParameters.from_args(args)
    solver = OpticalFlowSolver(src, tar, params, args.backend,
                               args.numthreads)
    solver.solve_all()
    return solver


if __name__ == "__main__":
    run()
