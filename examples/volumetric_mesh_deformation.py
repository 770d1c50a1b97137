"""Volumetric mesh deformation example app.

Python port of the reference app setup (reference:
examples/volumetric_mesh_deformation/src/main.cpp and src/CombinedSolver.h):
head.ply bounding-box voxel grid (5,20,5)*(numSubdivides+1) voxels ->
(6,21,6) nodes; bottom layer (j=0) pinned to rest, top layer (j=dims.y)
rotated -90 deg about Z around the top-mid point and translated
(2.5,-2.5,0); w_fit=1, w_reg=0.05; Angle init 0.  The C++ fills buffers
x-major (getIndex1D, CombinedSolver.h:273-276), which matches Opt dims
(W,H,D)=(z,y,x); the (6,21,6,C) numpy array passes through unchanged.
Golden final cost (defaults, (1,1,1)): 189.74081
(examples/test_final_cost.py:66).
"""

import numpy as np

from common import (
    CombinedSolver,
    CombinedSolverParameters,
    data_path,
    make_arg_parser,
)

from opt_tpu.io.mesh import read_ply, sqrt3_subdivide
from opt_tpu import energies


class VolumetricSolver(CombinedSolver):
    def __init__(self, verts, voxel_dims, params, backend, numthreads):
        super().__init__(params, backend, numthreads)
        self.mesh_verts = verts
        self.vdims = voxel_dims  # (x, y, z) voxel counts
        nx, ny, nz = voxel_dims
        # Opt dims (W, H, D) correspond to (z, y, x); see module docstring
        self.dims = [nz + 1, ny + 1, nx + 1]
        self.add_opt_solvers(self.dims, energies.volumetric_mesh_deformation)

    def _reset(self):
        eps = 0.000001
        vmin = self.mesh_verts.min(axis=0) - eps
        vmax = self.mesh_verts.max(axis=0) + eps
        nx, ny, nz = self.vdims
        delta = (vmax - vmin) / np.array([nx, ny, nz], np.float32)

        ii, jj, kk = np.meshgrid(
            np.arange(nx + 1, dtype=np.float32),
            np.arange(ny + 1, dtype=np.float32),
            np.arange(nz + 1, dtype=np.float32),
            indexing="ij",
        )
        grid = vmin + np.stack([ii, jj, kk], axis=-1) * delta  # (x,y,z,3)

        cons = np.full_like(grid, -np.inf)
        cons[:, 0, :, :] = grid[:, 0, :, :]  # bottom pinned to rest
        mid = vmin + np.array([nx / 2.0, float(ny), nz / 2.0]) * delta
        # mLib rotationZ(-90 deg), ccw convention (matrix3x3.h:157-166)
        R = np.array([[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                     np.float32)
        top = grid[:, ny, :, :]
        cons[:, ny, :, :] = (
            (top - mid) @ R.T + mid + np.array([2.5, -2.5, 0.0], np.float32)
        )

        self.m_problemParams["Offset"] = grid.astype(np.float32)
        self.m_problemParams["UrShape"] = grid.astype(np.float32)
        self.m_problemParams["Angle"] = np.zeros_like(grid)
        self.m_problemParams["Constraints"] = cons.astype(np.float32)

    def combined_solve_init(self):
        self.m_problemParams["w_fitSqrt"] = np.sqrt(1.0)
        self.m_problemParams["w_regSqrt"] = np.sqrt(0.05)
        self._reset()

    def pre_single_solve(self):
        self._reset()

    def combined_solve_finalize(self):
        self.ceres_iteration_comparison(
            "Volumetric Mesh Deformation",
            self.m_combinedSolverParameters.optDoublePrecision,
        )

    def result(self):
        return self.m_problemParams["Offset"]


def run(argv=None):
    args = make_arg_parser().parse_args(argv)
    verts, faces = read_ply(data_path("head.ply"))
    n = args.numSubdivides
    if n > 0:
        verts, faces = sqrt3_subdivide(verts, faces, n)
    voxel_dims = (5 * (n + 1), 20 * (n + 1), 5 * (n + 1))
    params = CombinedSolverParameters.from_args(args)
    solver = VolumetricSolver(
        verts, voxel_dims, params, args.backend, args.numthreads
    )
    solver.solve_all()
    return solver


if __name__ == "__main__":
    run()
