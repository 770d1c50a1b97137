"""Embedded mesh deformation example app.

Python port of the reference app setup (reference:
examples/embedded_mesh_deformation/src/main.cpp and src/CombinedSolver.h):
raptor_simplify2k.off + .mrk landmarks, w_fit=3, w_reg=12, w_rot=5,
RotMatrix unknowns initialised to the mLib rotation
rotY(1e-3 deg) * rotX(1e-3 deg) * rotZ(1e-3 deg) (CombinedSolver.h:139-149,
mLib matrix3x3.h:172-175).  Golden final cost (defaults, (1,1,1)):
0.367129057645 (examples/test_final_cost.py:59).
"""

import numpy as np

from common import (
    CombinedSolver,
    CombinedSolverParameters,
    data_path,
    make_arg_parser,
    report_final_costs,
)

from opt_tpu.io.mesh import read_off, sqrt3_subdivide, edge_graph
from opt_tpu import energies
from arap_mesh_deformation import load_landmarks


def mlib_rotation(yaw_deg, pitch_deg, roll_deg):
    """rotY(yaw)*rotX(pitch)*rotZ(roll), degrees, row-major flat9."""

    def rx(a):
        a = np.deg2rad(a)
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def ry(a):
        a = np.deg2rad(a)
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rz(a):
        a = np.deg2rad(a)
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    return (ry(yaw_deg) @ rx(pitch_deg) @ rz(roll_deg)).reshape(9)


class EmbeddedSolver(CombinedSolver):
    def __init__(self, verts, graph, landmarks, params, backend, numthreads):
        super().__init__(params, backend, numthreads)
        self.verts = verts.astype(np.float32)
        self.graph = graph
        self.landmarks = landmarks
        self.dims = [len(verts), len(graph["v0"])]
        self.add_opt_solvers(self.dims, energies.embedded_mesh_deformation)

    def set_constraints(self, alpha):
        N = len(self.verts)
        cons = np.full((N, 3), -np.inf, np.float32)
        cur = self.m_problemParams.get("Offset", self.verts)
        for vidx, target in self.landmarks:
            pt = np.asarray(cur[vidx], np.float32)
            cons[vidx] = (1.0 - alpha) * pt + alpha * target
        self.m_problemParams["Constraints"] = cons

    def _reset(self):
        N = len(self.verts)
        self.m_problemParams["Offset"] = self.verts.copy()
        self.m_problemParams["UrShape"] = self.verts.copy()
        rot = mlib_rotation(1e-3, 1e-3, 1e-3).astype(np.float32)
        self.m_problemParams["RotMatrix"] = np.tile(rot, (N, 1))
        self.set_constraints(1.0)

    def combined_solve_init(self):
        self.m_problemParams["w_fitSqrt"] = np.sqrt(3.0)
        self.m_problemParams["w_regSqrt"] = np.sqrt(12.0)
        self.m_problemParams["w_rotSqrt"] = np.sqrt(5.0)
        self.m_problemParams["G"] = self.graph
        self._reset()

    def pre_single_solve(self):
        self._reset()

    def pre_nonlinear_solve(self, i):
        alpha = (i + 1) / self.m_combinedSolverParameters.numIter
        self.set_constraints(alpha)

    def combined_solve_finalize(self):
        report_final_costs(
            "Embedded Mesh Deformation",
            self.m_combinedSolverParameters,
            self.get_cost("Opt(GN)"),
            self.get_cost("Opt(LM)"),
        )

    def result(self):
        return self.m_problemParams["Offset"]


def run(argv=None):
    args = make_arg_parser().parse_args(argv)
    verts, faces = read_off(data_path("raptor_simplify2k.off"))
    landmarks = load_landmarks(data_path("raptor_simplify2k.mrk"))
    if args.numSubdivides > 0:
        verts, faces = sqrt3_subdivide(verts, faces, args.numSubdivides)
    graph = edge_graph(len(verts), faces)
    print(f"Vertices: {len(verts)} Edges: {len(graph['v0'])}")
    params = CombinedSolverParameters.from_args(args)
    solver = EmbeddedSolver(
        verts, graph, landmarks, params, args.backend, args.numthreads
    )
    solver.solve_all()
    if not args.noOutput:
        from opt_tpu.io.mesh import write_ply

        write_ply("out_embedded.ply", solver.result(), faces)
    return solver


if __name__ == "__main__":
    run()
