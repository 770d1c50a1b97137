"""ARAP mesh deformation example app.

Python port of the reference app setup (reference:
examples/arap_mesh_deformation/src/main.cpp and src/CombinedSolver.h):
small_armadillo.ply with one sqrt(3) subdivision step, .mrk landmark
constraints, Angle init 1e-1, w_fit=4, w_reg=1, graph = directed 1-ring
edges.  Golden final cost (defaults, (1,1,1)): 7183.464843
(examples/test_final_cost.py:57).
"""

import numpy as np

from common import (
    CombinedSolver,
    CombinedSolverParameters,
    data_path,
    make_arg_parser,
)

from opt_tpu.io.mesh import read_ply, sqrt3_subdivide, edge_graph
from opt_tpu import energies


def load_landmarks(path):
    """LandMarkSet format: count; per marker x y z radius vertex_index
    (LandMarkSet.h:14-46)."""
    with open(path) as f:
        tokens = f.read().split()
    n = int(tokens[0])
    out = []
    pos = 1
    for _ in range(n):
        x, y, z, _radius = map(float, tokens[pos : pos + 4])
        vidx = int(tokens[pos + 4])
        pos += 5
        out.append((vidx, np.array([x, y, z], np.float32)))
    return out


class ARAPSolver(CombinedSolver):
    def __init__(self, verts, graph, landmarks, params, backend,
                 numthreads, weight_fit=4.0, weight_reg=1.0):
        super().__init__(params, backend, numthreads)
        self.verts = verts.astype(np.float32)
        self.graph = graph
        self.landmarks = landmarks
        N = len(verts)
        E = len(graph["v0"])
        self.dims = [N, E]
        self.w_fit_sqrt = np.sqrt(weight_fit)
        self.w_reg_sqrt = np.sqrt(weight_reg)
        self.add_opt_solvers(self.dims, energies.arap_mesh_deformation)

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
        self.m_problemParams["Angle"] = np.full((N, 3), 1e-1, np.float32)
        self.set_constraints(1.0)

    def combined_solve_init(self):
        self.m_problemParams["w_fitSqrt"] = self.w_fit_sqrt
        self.m_problemParams["w_regSqrt"] = self.w_reg_sqrt
        self.m_problemParams["G"] = self.graph
        self._reset()

    def pre_single_solve(self):
        self._reset()

    def pre_nonlinear_solve(self, i):
        alpha = (i + 1) / self.m_combinedSolverParameters.numIter
        self.set_constraints(alpha)

    def combined_solve_finalize(self):
        self.ceres_iteration_comparison(
            "ARAP Mesh Deformation",
            self.m_combinedSolverParameters.optDoublePrecision,
        )

    def result(self):
        return self.m_problemParams["Offset"]


def run(argv=None):
    args = make_arg_parser().parse_args(argv)

    verts, faces = read_ply(data_path("small_armadillo.ply"))
    landmarks = load_landmarks(data_path("small_armadillo.mrk"))

    num_subdivides = max(args.numSubdivides, 1)  # main.cpp:67
    verts, faces = sqrt3_subdivide(verts, faces, num_subdivides)
    graph = edge_graph(len(verts), faces)
    print(f"Vertices: {len(verts)} Edges: {len(graph['v0'])}")

    params = CombinedSolverParameters.from_args(args)
    solver = ARAPSolver(
        verts, graph, landmarks, params, args.backend, args.numthreads
    )
    solver.solve_all()
    if not args.noOutput:
        from opt_tpu.io.mesh import write_ply

        write_ply("out_arap.ply", solver.result(), faces)
    return solver


if __name__ == "__main__":
    run()
