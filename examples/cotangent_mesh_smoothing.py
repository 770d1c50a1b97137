"""Cotangent mesh smoothing example app.

Python port of the reference app setup (reference:
examples/cotangent_mesh_smoothing/src/main.cpp and src/CombinedSolver.h):
head.ply (no subdivision by default), w_fit=1, w_reg=0.5, 4-slot ring
hyper-edges (head, tail, prev, next).  Golden final cost (defaults,
(1,1,1)): 2091.86303 (examples/test_final_cost.py:58).
"""

import numpy as np

from common import (
    CombinedSolver,
    CombinedSolverParameters,
    data_path,
    make_arg_parser,
)

from opt_tpu.io.mesh import read_ply, ring_graph, sqrt3_subdivide
from opt_tpu import energies


class CotangentSolver(CombinedSolver):
    def __init__(self, verts, graph, params, backend, numthreads,
                 weight_fit=1.0, weight_reg=0.5):
        super().__init__(params, backend, numthreads)
        self.verts = verts.astype(np.float32)
        self.graph = graph
        self.dims = [len(verts), len(graph["v0"])]
        self.w_fit_sqrt = np.sqrt(weight_fit)
        self.w_reg_sqrt = np.sqrt(weight_reg)
        self.add_opt_solvers(self.dims, energies.cotangent_mesh_smoothing)

    def combined_solve_init(self):
        self.m_problemParams = {
            "w_fit": self.w_fit_sqrt,
            "w_reg": self.w_reg_sqrt,
            "X": self.verts.copy(),
            "A": self.verts.copy(),
            "G": self.graph,
        }

    def pre_single_solve(self):
        self.m_problemParams["X"] = self.verts.copy()

    def combined_solve_finalize(self):
        from common import report_final_costs

        report_final_costs(
            "Cotangent Mesh Smoothing",
            self.m_combinedSolverParameters,
            self.get_cost("Opt(GN)"),
            self.get_cost("Opt(LM)"),
        )

    def result(self):
        return self.m_problemParams["X"]


def run(argv=None):
    args = make_arg_parser().parse_args(argv)
    verts, faces = read_ply(data_path("head.ply"))
    if args.numSubdivides > 0:
        verts, faces = sqrt3_subdivide(verts, faces, args.numSubdivides)
    graph = ring_graph(len(verts), faces)
    print(f"Vertices: {len(verts)} Hyperedges: {len(graph['v0'])}")
    params = CombinedSolverParameters.from_args(args)
    solver = CotangentSolver(
        verts, graph, params, args.backend, args.numthreads
    )
    solver.solve_all()
    if not args.noOutput:
        from opt_tpu.io.mesh import write_off

        write_off("out.off", solver.result(), faces)
    return solver


if __name__ == "__main__":
    run()
