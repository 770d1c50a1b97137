"""Robust non-rigid alignment example app.

Python port of the reference app setup (reference:
examples/robust_nonrigid_alignment/src/main.cpp and src/CombinedSolver.h):
squat_source.obj + tet-mesh connectivity, ICP-like outer loop over the 8
squat_target meshes; per-solve KNN correspondences (k=20, position
threshold 5x average edge length, normal cosine threshold 0.7), spurious
noise on 5% of constraints, robust weights reset to 1 on updated
constraints, LM solver with function_tolerance=1e-7, w_fit=10 and w_reg
annealed 64 -> 4 by 0.9x per nonlinear solve.

The reference marks this example broken/flaky and its golden (66.784683,
first solve) is not enforced (examples/test_final_cost.py:41-43); the
spurious-noise RNG is libstdc++'s normal_distribution, which is not
bit-reproducible here.
"""

import os

import numpy as np
from scipy.spatial import cKDTree

from common import (
    CombinedSolver,
    CombinedSolverParameters,
    data_path,
    make_arg_parser,
    report_final_costs,
)

from opt_tpu.io.mesh import (
    read_obj,
    read_tetmesh_ele,
    graph_from_neighbor_lists,
)
from opt_tpu import energies


def vertex_normals(verts, faces):
    """OpenMesh-style: normalized sum of (normalized) incident face
    normals."""
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)
    norms = np.linalg.norm(fn, axis=1, keepdims=True)
    fn = fn / np.maximum(norms, 1e-30)
    vn = np.zeros_like(verts)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    n = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.maximum(n, 1e-30)


def tet_neighbor_graph(n_verts, tets):
    """Edges from tetrahedra: all vertex pairs within each tet
    (CombinedSolver.h:383-401)."""
    nbrs = [set() for _ in range(n_verts)]
    for t in tets:
        for i in range(4):
            for j in range(4):
                if i != j:
                    nbrs[t[i]].add(t[j])
    idx, offs = [], np.zeros(n_verts + 1, np.int32)
    for v in range(n_verts):
        ns = sorted(nbrs[v])
        idx.extend(ns)
        offs[v + 1] = len(idx)
    return graph_from_neighbor_lists(np.asarray(idx, np.int32), offs)


class RobustNonrigidSolver(CombinedSolver):
    MAX_K = 20

    def __init__(self, verts, faces, graph, targets, params, backend,
                 numthreads):
        super().__init__(params, backend, numthreads)
        self.verts = verts.astype(np.float32)
        self.faces = faces
        self.graph = graph
        self.targets = targets  # list of (verts, faces)
        N = len(verts)
        E = len(graph["v0"])
        self.dims = [N, E]

        # average edge length over the source mesh's unique edges
        edges = set()
        for a, b, c in faces:
            for u, w in ((a, b), (b, c), (c, a)):
                edges.add((min(u, w), max(u, w)))
        e = np.array(list(edges))
        self.avg_edge_len = float(
            np.linalg.norm(verts[e[:, 0]] - verts[e[:, 1]], axis=1).mean()
        )

        # spurious constraints (CombinedSolver.h:109-121); RNG stream is
        # implementation-defined in the reference -- seeded equivalently
        rng = np.random.Generator(np.random.MT19937(230948))
        count = int(N * 0.05)
        self.spurious_idx = rng.integers(0, len(targets[0][0]), count)
        self.noisy_offsets = rng.normal(
            0.0, self.avg_edge_len * 30.0, size=(count, 3)
        ).astype(np.float32)

        self.add_opt_solvers(self.dims, energies.robust_nonrigid_alignment)
        self.first_solve_cost = None

    def combined_solve_init(self):
        self.m_weightFit = 10.0
        self.m_weightRegMax = 64.0
        self.m_weightRegMin = 4.0
        self.m_weightRegFactor = 0.9
        self.m_weightReg = self.m_weightRegMax
        self.m_problemParams["w_fitSqrt"] = np.sqrt(self.m_weightFit)
        self.m_problemParams["w_regSqrt"] = np.sqrt(self.m_weightReg)
        self.m_solverParams["function_tolerance"] = 1e-7
        N = len(self.verts)
        self.m_problemParams["Offset"] = self.verts.copy()
        self.m_problemParams["UrShape"] = self.verts.copy()
        self.m_problemParams["Angle"] = np.zeros((N, 3), np.float32)
        self.m_problemParams["RobustWeights"] = np.zeros((N, 1), np.float32)
        self.m_problemParams["Constraints"] = np.full(
            (N, 3), -np.inf, np.float32
        )
        self.m_problemParams["ConstraintNormals"] = np.zeros(
            (N, 3), np.float32
        )
        self.m_problemParams["G"] = self.graph

    def pre_single_solve(self):
        tv, _tf = self.targets[self.target_index]
        self.kdtree = cKDTree(tv)
        N = len(self.verts)
        self.previous_constraints = np.full((N, 3), [0, 0, -9.09e13],
                                            np.float32)
        self.m_weightReg = self.m_weightRegMax

    def pre_nonlinear_solve(self, i):
        new_count = self.set_constraints(
            self.target_index, self.avg_edge_len * 5.0
        )
        print(f" -------- New constraints: {new_count}")
        if new_count <= 5:
            if self.m_weightReg != self.m_weightRegMin:
                self.m_weightReg = self.m_weightRegMin
            self.m_endSolveEarly = True
        self.m_problemParams["w_regSqrt"] = np.sqrt(self.m_weightReg)

    def post_nonlinear_solve(self, i):
        self.m_weightReg = max(
            self.m_weightRegMin, self.m_weightReg * self.m_weightRegFactor
        )

    def set_constraints(self, target_index, pos_threshold,
                        cos_normal_threshold=0.7):
        tv, tf = self.targets[target_index]
        tnormals = vertex_normals(tv, tf)
        cur = np.asarray(self.m_problemParams["Offset"], np.float32)
        snormals = vertex_normals(cur, self.faces)
        N = len(cur)

        dists, nbrs = self.kdtree.query(cur, k=self.MAX_K)
        cons = np.full((N, 3), -np.inf, np.float32)
        cnorm = np.zeros((N, 3), np.float32)
        for i in range(N):
            for d, j in zip(dists[i], nbrs[i]):
                if d > pos_threshold:
                    break
                if np.dot(tnormals[j], snormals[i]) > cos_normal_threshold:
                    cons[i] = tv[j]
                    cnorm[i] = tnormals[j]
                    break

        cons[self.spurious_idx] += self.noisy_offsets

        weights = np.asarray(
            self.m_problemParams["RobustWeights"], np.float32
        ).copy()
        changed = ~np.all(
            np.isclose(self.previous_constraints, cons, equal_nan=False)
            | (np.isinf(self.previous_constraints) & np.isinf(cons)),
            axis=1,
        )
        weights[changed, 0] = 1.0
        self.previous_constraints = cons.copy()

        self.m_problemParams["Constraints"] = cons
        self.m_problemParams["ConstraintNormals"] = cnorm
        self.m_problemParams["RobustWeights"] = weights
        return int(changed.sum())

    def solve_all(self):
        """Per-target ICP outer loop (CombinedSolver.h:140-155)."""
        self.combined_solve_init()
        for s in self.m_solverInfo:
            self.m_problemParams["Offset"] = self.verts.copy()
            for ti in range(len(self.targets)):
                self.target_index = ti
                self._single_solve(s)
                if self.first_solve_cost is None:
                    self.first_solve_cost = s.get("final_cost")
        self.combined_solve_finalize()

    def combined_solve_finalize(self):
        report_final_costs(
            "Robust Mesh Deformation",
            self.m_combinedSolverParameters,
            self.get_cost("Opt(GN)"),
            self.get_cost("Opt(LM)"),
        )


def run(argv=None, max_targets=None):
    args = make_arg_parser().parse_args(argv)
    verts, faces = read_obj(data_path("squat_source.obj"))
    _, tets = read_tetmesh_ele(data_path("squat_tetmesh.ele"))
    graph = tet_neighbor_graph(len(verts), tets)
    tdir = os.path.join(data_path("squat_target"))
    targets = []
    for f in sorted(os.listdir(tdir)):
        tv, tf = read_obj(os.path.join(tdir, f))
        targets.append((tv, tf))
        if max_targets and len(targets) >= max_targets:
            break
    print(f"Vertices: {len(verts)} Edges: {len(graph['v0'])} "
          f"Targets: {len(targets)}")
    params = CombinedSolverParameters.from_args(args)
    # args.config parity: this example runs the LM solver only
    # (robust_nonrigid_alignment/args.config: useOpt=false, useOptLM=true)
    if params.useOpt and not params.useOptLM:
        params.useOpt = False
        params.useOptLM = True
    solver = RobustNonrigidSolver(
        verts, faces, graph, targets, params, args.backend, args.numthreads
    )
    solver.solve_all()
    return solver


if __name__ == "__main__":
    run()
