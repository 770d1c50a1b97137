"""Mesh processing unit tests: sqrt(3) subdivision, ring graphs."""

import numpy as np
import pytest

from opt_tpu.io.mesh import (
    sqrt3_subdivide,
    ring_graph,
    edge_graph,
    vertex_adjacency,
)


def tetra():
    verts = np.array(
        [[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], np.float32
    )
    faces = np.array(
        [[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]], np.int32
    )
    return verts, faces


def test_sqrt3_subdivide_counts_and_positions():
    verts, faces = tetra()
    v2, f2 = sqrt3_subdivide(verts, faces, 1)
    # one centroid per face appended; faces triple (closed mesh)
    assert len(v2) == len(verts) + len(faces)
    assert len(f2) == 3 * len(faces)
    # centroids are means of ORIGINAL positions
    np.testing.assert_allclose(
        v2[len(verts):], verts[faces].mean(axis=1), rtol=1e-6
    )
    # old vertices relax: v' = (1-a)v + (a/k) sum(neighbors), k=3 here
    k = 3
    alpha = (4.0 - 2.0 * np.cos(2.0 * np.pi / k)) / 9.0
    adj = vertex_adjacency(len(verts), faces)
    for v in range(len(verts)):
        s = verts[sorted(adj[v])].sum(axis=0)
        want = (1 - alpha) * verts[v] + (alpha / k) * s
        np.testing.assert_allclose(v2[v], want, rtol=1e-5)
    # after flipping, old vertices connect only to centroids
    adj2 = vertex_adjacency(len(v2), f2)
    for v in range(len(verts)):
        assert all(n >= len(verts) for n in adj2[v])


def test_ring_graph_prev_next_are_face_neighbors():
    verts, faces = tetra()
    g = ring_graph(len(verts), faces)
    # per directed edge (v0, v1): {v2, v3} are exactly the two vertices
    # forming faces with (v0, v1) on a closed mesh
    face_sets = {frozenset(f) for f in map(tuple, faces)}
    for v0, v1, v2, v3 in zip(g["v0"], g["v1"], g["v2"], g["v3"]):
        assert frozenset((v0, v1, v2)) in face_sets
        assert frozenset((v0, v1, v3)) in face_sets
    # one hyper-edge per directed pair
    assert len(g["v0"]) == 2 * 6  # tetrahedron has 6 undirected edges


def test_edge_graph_is_symmetric():
    verts, faces = tetra()
    g = edge_graph(len(verts), faces)
    pairs = set(zip(g["v0"].tolist(), g["v1"].tolist()))
    assert all((b, a) in pairs for a, b in pairs)
    assert len(pairs) == 12
