"""Mesh loading and processing.

Replaces the reference's OpenMesh/mLib usage (reference: examples use
OpenMesh::IO::read_mesh + Subdivider::Uniform::Sqrt3T; graph building in
e.g. examples/arap_mesh_deformation/src/CombinedSolver.h:105-143 and
examples/shared/OptGraph.h:createGraphFromNeighborLists).
"""

from __future__ import annotations

import struct

import numpy as np

_PLY_TYPES = {
    "char": ("b", 1), "int8": ("b", 1),
    "uchar": ("B", 1), "uint8": ("B", 1),
    "short": ("h", 2), "int16": ("h", 2),
    "ushort": ("H", 2), "uint16": ("H", 2),
    "int": ("i", 4), "int32": ("i", 4),
    "uint": ("I", 4), "uint32": ("I", 4),
    "float": ("f", 4), "float32": ("f", 4),
    "double": ("d", 8), "float64": ("d", 8),
}


def read_ply(path):
    """PLY reader (ascii / binary_little_endian), returns (verts, faces)."""
    with open(path, "rb") as f:
        data = f.read()
    end = data.find(b"end_header")
    header = data[:end].decode("ascii", "replace").splitlines()
    body = data[data.find(b"\n", end) + 1 :]

    fmt = None
    elements = []  # (name, count, [(propname, type) or ('list', ctype, itype, name)])
    for line in header:
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append((parts[1], int(parts[2]), []))
        elif parts[0] == "property":
            if parts[1] == "list":
                elements[-1][2].append(("list", parts[2], parts[3], parts[4]))
            else:
                # stored as (name, type)
                elements[-1][2].append((parts[2], parts[1]))

    verts = None
    faces = []
    if fmt == "ascii":
        tokens = body.decode().split()
        pos = 0
        for name, count, props in elements:
            if name == "vertex":
                ncols = len(props)
                arr = np.array(
                    tokens[pos : pos + count * ncols], dtype=np.float32
                ).reshape(count, ncols)
                verts = arr[:, :3]
                pos += count * ncols
            elif name == "face":
                for _ in range(count):
                    n = int(tokens[pos])
                    idx = [int(t) for t in tokens[pos + 1 : pos + 1 + n]]
                    pos += 1 + n
                    for k in range(1, n - 1):
                        faces.append([idx[0], idx[k], idx[k + 1]])
            else:
                pos += count * len(props)
    elif fmt == "binary_little_endian":
        off = 0
        for name, count, props in elements:
            if name == "vertex":
                # fixed-size properties only
                fmts = [_PLY_TYPES[p[1]] for p in props]
                rowsize = sum(s for _, s in fmts)
                raw = np.frombuffer(body, np.uint8, count * rowsize, off)
                raw = raw.reshape(count, rowsize)
                # x,y,z assumed to be the first three float props
                colof = 0
                cols = []
                for (code, size), p in zip(fmts, props):
                    if p[0] in ("x", "y", "z"):
                        cols.append(
                            raw[:, colof : colof + size]
                            .copy()
                            .view(np.dtype("<" + code))
                            .reshape(count)
                        )
                    colof += size
                verts = np.stack(cols, axis=1).astype(np.float32)
                off += count * rowsize
            elif name == "face":
                (lp,) = [p for p in props if p[0] == "list"]
                ccode, csize = _PLY_TYPES[lp[1]]
                icode, isize = _PLY_TYPES[lp[2]]
                for _ in range(count):
                    (n,) = struct.unpack_from("<" + ccode, body, off)
                    off += csize
                    idx = struct.unpack_from("<" + icode * n, body, off)
                    off += isize * n
                    for k in range(1, n - 1):
                        faces.append([idx[0], idx[k], idx[k + 1]])
            else:
                raise ValueError(f"unhandled PLY element {name}")
    else:
        raise ValueError(f"unsupported PLY format {fmt}")
    return verts, np.asarray(faces, np.int32)


def read_off(path):
    with open(path) as f:
        tokens = f.read().split()
    assert tokens[0] == "OFF"
    nv, nf = int(tokens[1]), int(tokens[2])
    pos = 4
    verts = np.array(tokens[pos : pos + 3 * nv], np.float32).reshape(nv, 3)
    pos += 3 * nv
    faces = []
    for _ in range(nf):
        n = int(tokens[pos])
        idx = [int(t) for t in tokens[pos + 1 : pos + 1 + n]]
        pos += 1 + n
        for k in range(1, n - 1):
            faces.append([idx[0], idx[k], idx[k + 1]])
    return verts, np.asarray(faces, np.int32)


def read_obj(path):
    verts = []
    faces = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f":
                idx = [int(p.split("/")[0]) - 1 for p in parts[1:]]
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


def read_tetmesh_ele(ele_path, node_path=None):
    """TetGen .ele (+ .node) files -> (verts, tets)."""
    with open(ele_path) as f:
        tokens = f.read().split()
    ntet = int(tokens[0])
    per = int(tokens[1])
    pos = 3
    tets = np.zeros((ntet, per), np.int32)
    for i in range(ntet):
        row = tokens[pos : pos + 1 + per]
        tets[i] = [int(t) for t in row[1:]]
        pos += 1 + per
    verts = None
    if node_path:
        with open(node_path) as f:
            ntok = f.read().split()
        nv = int(ntok[0])
        dim = int(ntok[1])
        npos = 4
        verts = np.zeros((nv, 3), np.float32)
        for i in range(nv):
            row = ntok[npos : npos + 1 + dim]
            verts[i] = [float(t) for t in row[1 : 1 + 3]]
            npos += 1 + dim + int(ntok[2]) + int(ntok[3])
    return verts, tets


# ---------------------------------------------------------------------------
# connectivity
# ---------------------------------------------------------------------------


def vertex_adjacency(n_verts, faces):
    """Set-valued 1-ring adjacency from a triangle list."""
    adj = [set() for _ in range(n_verts)]
    for a, b, c in faces:
        adj[a].update((b, c))
        adj[b].update((a, c))
        adj[c].update((a, b))
    return adj


def neighbor_lists(n_verts, faces):
    """(neighbour_idx, neighbour_offset) CSR arrays as the reference builds
    them from OpenMesh vv iteration (CombinedSolver.h:105-143).  Neighbor
    order within a ring differs from OpenMesh's halfedge order; energies sum
    over edges so costs are order-invariant.

    Uses the native C graph builder when available
    (opt_tpu/native/native.c neighbor_lists)."""
    try:
        from ..native.build import neighbor_lists as native_nl

        out = native_nl(np.asarray(faces, np.int32), n_verts)
        if out is not None:
            return out
    except Exception:
        pass
    adj = vertex_adjacency(n_verts, faces)
    offs = np.zeros(n_verts + 1, np.int32)
    idx = []
    for v in range(n_verts):
        nbrs = sorted(adj[v])
        idx.extend(nbrs)
        offs[v + 1] = len(idx)
    return np.asarray(idx, np.int32), offs


def graph_from_neighbor_lists(neighbour_idx, neighbour_offset):
    """createGraphFromNeighborLists parity (OptGraph.h:62-90): one directed
    edge (head, neighbor) per adjacency entry."""
    n = len(neighbour_offset) - 1
    counts = np.diff(neighbour_offset)
    v0 = np.repeat(np.arange(n, dtype=np.int32), counts)
    v1 = np.asarray(neighbour_idx, np.int32)
    return {"v0": v0, "v1": v1}


def edge_graph(n_verts, faces):
    ni, no = neighbor_lists(n_verts, faces)
    return graph_from_neighbor_lists(ni, no)


# ---------------------------------------------------------------------------
# sqrt(3) subdivision (math extracted from OpenMesh Sqrt3T semantics,
# reference: external/OpenMesh/.../Sqrt3T.hh:165-295; closed meshes)
# ---------------------------------------------------------------------------


def sqrt3_subdivide(verts, faces, n=1):
    """One or more sqrt(3) subdivision steps (Kobbelt 2000), closed meshes.

    Per step: interior vertices relax to (1-a_k) v + (a_k/k) sum(neighbors)
    with a_k = (4 - 2 cos(2 pi/k))/9; a centroid vertex is appended per
    face; every original edge is flipped.  Resulting edge set: old vertex <->
    centroids of incident faces, centroid <-> centroids of edge-adjacent
    faces.  New faces: for each original edge shared by faces f,g with
    endpoints a,b: triangles (a, m_f, m_g) and (b, m_g, m_f).
    """
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    for _ in range(n):
        nv = len(verts)
        adj = vertex_adjacency(nv, faces)
        new_pos = verts.copy()
        for v in range(nv):
            k = len(adj[v])
            if k == 0:
                continue
            alpha = (4.0 - 2.0 * np.cos(2.0 * np.pi / k)) / 9.0
            s = verts[list(adj[v])].sum(axis=0)
            new_pos[v] = (1.0 - alpha) * verts[v] + (alpha / k) * s
        centroids = verts[faces].mean(axis=1)
        # map each undirected edge to its incident faces
        edge_faces = {}
        for fi, (a, b, c) in enumerate(faces):
            for u, v in ((a, b), (b, c), (c, a)):
                key = (min(u, v), max(u, v))
                edge_faces.setdefault(key, []).append(fi)
        new_faces = []
        for (a, b), fs in edge_faces.items():
            if len(fs) == 2:
                f, g = fs
                mf, mg = nv + f, nv + g
                # flipped edge (m_f, m_g) splits the quad (a, m_f, b, m_g)
                new_faces.append([a, mf, mg])
                new_faces.append([b, mg, mf])
            else:
                # boundary edge: keep the two split triangles unflipped
                (f,) = fs
                mf = nv + f
                new_faces.append([a, b, mf])
        verts = np.concatenate([new_pos, centroids], axis=0)
        faces = np.asarray(new_faces, np.int32)
    return verts, faces


def ring_graph(n_verts, faces):
    """4-slot hyper-edges (head, tail, prev, next) for cotangent energies
    (reference: examples/cotangent_mesh_smoothing/src/CombinedSolver.h:66-121):
    per directed edge (v0 -> curr), prev/next are curr's cyclic neighbors in
    v0's 1-ring.  The ring is ordered so consecutive neighbors share a face
    with v0; for boundary vertices the ring is the open path between the two
    boundary neighbors and the reference's %n wrap pairs its endpoints.
    Cyclic start / direction are irrelevant: the cotangent weight is
    symmetric in (prev, next).
    """
    # neighbor -> neighbor links within each vertex's ring
    ring_links = [dict() for _ in range(n_verts)]
    for a, b, c in faces:
        for v, p, q in ((a, b, c), (b, c, a), (c, a, b)):
            ring_links[v].setdefault(p, set()).add(q)
            ring_links[v].setdefault(q, set()).add(p)
    head, tail, prev, nxt = [], [], [], []
    for v in range(n_verts):
        links = ring_links[v]
        if not links:
            continue
        # find a start: boundary neighbor (degree-1 link) if any, else any
        start = None
        for n, ls in links.items():
            if len(ls) == 1:
                start = n
                break
        if start is None:
            start = next(iter(links))
        ring = [start]
        seen = {start}
        while True:
            cands = [x for x in links[ring[-1]] if x not in seen]
            if not cands:
                break
            ring.append(cands[0])
            seen.add(cands[0])
        k = len(ring)
        for i, curr in enumerate(ring):
            head.append(v)
            tail.append(curr)
            prev.append(ring[(i + k - 1) % k])
            nxt.append(ring[(i + 1) % k])
    return {
        "v0": np.asarray(head, np.int32),
        "v1": np.asarray(tail, np.int32),
        "v2": np.asarray(prev, np.int32),
        "v3": np.asarray(nxt, np.int32),
    }


def write_ply(path, verts, faces=None, colors=None):
    """ASCII PLY writer (reference examples write out.ply via OpenMesh)."""
    verts = np.asarray(verts)
    lines = ["ply", "format ascii 1.0", f"element vertex {len(verts)}",
             "property float x", "property float y", "property float z"]
    if colors is not None:
        lines += ["property uchar red", "property uchar green",
                  "property uchar blue"]
    nf = 0 if faces is None else len(faces)
    lines += [f"element face {nf}",
              "property list uchar int vertex_indices", "end_header"]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
        for i, v in enumerate(verts):
            row = f"{v[0]} {v[1]} {v[2]}"
            if colors is not None:
                c = colors[i]
                row += f" {int(c[0])} {int(c[1])} {int(c[2])}"
            f.write(row + "\n")
        if faces is not None:
            for a, b, c in faces:
                f.write(f"3 {a} {b} {c}\n")


def write_off(path, verts, faces):
    """ASCII OFF writer (cotangent example writes out.off)."""
    verts = np.asarray(verts)
    faces = np.asarray(faces)
    with open(path, "w") as f:
        f.write("OFF\n")
        f.write(f"{len(verts)} {len(faces)} 0\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for a, b, c in faces:
            f.write(f"3 {a} {b} {c}\n")
