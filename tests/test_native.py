"""Native C host-runtime parity tests (opt_tpu/native/native.c)."""

import numpy as np
import pytest

from opt_tpu.native import build as nb


def _native_or_skip():
    if nb.get_lib() is None:
        pytest.skip("native toolchain unavailable")


def test_png_unfilter_parity():
    _native_or_skip()
    import zlib
    from opt_tpu.io import png as P

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(23, 17, 3), dtype=np.uint8)
    P.write_png("/tmp/nat.png", img)
    back = P.read_png("/tmp/nat.png")
    np.testing.assert_array_equal(img, back)
    # real dataset file exercises Sub/Up/Average/Paeth
    import os
    path = "/root/reference/examples/data/cat512.png"
    if os.path.exists(path):
        os.environ["OPT_TPU_NO_NATIVE"] = "1"
        try:
            nb._lib = None
            nb._tried = False
            py = P.read_png(path)
        finally:
            del os.environ["OPT_TPU_NO_NATIVE"]
            nb._lib = None
            nb._tried = False
        nat = P.read_png(path)
        np.testing.assert_array_equal(py, nat)


def test_neighbor_lists_parity():
    _native_or_skip()
    from opt_tpu.io import mesh as M

    rng = np.random.RandomState(1)
    n = 30
    faces = rng.randint(0, n, size=(60, 3)).astype(np.int32)
    faces = faces[
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    ]
    nat = nb.neighbor_lists(faces, n)
    adj = M.vertex_adjacency(n, faces)
    idx_ref, off_ref = [], [0]
    for v in range(n):
        ns = sorted(adj[v])
        idx_ref.extend(ns)
        off_ref.append(len(idx_ref))
    np.testing.assert_array_equal(nat[0], idx_ref)
    np.testing.assert_array_equal(nat[1], off_ref)


def test_csr_toolkit_parity():
    _native_or_skip()
    from scipy.sparse import random as sprandom

    rng = np.random.RandomState(2)
    A = sprandom(40, 25, density=0.15, random_state=rng, format="csr",
                 dtype=np.float32)
    rp = A.indptr.astype(np.int32)
    ci = A.indices.astype(np.int32)
    v = A.data.astype(np.float32)

    t = nb.csr_transpose(rp, ci, v, 40, 25)
    AT = A.T.tocsr()
    AT.sort_indices()
    np.testing.assert_array_equal(t[0], AT.indptr)
    np.testing.assert_array_equal(t[1], AT.indices)
    np.testing.assert_allclose(t[2], AT.data, rtol=1e-6)

    x = rng.randn(25).astype(np.float32)
    y = nb.csr_spmv(rp, ci, v, x)
    np.testing.assert_allclose(y, A @ x, rtol=1e-5)

    ata = nb.csr_ata(rp, ci, v, 40, 25)
    ref = (A.T @ A).tocsr()
    ref.sort_indices()
    ref.eliminate_zeros()
    # native keeps explicit structural entries; compare densely
    from scipy.sparse import csr_matrix

    got = csr_matrix((ata[2], ata[1], ata[0]), shape=(25, 25))
    np.testing.assert_allclose(
        got.toarray(), ref.toarray(), rtol=1e-4, atol=1e-6
    )
