"""Always-on example smoke tier (reference: examples/test_example_output.py
tier 2, but at tiny sizes so it runs in the default suite).

Every app runs end-to-end at a tiny configuration WITH its output writers
enabled (cwd = temp dir), so the default `pytest tests/` exercises each
app's full IO path -- dataset readers, CLI parsing, the solve, and the
PNG/PLY/OFF/imagedump writers.  The gated OPT_TPU_RUN_SLOW tier
(test_example_output.py) keeps the realistic many-iteration configs.
"""

import os
import sys

import numpy as np
import pytest

EXAMPLES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)
sys.path.insert(0, EXAMPLES_DIR)

import common  # noqa: E402

pytestmark = pytest.mark.skipif(
    not common.has_data(), reason="reference datasets not available"
)

# app -> (argv, expected output files written by the app)
SMOKE = {
    "image_warping": (["--stride", "8"], ["output_warped.png"]),
    "arap_mesh_deformation": ([], ["out_arap.ply"]),
    "cotangent_mesh_smoothing": ([], ["out.off"]),
    "embedded_mesh_deformation": ([], ["out_embedded.ply"]),
    "volumetric_mesh_deformation": ([], []),
    "poisson_image_editing": (["--stride", "8"], ["output.png"]),
    "intrinsic_image_decomposition": (["--stride", "16"], []),
    "optical_flow": (["--stride", "16"], []),
    "shape_from_shading": ([], ["sfsOutput.imagedump"]),
}


@pytest.mark.parametrize("name", sorted(SMOKE))
def test_example_smoke(name, tmp_path, monkeypatch):
    argv, outputs = SMOKE[name]
    monkeypatch.chdir(tmp_path)
    os.makedirs("results", exist_ok=True)
    mod = __import__(name)
    solver = mod.run(list(argv))  # writers ON (default --noOutput false)
    cost = solver.get_cost("Opt(GN)")
    assert np.isfinite(cost), f"{name}: non-finite cost {cost}"
    for f in outputs:
        assert os.path.exists(f), f"{name}: expected output {f} missing"
        assert os.path.getsize(f) > 0, f"{name}: empty output {f}"


def test_robust_nonrigid_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.makedirs("results", exist_ok=True)
    import robust_nonrigid_alignment as R

    solver = R.run(
        ["--nIterations", "1", "--lIterations", "2"], max_targets=1
    )
    assert np.isfinite(solver.first_solve_cost)
