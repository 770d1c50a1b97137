"""Run every example app once (smoke driver; the analogue of running the
reference's per-example binaries in sequence).

Usage: python run_all.py [--stride-overrides] -- extra flags forwarded.
"""

import sys
import time

EXAMPLES = [
    ("poisson_image_editing", ["--stride", "4"]),
    ("image_warping", []),
    ("optical_flow", ["--stride", "16"]),
    ("intrinsic_image_decomposition", ["--stride", "12"]),
    ("shape_from_shading", []),
    ("volumetric_mesh_deformation", []),
    ("arap_mesh_deformation", []),
    ("cotangent_mesh_smoothing", []),
    ("embedded_mesh_deformation", []),
    ("robust_nonrigid_alignment", []),
]


def main():
    extra = sys.argv[1:]
    results = {}
    for name, argv in EXAMPLES:
        print(f"\n======== {name} ========", flush=True)
        t0 = time.perf_counter()
        mod = __import__(name)
        kwargs = {"max_targets": 1} if name == "robust_nonrigid_alignment" else {}
        solver = mod.run(argv + ["--noOutput", "true"] + extra, **kwargs)
        dt = time.perf_counter() - t0
        gn = solver.get_cost("Opt(GN)")
        lm = solver.get_cost("Opt(LM)")
        results[name] = (gn, lm, dt)
    print("\n================ summary ================")
    for name, (gn, lm, dt) in results.items():
        print(f"{name:34s} GN={gn:<16.6g} LM={lm:<16.6g} {dt:6.1f}s")


if __name__ == "__main__":
    main()
