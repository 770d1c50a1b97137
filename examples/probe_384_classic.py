"""Probe the 384^3 classic-kernel compile (full error capture).

The round-4 sweep recorded FAILED with a truncated remote-compile
error (HTTP 500, tpu_compile_helper exit 1).  This probe reruns the
COMPILE alone (lowering from ShapeDtypeStructs -- no giant relay
upload) and prints the complete exception plus (on success)
memory_analysis numbers.

Run alone -- owns the TPU.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

side = int(sys.argv[1]) if len(sys.argv) > 1 else 384
variant = sys.argv[2] if len(sys.argv) > 2 else "classic"

from examples.sweep_r4 import make_plan  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from opt_tpu.ops.stream3d import StreamSolver3D  # noqa: E402
from opt_tpu.solver.core import SolverConfig, make_solver  # noqa: E402
from opt_tpu.ops.stream_outer import (  # noqa: E402
    ChunkedOuterFuncs, chunked_outer_enabled)

plan = make_plan(side)
eng = StreamSolver3D(plan, variant=variant)
print(f"engine: variant={eng.variant} tiles=({eng.tile_d},{eng.tile_h})"
      f" halos=({eng.h_d},{eng.h_h}) n_tiles={eng.n_tiles}", flush=True)

chunked = chunked_outer_enabled(plan)
print("chunked outer:", chunked, flush=True)
base = plan.config
cfg = SolverConfig(
    uses_lambda=base.uses_lambda,
    guarded_invert_type=base.guarded_invert_type,
    jacobi_scaling=base.jacobi_scaling,
    pcg_variant="classic",
    pcg_backend=eng.as_pcg_backend(False),
    # match StreamSolver3D.solve exactly: without pcg_prepare the
    # backend re-stacks the padded const planes inside the outer while
    # body, a DIFFERENT (bigger) program than the production solve
    pcg_prepare=eng.as_pcg_prepare(),
)
funcs = ChunkedOuterFuncs(plan) if chunked else plan.funcs
fns = make_solver(funcs, cfg)
full = jax.jit(fns[4], donate_argnums=(0, 1) if chunked else ())

dtype = plan.state.dtype


def aval(im):
    return jax.ShapeDtypeStruct(im.ispace.shape + (im.channels,), dtype)


x = {n: aval(plan.spec.images[n]) for n in eng.unknown_names}
data = {
    "images": {n: aval(plan.spec.images[n]) for n in eng.const_names},
    "params": {n: jax.ShapeDtypeStruct((), dtype)
               for n in plan.spec.params},
    "graph_indices": {},
}
sp = {k: jax.ShapeDtypeStruct((), v.dtype)
      for k, v in plan._sp_device().items()}
sp["nIterations"] = jax.ShapeDtypeStruct((), jnp.int32)

print("lowering...", flush=True)
try:
    lowered = full.lower(x, data, sp)
    print("lowered OK; compiling...", flush=True)
    compiled = lowered.compile()
    print("compiled OK", flush=True)
    print("memory_analysis:", compiled.memory_analysis(), flush=True)
except Exception:
    traceback.print_exc()
    sys.exit(1)
