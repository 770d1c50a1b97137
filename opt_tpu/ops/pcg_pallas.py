"""Pallas TPU kernels for the PCG hot loop.

The PCG inner iteration is HBM-bandwidth bound: besides the J^T J apply,
each iteration streams the work vectors several times (the reference's
PCGStep2/PCGStep3 kernels, solverGPUGaussNewton.t:665-852).  The fused
update kernel below performs the whole Step2 update

    delta' = delta + alpha p
    r'     = r - alpha Ap
    z'     = pre * r'
    bn_k   = sum_block z' . r'     (partial beta numerators)
    q_k    = sum_block delta' . (r' + b)   (LM only)

in a single pass over the vectors (one read of each input, one write of
each output), instead of the several fused-elementwise passes XLA
schedules.  Step3's p' = z' + beta p stays in XLA (beta depends on the
completed bn reduction).

Operates on the flattened unknown vector, so it is domain-agnostic (grids
and graphs).  Sizes are padded to the (8, 128) float32 tile.

MEASURED RESULT (TPU v5e, image_warping 512x512, 8x400 iterations):
enabling this kernel is an 88x pessimization (11.3 s vs 129 ms), at
identical final cost.  Two causes: (1) the per-iteration
flatten/concatenate/pad of the unknown pytree materializes copies that
the plain path never makes; (2) the pallas_call is a fusion barrier, so
XLA loses its loop-wide fusion of the vector ops into the J^T J apply.
XLA's own schedule is already within ~2x of the HBM roofline for this
loop.  The kernel is kept (tested, off by default via
OptState(use_pallas=True)) as the measured record of this design point;
the profitable Pallas direction is the opposite end -- fusing the
*stencil J^T J apply itself* with in-kernel coefficient recompute (see
docs/PALLAS_NOTES.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8
TILE_ROWS = 256  # (256, 128) f32 blocks = 128 KiB per operand


def _fused_update_kernel(alpha_ref, p_ref, ap_ref, delta_ref, r_ref,
                         pre_ref, b_ref, delta_out, r_out, z_out, bn_out,
                         q_out, *, uses_lambda):
    alpha = alpha_ref[0, 0]
    p = p_ref[...]
    ap = ap_ref[...]
    delta = delta_ref[...] + alpha * p
    r = r_ref[...] - alpha * ap
    z = pre_ref[...] * r
    delta_out[...] = delta
    r_out[...] = r
    z_out[...] = z

    # scalar reductions accumulate across the (sequential) TPU grid
    @pl.when(pl.program_id(0) == 0)
    def _init():
        bn_out[0, 0] = jnp.zeros((), z.dtype)
        q_out[0, 0] = jnp.zeros((), z.dtype)

    bn_out[0, 0] += jnp.sum(z * r)
    if uses_lambda:
        q_out[0, 0] += 0.5 * jnp.sum(delta * (r + b_ref[...]))


@functools.partial(jax.jit, static_argnames=("uses_lambda", "interpret"))
def fused_pcg_update(alpha, p, ap, delta, r, pre, b, uses_lambda=False,
                     interpret=False):
    """One-pass PCG Step2 on flat float vectors.

    Returns (delta', r', z', bn, q).  Inputs must be 1-D and equal length;
    callers pad to a multiple of 8*128 with zeros (zero rows contribute
    zero to both reductions since pre/r/b padding is zero).
    """
    n = p.shape[0]
    block = TILE_ROWS * LANE
    num = (n + block - 1) // block
    npad = num * block

    def prep(v):
        v = jnp.pad(v, (0, npad - n))
        return v.reshape(num * TILE_ROWS, LANE)

    alpha2d = jnp.asarray(alpha, p.dtype).reshape(1, 1)
    args = [prep(v) for v in (p, ap, delta, r, pre, b)]

    vspec = pl.BlockSpec(
        (TILE_ROWS, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    sspec = pl.BlockSpec(
        (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
    )
    out = pl.pallas_call(
        functools.partial(_fused_update_kernel, uses_lambda=uses_lambda),
        grid=(num,),
        in_specs=[sspec] + [vspec] * 6,
        out_specs=(vspec, vspec, vspec, sspec, sspec),
        out_shape=(
            jax.ShapeDtypeStruct((num * TILE_ROWS, LANE), p.dtype),
            jax.ShapeDtypeStruct((num * TILE_ROWS, LANE), p.dtype),
            jax.ShapeDtypeStruct((num * TILE_ROWS, LANE), p.dtype),
            jax.ShapeDtypeStruct((1, 1), p.dtype),
            jax.ShapeDtypeStruct((1, 1), p.dtype),
        ),
        interpret=interpret,
    )(alpha2d, *args)
    delta2, r2, z2, bn_parts, q_parts = out

    def unprep(v):
        return v.reshape(-1)[:n]

    return (
        unprep(delta2),
        unprep(r2),
        unprep(z2),
        jnp.sum(bn_parts),
        jnp.sum(q_parts),
    )
