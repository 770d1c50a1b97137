"""Pallas one-hot gather/scatter matmul kernels for the banded engine.

The XLA path of ops/graph_banded.py materializes each block's one-hot
matrix in HBM: profiled on the flagship arap workload, every banded
gather/scatter was bound by re-READING ~48 MB of materialized one-hot
bf16 per op (~59 us at v5e HBM bandwidth), 5-10x the useful work.  These
kernels generate the one-hot tiles **inside VMEM** (an iota compare is
nearly free on the VPU) and feed the MXU directly, so HBM traffic drops
to the real operands: loc rows, value windows, and outputs (~3 MB).

Each grid step processes GROUP=8 vertex blocks with a statically
unrolled inner loop: one step per block drowned in per-step pipeline
overhead (~82 steps of ~10 us work measured slower than the XLA path).

Shapes per grid step (all VMEM):
  loc   (G, eb, 1)  int32   edge row -> window row, -1 = pad (zero row)
  win   (G, wv, cp) bf16    split3 channel planes of the 3-block windows
  out   (G, eb, cp) f32     gathered rows (MXU f32 accumulator)
and the transposed contraction for scatter.  eb is a multiple of 8 and
wv of 128 by the banding plan's construction, so blocks are
sublane/lane aligned (see docs/PALLAS_NOTES.md).

Reference role: the hand-written gather/scatter-free CUDA kernels of
examples/arap_mesh_deformation/src/WarpingSolver.cu (reference), which
keep the per-edge working set in registers/smem instead of round-tripping
through global memory.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

GROUP = 8


def _gather_kernel(loc_ref, win_ref, out_ref):
    g, eb = loc_ref.shape[:2]
    wv = win_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (eb, wv), 1)
    for b in range(g):
        oh = (loc_ref[b] == iota).astype(jnp.bfloat16)
        out_ref[b] = jax.lax.dot_general(
            oh, win_ref[b], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _scatter_kernel(loc_ref, edges_ref, out_ref):
    g, eb = loc_ref.shape[:2]
    wv = out_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (eb, wv), 1)
    for b in range(g):
        oh = (loc_ref[b] == iota).astype(jnp.bfloat16)
        out_ref[b] = jax.lax.dot_general(
            oh, edges_ref[b], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _pad_blocks(arr, n_pad):
    if n_pad == 0:
        return arr
    pad = [(0, n_pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad, constant_values=-1 if arr.dtype == jnp.int32
                   else 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def onehot_gather_blocks(loc, windows, interpret=False):
    """loc (n_vblk, eb) int32, windows (n_vblk, wv, cp) bf16
    -> (n_vblk, eb, cp) f32 with out[b, e] = windows[b, loc[b, e]]
    (zero where loc < 0)."""
    n_vblk, eb = loc.shape
    wv, cp = windows.shape[1:]
    n_grp = -(-n_vblk // GROUP)
    n_pad = n_grp * GROUP - n_vblk
    out = pl.pallas_call(
        _gather_kernel,
        grid=(n_grp,),
        in_specs=[
            pl.BlockSpec((GROUP, eb, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((GROUP, wv, cp), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((GROUP, eb, cp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (n_grp * GROUP, eb, cp), jnp.float32
        ),
        interpret=interpret,
    )(_pad_blocks(loc[..., None], n_pad), _pad_blocks(windows, n_pad))
    return out[:n_vblk]


@functools.partial(jax.jit, static_argnames=("wv", "interpret"))
def onehot_scatter_windows(loc, edges, wv, interpret=False):
    """loc (n_vblk, eb) int32, edges (n_vblk, eb, cp) bf16, window length
    wv -> (n_vblk, wv, cp) f32 overlap-window contributions (pad rows
    loc=-1 dropped; duplicates accumulate in the MXU f32 accumulator)."""
    n_vblk, eb = loc.shape
    cp = edges.shape[-1]
    n_grp = -(-n_vblk // GROUP)
    n_pad = n_grp * GROUP - n_vblk
    out = pl.pallas_call(
        _scatter_kernel,
        grid=(n_grp,),
        in_specs=[
            pl.BlockSpec((GROUP, eb, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((GROUP, eb, cp), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((GROUP, wv, cp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (n_grp * GROUP, wv, cp), jnp.float32
        ),
        interpret=interpret,
    )(_pad_blocks(loc[..., None], n_pad), _pad_blocks(edges, n_pad))
    return out[:n_vblk]
