"""Row-tiled stencil apply with manual halo DMA.

Prototype of the round-2 tiled solver's core mechanism
(now in docs/ROUND3_TODO.md): images stay in HBM (`pl.ANY`); each grid step
DMAs a (TILE + 2*HALO)-row window into VMEM scratch, computes a weighted
stencil sum with Mosaic-native shifts, and writes its tile.  This is what
lets larger-than-VMEM problems run Pallas iterations with VMEM-resident
working sets.

Alignment rules (measured, see docs/PALLAS_NOTES.md): the halo is padded
to a multiple of 8 rows so in-kernel row slices stay sublane-aligned, and
W must be a multiple of 128 (callers pad; shift semantics stay correct via
iota masks against the real width).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8


def _roundup(v, m):
    return ((v + m - 1) // m) * m


def _shift_block(block, dx, dy, real_w, row0, real_h):
    """out[r, c] = block[r + dy, c + dx] with zero fill against the REAL
    domain; block rows are global rows [row0 - halo, ...)."""
    out = block
    H, W = block.shape
    if dy != 0:
        out = pltpu.roll(out, (-dy) % H, 0)
    if dx != 0:
        out = pltpu.roll(out, (-dx) % W, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    valid = (
        (rows + dy >= 0) & (rows + dy < real_h)
        & (cols + dx >= 0) & (cols + dx < real_w)
    )
    return jnp.where(valid, out, 0.0)


def _kernel(img_hbm, out_ref, scratch, sem, *, offsets, weights, tile,
            halo, real_w, real_h):
    i = pl.program_id(0)
    # DMA the tile + halo window (source pre-padded by `halo` rows, so the
    # window start is always in range)
    copy = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * tile, tile + 2 * halo)], scratch, sem
    )
    copy.start()
    copy.wait()
    block = scratch[...]
    row0 = i * tile - halo  # global row of block row 0
    acc = None
    for (dx, dy), w in zip(offsets, weights):
        t = w * _shift_block(block, dx, dy, real_w, row0, real_h)
        acc = t if acc is None else acc + t
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (tile, block.shape[1]), 0
    ) + i * tile
    out_ref[...] = jnp.where(
        rows < real_h, acc[halo : halo + tile], 0.0
    )


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "weights", "tile", "interpret"),
)
def stencil_apply(img, offsets, weights, tile=64, interpret=False):
    """out[p] = sum_k weights[k] * img[p + offsets[k]] (zero outside).

    img: (H, W) float32.  offsets: tuple of (dx, dy).  Works for any H, W
    (padded internally).  Demonstration/building block -- the XLA
    equivalent is `sum(w * shift_read(img, o))`.
    """
    H, W = img.shape
    Wp = _roundup(W, LANE)
    halo = _roundup(max(max(abs(dy) for _, dy in offsets), 1), SUBLANE)
    Hp = _roundup(H, tile)
    n_tiles = Hp // tile
    # pad: halo rows on top, halo + alignment rows at the bottom
    padded = jnp.pad(
        img, ((halo, Hp - H + halo), (0, Wp - W))
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel, offsets=tuple(offsets), weights=tuple(weights),
            tile=tile, halo=halo, real_w=W, real_h=H,
        ),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (tile, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), img.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * halo, Wp), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    return out[:H, :W]
