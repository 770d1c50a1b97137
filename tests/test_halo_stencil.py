"""Halo-DMA row-tiled stencil prototype vs the XLA shift reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from opt_tpu.compile.evaluate import shift_read
from opt_tpu.ops.halo_stencil import stencil_apply

OFFSETS = ((1, 0), (-1, 0), (0, 1), (0, -1), (0, 0))
WEIGHTS = (1.0, 2.0, -1.0, 0.5, 4.0)


@pytest.mark.parametrize("shape", [(64, 128), (100, 200), (33, 450)])
def test_halo_stencil_matches_shift_reference(shape):
    rng = np.random.RandomState(shape[0])
    img = jnp.asarray(rng.randn(*shape).astype(np.float32))
    ref = sum(
        w * shift_read(img, o) for o, w in zip(OFFSETS, WEIGHTS)
    )
    got = stencil_apply(img, OFFSETS, WEIGHTS, tile=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
