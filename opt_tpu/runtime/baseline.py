"""Outside-baseline solver in the Ceres role.

The reference benchmarks against Ceres (CGNR LM, one thread) with
hand-written per-example autodiff functors (reference:
examples/shared/CeresSolverBase.cpp:7-20 and per-example
CeresSolver*.cpp).  Here a single generic baseline covers every energy:
scipy.optimize.least_squares (Trust Region Reflective with LSMR inner
solver -- Ceres-class machinery) over the plan's own residual program,
with the exact sparse Jacobian from the materialized-Jacobian export.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


class ScipyBaselineSolver:
    """least_squares-based solve over a plan's residual program."""

    def __init__(self, plan):
        self.plan = plan

    def solve(self, inputs, max_nfev=None, verbose=0):
        from scipy.optimize import least_squares
        from opt_tpu.sparse.materialize import MaterializedJacobian

        plan = self.plan
        # force original-order flat graph indices: the materialized-J
        # export below does not understand the banded padded edge layout
        x0, data = plan.bind(inputs, graph_mode="take")
        xf0, unravel = ravel_pytree(x0)
        funcs = plan.funcs

        masks = funcs.unknown_masks(x0, data)
        excl_tree = {
            n: (jnp.broadcast_to(m, x0[n].shape)
                if m is not None
                else jnp.zeros(x0[n].shape, bool))
            for n, m in masks.items()
        }
        excl_flat = np.asarray(
            ravel_pytree(
                {k: v.astype(jnp.float32) for k, v in excl_tree.items()}
            )[0]
        ) > 0.5

        @jax.jit
        def resid_flat(v):
            fields = funcs.residual_fields(unravel(v), data, masked=True)
            return jnp.concatenate([f.reshape(-1) for f in fields])

        def fun(v):
            return np.asarray(resid_flat(jnp.asarray(v, xf0.dtype)))

        def jac(v):
            mat = MaterializedJacobian(
                funcs, unravel(jnp.asarray(v, xf0.dtype)), data
            )
            J = mat.to_scipy_csr(data).tolil()
            J[:, excl_flat] = 0.0
            return J.tocsr()

        res = least_squares(
            fun,
            np.asarray(xf0),
            jac=jac,
            method="trf",
            tr_solver="lsmr",
            max_nfev=max_nfev,
            verbose=verbose,
        )
        x_final = unravel(jnp.asarray(res.x, xf0.dtype))
        final_cost = float(funcs.cost(x_final, data))
        return {
            "x": {k: np.asarray(v) for k, v in x_final.items()},
            "final_cost": final_cost,
            "nfev": res.nfev,
            "status": res.status,
        }
