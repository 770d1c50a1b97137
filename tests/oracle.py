"""Dense-matrix oracle for the GN/LM + PCG solver.

Re-implements the exact reference algorithm (reference:
API/src/solverGPUGaussNewton.t) with an explicitly materialized dense
Jacobian (jax.jacfwd) and plain numpy loops.  Shares only the residual
*evaluator* with the production path -- linearize/transpose, diag(J^T J),
the while-loop PCG, and the LM trust-region logic are all independent here,
so a match validates those paths end to end.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


def guarded_invert_np(d, kind):
    if kind == "CERES":
        return 1.0 / (1.0 + np.sqrt(np.maximum(d, 0.0))) ** 2
    if kind == "MODIFIED_CERES":
        return 1.0 / (1.0 + d)
    return 1.0 / (np.finfo(d.dtype).eps + d)


_JIT_CACHE = {}


def _jitted(funcs, data, unravel, masked):
    """Cache jitted dense-Jacobian builders per (funcs, masked)."""
    key = (id(funcs), masked)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        def resid_flat(v, data):
            fields = funcs.residual_fields(unravel(v), data, masked=masked)
            return jnp.concatenate([f.reshape(-1) for f in fields])

        @jax.jit
        def both(v, data):
            return jax.jacfwd(lambda u: resid_flat(u, data))(v), resid_flat(
                v, data
            )

        fn = both
        _JIT_CACHE[key] = fn
    return fn


def dense_parts(funcs, x, data):
    """Dense J, residual vector F, excluded-unknown mask (flattened)."""
    xf, unravel = ravel_pytree(x)
    J, F = _jitted(funcs, data, unravel, masked=False)(xf, data)
    J = np.asarray(J)
    F = np.asarray(F)

    masks = funcs.unknown_masks(x, data)
    excl_tree = {}
    for n, arr in x.items():
        m = masks[n]
        if m is None:
            excl_tree[n] = jnp.zeros(arr.shape, bool)
        else:
            excl_tree[n] = jnp.broadcast_to(m, arr.shape)
    excl_flat, _ = ravel_pytree(
        {k: v.astype(jnp.float32) for k, v in excl_tree.items()}
    )
    excl = np.asarray(excl_flat) > 0.5
    return J, F, excl, xf, unravel


def masked_cost(funcs, x, data):
    return float(funcs.cost(x, data))


def oracle_step(funcs, x, data, sp, config, prev_cost, radius, decrease_f,
                ssq_flat, n_iter):
    """One outer iteration, dense; returns dict mirroring solver state."""
    uses_lambda = config.uses_lambda
    J, F, excl, xf, unravel = dense_parts(funcs, x, data)
    J = J.copy()
    J[:, excl] = 0.0  # excluded unknowns never move / receive gradient

    jtf = J.T @ F
    r = -jtf
    diag = (J * J).sum(axis=0)

    if funcs.use_preconditioner:
        pre = guarded_invert_np(diag, config.guarded_invert_type)
    else:
        pre = np.ones_like(diag)
    pre[excl] = 0.0

    ctc = None
    if uses_lambda:
        if n_iter == 0:
            ssq_flat = pre.copy()
        ctc_raw = diag / radius
        if config.jacobi_scaling == "ONCE_PER_SOLVE":
            inv_s_sq = np.where(ssq_flat != 0, 1.0 / ssq_flat, 0.0)
        elif config.jacobi_scaling == "EVERY_ITERATION":
            inv_s_sq = np.where(pre != 0, 1.0 / pre, 0.0)
        else:
            inv_s_sq = np.ones_like(diag)
        lo = sp["min_lm_diagonal"] * inv_s_sq / radius
        hi = sp["max_lm_diagonal"] * inv_s_sq / radius
        ctc = np.clip(ctc_raw, lo, hi)
        denom = ctc + diag
        pre = np.where(denom != 0, 1.0 / denom, 0.0)
        pre[excl] = 0.0

    b = r.copy()

    def A(p):
        out = J.T @ (J @ p)
        if ctc is not None:
            out = out + ctc * p
        out[excl] = 0.0
        return out

    # ---- PCG ----
    delta = np.zeros_like(r)
    p = pre * r
    an = float(r @ p)
    Q0 = 0.0
    L = int(sp["lIterations"])
    period = int(sp["residual_reset_period"])
    rr = r.copy()
    for i in range(L):
        Ap = A(p)
        ad = float(p @ Ap)
        alpha = an / ad if ad != 0 else 0.0
        delta = delta + alpha * p
        if uses_lambda and ((i + 1) % period) == 0:
            rr = b - A(delta)
        else:
            rr = rr - alpha * Ap
        z = pre * rr
        bn = float(z @ rr)
        beta = bn / an if an != 0 else 0.0
        p = z + beta * p
        an = bn
        if uses_lambda:
            Q1 = 0.5 * float(delta @ (rr + b))
            zeta = (i + 1) * (Q1 - Q0) / Q1 if Q1 != 0 else 0.0
            if zeta < sp["q_tolerance"]:
                break
            Q0 = Q1

    x_new_flat = xf + jnp.asarray(delta, xf.dtype)
    x_new = unravel(x_new_flat)
    new_cost = masked_cost(funcs, x_new, data)

    out = {
        "delta": delta,
        "r0": r,
        "diag": diag,
        "pre": pre,
        "radius": radius,
        "decrease_f": decrease_f,
        "ssq": ssq_flat,
        "done": False,
    }

    if not uses_lambda:
        out["x"] = x_new
        out["prev_cost"] = new_cost
        return out

    # LM accept/reject -- model cost uses *masked* model residuals
    Jm, Fm = _jitted(funcs, data, unravel, masked=True)(xf, data)
    Jm = np.asarray(Jm).copy()
    Jm[:, excl] = 0.0
    Fm = np.asarray(Fm)
    mr = Fm + Jm @ delta
    model_cost = 0.5 * float(mr @ mr)
    model_cost_change = prev_cost - model_cost
    cost_change = prev_cost - new_cost
    rel = cost_change / model_cost_change if model_cost_change != 0 else 0.0
    if cost_change >= 0 and rel > sp["min_relative_decrease"]:
        if cost_change <= prev_cost * sp["function_tolerance"]:
            out["x"] = x_new
            out["prev_cost"] = prev_cost
            out["done"] = True
            return out
        tmp = 1.0 - (2.0 * rel - 1.0) ** 3
        radius = radius / max(1.0 / 3.0, tmp)
        radius = min(radius, sp["max_trust_region_radius"])
        out["x"] = x_new
        out["prev_cost"] = new_cost
        out["radius"] = radius
        out["decrease_f"] = 2.0
    else:
        radius = radius / decrease_f
        out["x"] = x
        out["prev_cost"] = prev_cost
        out["radius"] = radius
        out["decrease_f"] = 2.0 * decrease_f
        if radius <= sp["min_trust_region_radius"]:
            out["done"] = True
    return out
