"""Per-kernel profiled execution of one GN/LM outer iteration.

The production solver fuses the whole outer step (or whole solve) into one
XLA program, so host timers can only see phases (init/step_N/solve).  When
``collect_kernel_timing`` is set, plans run THIS decomposition instead:
each reference kernel is its own jitted dispatch, host-timed into the
KernelTimer under the reference's kernel names, reproducing the
per-kernel Count/Total/Average table of backend_cpu.t:245-312 /
backend_cuda.t:152-299 for the units of solverGPUGaussNewton.t:
PCGInit1 (:530-560), PCGStep1/2/3 (:607-852), computeAdelta (:2128-2139),
PCGLinearUpdate (:855-862), computeCost (:971-1000), computeModelCost.

Semantics match the fused path: every kernel recomputes from the current
unknowns exactly like the reference's matrix-free kernels (PCGStep1
re-evaluates the per-pixel partials each call).  The only numerical
difference is that the PCG scalars (alpha/beta/q) round-trip through host
floats between dispatches, as they round-trip through device scalars in
the reference; results agree to f32 reassociation.

Like the reference's timing mode, this adds overhead (one dispatch per
kernel instead of one per solve) -- it is a profiling tool, not the
production path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .core import (
    guarded_invert,
    tadd,
    taxpy,
    tdot,
    tmul,
    tscale,
    tsub,
    tzeros_like,
    _safe_div,
    tmap,
)


class ProfiledStepper:
    """Host-orchestrated outer iteration with per-kernel jitted phases."""

    def __init__(self, funcs, config):
        self.funcs = funcs
        self.config = config
        self.uses_lambda = config.uses_lambda
        dtype = funcs.dtype
        ginv = lambda d: guarded_invert(d, config.guarded_invert_type, dtype)

        def masks_apply(x, data, tree):
            return funcs.mask_unknown_tree(
                tree, funcs.unknown_masks(x, data)
            )

        @jax.jit
        def compute_cost(x, data):
            return funcs.cost(x, data)

        @jax.jit
        def pcg_init1(x, data, radius, ssq, is_first):
            """-J^T F, diag(J^T J), preconditioner, p0, r.z (PCGInit1 +
            PCGComputeCtC/PCGSaveSSq/PCGFinalizeDiagonal for LM)."""
            r0, jvp_fn, jt_fn = funcs.linearize(x, data)
            neg_jtf = masks_apply(
                x, data, tmap(lambda v: -v, funcs.jtf(r0, jt_fn))
            )
            diag = masks_apply(x, data, funcs.diag_jtj(x, data))
            if funcs.use_preconditioner:
                pre = tmap(ginv, diag)
            else:
                pre = tmap(jnp.ones_like, diag)
            pre = masks_apply(x, data, pre)
            out = {"r": neg_jtf, "diag": diag, "ssq": ssq}
            if self.uses_lambda:
                ssq = tmap(
                    lambda s, p_: jnp.where(is_first, p_, s), ssq, pre
                )
                ctc_raw = tscale(1.0 / radius, diag)
                if config.jacobi_scaling == "ONCE_PER_SOLVE":
                    inv_s_sq = tmap(
                        lambda s: _safe_div(jnp.ones_like(s), s), ssq
                    )
                elif config.jacobi_scaling == "EVERY_ITERATION":
                    inv_s_sq = tmap(
                        lambda p_: _safe_div(jnp.ones_like(p_), p_), pre
                    )
                else:
                    inv_s_sq = tmap(jnp.ones_like, diag)
                min_d = jnp.asarray(
                    self._sp_const["min_lm_diagonal"], dtype)
                max_d = jnp.asarray(
                    self._sp_const["max_lm_diagonal"], dtype)
                ctc = tmap(
                    lambda c, isq: jnp.clip(
                        c, min_d * isq / radius, max_d * isq / radius
                    ),
                    ctc_raw, inv_s_sq,
                )
                pre = masks_apply(
                    x, data,
                    tmap(lambda c, d_: _safe_div(jnp.ones_like(c), c + d_),
                         ctc, diag),
                )
                out["ctc"] = ctc
                out["ssq"] = ssq
            out["pre"] = pre
            p0 = masks_apply(x, data, tmul(pre, neg_jtf))
            out["p"] = p0
            out["an"] = tdot(neg_jtf, p0)
            return out

        def _A(x, data, p, ctc):
            _, jvp_fn, jt_fn = funcs.linearize(x, data)
            out = jt_fn(jvp_fn(p))
            if ctc is not None:
                out = tmap(lambda o, c, p_: o + c * p_, out, ctc, p)
            return masks_apply(x, data, out)

        @jax.jit
        def pcg_step1(x, data, p, ctc):
            """Ap = (J^T J [+ CtC]) p and p.Ap (PCGStep1)."""
            Ap = _A(x, data, p, ctc)
            return Ap, tdot(p, Ap)

        @jax.jit
        def pcg_step2(x, data, delta, r, p, Ap, pre, b, alpha):
            """delta/r updates, z = M^-1 r, r.z, LM q (PCGStep2)."""
            delta = taxpy(alpha, p, delta)
            r = taxpy(-alpha, Ap, r)
            z = masks_apply(x, data, tmul(pre, r))
            bn = tdot(z, r)
            q = (
                0.5 * tdot(delta, tadd(r, b))
                if self.uses_lambda
                else jnp.asarray(0.0, dtype)
            )
            return delta, r, z, bn, q

        @jax.jit
        def compute_adelta(x, data, delta, b, ctc):
            """Exact residual recompute r = b - A delta (computeAdelta +
            PCGStep2_2ndHalf, solverGPUGaussNewton.t:2128-2139)."""
            return tsub(b, _A(x, data, delta, ctc))

        @jax.jit
        def pcg_step3(p, z, beta):
            """p = z + beta p (PCGStep3)."""
            return taxpy(beta, p, z)

        @jax.jit
        def linear_update(x, data, delta):
            """x += delta on non-excluded unknowns (PCGLinearUpdate)."""
            return tadd(x, masks_apply(x, data, delta))

        @jax.jit
        def model_cost(x, data, delta):
            r0, jvp_fn, _ = funcs.linearize(x, data)
            return funcs.model_cost(r0, jvp_fn, delta, x, data)

        self._compute_cost = compute_cost
        self._pcg_init1 = pcg_init1
        self._pcg_step1 = pcg_step1
        self._pcg_step2 = pcg_step2
        self._pcg_step3 = pcg_step3
        self._compute_adelta = compute_adelta
        self._linear_update = linear_update
        self._model_cost = model_cost
        self._sp_const = {}

    def init(self, x, data, sp_host, timer):
        self._sp_const = dict(sp_host)
        with timer.event("computeCost"):
            cost0 = self._block(self._compute_cost(x, data))
        dtype = self.funcs.dtype
        state = {
            "x": x,
            "prev_cost": cost0,
            "radius": jnp.asarray(
                float(sp_host["trust_region_radius"]), dtype),
            "decrease_f": jnp.asarray(
                float(sp_host["radius_decrease_factor"]), dtype),
            "ssq": (
                tmap(jnp.ones_like, x)
                if self.uses_lambda
                else jnp.zeros((), dtype)
            ),
            "n_iter": jnp.asarray(0, jnp.int32),
            "done": jnp.asarray(False),
        }
        return state

    @staticmethod
    def _block(v):
        jax.block_until_ready(v)
        return v

    def step(self, state, data, sp_host, timer):
        """One profiled outer iteration; mirrors core.step_fn."""
        self._sp_const = dict(sp_host)
        funcs = self.funcs
        x = state["x"]
        uses_lambda = self.uses_lambda
        L = int(sp_host["lIterations"])
        period = int(sp_host["residual_reset_period"])
        q_tol = float(sp_host["q_tolerance"])
        radius = state["radius"]

        with timer.event("PCGInit1"):
            init = self._block(self._pcg_init1(
                x, data, radius, state["ssq"],
                state["n_iter"] == 0,
            ))
        r, pre, p = init["r"], init["pre"], init["p"]
        b = init["r"]
        ctc = init.get("ctc")
        ssq = init["ssq"] if uses_lambda else state["ssq"]
        # host scalar recurrences in the plan dtype so divisions round
        # exactly like the fused on-device _safe_div
        sdt = np.dtype(funcs.dtype).type
        sdiv = lambda a, b: sdt(a / b) if b != 0.0 else sdt(0.0)
        an = sdt(float(init["an"]))
        delta = tzeros_like(r)
        Q0 = sdt(0.0)

        i = 0
        while i < L:
            with timer.event("PCGStep1"):
                Ap, pAp = self._block(self._pcg_step1(x, data, p, ctc))
            alpha = sdiv(an, sdt(float(pAp)))
            with timer.event("PCGStep2"):
                delta, r, z, bn, q = self._block(self._pcg_step2(
                    x, data, delta, r, p, Ap, pre, b,
                    jnp.asarray(alpha, funcs.dtype),
                ))
            if uses_lambda and (i + 1) % period == 0:
                with timer.event("computeAdelta"):
                    r = self._block(
                        self._compute_adelta(x, data, delta, b, ctc))
            bn_f = sdt(float(bn))
            beta = sdiv(bn_f, an)
            with timer.event("PCGStep3"):
                p = self._block(self._pcg_step3(
                    p, z, jnp.asarray(beta, funcs.dtype)))
            an = bn_f
            i += 1
            if uses_lambda:
                Q1 = sdt(float(q))
                zeta = sdt(i) * sdiv(Q1 - Q0, Q1)
                Q0 = Q1
                if zeta < sdt(q_tol):
                    break

        with timer.event("PCGLinearUpdate"):
            x_new = self._block(self._linear_update(x, data, delta))
        with timer.event("computeCost"):
            new_cost = self._block(self._compute_cost(x_new, data))

        if not uses_lambda:
            return {
                "x": x_new,
                "prev_cost": new_cost,
                "radius": state["radius"],
                "decrease_f": state["decrease_f"],
                "ssq": ssq,
                "n_iter": state["n_iter"] + 1,
                "done": state["done"],
            }

        # LM trust-region accept/reject on host scalars in the PLAN
        # dtype (sdt), so every operation rounds exactly like the fused
        # on-device math (core.py:496-537) -- f64 host floats here would
        # make the profiling mode's accept/reject trajectory diverge
        # from the production path near decision boundaries
        with timer.event("computeModelCost"):
            mc = sdt(float(self._block(self._model_cost(x, data, delta))))
        prev = sdt(float(state["prev_cost"]))
        cost_change = sdt(prev - sdt(float(new_cost)))
        model_change = sdt(prev - mc)
        rel = sdiv(cost_change, model_change)
        accept = (cost_change >= 0) and (
            rel > sdt(float(sp_host["min_relative_decrease"])))
        ftol_reached = cost_change <= sdt(
            prev * sdt(float(sp_host["function_tolerance"])))
        radius_f = sdt(float(state["radius"]))
        decrease_f = sdt(float(state["decrease_f"]))
        done = bool(state["done"])
        if accept and not ftol_reached:
            tmp = sdt(1.0) - sdt(2.0 * rel - sdt(1.0)) ** 3
            radius_f = min(
                sdt(radius_f / max(sdt(1.0 / 3.0), tmp)),
                sdt(float(sp_host["max_trust_region_radius"])),
            )
            decrease_f = sdt(2.0)
            prev_cost = sdt(float(new_cost))
        elif accept:
            prev_cost = prev
            done = True
        else:
            radius_f = sdt(radius_f / decrease_f)
            decrease_f = sdt(2.0 * decrease_f)
            prev_cost = prev
            if radius_f <= sdt(float(sp_host["min_trust_region_radius"])):
                done = True
        dtype = funcs.dtype
        return {
            "x": x_new if accept else x,
            "prev_cost": jnp.asarray(prev_cost, dtype),
            "radius": jnp.asarray(radius_f, dtype),
            "decrease_f": jnp.asarray(decrease_f, dtype),
            "ssq": ssq,
            "n_iter": state["n_iter"] + 1,
            "done": jnp.asarray(done),
        }
