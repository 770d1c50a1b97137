"""Public API: the TPU-native analogue of the reference's C API.

Parity with reference: API/release/include/Opt.h:40-76 --
  Opt_NewState            -> OptState(...)
  Opt_ProblemDefine       -> state.problem_define(energy, kind)
  Opt_ProblemPlan         -> state.problem_plan(problem, dims)
  Opt_SetSolverParameter  -> plan.set_solver_parameter(name, value)
  Opt_ProblemInit/Step    -> plan.init(inputs) / plan.step()
  Opt_ProblemSolve        -> plan.solve(inputs)  (also fully on-device)
  Opt_ProblemCurrentCost  -> plan.current_cost()

Where the reference JIT-compiles Terra->PTX per (problem, dims, backend)
at plan time (o.t:1351-1528), a plan here holds jitted XLA executables
specialized to the same static information (dims are baked into traced
shapes).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..dsl.env import EnergyEnv
from ..dsl.spec import ProblemSpec
from ..compile.plan_fns import ProblemFunctions
from ..solver.core import (
    SOLVER_PARAMETER_DEFAULTS,
    SolverConfig,
    make_solver,
)
from .timing import KernelTimer

GN_KINDS = ("gaussNewtonGPU", "gauss_newton", "gaussNewton", "GN")
LM_KINDS = ("LMGPU", "levenberg_marquardt", "levenbergMarquardt", "LM")

# solve_many auto-mode guardrail: batching wins while the whole batch's
# PCG carries stay VMEM-resident -- measured wins at batch x pixels
# <= 2^20 (128^2 x 64 = 2.35x, 256^2 x 16 = 1.17x) and a loss at 2^21
# (512^2 x 8 = 0.53x), docs/sweep_tpu_r3.csv
SOLVE_MANY_AUTO_MAX_PIXELS = 1 << 20


class Problem:
    def __init__(self, energy, kind):
        self.energy = energy
        self.kind = kind
        if kind in GN_KINDS:
            self.uses_lambda = False
        elif kind in LM_KINDS:
            self.uses_lambda = True
        else:
            raise ValueError(f"unknown solver kind {kind!r}")


class OptState:
    """Opt_NewState parity (Opt_InitializationParameters, Opt.h:8-35).

    backend / numthreads are accepted for API parity; execution targets
    whatever JAX backend is active (TPU when present, CPU otherwise) --
    the reference's backend_cpu/backend_cuda split collapses into one XLA
    program.
    """

    def __init__(
        self,
        backend="tpu",
        numthreads=1,
        double_precision=False,
        verbosity=0,
        collect_kernel_timing=False,
        use_materialized_jacobian=False,
        use_fused_jtj=False,
        use_pallas=False,
        pcg_variant="classic",
        guarded_invert_type="CERES",
        jacobi_scaling="ONCE_PER_SOLVE",
        graph_mode=None,
        plane_mode=None,
        compilation_cache_dir=None,
    ):
        if double_precision:
            jax.config.update("jax_enable_x64", True)
        if compilation_cache_dir is None:
            import os

            compilation_cache_dir = os.environ.get("OPT_TPU_CACHE_DIR")
        if compilation_cache_dir:
            # persistent XLA compilation cache: warm restarts skip the
            # 20-40 s first-compile of each shape-specialized plan (the
            # reference amortizes compiles by caching Terra-compiled
            # plans in-process only, o.t makePlan; this survives the
            # process).  Min-compile-time 0 so even small plans cache.
            jax.config.update("jax_compilation_cache_dir",
                              str(compilation_cache_dir))
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                              0)
        self.backend = backend
        self.numthreads = numthreads
        self.double_precision = double_precision
        self.verbosity = verbosity
        self.collect_kernel_timing = collect_kernel_timing
        self.use_materialized_jacobian = use_materialized_jacobian
        self.use_fused_jtj = use_fused_jtj
        self.use_pallas = use_pallas
        self.compilation_cache_dir = compilation_cache_dir
        if pcg_variant not in ("classic", "pipelined"):
            raise ValueError(
                f"pcg_variant must be 'classic' or 'pipelined', "
                f"got {pcg_variant!r}"
            )
        self.pcg_variant = pcg_variant
        self.guarded_invert_type = guarded_invert_type
        self.jacobi_scaling = jacobi_scaling
        if graph_mode is None:
            import os

            graph_mode = os.environ.get("OPT_TPU_GRAPH_MODE", "auto")
        if graph_mode not in ("auto", "banded", "take"):
            raise ValueError(
                f"graph_mode must be 'auto', 'banded' or 'take', "
                f"got {graph_mode!r}"
            )
        # graph gather/scatter engine: 'banded' forces the MXU one-hot
        # engine (ops/graph_banded.py), 'take' forces XLA take/segment_sum,
        # 'auto' picks banded when the graph is large and RCM-bandable.
        self.graph_mode = graph_mode
        if plane_mode is None:
            import os

            plane_mode = os.environ.get("OPT_TPU_PLANE_MODE", "0") == "1"
        # channel-plane solver layout: every unknown/image channel is its
        # own (spatial) array inside the jitted solve, so no (H, W, C)
        # tensors exist for XLA to pick layouts for.  Motivated by the
        # SFS PCG body carrying both T(8,128) plane and T(1,128) vector
        # layouts on (480,640,1) tensors; MEASURED SLOWER on v5e
        # (image_warping 512^2 8x400: 125.5 -> 140.1 ms; SFS 60x10:
        # 72.2 -> 82.6 ms) -- XLA's mixed layouts are deliberate and
        # cheaper than uniform planes on grids, unlike the graph case
        # (ops/graph_banded.py blocked tiling) where uniformity won 2x.
        # Kept off by default as the measured record; grid problems only.
        self.plane_mode = bool(plane_mode)
        self.dtype = jnp.float64 if double_precision else jnp.float32

    def problem_define(self, energy, kind="gaussNewtonGPU"):
        return Problem(energy, kind)

    def problem_plan(self, problem, dims, **kwargs):
        return Plan(self, problem, dims, **kwargs)

    def problem_solve(self, plan, inputs):
        plan.init(inputs)
        while plan.step():
            pass
        return plan.current_cost()

    def problem_delete(self, problem):
        """Opt_ProblemDelete parity (Opt.h:56): lifetimes are Python-managed;
        kept for drop-in compatibility."""

    def plan_free(self, plan):
        """Opt_PlanFree parity (Opt.h:54): releases device buffers held by
        the plan's bound state."""
        plan.free()

    # CamelCase aliases for reference-API parity
    ProblemDefine = problem_define
    ProblemPlan = problem_plan
    ProblemSolve = problem_solve
    ProblemDelete = problem_delete
    PlanFree = plan_free


def NewState(**kwargs):
    return OptState(**kwargs)


def _run_energy(energy, env):
    """Run a user energy definition: a callable taking the env, or a path
    to a Python file executed with the DSL names as globals (the analogue
    of problemSpecFromFile, o.t:1295-1348)."""
    if callable(energy):
        energy(env)
        return
    path = str(energy)
    with open(path) as f:
        src = f.read()
    ns = env.namespace()
    ns["__name__"] = "<energy>"
    exec(compile(src, path, "exec"), ns)


def _plane_wrap_solver(fns):
    """Wrap a kernel_safe (channel-plane) solver so its public signatures
    keep the array-form (.., C) pytrees: channels split to planes on
    entry and re-stack on exit INSIDE the traced function (free slices
    under XLA).  The PCG while-loop carries are then uniform (spatial)
    planes -- no (H, W, C) tensors for XLA to assign mixed T(8,128) /
    T(1,128) layouts to (see OptState.plane_mode)."""
    init_fn, step_fn, cost_fn, solve_fn, full_solve_fn = fns

    def split(t):
        return {
            n: [a[..., c] for c in range(a.shape[-1])]
            for n, a in t.items()
        }

    def stack(t):
        return {n: jnp.stack(chans, axis=-1) for n, chans in t.items()}

    def data_in(data):
        d = dict(data)
        d["images"] = split(data["images"])
        return d

    def st_in(state):
        st = dict(state)
        st["x"] = split(state["x"])
        if isinstance(state["ssq"], dict):  # LM only; GN holds a scalar
            st["ssq"] = split(state["ssq"])
        return st

    def st_out(state):
        st = dict(state)
        st["x"] = stack(state["x"])
        if isinstance(state["ssq"], dict):
            st["ssq"] = stack(state["ssq"])
        return st

    def w_init(x, data, sp):
        return st_out(init_fn(split(x), data_in(data), sp))

    def w_step(state, data, sp):
        return st_out(step_fn(st_in(state), data_in(data), sp))

    def w_cost(state, data):
        return cost_fn(st_in(state), data_in(data))

    def w_solve(state, data, sp):
        return st_out(solve_fn(st_in(state), data_in(data), sp))

    def w_full(x, data, sp):
        return st_out(full_solve_fn(split(x), data_in(data), sp))

    return w_init, w_step, w_cost, w_solve, w_full


class Plan:
    """A shape-specialized, jitted solver (opt.Plan, o.t:158-164)."""

    def __init__(self, state: OptState, problem: Problem, dims, jit=True):
        self.state = state
        self.problem = problem
        self.dims = dims
        self.spec = ProblemSpec()
        env = EnergyEnv(self.spec, dims)
        _run_energy(problem.energy, env)
        if not self.spec.terms:
            raise ValueError("energy defined no residual terms")

        self.funcs = ProblemFunctions(self.spec, state.dtype)
        self.config = SolverConfig(
            uses_lambda=problem.uses_lambda,
            guarded_invert_type=state.guarded_invert_type,
            jacobi_scaling=state.jacobi_scaling,
            use_materialized_jacobian=state.use_materialized_jacobian,
            use_fused_jtj=state.use_fused_jtj,
            use_pallas_pcg=state.use_pallas,
            pcg_variant=state.pcg_variant,
        )
        self.plane_mode = bool(
            state.plane_mode
            and not self.spec.graphs
            and not state.use_materialized_jacobian
            and not state.use_fused_jtj
            and not state.use_pallas
            and not state.collect_kernel_timing
        )
        if self.plane_mode:
            pf_safe = ProblemFunctions(
                self.spec, state.dtype, kernel_safe=True
            )
            fns = make_solver(pf_safe, self.config)
            init_fn, step_fn, cost_fn, solve_fn, full_solve_fn = (
                _plane_wrap_solver(fns)
            )
        else:
            init_fn, step_fn, cost_fn, solve_fn, full_solve_fn = (
                make_solver(self.funcs, self.config)
            )
        if self.spec.graphs:
            # deterministic HLO: the banded engine's one-hot tag counter
            # restarts at each top-level trace so identical programs
            # retrace to identical HLO (persistent-cache friendly)
            from ..ops.graph_banded import reset_onehot_tags

            def _det(fn):
                def wrapped(*a, **k):
                    reset_onehot_tags()
                    return fn(*a, **k)
                return wrapped

            init_fn, step_fn, cost_fn, solve_fn, full_solve_fn = (
                _det(init_fn), _det(step_fn), _det(cost_fn),
                _det(solve_fn), _det(full_solve_fn),
            )
        # raw (unjitted) versions, e.g. for the driver's compile checks
        self.raw_init_fn = init_fn
        self.raw_step_fn = step_fn
        self.raw_cost_fn = cost_fn
        self.raw_solve_fn = solve_fn
        self.raw_full_solve_fn = full_solve_fn
        if jit:
            self._init_fn = jax.jit(init_fn)
            self._step_fn = jax.jit(step_fn)
            self._cost_fn = jax.jit(cost_fn)
            self._solve_fn = jax.jit(solve_fn)
            self._full_solve_fn = jax.jit(full_solve_fn)
        else:
            self._init_fn = init_fn
            self._step_fn = step_fn
            self._cost_fn = cost_fn
            self._solve_fn = solve_fn
            self._full_solve_fn = full_solve_fn

        self.solver_params = dict(SOLVER_PARAMETER_DEFAULTS)
        self._state = None
        self._data = None
        self._data_inputs = None
        self._cleaned = False
        self._banding_cache = {}
        self._active_banding = {}
        self.timer = KernelTimer(enabled=state.collect_kernel_timing)
        if state.verbosity > 1:
            self.print_allocation_info()

    # -- parameters -----------------------------------------------------------

    def set_solver_parameter(self, name, value):
        if name == "nIter":
            # the current nonlinear-iteration counter is itself a settable
            # SolverParameters entry in the reference (the setSolverParameter
            # if-chain iterates ALL struct fields,
            # solverGPUGaussNewton.t:186-201,2382-2398); resetting it lets
            # the host run extra iterations on a finished plan
            if self._state is None:
                raise RuntimeError(
                    "nIter is the live iteration counter; set it after init"
                )
            self._state = dict(self._state)
            self._state["n_iter"] = jnp.asarray(int(value), jnp.int32)
            self._state["done"] = jnp.asarray(False)
            return
        if name not in self.solver_params:
            raise KeyError(f"unknown solver parameter {name!r}")
        self.solver_params[name] = value

    SetSolverParameter = set_solver_parameter

    def _sp_device(self):
        sp = {}
        for k, v in self.solver_params.items():
            if k in ("nIterations",):
                continue
            if k in ("lIterations", "residual_reset_period"):
                sp[k] = jnp.asarray(int(v), jnp.int32)
            else:
                sp[k] = jnp.asarray(float(v), self.state.dtype)
        return sp

    def print_allocation_info(self, out=print):
        """Memory-layout report (printAllocationInfo parity, o.t:375-405,
        solverGPUGaussNewton.t:284-335): per-image bytes plus the solver's
        work-vector footprint."""
        import math

        dtype_bytes = jnp.dtype(self.state.dtype).itemsize
        out("Layout of ProblemParameters:")
        total = 0
        unk_bytes = 0
        for name, im in self.spec.images.items():
            if name in self.funcs.aliases:
                out(f"Param {name} aliases {self.funcs.aliases[name]} "
                    f"(0 bytes)")
                continue
            n = math.prod(im.ispace.shape) * im.channels * dtype_bytes
            total += n
            if im.is_unknown:
                unk_bytes += n
            out(f"Param {name} needs {n} bytes")
        for g in self.spec.graphs.values():
            nedges = g.edge_dim.size
            n = nedges * len(g.slots) * 4
            total += n
            out(f"Param {g.name} needs {n} bytes ({nedges} edges x "
                f"{len(g.slots)} index arrays)")
        out(f"total usage of ProblemParameters is {total} bytes")
        # solver work vectors over the unknowns (PlanData analogue,
        # solverGPUGaussNewton.t:208-272): GN keeps 6, LM 8
        n_vec = 8 if self.config.uses_lambda else 6
        out(f"solver work vectors: {n_vec} x {unk_bytes} = "
            f"{n_vec * unk_bytes} bytes")
        return total

    # -- data binding (util.initParameters parity, util.t:677-721) ------------

    def bind(self, inputs, graph_mode=None):
        """Bind runtime arrays.  graph_mode overrides the state-level
        graph engine choice for this bind (runtime/baseline.py and the
        sharded path force 'take': the materialized-J export and GSPMD
        partitioning expect original-order flat indices)."""
        dtype = self.state.dtype
        images = {}
        unknowns = {}
        params = {}
        graph_indices = {}

        def canon_image(im, arr):
            arr = jnp.asarray(arr)
            spatial = im.ispace.shape
            if arr.shape == spatial:
                if im.channels != 1:
                    raise ValueError(
                        f"{im.name}: expected {im.channels} channels"
                    )
                arr = arr[..., None]
            expect = spatial + (im.channels,)
            if arr.shape != expect:
                raise ValueError(
                    f"{im.name}: shape {arr.shape} != expected {expect} "
                    f"(note layout: dims ({', '.join(d.name for d in im.ispace.dims)}) "
                    f"-> array shape {expect})"
                )
            return arr.astype(dtype)

        for name, im in self.spec.images.items():
            if name in self.funcs.aliases:
                continue  # const view of an unknown; reads its live buffer
            if name not in inputs:
                raise KeyError(f"missing image input {name!r}")
            arr = canon_image(im, inputs[name])
            if im.is_unknown:
                unknowns[name] = arr
            else:
                images[name] = arr

        for name in self.spec.params:
            if name not in inputs:
                raise KeyError(f"missing param input {name!r}")
            params[name] = jnp.asarray(float(inputs[name]), dtype)

        slots_np = {}
        for gname, g in self.spec.graphs.items():
            slots = {}
            gin = inputs.get(gname)
            for sname in g.slots:
                if gin is not None and sname in gin:
                    v = gin[sname]
                elif f"{gname}.{sname}" in inputs:
                    v = inputs[f"{gname}.{sname}"]
                else:
                    raise KeyError(
                        f"missing graph indices {gname}.{sname}"
                    )
                vnp = np.asarray(v)
                n_verts = g.slots[sname].ispace.shape[0]
                if vnp.size and (
                    vnp.min() < 0 or vnp.max() >= n_verts
                ):
                    # jnp.take/segment_sum silently clamp/drop OOB indices
                    # on device; fail fast at bind time instead.
                    raise ValueError(
                        f"graph {gname}.{sname}: vertex index out of "
                        f"range [0, {n_verts}): min={vnp.min()}, "
                        f"max={vnp.max()}"
                    )
                slots[sname] = vnp.astype(np.int32)
            n = {s.shape for s in slots.values()}
            if len(n) != 1:
                raise ValueError(f"graph {gname}: slot length mismatch")
            slots_np[gname] = slots

        banding, graph_banding = self._plan_banding(slots_np, graph_mode)
        self._active_banding = banding
        if banding:
            for key, vb in banding.items():
                perm = jnp.asarray(vb.perm, jnp.int32)
                for store in (unknowns, images):
                    for name, arr in store.items():
                        im = self.spec.images[name]
                        if im.ispace.key() == key:
                            store[name] = jnp.take(arr, perm, axis=0)

        for gname, slots in slots_np.items():
            g = self.spec.graphs[gname]
            key = next(iter(g.slots.values())).ispace.key()
            vb = banding.get(key) if banding else None
            gplan = vb.graphs.get(gname) if vb is not None else None
            if gplan is not None:
                # padded flat indices in the permuted vertex order; pad
                # rows point at vertex 0 and are masked/dropped everywhere
                flat = {}
                for sname, lc in gplan.loc.items():
                    lc64 = lc.astype(np.int64)
                    if gplan.layout == "tiled":
                        # loc = window_pos*vb + offset; window_pos keys
                        # the per-tile block list wblk
                        wb = gplan.wblk.astype(np.int64)
                        gidx = (
                            np.take_along_axis(
                                wb, np.clip(lc64, 0, None) // gplan.vb,
                                axis=1,
                            ) * gplan.vb + lc64 % gplan.vb
                        )
                    else:
                        blk = np.arange(
                            gplan.n_eblk, dtype=np.int64)[:, None]
                        gidx = lc64 + (blk - 1) * gplan.vb
                    gidx[lc < 0] = 0
                    flat[sname] = jnp.asarray(
                        gidx.reshape(-1), jnp.int32
                    )
                graph_indices[gname] = flat
            else:
                # not banded itself, but remap any slot whose vertex
                # space WAS banded (arrays are in RCM-permuted order)
                flat = {}
                for sname, a in slots.items():
                    skey = g.slots[sname].ispace.key()
                    svb = banding.get(skey) if banding else None
                    idx = np.asarray(a, np.int64)
                    if svb is not None:
                        idx = svb.inv_perm[idx]
                    flat[sname] = jnp.asarray(idx, jnp.int32)
                graph_indices[gname] = flat

        data = {
            "images": images,
            "params": params,
            "graph_indices": graph_indices,
        }
        if graph_banding:
            data["graph_banding"] = graph_banding
        return unknowns, data

    def _plan_banding(self, slots_np, graph_mode=None):
        """Decide/plan the banded graph engine for this bind.

        Returns ({ispace_key: VertexBanding}, {gname: device banding dict})
        -- both empty when disabled."""
        mode = graph_mode or self.state.graph_mode
        cfg = self.config
        if (
            not slots_np
            or mode == "take"
            # float64 graphs run the take/segment_sum path: the banded
            # engine's split-bf16 one-hot dots reconstruct f32 exactly
            # but not f64 (would need a 6-plane split and f64 MXU
            # accumulation Mosaic lacks), so f64 keeps exact take
            # semantics at ~7x the f32 banded cost at 10k-vertex scale
            # (see docs/ARCHITECTURE.md, graph engine notes)
            or self.state.dtype != jnp.float32
            or cfg.use_materialized_jacobian
            or cfg.use_fused_jtj
        ):
            return {}, {}
        from ..ops import graph_banded as gb

        # group graphs by vertex ispace; skip graphs with mixed spaces
        by_space = {}
        for gname, g in self.spec.graphs.items():
            keys = {s.ispace.key() for s in g.slots.values()}
            if len(keys) != 1:
                continue
            by_space.setdefault(keys.pop(), {})[gname] = slots_np[gname]

        cache_key_parts = [mode]
        for key, graphs in sorted(by_space.items()):
            for gname, slots in sorted(graphs.items()):
                for sname, arr in sorted(slots.items()):
                    cache_key_parts.append(
                        (key, gname, sname, arr.tobytes())
                    )
        cache_key = hash(tuple(cache_key_parts))
        if cache_key in self._banding_cache:
            banding = self._banding_cache[cache_key]
        else:
            banding = {}
            for key, graphs in by_space.items():
                n_verts = None
                for gname in graphs:
                    g = self.spec.graphs[gname]
                    n_verts = next(iter(g.slots.values())).ispace.shape[0]
                vb = gb.plan_vertex_banding(
                    graphs, n_verts, force=(mode == "banded")
                )
                if vb is not None:
                    banding[key] = vb
            self._banding_cache[cache_key] = banding

        graph_banding = {}
        for key, vb in banding.items():
            for gname, gplan in vb.graphs.items():
                graph_banding[gname] = gb.DeviceBanding(
                    loc={
                        s: jnp.asarray(lc) for s, lc in gplan.loc.items()
                    },
                    pad_mask=jnp.asarray(
                        gplan.pad_mask.reshape(gplan.n_eblk, gplan.eb)
                    ),
                    vb=gplan.vb,
                    n_vblk=gplan.n_vblk,
                    eb=gplan.eb,
                    n_verts=vb.n_verts,
                    layout=gplan.layout,
                    primary_slot=gplan.primary_slot,
                    deg=gplan.deg,
                    wblk=(jnp.asarray(gplan.wblk)
                          if gplan.wblk is not None else None),
                )
        return banding, graph_banding

    # -- lifecycle --------------------------------------------------------------

    def _profiled(self):
        """Per-kernel profiled stepper (collect_kernel_timing mode):
        reference kernel names, one dispatch per kernel
        (opt_tpu/solver/profiled.py)."""
        if getattr(self, "_profiled_stepper", None) is None:
            from ..solver.profiled import ProfiledStepper

            self._profiled_stepper = ProfiledStepper(
                self.funcs, self.config
            )
        return self._profiled_stepper

    def init(self, inputs):
        """Opt_ProblemInit: bind data, compute initial cost."""
        x, data = self.bind(inputs)
        self._data = data
        self._data_inputs = None
        self._cleaned = False
        with self.timer.event("init"):
            if self.state.collect_kernel_timing:
                self._state = self._profiled().init(
                    x, data, self.solver_params, self.timer
                )
            else:
                self._state = self._init_fn(x, data, self._sp_device())
            jax.block_until_ready(self._state)
        return self

    Init = init

    def step(self):
        """Opt_ProblemStep: one outer iteration; returns 1 while running
        (plan.step contract, solverGPUGaussNewton.t:1913-2349)."""
        assert self._state is not None, "call init() first"
        s = self._state
        if int(s["n_iter"]) >= int(self.solver_params["nIterations"]):
            self._cleanup()
            return 0
        if bool(s["done"]):
            self._cleanup()
            return 0
        with self.timer.event(f"step_{int(s['n_iter'])}"):
            if self.state.collect_kernel_timing:
                self._state = self._profiled().step(
                    s, self._data, self.solver_params, self.timer
                )
            else:
                self._state = self._step_fn(
                    s, self._data, self._sp_device()
                )
            jax.block_until_ready(self._state)
        if self.state.verbosity > 1:
            print(
                f"--cost after step {int(s['n_iter'])}: "
                f"{float(self._state['prev_cost']):.16f}"
            )
        return 1

    def free(self):
        """Opt_PlanFree parity (Opt.h:54): release device buffers held by
        the plan's bound state (the jitted programs stay cached on the
        OptState for re-binding)."""
        self._state = None
        self._data = None
        self._data_inputs = None
        self._batched_state = None

    def _cleanup(self):
        """Solver cleanup contract (solverGPUGaussNewton.t:1902-1910):
        print 'final cost=' and the aggregated per-kernel timing table."""
        if self._cleaned:
            return
        self._cleaned = True
        if self.state.verbosity > 0:
            print(f"final cost={self.final_cost():.16f}")
        if self.state.collect_kernel_timing:
            self.timer.evaluate()

    Step = step

    def _pick_engine(self, engine):
        """Resolve engine="auto" to the measured-best path for this plan:
        f32 grids that fit the whole-solve VMEM budget (>= 256^2, GN and
        LM) route to the VMEM kernel on TPU (1.5-3.6x over fused XLA,
        docs/sweep_tpu_r5.csv); grids past the XLA VMEM-carry regime
        (~>=2048^2 pixels, docs/ROOFLINE.md) route to the streamed HBM
        engine when eligible -- GN via the pipelined kernel (2048^2
        1.9x / 4096^2 2.4x over XLA) and LM via the classic kernel
        (2048^2 LM: stream 1285.6 ms vs XLA 3041.9 ms, 2.37x,
        docs/sweep_tpu_r3.csv); everything else stays on the fused XLA
        program.  OPT_TPU_ENGINE overrides the auto choice (ops escape
        hatch, like OPT_TPU_GRAPH_MODE for the graph engine)."""
        if engine == "auto":
            import os

            engine = os.environ.get("OPT_TPU_ENGINE", "auto")
        if engine != "auto":
            return engine
        if self.spec.graphs or not self.spec.images:
            return "xla"
        shape = next(iter(self.spec.images.values())).ispace.shape
        if len(shape) == 3:
            # volumetric grids: the two-axis-tiled 3-D streamed engine
            # measured faster than fused XLA at every volume tried --
            # GN 64^3 1.19x / 128^3 2.67x, LM 64^3 1.20x / 128^3 2.58x
            # (docs/sweep_tpu_r3.csv); past 128^3 it is the ONLY path
            # (the fused XLA program OOMs HBM at compile, 19.2 GB at
            # 192^3).
            from ..ops import stream3d

            if (np.prod(shape) >= stream3d.AUTO_STREAM3D_MIN_VOXELS
                    and stream3d.supports3d(self)):
                return "stream3d"
            return "xla"
        if len(shape) != 2:
            return "xla"
        # mid-size grids: the whole-solve-in-VMEM kernel measured 2.2x
        # (256^2 GN) / 1.9x (512^2 GN flagship) / 3.6x (512^2 LM 8x400)
        # over fused XLA on v5e (docs/sweep_tpu_r5.csv) once the
        # scoped-vmem limit was raised to 112 MB; the budget model
        # gates size.  Checked BEFORE the streamed HBM engine: at the
        # sizes where both are eligible (LM >= 512^2) vmem wins
        # outright (60.6 ms for 8x400 vs the stream's 91.7 ms for
        # 8x100 at 512^2, sweep r5 vs r3).  TPU only (interpret mode
        # would crawl at these grids); solve() falls back to xla if
        # the kernel fails past the model's estimate.
        from ..ops import vmem_solver

        if (self.funcs.dtype == jnp.float32
                and shape[0] * shape[1] >= vmem_solver.AUTO_VMEM_MIN_PIXELS
                and jax.default_backend() == "tpu"
                and vmem_solver.supports(self)):
            return "vmem"
        from ..ops import stream_solver

        min_px = (stream_solver.AUTO_STREAM_MIN_PIXELS_LM
                  if self.config.uses_lambda
                  else stream_solver.AUTO_STREAM_MIN_PIXELS)
        if (shape[0] * shape[1] >= min_px
                and stream_solver.supports_hbm(self)):
            return "stream_hbm"
        return "xla"

    def solve(self, inputs, on_device=True, engine="auto",
              donate_inputs=False, mesh=None):
        """Opt_ProblemSolve: full solve.  on_device=True runs the whole
        outer loop inside one XLA program (no per-iteration host sync --
        the reference cannot do this; solverGPUGaussNewton.t syncs every
        reduction read).

        mesh: optional jax.sharding.Mesh -- the solve shards over it
        through the measured-best multi-chip path for this plan
        (parallel/dispatch.py: GSPMD for graphs and small grids,
        per-shard streamed Pallas engines past the streamed crossovers),
        the one-flag backend selection of the reference (Opt.h:23-25)
        applied to meshes.  Single-chip engine names are accepted as
        aliases ("xla"->"gspmd", "stream_hbm"->"stream"); "halo",
        "gspmd", "stream", "stream3d" select a sharded path explicitly.

        engine="vmem" runs the entire solve inside one Pallas kernel with
        all state VMEM-resident (opt_tpu/ops/vmem_solver.py) -- fastest
        for grid problems that fit on-chip; engine="stream_hbm" runs the
        fully-streamed tiled PCG engine for larger-than-VMEM grids
        (opt_tpu/ops/stream_solver.StreamSolverHBM); engine="stream3d"
        its two-axis-tiled 3-D counterpart for volumetric grids
        (opt_tpu/ops/stream3d.StreamSolver3D, GN and LM).  All fall
        back to "xla" when unsupported.  The default "auto" picks
        -- on TPU -- vmem for f32 grids in [256^2, budget], GN and LM
        alike (GN 2.2x/1.9x at 256^2/512^2, LM 3.6x at 512^2 8x400,
        docs/sweep_tpu_r5.csv; falls back to xla if the kernel fails
        past the budget model's estimate), then stream_hbm for
        eligible larger 2-D grids (GN >= 2048^2, LM >= 512^2) and
        stream3d for volumes >= 64^3 (GN and LM), where each measured
        1.2-2.7x over the XLA path on v5e (docs/sweep_tpu_r3.csv,
        r5)."""
        if mesh is not None:
            from ..parallel.dispatch import solve_sharded_auto

            with self.timer.event("solve"):
                cost = solve_sharded_auto(self, inputs, mesh,
                                          engine=engine)
            if self.state.verbosity > 0:
                print(f"final cost={cost:.16f}")
            return cost
        engine = self._pick_engine(engine)
        if engine in ("vmem", "stream_hbm", "stream3d"):
            from ..ops import stream_solver, vmem_solver

            vs = None
            if engine == "vmem" and vmem_solver.supports(self):
                vs = vmem_solver.VmemSolver(self)
            elif engine == "stream_hbm" and stream_solver.supports_hbm(
                self
            ):
                vs = stream_solver.StreamSolverHBM(self)
            elif engine == "stream3d":
                from ..ops import stream3d

                if stream3d.supports3d(self):
                    vs = stream3d.StreamSolver3D(self)
            if vs is not None:
                # release the previous solve's device state BEFORE
                # binding fresh inputs: at HBM-capacity-bound sizes
                # (8192^2 LM) a held prior x + re-bound data (~2 GB)
                # pushed the second solve over the allocator limit
                # (measured RESOURCE_EXHAUSTED on v5e, round 3)
                self._state = None
                self._data = None
                try:
                    if donate_inputs and not isinstance(
                            vs, vmem_solver.VmemSolver):
                        # caller relinquishes device-array inputs:
                        # donated without the defensive copy (saves
                        # their full footprint -- 8192^2 LM does not
                        # fit otherwise).  current_cost()/load_state()
                        # then need init() with fresh inputs (the
                        # donated ones are consumed).
                        out = vs.solve(inputs, donate_inputs=True)
                        self._data_inputs = None
                    else:
                        out = vs.solve(inputs)
                        # bind LAZILY for later current_cost()/
                        # load_state(): an eager re-bind here
                        # transferred the full input set host->device a
                        # SECOND time per solve -- at 8192^2 that is
                        # ~2 GB through the relay, which dominated the
                        # measured LM outer intercept
                        # (docs/ROUND3_TODO.md #12)
                        self._data_inputs = inputs
                except Exception as e:
                    if not isinstance(vs, vmem_solver.VmemSolver):
                        raise
                    # the vmem budget is a MODEL of Mosaic's stack
                    # allocation: past-the-model energies fail at
                    # compile; fall back to the fused XLA program so
                    # auto-routing never breaks a previously-working
                    # solve
                    import warnings

                    warnings.warn(
                        "vmem engine failed; falling back to xla: "
                        f"{e!r:.160}")
                    out = None
                if out is not None:
                    self._state = {
                        "x": out["x"],
                        "prev_cost": jnp.asarray(out["final_cost"],
                                                 self.state.dtype),
                        "radius": jnp.asarray(
                            self.solver_params["trust_region_radius"],
                            self.state.dtype),
                        "decrease_f": jnp.asarray(
                            self.solver_params["radius_decrease_factor"],
                            self.state.dtype),
                        "ssq": jax.tree_util.tree_map(jnp.ones_like,
                                                      out["x"]),
                        "n_iter": jnp.asarray(
                            int(self.solver_params["nIterations"]),
                            jnp.int32),
                        "done": jnp.asarray(True),
                    }
                    if self.state.verbosity > 0:
                        print(f"final cost={out['final_cost']:.16f}")
                    return out["final_cost"]

        x, data = self.bind(inputs)
        self._data = data
        sp = self._sp_device()
        if on_device:
            with self.timer.event("solve"):
                sp_full = dict(sp)
                sp_full["nIterations"] = jnp.asarray(
                    int(self.solver_params["nIterations"]), jnp.int32
                )
                self._state = self._full_solve_fn(x, data, sp_full)
                jax.block_until_ready(self._state)
        else:
            self.init(inputs)
            while self.step():
                pass
        if self.state.verbosity > 0:
            print(f"final cost={self.final_cost():.16f}")
        return self.final_cost()

    Solve = solve

    def solve_many(self, inputs_list, mesh=None, mode="auto"):
        """Batched multi-problem solve: N instances of this plan's
        problem (same shapes, independent data) solved in ONE dispatch
        via jax.vmap over the whole jitted outer loop.

        A TPU-native throughput mode with no reference equivalent: the
        reference launches one kernel sequence per Opt_ProblemSolve call
        (Opt.h:58), so N problems pay N dispatch sequences; here one
        program solves the whole batch, amortizing the fixed dispatch
        cost and filling the chip for small grids.  lax.while_loop under
        vmap masks per-lane carries, so LM's per-problem early exits
        (done flag / trust-region state) keep their exact
        single-problem semantics per lane.

        mode: "auto" (default) routes grid batches whose total
        batch x pixels exceeds the measured win region back to the
        sequential solo loop -- batching LOSES once the batched PCG
        carries exceed VMEM residency while a solo solve's still fit
        (512^2 x 8 batched = 0.53x solo, vs 2.35x at 128^2 x 64 and
        1.17x at 256^2 x 16, docs/sweep_tpu_r3.csv) -- so callers never
        silently land in the losing regime.  "batched"/"solo" force a
        path.  Both paths return the same list of costs and leave the
        same stacked _batched_state.  Solo lanes themselves take the
        measured-best single-chip engine: on TPU at vmem-eligible
        sizes each lane runs the whole-solve VMEM kernel (1.5-3.6x
        per lane over the fused XLA program, docs/sweep_tpu_r5.csv),
        with the usual fallback.

        mesh: optional jax.sharding.Mesh -- the batch axis is sharded
        across every mesh axis (data-parallel serving: each device
        solves its share of problems with no cross-chip communication).
        N must be a multiple of the mesh size.  With a mesh the
        guardrail applies to the PER-DEVICE share (N/mesh-size x
        pixels): the losing regime is per-chip VMEM residency, so
        sharding N ways buys N x more headroom.  A batch whose
        per-device share still exceeds the threshold falls back to the
        sequential solo loop (on the default device -- the mesh is not
        used there); force mode="batched" to override.

        Graph problems batch in take-mode (gathers/segment_sums vmap
        over per-lane edge indices, so lanes may have DIFFERENT
        topologies); banding is plan-level, so the banded MXU engine is
        never used here -- for one big graph, shard it spatially via
        plan.solve(mesh=...) instead.  Returns a list of final costs;
        the batched unknowns stay on device in self._batched_state
        ("x" has a leading batch axis; use batch_unknowns(i) to fetch
        one problem's solution).
        """
        if mode not in ("auto", "batched", "solo"):
            raise ValueError(f"mode must be auto/batched/solo: {mode!r}")
        if not inputs_list:
            return []
        sp = dict(self._sp_device())
        sp["nIterations"] = jnp.asarray(
            int(self.solver_params["nIterations"]), jnp.int32
        )
        if mode == "auto" and self.spec.images:
            px = int(np.prod(
                next(iter(self.spec.images.values())).ispace.shape))
            n_dev = (int(np.prod(list(mesh.shape.values())))
                     if mesh is not None else 1)
            per_dev = -(-len(inputs_list) // n_dev)
            if per_dev * px > SOLVE_MANY_AUTO_MAX_PIXELS:
                mode = "solo"
        if mode == "solo":
            stack = lambda *ls: jnp.stack([jnp.asarray(l) for l in ls])
            # each lane takes the measured-best single-chip engine: the
            # solo loop exists precisely at sizes PAST the batching win
            # region, which are the whole-solve VMEM kernel's sizes
            # (1.5-3.6x per lane over the fused XLA program on TPU,
            # docs/sweep_tpu_r5.csv); same XLA fallback as Plan.solve
            eng = None
            if self._pick_engine("auto") == "vmem":
                from ..ops import vmem_solver

                eng = vmem_solver.VmemSolver(self)
            sts = []
            with self.timer.event("solve_many"):
                if eng is not None:
                    try:
                        for i in inputs_list:
                            out = eng.solve(i)
                            sts.append({
                                "x": out["x"],
                                "prev_cost": jnp.asarray(
                                    out["final_cost"], self.state.dtype),
                            })
                    except Exception as e:
                        import warnings

                        warnings.warn(
                            "vmem solo lanes failed; falling back to "
                            f"xla: {e!r:.160}")
                        sts = []
                if not sts:
                    for i in inputs_list:
                        x, d = self.bind(i, graph_mode="take")
                        sts.append(self._full_solve_fn(x, d, sp))
                jax.block_until_ready(sts)
            st = jax.tree_util.tree_map(stack, *sts)
            self._batched_state = st
            costs = [float(c) for c in np.asarray(st["prev_cost"])]
            if self.state.verbosity > 0:
                for c in costs:
                    print(f"final cost={c:.16f}")
            return costs
        # take-mode binds: graph_indices are per-lane data (vmapped
        # gathers), so lanes may differ in topology; banded layouts are
        # plan-level and cannot batch
        binds = [self.bind(i, graph_mode="take") for i in inputs_list]
        stack = lambda *ls: jnp.stack([jnp.asarray(l) for l in ls])
        xs = jax.tree_util.tree_map(stack, *[b[0] for b in binds])
        ds = jax.tree_util.tree_map(stack, *[b[1] for b in binds])
        if getattr(self, "_solve_many_fn", None) is None:
            self._solve_many_fn = jax.jit(
                jax.vmap(self.raw_full_solve_fn, in_axes=(0, 0, None))
            )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = int(np.prod(list(mesh.shape.values())))
            if len(inputs_list) % n_dev:
                raise ValueError(
                    f"solve_many batch ({len(inputs_list)}) must be a "
                    f"multiple of the mesh size ({n_dev})"
                )
            sh = NamedSharding(mesh, P(tuple(mesh.axis_names)))
            put = lambda a: jax.device_put(a, sh)
            xs = jax.tree_util.tree_map(put, xs)
            ds = jax.tree_util.tree_map(put, ds)
        with self.timer.event("solve_many"):
            st = self._solve_many_fn(xs, ds, sp)
            jax.block_until_ready(st)
        self._batched_state = st
        costs = [float(c) for c in np.asarray(st["prev_cost"])]
        if self.state.verbosity > 0:
            for c in costs:
                print(f"final cost={c:.16f}")
        return costs

    def batch_unknowns(self, i):
        """Unknowns of problem i from the last solve_many batch."""
        st = getattr(self, "_batched_state", None)
        assert st is not None, "call solve_many() first"
        return {
            name: np.asarray(v[i]) for name, v in st["x"].items()
        }

    # -- results ------------------------------------------------------------------

    def _ensure_data(self):
        """Bind the deferred engine-solve inputs on first use (see
        Plan.solve's lazy `_data_inputs`)."""
        if self._data is None and getattr(self, "_data_inputs",
                                          None) is not None:
            _, self._data = self.bind(self._data_inputs)
            self._data_inputs = None
        return self._data

    def current_cost(self):
        assert self._state is not None
        return float(self._cost_fn(self._state, self._ensure_data()))

    CurrentCost = current_cost

    def final_cost(self):
        """The cost the reference prints as 'final cost=' (prevCost,
        solverGPUGaussNewton.t:1903): cost after the last accepted update."""
        assert self._state is not None
        return float(self._state["prev_cost"])

    def unknowns(self):
        assert self._state is not None
        out = {}
        for k, v in self._state["x"].items():
            arr = np.asarray(v)
            if self._active_banding:
                # banded binds permute vertex arrays (RCM); undo at the
                # user-facing boundary
                vb = self._active_banding.get(
                    self.spec.images[k].ispace.key()
                )
                if vb is not None:
                    arr = arr[vb.inv_perm]
            out[k] = arr
        return out

    # -- checkpoint / resume ----------------------------------------------------
    # The reference's only resumability is the Init/Step split plus LM's
    # prevX rollback (SURVEY §5); here the full solver state (unknowns,
    # published cost, trust region, SSq, iteration counter) round-trips
    # through a single .npz, so a solve can resume across processes.

    def save_state(self, path):
        assert self._state is not None, "nothing to save; call init() first"
        flat = {}
        for k, v in self._state.items():
            if isinstance(v, dict):
                for n, arr in v.items():
                    flat[f"{k}.{n}"] = np.asarray(arr)
            else:
                flat[k] = np.asarray(v)
        np.savez(path, **flat)

    def load_state(self, path):
        assert self._ensure_data() is not None, (
            "bind data first (init or solve)")
        loaded = np.load(path)
        dtype = self.funcs.dtype
        state = {"x": {}, "ssq": {}}
        for key in loaded.files:
            arr = loaded[key]
            if np.issubdtype(arr.dtype, np.floating):
                # Cast to the plan precision so a checkpoint written by a
                # float64 plan loads cleanly into a float32 plan (and vice
                # versa) instead of recompiling the step with mixed dtypes.
                arr = arr.astype(dtype)
            if "." in key:
                group, name = key.split(".", 1)
                state.setdefault(group, {})[name] = jnp.asarray(arr)
            else:
                state[key] = jnp.asarray(arr)
        for name, shape in self.funcs.unknown_shapes.items():
            got = state["x"].get(name)
            if got is None:
                raise ValueError(
                    f"{path}: checkpoint missing unknown {name!r}"
                )
            if tuple(got.shape) != tuple(shape):
                raise ValueError(
                    f"{path}: unknown {name!r} shape {tuple(got.shape)} "
                    f"does not match plan shape {tuple(shape)} -- "
                    "checkpoint is from a different problem size"
                )
        for key in ("prev_cost", "n_iter", "done"):
            if key not in state:
                raise ValueError(f"{path}: checkpoint missing {key!r}")
        self._state = state
        self._cleaned = False
        return self

    @property
    def x(self):
        return self._state["x"]
