"""Per-phase timing with the reference's aggregated-report contract.

The reference's Timer aggregates (count, total, average) per kernel name and
prints a table plus a machine-parseable TIMING line (reference:
API/src/backend_cpu.t:202-312, backend_cuda.t:152-299).  Kernel launches
here are fused XLA executables, so the named units are solver phases
(init / step_N / solve / cost) rather than individual kernels.
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class KernelTimer:
    def __init__(self, enabled=True):
        self.enabled = enabled
        self.records = {}  # name -> [count, total_ms]
        self.order = []

    @contextmanager
    def event(self, name):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            ms = (time.perf_counter() - t0) * 1e3
            rec = self.records.get(name)
            if rec is None:
                self.records[name] = [1, ms]
                self.order.append(name)
            else:
                rec[0] += 1
                rec[1] += ms

    def evaluate(self, out=print):
        """Print the aggregated table (backend_cpu.t:245-312 format)."""
        if not self.records:
            return
        out("--------------------------------------------------------")
        out(f"{'Kernel':<40}{'Count':>8}{'Total(ms)':>12}{'Average(ms)':>14}")
        out("--------------------------------------------------------")
        total = 0.0
        for name in self.order:
            c, t = self.records[name]
            out(f"{name:<40}{c:>8}{t:>12.3f}{t / c:>14.4f}")
            total += t
        out("--------------------------------------------------------")
        steps = [n for n in self.order if n.startswith("step_")]
        overall = sum(self.records[n][1] for n in steps)
        out(
            "TIMING "
            + " ".join(
                f"{name}={self.records[name][1]:.3f}" for name in self.order
            )
        )
        if steps:
            out(
                f"Per-iter times ms (nonlinear): {overall / len(steps):.3f}"
            )
