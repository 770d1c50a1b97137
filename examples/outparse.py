"""Parse example/solver output for plots and experiment sweeps.

Clean-room analogue of the reference's output-parsing helpers
(reference: examples/outParse.py regex extractors over the timing table,
examples/TimingInfo.py pyparsing table model): extract the aggregated
per-phase timing table printed by `KernelTimer.evaluate`
(opt_tpu/runtime/timing.py), the machine-parseable `TIMING` line, the
`final cost=%.16f` lines, and the per-iteration summary.

Usage:
    from outparse import parse_output
    info = parse_output(captured_stdout)
    info.total_ms("step_0"); info.average_ms("solve"); info.final_costs
"""

from __future__ import annotations

import re


_ROW = re.compile(
    r"^(?P<name>\S[^|]*?)\s+(?P<count>\d+)\s+(?P<total>[\d.]+)"
    r"\s+(?P<avg>[\d.]+)\s*$",
    re.M,
)
_TIMING = re.compile(r"^TIMING (?P<pairs>.*)$", re.M)
_COST = re.compile(r"^final cost=(?P<cost>[-\d.eE+]+)\s*$", re.M)
_PER_ITER = re.compile(
    r"^Per-iter times ms \(nonlinear\): (?P<ms>[\d.]+)\s*$", re.M
)


class OutputInfo:
    """Parsed view of one example run's stdout."""

    def __init__(self, rows, timing, final_costs, per_iter_ms):
        # rows: name -> (count, total_ms, average_ms), in table order
        self.rows = rows
        self.timing = timing        # name -> total_ms from the TIMING line
        self.final_costs = final_costs
        self.per_iter_ms = per_iter_ms

    def kernel_names(self):
        return list(self.rows)

    def count(self, name):
        return self.rows[name][0]

    def total_ms(self, name):
        return self.rows[name][1]

    def average_ms(self, name):
        return self.rows[name][2]

    def overall_ms(self):
        """Total across all phases (the reference's 'overall' row role)."""
        return sum(t for _, t, _ in self.rows.values())

    @property
    def final_cost(self):
        """The LAST final-cost line (the solve that finished last)."""
        if not self.final_costs:
            raise ValueError("no 'final cost=' line in output")
        return self.final_costs[-1]


def parse_output(output):
    rows = {}
    in_table = False
    for line in output.splitlines():
        if line.startswith("Kernel") and "Count" in line:
            in_table = True
            continue
        if not in_table:
            continue
        if line.strip() and set(line.strip()) == {"-"}:
            if rows:          # closing rule of the table
                in_table = False
            continue
        m = _ROW.match(line)
        if m:
            rows[m.group("name").strip()] = (
                int(m.group("count")),
                float(m.group("total")),
                float(m.group("avg")),
            )
        elif line.strip():
            in_table = False

    timing = {}
    m = _TIMING.search(output)
    if m:
        for pair in m.group("pairs").split():
            if "=" in pair:
                k, v = pair.rsplit("=", 1)
                try:
                    timing[k] = float(v)
                except ValueError:
                    continue  # tolerate truncated/garbled pairs

    final_costs = [float(c) for c in _COST.findall(output)]
    m = _PER_ITER.search(output)
    per_iter_ms = float(m.group("ms")) if m else None
    return OutputInfo(rows, timing, final_costs, per_iter_ms)


def get_overall_time(output):
    """Total ms across all timed phases (outParse.getOverallTimeFromOutput
    role)."""
    return parse_output(output).overall_ms()


def get_named_total_time(name, output):
    return parse_output(output).total_ms(name)


def get_named_average_time(name, output):
    return parse_output(output).average_ms(name)


def get_final_cost(output):
    return parse_output(output).final_cost
