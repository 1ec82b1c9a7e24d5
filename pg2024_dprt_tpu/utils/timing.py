"""Wall-clock section timing with the reference's section taxonomy.

Mirrors the reference `Timing`/`TimedSection` instrumentation (sections
bracketing scan/MPI/NN/sample time, e.g.
/root/reference/src/render/renderer.cpp:1245-1283, 2024-2025) as
`jax.block_until_ready`-fenced host timers. Use `jax.profiler` for deep traces;
this covers the always-on counters the reference prints.
"""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from enum import Enum

import jax


class TimedSection(Enum):
    Sample = "Sample"
    Traversal = "Traversal"
    Scan = "Scan"
    Transfer = "Transfer"          # reference "Transfer:" (MPI alltoallv)
    VisNNTime = "VisNNTime"        # reference renderer.cpp:921
    DepthNNTime = "DepthNNTime"    # reference renderer.cpp:968
    Shade = "Shade"
    Shadow = "Shadow"
    Secondary = "Secondary"


class Timing:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextmanager
    def section(self, name, sync_value=None):
        key = name.value if isinstance(name, TimedSection) else str(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                jax.block_until_ready(sync_value)
            dt = time.perf_counter() - t0
            self.totals[key] += dt
            self.counts[key] += 1

    def report(self) -> str:
        lines = []
        for key in sorted(self.totals):
            lines.append(
                f"{key}: {self.totals[key] * 1e3:.2f} ms over {self.counts[key]} calls"
            )
        return "\n".join(lines)
