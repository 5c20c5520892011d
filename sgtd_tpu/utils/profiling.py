"""Stage timing + device profiling.

Replaces the reference's manual std::chrono spans (per-frame
Graph / STD build / Search / GICP breakdown printed at
semantic_graph_localization.cpp:777, CS1 at STDesc.cpp:455, per-stage time
vectors saved via saveVectorToFile — SURVEY.md aux 1). The same stage
taxonomy is kept for comparability:

  SGC — semantic graph construction (clustering + node extraction)
  STD — triangle descriptor build
  CS1 — candidate search (probe + vote)
  PE  — pose estimation (verification + refinement)
  VM  — full per-query pipeline (matches the reference's VM_time)

``device_trace`` wraps ``jax.profiler.trace`` for XLA-level traces viewable
in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import numpy as np

STAGES = ("SGC", "STD", "CS1", "PE", "VM", "GICP", "PGO")


class StageTimers:
    """Accumulates wall-clock spans per stage; reference-style summary."""

    def __init__(self):
        self.samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        """Time a stage. Pass ``sync=jax.block_until_ready`` style callable
        applied to the block's result holder when device work must settle."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append((time.perf_counter() - t0) * 1000.0)

    def add(self, name: str, ms: float):
        self.samples[name].append(ms)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            a = np.asarray(xs)
            out[name] = {
                "count": int(a.size),
                "mean_ms": float(a.mean()),
                "p50_ms": float(np.percentile(a, 50)),
                "p95_ms": float(np.percentile(a, 95)),
                "total_ms": float(a.sum()),
            }
        return out

    def report(self) -> str:
        lines = []
        for name in list(STAGES) + sorted(
            set(self.samples) - set(STAGES)
        ):
            if name not in self.samples:
                continue
            s = self.summary()[name]
            lines.append(
                f"{name:>5}: n={s['count']:<5d} mean={s['mean_ms']:8.2f}ms "
                f"p50={s['p50_ms']:8.2f}ms p95={s['p95_ms']:8.2f}ms"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """XLA profiler trace (TensorBoard/Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
