"""Tracing and per-phase timing.

The reference has NO profiling of any kind (SURVEY.md §5 — tqdm bars only).
Here: a phase timer that aggregates wall-clock per pipeline stage (init_GS /
densify / svd / refine), a device-sync-aware timing context, and a wrapper
around jax.profiler for on-demand XLA traces viewable in xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Optional


class PhaseTimer:
    """Aggregates wall time per named phase; json-serializable summary."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                import jax
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        return {k: {"total_s": round(v, 3), "count": self.counts[k],
                    "mean_s": round(v / max(self.counts[k], 1), 4)}
                for k, v in sorted(self.totals.items())}

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)


@contextlib.contextmanager
def xla_trace(log_dir: str = "/tmp/jax_trace",
              host_tracer_level: int = 2):
    """Capture an XLA/device trace for xprof (jax.profiler wrapper)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Optional[dict]:
    """Live HBM stats where the backend exposes them."""
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats()
        return {k: stats[k] for k in ("bytes_in_use", "peak_bytes_in_use",
                                      "bytes_limit") if k in stats}
    except Exception:
        return None


GLOBAL_TIMER = PhaseTimer()
