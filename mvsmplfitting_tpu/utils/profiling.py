"""Profiling and structured metrics.

The reference's only instrumentation is wall-clock prints guarded by
`torch.cuda.synchronize()` (`non_linear_solver.py:194-211`,
`main.py:91-94`).  Here timing is a first-class benchmark mode:
device-synchronized stage timers, JAX profiler traces on demand, and a
structured metrics sink (JSON lines) instead of stdout scraping.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class StageTimer:
    """Device-synchronized named timers."""

    timings: Dict[str, List[float]] = field(default_factory=dict)

    @contextlib.contextmanager
    def time(self, name: str, sync_value=None):
        """Context manager; pass a jax array as `sync_value` to block
        on device completion before stopping the clock."""
        import jax

        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            v = box.get("sync", sync_value)
            if v is not None:
                jax.block_until_ready(v)
            self.timings.setdefault(name, []).append(
                time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        return {k: sum(v) / len(v) for k, v in self.timings.items() if v}


@contextlib.contextmanager
def trace_profile(log_dir: Optional[str]):
    """JAX profiler trace when `log_dir` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Metrics:
    """Append-only JSON-lines metrics sink."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, **kv) -> None:
        kv.setdefault("ts", time.time())
        line = json.dumps(kv, default=float)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        else:
            print(line)


def set_seed(seed: int = 0):
    """Determinism helper (`module_utils.py:51-63` analogue): returns a
    jax PRNG key; numpy seeded for host-side code."""
    import numpy as np

    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)
