"""Profiling helpers (reference §5.1: Profile timers, FLOPs counters).

- `Profile`: host-side stage timer (the reference wraps preprocess /
  inference / postprocess with it in validator/predictor).
- `flops_of`: XLA's own cost analysis of a jitted function — the TPU
  replacement for thop/fvcore FLOPs counting.
- `trace`: wraps `jax.profiler.trace` when the backend supports it.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional


class Profile(contextlib.ContextDecorator):
    """Accumulating timer: `with profile: ...`; `profile.t` total seconds."""

    def __init__(self) -> None:
        self.t = 0.0
        self.n = 0

    def __enter__(self) -> "Profile":
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.t += time.perf_counter() - self._start
        self.n += 1

    @property
    def ms_per_call(self) -> float:
        return 1e3 * self.t / max(self.n, 1)


def flops_of(fn: Callable, *args: Any, **kwargs: Any) -> Optional[Dict[str, float]]:
    """Compile `fn` and return XLA cost analysis (flops, bytes accessed)."""
    import jax

    try:
        lowered = jax.jit(fn).lower(*args, **kwargs)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return {
            "gflops": float(cost.get("flops", 0)) / 1e9,
            "gbytes": float(cost.get("bytes accessed", 0)) / 1e9,
        }
    except Exception:
        return None


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace (may be unsupported on tunneled runtimes)."""
    import jax

    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception:
        yield
