"""Automatic batch-size fit from device memory (reference `utils/autobatch.py`).

The reference polyfits CUDA memory over probe batches and solves for the
batch that uses ~60% of the card. The TPU-native equivalent is exact
instead of empirical: XLA's compile-time `memory_analysis()` reports the
peak HBM bytes of the compiled train step for a candidate batch, without
running (or even allocating) anything. We compile two probe sizes, fit the
affine model peak(b) = c0 + c1*b, and solve for the target fraction.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax

from tamtr_tpu.utils.log import LOGGER

DEFAULT_FRACTION = 0.60  # reference default CUDA fraction


def device_memory_bytes(device=None) -> Optional[int]:
    """Total accelerator memory, or None when unknown (CPU backend)."""
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"])
    # v5e default when the runtime exposes no stats (axon tunnel)
    if d.platform == "tpu":
        return 16 * 1024**3
    return None


def compiled_peak_bytes(step_fn: Callable, make_args: Callable[[int], tuple], batch: int) -> Optional[int]:
    """Peak HBM of `jit(step_fn)` at the given batch, from AOT analysis."""
    try:
        lowered = jax.jit(step_fn).lower(*make_args(batch))
        mem = lowered.compile().memory_analysis()
        if mem is None:
            return None
        total = (
            getattr(mem, "temp_size_in_bytes", 0)
            + getattr(mem, "argument_size_in_bytes", 0)
            + getattr(mem, "output_size_in_bytes", 0)
            + getattr(mem, "generated_code_size_in_bytes", 0)
        )
        return int(total) or None
    except Exception as e:  # pragma: no cover - backend-specific
        LOGGER.warning(f"autobatch: memory analysis failed ({e})")
        return None


def autobatch(
    step_fn: Callable,
    make_args: Callable[[int], tuple],
    fraction: float = DEFAULT_FRACTION,
    max_batch: int = 64,
    default: int = 4,
) -> int:
    """Largest batch whose compiled peak fits `fraction` of device memory.

    step_fn: the train step (params..., batch) to be jitted; make_args(b)
    builds example args at batch b. Returns `default` when analysis is
    unavailable (e.g. CPU tests).
    """
    limit = device_memory_bytes()
    if limit is None:
        return default
    b0, b1 = 1, 2
    m0 = compiled_peak_bytes(step_fn, make_args, b0)
    m1 = compiled_peak_bytes(step_fn, make_args, b1)
    if not m0 or not m1 or m1 <= m0:
        return default
    per_item = m1 - m0
    fixed = m0 - per_item * b0
    budget = fraction * limit
    fit = int((budget - fixed) // per_item)
    fit = max(1, min(fit, max_batch))
    LOGGER.info(
        f"autobatch: peak(b)~{fixed / 1e9:.2f}GB + {per_item / 1e9:.2f}GB/img; "
        f"{fraction:.0%} of {limit / 1e9:.1f}GB -> batch {fit}"
    )
    return fit
