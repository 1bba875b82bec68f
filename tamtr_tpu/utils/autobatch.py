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


def autobatch_train(
    model,
    loss_callable,
    train_cfg,
    nc: int,
    imgsz: int,
    max_gt: int,
    text_dim: int = 512,
    fraction: float = DEFAULT_FRACTION,
    max_batch: int = 64,
    default: int = 4,
) -> int:
    """Fit the batch to the REAL jitted train step's peak memory.

    The reference profiles forward+backward in train mode
    (`utils/autobatch.py` + `profile()`); probing only the eval forward
    under-estimates peak HBM several-fold (remat'ed activation temps +
    flat optimizer state) and the fitted batch then OOMs the train step.
    Builds an abstract TrainState (ShapeDtypeStructs; nothing allocated)
    and AOT-compiles the actual `make_train_step` function per batch.
    """
    import jax.numpy as jnp
    import numpy as np

    from tamtr_tpu.train.trainer import (
        FlatOptState,
        TrainState,
        make_optimizer,
        make_train_step,
        unravel_for,
    )

    if device_memory_bytes() is None:
        return default

    rngs = {
        "params": jax.random.PRNGKey(0),
        "cdn": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }

    def _batch_shapes(b: int):
        sds = lambda sh, dt=jnp.float32: jax.ShapeDtypeStruct(sh, dt)
        return {
            "img": sds((b, imgsz, imgsz, 3)),
            "txt_feats": sds((b, max(nc, 1), text_dim)),
            "cls": sds((b, max_gt), jnp.int32),
            "bboxes": sds((b, max_gt, 4)),
            "mask": sds((b, max_gt), jnp.bool_),
        }

    bs1 = _batch_shapes(1)
    shapes = jax.eval_shape(
        lambda: model.init(
            rngs,
            jnp.zeros((1, imgsz, imgsz, 3)),
            jnp.zeros((1, max(nc, 1), text_dim)),
            {
                "cls": jnp.zeros((1, max_gt), jnp.int32),
                "bboxes": jnp.full((1, max_gt, 4), 0.5),
                "mask": jnp.zeros((1, max_gt), bool),
            },
            True,
        )
    )
    params_sds = shapes["params"]
    batch_stats_sds = shapes.get("batch_stats", {})
    leaves = jax.tree_util.tree_leaves(params_sds)
    from tamtr_tpu.train.trainer import padded_size

    P = padded_size(int(sum(np.prod(l.shape) for l in leaves)))
    flat = jax.ShapeDtypeStruct((P,), jnp.float32)
    flatb = jax.ShapeDtypeStruct((P,), jnp.bool_)
    scalar_i = jax.ShapeDtypeStruct((), jnp.int32)
    opt_sds = FlatOptState(scalar_i, scalar_i, scalar_i, flat, flat, flat, flatb, flatb)
    state_sds = TrainState(
        step=scalar_i, params=flat, batch_stats=batch_stats_sds, opt_state=opt_sds,
        ema_params=flat, ema_batch_stats=batch_stats_sds, unravel=unravel_for(params_sds),
    )
    tx = make_optimizer(train_cfg, params_sds, steps_per_epoch=100)
    step_fn = make_train_step(model, tx, None, train_cfg, loss_callable=loss_callable)

    def make_args(b: int):
        return (state_sds, _batch_shapes(b), jax.random.PRNGKey(3))

    return autobatch(
        step_fn, make_args, fraction=fraction, max_batch=max_batch, default=default
    )


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
