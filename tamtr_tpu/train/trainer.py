"""Training state, optimizer schedule, EMA, and the jit/pjit train step.

Optimizer semantics replicate the reference recipe
(`engine/trainer.py:624-681, 268-341`, `cfg/default.yaml`):

- AdamW lr0=1e-4, betas=(momentum, 0.999) with momentum=0.937, weight decay
  1e-4 scaled by bs * accumulate / nbs (nbs=64), applied only to
  non-bias/non-norm weights (the reference's three param groups).
- Linear warmup over `warmup_iters` *iterations* (the reference reads
  `warmup_epochs: 2000` as an iteration count, `trainer.py:296`): weights/norm
  groups ramp 0 -> lr, bias group ramps warmup_bias_lr=0.1 -> lr.
- Main schedule `lf(e) = (1 - e/epochs) * (1 - lrf) + lrf`; TAM-TR ships
  lrf=1.0 => constant LR after warmup.
- Gradient clipping at global-norm 10.0 (`trainer.py:471-479`).
- EMA with decay 0.9999 * (1 - exp(-t / 2000)) over params AND batch stats
  (`utils/torch_utils.py:392-425`); validation/checkpoints use the EMA.

The reference's `loss *= world_size` DDP hack + per-rank sum collapses to a
plain global-batch sum under pjit: the loss is summed over the (sharded)
batch axis, so gradients equal the single-process reference exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from tamtr_tpu.losses.detr_loss import DETRLossConfig, rtdetr_detection_loss


@dataclass(frozen=True)
class TrainConfig:
    lr0: float = 1e-4
    lrf: float = 1.0
    momentum: float = 0.937  # Adam beta1
    weight_decay: float = 1e-4
    warmup_iters: int = 2000
    warmup_bias_lr: float = 0.1
    epochs: int = 300
    batch_size: int = 6
    nbs: int = 64  # nominal batch size for wd scaling
    accumulate: int = 0  # 0 => round(nbs / batch_size)
    grad_clip: float = 10.0
    ema_decay: float = 0.9999
    ema_tau: float = 2000.0
    match_method: str = "auto"
    # skip the optimizer/EMA update when loss or grads are non-finite
    # (the reference has no guard and relies on AMP checks, SURVEY §5.2)
    skip_nonfinite: bool = True

    @property
    def accum_steps(self) -> int:
        return self.accumulate or max(round(self.nbs / self.batch_size), 1)

    @property
    def scaled_wd(self) -> float:
        return self.weight_decay * self.batch_size * self.accum_steps / self.nbs


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any


def _is_no_decay(path: Tuple, leaf) -> bool:
    """bias / norm-scale leaves get no weight decay (reference param groups)."""
    keys = [getattr(p, "key", str(p)) for p in path]
    name = keys[-1] if keys else ""
    if name in ("bias",):
        return True
    # LayerNorm/BatchNorm scales: flax names them 'scale'
    if name == "scale":
        return True
    # ssm special params: dt bias etc. treat 1-D params as no-decay
    if leaf.ndim <= 1:
        return True
    return False


def _decay_mask(params) -> Any:
    return jax.tree_util.tree_map_with_path(lambda p, x: not _is_no_decay(p, x), params)


def _bias_mask(params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda p, x: getattr(p[-1], "key", str(p[-1])) == "bias", params
    )


def make_lr_schedules(cfg: TrainConfig, steps_per_epoch: int):
    """Per-group lr schedules (bias group has the warmup_bias_lr ramp)."""

    def lf(epoch):
        return (1.0 - epoch / cfg.epochs) * (1.0 - cfg.lrf) + cfg.lrf

    def sched(step, warmup_from):
        step = jnp.asarray(step, jnp.float32)
        epoch = step / max(steps_per_epoch, 1)
        target = cfg.lr0 * lf(epoch)
        nw = float(max(cfg.warmup_iters, 1))
        warm = warmup_from + (target - warmup_from) * jnp.minimum(step / nw, 1.0)
        return jnp.where(step < nw, warm, target)

    return (lambda s: sched(s, 0.0)), (lambda s: sched(s, cfg.warmup_bias_lr))


def make_optimizer(cfg: TrainConfig, params, steps_per_epoch: int) -> optax.GradientTransformation:
    lr_main, lr_bias = make_lr_schedules(cfg, steps_per_epoch)
    decay_mask = _decay_mask(params)
    bias_mask = _bias_mask(params)
    not_bias_mask = jax.tree.map(lambda b: not b, bias_mask)

    # One adam chain; masked weight decay; per-group lr via two masked
    # scale stages (each leaf is scaled by exactly one of them).
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.scale_by_adam(b1=cfg.momentum, b2=0.999, eps=1e-8),
        optax.masked(optax.add_decayed_weights(cfg.scaled_wd), decay_mask),
        optax.masked(optax.scale_by_learning_rate(lr_main), not_bias_mask),
        optax.masked(optax.scale_by_learning_rate(lr_bias), bias_mask),
    )
    return tx


def create_train_state(
    model,
    rng: jax.Array,
    cfg: TrainConfig,
    img_shape: Tuple[int, int, int, int],
    nc: int,
    n_text: Optional[int] = None,
    steps_per_epoch: int = 1000,
    max_gt: int = 128,
) -> Tuple[TrainState, optax.GradientTransformation]:
    """Initialize model variables + optimizer (jit the init for speed)."""
    n_text = n_text or nc
    img = jnp.zeros(img_shape, jnp.float32)
    txt = jnp.zeros((img_shape[0], n_text, 512), jnp.float32)
    targets = {
        "cls": jnp.zeros((img_shape[0], max_gt), jnp.int32),
        "bboxes": jnp.full((img_shape[0], max_gt, 4), 0.5, jnp.float32),
        "mask": jnp.zeros((img_shape[0], max_gt), bool),
    }
    k1, k2, k3 = jax.random.split(rng, 3)

    # NOTE: rngs/inputs must be jit *arguments* — closing over them makes them
    # compile-time constants and XLA constant-folds the whole init graph on
    # the host (minutes instead of seconds).
    def _init(k1, k2, k3, img, txt, targets):
        return model.init(
            {"params": k1, "cdn": k2, "dropout": k3}, img, txt, targets, True
        )

    variables = jax.jit(_init)(k1, k2, k3, img, txt, targets)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg, params, steps_per_epoch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        # materialize independent EMA buffers (donation would otherwise see
        # the same buffer twice)
        ema_params=jax.tree.map(jnp.copy, params),
        ema_batch_stats=jax.tree.map(jnp.copy, batch_stats),
    )
    return state, tx


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_cfg: Any,
    cfg: TrainConfig,
    loss_callable: Optional[Callable] = None,
) -> Callable:
    """Build the jittable train step: (state, batch, rng) -> (state, metrics).

    `batch`: img (B,H,W,3) f32 in [0,1]; txt_feats (B,K,512);
    cls (B,M) int32; bboxes (B,M,4) normalized cxcywh; mask (B,M) bool.
    `loss_callable(outputs, targets) -> (loss, items)` defaults to the
    RT-DETR detection loss; the YOLO task passes `v8_detection_loss`.
    """
    if loss_callable is None:
        loss_callable = lambda outputs, targets: rtdetr_detection_loss(
            outputs, targets, loss_cfg
        )

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        targets = {"cls": batch["cls"], "bboxes": batch["bboxes"], "mask": batch["mask"]}
        for extra in ("masks", "keypoints"):
            if extra in batch:
                targets[extra] = batch[extra]
        k_cdn, k_drop = jax.random.split(jax.random.fold_in(rng, state.step), 2)

        def loss_fn(params):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["img"],
                batch["txt_feats"],
                targets,
                True,
                rngs={"cdn": k_cdn, "dropout": k_drop},
                mutable=["batch_stats"],
            )
            loss, items = loss_callable(outputs, targets)
            return loss, (items, mutated["batch_stats"])

        (loss, (items, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        gnorm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if cfg.skip_nonfinite:
            ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
            new_params = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), new_params, state.params
            )
            new_opt = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old) if hasattr(new, "shape") else new,
                new_opt,
                state.opt_state,
            )

        # EMA update (reference decay ramp)
        t = (state.step + 1).astype(jnp.float32)
        d = cfg.ema_decay * (1.0 - jnp.exp(-t / cfg.ema_tau))
        ema_p = jax.tree.map(lambda e, p: e * d + (1.0 - d) * p, state.ema_params, new_params)
        ema_b = jax.tree.map(lambda e, p: e * d + (1.0 - d) * p, state.ema_batch_stats, new_bs)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            ema_params=ema_p,
            ema_batch_stats=ema_b,
        )
        keys = [k for k in ("giou", "class", "bbox", "box", "cls", "dfl") if k in items]
        metrics = {
            "loss": loss,
            **{k: items[k] for k in keys},
            "grad_norm": gnorm,
        }
        return new_state, metrics

    return train_step
