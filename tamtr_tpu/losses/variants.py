"""Optional loss variants: Slide/EMASlide (+VFL forms), NWD, Wise-IoU.

Reference implementations: `utils/loss.py:15-134` (Slide/EMASlide/
SlideVarifocal/EMASlideVarifocal), `utils/metrics.py:526-559`
(`wasserstein_loss` NWD), `utils/metrics.py:560-660` (`WiseIouLoss`).
All are OFF by default in the reference DETR loss
(`models/utils/loss.py:69-83`: `nwd_loss=False`, `use_wiseiou=False`,
`use_sl/use_emasl/use_svfl/use_emasvfl=False`) — shipped here for ablation
parity, JAX-functional: running statistics (the EMA iou mean) are explicit
inputs/outputs instead of module attributes, so everything stays jittable.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def slide_weight(true: jnp.ndarray, auto_iou) -> jnp.ndarray:
    """Slide modulating weight (reference `utils/loss.py:23-32`).

    Three bands keyed on the target score vs the (batch-mean) IoU:
    w=1 below auto_iou-0.1, w=e^(1-auto_iou) in the ramp band,
    w=e^-(true-1) above auto_iou.
    """
    auto_iou = jnp.maximum(jnp.asarray(auto_iou, jnp.float32), 0.2)
    b1 = true <= auto_iou - 0.1
    b2 = (true > (auto_iou - 0.1)) & (true < auto_iou)
    b3 = true >= auto_iou
    a2 = jnp.exp(1.0 - auto_iou)
    a3 = jnp.exp(-(true - 1.0))
    return 1.0 * b1 + a2 * b2 + a3 * b3


def _bce_logits(pred: jnp.ndarray, true: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(pred, 0) - pred * true + jnp.log1p(jnp.exp(-jnp.abs(pred)))


def slide_loss(pred: jnp.ndarray, true: jnp.ndarray, auto_iou=0.5) -> jnp.ndarray:
    """SlideLoss over BCE-with-logits, elementwise (`utils/loss.py:15-38`)."""
    return _bce_logits(pred, true) * slide_weight(true, auto_iou)


def ema_slide_update(
    iou_mean: jnp.ndarray, updates: jnp.ndarray, auto_iou,
    decay: float = 0.999, tau: float = 2000.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """EMASlide running-mean update (`utils/loss.py:41-57`): returns
    (new_iou_mean, new_updates). `auto_iou = -1` skips the update (the
    reference's num_gts == 0 sentinel)."""
    auto_iou = jnp.asarray(auto_iou, jnp.float32)
    do = auto_iou != -1.0
    new_updates = updates + do.astype(updates.dtype)
    d = decay * (1.0 - jnp.exp(-new_updates.astype(jnp.float32) / tau))
    new_mean = jnp.where(do, d * iou_mean + (1.0 - d) * auto_iou, iou_mean)
    return new_mean, new_updates


def ema_slide_loss(
    pred: jnp.ndarray, true: jnp.ndarray, iou_mean: jnp.ndarray,
    updates: jnp.ndarray, auto_iou=0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """EMASlideLoss: slide weight keyed on the EMA of auto_iou.
    Returns (elementwise loss, new_iou_mean, new_updates)."""
    new_mean, new_updates = ema_slide_update(iou_mean, updates, auto_iou)
    return slide_loss(pred, true, new_mean), new_mean, new_updates


def slide_varifocal_loss(
    pred_score: jnp.ndarray, gt_score: jnp.ndarray, label: jnp.ndarray,
    auto_iou=0.5, alpha: float = 0.75, gamma: float = 2.0,
) -> jnp.ndarray:
    """SlideVarifocalLoss (`utils/loss.py:76-100`), elementwise (caller
    applies the reference's `.mean(1).sum()` reduction)."""
    weight = alpha * jax.nn.sigmoid(pred_score) ** gamma * (1 - label) + gt_score * label
    loss = _bce_logits(pred_score.astype(jnp.float32), gt_score.astype(jnp.float32)) * weight
    return loss * slide_weight(gt_score, auto_iou)


def wasserstein_similarity(
    box1: jnp.ndarray, box2: jnp.ndarray, xywh: bool = True,
    eps: float = 1e-7, constant: float = 12.8,
) -> jnp.ndarray:
    """Normalized Wasserstein distance similarity (NWD,
    `utils/metrics.py:526-559`): exp(-sqrt(W2)/C), W2 = center L2 +
    (w-h diff)^2/4. Returns (..., 1) like the reference's chunked math."""
    if xywh:
        (x1, y1, w1, h1) = jnp.split(box1, 4, -1)
        (x2, y2, w2, h2) = jnp.split(box2, 4, -1)
        c1x, c1y, c2x, c2y = x1, y1, x2, y2
    else:
        b1x1, b1y1, b1x2, b1y2 = jnp.split(box1, 4, -1)
        b2x1, b2y1, b2x2, b2y2 = jnp.split(box2, 4, -1)
        w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
        w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps
        c1x, c1y = b1x1 + w1 / 2, b1y1 + h1 / 2
        c2x, c2y = b2x1 + w2 / 2, b2y1 + h2 / 2
    center = (c1x - c2x) ** 2 + (c1y - c2y) ** 2 + eps
    wh = ((w1 - w2) ** 2 + (h1 - h2) ** 2) / 4
    return jnp.exp(-jnp.sqrt(center + wh) / constant)


def wise_iou(
    pred: jnp.ndarray, target: jnp.ndarray, iou_mean: jnp.ndarray,
    monotonous: Optional[bool] = False, training: bool = True,
    momentum: float = 1e-2, alpha: float = 1.7, delta: float = 2.7,
    d: float = 0.0, u: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Wise-IoU v1/v2/v3 (`utils/metrics.py:560-660`, ltype='WIoU').

    pred/target: (..., 4) cxcywh. `monotonous`: None=v1, True=v2 (sqrt FM),
    False=v3 (non-monotonic FM, the reference default). Returns
    (elementwise loss, new_iou_mean). The running `iou_mean` is an explicit
    carry (reference keeps it as a buffer with momentum 1e-2).
    """
    px, py = pred[..., 0], pred[..., 1]
    tx, ty = target[..., 0], target[..., 1]
    pw, ph = pred[..., 2], pred[..., 3]
    tw, th = target[..., 2], target[..., 3]
    p1, p2 = px - pw / 2, px + pw / 2
    q1, q2 = py - ph / 2, py + ph / 2
    t1, t2 = tx - tw / 2, tx + tw / 2
    s1, s2 = ty - th / 2, ty + th / 2
    iw = jnp.maximum(jnp.minimum(p2, t2) - jnp.maximum(p1, t1), 0)
    ih = jnp.maximum(jnp.minimum(q2, s2) - jnp.maximum(q1, s1), 0)
    inter = iw * ih
    union = pw * ph + tw * th - inter
    iou_plain = inter / jnp.maximum(union, 1e-9)
    # reference default path applies the Focaler clamp (d=0, u=0.95)
    iou = 1.0 - jnp.clip((iou_plain - d) / (u - d), 0.0, 1.0)

    # enclosing box + center distance (WIoU distance term)
    ew = jnp.maximum(p2, t2) - jnp.minimum(p1, t1)
    eh = jnp.maximum(q2, s2) - jnp.minimum(q1, s1)
    l2_box = ew**2 + eh**2
    l2_center = (px - tx) ** 2 + (py - ty) ** 2
    dist = jnp.exp(l2_center / jax.lax.stop_gradient(jnp.maximum(l2_box, 1e-9)))
    loss = dist * iou

    new_mean = jnp.where(
        training,
        (1.0 - momentum) * iou_mean + momentum * jax.lax.stop_gradient(iou).mean(),
        iou_mean,
    )
    if monotonous is not None:
        beta = jax.lax.stop_gradient(iou) / new_mean
        if monotonous:
            loss = loss * jnp.sqrt(beta)
        else:
            divisor = delta * jnp.power(alpha, beta - delta)
            loss = loss * (beta / divisor)
    return loss, new_mean
