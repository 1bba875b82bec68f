"""Box format conversions and the IoU family, including TAM-TR's RIOU.

Semantics match the reference (`ultralytics/utils/metrics.py:71-188`,
`ultralytics/utils/ops.py:340-560`) but are written as pure, broadcastable
jnp functions: no in-place ops, fp32-safe, jit/vmap friendly.

RIOU ("rotation-invariant IoU", reference `ultralytics/utils/metrics.py:123-130`)
is a CIoU variant whose center-distance normalizer is
``c^2 = (max(w1,h1) + max(w2,h2) + sqrt(rho2))^2`` instead of the squared
convex diagonal. It is used both in the Hungarian matching cost and the box
regression loss of the DETR head.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax


def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2). Last axis is 4."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    hw, hh = w * 0.5, h * 0.5
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def xyxy2xywh(x: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h). Last axis is 4."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1)


def xywh2ltwh(x: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (left, top, w, h)."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - w * 0.5, cy - h * 0.5, w, h], axis=-1)


def ltwh2xywh(x: jnp.ndarray) -> jnp.ndarray:
    """(left, top, w, h) -> (cx, cy, w, h)."""
    l, t, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([l + w * 0.5, t + h * 0.5, w, h], axis=-1)


def ltwh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    l, t, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([l, t, l + w, t + h], axis=-1)


def xyxy2ltwh(x: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def bbox_iou(
    box1: jnp.ndarray,
    box2: jnp.ndarray,
    xywh: bool = True,
    GIoU: bool = False,
    DIoU: bool = False,
    CIoU: bool = False,
    RIOU: bool = False,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Elementwise (broadcasting) IoU between box1 and box2.

    Both inputs have a trailing axis of 4 and broadcast against each other;
    the result keeps a trailing axis of 1 (matching the reference's chunked
    layout so callers can `.squeeze(-1)` identically).
    """
    if xywh:
        x1, y1, w1, h1 = jnp.split(box1, 4, axis=-1)
        x2, y2, w2, h2 = jnp.split(box2, 4, axis=-1)
        b1_x1, b1_x2, b1_y1, b1_y2 = x1 - w1 * 0.5, x1 + w1 * 0.5, y1 - h1 * 0.5, y1 + h1 * 0.5
        b2_x1, b2_x2, b2_y1, b2_y2 = x2 - w2 * 0.5, x2 + w2 * 0.5, y2 - h2 * 0.5, y2 + h2 * 0.5
    else:
        b1_x1, b1_y1, b1_x2, b1_y2 = jnp.split(box1, 4, axis=-1)
        b2_x1, b2_y1, b2_x2, b2_y2 = jnp.split(box2, 4, axis=-1)
        w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
        w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * jnp.clip(
        jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if not (GIoU or DIoU or CIoU or RIOU):
        return iou

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
    if CIoU or DIoU or RIOU:
        rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4.0
        if CIoU or RIOU:
            v = (4.0 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
            alpha = lax.stop_gradient(v / (v - iou + (1.0 + eps)))
            if RIOU:
                # rotation-invariant enclosing measure instead of convex diagonal
                c2 = (jnp.maximum(w1, h1) + jnp.maximum(w2, h2) + jnp.sqrt(rho2) + eps) ** 2
            else:
                c2 = cw**2 + ch**2 + eps
            return iou - (rho2 / c2 + v * alpha)
        c2 = cw**2 + ch**2 + eps
        return iou - rho2 / c2
    c_area = cw * ch + eps
    return iou - (c_area - union) / c_area


def box_iou_pairwise(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise IoU between two sets of xyxy boxes: (N, 4) x (M, 4) -> (N, M).

    Equivalent to the reference `utils/metrics.py:box_iou` (used by the
    validator's TP-matching and NMS).
    """
    a1, a2 = jnp.split(box1[:, None, :], 2, axis=-1)  # (N,1,2),(N,1,2)
    b1, b2 = jnp.split(box2[None, :, :], 2, axis=-1)  # (1,M,2),(1,M,2)
    inter = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0, None).prod(-1)
    area1 = (a2 - a1).prod(-1)
    area2 = (b2 - b1).prod(-1)
    return inter / (area1 + area2 - inter + eps)
