"""YOLOv8 detection loss: BCE cls + CIoU box + DFL (reference `utils/loss.py:235-330`).

Static-shape version (SURVEY A.6): targets already arrive padded (B, M) +
mask — exactly the reference's `preprocess` output shape. Gains box=7.5,
cls=0.5, dfl=1.5; total scaled by batch size.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tamtr_tpu.losses.tal import task_aligned_assigner
from tamtr_tpu.nn.yolo_head import bbox2dist, dfl_decode, dist2bbox
from tamtr_tpu.ops.boxes import bbox_iou, xywh2xyxy


@dataclass(frozen=True)
class V8LossConfig:
    nc: int = 80
    reg_max: int = 16
    box: float = 7.5
    cls: float = 0.5
    dfl: float = 1.5
    imgsz: int = 640


def v8_detection_loss(
    head_out: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    cfg: V8LossConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """head_out: Detect train dict; targets: cls (B,M), bboxes (B,M,4) xywh
    normalized [0,1], mask (B,M)."""
    distri = head_out["distri"].astype(jnp.float32)  # (B, A, 4*reg_max)
    scores = head_out["scores"].astype(jnp.float32)  # (B, A, nc)
    anchors = head_out["anchors"]  # (A, 2) cell units
    strides = head_out["strides"]  # (A, 1)
    B, A, nc = scores.shape

    # decode predictions in anchor (stride-normalized) units
    d = dfl_decode(distri, cfg.reg_max)  # (B, A, 4)
    pred_xyxy = dist2bbox(d, anchors[None], xywh=False)  # (B, A, 4)

    # assignment happens in pixel space (the reference scales preds by stride)
    gt_xyxy_px = xywh2xyxy(targets["bboxes"]) * cfg.imgsz
    pred_xyxy_px = pred_xyxy * strides[None]
    anchors_px = anchors * strides

    # the assigner makes labels, not gradients (reference runs TAL in no_grad)
    assign = task_aligned_assigner(
        jax.lax.stop_gradient(jax.nn.sigmoid(scores)),
        jax.lax.stop_gradient(pred_xyxy_px),
        anchors_px,
        targets["cls"],
        gt_xyxy_px,
        targets["mask"],
    )
    assign = jax.tree.map(jax.lax.stop_gradient, assign)
    fg = assign["fg_mask"]  # (B, A)
    t_scores = assign["target_scores"]  # (B, A, nc)
    t_boxes_px = assign["target_bboxes"]  # (B, A, 4) xyxy pixels

    tss = jnp.maximum(t_scores.sum(), 1.0)

    # cls: BCE over all anchors / sum(target_scores)
    bce = (
        jnp.maximum(scores, 0) - scores * t_scores + jnp.log1p(jnp.exp(-jnp.abs(scores)))
    )
    loss_cls = bce.sum() / tss

    # box: CIoU weighted by target score sum per anchor, fg only
    w = t_scores.sum(-1)  # (B, A)
    ciou = bbox_iou(pred_xyxy_px, t_boxes_px, xywh=False, CIoU=True).squeeze(-1)
    loss_box = (((1.0 - ciou) * w) * fg).sum() / tss

    # DFL: cross-entropy between the two integer bins around the target dist
    t_boxes_anchor = t_boxes_px / strides[None]
    t_dist = bbox2dist(t_boxes_anchor, anchors[None], cfg.reg_max)  # (B, A, 4)
    tl = jnp.floor(t_dist).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(jnp.float32) - t_dist
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(
        distri.reshape(B, A, 4, cfg.reg_max), axis=-1
    )
    ce_l = -jnp.take_along_axis(logp, tl[..., None], axis=-1).squeeze(-1)
    ce_r = -jnp.take_along_axis(
        logp, jnp.clip(tr, 0, cfg.reg_max - 1)[..., None], axis=-1
    ).squeeze(-1)
    dfl = (ce_l * wl + ce_r * wr).mean(-1)  # (B, A)
    loss_dfl = ((dfl * w) * fg).sum() / tss

    total = (cfg.box * loss_box + cfg.cls * loss_cls + cfg.dfl * loss_dfl) * B
    return total, {"box": loss_box, "cls": loss_cls, "dfl": loss_dfl}
