"""YOLOv8 pose loss: detect losses + OKS-style keypoint regression + visibility BCE.

Rebuild of the reference `v8PoseLoss` (`utils/loss.py`): per-fg-anchor
keypoint loss `sum((1 - exp(-d^2 / (2 * area * sigma^2))) * kpt_mask)` plus
BCE on visibility logits; gains pose=12.0, kobj=1.0 (reference defaults).
Static top-K fg selection like the segmentation loss.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tamtr_tpu.losses.v8_loss import V8LossConfig, v8_detection_loss
from tamtr_tpu.ops.boxes import xywh2xyxy

# COCO-17 OKS sigmas (reference utils/metrics.py OKS_SIGMA)
OKS_SIGMA = jnp.asarray(
    [0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62,
     1.07, 1.07, 0.87, 0.87, 0.89, 0.89]
) / 10.0


@dataclass(frozen=True)
class V8PoseLossConfig(V8LossConfig):
    kpt_shape: Tuple[int, int] = (17, 3)
    pose: float = 12.0
    kobj: float = 1.0
    mask_topk: int = 128


def v8_pose_loss(head_out, targets, cfg: V8PoseLossConfig):
    """targets adds "keypoints": (B, M, nk, 3) in pixels (x, y, visibility)."""
    total_det, items = v8_detection_loss(head_out, targets, cfg)

    from tamtr_tpu.losses.tal import task_aligned_assigner
    from tamtr_tpu.nn.yolo_head import dfl_decode, dist2bbox

    anchors = head_out["anchors"]
    strides = head_out["strides"]
    kraw = head_out["kpt_raw"].astype(jnp.float32)
    B, A, _ = kraw.shape
    nk, kdim = cfg.kpt_shape
    k3 = kraw.reshape(B, A, nk, kdim)
    xy_pred = (k3[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) * strides[None, :, None, :]

    d = dfl_decode(head_out["distri"].astype(jnp.float32), cfg.reg_max)
    pred_px = dist2bbox(d, anchors[None], xywh=False) * strides[None]
    gt_px = xywh2xyxy(targets["bboxes"]) * cfg.imgsz
    assign = task_aligned_assigner(
        jax.lax.stop_gradient(jax.nn.sigmoid(head_out["scores"].astype(jnp.float32))),
        jax.lax.stop_gradient(pred_px),
        anchors * strides,
        targets["cls"],
        gt_px,
        targets["mask"],
    )
    assign = jax.tree.map(jax.lax.stop_gradient, assign)
    fg = assign["fg_mask"]
    w_anchor = assign["target_scores"].sum(-1) * fg
    tss = jnp.maximum(assign["target_scores"].sum(), 1.0)

    K = min(cfg.mask_topk, A)
    topw, topi = jax.lax.top_k(w_anchor, K)
    valid = (topw > 0).astype(jnp.float32)
    gt_idx = jnp.take_along_axis(assign["target_gt"], topi, axis=1)
    gt_kpts = jnp.take_along_axis(
        targets["keypoints"].astype(jnp.float32), gt_idx[:, :, None, None], axis=1
    )  # (B, K, nk, 3)
    xy_k = jnp.take_along_axis(xy_pred, topi[:, :, None, None], axis=1)  # (B, K, nk, 2)
    box_k = jnp.take_along_axis(assign["target_bboxes"], topi[..., None], axis=1)
    area = jnp.maximum(
        (box_k[..., 2] - box_k[..., 0]) * (box_k[..., 3] - box_k[..., 1]), 1.0
    )  # (B, K)

    kpt_mask = (gt_kpts[..., 2] > 0).astype(jnp.float32)  # (B, K, nk)
    d2 = ((xy_k - gt_kpts[..., :2]) ** 2).sum(-1)  # (B, K, nk)
    sig = OKS_SIGMA[: nk] if nk == 17 else jnp.full((nk,), 1.0 / nk)
    e = d2 / (2.0 * (area[..., None] + 1e-9) * (4 * sig[None, None] ** 2))
    kpt_loss = ((1.0 - jnp.exp(-e)) * kpt_mask).sum(-1) / jnp.maximum(kpt_mask.sum(-1), 1.0)
    loss_pose = (kpt_loss * topw * valid).sum() / tss

    loss_kobj = jnp.zeros(())
    if kdim == 3:
        vis_logit = jnp.take_along_axis(k3[..., 2], topi[:, :, None], axis=1)  # (B, K, nk)
        t = kpt_mask
        bce = jnp.maximum(vis_logit, 0) - vis_logit * t + jnp.log1p(jnp.exp(-jnp.abs(vis_logit)))
        loss_kobj = (bce.mean(-1) * topw * valid).sum() / tss

    total = total_det + (cfg.pose * loss_pose + cfg.kobj * loss_kobj) * B
    return total, {**items, "pose": loss_pose, "kobj": loss_kobj}
