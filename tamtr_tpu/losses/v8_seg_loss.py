"""YOLOv8 segmentation loss: detect losses + per-instance mask BCE.

Rebuild of the reference `v8SegmentationLoss` (`utils/loss.py:331+`): the
detect components are shared with `v8_detection_loss`; the mask term is
BCE(pred_mask, gt_mask) cropped to the gt box and normalized by box area,
weighted like the box loss and normalized by the target-score sum.

Static-shape TPU design: instead of iterating the dynamic set of foreground
anchors, the top-`mask_topk` anchors by assigned target score are gathered
(a fixed-size slice covering all fg anchors in practice; overflow beyond
mask_topk is dropped and logged as a config choice, not silently).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tamtr_tpu.losses.v8_loss import V8LossConfig, v8_detection_loss
from tamtr_tpu.ops.boxes import xywh2xyxy


@dataclass(frozen=True)
class V8SegLossConfig(V8LossConfig):
    mask_topk: int = 128  # static cap on per-image fg anchors for the mask term
    overlap_mask: bool = True


def v8_segmentation_loss(
    head_out: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    cfg: V8SegLossConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """targets adds "masks": (B, M, Hm, Wm) float {0,1} per-gt instance masks
    (mask resolution = protos resolution, imgsz / 4 by construction)."""
    total_det, items = v8_detection_loss(head_out, targets, cfg)

    protos = head_out["protos"].astype(jnp.float32)  # (B, Hm, Wm, nm)
    mc = head_out["mask_coefs"].astype(jnp.float32)  # (B, A, nm)
    B, Hm, Wm, nm = protos.shape
    gt_masks = targets["masks"].astype(jnp.float32)  # (B, M, Hm, Wm)

    # re-run the assignment pieces (cheap; stop-gradiented labels)
    from tamtr_tpu.losses.tal import task_aligned_assigner
    from tamtr_tpu.nn.yolo_head import dfl_decode, dist2bbox

    anchors = head_out["anchors"]
    strides = head_out["strides"]
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
    fg = assign["fg_mask"]  # (B, A)
    w_anchor = assign["target_scores"].sum(-1) * fg  # (B, A)
    tss = jnp.maximum(assign["target_scores"].sum(), 1.0)

    # static top-K fg anchors per image
    K = min(cfg.mask_topk, w_anchor.shape[1])
    topw, topi = jax.lax.top_k(w_anchor, K)  # (B, K)
    valid = topw > 0
    mc_k = jnp.take_along_axis(mc, topi[..., None], axis=1)  # (B, K, nm)
    gt_idx = jnp.take_along_axis(assign["target_gt"], topi, axis=1)  # (B, K)
    gmask_k = jnp.take_along_axis(
        gt_masks, gt_idx[:, :, None, None], axis=1
    )  # (B, K, Hm, Wm) via broadcast gather
    box_k = jnp.take_along_axis(gt_px, gt_idx[..., None], axis=1)  # (B, K, 4)

    # predicted masks: (B, K, Hm, Wm)
    pred_m = jnp.einsum("bkn,bhwn->bkhw", mc_k, protos)
    bce = jnp.maximum(pred_m, 0) - pred_m * gmask_k + jnp.log1p(jnp.exp(-jnp.abs(pred_m)))

    # crop to the gt box (mask-space coords = pixels / (imgsz / Wm))
    sx = Wm / cfg.imgsz
    sy = Hm / cfg.imgsz
    x1 = box_k[..., 0:1] * sx
    y1 = box_k[..., 1:2] * sy
    x2 = box_k[..., 2:3] * sx
    y2 = box_k[..., 3:4] * sy
    gx = jnp.arange(Wm, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(Hm, dtype=jnp.float32)[None, None, :]
    in_x = (gx >= x1) & (gx < x2)  # (B, K, Wm)
    in_y = (gy >= y1) & (gy < y2)  # (B, K, Hm)
    crop = in_y[:, :, :, None] & in_x[:, :, None, :]  # (B, K, Hm, Wm)
    area = jnp.maximum((x2 - x1) * (y2 - y1), 1.0).squeeze(-1)  # (B, K)

    per_inst = (bce * crop).sum((-2, -1)) / area  # (B, K)
    loss_mask = (per_inst * topw * valid).sum() / tss

    total = total_det + cfg.box * loss_mask * B
    return total, {**items, "seg": loss_mask}
