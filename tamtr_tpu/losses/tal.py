"""Task-aligned assigner (TAL) — fully vectorized, static shapes.

Rebuild of the reference `TaskAlignedAssigner` (`utils/tal.py:60-248`,
SURVEY A.5): align_metric = score^alpha * CIoU^beta over anchors inside each
gt box, top-k candidates per gt, duplicate anchors resolved by highest
overlap, target scores normalized per gt by align * max_iou / max_align.

All inputs are padded: gt (B, M, ...) with a validity mask; anchors (A, 2).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tamtr_tpu.ops.boxes import bbox_iou


def task_aligned_assigner(
    pred_scores: jnp.ndarray,  # (B, A, nc) post-sigmoid
    pred_bboxes: jnp.ndarray,  # (B, A, 4) xyxy (anchor units)
    anchor_points: jnp.ndarray,  # (A, 2)
    gt_cls: jnp.ndarray,  # (B, M)
    gt_bboxes: jnp.ndarray,  # (B, M, 4) xyxy (anchor units)
    gt_mask: jnp.ndarray,  # (B, M)
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
) -> Dict[str, jnp.ndarray]:
    B, A, nc = pred_scores.shape
    M = gt_cls.shape[1]

    # candidates: anchor centers inside gt boxes (`select_candidates_in_gts`)
    lt = anchor_points[None, None] - gt_bboxes[:, :, None, :2]  # (B, M, A, 2)
    rb = gt_bboxes[:, :, None, 2:] - anchor_points[None, None]
    in_gts = jnp.concatenate([lt, rb], -1).min(-1) > eps  # (B, M, A)

    # alignment metric
    ps = jnp.take_along_axis(
        pred_scores.transpose(0, 2, 1), gt_cls[:, :, None], axis=1
    )  # (B, M, A)
    iou = bbox_iou(
        gt_bboxes[:, :, None, :], pred_bboxes[:, None, :, :], xywh=False, CIoU=True
    ).squeeze(-1)
    iou = jnp.clip(iou, 0.0, None)  # (B, M, A)
    align = (ps**alpha) * (iou**beta)
    align = jnp.where(in_gts & gt_mask[:, :, None], align, 0.0)

    # top-k per gt (`select_topk_candidates`)
    topk_val, topk_idx = jax.lax.top_k(align, topk)  # (B, M, k)
    topk_ok = topk_val > eps
    cand = jnp.zeros((B, M, A), bool)
    cand = cand.at[
        jnp.arange(B)[:, None, None], jnp.arange(M)[None, :, None],
        jnp.where(topk_ok, topk_idx, A),
    ].set(True, mode="drop")
    cand = cand & gt_mask[:, :, None]

    # resolve anchors claimed by multiple gts: keep highest-IoU gt
    n_claims = cand.sum(1)  # (B, A)
    iou_masked = jnp.where(cand, iou, -1.0)
    best_gt = iou_masked.argmax(1)  # (B, A)
    keep = jnp.where(
        (n_claims[:, None, :] > 1),
        jnp.arange(M)[None, :, None] == best_gt[:, None, :],
        cand,
    )
    mask_pos = keep & cand  # (B, M, A)

    fg_mask = mask_pos.any(1)  # (B, A)
    target_gt = jnp.where(fg_mask, mask_pos.argmax(1), 0)  # (B, A)

    b_ar = jnp.arange(B)[:, None]
    t_cls = jnp.take_along_axis(gt_cls, target_gt, axis=1)  # (B, A)
    t_boxes = jnp.take_along_axis(gt_bboxes, target_gt[..., None], axis=1)  # (B, A, 4)

    # normalized target scores (`tal.py:126-131`)
    align_pos = jnp.where(mask_pos, align, 0.0)
    iou_pos = jnp.where(mask_pos, iou, 0.0)
    max_align = align_pos.max(axis=-1, keepdims=True)  # (B, M, 1)
    max_iou = iou_pos.max(axis=-1, keepdims=True)
    norm_align = (align_pos * max_iou / (max_align + eps)).max(1)  # (B, A)

    t_scores = jax.nn.one_hot(t_cls, nc) * norm_align[..., None]
    t_scores = jnp.where(fg_mask[..., None], t_scores, 0.0)
    return {
        "target_bboxes": t_boxes,
        "target_scores": t_scores,
        "fg_mask": fg_mask,
        "target_gt": target_gt,
    }
