"""RT-DETR detection loss: VFL class loss + L1 + RIOU, aux layers, CDN.

Static-shape re-design of the reference loss stack
(`models/utils/loss.py:14-442`, `utils/loss.py:135-178`):

- Ground truth is padded to (B, M) with a validity mask; every indexed
  gather/scatter uses `mode='drop'` with sentinel indices instead of the
  reference's ragged advanced indexing.
- Each prediction layer gets its own Hungarian match (reference default
  `use_uni_match=False`), i.e. ndl+1 matches per step; the tiny LSA solves
  run on host through `pure_callback`.
- The denoising branch uses the *static* positive layout from
  `tamtr_tpu.nn.decoder.get_cdn_group`: dn query `g*M + j` reconstructs gt
  `j` for each positive group copy `g < G` (reference
  `models/utils/loss.py:418-442`).
- Loss normalizers and gains replicate the reference exactly:
  class x1 (VFL, scaled by nq / max(num_gts, 1)), bbox x5 / num_gts,
  giou-slot (RIOU) x2 / num_gts.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tamtr_tpu.losses.matcher import hungarian_match
from tamtr_tpu.ops.boxes import bbox_iou


@dataclass(frozen=True)
class DETRLossConfig:
    nc: int = 80
    gain_class: float = 1.0
    gain_bbox: float = 5.0
    gain_giou: float = 2.0
    use_vfl: bool = True
    vfl_alpha: float = 0.75
    vfl_gamma: float = 2.0
    fl_alpha: float = 0.25
    fl_gamma: float = 1.5
    aux_loss: bool = True
    match_method: str = "auto"
    # ablation variants (reference ships them OFF, `models/utils/loss.py:69-83`)
    use_sl: bool = False  # SlideLoss class loss (`utils/loss.py:15-38`)
    use_svfl: bool = False  # SlideVarifocalLoss (`utils/loss.py:76-100`)
    nwd_loss: bool = False  # mix NWD into the giou slot (`loss.py:165-168`)
    iou_ratio: float = 0.5
    use_wiseiou: bool = False  # Wise-IoU v3 in the giou slot (`loss.py:152-158`)


def _pair_losses(
    cfg: DETRLossConfig,
    pred_bboxes: jnp.ndarray,  # (B, nq, 4)
    pred_scores: jnp.ndarray,  # (B, nq, nc)
    gt_bboxes: jnp.ndarray,  # (B, M, 4)
    gt_cls: jnp.ndarray,  # (B, M)
    q_idx: jnp.ndarray,  # (B, P) query index per pair
    gt_idx: jnp.ndarray,  # (B, P) gt index per pair
    valid: jnp.ndarray,  # (B, P) bool
) -> Dict[str, jnp.ndarray]:
    """Class + bbox + giou losses for a set of (query, gt) pairs."""
    B, nq, nc = pred_scores.shape
    num = valid.sum().astype(jnp.float32)
    denom = jnp.maximum(num, 1.0)

    safe_q = jnp.where(valid, q_idx, 0)
    safe_g = jnp.where(valid, gt_idx, 0)
    pred_b = jnp.take_along_axis(pred_bboxes, safe_q[..., None], axis=1)  # (B, P, 4)
    gt_b = jnp.take_along_axis(gt_bboxes, safe_g[..., None], axis=1)  # (B, P, 4)
    pair_cls = jnp.take_along_axis(gt_cls, safe_g, axis=1)  # (B, P)

    vf = valid.astype(jnp.float32)
    # L1 bbox loss
    l1 = (jnp.abs(pred_b - gt_b).sum(-1) * vf).sum()
    loss_bbox = cfg.gain_bbox * l1 / denom
    # RIOU in the giou slot (reference `models/utils/loss.py:153`), or
    # Wise-IoU when enabled (`loss.py:152-158`; stateless carry: the running
    # iou_mean is frozen at its init 1.0 — the reference ships this OFF)
    if cfg.use_wiseiou:
        from tamtr_tpu.losses.variants import wise_iou

        giou_term, _ = wise_iou(pred_b, gt_b, jnp.float32(1.0), monotonous=False)
    else:
        riou = bbox_iou(pred_b, gt_b, xywh=True, RIOU=True).squeeze(-1)
        riou = jnp.nan_to_num(riou, nan=0.0)  # degenerate boxes (reference zeroes NaN costs)
        giou_term = 1.0 - riou
    if cfg.nwd_loss:
        from tamtr_tpu.losses.variants import wasserstein_similarity

        nwd = wasserstein_similarity(pred_b, gt_b).squeeze(-1)
        mixed = cfg.iou_ratio * (giou_term * vf).sum() / denom + (
            1.0 - cfg.iou_ratio
        ) * ((1.0 - nwd) * vf).sum() / denom
        loss_giou = cfg.gain_giou * mixed
    else:
        loss_giou = cfg.gain_giou * (giou_term * vf).sum() / denom

    # classification targets: scatter matched classes; background = nc
    drop_q = jnp.where(valid, q_idx, nq)  # out-of-range => dropped
    b_ar = jnp.arange(B)[:, None]
    targets = jnp.full((B, nq), nc, dtype=jnp.int32)
    targets = targets.at[b_ar, drop_q].set(pair_cls, mode="drop")

    iou_pair = bbox_iou(jax.lax.stop_gradient(pred_b), gt_b, xywh=True).squeeze(-1)
    gt_scores = jnp.zeros((B, nq), dtype=jnp.float32)
    gt_scores = gt_scores.at[b_ar, drop_q].set(iou_pair * vf, mode="drop")

    one_hot = jax.nn.one_hot(targets, nc, dtype=jnp.float32)  # row of zeros for nc
    gt_full = gt_scores[..., None] * one_hot  # (B, nq, nc)
    logits = pred_scores.astype(jnp.float32)
    bce = jnp.maximum(logits, 0) - logits * gt_full + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p = jax.nn.sigmoid(logits)

    def vfl_loss():
        w = cfg.vfl_alpha * (p**cfg.vfl_gamma) * (1.0 - one_hot) + gt_full * one_hot
        return (bce * w).mean(axis=1).sum()

    def fl_loss():
        bce0 = jnp.maximum(logits, 0) + jnp.log1p(jnp.exp(-jnp.abs(logits)))  # target=0
        p_t = 1.0 - p
        mod = (1.0 - p_t) ** cfg.fl_gamma
        alpha_f = 1.0 - cfg.fl_alpha  # label is all-zero here
        return (bce0 * mod * alpha_f).mean(axis=1).sum()

    if cfg.use_sl:
        # SlideLoss over BCE, reduction .mean(1).sum(), no nq/num_gts scale
        # (reference `models/utils/loss.py:103-109`); auto_iou = mean of the
        # positive gt scores (-1 => floor 0.2 via slide_weight's clamp path)
        from tamtr_tpu.losses.variants import slide_loss

        auto_iou = jnp.where(
            num > 0, gt_scores.sum() / jnp.maximum((gt_scores > 0).sum(), 1), -1.0
        )
        loss_cls = cfg.gain_class * slide_loss(
            logits, gt_full, jnp.maximum(auto_iou, 0.2)
        ).mean(axis=1).sum()
    elif cfg.use_svfl:
        from tamtr_tpu.losses.variants import slide_varifocal_loss

        auto_iou = jnp.where(
            num > 0, gt_scores.sum() / jnp.maximum((gt_scores > 0).sum(), 1), -1.0
        )
        svfl = slide_varifocal_loss(
            logits, gt_full, one_hot, jnp.maximum(auto_iou, 0.2)
        ).mean(axis=1).sum()
        loss_cls = cfg.gain_class * jnp.where(num > 0, svfl, fl_loss()) * nq / denom
    else:
        loss_cls = jax.lax.cond(num > 0, vfl_loss, fl_loss) if cfg.use_vfl else fl_loss()
        loss_cls = cfg.gain_class * loss_cls * nq / denom

    return {"loss_class": loss_cls, "loss_bbox": loss_bbox, "loss_giou": loss_giou}


def _matched_losses(
    cfg: DETRLossConfig,
    pred_bboxes: jnp.ndarray,
    pred_scores: jnp.ndarray,
    gt_bboxes: jnp.ndarray,
    gt_cls: jnp.ndarray,
    gt_mask: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """One layer with its own Hungarian assignment."""
    q_for_gt = hungarian_match(
        pred_bboxes, pred_scores, gt_bboxes, gt_cls, gt_mask, method=cfg.match_method
    )
    M = gt_bboxes.shape[1]
    gt_idx = jnp.broadcast_to(jnp.arange(M)[None], q_for_gt.shape)
    valid = gt_mask & (q_for_gt >= 0)
    return _pair_losses(cfg, pred_bboxes, pred_scores, gt_bboxes, gt_cls, q_for_gt, gt_idx, valid)


def _dn_pair_indices(M: int, G: int, B: int):
    """Static dn positive layout: query g*M + j reconstructs gt j."""
    g = jnp.arange(G)[:, None]
    j = jnp.arange(M)[None, :]
    q = (g * M + j).reshape(-1)  # (G*M,)
    gt = jnp.tile(jnp.arange(M), G)
    return (
        jnp.broadcast_to(q[None], (B, G * M)),
        jnp.broadcast_to(gt[None], (B, G * M)),
    )


def rtdetr_detection_loss(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    cfg: DETRLossConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full RT-DETR loss (reference `RTDETRDetectionLoss.forward` +
    `RTDETRDetectionWorldModel.loss`, `nn/tasks.py:580-624`).

    Args:
      outputs: the training dict from `TAMTRModel.__call__` with
        dec_bboxes/dec_scores (ndl, B, num_dn + nq, .), enc_bboxes/enc_scores,
        num_dn (static), dn_groups (static).
      targets: {"cls": (B, M), "bboxes": (B, M, 4), "mask": (B, M)}.
    Returns:
      (total_loss, dict of all components + main three as giou/class/bbox).
    """
    gt_cls = targets["cls"]
    gt_bboxes = targets["bboxes"]
    gt_mask = targets["mask"]
    B, M = gt_cls.shape

    dec_bboxes = outputs["dec_bboxes"]
    dec_scores = outputs["dec_scores"]
    num_dn = int(outputs["num_dn"])
    G = int(outputs["dn_groups"]) if num_dn else 0

    if num_dn:
        dn_bboxes, dec_bboxes = dec_bboxes[:, :, :num_dn], dec_bboxes[:, :, num_dn:]
        dn_scores, dec_scores = dec_scores[:, :, :num_dn], dec_scores[:, :, num_dn:]
    else:
        dn_bboxes = dn_scores = None

    # prepend encoder layer (reference `tasks.py:613-614`)
    all_bboxes = jnp.concatenate([outputs["enc_bboxes"][None], dec_bboxes], axis=0)
    all_scores = jnp.concatenate([outputs["enc_scores"][None], dec_scores], axis=0)
    L = all_bboxes.shape[0]

    losses: Dict[str, jnp.ndarray] = {}
    # All layers matched in ONE batched assignment call: the L independent
    # Hungarian problems (reference use_uni_match=False => ndl+1 separate
    # matches) stack along the batch axis, so the auction's while_loop runs
    # once instead of L times (measured 4x30ms -> 30ms per step on v5e).
    n_match = L if cfg.aux_loss else 1
    lb = n_match * B
    stack_b = all_bboxes[-n_match:].reshape(lb, *all_bboxes.shape[2:])
    stack_s = all_scores[-n_match:].reshape(lb, *all_scores.shape[2:])
    tile = lambda x: jnp.tile(x, (n_match,) + (1,) * (x.ndim - 1))
    q_all = hungarian_match(
        stack_b, stack_s, tile(gt_bboxes), tile(gt_cls), tile(gt_mask),
        method=cfg.match_method,
    ).reshape(n_match, B, M)
    gt_idx = jnp.broadcast_to(jnp.arange(M)[None], (B, M))

    def layer_losses(bboxes, scores, q_for_gt):
        valid = gt_mask & (q_for_gt >= 0)
        return _pair_losses(cfg, bboxes, scores, gt_bboxes, gt_cls, q_for_gt, gt_idx, valid)

    final = layer_losses(all_bboxes[-1], all_scores[-1], q_all[-1])
    losses.update(final)
    # aux layers (each with its own match, reference use_uni_match=False)
    if cfg.aux_loss:
        aux = {"loss_class_aux": 0.0, "loss_bbox_aux": 0.0, "loss_giou_aux": 0.0}
        for i in range(L - 1):
            li = layer_losses(all_bboxes[i], all_scores[i], q_all[i])
            aux["loss_class_aux"] += li["loss_class"]
            aux["loss_bbox_aux"] += li["loss_bbox"]
            aux["loss_giou_aux"] += li["loss_giou"]
        losses.update({k: jnp.asarray(v) for k, v in aux.items()})

    # denoising branch with fixed match indices
    if num_dn:
        q_idx, gt_idx = _dn_pair_indices(M, G, B)
        valid = jnp.tile(gt_mask, (1, G))
        Ld = dn_bboxes.shape[0]
        dn_final = _pair_losses(
            cfg, dn_bboxes[-1], dn_scores[-1], gt_bboxes, gt_cls, q_idx, gt_idx, valid
        )
        losses.update({f"{k}_dn": v for k, v in dn_final.items()})
        if cfg.aux_loss:
            aux_dn = {"loss_class_aux_dn": 0.0, "loss_bbox_aux_dn": 0.0, "loss_giou_aux_dn": 0.0}
            for i in range(Ld - 1):
                li = _pair_losses(
                    cfg, dn_bboxes[i], dn_scores[i], gt_bboxes, gt_cls, q_idx, gt_idx, valid
                )
                aux_dn["loss_class_aux_dn"] += li["loss_class"]
                aux_dn["loss_bbox_aux_dn"] += li["loss_bbox"]
                aux_dn["loss_giou_aux_dn"] += li["loss_giou"]
            losses.update({k: jnp.asarray(v) for k, v in aux_dn.items()})

    total = sum(losses.values())
    items = {
        "giou": losses["loss_giou"],
        "class": losses["loss_class"],
        "bbox": losses["loss_bbox"],
    }
    return total, {**losses, **items}
