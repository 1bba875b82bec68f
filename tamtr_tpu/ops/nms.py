"""Vectorized fixed-size NMS for TPU.

Replaces `torchvision.ops.nms` (the reference's C++/CUDA kernel, used in
`models/rtdetrworld/{val,predict}.py`) with a static-shape greedy
suppression: one O(N^2) IoU matrix + a sequential keep sweep in a
`fori_loop` (N = num queries = 100-300, so the matrix is tiny). The
multi-class "max_wh class offset" trick is replicated so boxes of different
classes never suppress each other.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from tamtr_tpu.ops.boxes import box_iou_pairwise

MAX_WH = 7680.0  # class offset (reference `utils/ops.py` trick)


@partial(jax.jit, static_argnames=("max_det",))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.45,
    max_det: int = 300,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS on xyxy boxes.

    Args:
      boxes: (N, 4) xyxy.
      scores: (N,) confidence; entries <= 0 are ignored.
    Returns:
      keep: (max_det,) int32 indices into the input (score-sorted), -1 padded.
      keep_mask: (max_det,) bool.
    """
    N = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    s = scores[order]
    iou = box_iou_pairwise(b, b)

    def body(i, alive):
        keep_i = alive[i] & (s[i] > 0)
        suppress = keep_i & (iou[i] > iou_threshold) & (jnp.arange(N) > i)
        return alive & ~suppress

    alive = jax.lax.fori_loop(0, N, body, jnp.ones((N,), bool))
    alive = alive & (s > 0)
    # compact the kept indices to the front, -1 padded
    rank = jnp.cumsum(alive) - 1
    out = jnp.full((max_det,), -1, jnp.int32)
    src = jnp.where(alive, rank, max_det)
    out = out.at[src].set(order.astype(jnp.int32), mode="drop")
    return out, out >= 0


@partial(jax.jit, static_argnames=("max_det",))
def multiclass_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    iou_threshold: float = 0.45,
    max_det: int = 300,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-class NMS via the class-offset trick."""
    off = labels.astype(boxes.dtype)[:, None] * MAX_WH
    return nms(boxes + off, scores, iou_threshold, max_det)


@partial(jax.jit, static_argnames=("max_det", "legacy_val_mask", "classes", "single_cls"))
def postprocess_predictions(
    pred: jnp.ndarray,
    conf_thres: float = 0.4,
    iou_thres: float = 0.6,
    max_det: int = 300,
    legacy_val_mask: bool = False,
    classes: Tuple[int, ...] = None,
    single_cls: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode the head's eval output for a batch.

    Mirrors `RTDETRValidator.postprocess` / `RTDETRPredictor.postprocess`
    (`models/rtdetrworld/val.py:102-128`, `predict.py:34-78`): split
    (4, nc), boxes are normalized cxcywh (scaled by the caller), take the
    best class per box, confidence filter, then class-offset NMS.

    `legacy_val_mask` replicates a quirk of the reference VAL protocol
    (`val.py:114-119`): the conf mask is computed in ORIGINAL query order
    but applied to the score-SORTED array, so with an active threshold the
    kept subset is position-scrambled (row i survives iff the original row
    at i's sort rank passed the threshold). The published 39.7 mAP@0.5 was
    measured with conf=0.4 (`valTAMTR.py:12`), where the quirk is live —
    the validator sets True for protocol-identical mAP; predict keeps the
    clean semantics (the reference's own predict.py applies the mask
    before any sort, `predict.py:66`).

    Args:
      pred: (B, nq, 4 + nc) — normalized cxcywh + sigmoid scores.
    Returns:
      boxes_xyxy (B, max_det, 4) normalized, scores (B, max_det),
      labels (B, max_det) int32, valid (B, max_det) bool.
    """
    from tamtr_tpu.ops.boxes import xywh2xyxy

    bboxes = xywh2xyxy(pred[..., :4])
    cls_scores = pred[..., 4:]
    scores = cls_scores.max(-1)
    labels = cls_scores.argmax(-1)
    if classes is not None:
        # class filter AFTER argmax (reference `predict.py:64-66`: a box
        # whose best class is disallowed is dropped, not re-assigned)
        nc = cls_scores.shape[-1]
        allowed = jnp.zeros((nc,), bool).at[jnp.array(classes, jnp.int32)].set(True)
        scores = jnp.where(allowed[labels], scores, 0.0)
    if single_cls:
        # all detections share class 0 and suppress each other
        # (reference val.py:123 `(0 if single_cls else max_wh)` +
        # update_metrics `pred[:, 5] = 0`)
        labels = jnp.zeros_like(labels)
    if legacy_val_mask:
        # keep query i iff the original-order query at i's sort rank passed
        ranks = jnp.argsort(jnp.argsort(-scores, axis=-1), axis=-1)
        gate = jnp.take_along_axis(scores, ranks, axis=-1) > conf_thres
        scores = jnp.where(gate, scores, 0.0)
    else:
        scores = jnp.where(scores > conf_thres, scores, 0.0)  # strict >, ref predict.py:66

    def per_image(b, s, l):
        keep, valid = multiclass_nms(b, s, l, iou_thres, max_det)
        safe = jnp.where(valid, keep, 0)
        return (
            b[safe],
            jnp.where(valid, s[safe], 0.0),
            l[safe].astype(jnp.int32),
            valid,
            safe.astype(jnp.int32),  # kept source indices (for mask/kpt gather)
        )

    return jax.vmap(per_image)(bboxes, scores, labels)
