"""Automatic mask generation (AMG) utilities for SAM, JAX/numpy.

Equivalents of the reference `ultralytics/models/sam/amg.py`. Geometry is
host-side numpy (tiny lists of crops/grids); per-mask math (stability score,
mask->box) is vectorized jnp so it runs fused on device inside the jitted
generate step.
"""

from __future__ import annotations

import math
from itertools import product
from typing import Generator, List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def batch_iterator(batch_size: int, *args) -> Generator[List, None, None]:
    """Yield equal batches across the input arrays (reference `amg.py:25`)."""
    assert args and all(len(a) == len(args[0]) for a in args)
    n = len(args[0]) // batch_size + int(len(args[0]) % batch_size != 0)
    for b in range(n):
        yield [a[b * batch_size : (b + 1) * batch_size] for a in args]


def calculate_stability_score(
    masks: jnp.ndarray, mask_threshold: float, threshold_offset: float
) -> jnp.ndarray:
    """IoU between the high- and low-threshold binarizations (reference `amg.py:33`).

    masks: (..., H, W) logits -> (...,) scores.
    """
    inter = (masks > (mask_threshold + threshold_offset)).sum(axis=(-1, -2))
    union = (masks > (mask_threshold - threshold_offset)).sum(axis=(-1, -2))
    return inter / jnp.maximum(union, 1)


def build_point_grid(n_per_side: int) -> np.ndarray:
    """Evenly spaced (n^2, 2) points in [0,1]^2 (reference `amg.py:48`)."""
    offset = 1 / (2 * n_per_side)
    side = np.linspace(offset, 1 - offset, n_per_side)
    xs = np.tile(side[None, :], (n_per_side, 1))
    ys = np.tile(side[:, None], (1, n_per_side))
    return np.stack([xs, ys], axis=-1).reshape(-1, 2)


def build_all_layer_point_grids(
    n_per_side: int, n_layers: int, scale_per_layer: int
) -> List[np.ndarray]:
    """Point grids for every crop layer (reference `amg.py:57`)."""
    return [build_point_grid(int(n_per_side / (scale_per_layer ** i))) for i in range(n_layers + 1)]


def generate_crop_boxes(
    im_size: Tuple[int, int], n_layers: int, overlap_ratio: float
) -> Tuple[List[List[int]], List[int]]:
    """Layered xyxy crop boxes, (2^i)^2 per layer i (reference `amg.py:62-97`)."""
    crop_boxes, layer_idxs = [[0, 0, im_size[1], im_size[0]]], [0]
    im_h, im_w = im_size
    short_side = min(im_h, im_w)

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_side))
        crop_w = crop_len(im_w, n_side, overlap)
        crop_h = crop_len(im_h, n_side, overlap)
        x0s = [int((crop_w - overlap) * i) for i in range(n_side)]
        y0s = [int((crop_h - overlap) * i) for i in range(n_side)]
        for x0, y0 in product(x0s, y0s):
            crop_boxes.append([x0, y0, min(x0 + crop_w, im_w), min(y0 + crop_h, im_h)])
            layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def uncrop_boxes_xyxy(boxes: np.ndarray, crop_box: Sequence[int]) -> np.ndarray:
    """Shift crop-local boxes to image coords (reference `amg.py:100`)."""
    x0, y0 = crop_box[0], crop_box[1]
    return boxes + np.asarray([[x0, y0, x0, y0]], boxes.dtype)


def uncrop_points(points: np.ndarray, crop_box: Sequence[int]) -> np.ndarray:
    """Shift crop-local points to image coords (reference `amg.py:110`)."""
    return points + np.asarray([[crop_box[0], crop_box[1]]], points.dtype)


def uncrop_masks(
    masks: np.ndarray, crop_box: Sequence[int], orig_h: int, orig_w: int
) -> np.ndarray:
    """Pad crop-local masks back to full image size (reference `amg.py:120`)."""
    x0, y0, x1, y1 = crop_box
    if x0 == 0 and y0 == 0 and x1 == orig_w and y1 == orig_h:
        return masks
    pad = [(0, 0)] * (masks.ndim - 2) + [(y0, orig_h - y1), (x0, orig_w - x1)]
    return np.pad(masks, pad)


def is_box_near_crop_edge(
    boxes: np.ndarray, crop_box: Sequence[int], orig_box: Sequence[int], atol: float = 20.0
) -> np.ndarray:
    """Boxes touching the crop edge but not the image edge (reference `amg.py:11`)."""
    crop = np.asarray(crop_box, np.float32)
    orig = np.asarray(orig_box, np.float32)
    b = uncrop_boxes_xyxy(boxes, crop_box).astype(np.float32)
    near_crop = np.isclose(b, crop[None], atol=atol, rtol=0)
    near_image = np.isclose(b, orig[None], atol=atol, rtol=0)
    return np.any(near_crop & ~near_image, axis=1)


def batched_mask_to_box(masks: jnp.ndarray) -> jnp.ndarray:
    """xyxy boxes around binary masks; [0,0,0,0] for empty (reference `amg.py:151`).

    masks: (..., H, W) bool -> (..., 4). Static-shape min/max reductions —
    no data-dependent control flow, so it fuses inside jit.
    """
    h, w = masks.shape[-2:]
    in_h = masks.any(axis=-1)  # (..., H)
    in_w = masks.any(axis=-2)  # (..., W)
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    bottom = jnp.max(jnp.where(in_h, ys, 0), axis=-1)
    top = jnp.min(jnp.where(in_h, ys, h), axis=-1)
    right = jnp.max(jnp.where(in_w, xs, 0), axis=-1)
    left = jnp.min(jnp.where(in_w, xs, w), axis=-1)
    empty = (right < left) | (bottom < top)
    out = jnp.stack([left, top, right, bottom], axis=-1)
    return jnp.where(empty[..., None], 0, out)


def remove_small_regions(mask: np.ndarray, area_thresh: float, mode: str) -> Tuple[np.ndarray, bool]:
    """Remove small holes or islands via connected components (reference `amg.py:131`)."""
    import cv2

    assert mode in {"holes", "islands"}
    correct_holes = mode == "holes"
    working = (correct_holes ^ mask.astype(bool)).astype(np.uint8)
    n_labels, regions, stats, _ = cv2.connectedComponentsWithStats(working, 8)
    sizes = stats[:, -1][1:]
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask, False
    fill = [0] + small
    if not correct_holes:
        fill = [i for i in range(n_labels) if i not in fill] or [int(np.argmax(sizes)) + 1]
    return np.isin(regions, fill), True
