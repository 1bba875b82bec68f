"""Anchor-free YOLO Detect head with DFL box distribution.

Capability-parity rebuild of the reference `Detect` head
(`nn/modules/head.py:22-83`) + `make_anchors`/`dist2bbox`
(`utils/tal.py:249-279`) + the DFL integral decode
(`nn/modules/block.py:17-37`), in NHWC flax.

Train output: per-level raw maps flattened to (B, A, 4*reg_max + nc).
Eval output: (B, A, 4 + nc) with decoded xywh (pixel units) and sigmoid
class scores.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tamtr_tpu.nn.layers import ConvBN


def make_anchors(
    shapes: Sequence[Tuple[int, int]], strides: Sequence[int], offset: float = 0.5
) -> Tuple[np.ndarray, np.ndarray]:
    """Anchor points (cell centers) + per-anchor stride. Host-side, static."""
    pts, strs = [], []
    for (h, w), s in zip(shapes, strides):
        sx = (np.arange(w, dtype=np.float32) + offset)
        sy = (np.arange(h, dtype=np.float32) + offset)
        gy, gx = np.meshgrid(sy, sx, indexing="ij")
        pts.append(np.stack([gx, gy], -1).reshape(-1, 2))
        strs.append(np.full((h * w, 1), s, np.float32))
    return np.concatenate(pts), np.concatenate(strs)


def dist2bbox(dist: jnp.ndarray, anchor_points: jnp.ndarray, xywh: bool = True) -> jnp.ndarray:
    """(l, t, r, b) distances -> boxes around anchor points."""
    lt, rb = jnp.split(dist, 2, axis=-1)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        return jnp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1], axis=-1)
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def bbox2dist(bboxes_xyxy: jnp.ndarray, anchor_points: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """Boxes -> (l, t, r, b) clipped to reg_max - 0.01 (reference `bbox2dist`)."""
    x1y1, x2y2 = jnp.split(bboxes_xyxy, 2, axis=-1)
    return jnp.clip(
        jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1),
        0,
        reg_max - 1 - 0.01,
    )


def dfl_decode(distri: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Integral of the softmax bin distribution (the DFL conv, `block.py:17-37`)."""
    *lead, four_r = distri.shape
    d = distri.reshape(*lead, 4, reg_max)
    p = jax.nn.softmax(d.astype(jnp.float32), axis=-1)
    return (p * jnp.arange(reg_max, dtype=jnp.float32)).sum(-1)


class Detect(nn.Module):
    """YOLOv8 detect head over nl feature levels."""

    nc: int = 80
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        ch = [f.shape[-1] for f in feats]
        c2 = max(16, ch[0] // 4, self.reg_max * 4)
        c3 = max(ch[0], min(self.nc, 100))
        box_flat, cls_flat = [], []
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        for i, f in enumerate(feats):
            b = ConvBN(c2, 3, name=f"cv2_{i}_0")(f, train)
            b = ConvBN(c2, 3, name=f"cv2_{i}_1")(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), name=f"cv2_{i}_2")(b)
            c = ConvBN(c3, 3, name=f"cv3_{i}_0")(f, train)
            c = ConvBN(c3, 3, name=f"cv3_{i}_1")(c, train)
            # cls bias prior (reference `Detect.bias_init`)
            c = nn.Conv(
                self.nc,
                (1, 1),
                name=f"cv3_{i}_2",
                bias_init=lambda k, s, dtype=jnp.float32, i=i: jnp.full(
                    s, float(np.log(5 / self.nc / (640 / self.strides[i]) ** 2)), dtype
                ),
            )(c)
            B = f.shape[0]
            box_flat.append(b.reshape(B, -1, 4 * self.reg_max))
            cls_flat.append(c.reshape(B, -1, self.nc))
        distri = jnp.concatenate(box_flat, 1)  # (B, A, 4*reg_max)
        scores = jnp.concatenate(cls_flat, 1)  # (B, A, nc)

        anchor_np, stride_np = make_anchors(shapes, self.strides)
        anchors = jnp.asarray(anchor_np)  # (A, 2) in cell units
        strides_a = jnp.asarray(stride_np)  # (A, 1)

        out = {
            "distri": distri,
            "scores": scores,
            "anchors": anchors,
            "strides": strides_a,
        }
        if not train:
            d = dfl_decode(distri, self.reg_max)
            boxes = dist2bbox(d, anchors[None], xywh=True) * strides_a[None]
            out["pred"] = jnp.concatenate(
                [boxes, jax.nn.sigmoid(scores.astype(jnp.float32))], axis=-1
            )
        return out


class Classify(nn.Module):
    """Image classification head (reference `nn/modules/head.py:152`):
    Conv 1x1 -> global average pool -> dropout -> Dense(nc). Returns logits."""

    nc: int = 1000
    c_hidden: int = 1280

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x = feats[-1] if isinstance(feats, (list, tuple)) else feats
        x = ConvBN(self.c_hidden, 1, 1)(x, train)
        x = x.mean(axis=(1, 2))  # global average pool
        logits = nn.Dense(self.nc)(x.astype(jnp.float32))
        return {"logits": logits, "pred": jax.nn.softmax(logits, axis=-1)}


class Proto(nn.Module):
    """Mask prototype module (reference `nn/modules/block.py:Proto`):
    Conv3x3 -> 2x transposed-conv upsample -> Conv3x3 -> 1x1 to nm protos."""

    c_: int = 256
    nm: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBN(self.c_, 3, name="cv1")(x, train)
        x = nn.ConvTranspose(self.c_, (2, 2), strides=(2, 2), name="upsample")(x)
        x = ConvBN(self.c_, 3, name="cv2")(x, train)
        return ConvBN(self.nm, 1, name="cv3")(x, train)


class Segment(nn.Module):
    """Instance segmentation head (reference `nn/modules/head.py:85`):
    Detect + per-anchor mask coefficients + prototype masks from P3."""

    nc: int = 80
    nm: int = 32
    npr: int = 256
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        out = Detect(self.nc, self.reg_max, self.strides, name="detect")(feats, train)
        protos = Proto(self.npr, self.nm, name="proto")(feats[0], train)  # (B, 2*H0, 2*W0, nm)
        c4 = max(feats[0].shape[-1] // 4, self.nm)
        mcs = []
        for i, f in enumerate(feats):
            m = ConvBN(c4, 3, name=f"cv4_{i}_0")(f, train)
            m = ConvBN(c4, 3, name=f"cv4_{i}_1")(m, train)
            m = nn.Conv(self.nm, (1, 1), name=f"cv4_{i}_2")(m)
            mcs.append(m.reshape(f.shape[0], -1, self.nm))
        out["mask_coefs"] = jnp.concatenate(mcs, 1)  # (B, A, nm)
        out["protos"] = protos
        return out


class Pose(nn.Module):
    """Keypoint detection head (reference `nn/modules/head.py:111`):
    Detect + per-anchor keypoint regression (kpt_shape = (nk, 3))."""

    nc: int = 1
    kpt_shape: Tuple[int, int] = (17, 3)
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        out = Detect(self.nc, self.reg_max, self.strides, name="detect")(feats, train)
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(feats[0].shape[-1] // 4, nk)
        ks = []
        for i, f in enumerate(feats):
            k = ConvBN(c4, 3, name=f"cv4_{i}_0")(f, train)
            k = ConvBN(c4, 3, name=f"cv4_{i}_1")(k, train)
            k = nn.Conv(nk, (1, 1), name=f"cv4_{i}_2")(k)
            ks.append(k.reshape(f.shape[0], -1, nk))
        kraw = jnp.concatenate(ks, 1)  # (B, A, nk)
        out["kpt_raw"] = kraw
        if not train:
            B, A, _ = kraw.shape
            k3 = kraw.reshape(B, A, *self.kpt_shape).astype(jnp.float32)
            anchors = out["anchors"][None, :, None, :]  # (1, A, 1, 2)
            strides_a = out["strides"][None, :, None, :]  # (1, A, 1, 1)
            xy = (k3[..., :2] * 2.0 + (anchors - 0.5)) * strides_a
            if self.kpt_shape[1] == 3:
                vis = jax.nn.sigmoid(k3[..., 2:3])
                out["keypoints"] = jnp.concatenate([xy, vis], -1)
            else:
                out["keypoints"] = xy
        return out
