"""Golden tests for box ops vs closed-form math (reference `utils/metrics.py:71-188`)."""

import math

import jax.numpy as jnp
import numpy as np

from tamtr_tpu.ops.boxes import bbox_iou, box_iou_pairwise, xywh2xyxy, xyxy2xywh


def np_riou(b1, b2, eps=1e-7):
    """Independent numpy transcription of the RIOU closed form for checking."""
    x1, y1, w1, h1 = b1
    x2, y2, w2, h2 = b2
    b1x1, b1x2, b1y1, b1y2 = x1 - w1 / 2, x1 + w1 / 2, y1 - h1 / 2, y1 + h1 / 2
    b2x1, b2x2, b2y1, b2y2 = x2 - w2 / 2, x2 + w2 / 2, y2 - h2 / 2, y2 + h2 / 2
    inter = max(0.0, min(b1x2, b2x2) - max(b1x1, b2x1)) * max(0.0, min(b1y2, b2y2) - max(b1y1, b2y1))
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
    c2 = (max(w1, h1) + max(w2, h2) + math.sqrt(rho2) + eps) ** 2
    v = (4 / math.pi**2) * (math.atan(w2 / h2) - math.atan(w1 / h1)) ** 2
    alpha = v / (v - iou + 1 + eps)
    return iou - (rho2 / c2 + v * alpha)


def test_format_roundtrip(rng):
    x = rng.uniform(0.1, 0.9, size=(32, 4)).astype(np.float32)
    out = np.asarray(xyxy2xywh(xywh2xyxy(jnp.asarray(x))))
    np.testing.assert_allclose(out, x, atol=1e-6)


def test_identity_iou():
    b = jnp.array([[0.5, 0.5, 0.2, 0.2]])
    iou = bbox_iou(b, b, xywh=True)
    np.testing.assert_allclose(np.asarray(iou), 1.0, atol=1e-5)
    riou = bbox_iou(b, b, xywh=True, RIOU=True)
    np.testing.assert_allclose(np.asarray(riou), 1.0, atol=1e-5)


def test_riou_matches_closed_form(rng):
    for _ in range(50):
        b1 = rng.uniform(0.2, 0.8, 2).tolist() + rng.uniform(0.05, 0.4, 2).tolist()
        b2 = rng.uniform(0.2, 0.8, 2).tolist() + rng.uniform(0.05, 0.4, 2).tolist()
        got = float(bbox_iou(jnp.array([b1]), jnp.array([b2]), xywh=True, RIOU=True)[0, 0])
        want = np_riou(b1, b2)
        assert abs(got - want) < 1e-5, (b1, b2, got, want)


def test_riou_rotation_invariance_of_normalizer():
    # swapping w/h of both boxes leaves max(w,h) and center distance unchanged
    b1 = jnp.array([[0.3, 0.3, 0.2, 0.1]])
    b2 = jnp.array([[0.6, 0.6, 0.1, 0.3]])
    r1 = bbox_iou(b1, b2, xywh=True, RIOU=True)
    b1s = jnp.array([[0.3, 0.3, 0.1, 0.2]])
    b2s = jnp.array([[0.6, 0.6, 0.3, 0.1]])
    r2 = bbox_iou(b1s, b2s, xywh=True, RIOU=True)
    # normalizer c2 identical; iou/v differ, but both stay finite and bounded
    assert np.isfinite(float(r1[0, 0])) and np.isfinite(float(r2[0, 0]))


def test_pairwise_iou(rng):
    a = np.sort(rng.uniform(0, 1, size=(5, 2, 2)), axis=1).reshape(5, 4).astype(np.float32)
    b = np.sort(rng.uniform(0, 1, size=(7, 2, 2)), axis=1).reshape(7, 4).astype(np.float32)
    a = a[:, [0, 2, 1, 3]]  # interleave to x1,y1,x2,y2
    b = b[:, [0, 2, 1, 3]]
    got = np.asarray(box_iou_pairwise(jnp.asarray(a), jnp.asarray(b)))
    assert got.shape == (5, 7)
    for i in range(5):
        for j in range(7):
            ix = max(0, min(a[i, 2], b[j, 2]) - max(a[i, 0], b[j, 0]))
            iy = max(0, min(a[i, 3], b[j, 3]) - max(a[i, 1], b[j, 1]))
            inter = ix * iy
            union = (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1]) + (b[j, 2] - b[j, 0]) * (
                b[j, 3] - b[j, 1]
            ) - inter
            np.testing.assert_allclose(got[i, j], inter / (union + 1e-7), atol=1e-5)


def test_bboxes_container():
    from tamtr_tpu.utils.instance import Bboxes

    b = Bboxes(np.array([[10.0, 10.0, 20.0, 30.0]]), "xyxy")
    b.convert("xywh")
    np.testing.assert_allclose(b.bboxes, [[15, 20, 10, 20]])
    b.convert("ltwh")
    np.testing.assert_allclose(b.bboxes, [[10, 10, 10, 20]])
    b.convert("xyxy")
    np.testing.assert_allclose(b.bboxes, [[10, 10, 20, 30]])
    assert b.areas()[0] == 200
    b.mul((2, 2, 2, 2))
    b.add((1, 1, 1, 1))
    np.testing.assert_allclose(b.bboxes, [[21, 21, 41, 61]])
    cat = Bboxes.concatenate([b, b])
    assert len(cat) == 2


def test_instances_geometry():
    from tamtr_tpu.utils.instance import Instances

    boxes = np.array([[0.5, 0.5, 0.25, 0.5]])  # normalized cxcywh
    segs = [np.array([[0.4, 0.3], [0.6, 0.7]], np.float32) * np.array([100, 80])]
    kpts = np.array([[[50.0, 40.0, 1.0]]])
    inst = Instances(boxes, None, None, bbox_format="xywh", normalized=True)
    inst.denormalize(100, 80)
    np.testing.assert_allclose(inst.bboxes, [[50, 40, 25, 40]])
    inst.convert_bbox("xyxy")
    np.testing.assert_allclose(inst.bboxes, [[37.5, 20, 62.5, 60]])
    inst2 = Instances(inst.bboxes.copy(), segs, kpts, "xyxy", normalized=False)
    inst2.fliplr(100)
    np.testing.assert_allclose(inst2.bboxes, [[37.5, 20, 62.5, 60]])
    assert inst2.keypoints[0, 0, 0] == 50.0
    inst2.flipud(80)
    np.testing.assert_allclose(inst2.bboxes, [[37.5, 20, 62.5, 60]])
    inst2.add_padding(10, 5)
    np.testing.assert_allclose(inst2.bboxes, [[47.5, 25, 72.5, 65]])
    inst2.clip(60, 60)
    assert inst2.bboxes[:, 2].max() <= 60
    # zero-area removal
    inst3 = Instances(np.array([[0, 0, 0, 0], [1, 1, 5, 5]], np.float32), bbox_format="xyxy", normalized=False)
    keep = inst3.remove_zero_area_boxes()
    assert keep.tolist() == [False, True] and len(inst3) == 1
    cat = Instances.concatenate([inst3, inst3])
    assert len(cat) == 2
