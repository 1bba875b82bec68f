"""YOLO detect family: head shapes, TAL assigner behavior, v8 loss."""

import jax
import jax.numpy as jnp
import numpy as np

from tamtr_tpu.losses.tal import task_aligned_assigner
from tamtr_tpu.losses.v8_loss import V8LossConfig, v8_detection_loss
from tamtr_tpu.nn.graph import TAMTRModel
from tamtr_tpu.nn.yolo_head import bbox2dist, dfl_decode, dist2bbox, make_anchors


def test_make_anchors():
    pts, strs = make_anchors([(4, 4), (2, 2)], [8, 16])
    assert pts.shape == (20, 2) and strs.shape == (20, 1)
    np.testing.assert_allclose(pts[0], [0.5, 0.5])
    assert strs[0, 0] == 8 and strs[-1, 0] == 16


def test_dist_bbox_roundtrip(rng):
    pts = jnp.asarray(rng.uniform(4, 10, (6, 2)).astype(np.float32))
    dist = jnp.asarray(rng.uniform(0.5, 3.5, (6, 4)).astype(np.float32))
    boxes = dist2bbox(dist, pts, xywh=False)
    back = bbox2dist(boxes, pts, reg_max=16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(dist), atol=1e-5)


def test_dfl_decode_peak():
    # a distribution peaked at bin 3 decodes to ~3
    logits = np.full((1, 1, 64), -10.0, np.float32)
    logits[..., 3] = 10.0  # first of the 4 ltrb groups
    d = dfl_decode(jnp.asarray(logits), 16)
    assert abs(float(d[0, 0, 0]) - 3.0) < 0.05


def test_tal_assigns_center_anchor(rng):
    B, A, nc, M = 1, 16, 3, 2
    pts = jnp.asarray(make_anchors([(4, 4)], [1])[0])  # 4x4 grid, centers 0.5..3.5
    gt = jnp.array([[[0.0, 0.0, 2.0, 2.0], [2.0, 2.0, 4.0, 4.0]]])  # two quadrants
    gt_cls = jnp.array([[0, 1]])
    mask = jnp.ones((1, 2), bool)
    # perfect predictions: boxes == gt at the right anchors
    pred_boxes = jnp.tile(jnp.array([[1.0, 1.0, 2.0, 2.0]]), (A, 1))[None]
    scores = jnp.full((B, A, nc), 0.5)
    out = task_aligned_assigner(scores, pred_boxes, pts, gt_cls, gt, mask)
    fg = np.asarray(out["fg_mask"])[0]
    assert fg.any()
    # all fg anchors fall inside one of the gts
    tgt = np.asarray(out["target_gt"])[0]
    for a in np.nonzero(fg)[0]:
        x, y = np.asarray(pts)[a]
        g = tgt[a]
        box = np.asarray(gt)[0, g]
        assert box[0] < x < box[2] and box[1] < y < box[3]


def test_yolo_model_forward_and_loss():
    model = TAMTRModel.from_yaml("yolo-gelan.yaml", nc=5)
    # non-constant input: BN train-mode grads are NaN on all-constant batches
    img = jax.random.uniform(jax.random.PRNGKey(9), (1, 64, 64, 3))
    txt = jnp.zeros((1, 5, 512), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "cdn": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        img, txt, None, False,
    )
    out = model.apply(variables, img, txt, None, False)
    A = (64 // 8) ** 2 + (64 // 16) ** 2 + (64 // 32) ** 2
    assert out["pred"].shape == (1, A, 9)
    # train forward + loss + grad
    targets = {
        "cls": jnp.zeros((1, 4), jnp.int32),
        "bboxes": jnp.full((1, 4, 4), 0.4, jnp.float32).at[..., 2:].set(0.2),
        "mask": jnp.ones((1, 4), bool).at[0, 2:].set(False),
    }

    def loss_fn(params):
        o, _ = model.apply(
            {**variables, "params": params}, img, txt, targets, True,
            rngs={"cdn": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        total, items = v8_detection_loss(o, targets, V8LossConfig(nc=5, imgsz=64))
        return total

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    gn = float(jax.tree.reduce(lambda a, x: a + jnp.abs(x).sum(), grads, 0.0))
    assert np.isfinite(gn) and gn > 0


def test_classify_head_forward():
    model = TAMTRModel.from_yaml("classify-gelan.yaml", nc=7)
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    txt = jnp.zeros((2, 7, 512), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "cdn": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        img, txt, None, False,
    )
    out = model.apply(variables, img, txt, None, False)
    assert out["logits"].shape == (2, 7)
    np.testing.assert_allclose(np.asarray(out["pred"].sum(-1)), 1.0, atol=1e-5)


def test_segment_head_and_loss():
    from tamtr_tpu.losses.v8_seg_loss import V8SegLossConfig, v8_segmentation_loss

    model = TAMTRModel.from_yaml("yolo-seg-gelan.yaml", nc=4)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    txt = jnp.zeros((1, 4, 512), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "cdn": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        img, txt, None, False,
    )
    out = model.apply(variables, img, txt, None, False)
    A = (64 // 8) ** 2 + (64 // 16) ** 2 + (64 // 32) ** 2
    assert out["mask_coefs"].shape == (1, A, 32)
    assert out["protos"].shape == (1, 16, 16, 32)  # 2x the P3 (stride 8) map
    assert out["pred"].shape == (1, A, 8)

    M, Hm, Wm = 4, 16, 16
    masks = np.zeros((1, M, Hm, Wm), np.float32)
    masks[0, 0, 4:10, 4:10] = 1.0
    masks[0, 1, 8:14, 2:8] = 1.0
    targets = {
        "cls": jnp.zeros((1, M), jnp.int32),
        "bboxes": jnp.asarray(
            np.array([[[0.45, 0.45, 0.35, 0.35], [0.3, 0.7, 0.3, 0.3],
                       [0.5, 0.5, 0.1, 0.1], [0.5, 0.5, 0.1, 0.1]]], np.float32)
        ),
        "mask": jnp.array([[True, True, False, False]]),
        "masks": jnp.asarray(masks),
    }
    cfg = V8SegLossConfig(nc=4, imgsz=64, mask_topk=32)

    def loss_fn(params):
        o, _ = model.apply(
            {**variables, "params": params}, img, txt, targets, True,
            rngs={"cdn": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        total, items = v8_segmentation_loss(o, targets, cfg)
        return total, items

    (loss, items), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss)) and "seg" in items
    gn = float(jax.tree.reduce(lambda a, x: a + jnp.abs(x).sum(), grads, 0.0))
    assert np.isfinite(gn) and gn > 0


def test_pose_head_and_loss():
    from tamtr_tpu.losses.v8_pose_loss import V8PoseLossConfig, v8_pose_loss

    model = TAMTRModel.from_yaml("yolo-pose-gelan.yaml", nc=1)
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    txt = jnp.zeros((1, 1, 512), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "cdn": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        img, txt, None, False,
    )
    out = model.apply(variables, img, txt, None, False)
    A = (64 // 8) ** 2 + (64 // 16) ** 2 + (64 // 32) ** 2
    assert out["kpt_raw"].shape == (1, A, 51)
    assert out["keypoints"].shape == (1, A, 17, 3)

    M = 2
    kpts = np.zeros((1, M, 17, 3), np.float32)
    kpts[0, 0, :, 0] = 30.0
    kpts[0, 0, :, 1] = 30.0
    kpts[0, 0, :, 2] = 2.0  # visible
    targets = {
        "cls": jnp.zeros((1, M), jnp.int32),
        "bboxes": jnp.asarray(np.array([[[0.5, 0.5, 0.4, 0.4], [0.2, 0.2, 0.1, 0.1]]], np.float32)),
        "mask": jnp.array([[True, False]]),
        "keypoints": jnp.asarray(kpts),
    }
    cfg = V8PoseLossConfig(nc=1, imgsz=64, mask_topk=32)

    def loss_fn(params):
        o, _ = model.apply(
            {**variables, "params": params}, img, txt, targets, True,
            rngs={"cdn": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"],
        )
        total, items = v8_pose_loss(o, targets, cfg)
        return total, items

    (loss, items), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss)) and "pose" in items and "kobj" in items
    gn = float(jax.tree.reduce(lambda a, x: a + jnp.abs(x).sum(), grads, 0.0))
    assert np.isfinite(gn) and gn > 0
