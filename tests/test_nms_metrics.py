"""NMS vs O(N^2) numpy reference; metrics sanity (perfect/imperfect detections)."""

import jax.numpy as jnp
import numpy as np

from tamtr_tpu.ops.nms import multiclass_nms, nms, postprocess_predictions
from tamtr_tpu.utils.metrics import DetMetrics, ap_per_class, compute_ap, match_predictions


def np_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    sup = np.zeros(len(boxes), bool)
    for i in order:
        if sup[i] or scores[i] <= 0:
            continue
        keep.append(i)
        for j in order:
            if j == i or sup[j]:
                continue
            tl = np.maximum(boxes[i, :2], boxes[j, :2])
            br = np.minimum(boxes[i, 2:], boxes[j, 2:])
            inter = np.clip(br - tl, 0, None).prod()
            a1 = np.clip(boxes[i, 2:] - boxes[i, :2], 0, None).prod()
            a2 = np.clip(boxes[j, 2:] - boxes[j, :2], 0, None).prod()
            if inter / (a1 + a2 - inter + 1e-7) > thr:
                sup[j] = True
    return keep


def test_nms_matches_reference(rng):
    N = 60
    centers = rng.uniform(0.2, 0.8, (N, 2))
    wh = rng.uniform(0.05, 0.3, (N, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, N).astype(np.float32)
    keep, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_det=N)
    got = list(np.asarray(keep)[np.asarray(valid)])
    want = np_nms(boxes, scores, 0.5)
    assert got == want


def test_multiclass_nms_no_cross_class_suppression():
    boxes = jnp.array([[0.1, 0.1, 0.5, 0.5], [0.1, 0.1, 0.5, 0.5]])
    scores = jnp.array([0.9, 0.8])
    labels = jnp.array([0, 1])
    keep, valid = multiclass_nms(boxes, scores, labels, 0.5, max_det=4)
    assert int(np.asarray(valid).sum()) == 2  # identical boxes, different classes


def test_postprocess_shapes(rng):
    B, nq, nc = 2, 20, 5
    pred = np.concatenate(
        [rng.uniform(0.2, 0.8, (B, nq, 4)), rng.uniform(0, 1, (B, nq, nc))], -1
    ).astype(np.float32)
    boxes, scores, labels, valid, kept = postprocess_predictions(
        jnp.asarray(pred), conf_thres=0.4, iou_thres=0.6, max_det=10
    )
    assert boxes.shape == (B, 10, 4) and scores.shape == (B, 10)
    assert kept.shape == (B, 10)
    assert np.asarray(scores)[~np.asarray(valid)].max(initial=0) == 0


def test_compute_ap_perfect():
    ap, _, _ = compute_ap(np.array([0.5, 1.0]), np.array([1.0, 1.0]))
    assert abs(ap - 1.0) < 0.02  # 101-pt interpolation quantization


def test_metrics_perfect_detection():
    m = DetMetrics()
    gt = np.array([[10, 10, 50, 50], [60, 60, 90, 90]], np.float32)
    gt_cls = np.array([0, 1])
    tp = match_predictions(gt, gt_cls, gt, gt_cls)
    assert tp.all()
    m.update(tp, np.array([0.9, 0.8]), gt_cls, gt_cls)
    res = m.compute()
    assert res["mAP50"] > 0.99 and res["mAP50-95"] > 0.99


def test_metrics_false_positive():
    m = DetMetrics()
    gt = np.array([[10, 10, 50, 50]], np.float32)
    gt_cls = np.array([0])
    preds = np.array([[10, 10, 50, 50], [100, 100, 140, 140]], np.float32)
    pred_cls = np.array([0, 0])
    tp = match_predictions(preds, pred_cls, gt, gt_cls)
    assert tp[0].all() and not tp[1].any()
    m.update(tp, np.array([0.9, 0.95]), pred_cls, gt_cls)
    res = m.compute()
    assert 0.3 < res["mAP50"] < 0.9  # high-conf FP caps precision


def test_match_predictions_one_gt_one_match():
    # two predictions on the same gt: only the higher-IoU one is TP
    gt = np.array([[0, 0, 10, 10]], np.float32)
    preds = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    cls = np.array([0, 0])
    tp = match_predictions(preds, cls, gt, np.array([0]))
    assert tp[0, 0] and not tp[1, 0]


def test_confusion_matrix_detect():
    from tamtr_tpu.utils.metrics import ConfusionMatrix

    cm = ConfusionMatrix(nc=3, conf=0.25, iou_thres=0.45)
    gt_boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    gt_cls = np.array([0, 1])
    # one TP (cls 0), one misclass (cls 2 on the cls-1 gt), one FP far away
    pred_boxes = np.array(
        [[0, 0, 10, 10], [20, 20, 30, 30], [50, 50, 60, 60]], np.float32
    )
    cm.process_batch(pred_boxes, np.array([0.9, 0.8, 0.7]), np.array([0, 2, 1]),
                     gt_boxes, gt_cls)
    assert cm.matrix[0, 0] == 1          # true positive
    assert cm.matrix[2, 1] == 1          # misclassification
    assert cm.matrix[1, 3] == 1          # FP -> background column
    # empty preds: all gt become FN
    cm2 = ConfusionMatrix(nc=3)
    cm2.process_batch(None, None, None, gt_boxes, gt_cls)
    assert cm2.matrix[3, 0] == 1 and cm2.matrix[3, 1] == 1
    tp, fp = cm.tp_fp()
    assert tp.tolist() == [1, 0, 0] and fp.tolist() == [0, 1, 1]


def test_confusion_matrix_classify():
    from tamtr_tpu.utils.metrics import ConfusionMatrix

    cm = ConfusionMatrix(nc=2, task="classify")
    cm.process_cls_preds([0, 1, 1], [0, 1, 0])
    assert cm.matrix[0, 0] == 1 and cm.matrix[1, 1] == 1 and cm.matrix[1, 0] == 1


def test_postprocess_classes_filter():
    """classes= drops boxes whose BEST class is outside the list (reference
    predict.py:64-66 filters after argmax, no re-assignment)."""
    import jax.numpy as jnp
    import numpy as np

    from tamtr_tpu.ops.nms import postprocess_predictions

    pred = np.zeros((1, 3, 4 + 3), np.float32)
    pred[0, :, :4] = [[0.2, 0.2, 0.1, 0.1], [0.5, 0.5, 0.1, 0.1], [0.8, 0.8, 0.1, 0.1]]
    pred[0, 0, 4:] = [0.9, 0.1, 0.1]   # best cls 0
    pred[0, 1, 4:] = [0.6, 0.8, 0.1]   # best cls 1 (cls 0 also passes conf)
    pred[0, 2, 4:] = [0.1, 0.1, 0.7]   # best cls 2
    b, s, l, v, _ = postprocess_predictions(
        jnp.asarray(pred), conf_thres=0.25, iou_thres=0.6, max_det=3,
        classes=(0,),
    )
    kept = np.asarray(l)[np.asarray(v)]
    # only the box whose BEST class is 0 survives; box 1 is dropped, not
    # re-assigned to its second-best allowed class
    assert list(kept) == [0]
    assert int(np.asarray(v).sum()) == 1


def test_postprocess_single_cls():
    """single_cls: all detections share class 0 and suppress each other."""
    import jax.numpy as jnp
    import numpy as np

    from tamtr_tpu.ops.nms import postprocess_predictions

    # two heavily-overlapping boxes with different best classes
    pred = np.zeros((1, 2, 4 + 2), np.float32)
    pred[0, 0] = [0.5, 0.5, 0.2, 0.2, 0.9, 0.1]
    pred[0, 1] = [0.51, 0.5, 0.2, 0.2, 0.1, 0.8]
    b, s, l, v, _ = postprocess_predictions(
        jnp.asarray(pred), conf_thres=0.25, iou_thres=0.6, max_det=2,
    )
    assert int(np.asarray(v).sum()) == 2  # multi-class: both survive
    b, s, l, v, _ = postprocess_predictions(
        jnp.asarray(pred), conf_thres=0.25, iou_thres=0.6, max_det=2,
        single_cls=True,
    )
    assert int(np.asarray(v).sum()) == 1  # single-cls: NMS merges them
    assert list(np.asarray(l)[np.asarray(v)]) == [0]
