"""mAP-protocol equivalence against the ACTUAL reference metrics code.

The 39.7 mAP@0.5 VisDrone headline cannot be reproduced in this image
(dataset + CLIP weights are egress-blocked), but every link of the metric
pipeline CAN be proven now: identical synthetic predictions + labels are
fed through (a) the reference's own numpy `ap_per_class` / `DetMetrics`
(`/root/reference/ultralytics/utils/metrics.py:1032-1387`), the reference
`BaseValidator.match_predictions` TP-table builder
(`engine/validator.py:208-247`) and the reference
`RTDETRWorldValidator.postprocess` NMS chain
(`models/rtdetrworld/val.py:102-128`), and (b) this package's
implementations — and the outputs are asserted equal. Combined with the
ported-weights forward/loss parity in test_port.py, this closes the
protocol chain short of real data.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference tree unavailable")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="module")
def ref_metrics():
    torch = pytest.importorskip("torch")
    torch.set_num_threads(1)
    from tools.refstubs import install_reference_stubs

    install_reference_stubs(str(REF))
    import ultralytics.utils.metrics as m

    return m


def _synthetic_stats(seed, n_img=12, nc=6, max_pred=40, max_gt=15):
    """Random per-image (tp, conf, pred_cls, target_cls) detection stats."""
    rng = np.random.default_rng(seed)
    stats = []
    for _ in range(n_img):
        npr = int(rng.integers(0, max_pred))
        ngt = int(rng.integers(0, max_gt))
        tp = rng.random((npr, 10)) < np.linspace(0.6, 0.1, 10)
        # enforce TP monotonicity over IoU thresholds (true tables have it)
        tp = np.sort(tp, axis=1)[:, ::-1]
        stats.append((
            tp.astype(bool),
            rng.random(npr).astype(np.float32),
            rng.integers(0, nc, npr).astype(np.float32),
            rng.integers(0, nc, ngt).astype(np.float32),
        ))
    return stats


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ap_per_class_equivalence(ref_metrics, seed):
    """ap / precision / recall match the reference's ap_per_class exactly."""
    from tamtr_tpu.utils.metrics import ap_per_class

    stats = _synthetic_stats(seed)
    tp = np.concatenate([s[0] for s in stats])
    conf = np.concatenate([s[1] for s in stats])
    pcls = np.concatenate([s[2] for s in stats])
    tcls = np.concatenate([s[3] for s in stats])

    names = {i: f"c{i}" for i in range(6)}
    ref = ref_metrics.ap_per_class(tp, conf, pcls, tcls, plot=False, names=names)
    # reference returns (tp, fp, p, r, f1, ap, unique_classes, ...)
    _, _, ref_p, ref_r, _, ref_ap, ref_classes = ref[:7]

    ours = ap_per_class(tp, conf, pcls, tcls)
    np.testing.assert_array_equal(ours["classes"].astype(int), ref_classes)
    np.testing.assert_allclose(ours["ap"], ref_ap, atol=1e-9)
    np.testing.assert_allclose(ours["precision"], ref_p, atol=1e-9)
    np.testing.assert_allclose(ours["recall"], ref_r, atol=1e-9)


def test_detmetrics_equivalence(ref_metrics):
    """mAP50 / mAP50-95 / P / R / fitness match the reference DetMetrics."""
    from tamtr_tpu.utils.metrics import DetMetrics

    stats = _synthetic_stats(3)
    names = {i: f"c{i}" for i in range(6)}
    ref_dm = ref_metrics.DetMetrics(names=names)
    ref_dm.process(
        np.concatenate([s[0] for s in stats]),
        np.concatenate([s[1] for s in stats]),
        np.concatenate([s[2] for s in stats]),
        np.concatenate([s[3] for s in stats]),
    )
    ref_res = ref_dm.results_dict  # keys: metrics/precision(B), ... fitness

    dm = DetMetrics()
    for s in stats:
        dm.update(*s)
    res = dm.compute()

    assert abs(res["mAP50"] - ref_res["metrics/mAP50(B)"]) < 1e-9
    assert abs(res["mAP50-95"] - ref_res["metrics/mAP50-95(B)"]) < 1e-9
    assert abs(res["precision"] - ref_res["metrics/precision(B)"]) < 1e-9
    assert abs(res["recall"] - ref_res["metrics/recall(B)"]) < 1e-9
    assert abs(res["fitness"] - ref_res["fitness"]) < 1e-9


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_match_predictions_equivalence(ref_metrics, seed):
    """TP tables match the reference BaseValidator.match_predictions,
    including the fork's commented-out second IoU sort (validator.py:244)."""
    import torch
    import types

    from ultralytics.engine.validator import BaseValidator

    from tamtr_tpu.utils.metrics import IOUV, box_iou_np, match_predictions

    rng = np.random.default_rng(seed)
    npr, ngt, nc = 60, 25, 5
    # clustered boxes force contested many-to-many IoU overlaps
    centers = rng.random((8, 2)) * 500
    def boxes(n):
        c = centers[rng.integers(0, 8, n)] + rng.normal(0, 12, (n, 2))
        wh = rng.uniform(20, 80, (n, 2))
        return np.concatenate([c - wh / 2, c + wh / 2], 1).astype(np.float32)

    pb, gb = boxes(npr), boxes(ngt)
    pc = rng.integers(0, nc, npr).astype(np.float32)
    gc = rng.integers(0, nc, ngt).astype(np.float32)

    dummy = types.SimpleNamespace(iouv=torch.from_numpy(IOUV.astype(np.float32)))
    # reference takes iou as (Ngt, Npred)
    iou_t = torch.from_numpy(box_iou_np(gb, pb).astype(np.float32))
    ref_correct = BaseValidator.match_predictions(
        dummy, torch.from_numpy(pc), torch.from_numpy(gc), iou_t
    ).numpy()

    ours = match_predictions(pb, pc, gb, gc)
    np.testing.assert_array_equal(ours, ref_correct)


def test_val_postprocess_chain_equivalence(ref_metrics):
    """conf filter -> class-offset NMS(iou 0.6) chain matches the reference
    RTDETRWorldValidator.postprocess (models/rtdetrworld/val.py:102-128).

    torchvision is stubbed in this image, so its `ops.nms` stub is replaced
    with an exact greedy torch oracle (suppress at IoU > thr, score order) —
    the documented torchvision.ops.nms contract the reference calls.
    """
    import torch
    import types
    import torchvision

    def oracle_nms(b, s, thr):
        order = torch.argsort(s, descending=True)
        alive = torch.ones(len(order), dtype=torch.bool)
        keep = []
        area = (b[:, 2] - b[:, 0]).clamp(min=0) * (b[:, 3] - b[:, 1]).clamp(min=0)
        for ii in range(len(order)):
            if not alive[ii]:
                continue
            i = order[ii]
            keep.append(int(i))
            rest = order[ii + 1:]
            lt = torch.maximum(b[i, :2], b[rest, :2])
            rb = torch.minimum(b[i, 2:], b[rest, 2:])
            inter = (rb - lt).clamp(min=0).prod(-1)
            iou = inter / (area[i] + area[rest] - inter + 1e-7)
            alive[ii + 1:] &= iou <= thr
        return torch.tensor(keep, dtype=torch.long)

    old_nms = torchvision.ops.nms
    torchvision.ops.nms = oracle_nms
    try:
        from ultralytics.models.rtdetrworld.val import RTDETRValidator

        rng = np.random.default_rng(5)
        B, nq, nc, imgsz = 2, 100, 6, 640
        # overlapping normalized cxcywh boxes + sigmoid-like scores
        cx = rng.uniform(0.2, 0.8, (B, nq, 2))
        wh = rng.uniform(0.05, 0.3, (B, nq, 2))
        scores = rng.random((B, nq, nc)) * 0.9
        pred = np.concatenate([cx, wh, scores], -1).astype(np.float32)

        args = types.SimpleNamespace(imgsz=imgsz, conf=0.25, iou=0.6, single_cls=False)
        dummy = types.SimpleNamespace(args=args)
        ref_out = RTDETRValidator.postprocess(
            dummy, [torch.from_numpy(pred.copy())]
        )

        import jax.numpy as jnp

        from tamtr_tpu.ops.boxes import xywh2xyxy
        from tamtr_tpu.ops.nms import postprocess_predictions

        # (a) protocol mode: legacy_val_mask replicates the reference val
        # quirk (conf mask computed pre-sort, applied post-sort,
        # val.py:114-119 — live in the published conf=0.4 protocol).
        boxes, scr, labels, valid, _ = postprocess_predictions(
            jnp.asarray(pred), conf_thres=0.25, iou_thres=0.6, max_det=nq,
            legacy_val_mask=True,
        )
        for i in range(B):
            ref_i = ref_out[i].numpy()  # (k, 6) xyxy(pixels), score, cls
            k = int(np.asarray(valid[i]).sum())
            assert k == len(ref_i), (k, len(ref_i))
            ours_boxes = np.asarray(boxes[i][:k]) * imgsz
            np.testing.assert_allclose(ours_boxes, ref_i[:, :4], atol=1e-3)
            np.testing.assert_allclose(np.asarray(scr[i][:k]), ref_i[:, 4], atol=1e-6)
            np.testing.assert_array_equal(np.asarray(labels[i][:k]), ref_i[:, 5])

        # (b) clean mode matches the reference PREDICT semantics (mask
        # applied in original order before NMS, predict.py:60-71).
        boxes, scr, labels, valid, _ = postprocess_predictions(
            jnp.asarray(pred), conf_thres=0.25, iou_thres=0.6, max_det=nq
        )
        xyxy = np.asarray(xywh2xyxy(jnp.asarray(pred[..., :4])))
        for i in range(B):
            score_t = torch.from_numpy(pred[i, :, 4:]).max(-1)
            idx = score_t.values > 0.25
            p = torch.cat(
                [torch.from_numpy(xyxy[i]), score_t.values[:, None],
                 score_t.indices.float()[:, None]], -1
            )[idx]
            oi = oracle_nms(
                p[:, :4] + p[:, 5:6] * 7680, p[:, 4], 0.6
            )
            ref_i = p[oi].numpy()
            k = int(np.asarray(valid[i]).sum())
            assert k == len(ref_i), (k, len(ref_i))
            np.testing.assert_allclose(
                np.asarray(boxes[i][:k]), ref_i[:, :4], atol=2e-6
            )
            np.testing.assert_allclose(np.asarray(scr[i][:k]), ref_i[:, 4], atol=1e-6)
            np.testing.assert_array_equal(np.asarray(labels[i][:k]), ref_i[:, 5])
    finally:
        torchvision.ops.nms = old_nms
