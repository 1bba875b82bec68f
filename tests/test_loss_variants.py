"""Slide/EMASlide/NWD/Wise-IoU variant tests vs reference formulas."""

import math

import jax.numpy as jnp
import numpy as np

from tamtr_tpu.losses import variants as V


def test_slide_weight_bands():
    auto_iou = 0.5
    true = jnp.asarray([0.1, 0.45, 0.7, 1.0])
    w = np.asarray(V.slide_weight(true, auto_iou))
    # band 1: true <= 0.4 -> 1.0
    np.testing.assert_allclose(w[0], 1.0)
    # band 2: 0.4 < true < 0.5 -> e^(1-0.5)
    np.testing.assert_allclose(w[1], math.exp(0.5), rtol=1e-6)
    # band 3: true >= 0.5 -> e^-(true-1)
    np.testing.assert_allclose(w[2], math.exp(0.3), rtol=1e-6)
    np.testing.assert_allclose(w[3], 1.0, rtol=1e-6)


def test_slide_weight_clamps_low_auto_iou():
    # reference: auto_iou < 0.2 -> 0.2
    w1 = np.asarray(V.slide_weight(jnp.asarray([0.05]), 0.05))
    w2 = np.asarray(V.slide_weight(jnp.asarray([0.05]), 0.2))
    np.testing.assert_allclose(w1, w2)


def test_slide_loss_matches_manual_bce():
    pred = jnp.asarray([[0.3, -1.2]])
    true = jnp.asarray([[1.0, 0.0]])
    got = np.asarray(V.slide_loss(pred, true, 0.5))
    bce = -np.log([1 / (1 + math.exp(-0.3)), 1 - 1 / (1 + math.exp(1.2))])
    w = np.asarray(V.slide_weight(true, 0.5))[0]
    np.testing.assert_allclose(got[0], bce * w, rtol=1e-5)


def test_ema_slide_update():
    mean, updates = jnp.float32(1.0), jnp.int32(0)
    mean, updates = V.ema_slide_update(mean, updates, 0.6)
    d = 0.999 * (1 - math.exp(-1 / 2000))
    np.testing.assert_allclose(float(mean), d * 1.0 + (1 - d) * 0.6, rtol=1e-5)
    assert int(updates) == 1
    # sentinel -1 skips
    mean2, updates2 = V.ema_slide_update(mean, updates, -1.0)
    assert float(mean2) == float(mean) and int(updates2) == 1


def test_nwd_identity_and_decay():
    b = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
    same = float(V.wasserstein_similarity(b, b)[0, 0])
    assert same > 0.99  # exp(-sqrt(eps)/C) ~ 1
    far = jnp.asarray([[0.9, 0.9, 0.2, 0.2]])
    assert float(V.wasserstein_similarity(b, far)[0, 0]) < same


def test_wise_iou_perfect_box_and_mean_update():
    p = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
    loss, new_mean = V.wise_iou(p, p, jnp.float32(1.0), monotonous=False)
    # iou_plain=1 -> focaler-clamped iou term (1-clip((1-0)/0.95)) = 0 -> loss 0
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(new_mean), 0.99 * 1.0, rtol=1e-5)


def test_wise_iou_v2_vs_v3_scaling():
    p = jnp.asarray([[0.4, 0.4, 0.2, 0.2]])
    t = jnp.asarray([[0.6, 0.6, 0.2, 0.2]])
    # iou_mean=0.5 (not the fixed point) so the v2/v3 focusing terms differ
    l1, _ = V.wise_iou(p, t, jnp.float32(0.5), monotonous=None, training=False)
    l2, _ = V.wise_iou(p, t, jnp.float32(0.5), monotonous=True, training=False)
    l3, _ = V.wise_iou(p, t, jnp.float32(0.5), monotonous=False, training=False)
    v1, v2, v3 = float(l1[0]), float(l2[0]), float(l3[0])
    assert np.isfinite([v1, v2, v3]).all()
    assert v1 != v2 != v3


def test_detr_loss_variant_flags_run():
    """Loss flags produce finite totals on synthetic outputs."""
    import jax

    from tamtr_tpu.losses.detr_loss import DETRLossConfig, rtdetr_detection_loss

    B, nq, nc, M, ndl = 2, 6, 3, 4, 2
    k = jax.random.PRNGKey(0)
    outputs = {
        "dec_bboxes": jax.nn.sigmoid(jax.random.normal(k, (ndl, B, nq, 4))),
        "dec_scores": jax.random.normal(k, (ndl, B, nq, nc)),
        "enc_bboxes": jax.nn.sigmoid(jax.random.normal(k, (B, nq, 4))),
        "enc_scores": jax.random.normal(k, (B, nq, nc)),
        "num_dn": 0,
        "dn_groups": 0,
    }
    targets = {
        "cls": jnp.zeros((B, M), jnp.int32),
        "bboxes": jnp.full((B, M, 4), 0.4),
        "mask": jnp.tile(jnp.arange(M)[None] < 2, (B, 1)),
    }
    for kw in (
        {"use_sl": True},
        {"use_svfl": True},
        {"nwd_loss": True},
        {"use_wiseiou": True},
        {"use_wiseiou": True, "nwd_loss": True},
    ):
        cfg = DETRLossConfig(nc=nc, **kw)
        total, items = rtdetr_detection_loss(outputs, targets, cfg)
        assert np.isfinite(float(total)), kw
