"""Unit tests for decoder internals: anchors, CDN group, attn mask, deformable core."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tamtr_tpu.nn.decoder import (
    cdn_attn_mask,
    generate_anchors,
    get_cdn_group,
    inverse_sigmoid,
    ms_deform_attn_core,
)


def test_generate_anchors_semantics():
    """Matches the reference formula (`head.py:1177-1200`): centers at
    (x+0.5)/h (reference divides by (h, w) — replicated), wh = 0.05 * 2^i,
    invalid (outside eps margin) -> +inf in logit space."""
    anchors, valid = generate_anchors([(4, 4), (2, 2)])
    assert anchors.shape == (20, 4) and valid.shape == (20, 1)
    # first anchor of level 0: xy = (0.5/4, 0.5/4), wh = 0.05
    a0 = anchors[0]
    x = 0.5 / 4
    np.testing.assert_allclose(a0[0], math.log(x / (1 - x)), rtol=1e-5)
    np.testing.assert_allclose(a0[2], math.log(0.05 / 0.95), rtol=1e-5)
    # level 1 wh doubles
    a1 = anchors[16]
    np.testing.assert_allclose(a1[2], math.log(0.1 / 0.9), rtol=1e-5)
    assert valid.all()  # all these centers are inside (eps, 1-eps)


def test_cdn_attn_mask_isolation():
    """Queries never see dn; dn groups are block-isolated (`ops.py:272-284`)."""
    num_dn, nq, block = 8, 4, 4  # two isolation blocks
    m = cdn_attn_mask(num_dn, nq, block)
    assert m.shape == (12, 12)
    assert m[num_dn:, :num_dn].all()  # queries blocked from dn
    assert not m[num_dn:, num_dn:].any()  # queries see each other
    assert not m[:4, :4].any() and not m[4:8, 4:8].any()  # within-block visible
    assert m[:4, 4:8].all() and m[4:8, :4].all()  # cross-block hidden
    assert not m[:8, 8:].any()  # dn CAN see matching queries (reference quirk)


def test_cdn_group_layout(rng):
    B, M, nc, hd, G = 2, 4, 5, 8, 2
    gt_cls = jnp.asarray(rng.integers(0, nc, (B, M)).astype(np.int32))
    gt_bbox = jnp.asarray(rng.uniform(0.3, 0.6, (B, M, 4)).astype(np.float32))
    gt_mask = jnp.array([[True, True, True, False], [True, False, False, False]])
    class_embed = jnp.asarray(rng.standard_normal((nc + 1, hd)).astype(np.float32))
    emb, box = get_cdn_group(
        gt_cls, gt_bbox, gt_mask, nc, class_embed, G, jax.random.PRNGKey(0),
        cls_noise_ratio=0.0, box_noise_scale=0.0,
    )
    assert emb.shape == (B, 2 * G * M, hd)
    assert box.shape == (B, 2 * G * M, 4)
    # padding slots are zeroed
    emb_np, box_np = np.asarray(emb), np.asarray(box)
    assert np.all(emb_np[0, 3] == 0) and np.all(box_np[1, 1] == 0)
    # with zero noise, positive slot embeds equal the class embedding and
    # boxes equal logit(gt)
    np.testing.assert_allclose(
        emb_np[0, 0], np.asarray(class_embed)[int(gt_cls[0, 0])], rtol=1e-6
    )
    want_logit = np.log(np.asarray(gt_bbox)[0, 0] / (1 - np.asarray(gt_bbox)[0, 0]))
    np.testing.assert_allclose(box_np[0, 0], want_logit, rtol=1e-4)
    # copies repeat every M slots
    np.testing.assert_allclose(box_np[0, 0], box_np[0, M], rtol=1e-6)


def test_cdn_group_negatives_displaced(rng):
    """Negative copies (blocks >= G) get boxes pushed away from gt."""
    B, M, nc, hd, G = 1, 2, 3, 4, 1
    gt_cls = jnp.zeros((B, M), jnp.int32)
    gt_bbox = jnp.full((B, M, 4), 0.5)
    gt_mask = jnp.ones((B, M), bool)
    class_embed = jnp.zeros((nc + 1, hd))
    _, box = get_cdn_group(
        gt_cls, gt_bbox, gt_mask, nc, class_embed, G, jax.random.PRNGKey(1),
        cls_noise_ratio=0.0, box_noise_scale=1.0,
    )
    box = jax.nn.sigmoid(np.asarray(box)).reshape(2, M, 4)
    pos_err = np.abs(box[0] - 0.5).max()
    neg_err = np.abs(box[1] - 0.5).max()
    assert neg_err > pos_err  # negatives displaced into [1,2]*wh band


def test_inverse_sigmoid_roundtrip(rng):
    x = jnp.asarray(rng.uniform(0.05, 0.95, (16,)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(inverse_sigmoid(x))), np.asarray(x), atol=1e-5
    )


def test_ms_deform_attn_core_interp():
    """Bilinear gather matches grid_sample align_corners=False semantics on a
    linear ramp (interior points) and zero-pads outside."""
    H, W, nh, c = 4, 6, 1, 2
    ramp = np.arange(W, dtype=np.float32)
    v = np.tile(ramp[None, :, None, None], (H, 1, nh, c)).reshape(1, H * W, nh, c)
    # sample at normalized x = (x_pix + 0.5) / W -> value == x_pix (exact)
    for x_pix in (0.0, 1.5, 4.9):
        loc = np.array([[[[[[(x_pix + 0.5) / W, 0.5]]]]]], np.float32)  # (1,1,1,1,1,2)
        w = np.ones((1, 1, 1, 1, 1), np.float32)
        out = ms_deform_attn_core(jnp.asarray(v), [(H, W)], jnp.asarray(loc), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0], x_pix, atol=1e-5)
    # far outside -> zero contribution
    loc = np.array([[[[[[5.0, 5.0]]]]]], np.float32)
    w = np.ones((1, 1, 1, 1, 1), np.float32)
    out = ms_deform_attn_core(jnp.asarray(v), [(H, W)], jnp.asarray(loc), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
