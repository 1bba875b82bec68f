"""SAM family tests: modules, AMG utilities, promptable + automatic predict.

Mirrors the reference capabilities in `ultralytics/models/sam/` on tiny
configs (CPU-sized) — the reference ships no tests (SURVEY.md §4), so these
are the behavioral spec.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tamtr_tpu.models.sam import amg
from tamtr_tpu.models.sam.build import build_sam_tiny_test, build_sam
from tamtr_tpu.models.sam.modules import (
    ImageEncoderViT,
    MaskDecoder,
    PromptEncoder,
    TinyViTEncoder,
)
from tamtr_tpu.models.sam.predict import SAMPredictor, _bucket, _nms_numpy


# --------------------------------------------------------------------- amg
def test_point_grid():
    g = amg.build_point_grid(4)
    assert g.shape == (16, 2)
    assert np.isclose(g.min(), 1 / 8) and np.isclose(g.max(), 7 / 8)
    layered = amg.build_all_layer_point_grids(8, 2, 2)
    assert [len(x) for x in layered] == [64, 16, 4]


def test_crop_boxes():
    boxes, layers = amg.generate_crop_boxes((400, 600), 1, 0.25)
    assert boxes[0] == [0, 0, 600, 400] and layers[0] == 0
    assert len(boxes) == 1 + 4 and all(l == 1 for l in layers[1:])
    for x1, y1, x2, y2 in boxes:
        assert 0 <= x1 < x2 <= 600 and 0 <= y1 < y2 <= 400


def test_stability_score():
    # a radial logit bump: high/low thresholds produce nested masks
    yy, xx = np.mgrid[:32, :32]
    logits = 3.0 - 0.3 * np.sqrt((yy - 16.0) ** 2 + (xx - 16.0) ** 2)
    s = float(amg.calculate_stability_score(jnp.asarray(logits[None]), 0.0, 1.0)[0])
    hi = (logits > 1.0).sum()
    lo = (logits > -1.0).sum()
    assert np.isclose(s, hi / lo, atol=1e-6)
    assert 0.0 < s < 1.0


def test_mask_to_box():
    m = np.zeros((2, 16, 16), bool)
    m[0, 3:7, 5:12] = True  # box [5, 3, 11, 6]
    box = np.asarray(amg.batched_mask_to_box(jnp.asarray(m)))
    assert box[0].tolist() == [5, 3, 11, 6]
    assert box[1].tolist() == [0, 0, 0, 0]  # empty mask


def test_uncrop_and_edge():
    boxes = np.array([[0.0, 5.0, 30.0, 40.0], [50.0, 50.0, 60.0, 60.0]], np.float32)
    crop = [30, 30, 130, 130]
    un = amg.uncrop_boxes_xyxy(boxes, crop)
    assert un[0].tolist() == [30.0, 35.0, 60.0, 70.0]
    # box 0 touches the crop edge (x1=30) but not the image edge -> flagged;
    # box 1 is interior -> not flagged
    near = amg.is_box_near_crop_edge(boxes, crop, [0, 0, 200, 200])
    assert near[0] and not near[1]


def test_nms_numpy():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32
    )
    keep = _nms_numpy(boxes, np.array([0.9, 0.8, 0.7], np.float32), 0.5)
    assert sorted(keep.tolist()) == [0, 2]


def test_bucket():
    assert [_bucket(n) for n in (1, 2, 3, 5, 64, 100)] == [1, 2, 4, 8, 64, 64]


# ----------------------------------------------------------------- modules
def test_image_encoder_vit_shapes():
    enc = ImageEncoderViT(
        img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
        out_chans=16, use_rel_pos=True, window_size=2, global_attn_indexes=(1,),
    )
    x = jnp.zeros((1, 64, 64, 3))
    v = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(v, x)
    assert y.shape == (1, 4, 4, 16)
    assert bool(jnp.isfinite(y).all())


def test_tinyvit_shapes():
    enc = TinyViTEncoder(
        embed_dims=(8, 12, 16, 20), depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 2),
        window_sizes=(2, 2, 2, 2), out_chans=16,
    )
    x = jnp.zeros((1, 64, 64, 3))
    v = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(v, x)
    # 1024->64 grid in the real model; here 64 / 4 (patch) / 4 (two merges) = 4
    assert y.shape == (1, 4, 4, 16)
    assert bool(jnp.isfinite(y).all())


def test_prompt_encoder_combinations():
    pe = PromptEncoder(embed_dim=32, image_embedding_size=(4, 4), input_image_size=(64, 64), mask_in_chans=8)
    pts = (jnp.asarray([[[10.0, 20.0]]]), jnp.asarray([[1]]))
    box = jnp.asarray([[5.0, 5.0, 30.0, 40.0]])
    msk = jnp.zeros((1, 16, 16, 1))
    v = pe.init(jax.random.PRNGKey(0), points=pts, boxes=box, masks=msk)
    # points only: padded with a not-a-point slot -> 2 sparse tokens
    sp, dn = pe.apply(v, points=pts)
    assert sp.shape == (1, 2, 32) and dn.shape == (1, 4, 4, 32)
    # boxes only: 2 corner tokens
    sp, dn = pe.apply(v, boxes=box)
    assert sp.shape == (1, 2, 32)
    # points + boxes: no padding point -> 1 + 2 tokens
    sp, dn = pe.apply(v, points=pts, boxes=box)
    assert sp.shape == (1, 3, 32)
    # with mask: dense comes from downscaling
    sp2, dn2 = pe.apply(v, points=pts, masks=msk)
    assert dn2.shape == (1, 4, 4, 32)
    assert not np.allclose(np.asarray(dn), np.asarray(dn2))
    # dense PE grid
    pe_grid = pe.apply(v, method=pe.get_dense_pe)
    assert pe_grid.shape == (1, 4, 4, 32)


def test_point_label_semantics():
    """-1 labels map to the not-a-point embedding regardless of coords."""
    pe = PromptEncoder(embed_dim=16, image_embedding_size=(2, 2), input_image_size=(32, 32), mask_in_chans=8)
    pts = (jnp.asarray([[[3.0, 4.0], [9.0, 9.0]]]), jnp.asarray([[1, -1]]))
    v = pe.init(jax.random.PRNGKey(0), points=pts, boxes=jnp.zeros((1, 4)), masks=jnp.zeros((1, 8, 8, 1)))
    sp, _ = pe.apply(v, points=pts, boxes=jnp.zeros((1, 4)))
    nap = v["params"]["not_a_point_embed"]
    assert np.allclose(np.asarray(sp[0, 1]), np.asarray(nap[0]), atol=1e-6)


def test_mask_decoder_shapes():
    dec = MaskDecoder(transformer_dim=32, num_multimask_outputs=3, transformer_mlp_dim=64)
    feats = jnp.zeros((2, 4, 4, 32))
    pe = jnp.zeros((1, 4, 4, 32))
    sparse = jnp.zeros((2, 3, 32))
    dense = jnp.zeros((2, 4, 4, 32))
    v = dec.init(jax.random.PRNGKey(0), feats, pe, sparse, dense)
    masks, iou = dec.apply(v, feats, pe, sparse, dense)
    assert masks.shape == (2, 4, 16, 16)  # 4 mask tokens, 4x upscale
    assert iou.shape == (2, 4)


# --------------------------------------------------------------- predictor
@pytest.fixture(scope="module")
def tiny_predictor():
    sam = build_sam_tiny_test(img_size=64)
    return SAMPredictor(sam, conf=-1.0)  # permissive conf for random weights


def _fake_image(h=48, w=72):
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, (h, w, 3), np.uint8)


def test_sam_prompt_inference_boxes(tiny_predictor):
    p = tiny_predictor
    p.set_image(_fake_image())
    masks, scores = p.prompt_inference(bboxes=np.array([[5, 5, 40, 30], [10, 10, 60, 45]]))
    assert masks.shape[0] == 2 and scores.shape == (2,)
    assert np.isfinite(masks).all()


def test_sam_prompt_inference_points_multimask(tiny_predictor):
    p = tiny_predictor
    p.set_image(_fake_image())
    masks, scores = p.prompt_inference(
        points=np.array([[20, 20], [40, 30], [10, 35]]), multimask_output=True
    )
    assert masks.shape[0] == 9 and scores.shape == (9,)  # 3 prompts x 3 masks


def test_sam_call_with_prompts(tiny_predictor):
    p = tiny_predictor
    img = _fake_image()
    res = p(img, bboxes=np.array([[5, 5, 40, 30]]))
    assert len(res) == 1
    r = res[0]
    assert r.masks is not None and r.masks.shape[1:] == img.shape[:2]
    assert r.boxes.xyxy.shape[1] == 4


def test_sam_generate(tiny_predictor):
    p = tiny_predictor
    p.set_image(_fake_image())
    masks, scores, boxes = p.generate(
        points_stride=4, conf_thres=-10.0, stability_score_thresh=-1.0
    )
    assert masks.ndim == 3 and masks.shape[1:] == (64, 64)
    assert len(masks) == len(scores) == len(boxes)


def test_sam_facade():
    from tamtr_tpu import SAM

    sam = SAM("mobile_sam")
    # facade builds lazily; swap in the tiny model to keep the test CPU-sized
    sam._predictor = SAMPredictor(build_sam_tiny_test(img_size=64), conf=-1.0)
    res = sam(_fake_image(), points=[[10, 10]])
    assert len(res) == 1 and res[0].masks is not None
    assert "SAM" in sam.info()


def test_build_sam_names():
    assert build_sam("sam_b.pt").image_encoder.embed_dim == 768
    assert build_sam("mobile_sam").image_encoder.__class__.__name__ == "TinyViTEncoder"
    with pytest.raises(FileNotFoundError):
        build_sam("nope.pt")


def test_remove_small_regions():
    m = np.zeros((2, 32, 32), bool)
    m[0, 4:20, 4:20] = True
    m[0, 8:10, 8:10] = False  # small hole -> filled
    m[1, 2:26, 2:26] = True
    m[1, 29:31, 29:31] = True  # small island (8-disconnected) -> removed
    out, keep = SAMPredictor.remove_small_regions(m, min_area=16, nms_thresh=0.9)
    assert out[keep.tolist().index(0)][8, 8]  # hole filled
    i1 = keep.tolist().index(1)
    assert not out[i1][30, 30] and out[i1][10, 10]  # island gone, body kept
