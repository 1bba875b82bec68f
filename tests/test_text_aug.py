"""CopyPaste, RandomLoadText, and text-embedding table tests."""

import numpy as np
import pytest

from tamtr_tpu.data import augment as A
from tamtr_tpu.data import text as T


def _seg_sample():
    img = np.zeros((64, 64, 3), np.uint8)
    img[10:20, 5:15] = 200  # an object patch on the left half
    boxes = np.array([[5, 10, 15, 20]], np.float32)
    segs = [np.array([[5, 10], [15, 10], [15, 20], [5, 20]], np.float32)]
    return A.Sample(img, boxes, np.array([2], np.int32), segments=segs)


def test_copy_paste_adds_mirrored_instance():
    rng = np.random.default_rng(0)
    out = A.copy_paste(_seg_sample(), rng, p=1.0)
    assert len(out.cls) == 2 and out.cls[1] == 2
    # mirrored box: x -> w - x
    np.testing.assert_allclose(out.boxes[1], [64 - 15, 10, 64 - 5, 20])
    # pixels pasted at the mirrored location
    assert out.img[15, 64 - 10].max() == 200
    # original untouched
    assert out.img[15, 10].max() == 200


def test_copy_paste_noop_without_segments():
    smp = A.Sample(np.zeros((32, 32, 3), np.uint8),
                   np.array([[1, 1, 9, 9]], np.float32), np.array([0], np.int32))
    out = A.copy_paste(smp, np.random.default_rng(0), p=1.0)
    assert out is smp  # reference behavior: box-only labels skip copy-paste


def test_copy_paste_skips_overlapping():
    # centered box overlaps its own mirror > 30% IoA -> nothing pasted
    img = np.zeros((64, 64, 3), np.uint8)
    boxes = np.array([[20, 20, 44, 44]], np.float32)
    segs = [np.array([[20, 20], [44, 20], [44, 44], [20, 44]], np.float32)]
    smp = A.Sample(img, boxes, np.array([1], np.int32), segments=segs)
    out = A.copy_paste(smp, np.random.default_rng(0), p=1.0)
    assert len(out.cls) == 1


def test_random_load_text_remaps_and_pads():
    class_texts = [[f"class{i}", f"syn{i}"] for i in range(10)]
    cls = np.array([3, 3, 7], np.int32)
    rng = np.random.default_rng(0)
    new_cls, keep, texts = A.random_load_text(
        cls, class_texts, rng, max_samples=10, padding=True
    )
    assert keep.all() and len(texts) == 10
    # remapped ids point at the right text
    for orig, new in zip(cls, new_cls):
        assert texts[new] in class_texts[orig]
    # all 10 classes sampled when nc <= max_samples (VisDrone case)
    non_pad = [t for t in texts if t]
    assert len(non_pad) == 10


def test_random_load_text_drops_unsampled():
    class_texts = [[f"c{i}"] for i in range(50)]
    cls = np.arange(20, dtype=np.int32)
    rng = np.random.default_rng(1)
    new_cls, keep, texts = A.random_load_text(
        cls, class_texts, rng, max_samples=8, neg_samples=(0, 0), padding=True
    )
    assert keep.sum() == 8 and len(new_cls) == 8
    assert len(texts) == 8
    assert max(new_cls) < 8


def test_hash_fallback_warns(caplog):
    import logging

    T._WARNED = False
    logger = logging.getLogger("tamtr_tpu")
    old_prop = logger.propagate
    logger.propagate = True  # LOGGER defaults to propagate=False
    try:
        with caplog.at_level(logging.WARNING, logger="tamtr_tpu"):
            emb = T.encode_texts(["a-new-never-seen-text-xyz"])
    finally:
        logger.propagate = old_prop
    assert emb.shape == (1, 512)
    assert any("HASH STAND-INS" in r.message for r in caplog.records)


def test_npz_table_roundtrip(tmp_path):
    texts = ["car", "truck", ""]
    emb = np.random.default_rng(0).standard_normal((3, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    np.savez(tmp_path / "t.npz", texts=np.array(texts, dtype=object), embeddings=emb)
    out = T.encode_texts(["truck", "car"], npz_path=tmp_path / "t.npz")
    np.testing.assert_allclose(out[0], emb[1], atol=1e-6)
    np.testing.assert_allclose(out[1], emb[0], atol=1e-6)


def test_text_embedder_batches(tmp_path):
    texts = ["a", "b", ""]
    emb = np.eye(3, 512, dtype=np.float32)
    np.savez(tmp_path / "t.npz", texts=np.array(texts, dtype=object), embeddings=emb)
    te = T.TextEmbedder(npz_path=tmp_path / "t.npz")
    out = te([["a", "b", ""], ["b", "a", ""]])
    assert out.shape == (2, 3, 512)
    np.testing.assert_allclose(out[0, 0], emb[0])
    np.testing.assert_allclose(out[1, 0], emb[1])


def test_encode_texts_tool_hash(tmp_path):
    from tools.encode_texts import main

    out = tmp_path / "e.npz"
    rc = main(["--texts", "pedestrian", "car", "--out", str(out), "--allow-hash"])
    assert rc == 0 and out.exists()
    z = np.load(out, allow_pickle=True)
    assert "" in [str(t) for t in z["texts"]]  # padding text always included
    n = np.linalg.norm(z["embeddings"], axis=-1)
    np.testing.assert_allclose(n, 1.0, rtol=1e-5)


def test_encode_texts_tool_refuses_without_checkpoint(tmp_path):
    from tools.encode_texts import main

    rc = main(["--texts", "x", "--out", str(tmp_path / "no.npz")])
    assert rc == 1 and not (tmp_path / "no.npz").exists()


def test_perspective_warps_segments_and_keypoints():
    rng = np.random.default_rng(3)
    img = np.zeros((64, 64, 3), np.uint8)
    boxes = np.array([[10, 10, 30, 30]], np.float32)
    segs = [np.array([[10, 10], [30, 10], [30, 30], [10, 30]], np.float32)]
    kpts = np.array([[[20, 20, 1.0], [200, 20, 1.0]]], np.float32)  # 2nd kpt off-canvas after warp
    smp = A.Sample(img, boxes, np.array([1], np.int32), segments=segs, keypoints=kpts)
    out = A.random_perspective(smp, rng, degrees=0, translate=0.0, scale=0.0, shear=0.0)
    # identity-ish transform (scale=0 => s=1): geometry preserved
    assert out.segments is not None and len(out.segments) == len(out.cls)
    np.testing.assert_allclose(out.segments[0], segs[0], atol=1e-3)
    np.testing.assert_allclose(out.boxes[0], boxes[0], atol=1e-3)
    assert out.keypoints is not None
    # off-canvas keypoint visibility zeroed
    assert out.keypoints[0, 1, 2] == 0.0
    assert out.keypoints[0, 0, 2] == 1.0


def test_mosaic_carries_segments():
    rng = np.random.default_rng(0)
    parts = []
    for _ in range(4):
        img = np.full((32, 32, 3), 50, np.uint8)
        boxes = np.array([[4, 4, 28, 28]], np.float32)
        segs = [np.array([[4, 4], [28, 4], [28, 28], [4, 28]], np.float32)]
        parts.append(A.Sample(img, boxes, np.array([0], np.int32), segments=segs))
    out = A.mosaic4(parts, 32, rng)
    assert out.segments is not None
    assert len(out.segments) == len(out.cls) == len(out.boxes)
    for p, b in zip(out.segments, out.boxes):
        assert p.shape[-1] == 2


def test_albumentations_gated_noop_when_absent():
    """Without the package installed the transform is a no-op (reference
    `augment.py:816-836` ImportError branch)."""
    from tamtr_tpu.data import augment as A

    A._albu = None  # re-probe (albumentations is absent in this image)
    s = A.Sample(
        np.full((32, 32, 3), 7, np.uint8),
        np.array([[4.0, 4.0, 20.0, 20.0]], np.float32),
        np.array([1], np.int32),
    )
    out = A.albumentations_transform(s, np.random.default_rng(0))
    assert out is s and A._albu is False
    A._albu = None


def test_albumentations_applies_with_fake_package(monkeypatch):
    """With a (fake) albumentations installed: the reference transform list
    is built, boxes round-trip xyxy-pixels <-> normalized yolo xywh, and a
    transform that drops every box leaves the sample unchanged."""
    import sys
    import types

    from tamtr_tpu.data import augment as A

    built = {}

    class _T:
        def __init__(self, p=0.5, **kw):
            self.p = p

    class FakeCompose:
        def __init__(self, transforms, bbox_params=None):
            built["transforms"] = transforms
            built["bbox_params"] = bbox_params
            self.drop = False

        def __call__(self, image, bboxes, class_labels):
            built["bboxes_in"] = np.asarray(bboxes)
            if self.drop:
                return {"image": image, "bboxes": [], "class_labels": []}
            return {
                "image": image // 2,  # visible pixel-level change
                "bboxes": bboxes,
                "class_labels": class_labels,
            }

    fake = types.ModuleType("albumentations")
    for name in ("Blur", "MedianBlur", "ToGray", "CLAHE",
                 "RandomBrightnessContrast", "RandomGamma", "ImageCompression"):
        setattr(fake, name, type(name, (_T,), {}))
    fake.Compose = FakeCompose
    fake.BboxParams = lambda **kw: kw
    monkeypatch.setitem(sys.modules, "albumentations", fake)

    A._albu = None
    s = A.Sample(
        np.full((40, 80, 3), 100, np.uint8),
        np.array([[8.0, 4.0, 24.0, 16.0]], np.float32),  # xyxy pixels
        np.array([2], np.int32),
    )
    out = A.albumentations_transform(s, np.random.default_rng(0))
    # reference list: 4 active at p=0.01, 3 registered at p=0
    assert [t.p for t in built["transforms"]] == [0.01] * 4 + [0.0] * 3
    assert built["bbox_params"]["format"] == "yolo"
    np.testing.assert_allclose(
        built["bboxes_in"], [[16 / 80, 10 / 40, 16 / 80, 12 / 40]], atol=1e-6
    )
    assert out.img.max() == 50  # transformed image taken
    np.testing.assert_allclose(out.boxes, s.boxes, atol=1e-4)  # round-trip
    assert out.cls.tolist() == [2]

    # drop-every-box branch: sample unchanged
    A._albu.drop = True
    out2 = A.albumentations_transform(s, np.random.default_rng(0))
    assert out2 is s
    A._albu = None
