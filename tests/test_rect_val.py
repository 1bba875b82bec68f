"""Rect val batching (reference `BaseDataset.set_rectangle`,
`data/base.py:221-244` + the `rect` flag): aspect-ratio-binned letterboxed
val batches for the YOLO family. Geometry unit tests run in the fast loop;
the engine-level rect val runs as a slow test."""

import numpy as np
import pytest
import yaml


@pytest.fixture
def mixed_ar_dataset(tmp_path):
    import cv2

    root = tmp_path
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    # wide, tall, and square images interleaved
    shapes = [(64, 128), (128, 64), (96, 96), (48, 160), (160, 48), (80, 100)]
    for i, (h, w) in enumerate(shapes):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "images" / f"im{i}.jpg"), img)
        (root / "labels" / f"im{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    return root, shapes


def test_set_rectangle_bins_by_aspect(mixed_ar_dataset):
    from tamtr_tpu.data.dataset import DetectionDataset

    root, shapes = mixed_ar_dataset
    ds = DetectionDataset(root / "images", imgsz=160, augment=False,
                          cache_labels=False)
    ds.set_rectangle(batch_size=2, stride=32, pad=0.5)
    # images are sorted by aspect ratio after binning
    ars = [ds._image_shape(i)[0] / ds._image_shape(i)[1] for i in range(len(ds))]
    assert ars == sorted(ars)
    # every batch shape is a stride multiple and <= imgsz + one stride
    assert ds.batch_shapes.shape == (3, 2)
    assert (ds.batch_shapes % 32 == 0).all()
    assert ds.batch_shapes.max() <= 160 + 32
    # wide batch is shorter than it is wide; tall batch vice versa
    bs0 = ds.batch_shapes[0]  # most-wide pair
    bs2 = ds.batch_shapes[-1]  # most-tall pair
    assert bs0[0] < bs0[1] and bs2[0] > bs2[1]


def test_rect_get_val_letterbox_geometry(mixed_ar_dataset):
    from tamtr_tpu.data.dataset import DetectionDataset

    root, _ = mixed_ar_dataset
    ds = DetectionDataset(root / "images", imgsz=160, augment=False,
                          cache_labels=False)
    ds.set_rectangle(batch_size=2)
    for i in range(len(ds)):
        img, raw, (h, w), lb = ds.get_val(i)
        assert lb is not None
        ratio, left, top = lb
        bh, bw = ds.batch_shapes[ds.batch_index[i]]
        assert img.shape == (bh, bw, 3)
        # content occupies ratio-scaled extent, centered
        nh, nw = max(round(h * ratio), 1), max(round(w * ratio), 1)
        assert 0 <= left <= bw - nw and 0 <= top <= bh - nh
        # padding is the 114-gray letterbox fill
        if top > 0:
            assert np.allclose(img[0, :, :], 114 / 255.0, atol=1e-6)
        if left > 0:
            assert np.allclose(img[:, 0, :], 114 / 255.0, atol=1e-6)


def test_square_get_val_unchanged(mixed_ar_dataset):
    from tamtr_tpu.data.dataset import DetectionDataset

    root, _ = mixed_ar_dataset
    ds = DetectionDataset(root / "images", imgsz=96, augment=False,
                          cache_labels=False)
    img, raw, (h, w), lb = ds.get_val(0)
    assert lb is None
    assert img.shape == (96, 96, 3)


@pytest.mark.slow
def test_engine_rect_val_yolo(tmp_path):
    """YOLO-family val with rect=True runs end-to-end and yields finite mAP
    consistent with the square val on the same weights."""
    import cv2

    from tamtr_tpu.engine.model import Engine

    rng = np.random.default_rng(3)
    for split in ("train", "val"):
        (tmp_path / split / "images").mkdir(parents=True)
        (tmp_path / split / "labels").mkdir(parents=True)
        for i, (h, w) in enumerate([(96, 128), (128, 96), (64, 64), (96, 96)]):
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            cv2.imwrite(str(tmp_path / split / "images" / f"im{i}.jpg"), img)
            (tmp_path / split / "labels" / f"im{i}.txt").write_text(
                "0 0.5 0.5 0.3 0.3\n1 0.25 0.25 0.2 0.2"
            )
    data = {"path": str(tmp_path), "train": "train/images", "val": "val/images",
            "nc": 3, "names": {0: "a", 1: "b", 2: "c"}}
    yml = tmp_path / "data.yaml"
    yml.write_text(yaml.safe_dump(data))

    eng = Engine("yolo-gelan.yaml")
    eng.train(data=str(yml), imgsz=64, epochs=1, batch=2, workers=2, max_gt=8,
              project=str(tmp_path / "runs"), val=False, save=False, conf=0.01)
    sq = eng.val(data=str(yml), imgsz=64, batch=2, conf=0.01)
    rc = eng.val(data=str(yml), imgsz=64, batch=2, conf=0.01, rect=True)
    assert np.isfinite(rc["mAP50"]) and np.isfinite(sq["mAP50"])
