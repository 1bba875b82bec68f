"""Classify task end-to-end: ImageFolder dataset, CE training, top1/top5 val,
probability predict (reference `models/yolo/classify/*`)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def cls_data(tmp_path_factory):
    """Two-class folder dataset where color encodes the class."""
    import cv2

    root = tmp_path_factory.mktemp("clsdata")
    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 4)):
        for ci, cname in enumerate(["red", "green"]):
            d = root / split / cname
            d.mkdir(parents=True)
            for i in range(n):
                img = np.zeros((48, 56, 3), np.uint8)
                img[..., 2 - ci * 1] = 200  # BGR: red vs green channel
                img += rng.integers(0, 30, img.shape, np.uint8)
                cv2.imwrite(str(d / f"{i}.png"), img)
    return root


def test_classification_dataset(cls_data):
    from tamtr_tpu.data.dataset import ClassificationDataset, ClassificationLoader

    ds = ClassificationDataset(cls_data / "train", imgsz=32, augment=True, seed=0)
    assert ds.names == ["green", "red"] and len(ds) == 16
    img, label = ds.get(0, np.random.default_rng(0))
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    loader = ClassificationLoader(ds, batch_size=4, seed=0)
    batch = next(iter(loader))
    assert batch["img"].shape == (4, 32, 32, 3) and batch["cls"].shape == (4, 1)
    # val transform: deterministic center crop
    ds_val = ClassificationDataset(cls_data / "val", imgsz=32, augment=False)
    a, _ = ds_val.get(0)
    b, _ = ds_val.get(0)
    np.testing.assert_array_equal(a, b)


def test_classify_train_val_predict(cls_data, tmp_path):
    from tamtr_tpu import YOLO

    model = YOLO("classify-gelan.yaml")
    res = model.train(
        data=str(cls_data), epochs=2, batch=4, imgsz=32, lr0=0.01,
        warmup_epochs=0, project=str(tmp_path / "runs"), workers=0, plots=False,
    )
    assert "top1" in res and 0.0 <= res["top1"] <= 1.0
    # color classes are trivially separable: expect better than chance
    val = model.val(data=str(cls_data), imgsz=32, batch=4)
    assert val["top1"] >= 0.5
    preds = model.predict([np.full((40, 40, 3), (0, 0, 220), np.uint8)], imgsz=32)
    assert len(preds) == 1
    p = preds[0]
    assert p["probs"].shape == (2,) and len(p["top5"]) == 2
    assert np.isclose(p["probs"].sum(), 1.0, atol=1e-5)
