"""Dataset converters + auto-annotator (reference `data/converter.py`,
`dataset/{xml2txt,yolo2coco,split_data}.py`, `data/annotator.py`)."""

import json

import numpy as np
import pytest


def _write_img(path, w=64, h=48):
    import cv2

    cv2.imwrite(str(path), np.zeros((h, w, 3), np.uint8))


def test_coco_roundtrip(tmp_path):
    from tamtr_tpu.data.converter import convert_coco, yolo_to_coco

    imgs = tmp_path / "images"
    imgs.mkdir()
    _write_img(imgs / "a.png", 100, 80)
    coco = {
        "images": [{"id": 7, "file_name": "a.png", "width": 100, "height": 80}],
        "annotations": [
            {"id": 0, "image_id": 7, "category_id": 3, "bbox": [10, 20, 30, 40],
             "area": 1200, "iscrowd": 0},
        ],
        "categories": [{"id": 3, "name": "car"}],
    }
    jf = tmp_path / "inst.json"
    jf.write_text(json.dumps(coco))
    out = convert_coco(jf, tmp_path / "labels")
    line = (out / "a.txt").read_text().split()
    assert line[0] == "0"
    cx, cy, w, h = map(float, line[1:5])
    assert np.allclose([cx, cy, w, h], [0.25, 0.5, 0.3, 0.5])

    back = yolo_to_coco(imgs, out, ["car"], tmp_path / "back.json")
    data = json.loads(back.read_text())
    assert len(data["annotations"]) == 1
    bb = data["annotations"][0]["bbox"]
    assert np.allclose(bb, [10, 20, 30, 40], atol=0.1)


def test_voc_to_yolo(tmp_path):
    from tamtr_tpu.data.converter import voc_to_yolo

    xml = """<annotation><size><width>200</width><height>100</height></size>
    <object><name>dog</name><bndbox><xmin>50</xmin><ymin>25</ymin><xmax>150</xmax><ymax>75</ymax></bndbox></object>
    <object><name>unknown</name><bndbox><xmin>0</xmin><ymin>0</ymin><xmax>10</xmax><ymax>10</ymax></bndbox></object>
    </annotation>"""
    (tmp_path / "x.xml").write_text(xml)
    out = voc_to_yolo(tmp_path, tmp_path / "labels", ["cat", "dog"])
    vals = (out / "x.txt").read_text().split()
    assert vals[0] == "1"  # dog
    assert np.allclose([float(v) for v in vals[1:]], [0.5, 0.5, 0.5, 0.5])
    assert len((out / "x.txt").read_text().strip().splitlines()) == 1  # unknown skipped


def test_split_dataset(tmp_path):
    from tamtr_tpu.data.converter import split_dataset

    imgs = tmp_path / "images"
    labels = tmp_path / "labels"
    imgs.mkdir(), labels.mkdir()
    for i in range(10):
        _write_img(imgs / f"{i}.png")
        (labels / f"{i}.txt").write_text("0 0.5 0.5 0.2 0.2\n")
    counts = split_dataset(imgs, labels, tmp_path / "out", (0.6, 0.2, 0.2), seed=0)
    assert counts == {"train": 6, "val": 2, "test": 2}
    assert len(list((tmp_path / "out" / "train" / "images").iterdir())) == 6
    assert len(list((tmp_path / "out" / "val" / "labels").iterdir())) == 2


def test_mask_to_polygon():
    from tamtr_tpu.data.annotator import _mask_to_polygon

    m = np.zeros((40, 40), bool)
    m[10:30, 5:25] = True
    poly = _mask_to_polygon(m)
    assert poly is not None and poly.shape[1] == 2
    assert poly[:, 0].min() >= 4 and poly[:, 0].max() <= 25
    assert _mask_to_polygon(np.zeros((10, 10), bool)) is None


def test_auto_annotate(tmp_path):
    """End-to-end with a stub detector and the tiny SAM."""
    import cv2

    from tamtr_tpu.data.annotator import auto_annotate
    from tamtr_tpu.engine.results import Results
    from tamtr_tpu.models.sam import build_sam_tiny_test
    from tamtr_tpu.models.sam.predict import SAMPredictor

    d = tmp_path / "imgs"
    d.mkdir()
    img = np.zeros((48, 64, 3), np.uint8)
    img[10:40, 10:50] = 200
    cv2.imwrite(str(d / "im0.png"), img)

    class StubDet:
        def predict(self, data, conf=0.25):
            return [
                Results(str(d / "im0.png"), np.array([[10.0, 10, 50, 40]]),
                        np.array([0.9]), np.array([2]), ["a", "b", "c"])
            ]

    sam_pred = SAMPredictor(build_sam_tiny_test(img_size=64), conf=-1.0)
    out = auto_annotate(d, StubDet(), sam_model=sam_pred, output_dir=tmp_path / "lab")
    files = list(out.glob("*.txt"))
    if files:  # random-weight SAM may emit an empty mask; polygon is optional
        vals = files[0].read_text().split()
        assert vals[0] == "2"
        coords = np.array([float(v) for v in vals[1:]])
        assert coords.min() >= 0.0 and coords.max() <= 1.0
