"""VisDrone acquisition/conversion tool tests (conversion path, no network)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

cv2 = pytest.importorskip("cv2")

from tools.get_visdrone import convert_split, main, write_yaml  # noqa: E402


def _make_split(root: Path, name: str):
    d = root / name
    (d / "images").mkdir(parents=True)
    (d / "annotations").mkdir(parents=True)
    img = np.zeros((100, 200, 3), np.uint8)
    cv2.imwrite(str(d / "images" / "0001.jpg"), img)
    # left,top,w,h,score,category,trunc,occl
    (d / "annotations" / "0001.txt").write_text(
        "10,20,40,30,1,4,0,0\n"   # car (cat 4 -> cls 3)
        "0,0,50,50,0,1,0,0\n"     # score 0 => ignored region, dropped
        "5,5,10,10,1,0,0,0\n"     # cat 0 (ignored), dropped
        "1,1,5,5,1,11,0,0\n"      # cat 11 (others), dropped
    )
    return d


def test_convert_split(tmp_path):
    d = _make_split(tmp_path, "VisDrone2019-DET-train")
    n = convert_split(d)
    assert n == 1
    lines = (d / "labels" / "0001.txt").read_text().strip().splitlines()
    assert len(lines) == 1
    cls, cx, cy, w, h = lines[0].split()
    assert cls == "3"
    np.testing.assert_allclose(float(cx), (10 + 20) / 200, atol=1e-5)
    np.testing.assert_allclose(float(cy), (20 + 15) / 100, atol=1e-5)
    np.testing.assert_allclose(float(w), 40 / 200, atol=1e-5)
    np.testing.assert_allclose(float(h), 30 / 100, atol=1e-5)


def test_convert_only_end_to_end(tmp_path):
    _make_split(tmp_path, "VisDrone2019-DET-train")
    _make_split(tmp_path, "VisDrone2019-DET-test-dev")
    rc = main(["--root", str(tmp_path), "--convert-only"])
    assert rc == 0
    yaml_path = tmp_path / "visdrone.yaml"
    assert yaml_path.exists()
    from tamtr_tpu.config import load_data_yaml

    d = load_data_yaml(yaml_path)
    assert d["nc"] == 10 and len(d["names"]) == 10
    assert Path(d["train"]).is_dir() and Path(d["val"]).is_dir()
    # protocol caveat: val points at test-dev (reference visdrone.yaml:4)
    assert "test-dev" in d["val"]
