"""Unicode-safe cv2 IO wrappers (reference `utils/patches.py`) and
HUBModelError (reference `utils/errors.py`)."""

import numpy as np


def test_imread_imwrite_unicode_path(tmp_path):
    from tamtr_tpu.utils.patches import imread, imwrite

    p = tmp_path / "фото_测试_画像.png"  # non-ASCII path
    img = np.random.default_rng(0).integers(0, 255, (16, 20, 3), dtype=np.uint8)
    assert imwrite(str(p), img)
    back = imread(str(p))
    np.testing.assert_array_equal(back, img)  # png is lossless


def test_imread_missing_returns_none(tmp_path):
    from tamtr_tpu.utils.patches import imread

    assert imread(str(tmp_path / "nope.jpg")) is None


def test_dataset_reads_unicode_paths(tmp_path):
    import cv2

    from tamtr_tpu.data.dataset import DetectionDataset

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    img = np.random.default_rng(1).integers(0, 255, (32, 32, 3), dtype=np.uint8)
    # write via the patched path (cv2.imwrite may fail on some platforms)
    from tamtr_tpu.utils.patches import imwrite

    assert imwrite(str(tmp_path / "images" / "изображение.png"), img)
    (tmp_path / "labels" / "изображение.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    ds = DetectionDataset(tmp_path / "images", imgsz=32, augment=False,
                          cache_labels=False)
    out, raw, (h, w), lb = ds.get_val(0)
    assert out.shape == (32, 32, 3) and (h, w) == (32, 32)


def test_hub_model_error():
    import pytest

    from tamtr_tpu.utils.errors import HUBModelError

    with pytest.raises(HUBModelError, match="check model URL"):
        raise HUBModelError()


def test_engine_load_bare_asset_raises_hub_error():
    """A bare known asset name that cannot be fetched raises HUBModelError
    (zero-egress image; reference errors.py semantics)."""
    import pytest

    from tamtr_tpu.engine.model import Engine
    from tamtr_tpu.utils.errors import HUBModelError

    with pytest.raises(HUBModelError, match="TAM_TR.pt"):
        Engine().load("TAM_TR.pt")
