"""Data pipeline tests on a synthetic YOLO-format dataset."""

import numpy as np
import pytest

from tamtr_tpu.data.augment import (
    Sample,
    letterbox,
    mosaic4,
    mosaic9,
    random_flip,
    random_hsv,
    random_perspective,
    stretch_resize,
)
from tamtr_tpu.data.dataset import AugConfig, DetectionDataset, build_loader, collate
from tamtr_tpu.data.text import class_text_embeddings


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("visdrone_synth")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(12):
        h, w = int(rng.integers(200, 400)), int(rng.integers(300, 500))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "images" / f"im{i:03d}.jpg"), img)
        n = int(rng.integers(0, 6))
        rows = []
        for _ in range(n):
            cx, cy = rng.uniform(0.2, 0.8, 2)
            bw, bh = rng.uniform(0.05, 0.3, 2)
            bw = min(bw, 2 * min(cx, 1 - cx))
            bh = min(bh, 2 * min(cy, 1 - cy))
            rows.append(f"{int(rng.integers(0, 10))} {cx:.4f} {cy:.4f} {bw:.4f} {bh:.4f}")
        (root / "labels" / f"im{i:03d}.txt").write_text("\n".join(rows))
    return root


def test_dataset_load(synth_dataset):
    ds = DetectionDataset(synth_dataset / "images", imgsz=160)
    assert len(ds) == 12
    s = ds.get(0)
    assert s.img.shape == (160, 160, 3)
    assert (s.boxes >= 0).all() and (s.boxes <= 160).all()


def test_dataset_cache(synth_dataset):
    ds1 = DetectionDataset(synth_dataset / "images", imgsz=160)
    ds2 = DetectionDataset(synth_dataset / "images", imgsz=160)  # from cache
    for a, b in zip(ds1.labels, ds2.labels):
        np.testing.assert_array_equal(a["cls"], b["cls"])
        np.testing.assert_allclose(a["xywhn"], b["xywhn"])


def test_augmented_pipeline(synth_dataset):
    ds = DetectionDataset(
        synth_dataset / "images",
        imgsz=160,
        augment=True,
        aug=AugConfig(mosaic=1.0, scale=0.5),
    )
    rng = np.random.default_rng(1)
    for i in range(4):
        s = ds.get(i, rng)
        assert s.img.shape == (160, 160, 3)
        assert len(s.boxes) == len(s.cls)
        if len(s.boxes):
            assert (s.boxes[:, 2] >= s.boxes[:, 0]).all()


def test_mosaic9(synth_dataset):
    """3x3 mosaic keeps the mosaic4 output contract: 2s x 2s canvas, boxes
    clipped in-canvas (reference `_mosaic9`, `augment.py:227-276`)."""
    s = 80
    ds = DetectionDataset(synth_dataset / "images", imgsz=s)
    rng = np.random.default_rng(3)
    parts = [stretch_resize(ds._read(j), s) for j in range(9)]
    out = mosaic9(parts, s, rng)
    assert out.img.shape == (2 * s, 2 * s, 3)
    assert len(out.boxes) == len(out.cls)
    # center tile survives the central crop verbatim: its pixels sit at
    # [s-off, 2s-off) in the cropped canvas
    off = s // 2
    np.testing.assert_array_equal(
        out.img[s - off : 2 * s - off, s - off : 2 * s - off], parts[0].img
    )
    if len(out.boxes):
        assert (out.boxes >= 0).all() and (out.boxes <= 2 * s).all()
        assert (out.boxes[:, 2] > out.boxes[:, 0]).all()
    # the dataset pipeline accepts mosaic_n=9 end to end
    ds9 = DetectionDataset(
        synth_dataset / "images", imgsz=s, augment=True,
        aug=AugConfig(mosaic=1.0, mosaic_n=9),
    )
    smp = ds9.get(0, np.random.default_rng(0))
    assert smp.img.shape == (s, s, 3)


def test_screenshots_loader_injected():
    """Screen source parsing + frame generation with an injected grabber
    (reference `LoadScreenshots`, `data/loaders.py:179-243`; mss is gated)."""
    from tamtr_tpu.data.loaders import load_inference_source, load_screenshots

    seen = []

    def fake_grab(monitor):
        seen.append(dict(monitor))
        h, w = monitor["height"], monitor["width"]
        return np.full((h, w, 4), 7, np.uint8)  # BGRA like mss

    frames = list(load_screenshots("screen 1 10 20 64 48", max_frames=3, grab=fake_grab))
    assert [n for n, _ in frames] == ["screen1_0", "screen1_1", "screen1_2"]
    assert frames[0][1].shape == (48, 64, 3)  # BGRA -> BGR
    assert seen[0] == {"left": 10, "top": 20, "width": 64, "height": 48}
    # routing through the generic source loader
    gen = load_inference_source("screen")
    try:
        next(gen)
    except ImportError as e:
        assert "mss" in str(e)  # gated dependency, absent in this image


def test_loader_batches(synth_dataset):
    ds = DetectionDataset(synth_dataset / "images", imgsz=160, augment=True)
    loader = build_loader(ds, batch_size=4, max_gt=16, workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["img"].shape == (4, 160, 160, 3) and b["img"].dtype == np.uint8
    assert b["cls"].shape == (4, 16)
    assert b["bboxes"].shape == (4, 16, 4)
    assert b["mask"].shape == (4, 16)
    assert (b["bboxes"][b["mask"]] >= 0).all() and (b["bboxes"][b["mask"]] <= 1).all()
    # deterministic across epochs with same seed
    loader2 = build_loader(ds, batch_size=4, max_gt=16, workers=2, seed=0)
    b2 = next(iter(loader2))
    np.testing.assert_array_equal(b["img"], b2["img"])


def test_loader_host_sharding(synth_dataset):
    ds = DetectionDataset(synth_dataset / "images", imgsz=160)
    l0 = build_loader(ds, 2, max_gt=8, shuffle=False, process_index=0, process_count=2)
    l1 = build_loader(ds, 2, max_gt=8, shuffle=False, process_index=1, process_count=2)
    assert len(l0) == len(l1) == 3


def test_letterbox_and_stretch():
    img = np.zeros((100, 200, 3), np.uint8)
    s = Sample(img, np.array([[0, 0, 200, 100]], np.float32), np.array([0]))
    out, ratio, pad = letterbox(s, 64)
    assert out.img.shape == (64, 64, 3)
    st = stretch_resize(s, 64)
    np.testing.assert_allclose(st.boxes, [[0, 0, 64, 64]], atol=1e-4)


def test_text_embeddings_deterministic(tmp_path):
    names = ["car", "van", "truck"]
    e1 = class_text_embeddings(names)
    e2 = class_text_embeddings(names)
    np.testing.assert_allclose(e1, e2)
    assert e1.shape == (3, 512)
    np.testing.assert_allclose(np.linalg.norm(e1, axis=-1), 1.0, atol=1e-5)
    # npz path takes priority
    emb = np.eye(3, 512, dtype=np.float32)
    np.savez(tmp_path / "emb.npz", embeddings=emb)
    e3 = class_text_embeddings(names, npz_path=tmp_path / "emb.npz")
    np.testing.assert_allclose(e3[0, 0], 1.0)


def test_segment_task_dataset(tmp_path, rng):
    import cv2

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    img = (rng.random((100, 100, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "images" / "a.jpg"), img)
    # triangle polygon + one box-only row
    (tmp_path / "labels" / "a.txt").write_text(
        "1 0.2 0.2 0.8 0.2 0.5 0.8\n0 0.5 0.5 0.2 0.2"
    )
    ds = DetectionDataset(tmp_path / "images", imgsz=64, task="segment", cache_labels=False)
    s = ds.get(0)
    assert s.segments is not None and len(s.segments) == 2
    assert len(s.boxes) == 2
    from tamtr_tpu.data.dataset import collate

    batch = collate([s], max_gt=4, imgsz=64, task="segment")
    assert batch["masks"].shape == (1, 4, 16, 16)
    assert batch["masks"][0, 0].sum() > 0  # triangle rasterized
    assert batch["masks"][0, 2].sum() == 0  # padding empty


def test_pose_task_dataset(tmp_path, rng):
    import cv2

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    img = (rng.random((100, 100, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "images" / "a.jpg"), img)
    kpts = " ".join("0.5 0.5 2" for _ in range(17))
    (tmp_path / "labels" / "a.txt").write_text(f"0 0.5 0.5 0.4 0.4 {kpts}")
    ds = DetectionDataset(tmp_path / "images", imgsz=64, task="pose", cache_labels=False)
    s = ds.get(0)
    assert s.keypoints is not None and s.keypoints.shape == (1, 17, 3)
    np.testing.assert_allclose(s.keypoints[0, 0, :2], [32, 32], atol=1.0)
    from tamtr_tpu.data.dataset import collate

    batch = collate([s], max_gt=2, imgsz=64, task="pose")
    assert batch["keypoints"].shape == (1, 2, 17, 3)


def test_segment_flip_consistency(tmp_path, rng):
    import cv2

    from tamtr_tpu.data.augment import Sample, random_flip

    poly = np.array([[10.0, 10.0], [30.0, 10.0], [20.0, 30.0]], np.float32)
    s = Sample(
        (rng.random((40, 40, 3)) * 255).astype(np.uint8),
        np.array([[10, 10, 30, 30]], np.float32),
        np.array([0]),
        segments=[poly],
    )
    out = random_flip(s, np.random.default_rng(0), fliplr=1.0, flipud=0.0)
    np.testing.assert_allclose(out.segments[0][:, 0], 40 - poly[:, 0])


def test_image_cache_ram_and_disk(synth_dataset):
    """Decoded-image cache (reference `load_image` cache=ram|disk): identical
    samples with and without the cache, .npy artifacts for disk mode."""
    base = DetectionDataset(synth_dataset / "images", imgsz=160)
    ram = DetectionDataset(synth_dataset / "images", imgsz=160, cache="ram")
    disk = DetectionDataset(synth_dataset / "images", imgsz=160, cache="disk")
    for i in (0, 3):
        a = base.get(i)
        np.testing.assert_array_equal(a.img, ram.get(i).img)  # fills cache
        np.testing.assert_array_equal(a.img, ram.get(i).img)  # serves from it
        np.testing.assert_array_equal(a.img, disk.get(i).img)
        np.testing.assert_array_equal(a.img, disk.get(i).img)
        np.testing.assert_allclose(a.boxes, ram.get(i).boxes)
    assert len(ram._im_cache) == 2
    npys = list((synth_dataset / "images").glob("*.npy"))
    assert len(npys) == 2
    for f in npys:
        f.unlink()  # don't leak into other tests' globs


def test_collate_rgb_swap(synth_dataset):
    """collate's cv2 BGR->RGB swap must equal the numpy channel reverse."""
    ds = DetectionDataset(synth_dataset / "images", imgsz=160)
    samples = [ds.get(i) for i in range(3)]
    batch = collate(samples, max_gt=8, imgsz=160)
    for b, s in enumerate(samples):
        np.testing.assert_array_equal(batch["img"][b], s.img[..., ::-1])


def test_hsv_multichannel_lut_matches_per_channel(rng):
    """The fused 3-channel LUT must reproduce the reference split/LUT/merge."""
    import cv2

    img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    s = Sample(img, np.zeros((0, 4), np.float32), np.zeros(0, np.int64))
    out = random_hsv(s, np.random.default_rng(7), 0.015, 0.7, 0.4)

    r = np.random.default_rng(7).uniform(-1, 1, 3) * [0.015, 0.7, 0.4] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
    x = np.arange(0, 256, dtype=r.dtype)
    ref = cv2.cvtColor(
        cv2.merge((
            cv2.LUT(hue, ((x * r[0]) % 180).astype(np.uint8)),
            cv2.LUT(sat, np.clip(x * r[1], 0, 255).astype(np.uint8)),
            cv2.LUT(val, np.clip(x * r[2], 0, 255).astype(np.uint8)),
        )),
        cv2.COLOR_HSV2BGR,
    )
    np.testing.assert_array_equal(out.img, ref)


def test_stream_newest_drops_stale_frames():
    """stream_buffer=False (reference LoadStreams buffer arg): a slow
    consumer gets the newest frame, not every frame."""
    import time

    from tamtr_tpu.data.loaders import _stream_newest

    class FakeCap:
        def __init__(self, n):
            self.n = n
            self.i = 0

        def isOpened(self):
            return self.i < self.n

        def read(self):
            if self.i >= self.n:
                return False, None
            self.i += 1
            return True, np.full((4, 4, 3), self.i, np.uint8)

        def release(self):
            pass

    got = []
    for name, frame in _stream_newest(FakeCap(200), "cam"):
        got.append(int(frame[0, 0, 0]))
        time.sleep(0.01)  # slow consumer
    assert got, "no frames served"
    assert got[-1] == 200  # final frame always seen
    assert len(got) < 200  # stale frames were dropped
    assert got == sorted(got)  # monotonically newer


def test_update_labels_classes_and_single_cls(synth_dataset):
    """classes=/single_cls= filter GROUND TRUTH like the reference's
    BaseDataset.update_labels (base.py:125-141): classes keeps only included
    rows (no remap), single_cls zeroes every cls — and the npz label cache
    stays unfiltered (filter applies after cache load)."""
    full = DetectionDataset(synth_dataset / "images", imgsz=160)
    all_cls = np.concatenate([l["cls"] for l in full.labels])
    present = sorted(set(all_cls.tolist()))
    assert len(present) > 2
    keep = present[:2]
    ds = DetectionDataset(synth_dataset / "images", imgsz=160, classes=keep)
    got = np.concatenate([l["cls"] for l in ds.labels])
    assert set(got.tolist()) <= set(keep)
    assert len(got) == int(np.isin(all_cls, keep).sum())
    for l in ds.labels:
        assert len(l["cls"]) == len(l["xywhn"])
    sc = DetectionDataset(synth_dataset / "images", imgsz=160, single_cls=True)
    for l, lf in zip(sc.labels, full.labels):
        assert (l["cls"] == 0).all() and len(l["cls"]) == len(lf["cls"])
    # cache not poisoned: a fresh unfiltered dataset still sees everything
    again = DetectionDataset(synth_dataset / "images", imgsz=160)
    np.testing.assert_array_equal(
        np.concatenate([l["cls"] for l in again.labels]), all_cls
    )
