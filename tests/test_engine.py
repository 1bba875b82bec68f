"""Engine smoke test: 2 tiny train steps + val on a synthetic dataset (CPU)."""

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("engine_synth")
    for split in ("train", "val"):
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        rng = np.random.default_rng(0 if split == "train" else 1)
        for i in range(4):
            img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
            cv2.imwrite(str(root / split / "images" / f"im{i}.jpg"), img)
            (root / split / "labels" / f"im{i}.txt").write_text(
                "0 0.5 0.5 0.2 0.2\n1 0.3 0.3 0.1 0.1"
            )
    data = {
        "path": str(root),
        "train": "train/images",
        "val": "val/images",
        "nc": 3,
        "names": {0: "car", 1: "van", 2: "bus"},
    }
    yml = root / "data.yaml"
    yml.write_text(yaml.safe_dump(data))
    return yml


def test_engine_train_and_val(synth_root):
    from tamtr_tpu.engine.model import Engine

    eng = Engine("tamtr.yaml")
    res = eng.train(
        data=str(synth_root),
        imgsz=64,
        epochs=1,
        batch=2,
        workers=2,
        max_gt=8,
        scan_chunk=32,
        warmup_epochs=5,
        project=str(synth_root.parent / "runs"),
        val=True,
        save=True,
        conf=0.01,
    )
    assert "mAP50" in res
    assert np.isfinite(res["mAP50"])
    # checkpoint exists
    assert (synth_root.parent / "runs" / "train" / "weights" / "last").exists()
    # predict on the val images
    preds = eng.predict(str(synth_root.parent / "val" / "images"), imgsz=64, conf=0.01)
    assert len(preds) == 4
    assert all("boxes" in p and "scores" in p for p in preds)
    # Python-API predict without save= has NO disk side effects (reference
    # save=is_cli; ADVICE r4 medium#2): no annotated copies anywhere under
    # the run project or a cwd-relative runs/
    import pathlib

    for d in (synth_root.parent / "runs", pathlib.Path("runs")):
        if d.exists():
            assert not [p for p in d.rglob("im*.jpg")], f"predict wrote files under {d}"

    # annotated-video output (reference predictor save path): predict and
    # track on a synthetic mp4 both write a playable annotated video
    import cv2

    vid = synth_root.parent / "clip.mp4"
    vw = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 10, (128, 96))
    rng = np.random.default_rng(0)
    for _ in range(5):
        vw.write(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))
    vw.release()
    out_dir = synth_root.parent / "vidruns"
    frames = eng.predict(str(vid), imgsz=64, conf=0.01, save=True,
                         project=str(out_dir), name="pred")
    assert len(frames) == 5 and frames[0].orig_img is not None
    out_mp4 = out_dir / "pred" / "clip.mp4"
    assert out_mp4.exists() and out_mp4.stat().st_size > 0
    cap = cv2.VideoCapture(str(out_mp4))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5
    cap.release()
    tracks = eng.track(str(vid), imgsz=64, conf=0.01, save=True,
                       project=str(out_dir), name="trk")
    assert len(tracks) == 5
    assert (out_dir / "trk" / "clip.mp4").exists()


def test_engine_tta_predict(synth_root):
    """TTA predict (3 scales + flip merge) runs and returns Results."""
    from tamtr_tpu.engine.model import Engine

    eng = Engine("tamtr.yaml")
    eng.train(
        data=str(synth_root), imgsz=64, epochs=1, batch=2, workers=2, max_gt=8,
        scan_chunk=32, warmup_epochs=5, project=str(synth_root.parent / "runs_tta"),
        val=False, save=False, conf=0.01,
    )
    preds = eng.predict(
        str(synth_root.parent / "val" / "images"), imgsz=64, conf=0.01, augment=True
    )
    assert len(preds) == 4
    for p in preds:
        assert p.boxes.xyxy.shape[1] == 4


def test_engine_segment_task(tmp_path):
    """Segment model trains end-to-end through the engine (1 tiny epoch)."""
    import cv2
    import yaml as _yaml

    from tamtr_tpu.engine.model import Engine

    root = tmp_path / "segdata"
    for split in ("train", "val"):
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        rng2 = np.random.default_rng(0)
        for i in range(2):
            img = rng2.integers(0, 255, (96, 96, 3), dtype=np.uint8)
            cv2.imwrite(str(root / split / "images" / f"im{i}.jpg"), img)
            (root / split / "labels" / f"im{i}.txt").write_text(
                "0 0.3 0.3 0.7 0.3 0.5 0.7\n1 0.6 0.6 0.2 0.2"
            )
    yml = root / "data.yaml"
    yml.write_text(_yaml.safe_dump({
        "path": str(root), "train": "train/images", "val": "val/images",
        "nc": 2, "names": {0: "a", 1: "b"},
    }))
    eng = Engine("yolo-seg-gelan.yaml")
    res = eng.train(
        data=str(yml), imgsz=64, epochs=1, batch=2, workers=1, max_gt=4,
        warmup_epochs=2, project=str(tmp_path / "runs"), val=True, save=False,
        conf=0.01,
    )
    assert "mask_mAP50" in res and np.isfinite(res["mask_mAP50"])


def test_engine_pose_task(tmp_path):
    """Pose model trains + validates (OKS mAP) through the engine."""
    import cv2
    import yaml as _yaml

    from tamtr_tpu.engine.model import Engine

    root = tmp_path / "posedata"
    kpts = " ".join("0.5 0.5 2" for _ in range(17))
    for split in ("train", "val"):
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        rng2 = np.random.default_rng(1)
        for i in range(2):
            img = rng2.integers(0, 255, (96, 96, 3), dtype=np.uint8)
            cv2.imwrite(str(root / split / "images" / f"im{i}.jpg"), img)
            (root / split / "labels" / f"im{i}.txt").write_text(
                f"0 0.5 0.5 0.4 0.4 {kpts}"
            )
    yml = root / "data.yaml"
    yml.write_text(_yaml.safe_dump({
        "path": str(root), "train": "train/images", "val": "val/images",
        "nc": 1, "names": {0: "person"},
    }))
    eng = Engine("yolo-pose-gelan.yaml")
    res = eng.train(
        data=str(yml), imgsz=64, epochs=1, batch=2, workers=1, max_gt=4,
        warmup_epochs=2, project=str(tmp_path / "runs"), val=True, save=False,
        conf=0.01,
    )
    assert "pose_mAP50" in res and np.isfinite(res["pose_mAP50"])


def test_preemption_checkpoint(tmp_path, det_data=None):
    """SIGTERM mid-training checkpoints `last` and stops cleanly."""
    import os
    import signal
    import threading

    import cv2

    root = tmp_path / "d"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        cv2.imwrite(str(root / "images" / f"{i}.png"),
                    rng.integers(0, 255, (64, 64, 3), np.uint8))
        (root / "labels" / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: images\nval: images\nnc: 1\nnames: [a]\n"
    )
    from tamtr_tpu import YOLO

    m = YOLO("yolo-gelan.yaml")
    # send SIGINT to ourselves shortly after training starts
    timer = threading.Timer(10.0, lambda: os.kill(os.getpid(), signal.SIGINT))
    timer.start()
    try:
        m.train(data=str(root / "data.yaml"), epochs=500, batch=2, imgsz=64,
                workers=0, project=str(tmp_path / "runs"), max_gt=8,
                warmup_epochs=0, plots=False, val=False)
    finally:
        timer.cancel()
    assert (tmp_path / "runs" / "train" / "weights" / "last").exists()
