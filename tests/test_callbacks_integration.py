"""Event-complete logger integrations (VERDICT r3 #7).

A fake `wandb` backend is injected via sys.modules and a REAL tiny train
run (nano model, 1 epoch, synthetic data, val+save on) must drive >= 4
distinct event kinds through it: per-epoch metrics (`on_fit_epoch_end`),
checkpoint artifact (`on_model_save`), val metrics (`on_val_end`) and the
final summary/finish (`on_train_end`) — matching the reference logger
breadth (`utils/callbacks/wb.py`).
"""

import sys
import types

import numpy as np
import pytest
import yaml


class FakeRun:
    def __init__(self):
        self.events = []
        self.summary = {}

    def log(self, data, step=None):
        kind = "val" if any(k.startswith("val/") for k in data) else "epoch"
        self.events.append((kind, dict(data)))

    def save(self, path, policy=None):
        self.events.append(("artifact", str(path)))

    def finish(self):
        self.events.append(("finish", None))


def _install_fake_wandb():
    run = FakeRun()
    mod = types.ModuleType("wandb")
    mod.init = lambda **kw: run
    mod.Image = lambda p: ("image", str(p))
    sys.modules["wandb"] = mod
    return run


@pytest.fixture
def synth_root(tmp_path):
    import cv2

    root = tmp_path
    for split in ("train", "val"):
        (root / split / "images").mkdir(parents=True)
        (root / split / "labels").mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(4):
            img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
            cv2.imwrite(str(root / split / "images" / f"im{i}.jpg"), img)
            (root / split / "labels" / f"im{i}.txt").write_text(
                "0 0.5 0.5 0.2 0.2\n1 0.3 0.3 0.1 0.1"
            )
    data = {
        "path": str(root), "train": "train/images", "val": "val/images",
        "nc": 3, "names": {0: "car", 1: "van", 2: "bus"},
    }
    yml = root / "data.yaml"
    yml.write_text(yaml.safe_dump(data))
    return yml


@pytest.mark.slow
def test_wandb_events_from_real_train(synth_root, monkeypatch):
    from tamtr_tpu.engine.model import Engine
    from tamtr_tpu.utils.settings import SETTINGS

    run = _install_fake_wandb()
    monkeypatch.setitem(SETTINGS, "wandb", True)
    try:
        eng = Engine("tamtr.yaml")  # nano's 128-d head mismatches the 512-d text table
        eng.train(
            data=str(synth_root), imgsz=64, epochs=1, batch=2, workers=2,
            max_gt=8, scan_chunk=32, project=str(synth_root.parent / "runs"),
            val=True, save=True, conf=0.01, plots=False,
        )
    finally:
        del sys.modules["wandb"]

    kinds = {k for k, _ in run.events}
    assert {"epoch", "val", "artifact", "finish"} <= kinds, run.events
    # the checkpoint artifact points at the saved weights dir
    art = [p for k, p in run.events if k == "artifact"]
    assert any("weights" in p for p in art), art


def test_handlers_fire_without_train(tmp_path):
    """Unit-level: every upgraded handler responds to its event (fast loop
    coverage; the slow test above proves the trainer fires them)."""
    from tamtr_tpu.utils.callbacks import Callbacks, add_wandb

    run = _install_fake_wandb()
    try:
        cb = Callbacks()
        assert add_wandb(cb)
        cb.fire("on_fit_epoch_end", None, 0, {"loss": 1.0})
        cb.fire("on_model_save", None, 0, tmp_path / "weights" / "last", True)
        cb.fire("on_val_end", None, {"mAP50": 0.5})
        cb.fire("on_train_end", None, {"mAP50": 0.5}, tmp_path)
    finally:
        del sys.modules["wandb"]
    kinds = [k for k, _ in run.events]
    assert kinds.count("epoch") == 1
    assert kinds.count("artifact") == 1
    assert kinds.count("val") == 1
    assert kinds[-1] == "finish"
    assert run.summary.get("mAP50") == 0.5
